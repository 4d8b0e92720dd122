"""Block-tridiagonal SPD solver (TPU-native core for long-horizon KKT).

Long-horizon families (MPC with H >> 10, charging with T ~ 1440) have
block-tridiagonal KKT matrices M = P + sigma I + A' R A after a
time-ordering permutation: dense n x n storage and O(n^2) matvecs are
prohibitive at n ~ 3000 (the dense batched path caps at a few hundred).
The reference handles these with a sparse QDLDL factorization on CPU
(reference osqp/qdldl submodules); the TPU-native shape is different:

- FACTORIZATION: block-Cholesky recurrence  S_1 = D_1,
  S_i = D_i - L_i S_{i-1}^{-1} L_i'  via ``lax.scan`` over the nb blocks
  (sequential in the block index, batched over instances: each step is a
  (B, s, s) batched inverse + two batched matmuls on the MXU).
- SOLVES: forward/backward substitution are first-order AFFINE recurrences
  x_i = M_i x_{i-1} + v_i, evaluated with ``lax.associative_scan`` over
  the affine monoid (M, v) o (N, w) = (M N, M w + v): O(log nb) depth of
  (B, nb, s, s) batched GEMMs -- the whole batch and all blocks multiply
  in parallel on the MXU instead of a length-nb sequential sweep.

Blocks are stored dense (B, nb, s, s); s is the (padded) block bandwidth.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bt_factor(D, L):
    """Block-Cholesky Schur recurrence.

    D: (B, nb, s, s) diagonal blocks (symmetric), L: (B, nb-1, s, s)
    sub-diagonal blocks (block i couples x_i to x_{i-1}).
    Returns dict with S_inv (B, nb, s, s): inverses of the Schur diagonal
    blocks, and L (as given) -- everything bt_solve needs.
    """
    B, nb, s, _ = D.shape

    def step(S_prev_inv, inputs):
        Di, Li = inputs                      # (B, s, s) each
        # S_i = D_i - L_i S_{i-1}^{-1} L_i'
        LSi = jnp.einsum('bij,bjk->bik', Li, S_prev_inv)
        Si = Di - jnp.einsum('bij,bkj->bik', LSi, Li)
        Si_inv = jnp.linalg.inv(Si)
        return Si_inv, Si_inv

    S0_inv = jnp.linalg.inv(D[:, 0])
    _, S_inv_rest = jax.lax.scan(
        step, S0_inv, (jnp.swapaxes(D[:, 1:], 0, 1),
                       jnp.swapaxes(L, 0, 1)))
    S_inv = jnp.concatenate(
        [S0_inv[:, None], jnp.swapaxes(S_inv_rest, 0, 1)], axis=1)
    return dict(S_inv=S_inv, L=L)


def _affine_scan(Ms, vs, reverse=False):
    """x_i = Ms_i x_{i-1} + vs_i (x_0 = vs_0 with Ms_0 = 0) for all i, via
    associative_scan over the affine monoid.  Ms, vs: (B, nb, s, s)/(B, nb, s).
    """
    def combine(a, b):
        # b AFTER a: x -> Mb (Ma x + va) + vb
        Ma, va = a
        Mb, vb = b
        M = jnp.einsum('...ij,...jk->...ik', Mb, Ma)
        v = jnp.einsum('...ij,...j->...i', Mb, va) + vb
        return (M, v)

    Ms_, vs_ = jax.lax.associative_scan(combine, (Ms, vs), axis=1,
                                        reverse=reverse)
    return vs_


def bt_solve(fac, b):
    """Solve M x = b for block-tridiagonal SPD M given bt_factor output.

    b: (B, nb, s).  Returns x: (B, nb, s).
    Forward:  y_i = b_i - L_i S_{i-1}^{-1} y_{i-1}   (y_1 = b_1)
    Backward: x_i = S_i^{-1} (y_i - L_{i+1}' x_{i+1})
    Both are affine recurrences -> associative_scan, O(log nb) depth.
    """
    S_inv, L = fac['S_inv'], fac['L']
    B, nb, s = b.shape
    zero = jnp.zeros((B, 1, s, s), b.dtype)

    # forward: transition T_i = -L_i S_{i-1}^{-1} (i >= 2), T_1 = 0
    T_fwd = -jnp.einsum('bnij,bnjk->bnik', L, S_inv[:, :-1])
    y = _affine_scan(jnp.concatenate([zero, T_fwd], axis=1), b)

    # backward: x_i = S_i^{-1} y_i - S_i^{-1} L_{i+1}' x_{i+1}
    Sy = jnp.einsum('bnij,bnj->bni', S_inv, y)
    T_bwd = -jnp.einsum('bnij,bnkj->bnik', S_inv[:, :-1], L)
    x = _affine_scan(jnp.concatenate([T_bwd, zero], axis=1), Sy,
                     reverse=True)
    return x


def bt_matvec(D, L, x):
    """M x for block-tridiagonal M (D diagonal, L sub-diagonal blocks)."""
    y = jnp.einsum('bnij,bnj->bni', D, x)
    lo = jnp.einsum('bnij,bnj->bni', L, x[:, :-1])     # L_i x_{i-1}
    up = jnp.einsum('bnji,bnj->bni', L, x[:, 1:])      # L_{i+1}' x_{i+1}
    y = y.at[:, 1:].add(lo)
    y = y.at[:, :-1].add(up)
    return y


def dense_to_bt(M, s):
    """Partition a dense (B, n, n) block-tridiagonal matrix into (D, L)
    with block size s (n divisible by s).  Off-band content is DROPPED --
    callers must validate bandedness (see detect_block_bandwidth)."""
    B, n, _ = M.shape
    nb = n // s
    Mb = M.reshape(B, nb, s, nb, s)
    idx = jnp.arange(nb)
    D = Mb[:, idx, :, idx, :]                    # (nb, B, s, s)
    L = Mb[:, idx[1:], :, idx[:-1], :]
    return jnp.swapaxes(D, 0, 1), jnp.swapaxes(L, 0, 1)


def detect_block_bandwidth(pattern, s_candidates=(1, 2, 3, 4, 6, 8, 12,
                                                  16, 24, 32)):
    """Smallest block size s such that the (n, n) sparsity pattern is
    block-tridiagonal with s x s blocks; None if none fits.  Offline
    (NumPy) -- family-compile-time analysis."""
    import numpy as np
    pat = np.asarray(pattern) != 0
    n = pat.shape[0]
    r, c = np.nonzero(pat)
    if len(r) == 0:
        return int(s_candidates[0])
    for s in s_candidates:
        if n % s:
            continue
        # require >= 4 blocks: with nb <= 3 every matrix is trivially
        # "block-tridiagonal" and the banded path saves nothing
        if n // s < 4:
            continue
        if np.all(np.abs(r // s - c // s) <= 1):
            return int(s)
    return None
