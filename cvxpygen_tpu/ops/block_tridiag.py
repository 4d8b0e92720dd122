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


def cr_factor(D, L):
    """Block cyclic-reduction factorization of the block-tridiagonal SPD
    system (D, L) -- the FLOP-optimal parallel alternative to the
    associative-scan solve (bt_factor/bt_solve): each level halves the
    block count, so total work is O(nb s^3) for the factor and
    O(nb s^2) matvecs per solve, vs O(nb log nb s^3) matmuls per
    associative-scan solve (measured 9x the FLOPs at nb ~ 271 -- the
    round-2 banded-engine bottleneck, BENCH.md).

    Level construction (0-based blocks; equation i is
    L[i-1] x_{i-1} + D_i x_i + L[i]' x_{i+1} = b_i): eliminate ODD
    blocks; for the kept even blocks j,
        D'_j = D_j - L[j-1] Dinv_{j-1} L[j-1]' - L[j]' Dinv_{j+1} L[j]
        L'_{j/2-1} (coupling j to j-2) = -L[j-1] Dinv_{j-1} L[j-2]
        b'_j = b_j - A_j b_{j-1} - C_j b_{j+1},
    with A_j = L[j-1] Dinv_{j-1}, C_j = L[j]' Dinv_{j+1}.  Blocks are
    padded to an even count per level with identity D / zero L
    (decoupled trivial equations).  Returns a list of per-level dicts.
    """
    levels = []
    while D.shape[1] > 1:
        B, nb, s, _ = D.shape
        dtype = D.dtype
        if nb % 2:
            # pad one trailing identity block
            eye = jnp.broadcast_to(jnp.eye(s, dtype=dtype), (B, 1, s, s))
            D = jnp.concatenate([D, eye], axis=1)
            L = jnp.concatenate([L, jnp.zeros((B, 1, s, s), dtype)], axis=1)
            nb += 1
        n2 = nb // 2
        D_odd = D[:, 1::2]                          # (B, n2, s, s)
        Dinv_odd = jnp.linalg.inv(D_odd)
        # couplings of each odd block to its even neighbours: for even
        # j = 2t the left odd neighbour is 2t-1 (L[2t-1] = L_left[t-1])
        # and the right odd neighbour is 2t+1 (L[2t] = L[:, 0::2][t])
        L_left = L[:, 1::2]                         # L[2t+1], couples 2t+2 to 2t+1
        # A_t (for even block 2t, t>=1): L[2t-1] Dinv[2t-1]
        A = jnp.einsum('bnij,bnjk->bnik', L_left, Dinv_odd[:, :L_left.shape[1]])
        # C_t (for even block 2t, t<=n2-1): L[2t]' Dinv[2t+1]
        C = jnp.einsum('bnji,bnjk->bnik', L[:, 0::2], Dinv_odd)
        D_even = D[:, 0::2]
        # D'_t = D_2t - A_t L[2t-1]' - C_t L[2t]
        Dp = D_even
        Dp = Dp.at[:, 1:].add(-jnp.einsum('bnij,bnkj->bnik', A, L_left))
        Dp = Dp - jnp.einsum('bnij,bnjk->bnik', C, L[:, 0::2])
        # L'_{t-1} couples 2t to 2t-2: -A_t L[2t-2] = -A_t L[:,0::2][t-1]
        Lp = -jnp.einsum('bnij,bnjk->bnik', A, L[:, 0::2][:, :A.shape[1]])
        # NB: no python ints in the returned pytree -- cr_factor output
        # rides through lax.while_loop carries (adaptive-rho
        # refactorization) where int leaves become tracers; block counts
        # are derived from array shapes in cr_solve instead
        levels.append(dict(Dinv_odd=Dinv_odd, A=A, C=C,
                           L_left=L_left, L_even=L[:, 0::2]))
        D, L = Dp, Lp
    root_inv = jnp.linalg.inv(D[:, 0])
    return dict(levels=levels, root_inv=root_inv)


def cr_solve(fac, b):
    """Solve M x = b given cr_factor output; b (B, nb, s)."""
    levels = fac['levels']
    dtype = b.dtype
    nb0 = b.shape[1]
    stack = []
    for lv in levels:
        B, nb_l, s = b.shape
        if nb_l % 2:
            b = jnp.concatenate([b, jnp.zeros((B, 1, s), dtype)], axis=1)
        b_even = b[:, 0::2]
        b_odd = b[:, 1::2]
        bp = b_even
        bp = bp.at[:, 1:].add(-jnp.einsum(
            'bnij,bnj->bni', lv['A'], b_odd[:, :lv['A'].shape[1]]))
        bp = bp - jnp.einsum('bnij,bnj->bni', lv['C'], b_odd)
        stack.append(b_odd)
        b = bp
    x = jnp.einsum('bij,bj->bi', fac['root_inv'], b[:, 0])[:, None]
    for lv, b_odd in zip(reversed(levels), reversed(stack)):
        # back-substitute odd blocks between the solved even blocks:
        # x_{2t+1} = Dinv[2t+1] (b_{2t+1} - L[2t] x_{2t} - L[2t+1]' x_{2t+2})
        n2 = lv['Dinv_odd'].shape[1]
        x = x[:, :n2]              # drop a deeper level's pad block
        r = b_odd - jnp.einsum('bnij,bnj->bni', lv['L_even'], x)
        n_odd = b_odd.shape[1]
        # L[2t+1]' x_{2t+2}: only for odd blocks with a right even block
        up = jnp.einsum('bnji,bnj->bni', lv['L_left'],
                        x[:, 1:1 + lv['L_left'].shape[1]])
        r = r.at[:, :up.shape[1]].add(-up)
        x_odd = jnp.einsum('bnij,bnj->bni', lv['Dinv_odd'], r)
        # interleave even/odd back to the level's block count
        B, ne, s = x.shape
        full = jnp.zeros((B, 2 * n2, s), dtype)
        full = full.at[:, 0::2].set(x)
        full = full.at[:, 1::2].set(x_odd)
        x = full
    return x[:, :nb0]


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
