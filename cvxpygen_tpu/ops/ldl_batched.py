"""Batched static-pivot blocked LDL^T for quasidefinite KKT systems.

TPU-native replacement for QDLDL's role in the reference's embedded
solvers (OSQP/QOCO vendored qdldl; Clarabel's quasidefinite KKT LDL --
see SURVEY.md section 2.3): symmetric quasidefinite matrices
K = [[P + reg I, B'], [B, -H - reg I]] (P PSD, H PD) admit an LDL^T
factorization under ANY symmetric permutation (Vanderbei), so NO pivot
search is needed -- the factorization is a FIXED sequence of batched
ops, unlike LU with partial pivoting whose XLA lowering is a
data-dependent column-at-a-time loop (measured: the dominant cost of the
round-2 exotic-cone IPM at 313 solves/s).

Blocked right-looking factorization with panel size p:
  for each panel k:  A11 = L11 D1 L11'   (p unrolled rank-1 steps on the
                                          (B, p, p) diagonal block)
                     L21 = A21 (D1 L11')^{-1}        (one (B, m, p) GEMM)
                     A22 -= L21 D1 L21'              (one (B, m, m) GEMM)
Sequential depth = (N/p) panels of small unrolled work + 2 MXU GEMMs,
vs N column steps for LU.  Solves are 2 panel sweeps using the
precomputed unit-triangular panel inverses (GEMM per panel).

No pivoting means accuracy rests on quasidefiniteness + regularization +
the caller's iterative refinement against the true system -- exactly the
QDLDL/OSQP recipe (static reg + refine), which is also what makes this
viable in f32 where the condensed Schur path fails (cond(S) ~ cond(H)^2
for P = 0; here the factor sees cond(K) ~ cond(H)).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _tri_unit_inv(L):
    """Inverse of a batched unit-lower-triangular (B, p, p) by unrolled
    forward substitution (p static steps; p is small)."""
    B, p, _ = L.shape
    eye = jnp.eye(p, dtype=L.dtype)
    X = jnp.broadcast_to(eye, L.shape)
    # X row i of L^{-1}: rows computed top-down; L X = I =>
    # X[i] = e_i - sum_{j<i} L[i, j] X[j]
    rows = []
    for i in range(p):
        acc = jnp.broadcast_to(eye[i], (B, p))
        if i:
            prev = jnp.stack(rows, axis=1)            # (B, i, p)
            acc = acc - jnp.einsum('bj,bjk->bk', L[:, i, :i], prev)
        rows.append(acc)
    return jnp.stack(rows, axis=1)


def _ldl_panel(A, signs, delta):
    """Unblocked LDL^T of a batched (B, p, p) symmetric block (unrolled).

    Returns (L unit-lower, d (B, p)).  Pivots are dynamically
    regularized toward their EXPECTED sign (Clarabel's
    dynamic_regularization recipe for quasidefinite KKTs): pivot j is
    clamped to signs[j] * max(|d_j|, delta) -- a tiny or wrong-signed
    pivot (unpivoted elimination roundoff) becomes a bounded
    perturbation the caller's iterative refinement removes, instead of
    an unbounded growth factor."""
    B, p, _ = A.shape
    dtype = A.dtype
    L = jnp.zeros((B, p, p), dtype)
    L = L + jnp.eye(p, dtype=dtype)
    d = jnp.zeros((B, p), dtype)
    for j in range(p):
        dj = A[:, j, j]
        sj = float(signs[j])
        dj = sj * jnp.maximum(sj * dj, delta)
        col = A[:, :, j] / dj[:, None]                # (B, p); rows <= j junk
        mask = (jnp.arange(p) > j)
        col = jnp.where(mask[None, :], col, 0.0)
        L = L.at[:, :, j].add(col)
        d = d.at[:, j].set(dj)
        A = A - dj[:, None, None] * col[:, :, None] * col[:, None, :]
    return L, d


def ldl_factor(K, panel: int = 16, signs=None, dyn_delta=None):
    """Blocked LDL^T of batched symmetric quasidefinite K (B, N, N).

    ``signs``: length-N +-1 array of EXPECTED pivot signs (quasidefinite
    inertia: +1 on the primal block, -1 on the dual blocks); defaults to
    all +1.  ``dyn_delta``: dynamic pivot-regularization floor (default
    ~sqrt(eps) of the dtype; pivots are clamped to
    signs * max(|d|, dyn_delta) -- callers refine against the true K).
    Returns a dict for ldl_solve: L (B, N, N) unit-lower, d (B, N),
    Linv (B, nbp, p, p) panel inverses, panel, N."""
    import numpy as np
    B, N, _ = K.shape
    dtype = K.dtype
    p = min(panel, N)
    nbp = -(-N // p)
    Np = nbp * p
    if signs is None:
        signs = np.ones(N)
    signs = np.concatenate([np.asarray(signs, float),
                            np.ones(Np - N)])
    if dyn_delta is None:
        dyn_delta = float(jnp.finfo(dtype).eps) ** 0.5 * 0.1
    delta = jnp.asarray(dyn_delta, dtype)
    if Np != N:
        # pad with an identity tail: decoupled trivial pivots
        Kp = jnp.zeros((B, Np, Np), dtype)
        Kp = Kp.at[:, :N, :N].set(K)
        Kp = Kp.at[:, jnp.arange(N, Np), jnp.arange(N, Np)].set(1.0)
        K = Kp
    A = K
    L = jnp.zeros((B, Np, Np), dtype) + jnp.eye(Np, dtype=dtype)
    d = jnp.zeros((B, Np), dtype)
    Linvs = []
    for k in range(nbp):
        o = k * p
        L11, d1 = _ldl_panel(A[:, o:o + p, o:o + p], signs[o:o + p], delta)
        Linv = _tri_unit_inv(L11)
        Linvs.append(Linv)
        L = L.at[:, o:o + p, o:o + p].set(L11)
        d = d.at[:, o:o + p].set(d1)
        if o + p < Np:
            # Minv = (D1 L11')^{-1} = L11'^{-1} D1^{-1}
            Minv = jnp.swapaxes(Linv, 1, 2) / d1[:, None, :]
            L21 = jnp.einsum('bij,bjk->bik', A[:, o + p:, o:o + p], Minv)
            L = L.at[:, o + p:, o:o + p].set(L21)
            W = L21 * d1[:, None, :]                   # L21 D1
            A = A.at[:, o + p:, o + p:].add(
                -jnp.einsum('bik,bjk->bij', W, L21))
    return dict(L=L, d=d, Linv=jnp.stack(Linvs, axis=1), panel=p, N=N,
                Np=Np)


def ldl_inverse(fac):
    """Explicit inverse of the (regularized) factored matrix: solve
    K' X = I with the panel sweeps applied to ALL columns at once -- the
    per-panel ops become real (B, ., p) x (B, p, N) GEMMs (MXU work)
    instead of matvecs, so on TPU ONE inverse build per factorization +
    one einsum per solve replaces ~40 launch-bound sweep ops per solve.

    Accuracy note: applying Kinv has relative error ~ eps * cond(K'),
    and cond(K') is CAPPED by the dynamic pivot regularization
    (~1/dyn_delta), so the caller's iterative refinement against the
    true K contracts exactly as it does with the sweep solve."""
    L, d, Linv = fac['L'], fac['d'], fac['Linv']
    p, N, Np = fac['panel'], fac['N'], fac['Np']
    B = L.shape[0]
    dtype = L.dtype
    nbp = Np // p

    def linv_k(k):
        # XLA factor stores Linv (B, nbp, p, p); the Pallas factor flat
        # (B, nbp*p, p)
        if Linv.ndim == 4:
            return Linv[:, k]
        return Linv[:, k * p:(k + 1) * p, :]

    # forward: L Z = I  (columns of Z computed panel-by-panel)
    R = jnp.broadcast_to(jnp.eye(Np, dtype=dtype), (B, Np, Np))
    zs = []
    for k in range(nbp):
        o = k * p
        Zk = jnp.einsum('bij,bjc->bic', linv_k(k), R[:, o:o + p, :])
        zs.append(Zk)
        if o + p < Np:
            R = R.at[:, o + p:, :].add(
                -jnp.einsum('bij,bjc->bic', L[:, o + p:, o:o + p], Zk))
    Z = jnp.concatenate(zs, axis=1)
    W = Z / jnp.where(jnp.abs(d) < jnp.finfo(dtype).tiny,
                      jnp.finfo(dtype).tiny, d)[:, :, None]
    # backward: L' X = W
    R = W
    xs = [None] * nbp
    for k in reversed(range(nbp)):
        o = k * p
        Xk = jnp.einsum('bji,bjc->bic', linv_k(k), R[:, o:o + p, :])
        xs[k] = Xk
        if o:
            R = R.at[:, :o, :].add(
                -jnp.einsum('bij,bic->bjc', L[:, o:o + p, :o], Xk))
    X = jnp.concatenate(xs, axis=1)
    return X[:, :N, :N]


def ldl_solve(fac, b):
    """Solve K x = b given ldl_factor output; b (B, N) -> x (B, N)."""
    L, d, Linv = fac['L'], fac['d'], fac['Linv']
    p, N, Np = fac['panel'], fac['N'], fac['Np']
    B = b.shape[0]
    dtype = b.dtype
    nbp = Np // p
    if Np != N:
        b = jnp.concatenate([b, jnp.zeros((B, Np - N), dtype)], axis=1)
    # forward: L z = b (right-looking panel sweep)
    r = b
    zs = []
    for k in range(nbp):
        o = k * p
        zk = jnp.einsum('bij,bj->bi', Linv[:, k], r[:, o:o + p])
        zs.append(zk)
        if o + p < Np:
            r = r.at[:, o + p:].add(
                -jnp.einsum('bij,bj->bi', L[:, o + p:, o:o + p], zk))
    z = jnp.concatenate(zs, axis=1)
    w = z / jnp.where(jnp.abs(d) < jnp.finfo(dtype).tiny,
                      jnp.finfo(dtype).tiny, d)
    # backward: L' x = w (panel sweep from the bottom)
    r = w
    xs = [None] * nbp
    for k in reversed(range(nbp)):
        o = k * p
        # L'[k, k] = L11', solve with Linv'
        xk = jnp.einsum('bji,bj->bi', Linv[:, k], r[:, o:o + p])
        xs[k] = xk
        if o:
            # subtract L'[0:k, k] xk = (L[k-rows, 0:o])' xk from r[:o]
            r = r.at[:, :o].add(
                -jnp.einsum('bij,bi->bj', L[:, o:o + p, :o], xk))
    x = jnp.concatenate(xs, axis=1)
    return x[:, :N]
