"""Block-banded batched ADMM QP solver (long-horizon families).

Long-horizon QP families (MPC with large H, battery charging with
T ~ 1440, reference examples/charging.ipynb) have KKT matrices
M = P + sigma I + A' diag(rho) A that are block-tridiagonal after a
bandwidth-reducing variable permutation: dense (B, n, n) storage and
O(n^2) iteration matvecs are prohibitive at n ~ 3000.  The reference
handles these on CPU with a sparse QDLDL factorization inside OSQP
(reference cvxpygen/solvers/osqp.py + vendored osqp/qdldl); the
TPU-native shape is different:

- OFFLINE (family compile time, NumPy): build the structural pattern of
  M, find a reverse-Cuthill-McKee permutation, detect the block
  bandwidth s, and precompute static index structures: sparse A/P
  gather/segment indices and the A-row nonzero PAIR products that
  assemble A' diag(rho) A directly into banded (D, L) block storage.
- ONLINE (jitted): canonicalization emits only the nnz values; matvecs
  are gather + segment_sum (VPU), the banded M is one segment_sum over
  the precomputed pair slots, and the KKT solve is the O(log nb)-depth
  block-tridiagonal factor/solve of ops/block_tridiag.py (batched s x s
  MXU GEMMs via associative_scan).

Per-iteration cost drops from O(n^2) to O(nnz + nb s^2); memory from
O(n^2) to O(nb s^2) per instance -- charging T=1440 (n=2881) fits where
the dense path cannot materialize.

Math is identical to solvers/admm.py `_admm_solve_impl` (OSQP alg. 1-3
with Ruiz equilibration, per-row rho, residual termination,
infeasibility certificates); see tests/test_admm_banded.py for the
equivalence tests against the dense path.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.block_tridiag import bt_matvec, cr_factor, cr_solve
from .admm import ADMMSettings

_INF = 1e30


# ---------------------------------------------------------------------------
# offline structure analysis (NumPy, family compile time)
# ---------------------------------------------------------------------------

@dataclass
class BandedStructure:
    """Static index structure for one block-banded QP family."""
    n: int                 # original variable count
    m: int                 # constraint rows
    s: int                 # block size
    nb: int                # number of blocks (n_pad = nb * s)
    order: np.ndarray      # permuted position p holds original var order[p]
    pos: np.ndarray        # pos[v] = permuted position of original var v
    # sparse A (row, permuted col) and P (permuted row/col) indices
    a_row: np.ndarray
    a_col: np.ndarray
    p_row: np.ndarray
    p_col: np.ndarray
    # A-row nonzero pairs assembling A' diag(rho) A into banded slots
    pr_k1: np.ndarray      # index into A nnz
    pr_k2: np.ndarray
    pr_row: np.ndarray     # constraint row of the pair
    pr_slot: np.ndarray    # banded slot id
    p_slot: np.ndarray     # banded slot id per P nonzero
    diag_slot: np.ndarray  # banded slot of (i, i) for i in range(n_pad)
    n_slots: int

    @property
    def n_pad(self):
        return self.nb * self.s

    @property
    def d_size(self):
        return self.nb * self.s * self.s


def _banded_slot(i, j, s, nb):
    """Slot id for entry (i, j) in (D, L) block storage; -1 if the entry
    falls in the upper off-diagonal block (implied by symmetry) or out of
    band."""
    bi, bj = i // s, j // s
    d_size = nb * s * s
    slot = np.where(
        bi == bj, bi * s * s + (i % s) * s + (j % s),
        np.where(bi == bj + 1,
                 d_size + (bi - 1) * s * s + (i % s) * s + (j % s),
                 -1))
    return slot


def analyze_banded(P_idx, A_idx, n, m,
                   s_candidates=(4, 8, 16, 32, 48, 64),
                   min_blocks=4, density_gain=2.0) -> Optional[dict]:
    """RCM-permute the KKT pattern and find the smallest block size s that
    makes it block-tridiagonal.  Returns dict(order, pos, s, nb) or None
    (family not (usefully) banded)."""
    import scipy.sparse as spa
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    pr, pc = (np.asarray(P_idx[0], np.int64),
              np.asarray(P_idx[1], np.int64)) if len(P_idx[0]) else \
        (np.zeros(0, np.int64), np.zeros(0, np.int64))
    ar, ac = np.asarray(A_idx[0], np.int64), np.asarray(A_idx[1], np.int64)
    ones = np.ones
    Astruct = spa.coo_matrix((ones(len(ar)), (ar, ac)), shape=(m, n)).tocsr()
    Mpat = (spa.coo_matrix((ones(len(pr)), (pr, pc)), shape=(n, n))
            + Astruct.T @ Astruct + spa.eye(n)).tocsr()
    Mpat.data[:] = 1.0
    order = np.asarray(reverse_cuthill_mckee(Mpat, symmetric_mode=True),
                       dtype=np.int64)
    pos = np.empty(n, np.int64)
    pos[order] = np.arange(n)
    Mp = Mpat[order][:, order].tocoo()
    r, c = Mp.row, Mp.col
    for s in s_candidates:
        nb = -(-n // s)
        if nb < min_blocks:
            continue
        if not np.all(np.abs(r // s - c // s) <= 1):
            continue
        # only worthwhile when banded matvec/factor beats dense by a margin
        if nb * 3 * s * s * density_gain > n * n:
            return None
        return dict(order=order, pos=pos, s=int(s), nb=int(nb))
    return None


def build_banded_structure(P_idx, A_idx, n, m, **kw) -> \
        Optional[BandedStructure]:
    """Full offline analysis: permutation + pair-product slot structure."""
    info = analyze_banded(P_idx, A_idx, n, m, **kw)
    if info is None:
        return None
    order, pos, s, nb = (info['order'], info['pos'], info['s'], info['nb'])
    a_row = np.asarray(A_idx[0], np.int64)
    a_col = pos[np.asarray(A_idx[1], np.int64)]
    p_row = pos[np.asarray(P_idx[0], np.int64)] if len(P_idx[0]) else \
        np.zeros(0, np.int64)
    p_col = pos[np.asarray(P_idx[1], np.int64)] if len(P_idx[1]) else \
        np.zeros(0, np.int64)

    # A-row nonzero pairs: for each constraint row, every ordered pair of
    # nonzeros (k1, k2) contributes vals[k1]*vals[k2]*rho[row] to
    # M[col(k1), col(k2)].  Keep pairs landing in D or L (lower) slots.
    rows_order = np.argsort(a_row, kind='stable')
    sorted_rows = a_row[rows_order]
    starts = np.searchsorted(sorted_rows, np.arange(m), side='left')
    ends = np.searchsorted(sorted_rows, np.arange(m), side='right')
    k1l, k2l, rowl = [], [], []
    for rr in range(m):
        ks = rows_order[starts[rr]:ends[rr]]
        if len(ks) == 0:
            continue
        g1, g2 = np.meshgrid(ks, ks, indexing='ij')
        k1l.append(g1.ravel())
        k2l.append(g2.ravel())
        rowl.append(np.full(g1.size, rr, np.int64))
    if k1l:
        pr_k1 = np.concatenate(k1l)
        pr_k2 = np.concatenate(k2l)
        pr_row = np.concatenate(rowl)
    else:
        pr_k1 = pr_k2 = pr_row = np.zeros(0, np.int64)
    pr_slot = _banded_slot(a_col[pr_k1], a_col[pr_k2], s, nb)
    keep = pr_slot >= 0
    pr_k1, pr_k2, pr_row, pr_slot = (pr_k1[keep], pr_k2[keep],
                                     pr_row[keep], pr_slot[keep])
    p_slot = _banded_slot(p_row, p_col, s, nb)
    if np.any(p_slot < -1):
        raise AssertionError('P entry out of band')
    pk = p_slot >= 0
    # P upper off-diagonal-block entries are implied by symmetry: they are
    # dropped from the banded assembly but kept in the matvec index set
    diag = np.arange(nb * s)
    diag_slot = _banded_slot(diag, diag, s, nb)
    n_slots = nb * s * s + max(nb - 1, 0) * s * s
    return BandedStructure(
        n=n, m=m, s=s, nb=nb, order=order, pos=pos,
        a_row=a_row, a_col=a_col, p_row=p_row, p_col=p_col,
        pr_k1=pr_k1, pr_k2=pr_k2, pr_row=pr_row, pr_slot=pr_slot,
        p_slot=np.where(pk, p_slot, n_slots),  # dropped -> overflow slot
        diag_slot=diag_slot, n_slots=n_slots)


# ---------------------------------------------------------------------------
# online (jitted) pieces
# ---------------------------------------------------------------------------

def _seg_sum(vals, ids, num):
    """Batched segment sum: vals (B, K), ids (K,) -> (B, num)."""
    return jax.ops.segment_sum(vals.T, ids, num_segments=num).T


def _seg_max(vals, ids, num):
    out = jax.ops.segment_max(vals.T, ids, num_segments=num).T
    return jnp.maximum(out, 0.0)  # empty segments -> -inf -> 0


def assemble_banded_M(st: BandedStructure, pvals, avals, rho, sigma, dtype):
    """(D, L) blocks of M = P + sigma I + A' diag(rho) A."""
    B = avals.shape[0]
    pairs = (avals[:, st.pr_k1] * avals[:, st.pr_k2]
             * rho[:, st.pr_row])                      # (B, npairs)
    sig = jnp.full((B, st.n_pad), sigma, dtype)
    vals = jnp.concatenate([pairs, pvals, sig], axis=1)
    ids = np.concatenate([st.pr_slot, st.p_slot, st.diag_slot])
    flat = _seg_sum(vals, jnp.asarray(ids), st.n_slots + 1)[:, :st.n_slots]
    s, nb = st.s, st.nb
    D = flat[:, :nb * s * s].reshape(B, nb, s, s)
    L = flat[:, nb * s * s:].reshape(B, max(nb - 1, 0), s, s)
    return D, L


def admm_solve_banded(st: BandedStructure, pvals, q, avals, l, u, n_eq,
                      settings: ADMMSettings, x0=None, y0=None):
    """Solve a batch of banded QPs.  pvals (B, nP) / avals (B, nA) are the
    canonical nonzero values (theta-affine images); q (B, n), l/u (B, m).
    Same return contract as solvers/admm.admm_solve."""
    with jax.default_matmul_precision('highest'):
        return _banded_impl(st, pvals, q, avals, l, u, n_eq, settings,
                            x0, y0)


def _banded_impl(st, pvals, q, avals, l, u, n_eq, stg, x0, y0):
    B, nA = avals.shape
    dtype = q.dtype
    n, m, n_pad = st.n, st.m, st.n_pad
    a_row = jnp.asarray(st.a_row)
    a_col = jnp.asarray(st.a_col)
    p_row = jnp.asarray(st.p_row)
    p_col = jnp.asarray(st.p_col)
    order = jnp.asarray(st.order)
    pos = jnp.asarray(st.pos)

    l = jnp.clip(l, -_INF, _INF)
    u = jnp.clip(u, -_INF, _INF)

    # q in permuted + padded space
    qp = jnp.concatenate(
        [q[:, order], jnp.zeros((B, n_pad - n), dtype)], axis=1)

    def Av(x):                       # (B, n_pad) -> (B, m)
        return _seg_sum(avals * x[:, a_col], a_row, m)

    def Atv(y):                      # (B, m) -> (B, n_pad)
        return _seg_sum(avals * y[:, a_row], a_col, n_pad)

    def Pv(x):
        return _seg_sum(pvals * x[:, p_col], p_row, n_pad)

    # ---- Ruiz equilibration on the sparse values (admm.ruiz_equilibrate
    # math on [[P, A'],[A, 0]] + cost scaling) ----
    c = jnp.ones((B,), dtype)
    D = jnp.ones((B, n_pad), dtype)
    E = jnp.ones((B, m), dtype)
    g_abs = None
    for _ in range(stg.scaling):
        nx_P = _seg_max(jnp.abs(pvals), p_col, n_pad)
        nx_A = _seg_max(jnp.abs(avals), a_col, n_pad)
        nx = jnp.maximum(nx_P, nx_A)
        nc = _seg_max(jnp.abs(avals), a_row, m)
        dx = jnp.where(nx > 1e-12,
                       1.0 / jnp.sqrt(jnp.maximum(nx, 1e-12)), 1.0)
        dc = jnp.where(nc > 1e-12,
                       1.0 / jnp.sqrt(jnp.maximum(nc, 1e-12)), 1.0)
        dx = jnp.clip(dx, 1e-4, 1e4)
        dc = jnp.clip(dc, 1e-4, 1e4)
        pvals = pvals * dx[:, p_row] * dx[:, p_col]
        avals = avals * dc[:, a_row] * dx[:, a_col]
        qp = qp * dx
        D = D * dx
        E = E * dc
        col = jnp.sum(_seg_max(jnp.abs(pvals), p_col, n_pad),
                      axis=1) / n                       # mean over real cols
        col = jnp.where(col < 1e-12, 1.0, col)
        qn = jnp.max(jnp.abs(qp), axis=1)
        qn = jnp.where(qn < 1e-12, 1.0, qn)
        g = jnp.clip(1.0 / jnp.maximum(col, qn), 1e-4, 1e4)
        pvals = pvals * g[:, None]
        qp = qp * g[:, None]
        c = c * g
    ls = E * l
    us = E * u
    c_inv = 1.0 / c
    D_inv = 1.0 / D
    E_inv = 1.0 / E

    is_eq = jnp.arange(m) < n_eq
    rho_base = jnp.broadcast_to(
        jnp.where(is_eq, stg.rho * stg.rho_eq_scale, stg.rho).astype(dtype),
        (B, m))

    def factor(rho_vec):
        # block cyclic reduction (ops/block_tridiag.cr_factor): ~9x fewer
        # FLOPs per solve than the associative-scan path at nb ~ 500
        # (solve phase is O(nb s^2) matvecs, not O(nb log nb s^3)
        # matmuls) -- the round-3 banded-engine speedup
        Db, Lb = assemble_banded_M(st, pvals, avals, rho_vec, stg.sigma,
                                   dtype)
        return cr_factor(Db, Lb), (Db, Lb)

    fac0, DL0 = factor(rho_base)

    def kkt_apply(fac, DL, rhs):
        xt = cr_solve(fac, rhs.reshape(B, st.nb, st.s)).reshape(B, n_pad)
        for _ in range(stg.kkt_refine):
            r = rhs - bt_matvec(*DL, xt.reshape(B, st.nb, st.s)
                                ).reshape(B, n_pad)
            xt = xt + cr_solve(fac, r.reshape(B, st.nb, st.s)
                               ).reshape(B, n_pad)
        return xt

    if x0 is not None:
        x0p = jnp.concatenate(
            [x0.astype(dtype)[:, order], jnp.zeros((B, n_pad - n), dtype)],
            axis=1)
        x_init = D_inv * x0p
        # scaled avals = E_i A_ij D_j, so Av(D^{-1} x0) == E * (A_orig x0)
        z_init = Av(x_init)
    else:
        x_init = jnp.zeros((B, n_pad), dtype)
        z_init = jnp.zeros((B, m), dtype)
    y_init = (c[:, None] * E_inv * y0.astype(dtype)
              if y0 is not None else jnp.zeros((B, m), dtype))

    def one_iter(carry, fac, DL, rho_vec):
        x, z, y = carry
        rhs = stg.sigma * x - qp + Atv(rho_vec * z - y)
        xt = kkt_apply(fac, DL, rhs)
        zt = Av(xt)
        x1 = stg.alpha * xt + (1 - stg.alpha) * x
        w = stg.alpha * zt + (1 - stg.alpha) * z + y / rho_vec
        z1 = jnp.clip(w, ls, us)
        y1 = rho_vec * (w - z1)
        return x1, z1, y1

    def _inf_norm(v):
        return jnp.max(jnp.abs(v), axis=-1)

    def residuals(x, z, y, Ax, Px, Aty):
        rp = _inf_norm(E_inv * (Ax - z))
        rp_den = jnp.maximum(_inf_norm(E_inv * Ax), _inf_norm(E_inv * z))
        rd = c_inv * _inf_norm(D_inv * (Px + qp + Aty))
        rd_den = c_inv * jnp.maximum(
            jnp.maximum(_inf_norm(D_inv * Px), _inf_norm(D_inv * Aty)),
            _inf_norm(D_inv * qp))
        ok = ((rp <= stg.eps_abs + stg.eps_rel * rp_den)
              & (rd <= stg.eps_abs + stg.eps_rel * rd_den))
        return rp, rd, rp_den, rd_den, ok

    def infeasibility(dx, dy, Pdx, Adx, Atdy):
        eps = jnp.asarray(1e-4, dtype)
        dy_n = _inf_norm(E * dy) * c_inv
        cert_p1 = _inf_norm(D_inv * Atdy) * c_inv <= eps * dy_n
        u_fin = jnp.where(us < _INF * 0.5, us * E_inv, 0.0)
        l_fin = jnp.where(ls > -_INF * 0.5, ls * E_inv, 0.0)
        sup = jnp.sum(u_fin * jnp.maximum(E * dy, 0.0)
                      + l_fin * jnp.minimum(E * dy, 0.0), axis=1) * c_inv
        open_dir = (jnp.any((dy > 1e-12) & (us >= _INF * 0.5), axis=1)
                    | jnp.any((dy < -1e-12) & (ls <= -_INF * 0.5), axis=1))
        prim_inf = ((dy_n > 1e-10) & cert_p1 & (sup <= -eps * dy_n)
                    & ~open_dir)
        dx_n = _inf_norm(D * dx)
        cert_d1 = _inf_norm(D_inv * Pdx) * c_inv <= eps * dx_n
        cert_d2 = (jnp.einsum('bi,bi->b', qp, dx) * c_inv) <= -eps * dx_n
        up_ok = jnp.where(us >= _INF * 0.5, True,
                          E_inv * Adx <= eps * dx_n[:, None])
        lo_ok = jnp.where(ls <= -_INF * 0.5, True,
                          E_inv * Adx >= -eps * dx_n[:, None])
        dual_inf = ((dx_n > 1e-10) & cert_d1 & cert_d2
                    & jnp.all(up_ok & lo_ok, axis=1))
        return prim_inf, dual_inf

    adaptive = stg.adaptive_rho

    def cond(state):
        it, done = state[7], state[8]
        return (~jnp.all(done)) & (it < stg.max_iter)

    def body(state):
        (x, z, y, rho_scale, fac, Db, Lb, it, done, it_vec,
         rp_last, rd_last, status) = state
        rho_vec = rho_base * rho_scale[:, None]
        DL = (Db, Lb)

        def inner(_, carry):
            return one_iter(carry, fac, DL, rho_vec)
        xn, zn, yn = jax.lax.fori_loop(0, stg.check_interval, inner,
                                       (x, z, y))
        mask = done[:, None]
        dx = jnp.where(mask, 0.0, xn - x)
        dy = jnp.where(mask, 0.0, yn - y)
        x = jnp.where(mask, x, xn)
        z = jnp.where(mask, z, zn)
        y = jnp.where(mask, y, yn)
        it = it + stg.check_interval
        rp, rd, rp_den, rd_den, ok = residuals(x, z, y, Av(x), Pv(x),
                                               Atv(y))
        p_inf, d_inf = infeasibility(dx, dy, Pv(dx), Av(dx), Atv(dy))
        newly = ok & (~done)
        it_vec = jnp.where(newly, it, it_vec)
        status = jnp.where(ok & (status == 0), 1, status)
        status = jnp.where(p_inf & (status == 0), -3, status)
        status = jnp.where(d_inf & (status == 0), -4, status)
        done = done | ok | p_inf | d_inf

        if adaptive:
            ratio = jnp.sqrt(
                (rp / jnp.maximum(rp_den, 1e-10))
                / jnp.maximum(rd / jnp.maximum(rd_den, 1e-10), 1e-10))
            tol = stg.adaptive_rho_tolerance
            change = ((ratio > tol) | (ratio < 1.0 / tol)) & (~done)
            step_f = jnp.clip(jnp.where(change, ratio, 1.0), 0.1, 10.0)
            new_scale = jnp.clip(rho_scale * step_f, 1e-6, 1e6)

            def refactor(_):
                f, (Dn, Ln) = factor(rho_base * new_scale[:, None])
                return f, Dn, Ln

            fac, Db, Lb = jax.lax.cond(
                jnp.any(change), refactor,
                lambda _: (fac, Db, Lb), operand=None)
            rho_scale = new_scale

        return (x, z, y, rho_scale, fac, Db, Lb, it, done, it_vec,
                rp, rd, status)

    state0 = (x_init, z_init, y_init, jnp.ones((B,), dtype), fac0,
              DL0[0], DL0[1], jnp.int32(0),
              jnp.zeros((B,), jnp.bool_), jnp.zeros((B,), jnp.int32),
              jnp.full((B,), jnp.inf, dtype),
              jnp.full((B,), jnp.inf, dtype),
              jnp.zeros((B,), jnp.int32))
    (x, z, y, _, _, _, _, it, done, it_vec, rp, rd,
     status) = jax.lax.while_loop(cond, body, state0)
    it_vec = jnp.where(done, it_vec, it)

    # unscale + unpermute back to original variable order
    x_u = (D * x)[:, pos]
    z_u = E_inv * z
    y_u = c_inv[:, None] * E * y
    obj = c_inv * (0.5 * jnp.sum(pvals * x[:, p_row] * x[:, p_col], axis=1)
                   + jnp.einsum('bi,bi->b', qp, x))
    obj = jnp.where(status == -3, jnp.inf, obj)
    obj = jnp.where(status == -4, -jnp.inf, obj)
    return dict(x=x_u, y=y_u, z=z_u, obj=obj, iters=it_vec,
                pri_res=rp, dua_res=rd, solved=(status == 1),
                status=status)
