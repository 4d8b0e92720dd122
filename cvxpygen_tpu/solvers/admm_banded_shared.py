"""Shared-KKT block-banded batched ADMM (long-horizon families).

Companion of solvers/admm_shared.py at block-banded scale: when the
theta batch shares canonical P and A (e.g. the charging family varying
only prices -- reference examples/charging.ipynb re-solves with updated
``p``/``s`` vectors only), the banded KKT matrix
M = P + sigma I + A' diag(rho) A is ONE shared block-tridiagonal matrix:

- cyclic-reduction factorization runs once per rho configuration at
  B = 1 (cheap XLA; ops/block_tridiag.cr_factor);
- every ``check_interval`` iterations run in ONE fused Pallas launch
  (ops/banded_shared_kernel.py) with the CR factors, grouped A, and all
  state VMEM-resident -- the round-3 engine paid ~60 HBM-streaming XLA
  ops per single iteration instead (BENCH.md speed-of-light analysis);
- adaptive rho is batch-shared (geometric mean over active instances,
  as in solvers/admm_shared.py) so the factorization stays shared.

The per-instance banded engine (solvers/admm_banded.py) remains the
general path when P/A genuinely vary across the batch.  Math follows
OSQP alg. 1-3 (reference vendored osqp; cvxpygen/solvers/osqp.py role);
equivalence tests: tests/test_admm_banded_shared.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.banded_grouped import (GroupedA, group_rows, pack_cr_levels,
                                  scatter_grouped, ungroup_rows)
from ..ops.banded_shared_kernel import banded_shared_chunk
from ..ops.block_tridiag import cr_factor
from .admm import ADMMSettings
from .admm_banded import BandedStructure, assemble_banded_M

_INF = 1e30


def _seg_max1(vals, ids, num):
    out = jax.ops.segment_max(vals, ids, num_segments=num)
    return jnp.maximum(out, 0.0)


def ruiz_banded_shared(st: BandedStructure, pvals, avals, q_env, iters):
    """Shared Ruiz scaling on the sparse values (single shared instance;
    same math as solvers/admm_banded.py's batched loop at B=1, with the
    batch-envelope |q| for the cost scaling as in
    solvers/admm_shared.ruiz_equilibrate_shared)."""
    n_pad, m = st.n_pad, st.m
    dtype = pvals.dtype
    p_row = jnp.asarray(st.p_row)
    p_col = jnp.asarray(st.p_col)
    a_row = jnp.asarray(st.a_row)
    a_col = jnp.asarray(st.a_col)
    c = jnp.ones((), dtype)
    D = jnp.ones((n_pad,), dtype)
    E = jnp.ones((m,), dtype)
    q_col = q_env
    n_real = st.n
    for _ in range(iters):
        nx_P = _seg_max1(jnp.abs(pvals), p_col, n_pad)
        nx_A = _seg_max1(jnp.abs(avals), a_col, n_pad)
        nx = jnp.maximum(nx_P, nx_A)
        nc = _seg_max1(jnp.abs(avals), a_row, m)
        dx = jnp.where(nx > 1e-12,
                       1.0 / jnp.sqrt(jnp.maximum(nx, 1e-12)), 1.0)
        dc = jnp.where(nc > 1e-12,
                       1.0 / jnp.sqrt(jnp.maximum(nc, 1e-12)), 1.0)
        dx = jnp.clip(dx, 1e-4, 1e4)
        dc = jnp.clip(dc, 1e-4, 1e4)
        pvals = pvals * dx[p_row] * dx[p_col]
        avals = avals * dc[a_row] * dx[a_col]
        q_col = q_col * dx
        D = D * dx
        E = E * dc
        col = jnp.sum(_seg_max1(jnp.abs(pvals), p_col, n_pad)) / n_real
        col = jnp.where(col < 1e-12, 1.0, col)
        qn = jnp.max(jnp.abs(q_col))
        qn = jnp.where(qn < 1e-12, 1.0, qn)
        g = jnp.clip(1.0 / jnp.maximum(col, qn), 1e-4, 1e4)
        pvals = pvals * g
        q_col = q_col * g
        c = c * g
    return pvals, avals, c, D, E


def admm_solve_banded_shared(st: BandedStructure, ga: GroupedA,
                             pvals, q, avals, l, u, n_eq,
                             settings: ADMMSettings, x0=None, y0=None,
                             interpret=False):
    """Solve a batch sharing canonical P/A.  pvals/avals (nnz,) SHARED
    values; q (B, n), l/u (B, m) batched.  Same contract as
    admm_banded.admm_solve_banded.

    Two engines, picked by problem size (the Mosaic register allocator
    gives vector values essentially NO spill-slot reuse, so a fused
    kernel's TOTAL per-body value bytes must fit VMEM -- measured
    ~0.85MB x nb of spill slots, i.e. the fused chunk kernel only
    compiles up to nb ~ 96):
    - small nb: the fully fused chunk kernel (banded_shared_chunk);
    - large nb: the XLA iteration loop with the CR solve collapsed into
      ONE launch per application (cr_solve_pallas) -- the ~32-op CR
      tree was the round-3 engine's dominant launch cost."""
    with jax.default_matmul_precision('highest'):
        if st.nb <= 96:
            return _impl(st, ga, pvals, q, avals, l, u, n_eq, settings,
                         x0, y0, interpret)
        return _impl_crk(st, ga, pvals, q, avals, l, u, n_eq, settings,
                         x0, y0, interpret)


def _impl_crk(st, ga, pvals, q, avals, l, u, n_eq, stg, x0, y0,
              interpret):
    """Shared-P/A banded ADMM: XLA loop + one-launch CR solves.

    All iteration state lives in the GROUPED block layouts (x-space
    (nb, s, B); row-space (nb, r_max, B)) so the per-iteration A/A'
    matvecs are two batched einsums against the dense grouped blocks
    B0/B1 (ops/banded_grouped.py) and the CR kernel consumes/produces
    its native layout directly -- the round-3 engine paid per-iteration
    segment gather/scatter matvecs over (B, nnz) plus two full-state
    transposes around every CR launch instead (~8 extra HBM-streaming
    XLA ops/iteration, the residual launch-bound term in BENCH.md's
    speed-of-light accounting)."""
    from ..ops.banded_shared_kernel import cr_solve_pallas

    B = q.shape[0]
    dtype = q.dtype
    n, m, n_pad, s, nb = st.n, st.m, st.n_pad, st.s, st.nb
    r_max = ga.r_max
    order = jnp.asarray(st.order)
    pos = jnp.asarray(st.pos)
    p_row = jnp.asarray(st.p_row)
    p_col = jnp.asarray(st.p_col)

    l = jnp.clip(l, -_INF, _INF)
    u = jnp.clip(u, -_INF, _INF)

    qp = jnp.concatenate(
        [q[:, order], jnp.zeros((B, n_pad - n), dtype)], axis=1)
    q_env = jnp.max(jnp.abs(qp), axis=0)
    pvals, avals, c, D, E = ruiz_banded_shared(
        st, pvals, avals, q_env, stg.scaling)
    qp = qp * D[None, :] * c
    ls = l * E[None, :]
    us = u * E[None, :]
    c_inv = 1.0 / c
    D_inv = 1.0 / D
    E_inv = 1.0 / E

    is_eq = np.arange(m) < n_eq
    rho_base = jnp.asarray(
        np.where(is_eq, stg.rho * stg.rho_eq_scale, stg.rho), dtype)

    # grouped shared tensors (same layout family as _impl's chunk kernel)
    B0, B1 = scatter_grouped(ga, avals)               # (nb, r_max, s)
    zero_rho = jnp.zeros((1, m), dtype)
    D_P, L_P = assemble_banded_M(st, pvals[None], avals[None], zero_rho,
                                 0.0, dtype)
    D_P, L_P = D_P[0], L_P[0]                         # (nb,s,s)/(nb-1,s,s)

    def to_x_layout(v):                  # (B, n_pad) -> (nb, s, B)
        return jnp.transpose(v.reshape(B, nb, s), (1, 2, 0))

    def from_x_layout(v):                # (nb, s, B) -> (B, n_pad)
        return jnp.transpose(v, (2, 0, 1)).reshape(B, n_pad)

    def to_r_layout(v, fill):            # (B, m) -> (nb, r_max, B)
        g = group_rows(ga, v, fill=fill)             # (B, nb, r_max)
        return jnp.transpose(g, (1, 2, 0))

    def from_r_layout(v):                # (nb, r_max, B) -> (B, m)
        return ungroup_rows(ga, jnp.transpose(v, (2, 0, 1)))

    zero_blk = jnp.zeros((1, s, B), dtype)

    # the per-iteration matvecs unroll over the SMALL static dims (s,
    # r_max) as broadcast-FMA chains -- XLA fuses each sum into one
    # elementwise loop over the (nb, ., B) state.  The batched-einsum
    # form ((nb, r_max, s) x (nb, s, B) dot_generals) lowers to a slow
    # tiny-tile batched matmul on TPU: measured 130 vs 326 solves/s at
    # the charging T=1440 shapes.
    def Av(x):                       # (nb, s, B) -> (nb, r_max, B)
        xn = jnp.concatenate([x[1:], zero_blk], axis=0)
        acc = B0[:, :, 0, None] * x[:, None, 0, :]
        for j in range(1, s):
            acc = acc + B0[:, :, j, None] * x[:, None, j, :]
        for j in range(s):
            acc = acc + B1[:, :, j, None] * xn[:, None, j, :]
        return acc

    def Atv(t):                      # (nb, r_max, B) -> (nb, s, B)
        lo = B0[:, 0, :, None] * t[:, 0, None, :]
        hi = B1[:, 0, :, None] * t[:, 0, None, :]
        for r in range(1, r_max):
            lo = lo + B0[:, r, :, None] * t[:, r, None, :]
            hi = hi + B1[:, r, :, None] * t[:, r, None, :]
        return lo + jnp.concatenate([zero_blk, hi[:-1]], axis=0)

    def Pv(x):                       # block-tridiag P apply in x layout
        out = jnp.einsum('nij,njb->nib', D_P, x)
        lo = jnp.einsum('nij,njb->nib', L_P, x[:-1])
        hi = jnp.einsum('nji,njb->nib', L_P, x[1:])
        out = out.at[1:].add(lo)
        return out.at[:-1].add(hi)

    def factor(rho_vec):
        D_M, L_M = assemble_banded_M(st, pvals[None], avals[None],
                                     rho_vec[None], stg.sigma, dtype)
        fac = cr_factor(D_M, L_M)
        packed, meta = pack_cr_levels(fac)
        return packed, meta, D_M[0], L_M[0]

    fac0, meta, D_M0, L_M0 = factor(rho_base)

    # NO solve-time refinement on this path: cyclic reduction is a
    # DIRECT factorization (exact to f32 roundoff; the sigma term is
    # part of M itself), unlike the Newton-Schulz inverse paths where
    # refinement is load-bearing.  Measured at T=1440 B=256 on-chip:
    # identical iteration counts with and without (635.5 vs 635.7) and
    # 149 -> 355 solves/s from dropping the second CR launch + the
    # banded-M refine einsums per iteration.

    # grouped constants
    qx = to_x_layout(qp)
    lg = to_r_layout(ls, -_INF)
    ug = to_r_layout(us, _INF)
    E_g = to_r_layout(jnp.broadcast_to(E[None], (B, m)), 0.0)[:, :, :1]
    Einv_g = to_r_layout(jnp.broadcast_to(E_inv[None], (B, m)),
                         0.0)[:, :, :1]               # (nb, r_max, 1)
    D_x = to_x_layout(jnp.broadcast_to(D[None], (B, n_pad)))[:, :, :1]
    Dinv_x = to_x_layout(jnp.broadcast_to(D_inv[None],
                                          (B, n_pad)))[:, :, :1]
    rho_g0 = to_r_layout(jnp.broadcast_to(rho_base[None], (B, m)),
                         1.0)[:, :, :1]               # (nb, r_max, 1)
    ug_fin = ug < _INF * 0.5                          # bound-finiteness
    lg_fin = lg > -_INF * 0.5

    if x0 is not None:
        x0p = jnp.concatenate(
            [x0.astype(dtype)[:, order], jnp.zeros((B, n_pad - n), dtype)],
            axis=1)
        x_init = to_x_layout(D_inv[None, :] * x0p)
        z_init = Av(x_init)
    else:
        x_init = jnp.zeros((nb, s, B), dtype)
        z_init = jnp.zeros((nb, r_max, B), dtype)
    y_init = (to_r_layout(c * E_inv[None, :] * y0.astype(dtype), 0.0)
              if y0 is not None else jnp.zeros((nb, r_max, B), dtype))

    def one_iter(carry, packed, rho_g):
        x, z, y = carry
        rhs = stg.sigma * x - qx + Atv(rho_g * z - y)
        xt = cr_solve_pallas(packed, meta, rhs, interpret=interpret)
        zt = Av(xt)
        x1 = stg.alpha * xt + (1 - stg.alpha) * x
        w = stg.alpha * zt + (1 - stg.alpha) * z + y / rho_g
        z1 = jnp.clip(w, lg, ug)
        y1 = rho_g * (w - z1)
        return x1, z1, y1

    def _inf_norm_r(v):              # (nb, r_max, B) -> (B,)
        return jnp.max(jnp.abs(v), axis=(0, 1))

    def residuals(x, z, y, Ax, Px, Aty):
        rp = _inf_norm_r(Einv_g * (Ax - z))
        rp_den = jnp.maximum(_inf_norm_r(Einv_g * Ax),
                             _inf_norm_r(Einv_g * z))
        rd = c_inv * _inf_norm_r(Dinv_x * (Px + qx + Aty))
        rd_den = c_inv * jnp.maximum(
            jnp.maximum(_inf_norm_r(Dinv_x * Px),
                        _inf_norm_r(Dinv_x * Aty)),
            _inf_norm_r(Dinv_x * qx))
        ok = ((rp <= stg.eps_abs + stg.eps_rel * rp_den)
              & (rd <= stg.eps_abs + stg.eps_rel * rd_den))
        return rp, rd, rp_den, rd_den, ok

    def infeasibility(dx, dy, Pdx, Adx, Atdy):
        eps = jnp.asarray(1e-4, dtype)
        dy_n = _inf_norm_r(E_g * dy) * c_inv
        cert_p1 = _inf_norm_r(Dinv_x * Atdy) * c_inv <= eps * dy_n
        u_fin = jnp.where(ug_fin, ug * Einv_g, 0.0)
        l_fin = jnp.where(lg_fin, lg * Einv_g, 0.0)
        sup = jnp.sum(u_fin * jnp.maximum(E_g * dy, 0.0)
                      + l_fin * jnp.minimum(E_g * dy, 0.0),
                      axis=(0, 1)) * c_inv
        open_dir = (jnp.any((dy > 1e-12) & ~ug_fin, axis=(0, 1))
                    | jnp.any((dy < -1e-12) & ~lg_fin, axis=(0, 1)))
        prim_inf = ((dy_n > 1e-10) & cert_p1 & (sup <= -eps * dy_n)
                    & ~open_dir)
        dx_n = _inf_norm_r(D_x * dx)
        cert_d1 = _inf_norm_r(Dinv_x * Pdx) * c_inv <= eps * dx_n
        cert_d2 = (jnp.sum(qx * dx, axis=(0, 1)) * c_inv) <= -eps * dx_n
        up_ok = jnp.where(ug_fin, Einv_g * Adx <= eps * dx_n[None, None],
                          True)
        lo_ok = jnp.where(lg_fin, Einv_g * Adx >= -eps * dx_n[None, None],
                          True)
        dual_inf = ((dx_n > 1e-10) & cert_d1 & cert_d2
                    & jnp.all(up_ok & lo_ok, axis=(0, 1)))
        return prim_inf, dual_inf

    check = stg.check_interval
    max_iter = (stg.max_iter // check) * check
    adaptive = stg.adaptive_rho

    def cond(state):
        it, done = state[7], state[8]
        return (~jnp.all(done)) & (it < max_iter)

    def body(state):
        (x, z, y, rho_scale, packed, D_M, L_M, it, done, it_vec,
         rp_l, rd_l, status) = state
        rho_g = rho_g0 * rho_scale

        def inner(_, carry):
            return one_iter(carry, packed, rho_g)
        xn, zn, yn = jax.lax.fori_loop(0, check, inner, (x, z, y))
        mask = done[None, None, :]
        dx = jnp.where(mask, 0.0, xn - x)
        dy = jnp.where(mask, 0.0, yn - y)
        x = jnp.where(mask, x, xn)
        z = jnp.where(mask, z, zn)
        y = jnp.where(mask, y, yn)
        it = it + check
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
            active = ~done
            log_r = jnp.where(active,
                              jnp.log(jnp.clip(ratio, 1e-6, 1e6)), 0.0)
            n_act = jnp.maximum(jnp.sum(active), 1)
            comb = jnp.exp(jnp.sum(log_r) / n_act)
            tol = stg.adaptive_rho_tolerance
            change = ((comb > tol) | (comb < 1.0 / tol)) & jnp.any(active)
            step_f = jnp.clip(jnp.where(change, comb, 1.0), 0.1, 10.0)
            new_scale = jnp.clip(rho_scale * step_f, 1e-6, 1e6)

            def refactor(_):
                pk, _m, dm, lm = factor(rho_base * new_scale)
                return pk, dm, lm

            packed, D_M, L_M = jax.lax.cond(
                change, refactor, lambda _: (packed, D_M, L_M),
                operand=None)
            rho_scale = new_scale

        return (x, z, y, rho_scale, packed, D_M, L_M, it, done, it_vec,
                rp, rd, status)

    state0 = (x_init, z_init, y_init, jnp.ones((), dtype), fac0,
              D_M0, L_M0, jnp.int32(0),
              jnp.zeros((B,), jnp.bool_), jnp.zeros((B,), jnp.int32),
              jnp.full((B,), jnp.inf, dtype), jnp.full((B,), jnp.inf, dtype),
              jnp.zeros((B,), jnp.int32))
    (x, z, y, _, _, _, _, it, done, it_vec, rp, rd,
     status) = jax.lax.while_loop(cond, body, state0)
    it_vec = jnp.where(done, it_vec, it)

    xf = from_x_layout(x)                       # (B, n_pad) scaled
    x_u = (D[None, :] * xf)[:, pos]
    z_u = E_inv[None, :] * from_r_layout(z)
    y_u = c_inv * E[None, :] * from_r_layout(y)
    obj = c_inv * (0.5 * jnp.sum(pvals[None] * xf[:, p_row] * xf[:, p_col],
                                 axis=1)
                   + jnp.einsum('bi,bi->b', qp, xf))
    obj = jnp.where(status == -3, jnp.inf, obj)
    obj = jnp.where(status == -4, -jnp.inf, obj)
    return dict(x=x_u, y=y_u, z=z_u, obj=obj, iters=it_vec,
                pri_res=rp, dua_res=rd, solved=(status == 1),
                status=status)


def _impl(st, ga, pvals, q, avals, l, u, n_eq, stg, x0, y0, interpret):
    B = q.shape[0]
    dtype = q.dtype
    n, m, n_pad, s, nb = st.n, st.m, st.n_pad, st.s, st.nb
    r_max = ga.r_max
    order = jnp.asarray(st.order)
    pos = jnp.asarray(st.pos)
    p_row = jnp.asarray(st.p_row)
    p_col = jnp.asarray(st.p_col)

    l = jnp.clip(l, -_INF, _INF)
    u = jnp.clip(u, -_INF, _INF)

    qp = jnp.concatenate(
        [q[:, order], jnp.zeros((B, n_pad - n), dtype)], axis=1)
    q_env = jnp.max(jnp.abs(qp), axis=0)
    pvals, avals, c, D, E = ruiz_banded_shared(
        st, pvals, avals, q_env, stg.scaling)
    qp = qp * D[None, :] * c
    ls = l * E[None, :]
    us = u * E[None, :]
    c_inv = 1.0 / c
    D_inv = 1.0 / D
    E_inv = 1.0 / E

    is_eq = np.arange(m) < n_eq
    rho_base = jnp.asarray(
        np.where(is_eq, stg.rho * stg.rho_eq_scale, stg.rho), dtype)

    # grouped shared tensors
    B0, B1 = scatter_grouped(ga, avals)
    zero_rho = jnp.zeros((1, m), dtype)
    D_P, L_P = assemble_banded_M(st, pvals[None], avals[None], zero_rho,
                                 0.0, dtype)
    D_P, L_P = D_P[0], L_P[0]

    def factor(rho_vec):
        D_M, L_M = assemble_banded_M(st, pvals[None], avals[None],
                                     rho_vec[None], stg.sigma, dtype)
        fac = cr_factor(D_M, L_M)
        packed, meta = pack_cr_levels(fac)
        return packed, meta, D_M[0], L_M[0]

    fac0, meta, D_M0, L_M0 = factor(rho_base)

    # layouts: x-space (nb, s, B); row-space (nb, r_max, B)
    def to_x_layout(v):                  # (B, n_pad) -> (nb, s, B)
        return jnp.transpose(v.reshape(B, nb, s), (1, 2, 0))

    def from_x_layout(v):                # (nb, s, B) -> (B, n_pad)
        return jnp.transpose(v, (2, 0, 1)).reshape(B, n_pad)

    def to_r_layout(v, fill):            # (B, m) -> (nb, r_max, B)
        g = group_rows(ga, v, fill=fill)             # (B, nb, r_max)
        return jnp.transpose(g, (1, 2, 0))

    def from_r_layout(v):                # (nb, r_max, B) -> (B, m)
        return ungroup_rows(ga, jnp.transpose(v, (2, 0, 1)))

    qx = to_x_layout(qp)
    lg = to_r_layout(ls, -_INF)
    ug = to_r_layout(us, _INF)
    E_g = group_rows(ga, E[None], 0.0)[0]             # (nb, r_max)
    Einv_g = group_rows(ga, E_inv[None], 0.0)[0]
    D_x = D.reshape(nb, s)
    rho_g0 = group_rows(ga, rho_base[None], 1.0)[0]   # (nb, r_max)

    if x0 is not None:
        x0p = jnp.concatenate(
            [x0.astype(dtype)[:, order], jnp.zeros((B, n_pad - n), dtype)],
            axis=1) * D_inv[None, :]
        xk = to_x_layout(x0p)
        # z0 = A x0 in scaled space via the grouped matvec (host-cheap):
        a_row = jnp.asarray(st.a_row)
        a_col = jnp.asarray(st.a_col)
        z_rows = jax.ops.segment_sum((avals[None] * x0p[:, a_col]).T,
                                     a_row, num_segments=m).T
        zk = to_r_layout(z_rows, 0.0)
    else:
        xk = jnp.zeros((nb, s, B), dtype)
        zk = jnp.zeros((nb, r_max, B), dtype)
    yk = (to_r_layout(c * E_inv[None, :] * y0.astype(dtype), 0.0)
          if y0 is not None else jnp.zeros((nb, r_max, B), dtype))

    check = stg.check_interval
    max_iter = (stg.max_iter // check) * check
    adaptive = stg.adaptive_rho

    def cond(state):
        it, done = state[7], state[8]
        return (~jnp.all(done > 0)) & (it < max_iter)

    def body(state):
        (x, z, y, rho_scale, fac, D_M, L_M, it, done, it_vec,
         rp_c, rd_c, status) = state
        rho_g = rho_g0 * rho_scale
        done3 = done.reshape(1, 1, B)
        x, z, y, rp, rd, rp_den, rd_den, flags = banded_shared_chunk(
            fac, meta, B0, B1, D_P, L_P, D_M, L_M, D_x, Einv_g, E_g,
            rho_g, c_inv, qx, lg, ug, x, z, y, done3,
            sigma=stg.sigma, alpha=stg.alpha, eps_abs=stg.eps_abs,
            eps_rel=stg.eps_rel, check_interval=check,
            kkt_refine=0, interpret=interpret)  # CR is direct: no
        # solve-time refinement needed (see _impl_crk's kkt_apply note)
        it = it + check
        ok = (flags & 1) > 0
        p_inf = (flags & 2) > 0
        d_inf = (flags & 4) > 0
        newly = ok & (done == 0)
        it_vec = jnp.where(newly, it, it_vec)
        status = jnp.where(ok & (status == 0), 1, status)
        status = jnp.where(p_inf & (status == 0), -3, status)
        status = jnp.where(d_inf & (status == 0), -4, status)
        done = jnp.maximum(done, (ok | p_inf | d_inf).astype(jnp.int32))

        if adaptive:
            ratio = jnp.sqrt(
                (rp / jnp.maximum(rp_den, 1e-10))
                / jnp.maximum(rd / jnp.maximum(rd_den, 1e-10), 1e-10))
            active = done == 0
            log_r = jnp.where(active,
                              jnp.log(jnp.clip(ratio, 1e-6, 1e6)), 0.0)
            n_act = jnp.maximum(jnp.sum(active), 1)
            comb = jnp.exp(jnp.sum(log_r) / n_act)
            tol = stg.adaptive_rho_tolerance
            change = ((comb > tol) | (comb < 1.0 / tol)) & jnp.any(active)
            step_f = jnp.clip(jnp.where(change, comb, 1.0), 0.1, 10.0)
            new_scale = jnp.clip(rho_scale * step_f, 1e-6, 1e6)

            def refactor(_):
                packed, _meta, dmn, lmn = factor(rho_base * new_scale)
                return packed, dmn, lmn

            fac, D_M, L_M = jax.lax.cond(
                change, refactor, lambda _: (fac, D_M, L_M), operand=None)
            rho_scale = new_scale

        return (x, z, y, rho_scale, fac, D_M, L_M, it, done, it_vec,
                rp, rd, status)

    state0 = (xk, zk, yk, jnp.ones((), dtype), fac0, D_M0, L_M0,
              jnp.int32(0), jnp.zeros((B,), jnp.int32),
              jnp.zeros((B,), jnp.int32),
              jnp.full((B,), jnp.inf, dtype), jnp.full((B,), jnp.inf, dtype),
              jnp.zeros((B,), jnp.int32))
    (x, z, y, _, _, _, _, it, done, it_vec, rp, rd,
     status) = jax.lax.while_loop(cond, body, state0)
    it_vec = jnp.where(done > 0, it_vec, it)

    xf = from_x_layout(x)                       # (B, n_pad) scaled
    x_u = (D[None, :] * xf)[:, pos]
    z_u = E_inv[None, :] * from_r_layout(z)
    y_u = c_inv * E[None, :] * from_r_layout(y)
    obj = c_inv * (0.5 * jnp.sum(pvals[None] * xf[:, p_row] * xf[:, p_col],
                                 axis=1)
                   + jnp.sum(qp * xf, axis=1))
    obj = jnp.where(status == -3, jnp.inf, obj)
    obj = jnp.where(status == -4, -jnp.inf, obj)
    return dict(x=x_u, y=y_u, z=z_u, obj=obj, iters=it_vec,
                pri_res=rp, dua_res=rd, solved=(status == 1),
                status=status)
