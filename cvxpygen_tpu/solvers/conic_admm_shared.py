"""Shared-KKT batched conic ADMM: P and A shared across the batch.

Conic analogue of solvers/admm_shared.py (SCS role, reference scs.py):
when a batch of conic instances differs only in vector parameters
(portfolio with fixed factor loadings and varying returns; ADP with fixed
G), the canonical P/A -- and therefore M = P + sigma I + A' diag(rho) A --
are batch-invariant:

- the Newton-Schulz factorization runs ONCE per batch;
- every per-iteration matvec is a full-batch GEMM on the MXU;
- the cone projection stays per-instance (elementwise over the batch).

The reference's SCS interface keeps its factorization when only b/c
change (`scs_update` vs re-`scs_init`, reference scs.py:24-45) -- this is
the batched equivalent of that update structure.

Math identical to solvers/conic_admm.py `_conic_admm_impl`; adaptive rho
uses a batch-shared scale (geometric mean over active instances) as in
admm_shared.  Equivalence tested in tests/test_conic_admm_shared.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.cones import ConeLayout, project_cone
from .admm import newton_schulz_inverse, newton_schulz_warm, _inf_norm
from .conic_admm import ConicADMMSettings, _cone_row_blocks

_INF = 1e30


def ruiz_equilibrate_conic_shared(P, A, q_batch, iters, blocks):
    """Shared-matrix Ruiz with block-uniform row scales on cone blocks
    (combines admm_shared.ruiz_equilibrate_shared with
    conic_admm.ruiz_equilibrate_conic).  q-envelope = batch max |q|."""
    m, n = A.shape
    dtype = P.dtype
    c = jnp.ones((), dtype)
    D = jnp.ones((n,), dtype)
    E = jnp.ones((m,), dtype)
    q_col = jnp.max(jnp.abs(q_batch), axis=0)
    for _ in range(iters):
        nx_P = jnp.max(jnp.abs(P), axis=0)
        nx_A = jnp.max(jnp.abs(A), axis=0) if m else jnp.zeros_like(nx_P)
        nx = jnp.maximum(nx_P, nx_A)
        nc = jnp.max(jnp.abs(A), axis=1) if m else jnp.zeros((0,), dtype)
        dx = jnp.where(nx > 1e-12,
                       1.0 / jnp.sqrt(jnp.maximum(nx, 1e-12)), 1.0)
        dc = jnp.where(nc > 1e-12,
                       1.0 / jnp.sqrt(jnp.maximum(nc, 1e-12)), 1.0)
        dx = jnp.clip(dx, 1e-4, 1e4)
        dc = jnp.clip(dc, 1e-4, 1e4)
        for (o, L) in blocks:
            g = jnp.exp(jnp.mean(jnp.log(dc[o:o + L])))
            dc = dc.at[o:o + L].set(g)
        P = dx[:, None] * P * dx[None, :]
        A = dc[:, None] * A * dx[None, :]
        q_col = dx * q_col
        D = D * dx
        E = E * dc
        col = jnp.mean(jnp.max(jnp.abs(P), axis=0))
        col = jnp.where(col < 1e-12, 1.0, col)
        qn = jnp.max(q_col)
        qn = jnp.where(qn < 1e-12, 1.0, qn)
        g = jnp.clip(1.0 / jnp.maximum(col, qn), 1e-4, 1e4)
        P = P * g
        q_col = q_col * g
        c = c * g
    return P, A, c, D, E


def conic_admm_solve_shared(P, q, A, b, n_zero: int, layout: ConeLayout,
                            settings: ConicADMMSettings = None,
                            x0=None, y0=None):
    """Solve a batch of conic QPs sharing P (n, n) and A (m, n);
    q (B, n), b (B, m) batched.  Same contract/returns as
    conic_admm.conic_admm_solve."""
    settings = settings or ConicADMMSettings()
    with jax.default_matmul_precision('highest'):
        return _impl(P, q, A, b, n_zero, layout, settings, x0, y0)


def _impl(P, q, A, b, n_zero, layout, st, x0, y0):
    m, n = A.shape
    B = q.shape[0]
    dtype = P.dtype
    mc = m - n_zero
    assert layout.total == mc, (layout.total, mc)

    blocks = _cone_row_blocks(n_zero, layout)
    Ps, As, c, D, E = ruiz_equilibrate_conic_shared(P, A, q, st.scaling,
                                                    blocks)
    qs = (q * D) * c
    bs = E * b
    c_inv = 1.0 / c
    D_inv = 1.0 / D
    E_inv = 1.0 / E

    is_eq = jnp.arange(m) < n_zero
    rho_base = jnp.where(is_eq, st.rho * st.rho_eq_scale,
                         st.rho).astype(dtype)             # (m,)
    I_n = jnp.eye(n, dtype=dtype)

    def form_M(rho_vec):
        return Ps + st.sigma * I_n + (As.T * rho_vec[None, :]) @ As

    kkt_mode = st.kkt_solver
    if kkt_mode == 'auto':
        kkt_mode = 'ns' if jax.default_backend() not in ('cpu',) else 'inv'

    def factor(rho_vec, Minv_warm=None):
        M = form_M(rho_vec)
        if kkt_mode == 'ns':
            if Minv_warm is None:
                return newton_schulz_inverse(M[None], st.ns_iters)[0]
            return newton_schulz_warm(M[None], Minv_warm[None],
                                      st.ns_adapt_iters)[0]
        Lc = jnp.linalg.cholesky(M)
        return jax.scipy.linalg.cho_solve((Lc, True), I_n)

    Minv0 = factor(rho_base)

    def M_matvec(rho_vec, x):
        Ax = x @ As.T
        return x @ Ps.T + st.sigma * x + (rho_vec * Ax) @ As

    def kkt_apply(Minv, rho_vec, rhs):
        xt = rhs @ Minv.T
        for _ in range(st.kkt_refine):
            xt = xt + (rhs - M_matvec(rho_vec, xt)) @ Minv.T
        return xt

    def proj_C(w):
        z_eq = -bs[:, :n_zero]
        if mc:
            z_cone = project_cone(w[:, n_zero:] + bs[:, n_zero:],
                                  layout) - bs[:, n_zero:]
            return jnp.concatenate([z_eq, z_cone], axis=1)
        return z_eq

    if x0 is not None:
        x_init = (D_inv * x0).astype(dtype)
        z_init = E * (x0.astype(dtype) @ A.T)
    else:
        x_init = jnp.zeros((B, n), dtype)
        z_init = jnp.zeros((B, m), dtype)
    y_init = (c * E_inv * y0.astype(dtype)
              if y0 is not None else jnp.zeros((B, m), dtype))

    def one_iter(carry, Minv, rho_vec):
        x, z, y = carry
        rhs = st.sigma * x - qs + (rho_vec * z - y) @ As
        xt = kkt_apply(Minv, rho_vec, rhs)
        zt = xt @ As.T
        x1 = st.alpha * xt + (1 - st.alpha) * x
        w = st.alpha * zt + (1 - st.alpha) * z + y / rho_vec
        z1 = proj_C(w)
        y1 = rho_vec * (w - z1)
        return x1, z1, y1

    def residuals(x, z, y, Ax, Px, Aty):
        rp = _inf_norm(E_inv * (Ax - z))
        rp_den = jnp.maximum(_inf_norm(E_inv * Ax), _inf_norm(E_inv * z))
        rd = c_inv * _inf_norm(D_inv * (Px + qs + Aty))
        rd_den = c_inv * jnp.maximum(
            jnp.maximum(_inf_norm(D_inv * Px), _inf_norm(D_inv * Aty)),
            _inf_norm(D_inv * qs))
        ok = ((rp <= st.eps_abs + st.eps_rel * rp_den)
              & (rd <= st.eps_abs + st.eps_rel * rd_den))
        return rp, rd, rp_den, rd_den, ok

    def infeasibility(dx, dy, Pdx, Adx_s, Atdy):
        """SCS-style certificates (see conic_admm._conic_admm_impl)."""
        eps = jnp.asarray(st.eps_infeas, dtype) ** 0.5
        dy_n = _inf_norm(E * dy) * c_inv
        cert_p1 = _inf_norm(D_inv * Atdy) * c_inv <= eps * dy_n
        dy_c = (E * dy)[:, n_zero:] * c_inv
        if mc:
            dist_pol = _inf_norm(project_cone(dy_c, layout))
        else:
            dist_pol = jnp.zeros((B,), dtype)
        sup = -jnp.einsum('bi,bi->b', b, E * dy) * c_inv
        prim_inf = ((dy_n > 1e-10) & cert_p1
                    & (dist_pol <= eps * dy_n) & (sup <= -eps * dy_n))

        dx_n = _inf_norm(D * dx)
        Adx = Adx_s * E_inv
        cert_d1 = _inf_norm(D_inv * Pdx) * c_inv <= eps * dx_n
        cert_d2 = (jnp.einsum('bi,bi->b', qs, dx) * c_inv) <= -eps * dx_n
        zero_ok = _inf_norm(Adx[:, :n_zero]) <= eps * dx_n \
            if n_zero else jnp.ones((B,), jnp.bool_)
        if mc:
            dist_K = _inf_norm(Adx[:, n_zero:]
                               - project_cone(Adx[:, n_zero:], layout))
            cone_ok = dist_K <= eps * dx_n
        else:
            cone_ok = jnp.ones((B,), jnp.bool_)
        dual_inf = (dx_n > 1e-10) & cert_d1 & cert_d2 & zero_ok & cone_ok
        return prim_inf, dual_inf

    adaptive = st.adaptive_rho and kkt_mode == 'ns'

    def cond(state):
        it, done = state[5], state[6]
        return (~jnp.all(done)) & (it < st.max_iter)

    def body(state):
        (x, z, y, rho_scale, Minv, it, done, it_vec, rp_last, rd_last,
         status) = state
        rho_vec = rho_base * rho_scale

        def inner(_, carry):
            return one_iter(carry, Minv, rho_vec)
        xn, zn, yn = jax.lax.fori_loop(0, st.check_interval, inner,
                                       (x, z, y))
        mask = done[:, None]
        dx = jnp.where(mask, 0.0, xn - x)
        dy = jnp.where(mask, 0.0, yn - y)
        x = jnp.where(mask, x, xn)
        z = jnp.where(mask, z, zn)
        y = jnp.where(mask, y, yn)
        it = it + st.check_interval
        xs = jnp.stack([x, dx], axis=1)
        ys = jnp.stack([y, dy], axis=1)
        Axs = jnp.einsum('ij,bcj->bci', As, xs)
        Pxs = jnp.einsum('ij,bcj->bci', Ps, xs)
        Atys = jnp.einsum('ij,bci->bcj', As, ys)
        rp, rd, rp_den, rd_den, ok = residuals(
            x, z, y, Axs[:, 0], Pxs[:, 0], Atys[:, 0])
        p_inf, d_inf = infeasibility(dx, dy, Pxs[:, 1], Axs[:, 1],
                                     Atys[:, 1])
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
            tol = st.adaptive_rho_tolerance
            change = ((comb > tol) | (comb < 1.0 / tol)) & jnp.any(active)
            step_f = jnp.clip(jnp.where(change, comb, 1.0), 0.1, 10.0)
            new_scale = jnp.clip(rho_scale * step_f, 1e-6, 1e6)

            def refactor(_):
                return factor(rho_base * new_scale, Minv_warm=Minv)

            Minv = jax.lax.cond(change, refactor, lambda _: Minv,
                                operand=None)
            rho_scale = new_scale

        return (x, z, y, rho_scale, Minv, it, done, it_vec, rp, rd, status)

    state0 = (x_init, z_init, y_init, jnp.ones((), dtype), Minv0,
              jnp.int32(0), jnp.zeros((B,), jnp.bool_),
              jnp.zeros((B,), jnp.int32),
              jnp.full((B,), jnp.inf, dtype),
              jnp.full((B,), jnp.inf, dtype),
              jnp.zeros((B,), jnp.int32))
    (x, z, y, _, _, it, done, it_vec, rp, rd,
     status) = jax.lax.while_loop(cond, body, state0)
    it_vec = jnp.where(done, it_vec, it)

    x_u = D * x
    z_u = E_inv * z
    y_u = c_inv * E * y
    obj = c_inv * (0.5 * jnp.einsum('bi,ij,bj->b', x, Ps, x)
                   + jnp.sum(qs * x, axis=1))
    obj = jnp.where(status == -3, jnp.inf, obj)
    obj = jnp.where(status == -4, -jnp.inf, obj)
    return dict(x=x_u, y=y_u, z=z_u, obj=obj, iters=it_vec,
                pri_res=rp, dua_res=rd, solved=(status == 1),
                status=status)
