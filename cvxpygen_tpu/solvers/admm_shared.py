"""Shared-KKT batched ADMM: P and A shared across the batch.

The dominant deployed pattern for a compiled problem family is a batch of
instances that differ only in *vector* parameters (MPC: same dynamics
``A, B`` and weights, different ``x_init`` -- exactly the reference's MPC
benchmark loop, reference examples/MPC.ipynb / tests/test_E2E_QP.py:43-73,
where only ``x_init`` is reassigned between solves).  Then the canonical
``P`` and ``A`` are batch-invariant, and so is the ADMM KKT matrix
``M = P + sigma*I + A' diag(rho) A``:

- the factorization (Newton-Schulz inverse) is computed ONCE for the whole
  batch instead of once per instance -- amortized to zero;
- every per-iteration matvec becomes a full-batch GEMM on the MXU:
  ``(B, n) @ (n, n)`` instead of B independent (n,) @ (n, n) matvecs that
  the per-instance path does on the VPU.  This is the systolic-array
  speed-of-light path; per-iteration FLOPs are identical but utilization
  is ~an order of magnitude higher.

Math is identical to solvers/admm.py `_admm_solve_impl` (OSQP alg. 1-3:
Ruiz equilibration, rho-scaled splitting, residual termination,
infeasibility certificates -- reference vendored osqp src/osqp_api.c
roles); equivalence vs the per-instance dense path is tested in
tests/test_admm_shared.py.

Adaptive rho uses a single batch-shared scale (geometric mean of the
per-instance OSQP residual ratios over still-active instances) so M stays
shared; the re-factorization is a warm Newton-Schulz restart of one
(n, n) matrix -- negligible, unlike the per-instance path where it
dominates the solve (BENCH.md check-interval sweeps).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .admm import (ADMMSettings, newton_schulz_inverse, newton_schulz_warm,
                   _inf_norm)

_INF = 1e30


def ruiz_equilibrate_shared(P, A, q_batch, iters):
    """Ruiz scaling of the SHARED [[P, A'],[A, 0]] (OSQP paper alg. 2).

    The cost scaling ``c`` must stay a batch-shared scalar (it multiplies
    P), so the q-norm term uses the batch-max |q|: any fixed positive
    scaling is valid for correctness (termination bars divide it out);
    this choice keeps conditioning reasonable for the whole batch."""
    m, n = A.shape
    dtype = P.dtype
    c = jnp.ones((), dtype)
    D = jnp.ones((n,), dtype)
    E = jnp.ones((m,), dtype)
    q_col = jnp.max(jnp.abs(q_batch), axis=0)  # (n,) batch envelope
    for _ in range(iters):
        nx_P = jnp.max(jnp.abs(P), axis=0)
        nx_A = jnp.max(jnp.abs(A), axis=0) if m else jnp.zeros_like(nx_P)
        nx = jnp.maximum(nx_P, nx_A)
        nc = jnp.max(jnp.abs(A), axis=1) if m else jnp.zeros((0,), dtype)
        dx = jnp.where(nx > 1e-12, 1.0 / jnp.sqrt(jnp.maximum(nx, 1e-12)), 1.0)
        dc = jnp.where(nc > 1e-12, 1.0 / jnp.sqrt(jnp.maximum(nc, 1e-12)), 1.0)
        dx = jnp.clip(dx, 1e-4, 1e4)
        dc = jnp.clip(dc, 1e-4, 1e4)
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


def admm_solve_shared(P, q, A, l, u, n_eq, settings: ADMMSettings,
                      x0=None, y0=None):
    """Solve a batch of QPs sharing P (n, n) and A (m, n); q (B, n),
    l/u (B, m) batched.  Same contract/returns as admm.admm_solve."""
    with jax.default_matmul_precision('highest'):
        return _admm_solve_shared_impl(P, q, A, l, u, n_eq, settings,
                                       x0, y0)


def _admm_solve_shared_impl(P, q, A, l, u, n_eq, st: ADMMSettings,
                            x0=None, y0=None):
    m, n = A.shape
    B = q.shape[0]
    dtype = P.dtype

    if m == 0:
        Preg = P + st.sigma * jnp.eye(n, dtype=dtype)
        Lc = jnp.linalg.cholesky(Preg)
        x = jax.scipy.linalg.cho_solve((Lc, True), -q.T).T
        obj = 0.5 * jnp.einsum('bi,ij,bj->b', x, P, x) + jnp.sum(q * x, 1)
        zero = jnp.zeros((B, 0), dtype)
        return dict(x=x, y=zero, z=zero, obj=obj,
                    iters=jnp.ones((B,), jnp.int32),
                    pri_res=jnp.zeros((B,), dtype),
                    dua_res=jnp.zeros((B,), dtype),
                    solved=jnp.ones((B,), jnp.bool_),
                    status=jnp.ones((B,), jnp.int32))

    l = jnp.clip(l, -_INF, _INF)
    u = jnp.clip(u, -_INF, _INF)

    Ps, As, c, D, E = ruiz_equilibrate_shared(P, A, q, st.scaling)
    qs = (q * D) * c
    ls = l * E
    us = u * E
    c_inv = 1.0 / c
    D_inv = 1.0 / D
    E_inv = 1.0 / E

    is_eq = jnp.arange(m) < n_eq
    rho_base = jnp.where(is_eq, st.rho * st.rho_eq_scale,
                         st.rho).astype(dtype)          # (m,)

    def form_M(rho_vec):
        return (Ps + st.sigma * jnp.eye(n, dtype=dtype)
                + (As.T * rho_vec[None, :]) @ As)

    kkt_mode = st.kkt_solver
    if kkt_mode == 'auto':
        kkt_mode = 'ns' if jax.default_backend() not in ('cpu',) else 'inv'
    use_chol = (kkt_mode == 'chol')

    def factor(rho_vec, Minv_warm=None):
        M = form_M(rho_vec)
        if kkt_mode == 'ns':
            if Minv_warm is None:
                return newton_schulz_inverse(M[None], st.ns_iters,
                                             st.ns_f32_iters)[0]
            return newton_schulz_warm(M[None], Minv_warm[None],
                                      st.ns_adapt_iters)[0]
        Lc = jnp.linalg.cholesky(M)
        if use_chol:
            # keep the factor; triangular solves every iteration
            # (reference-like mode, matching admm.py semantics)
            return Lc
        return jax.scipy.linalg.cho_solve(
            (Lc, True), jnp.eye(n, dtype=dtype))

    Minv0 = factor(rho_base)

    if x0 is not None:
        x_start = (D_inv * x0).astype(dtype)
        z_start = E * (x0.astype(dtype) @ A.T)
    else:
        x_start = jnp.zeros((B, n), dtype)
        z_start = jnp.zeros((B, m), dtype)
    y_start = (c * E_inv * y0.astype(dtype)
               if y0 is not None else jnp.zeros((B, m), dtype))

    # full-solve Pallas kernel (ops/admm_shared_kernel.py): the whole solve
    # per chunk in one pallas_call, state + shared matrices VMEM-resident,
    # per-chunk early termination.  'auto' enables it on TPU -- the shared
    # path has no per-instance factorization cost to trade off.
    if st.use_pallas in ('auto', 'always', 'full', 'full_interpret') \
            and kkt_mode == 'ns':
        from ..ops.admm_shared_kernel import (admm_shared_solve_pallas,
                                              pick_shared_chunk)
        interp = (st.use_pallas == 'full_interpret')
        if (jax.default_backend() == 'tpu' or interp) \
                and pick_shared_chunk(B, m, n, dtype) is not None:
            M0 = form_M(rho_base)
            x, z, y, it_vec, status, rp, rd = admm_shared_solve_pallas(
                Ps, qs, As, ls, us, rho_base, D, E, c_inv, M0, Minv0,
                x_start, z_start, y_start,
                sigma=st.sigma, alpha=st.alpha,
                eps_abs=st.eps_abs, eps_rel=st.eps_rel,
                check_interval=st.check_interval, max_iter=st.max_iter,
                ns_adapt_iters=st.ns_adapt_iters, adaptive=st.adaptive_rho,
                rho_tol=st.adaptive_rho_tolerance,
                kkt_refine=st.kkt_refine,
                adapt_until=st.adaptive_rho_until, interpret=interp)
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

    def M_matvec(rho_vec, x):
        Ax = x @ As.T
        return x @ Ps.T + st.sigma * x + (rho_vec * Ax) @ As

    def kkt_apply(Minv, rho_vec, rhs):
        if use_chol:
            return jax.scipy.linalg.cho_solve((Minv, True), rhs.T).T
        xt = rhs @ Minv.T
        for _ in range(st.kkt_refine):
            r = rhs - M_matvec(rho_vec, xt)
            xt = xt + r @ Minv.T
        return xt

    x_init, z_init, y_init = x_start, z_start, y_start

    def one_iter(carry, Minv, rho_vec):
        x, z, y = carry
        rhs = st.sigma * x - qs + (rho_vec * z - y) @ As
        xt = kkt_apply(Minv, rho_vec, rhs)
        zt = xt @ As.T
        x1 = st.alpha * xt + (1 - st.alpha) * x
        w = st.alpha * zt + (1 - st.alpha) * z + y / rho_vec
        z1 = jnp.clip(w, ls, us)
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
        prim_inf = (dy_n > 1e-10) & cert_p1 & (sup <= -eps * dy_n) & ~open_dir

        dx_n = _inf_norm(D * dx)
        cert_d1 = _inf_norm(D_inv * Pdx) * c_inv <= eps * dx_n
        cert_d2 = (jnp.sum(qs * dx, axis=1) * c_inv) <= -eps * dx_n
        up_ok = jnp.where(us >= _INF * 0.5, True,
                          E_inv * Adx <= eps * dx_n[:, None])
        lo_ok = jnp.where(ls <= -_INF * 0.5, True,
                          E_inv * Adx >= -eps * dx_n[:, None])
        dual_inf = ((dx_n > 1e-10) & cert_d1 & cert_d2
                    & jnp.all(up_ok & lo_ok, axis=1))
        return prim_inf, dual_inf

    adaptive = st.adaptive_rho

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
        # fused check GEMMs: (B, 2, ·) stacks cover residuals AND
        # infeasibility certificates in one pass over As/Ps
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
            # batch-shared adaptive rho: geometric mean of per-instance
            # OSQP residual ratios over still-active instances, so M stays
            # a single shared matrix (refactorization = one warm NS)
            ratio = jnp.sqrt(
                (rp / jnp.maximum(rp_den, 1e-10))
                / jnp.maximum(rd / jnp.maximum(rd_den, 1e-10), 1e-10))
            active = ~done
            log_r = jnp.where(active, jnp.log(jnp.clip(ratio, 1e-6, 1e6)),
                              0.0)
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
              jnp.int32(0),
              jnp.zeros((B,), jnp.bool_), jnp.zeros((B,), jnp.int32),
              jnp.full((B,), jnp.inf, dtype), jnp.full((B,), jnp.inf, dtype),
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
