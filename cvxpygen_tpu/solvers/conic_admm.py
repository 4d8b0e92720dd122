"""Batched SCS-style conic ADMM solver (JAX, jit/vmap-native).

TPU-native replacement for the reference's embedded SCS (reference
cvxpygen/solvers/scs.py + vendored cvxgrp/scs C sources): operator-splitting
conic solver.  Where SCS factors a sparse KKT with AMD+QDLDL per instance,
this batches thousands of instances and applies one dense KKT inverse
(Newton-Schulz, MXU matmuls) shared across iterations.

Problem form (canon/canonicalizer.py convention):
    min 0.5 x'Px + q'x   s.t.  aff = A x + b,  aff in {0}^nz x K
    K = R+^l x SOC(d_i) x EXP^ne x PSD(s_j)   (ops/cones.py ConeLayout)

This is OSQP's general splitting (min f(x) s.t. Ax in C) with
C = {z : z + b in {0} x K}: the box projection of the QP engine becomes a
shifted cone projection, everything else (rho-scaled ADMM, KKT solve,
residual-based termination) carries over -- so the engine shares its
equilibration and Newton-Schulz machinery with solvers/admm.py.  Cone
blocks (SOC/EXP/PSD) are non-separable, so Ruiz row scaling is averaged
within each block (as SCS does).

Duals: y (OSQP sign: Px + q + A'y = 0) with -y in K^* on cone rows.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.cones import ConeLayout, project_cone
from .admm import newton_schulz_inverse, _inf_norm

_INF = 1e30


@dataclass(frozen=True)
class ConicADMMSettings:
    """SCS-flavored settings (reference scs.py:96-113 registry: normalize,
    scale, rho_x, max_iters, eps_abs, eps_rel, alpha, warm_start...)."""
    rho: float = 1.0
    rho_eq_scale: float = 1e3
    sigma: float = 1e-6          # SCS rho_x role
    alpha: float = 1.5           # SCS default over-relaxation
    eps_abs: float = 1e-4
    eps_rel: float = 1e-4
    eps_infeas: float = 1e-7
    max_iter: int = 2500
    check_interval: int = 25
    scaling: int = 10            # Ruiz iterations (SCS 'normalize')
    warm_starting: bool = True
    kkt_solver: str = 'auto'     # 'ns' | 'inv' | 'auto' (see admm.py)
    kkt_refine: int = 1
    ns_iters: int = 30
    adaptive_rho: bool = True
    adaptive_rho_tolerance: float = 5.0
    ns_adapt_iters: int = 12


def _cone_row_blocks(n_zero: int, layout: ConeLayout):
    """Row blocks (start, length) within the FULL m rows that must share one
    equilibration scale (SOC/EXP/PSD blocks; zero+nonneg rows stay per-row)."""
    blocks = []
    off = n_zero + layout.n_nonneg
    for d in layout.socs:
        blocks.append((off, d))
        off += d
    for _ in range(layout.n_exp):
        blocks.append((off, 3))
        off += 3
    for s in layout.psds:
        k = s * (s + 1) // 2
        blocks.append((off, k))
        off += k
    for _ in layout.pows:
        blocks.append((off, 3))
        off += 3
    return blocks


def ruiz_equilibrate_conic(P, q, A, b, iters, blocks):
    """Modified Ruiz scaling (admm.ruiz_equilibrate) with block-uniform row
    scales on non-separable cone blocks (geometric mean within block)."""
    B, m, n = A.shape
    dtype = P.dtype
    c = jnp.ones((B,), dtype)
    D = jnp.ones((B, n), dtype)
    E = jnp.ones((B, m), dtype)
    for _ in range(iters):
        nx_P = jnp.max(jnp.abs(P), axis=1)
        nx_A = jnp.max(jnp.abs(A), axis=1) if m else jnp.zeros_like(nx_P)
        nx = jnp.maximum(nx_P, nx_A)
        nc = jnp.max(jnp.abs(A), axis=2) if m else jnp.zeros((B, 0), dtype)
        dx = jnp.where(nx > 1e-12, 1.0 / jnp.sqrt(jnp.maximum(nx, 1e-12)), 1.0)
        dc = jnp.where(nc > 1e-12, 1.0 / jnp.sqrt(jnp.maximum(nc, 1e-12)), 1.0)
        dx = jnp.clip(dx, 1e-4, 1e4)
        dc = jnp.clip(dc, 1e-4, 1e4)
        # block-uniform scale: geometric mean over each cone block
        for (o, L) in blocks:
            g = jnp.exp(jnp.mean(jnp.log(dc[:, o:o + L]), axis=1))
            dc = dc.at[:, o:o + L].set(g[:, None])
        P = dx[:, :, None] * P * dx[:, None, :]
        A = dc[:, :, None] * A * dx[:, None, :]
        q = dx * q
        D = D * dx
        E = E * dc
        col = jnp.mean(jnp.max(jnp.abs(P), axis=1), axis=1)
        col = jnp.where(col < 1e-12, 1.0, col)
        qn = _inf_norm(q)
        qn = jnp.where(qn < 1e-12, 1.0, qn)
        g = jnp.clip(1.0 / jnp.maximum(col, qn), 1e-4, 1e4)
        P = P * g[:, None, None]
        q = q * g[:, None]
        c = c * g
    b = E * b
    return P, q, A, b, c, D, E


def conic_admm_solve(P, q, A, b, n_zero: int, layout: ConeLayout,
                     settings: ConicADMMSettings = ConicADMMSettings(),
                     x0=None, y0=None):
    """Solve a batch of conic QPs.  Arrays batched on axis 0.

    Returns dict(x, y, z, obj, iters, pri_res, dua_res, solved, status)
    with y in OSQP sign (Px + q + A'y = 0); y_canon = -y.
    """
    with jax.default_matmul_precision('highest'):
        return _conic_admm_impl(P, q, A, b, n_zero, layout, settings, x0, y0)


def _conic_admm_impl(P, q, A, b, n_zero, layout, st, x0, y0):
    B, m, n = A.shape
    dtype = P.dtype
    mc = m - n_zero
    assert layout.total == mc, (layout.total, mc)

    blocks = _cone_row_blocks(n_zero, layout)
    Ps, qs, As, bs, c, D, E = ruiz_equilibrate_conic(
        P, q, A, b, st.scaling, blocks)
    c_inv = 1.0 / c
    D_inv = 1.0 / D
    E_inv = 1.0 / E

    is_eq = jnp.arange(m) < n_zero
    rho_base = jnp.broadcast_to(
        jnp.where(is_eq, st.rho * st.rho_eq_scale, st.rho).astype(dtype),
        (B, m))

    I_n = jnp.eye(n, dtype=dtype)

    def form_M(rho_vec):
        return (Ps + st.sigma * I_n
                + jnp.einsum('bki,bk,bkj->bij', As, rho_vec, As))

    kkt_mode = st.kkt_solver
    if kkt_mode == 'auto':
        kkt_mode = 'ns' if jax.default_backend() not in ('cpu',) else 'inv'

    def factor(rho_vec, Minv_warm=None):
        M = form_M(rho_vec)
        if kkt_mode == 'ns':
            if Minv_warm is None:
                return newton_schulz_inverse(M, st.ns_iters)
            from .admm import newton_schulz_warm
            return newton_schulz_warm(M, Minv_warm, st.ns_adapt_iters)
        Lc = jnp.linalg.cholesky(M)
        return jax.scipy.linalg.cho_solve(
            (Lc, True), jnp.broadcast_to(I_n, M.shape))

    Minv0 = factor(rho_base)

    def M_matvec(rho_vec, x):
        Ax = jnp.einsum('bij,bj->bi', As, x)
        return (jnp.einsum('bij,bj->bi', Ps, x) + st.sigma * x
                + jnp.einsum('bkj,bk->bj', As, rho_vec * Ax))

    def kkt_apply(Minv, rho_vec, rhs):
        xt = jnp.einsum('bij,bj->bi', Minv, rhs)
        for _ in range(st.kkt_refine):
            r = rhs - M_matvec(rho_vec, xt)
            xt = xt + jnp.einsum('bij,bj->bi', Minv, r)
        return xt

    def proj_C(w):
        """Projection onto C = {z : z + b in {0} x K} (scaled space)."""
        z_eq = -bs[:, :n_zero]
        if mc:
            z_cone = project_cone(w[:, n_zero:] + bs[:, n_zero:],
                                  layout) - bs[:, n_zero:]
            return jnp.concatenate([z_eq, z_cone], axis=1)
        return z_eq

    if x0 is not None:
        x_init = D_inv * x0.astype(dtype)
        z_init = E * (A @ x0[..., None].astype(dtype))[..., 0]
    else:
        x_init = jnp.zeros((B, n), dtype)
        z_init = jnp.zeros((B, m), dtype)
    if y0 is not None:
        y_init = c[:, None] * E_inv * y0.astype(dtype)
    else:
        y_init = jnp.zeros((B, m), dtype)

    def one_iter(carry, Minv, rho_vec):
        x, z, y = carry
        rhs = st.sigma * x - qs + jnp.einsum('bkj,bk->bj', As,
                                             rho_vec * z - y)
        xt = kkt_apply(Minv, rho_vec, rhs)
        zt = jnp.einsum('bij,bj->bi', As, xt)
        x1 = st.alpha * xt + (1 - st.alpha) * x
        w = st.alpha * zt + (1 - st.alpha) * z + y / rho_vec
        z1 = proj_C(w)
        y1 = rho_vec * (w - z1)
        return x1, z1, y1

    def residuals(x, z, y, Ax=None, Px=None, Aty=None):
        if Ax is None:
            Ax = jnp.einsum('bij,bj->bi', As, x)
            Px = jnp.einsum('bij,bj->bi', Ps, x)
            Aty = jnp.einsum('bij,bi->bj', As, y)
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
        """SCS-style certificates for C = {z : z + b in {0} x K}.

        primal infeasible: A'dy -> 0, support S_C(dy) < 0; for this C,
            S_C(dy) = -b'dy + (0 if dy_cone in K_polar else +inf).
        dual infeasible: P dx -> 0, q'dx < 0, A dx in recession(C)
            (= {0} on zero rows, K on cone rows).
        Matvecs come from the caller, fused with the residual ones."""
        eps = jnp.asarray(st.eps_infeas, dtype) ** 0.5  # scaled-space slack
        dy_n = _inf_norm(E * dy) * c_inv
        cert_p1 = _inf_norm(D_inv * Atdy) * c_inv <= eps * dy_n
        # dy_cone must be (approximately) in the polar cone: the distance
        # is ||Pi_K(dy)|| by Moreau (v = Pi_K(v) + Pi_Ko(v))
        dy_c = (E * dy)[:, n_zero:] * c_inv[:, None]
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
        rho_vec = rho_base * rho_scale[:, None]

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
        # fused check matvecs (see solvers/admm.py): one pass over As/Ps
        # for residuals (x, y) and certificates (dx, dy)
        xs = jnp.stack([x, dx], axis=1)
        ys = jnp.stack([y, dy], axis=1)
        Axs = jnp.einsum('bij,bcj->bci', As, xs)
        Pxs = jnp.einsum('bij,bcj->bci', Ps, xs)
        Atys = jnp.einsum('bij,bci->bcj', As, ys)
        rp, rd, rp_den, rd_den, ok = residuals(
            x, z, y, Ax=Axs[:, 0], Px=Pxs[:, 0], Aty=Atys[:, 0])
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
            tol = st.adaptive_rho_tolerance
            change = ((ratio > tol) | (ratio < 1.0 / tol)) & (~done)
            step_f = jnp.clip(jnp.where(change, ratio, 1.0), 0.1, 10.0)
            new_scale = jnp.clip(rho_scale * step_f, 1e-6, 1e6)

            def refactor(_):
                return factor(rho_base * new_scale[:, None], Minv_warm=Minv)

            Minv = jax.lax.cond(jnp.any(change), refactor,
                                lambda _: Minv, operand=None)
            rho_scale = new_scale

        return (x, z, y, rho_scale, Minv, it, done, it_vec, rp, rd, status)

    state0 = (x_init, z_init, y_init, jnp.ones((B,), dtype), Minv0,
              jnp.int32(0), jnp.zeros((B,), jnp.bool_),
              jnp.zeros((B,), jnp.int32),
              jnp.full((B,), jnp.inf, dtype), jnp.full((B,), jnp.inf, dtype),
              jnp.zeros((B,), jnp.int32))
    (x, z, y, _, _, it, done, it_vec, rp, rd,
     status) = jax.lax.while_loop(cond, body, state0)
    it_vec = jnp.where(done, it_vec, it)

    x_u = D * x
    z_u = E_inv * z
    y_u = c_inv[:, None] * E * y
    obj = c_inv * (0.5 * jnp.einsum('bi,bij,bj->b', x, Ps, x)
                   + jnp.einsum('bi,bi->b', qs, x))
    obj = jnp.where(status == -3, jnp.inf, obj)
    obj = jnp.where(status == -4, -jnp.inf, obj)
    return dict(x=x_u, y=y_u, z=z_u, obj=obj, iters=it_vec,
                pri_res=rp, dua_res=rd, solved=(status == 1),
                status=status)
