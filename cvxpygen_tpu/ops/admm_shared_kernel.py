"""Pallas TPU kernel: FULL shared-KKT ADMM solve, one kernel launch.

Companion of ops/admm_full_kernel.py for the shared-P/A batch case
(solvers/admm_shared.py): every instance in the batch has the SAME
canonical P and A -- the dominant deployed pattern (receding-horizon MPC
varying only x_init; reference examples/MPC.ipynb, tests/test_E2E_QP.py:43-73)
and the case the reference's update-structure handles without
refactorization (reference cvxpygen/solvers/osqp.py:20-61 vector-only
update cases).

Where the per-instance kernel's matvecs are VPU broadcast-multiply-reduces
over per-instance matrices, here EVERY per-iteration operation is a
full-chunk GEMM against one shared (n, n)/(m, n) matrix:

    x_t   = rhs @ M^{-1}            (chunk, n) x (n, n)   -- MXU
    A x   = x @ A'                  (chunk, n) x (n, m)   -- MXU
    A' y  = y @ A                   (chunk, m) x (m, n)   -- MXU

This is the systolic-array speed-of-light path for the batched-QP
workload; the shared matrices, the chunk's state vectors, and the bound
vectors all stay VMEM-resident for the entire solve.

Structure per grid step (one chunk of instances):
- the shared KKT inverse arrives PRE-FACTORED (cold Newton-Schulz runs
  once in XLA on the single (n, n) matrix -- negligible vs the per-instance
  kernel where factorization dominates);
- residual + infeasibility checks every ``check_interval`` iterations on
  the resident matrices;
- a chunk stops as soon as ITS instances are done;
- adaptive rho uses a CHUNK-SHARED scale (geometric mean of per-instance
  OSQP residual ratios over active instances, as in
  solvers/admm_shared.py) so M stays one matrix; refactorization is a
  warm Newton-Schulz restart of that single matrix in VMEM.

Math identical to solvers/admm_shared.py `_admm_solve_shared_impl`;
equivalence is tested in tests/test_admm_shared.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 1e30
_HI = jax.lax.Precision.HIGHEST


def _shared_solve_kernel(cfg, ps_ref, as_ref, at_ref, m0_ref, minv0_ref,
                         rho_ref, d_ref, e_ref, cinv_ref, q_ref, l_ref,
                         u_ref, x0_ref, z0_ref, y0_ref,
                         ox_ref, oz_ref, oy_ref, oit_ref, ost_ref,
                         orp_ref, ord_ref, minv_ref, m_ref):
    (chunk, n, m, sigma, alpha, eps_abs, eps_rel, check_interval,
     max_iter, ns_adapt_iters, adaptive, rho_tol, kkt_refine,
     adapt_until) = cfg

    Ps = ps_ref[:]                      # (n, n) shared, symmetric
    As = as_ref[:]                      # (m, n) shared
    At = at_ref[:]                      # (n, m) shared
    qs = q_ref[:]                       # (chunk, n)
    ls = l_ref[:]                       # (chunk, m)
    us = u_ref[:]
    rho0 = rho_ref[:]                   # (1, m)
    D_inv = 1.0 / d_ref[:]              # (1, n)
    E = e_ref[:]                        # (1, m)
    E_inv = 1.0 / E
    cinv = cinv_ref[0, 0]
    dtype = Ps.dtype

    # per-chunk copies of the factorization (adaptive rho refactors them)
    minv_ref[:] = minv0_ref[:]
    m_ref[:] = m0_ref[:]

    eye = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)).astype(dtype)

    def dotm(x, M):
        return jnp.dot(x, M, preferred_element_type=dtype, precision=_HI)

    def Av(x):                          # (chunk, n) -> (chunk, m)
        return dotm(x, At)

    def Atv(v):                         # (chunk, m) -> (chunk, n)
        return dotm(v, As)

    def Pv(x):                          # P symmetric
        return dotm(x, Ps)

    def inf_norm(v):
        return jnp.max(jnp.abs(v), axis=1, keepdims=True)  # (chunk, 1)

    u_fin = jnp.where(us < _INF * 0.5, us * E_inv, 0.0)
    l_fin = jnp.where(ls > -_INF * 0.5, ls * E_inv, 0.0)
    u_open = us >= _INF * 0.5
    l_open = ls <= -_INF * 0.5

    def outer_body(state):
        x, z, y, rho_scale, it, done, it_vec, rp_o, rd_o, status = state
        rho_vec = rho0 * rho_scale                       # (1, m)
        rho_inv = 1.0 / rho_vec
        Minv = minv_ref[:]
        M = m_ref[:]

        def one_iter(_, carry):
            xi, zi, yi = carry
            rhs = sigma * xi - qs + Atv(rho_vec * zi - yi)
            xt = dotm(rhs, Minv)
            # solve-time iterative refinement against the resident true M
            # (same rationale as ops/admm_full_kernel.py)
            for _ in range(kkt_refine):
                xt = xt + dotm(rhs - dotm(xt, M), Minv)
            zt = Av(xt)
            x1 = alpha * xt + (1.0 - alpha) * xi
            w = alpha * zt + (1.0 - alpha) * zi + rho_inv * yi
            z1 = jnp.clip(w, ls, us)
            y1 = rho_vec * (w - z1)
            return x1, z1, y1

        xn, zn, yn = jax.lax.fori_loop(0, check_interval, one_iter,
                                       (x, z, y))
        fmask = (done > 0).astype(dtype)                 # (chunk, 1)
        keep = 1.0 - fmask
        dx = keep * (xn - x)
        dy = keep * (yn - y)
        x = fmask * x + keep * xn
        z = fmask * z + keep * zn
        y = fmask * y + keep * yn
        it = it + check_interval

        Ax = Av(x)
        Px = Pv(x)
        Aty = Atv(y)
        rp = inf_norm(E_inv * (Ax - z))
        rp_den = jnp.maximum(inf_norm(E_inv * Ax), inf_norm(E_inv * z))
        rd = cinv * inf_norm(D_inv * (Px + qs + Aty))
        rd_den = cinv * jnp.maximum(
            jnp.maximum(inf_norm(D_inv * Px), inf_norm(D_inv * Aty)),
            inf_norm(D_inv * qs))
        ok = ((rp <= eps_abs + eps_rel * rp_den)
              & (rd <= eps_abs + eps_rel * rd_den))      # (chunk, 1)

        # infeasibility certificates (OSQP section 3.4) on the deltas
        Adx = Av(dx)
        Pdx = Pv(dx)
        Atdy = Atv(dy)
        eps_inf = jnp.asarray(1e-4, dtype)
        dy_n = inf_norm(E * dy) * cinv
        cert_p1 = inf_norm(D_inv * Atdy) * cinv <= eps_inf * dy_n
        sup = jnp.sum(u_fin * jnp.maximum(E * dy, 0.0)
                      + l_fin * jnp.minimum(E * dy, 0.0),
                      axis=1, keepdims=True) * cinv
        open_dir = (
            jnp.any((dy > 1e-12) & u_open, axis=1, keepdims=True)
            | jnp.any((dy < -1e-12) & l_open, axis=1, keepdims=True))
        p_inf = ((dy_n > 1e-10) & cert_p1 & (sup <= -eps_inf * dy_n)
                 & ~open_dir)

        dx_n = inf_norm(dx / D_inv)
        cert_d1 = inf_norm(D_inv * Pdx) * cinv <= eps_inf * dx_n
        cert_d2 = (jnp.sum(qs * dx, axis=1, keepdims=True) * cinv
                   <= -eps_inf * dx_n)
        up_ok = u_open | (E_inv * Adx <= eps_inf * dx_n)
        lo_ok = l_open | (E_inv * Adx >= -eps_inf * dx_n)
        d_inf = ((dx_n > 1e-10) & cert_d1 & cert_d2
                 & jnp.all(up_ok & lo_ok, axis=1, keepdims=True))

        newly = ok & (done == 0)
        it_vec = jnp.where(newly, it, it_vec)
        status = jnp.where(ok & (status == 0), 1, status)
        status = jnp.where(p_inf & (status == 0), -3, status)
        status = jnp.where(d_inf & (status == 0), -4, status)
        done = jnp.maximum(done, (ok | p_inf | d_inf).astype(jnp.int32))

        if adaptive:
            # chunk-shared rho: geometric mean of per-instance residual
            # ratios over active instances (solvers/admm_shared.py)
            ratio = jnp.sqrt(
                (rp / jnp.maximum(rp_den, 1e-10))
                / jnp.maximum(rd / jnp.maximum(rd_den, 1e-10), 1e-10))
            active = done == 0
            log_r = jnp.where(active,
                              jnp.log(jnp.clip(ratio, 1e-6, 1e6)), 0.0)
            n_act = jnp.maximum(jnp.sum(active.astype(dtype)), 1.0)
            comb = jnp.exp(jnp.sum(log_r) / n_act)
            change = ((comb > rho_tol) | (comb < 1.0 / rho_tol)) \
                & jnp.any(active)
            if adapt_until > 0:
                change = change & (it <= adapt_until)
            step_f = jnp.clip(jnp.where(change, comb, 1.0), 0.1, 10.0)
            new_scale = jnp.clip(rho_scale * step_f, 1e-6, 1e6)

            @pl.when(change)
            def _():
                # refactor the single resident matrix: re-form M and warm
                # Newton-Schulz restart (spectral-safe rescale; see
                # solvers/admm.py newton_schulz_warm)
                rho_new = rho0 * new_scale
                M2 = (Ps + sigma * eye
                      + jnp.dot(At * rho_new, As,
                                preferred_element_type=dtype,
                                precision=_HI))
                m_ref[:] = M2
                X = minv_ref[:]
                MX = jnp.dot(M2, X, preferred_element_type=dtype,
                             precision=_HI)
                ninf = jnp.max(jnp.sum(jnp.abs(MX), axis=1))
                X = X / jnp.maximum(ninf, 1.0)

                def ns_body(_, Xc):
                    MXc = jnp.dot(M2, Xc, preferred_element_type=dtype,
                                  precision=_HI)
                    return jnp.dot(Xc, 2.0 * eye - MXc,
                                   preferred_element_type=dtype,
                                   precision=_HI)
                minv_ref[:] = jax.lax.fori_loop(0, ns_adapt_iters,
                                                ns_body, X)

            rho_scale = new_scale

        return (x, z, y, rho_scale, it, done, it_vec, rp, rd, status)

    def outer_cond(state):
        it, done = state[4], state[5]
        return jnp.logical_and(jnp.logical_not(jnp.all(done > 0)),
                               it < max_iter)

    dt = dtype
    state0 = (x0_ref[:], z0_ref[:], y0_ref[:],
              jnp.ones((), dt),
              jnp.int32(0),
              jnp.zeros((chunk, 1), jnp.int32),
              jnp.zeros((chunk, 1), jnp.int32),
              jnp.full((chunk, 1), _INF, dt),
              jnp.full((chunk, 1), _INF, dt),
              jnp.zeros((chunk, 1), jnp.int32))
    (x, z, y, _, it, done, it_vec, rp, rd, status) = jax.lax.while_loop(
        outer_cond, outer_body, state0)

    ox_ref[:] = x
    oz_ref[:] = z
    oy_ref[:] = y
    oit_ref[:] = jnp.where(done > 0, it_vec, it)
    ost_ref[:] = status
    orp_ref[:] = rp
    ord_ref[:] = rd


_VMEM_LIMIT = 100 * 1024 * 1024


def pick_shared_chunk(B, m, n, dtype=jnp.float32):
    """Largest chunk (multiple of 8) whose resident set fits VMEM: the
    shared matrices (5x ~n^2), double-buffered per-chunk vectors, scratch
    copies of M/M^{-1}, and GEMM temporaries (measured Mosaic overhead
    ~1.7x the analytic estimate, as in ops/admm_full_kernel.py)."""
    esize = jnp.dtype(dtype).itemsize
    shared = (3 * n * n + 2 * m * n + 2 * n * n) * esize
    for chunk in (1024, 512, 256, 128, 64, 32, 16, 8):
        vecs = chunk * (2 * (2 * n + 4 * m) + 4 * n + 6 * m) * esize
        est = int((shared + vecs) * 1.7)
        if B % chunk == 0 and est <= int(_VMEM_LIMIT * 0.7):
            return chunk
    return None


def admm_shared_solve_pallas(Ps, qs, As, ls, us, rho_base, D, E, c_inv,
                             M0, Minv0, x0, z0, y0, *, sigma, alpha,
                             eps_abs, eps_rel, check_interval, max_iter,
                             ns_adapt_iters, adaptive, rho_tol,
                             kkt_refine=1, adapt_until=0, chunk=None,
                             interpret=False):
    """Full shared-KKT batched ADMM solve in one pallas_call, on SCALED
    data.  Ps (n, n), As (m, n), M0/Minv0 (n, n) shared; qs (B, n),
    ls/us/x0/z0/y0 batched.  Returns (x, z, y, iters, status, rp, rd) in
    the scaled space -- the caller unscales (solvers/admm_shared.py)."""
    m, n = As.shape
    B = qs.shape[0]
    dtype = Ps.dtype
    if chunk is None:
        chunk = pick_shared_chunk(B, m, n, dtype)
    assert chunk is not None and B % chunk == 0
    max_iter = (max_iter // check_interval) * check_interval

    cfg = (chunk, n, m, float(sigma), float(alpha), float(eps_abs),
           float(eps_rel), int(check_interval), int(max_iter),
           int(ns_adapt_iters), bool(adaptive), float(rho_tol),
           int(kkt_refine), int(adapt_until))

    grid = (B // chunk,)

    def shared_spec(r, c):
        return pl.BlockSpec((r, c), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    def vspec(cols):
        return pl.BlockSpec((chunk, cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_shared_solve_kernel, cfg)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[shared_spec(n, n), shared_spec(m, n), shared_spec(n, m),
                  shared_spec(n, n), shared_spec(n, n), shared_spec(1, m),
                  shared_spec(1, n), shared_spec(1, m), shared_spec(1, 1),
                  vspec(n), vspec(m), vspec(m), vspec(n), vspec(m),
                  vspec(m)],
        out_specs=(vspec(n), vspec(m), vspec(m), vspec(1), vspec(1),
                   vspec(1), vspec(1)),
        out_shape=(jax.ShapeDtypeStruct((B, n), dtype),
                   jax.ShapeDtypeStruct((B, m), dtype),
                   jax.ShapeDtypeStruct((B, m), dtype),
                   jax.ShapeDtypeStruct((B, 1), jnp.int32),
                   jax.ShapeDtypeStruct((B, 1), jnp.int32),
                   jax.ShapeDtypeStruct((B, 1), dtype),
                   jax.ShapeDtypeStruct((B, 1), dtype)),
        scratch_shapes=[pltpu.VMEM((n, n), dtype),
                        pltpu.VMEM((n, n), dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(Ps, As, As.T, M0, Minv0, rho_base.reshape(1, m),
      D.reshape(1, n), E.reshape(1, m),
      jnp.asarray(c_inv, dtype).reshape(1, 1),
      qs, ls, us, x0, z0, y0)
    x, z, y, it_vec, status, rp, rd = out
    return (x, z, y, it_vec[:, 0], status[:, 0], rp[:, 0], rd[:, 0])
