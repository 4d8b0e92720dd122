"""Pallas TPU kernel: FULL ADMM solve, one kernel launch.

The chunked kernel (ops/admm_kernel.py) still pays, per check interval: a
kernel relaunch (re-streaming M^{-1} and A from HBM), a separate XLA pass
over A/P for the residual + infeasibility matvecs, and a BATCH-WIDE
synchronization -- every instance runs until the *whole batch* converges,
and any adaptive-rho change refactorizes the whole batch.

This kernel runs the entire solve per block of instances in one
``pallas_call``:

- P, A and the state vectors are loaded into VMEM once per block and stay
  resident for the whole solve;
- the KKT inverse is produced IN-KERNEL by Newton-Schulz (MXU matmuls,
  per-instance ``jnp.dot`` unrolled over the block) from a
  diagonal-preconditioner start -- no separate factorization pass over HBM;
- residual + infeasibility checks run on the resident matrices every
  ``check_interval`` iterations;
- a block stops as soon as ITS instances are done (straggler instances only
  slow their own block, not the batch);
- adaptive rho refactorizes ONLY the blocks whose instances changed rho
  (warm Newton-Schulz restart on the resident inverse).

Replaces the reference's per-iteration QDLDL triangular solves + C loop
(reference osqp generated workspace; cvxpygen/solvers/osqp.py:20-61) with a
single resident-data TPU kernel.  Math identical to solvers/admm.py
``_admm_solve_impl``; see tests/test_full_kernel.py for the equivalence
test.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 1e30


def _full_solve_kernel(cfg, p_ref, a_ref, at_ref, q_ref, l_ref, u_ref,
                       rho0_ref, d_ref, e_ref, cinv_ref, x0_ref, z0_ref,
                       y0_ref, ox_ref, oz_ref, oy_ref, oobj_ref, oit_ref,
                       ost_ref, orp_ref, ord_ref, minv_ref, m_ref):
    (blk, n, m, sigma, alpha, eps_abs, eps_rel, check_interval, max_iter,
     ns_iters, ns_f32_iters, ns_adapt_iters, adaptive, rho_tol,
     kkt_refine, adapt_until) = cfg

    Ps = p_ref[:]                       # (BLK, n, n), symmetric
    As = a_ref[:]                       # (BLK, m, n)
    At = at_ref[:]                      # (BLK, n, m) -- A transposed
    qs = q_ref[:]                       # (BLK, n)
    ls = l_ref[:]
    us = u_ref[:]
    rho0 = rho0_ref[:]                  # (BLK, m)
    D = d_ref[:]                        # (BLK, n)
    E = e_ref[:]                        # (BLK, m)
    cinv = cinv_ref[:]                  # (BLK, 1)
    D_inv = 1.0 / D
    E_inv = 1.0 / E
    dtype = Ps.dtype

    eye = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)).astype(dtype)

    def Av(x):                          # A @ x      -> (BLK, m)
        # via the resident transpose: reduction runs over SUBLANES (axis 1)
        # like every other matvec here; lane reductions measured slower
        return jnp.sum(At * x[:, :, None], axis=1)

    def Atv(v):                         # A^T @ v    -> (BLK, n)
        return jnp.sum(As * v[:, :, None], axis=1)

    def Pv(x):                          # P @ x (P symmetric; sublane reduce)
        return jnp.sum(Ps * x[:, :, None], axis=1)

    def form_M(rho_vec):
        # M = P + sigma I + A^T diag(rho) A, per instance on the MXU
        # (precision HIGHEST: TPU default f32 matmul is a single bf16 pass).
        # M stays RESIDENT in m_ref: the solve-time refinement step then
        # costs one n x n matvec instead of P/A/A^T passes (3n^2+? -> n^2).
        AR = As * rho_vec[:, :, None]
        rows = []
        for b in range(blk):
            AtRA = jax.lax.dot_general(
                As[b], AR[b], (((0,), (0,)), ((), ())),
                preferred_element_type=dtype,
                precision=jax.lax.Precision.HIGHEST)
            rows.append(Ps[b] + sigma * eye + AtRA)
        m_ref[:] = jnp.stack(rows)
        return m_ref[:]

    def ns_sweep(M, iters, precision):
        # Newton-Schulz X <- X(2I - MX) on the resident inverse, in place
        def body(_, carry):
            for b in range(blk):
                Xb = minv_ref[b]
                MX = jax.lax.dot_general(
                    M[b], Xb, (((1,), (0,)), ((), ())),
                    preferred_element_type=dtype, precision=precision)
                minv_ref[b] = jax.lax.dot_general(
                    Xb, 2.0 * eye - MX, (((1,), (0,)), ((), ())),
                    preferred_element_type=dtype, precision=precision)
            return carry
        jax.lax.fori_loop(0, iters, body, 0, unroll=False)

    def diag_start(M):
        # X0 = diag(M)^{-1}, rescaled so eig(M X0) in (0,1] (monotone NS
        # from any SPD start; see solvers/admm.py newton_schulz_warm)
        dg = jnp.sum(M * eye[None], axis=1)             # (BLK, n)
        dg_inv = 1.0 / jnp.maximum(dg, 1e-12)
        MD = M * dg_inv[:, None, :]
        ninf = jnp.max(jnp.sum(jnp.abs(MD), axis=2), axis=1,
                       keepdims=True)                   # (BLK, 1)
        scale = dg_inv / jnp.maximum(ninf, 1.0)
        return eye[None] * scale[:, None, :]

    def ns_rescue(M):
        # NS divergence guard (mirrors solvers/admm.py _ns_rescue): bf16-
        # pass bulk sweeps can leave the NS basin above cond(M) ~ 1e4
        # (observed: portfolio varying-P overflowed every instance to NaN
        # on TPU).  Check the per-instance residual certificate
        # ||I - M X||_inf; where it fails (incl. NaN), reset to the
        # guaranteed-monotone diagonal start and redo the sweep at full
        # f32 precision.  Good instances sit at the NS fixed point, so the
        # extra full-precision sweep only polishes them.
        X = minv_ref[:]
        errs = []
        for b in range(blk):
            MX = jax.lax.dot_general(
                M[b], X[b], (((1,), (0,)), ((), ())),
                preferred_element_type=dtype,
                precision=jax.lax.Precision.HIGHEST)
            # per-instance scalar certificate, (1, 1)-shaped: avoids a
            # (BLK, n, n) residual temporary that would blow scoped VMEM
            errs.append(jnp.max(jnp.abs(eye - MX), axis=(0, 1),
                                keepdims=True))
        err = jnp.concatenate(errs, axis=0)             # (BLK, 1)
        # 0.05 gate: see solvers/admm.py _ns_rescue -- err ~ 0.2-0.4
        # inverses pass 0.5 but degrade tight-eps families
        bad = jnp.logical_not(err < 0.05)

        @pl.when(jnp.any(bad))
        def _():
            # reset ONLY the bad instances to the diagonal start, one
            # (n, n) temporary at a time (a batched blend would need
            # ~3 extra (BLK, n, n) temporaries -> scoped-VMEM OOM)
            for b in range(blk):
                dgb = jnp.sum(M[b] * eye, axis=0)
                dgi = 1.0 / jnp.maximum(dgb, 1e-12)
                ninfb = jnp.max(jnp.sum(jnp.abs(M[b] * dgi[None, :]),
                                        axis=1))
                X0b = eye * (dgi / jnp.maximum(ninfb, 1.0))[None, :]
                # scalar predicate from the f32 certificate (Mosaic cannot
                # squeeze a bool vector element to a scalar)
                minv_ref[b] = jnp.where(err[b, 0] < 0.05, minv_ref[b],
                                        X0b)
            ns_sweep(M, max(ns_iters, 30), jax.lax.Precision.HIGHEST)

    def factor_cold(M):
        minv_ref[:] = diag_start(M)
        if ns_iters > ns_f32_iters:
            ns_sweep(M, ns_iters - ns_f32_iters, jax.lax.Precision.DEFAULT)
            ns_sweep(M, ns_f32_iters, jax.lax.Precision.HIGHEST)
            ns_rescue(M)
        else:
            ns_sweep(M, ns_iters, jax.lax.Precision.HIGHEST)

    def factor_warm(M):
        # spectral-safe warm restart: rescale the resident inverse so
        # eig(M X0) in (0, 1]
        X = minv_ref[:]
        rows = []
        for b in range(blk):
            rows.append(jax.lax.dot_general(
                M[b], X[b], (((1,), (0,)), ((), ())),
                preferred_element_type=dtype,
                precision=jax.lax.Precision.HIGHEST))
        MX = jnp.stack(rows)
        ninf = jnp.max(jnp.sum(jnp.abs(MX), axis=2), axis=1, keepdims=True)
        minv_ref[:] = X / jnp.maximum(ninf, 1.0)[:, :, None]
        ns_sweep(M, ns_adapt_iters, jax.lax.Precision.HIGHEST)
        ns_rescue(M)

    factor_cold(form_M(rho0))

    def inf_norm(v):
        return jnp.max(jnp.abs(v), axis=1, keepdims=True)   # (BLK, 1)

    u_fin = jnp.where(us < _INF * 0.5, us * E_inv, 0.0)
    l_fin = jnp.where(ls > -_INF * 0.5, ls * E_inv, 0.0)
    u_open = us >= _INF * 0.5
    l_open = ls <= -_INF * 0.5

    max_chunks = max_iter // check_interval

    def outer_body(state):
        x, z, y, rho_scale, it, done, it_vec, rp_o, rd_o, status = state
        rho_vec = rho0 * rho_scale                       # (BLK, m)
        rho_inv = 1.0 / rho_vec
        Minv = minv_ref[:]
        Ms = m_ref[:]

        def Minv_v(r):                  # M^{-1} @ r (symmetric)
            return jnp.sum(Minv * r[:, :, None], axis=1)

        def Mv(r):                      # M @ r (resident, symmetric)
            return jnp.sum(Ms * r[:, :, None], axis=1)

        def one_iter(_, carry):
            xi, zi, yi = carry
            rhs = sigma * xi - qs + Atv(rho_vec * zi - yi)
            xt = Minv_v(rhs)
            # iterative refinement at SOLVE time: computing the residual
            # against the true M reaches backward error ~eps_f32, which an
            # explicitly polished inverse cannot (NS stalls at eps*cond);
            # needed for eps <= 1e-4 tolerances on ill-scaled families.
            # Uses the RESIDENT M (one n x n matvec, vs P/A/A^T passes).
            for _ in range(kkt_refine):
                xt = xt + Minv_v(rhs - Mv(xt))
            zt = Av(xt)
            x1 = alpha * xt + (1.0 - alpha) * xi
            w = alpha * zt + (1.0 - alpha) * zi + rho_inv * yi
            z1 = jnp.clip(w, ls, us)
            y1 = rho_vec * (w - z1)
            return x1, z1, y1

        xn, zn, yn = jax.lax.fori_loop(0, check_interval, one_iter,
                                       (x, z, y))
        # freeze converged instances: batch result == single-instance result
        fmask = (done > 0).astype(dtype)                 # (BLK, 1)
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
              & (rd <= eps_abs + eps_rel * rd_den))      # (BLK, 1)

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

        dx_n = inf_norm(D * dx)
        cert_d1 = inf_norm(D_inv * Pdx) * cinv <= eps_inf * dx_n
        cert_d2 = (jnp.sum(qs * dx, axis=1, keepdims=True) * cinv
                   <= -eps_inf * dx_n)
        # (bool-or, not where(mask, True, pred): Mosaic cannot lower the
        # i8->i1 vector truncation the literal-True where produces)
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
            ratio = jnp.sqrt(
                (rp / jnp.maximum(rp_den, 1e-10))
                / jnp.maximum(rd / jnp.maximum(rd_den, 1e-10), 1e-10))
            change = ((ratio > rho_tol) | (ratio < 1.0 / rho_tol)) \
                & (done == 0)
            if adapt_until > 0:
                change = change & (it <= adapt_until)
            step_f = jnp.clip(jnp.where(change, ratio, 1.0), 0.1, 10.0)
            new_scale = jnp.clip(rho_scale * step_f, 1e-6, 1e6)

            @pl.when(jnp.any(change))
            def _():
                factor_warm(form_M(rho0 * new_scale))

            rho_scale = new_scale

        return (x, z, y, rho_scale, it, done, it_vec, rp, rd, status)

    def outer_cond(state):
        it, done = state[4], state[5]
        return jnp.logical_and(jnp.logical_not(jnp.all(done > 0)),
                               it < max_iter)

    dt = dtype
    state0 = (x0_ref[:], z0_ref[:], y0_ref[:],
              jnp.ones((blk, 1), dt),
              jnp.int32(0),
              jnp.zeros((blk, 1), jnp.int32),
              jnp.zeros((blk, 1), jnp.int32),
              jnp.full((blk, 1), _INF, dt),
              jnp.full((blk, 1), _INF, dt),
              jnp.zeros((blk, 1), jnp.int32))
    (x, z, y, _, it, done, it_vec, rp, rd, status) = jax.lax.while_loop(
        outer_cond, outer_body, state0)

    ox_ref[:] = x
    oz_ref[:] = z
    oy_ref[:] = y
    # objective IN-KERNEL from the resident scaled data (replaces the XLA
    # einsum over the (B, n, n) Ps -- a full HBM pass):
    # obj = c^{-1} (0.5 x'Ps x + qs'x) on the scaled iterate
    Psx = jnp.sum(Ps * x[:, :, None], axis=1)            # (BLK, n)
    oobj_ref[:] = cinv * (
        0.5 * jnp.sum(x * Psx, axis=1, keepdims=True)
        + jnp.sum(qs * x, axis=1, keepdims=True))
    oit_ref[:] = jnp.where(done > 0, it_vec, it)
    ost_ref[:] = status
    orp_ref[:] = rp
    ord_ref[:] = rd


# v5e/v5p VMEM is far larger than the 16MB default scoped limit; the
# kernel requests 100MB and sizes blocks to fit it.  The Mosaic stack
# overhead vs the analytic estimate was measured at ~3.7x with the NS
# divergence-rescue branch in place (102.7MB actual vs 28MB raw estimate
# on the portfolio family at blk=32), and the actual allocation GROWS
# with the requested limit (more aggressive pipelining), so block sizing
# must be conservative rather than the limit generous.
_VMEM_LIMIT = 100 * 1024 * 1024
_BLOCK_BUDGET = 70 * 1024 * 1024


def pick_full_block(B, m, n, dtype=jnp.float32):
    """Largest batch block (multiple of 8) whose resident set fits the
    block budget: pipelined P/A inputs (x2), the M^{-1} scratch, M and
    broadcast temporaries, with the measured ~3.7x Mosaic overhead."""
    esize = jnp.dtype(dtype).itemsize
    for blk in (32, 16, 8, 4):
        # pipelined P/A/At inputs (x2), M^{-1} + resident-M scratches,
        # and broadcast temporaries
        est = blk * (2 * (n * n + 2 * m * n) + 3 * n * n + 2 * m * n) * esize
        est = int(est * 3.7)
        if B % blk == 0 and est <= _BLOCK_BUDGET:
            return blk
    return None


def admm_solve_full_pallas(Ps, qs, As, ls, us, rho_base, D, E, c_inv,
                           x0, z0, y0, *, sigma, alpha, eps_abs, eps_rel,
                           check_interval, max_iter, ns_iters,
                           ns_f32_iters, ns_adapt_iters, adaptive,
                           rho_tol, kkt_refine=1, adapt_until=0,
                           block=None, interpret=False):
    """Full batched ADMM solve in one pallas_call, on SCALED data.

    All arrays batched on axis 0 (already Ruiz-equilibrated); returns
    (x, z, y, iters, status, rp, rd) in the scaled space -- the caller
    unscales (mirrors solvers/admm.py).
    """
    B, m, n = As.shape
    dtype = Ps.dtype
    if block is None:
        block = pick_full_block(B, m, n, dtype)
    assert block is not None and B % block == 0
    # round max_iter down to whole chunks (parity with the chunked path)
    max_iter = (max_iter // check_interval) * check_interval

    cfg = (block, n, m, float(sigma), float(alpha), float(eps_abs),
           float(eps_rel), int(check_interval), int(max_iter),
           int(ns_iters), int(ns_f32_iters), int(ns_adapt_iters),
           bool(adaptive), float(rho_tol), int(kkt_refine),
           int(adapt_until))

    grid = (B // block,)

    def vspec(cols):
        return pl.BlockSpec((block, cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    mat_n = pl.BlockSpec((block, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    mat_mn = pl.BlockSpec((block, m, n), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    mat_nm = pl.BlockSpec((block, n, m), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)

    kernel = functools.partial(_full_solve_kernel, cfg)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[mat_n, mat_mn, mat_nm, vspec(n), vspec(m), vspec(m),
                  vspec(m), vspec(n), vspec(m), vspec(1), vspec(n),
                  vspec(m), vspec(m)],
        out_specs=(vspec(n), vspec(m), vspec(m), vspec(1), vspec(1),
                   vspec(1), vspec(1), vspec(1)),
        out_shape=(jax.ShapeDtypeStruct((B, n), dtype),
                   jax.ShapeDtypeStruct((B, m), dtype),
                   jax.ShapeDtypeStruct((B, m), dtype),
                   jax.ShapeDtypeStruct((B, 1), dtype),
                   jax.ShapeDtypeStruct((B, 1), jnp.int32),
                   jax.ShapeDtypeStruct((B, 1), jnp.int32),
                   jax.ShapeDtypeStruct((B, 1), dtype),
                   jax.ShapeDtypeStruct((B, 1), dtype)),
        scratch_shapes=[pltpu.VMEM((block, n, n), dtype),
                        pltpu.VMEM((block, n, n), dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(Ps, As, jnp.swapaxes(As, 1, 2), qs, ls, us, rho_base,
      D, E, c_inv.reshape(B, 1), x0, z0, y0)
    x, z, y, obj, it_vec, status, rp, rd = out
    return (x, z, y, obj[:, 0], it_vec[:, 0], status[:, 0],
            rp[:, 0], rd[:, 0])
