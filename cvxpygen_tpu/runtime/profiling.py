"""Per-stage profiling of compiled family solves.

The reference's only timing is a wall clock around the generated solve
(reference cvxpygen/utils.py:1210-1247 std::chrono; cpg_solver.py.jinja2:
70-73).  Here profiling is a first-class library feature:

- ``profile_qp_solve``: stage-by-stage device timings (canonicalize GEMM,
  Ruiz equilibration, KKT assembly, Newton-Schulz factorization, one
  iteration block, residual check) with the relay-safe protocol: every
  stage reduces to a device scalar before fetching (a large-array fetch
  would time the host transfer, not the compute).
- ``trace``: context manager around jax.profiler for TensorBoard-grade
  traces of the full jitted solve.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace around a block (view with TensorBoard)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _timed(fn, *args, reps=3):
    import jax
    import jax.numpy as jnp

    def scalarized(*a):
        out = fn(*a)
        leaves = jax.tree_util.tree_leaves(out)
        return out, sum(jnp.sum(x) for x in leaves)

    sfn = jax.jit(scalarized)
    out, s = sfn(*args)
    _ = float(s)  # materialize: compile + warmup outside the timed region
    t0 = time.perf_counter()
    for _ in range(reps):
        out, s = sfn(*args)
        _ = float(s)
    return (time.perf_counter() - t0) / reps * 1000.0, out


def profile_qp_solve(jf, theta, settings=None, reps=3) -> Dict[str, float]:
    """Per-stage timings (ms) of the batched ADMM QP solve at this batch
    size.  Stages mirror the solve pipeline; 'total_solve' runs the full
    fused solve for comparison (fusion usually beats the sum of stages)."""
    import jax
    import jax.numpy as jnp

    from ..solvers import admm as AD
    from .jax_family import canon_batch, qp_bounds_batch

    st = settings or AD.ADMMSettings()
    theta = jnp.atleast_2d(jnp.asarray(theta))
    B = theta.shape[0]
    out: Dict[str, float] = {}

    with jax.default_matmul_precision('highest'):
        t, data = _timed(lambda jf_, th: canon_batch(jf_, th), jf, theta,
                         reps=reps)
        out['canonicalize_ms'] = t
        l, u = qp_bounds_batch(jf, data['b'])

        t, sc = _timed(
            lambda P, q, A, l, u: AD.ruiz_equilibrate(P, q, A, l, u,
                                                      st.scaling),
            data['P'], data['q'], data['A'], l, u, reps=reps)
        out['equilibrate_ms'] = t
        Ps, qs, As = sc[0], sc[1], sc[2]

        m, n = As.shape[1], As.shape[2]
        rho_np = np.where(np.arange(m) < jf.n_zero,
                          st.rho * st.rho_eq_scale, st.rho)
        rho_vec = jnp.broadcast_to(
            jnp.asarray(rho_np, Ps.dtype), (B, m))

        def formM(Ps, As, rho_vec):
            return (Ps + st.sigma * jnp.eye(n, dtype=Ps.dtype)
                    + jnp.einsum('bki,bk,bkj->bij', As, rho_vec, As))

        t, M = _timed(formM, Ps, As, rho_vec, reps=reps)
        out['kkt_assemble_ms'] = t

        t, Minv = _timed(
            lambda M: AD.newton_schulz_inverse(M, st.ns_iters), M, reps=reps)
        out['factorize_ms'] = t

        x0 = jnp.zeros((B, n), Ps.dtype)
        z0 = jnp.zeros((B, m), Ps.dtype)

        def block(Minv, Ps, qs, As, l, u, rho_vec, x, z, y):
            def one(_, carry):
                xx, zz, yy = carry
                rhs = st.sigma * xx - qs + jnp.einsum(
                    'bkj,bk->bj', As, rho_vec * zz - yy)
                xt = jnp.einsum('bij,bj->bi', Minv, rhs)
                zt = jnp.einsum('bij,bj->bi', As, xt)
                x1 = st.alpha * xt + (1 - st.alpha) * xx
                w = st.alpha * zt + (1 - st.alpha) * zz + yy / rho_vec
                z1 = jnp.clip(w, l, u)
                return x1, z1, rho_vec * (w - z1)
            return jax.lax.fori_loop(0, st.check_interval, one, (x, z, y))

        ls, us = sc[3], sc[4]
        t, _ = _timed(block, Minv, Ps, qs, As, ls, us, rho_vec,
                      x0, z0, z0, reps=reps)
        out[f'iterate_{st.check_interval}_ms'] = t

    def full(jf_, th):
        d = canon_batch(jf_, th)
        l_, u_ = qp_bounds_batch(jf_, d['b'])
        return AD.admm_solve(d['P'], d['q'], d['A'], l_, u_, jf_.n_zero, st)

    t, res = _timed(full, jf, theta, reps=reps)
    out['total_solve_ms'] = t
    out['mean_iters'] = float(np.mean(np.asarray(res['iters'])))
    out['solves_per_s'] = B / (t / 1000.0)
    return out
