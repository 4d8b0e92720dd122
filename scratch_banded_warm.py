"""Probe: banded charging — check-interval/refine tuning + warm start."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def run():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
    import jax.numpy as jnp
    import cvxpygen_tpu as ct
    from cvxpygen_tpu.canon.canonicalizer import canonicalize
    from cvxpygen_tpu.runtime.solver import CompiledBandedQPSolver
    from cvxpygen_tpu.solvers.admm import ADMMSettings

    T = 1440
    u = ct.Variable(T, name='u')
    qv = ct.Variable(T + 1, name='q')
    p = ct.Parameter(T, nonneg=True, name='p')
    s = ct.Parameter(T, nonneg=True, name='s')
    D = ct.Parameter(nonneg=True, name='D')
    C = ct.Parameter(nonneg=True, name='C')
    Q = ct.Parameter(nonneg=True, name='Q')
    gamma = ct.Parameter(nonneg=True, name='gamma')
    objective = ct.Minimize(p @ u + s @ ct.abs(u) + gamma * ct.sum_squares(u))
    constraints = [qv[1:] == qv[:-1] + u, -D <= u, u <= C,
                   ct.Constant(0) <= qv, qv <= Q, qv[0] == 0, qv[T] == Q]
    prob = ct.Problem(objective, constraints)
    p.value = np.concatenate((
        3 * np.ones(int(3 * T / 24)), 5 * np.ones(int(7 * T / 24)),
        1 * np.ones(T - int(3 * T / 24) - int(7 * T / 24))))
    s.value = 0.1 * p.value
    Q.value = 1.0
    C.value = 3 * Q.value / T
    D.value = 2 * C.value
    gamma.value = 100.0
    fam = canonicalize(prob)
    B = int(os.environ.get('B', '256'))
    rng = np.random.default_rng(2)
    base = fam.pack_theta(params=prob.parameters())
    pi = [x for x in fam.param_info if x.name == 'p'][0]
    theta = np.tile(base, (B, 1))
    theta[:, pi.offset:pi.offset + pi.flat_size] *= rng.uniform(
        0.8, 1.2, (B, pi.flat_size))

    for (check, refine, until) in ((25, 1, 0), (50, 1, 0), (50, 0, 0),
                                   (50, 1, 200)):
        st = ADMMSettings(eps_abs=1e-3, eps_rel=1e-3, max_iter=10000,
                          check_interval=check, kkt_refine=refine,
                          adaptive_rho=True, adaptive_rho_until=until)
        solver = CompiledBandedQPSolver(fam, settings=st, dtype=jnp.float32)
        t0 = time.perf_counter()
        out = solver.solve_batch(theta)
        float(jnp.sum(out['obj']))
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = solver.solve_batch(theta)
        float(jnp.sum(out['obj']))
        dt = time.perf_counter() - t0
        print(f'check={check} refine={refine} until={until}: compile {tc:.0f}s '
              f'{B/dt:.1f} solves/s iters {float(np.mean(np.asarray(out["iters"]))):.0f} '
              f'frac {float(np.mean(np.asarray(out["solved"]))):.3f}', flush=True)

    # receding-horizon warm start: re-solve with prices shifted 1 step
    st = ADMMSettings(eps_abs=1e-3, eps_rel=1e-3, max_iter=10000,
                      check_interval=25, kkt_refine=1, adaptive_rho=True)
    solver = CompiledBandedQPSolver(fam, settings=st, dtype=jnp.float32)
    out = solver.solve_batch(theta)
    float(jnp.sum(out['obj']))
    theta2 = theta.copy()
    pv = theta2[:, pi.offset:pi.offset + pi.flat_size]
    theta2[:, pi.offset:pi.offset + pi.flat_size] = np.roll(pv, -1, axis=1)
    x0 = np.asarray(out['x'])
    y0 = np.asarray(out['y'])
    t0 = time.perf_counter()
    out2 = solver.solve_batch(theta2, x0=x0, y0=y0)
    float(jnp.sum(out2['obj']))
    dt = time.perf_counter() - t0
    print(f'warm receding-horizon: {B/dt:.1f} solves/s iters '
          f'{float(np.mean(np.asarray(out2["iters"]))):.0f} frac '
          f'{float(np.mean(np.asarray(out2["solved"]))):.3f}', flush=True)


if __name__ == '__main__':
    run()
