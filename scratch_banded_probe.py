"""Probe: where does banded-ADMM time go on the TPU chip? (untracked)"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir',
                      os.environ.get('JAX_CACHE_DIR', '/tmp/jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp
    import cvxpygen_tpu as ct
    from cvxpygen_tpu.canon.canonicalizer import canonicalize
    from cvxpygen_tpu.runtime.solver import CompiledBandedQPSolver
    from cvxpygen_tpu.solvers.admm import ADMMSettings

    T = int(os.environ.get('T', '1440'))
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
    print('n', fam.n, 'm', fam.m, 'nnzP', len(fam.P_idx[0]),
          'nnzA', len(fam.A_idx[0]), flush=True)

    B = int(os.environ.get('B', '32'))
    rng = np.random.default_rng(2)
    base = fam.pack_theta(params=prob.parameters())
    pi = [x for x in fam.param_info if x.name == 'p'][0]
    theta = np.tile(base, (B, 1))
    theta[:, pi.offset:pi.offset + pi.flat_size] *= rng.uniform(
        0.8, 1.2, (B, pi.flat_size))

    st = ADMMSettings(eps_abs=1e-3, eps_rel=1e-3, max_iter=10000,
                      check_interval=int(os.environ.get('CHECK', '25')),
                      adaptive_rho=True)
    solver = CompiledBandedQPSolver(fam, settings=st, dtype=jnp.float32)
    print('block s =', solver.struct.s, 'nb =', solver.struct.nb,
          'pairs =', len(solver.struct.pr_k1), flush=True)

    def mat(x):
        return float(jnp.sum(x))

    t0 = time.perf_counter()
    out = solver.solve_batch(theta)
    mat(out['obj'])
    print(f'compile+first: {time.perf_counter() - t0:.1f}s', flush=True)
    print('mean iters', float(np.mean(np.asarray(out['iters']))),
          'frac', float(np.mean(np.asarray(out['solved']))), flush=True)
    for _ in range(3):
        t0 = time.perf_counter()
        out = solver.solve_batch(theta)
        mat(out['obj'])
        dt = time.perf_counter() - t0
        print(f'solve: {dt:.3f}s -> {B / dt:.1f} solves/s', flush=True)

    # component timings: fixed 100 iterations, no checks
    st2 = ADMMSettings(eps_abs=0.0, eps_rel=0.0, max_iter=100,
                       check_interval=100, adaptive_rho=False)
    s2 = CompiledBandedQPSolver(fam, settings=st2, dtype=jnp.float32)
    t0 = time.perf_counter()
    out = s2.solve_batch(theta)
    mat(out['obj'])
    print(f'fixed100 compile+first: {time.perf_counter() - t0:.1f}s',
          flush=True)
    for _ in range(3):
        t0 = time.perf_counter()
        out = s2.solve_batch(theta)
        mat(out['obj'])
        dt = time.perf_counter() - t0
        print(f'fixed100: {dt:.3f}s -> {1000 * dt / 100:.2f} ms/iter '
              f'({B * 100 / dt:.0f} inst-iters/s)', flush=True)


if __name__ == '__main__':
    main()
