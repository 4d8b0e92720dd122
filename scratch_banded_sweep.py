"""Sweep block size s and batch B for the banded charging family (TPU)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def build_family(T=1440):
    import cvxpygen_tpu as ct
    from cvxpygen_tpu.canon.canonicalizer import canonicalize
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
    return prob, canonicalize(prob)


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp
    from cvxpygen_tpu.solvers.admm import ADMMSettings
    from cvxpygen_tpu.solvers.admm_banded import (admm_solve_banded,
                                                  build_banded_structure)
    from cvxpygen_tpu.runtime.jax_family import JaxFamily, canon_batch_sparse

    prob, fam = build_family()
    jf = JaxFamily.from_family(fam, dtype=jnp.float32, force_scatter=True)
    base = fam.pack_theta(params=prob.parameters())
    pi = [x for x in fam.param_info if x.name == 'p'][0]
    rng = np.random.default_rng(2)

    st = ADMMSettings(eps_abs=0.0, eps_rel=0.0, max_iter=100,
                      check_interval=100, adaptive_rho=False)

    import jax as _jax

    for B in (32, 256):
        theta = np.tile(base, (B, 1))
        theta[:, pi.offset:pi.offset + pi.flat_size] *= rng.uniform(
            0.8, 1.2, (B, pi.flat_size))
        theta_j = jnp.asarray(theta, jnp.float32)
        for s_cand in ((8,), (16,), (32,), (64,)):
            struct = build_banded_structure(
                fam.P_idx, fam.A_idx, fam.n, fam.m, s_candidates=s_cand)
            if struct is None:
                print(f'B={B} s={s_cand[0]}: not banded', flush=True)
                continue

            @_jax.jit
            def run(jf, th):
                data = canon_batch_sparse(jf, th)
                mz = jf.n_zero
                b = data['b']
                l = -b
                u = jnp.concatenate(
                    [-b[:, :mz], jnp.full_like(b[:, mz:], jnp.inf)], axis=1)
                res = admm_solve_banded(struct, data['pvals'], data['q'],
                                        data['avals'], l, u, jf.n_zero, st)
                return res['obj']

            t0 = time.perf_counter()
            float(jnp.sum(run(jf, theta_j)))
            tc = time.perf_counter() - t0
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(jnp.sum(run(jf, theta_j)))
                best = min(best, time.perf_counter() - t0)
            print(f'B={B} s={struct.s} nb={struct.nb}: compile {tc:.0f}s, '
                  f'{1000 * best / 100:.2f} ms/iter, '
                  f'{B * 100 / best:.0f} inst-iters/s', flush=True)


if __name__ == '__main__':
    main()
