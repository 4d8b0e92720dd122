"""Benchmark: batched MPC-QP solves/s on one chip (BASELINE.md target:
>= 10,000 solves/s/chip on TPU v5e with objective parity vs OSQP-style C).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Runs on the default JAX backend (the real TPU chip under the driver).
"""
import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                'tests'))

import numpy as np


def main():
    import jax
    # persistent compile cache: remote AOT compiles on the axon relay take
    # minutes; cache hits make re-runs start in seconds
    try:
        jax.config.update('jax_compilation_cache_dir',
                          os.environ.get('JAX_CACHE_DIR', '/tmp/jax_cache'))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from problems import MPC_problem, assign_MPC
    from cvxpygen_tpu.canon.canonicalizer import canonicalize
    from cvxpygen_tpu.runtime.jax_family import (
        JaxFamily, canon_batch, qp_bounds_batch)
    from cvxpygen_tpu.solvers.admm import ADMMSettings, admm_solve
    from cvxpygen_tpu.solvers.oracle import solve_family_numpy

    prob = MPC_problem()
    assign_MPC(prob, seed=0)
    fam = canonicalize(prob)

    rng = np.random.default_rng(0)
    thetas = []
    for seed in range(16):
        assign_MPC(prob, seed=seed)
        thetas.append(fam.pack_theta(params=prob.parameters()))
    T16 = np.stack(thetas)

    dtype = jnp.float32 if jax.default_backend() != 'cpu' else None
    jf = JaxFamily.from_family(fam, dtype=dtype)
    # reference-parity tolerances (tests/utils_test.py:25-28): eps 1e-3.
    # The fused Pallas iteration kernel (ops/admm_kernel.py) is the default
    # TPU path (measured 1.44x over plain XLA at B=2048); BENCH_PALLAS=0
    # opts out.
    # default: full-solve kernel (admm_full_kernel) -- whole ADMM solve in
    # one pallas_call; measured 6,346 solves/s vs 5,217 chunked (BENCH.md).
    # BENCH_FULL=0 falls back to the chunked kernel, BENCH_PALLAS=0 to XLA.
    use_pallas = 'full'
    if os.environ.get('BENCH_FULL') == '0':
        use_pallas = 'auto'
    if os.environ.get('BENCH_PALLAS') == '0':
        use_pallas = 'never'
    # swept on v5e (BENCH.md): scaling=3 Ruiz iterations reach the same
    # conditioning as 10 on this family; check_interval=15 balances
    # convergence-check overhead vs iteration overshoot
    st = ADMMSettings(eps_abs=1e-3, eps_rel=1e-3, max_iter=2000,
                      check_interval=int(os.environ.get('BENCH_CHECK', '15')),
                      ns_iters=int(os.environ.get('BENCH_NS', '16')),
                      ns_f32_iters=int(os.environ.get('BENCH_NSF32', '6')),
                      ns_adapt_iters=int(os.environ.get('BENCH_NSADAPT',
                                                        '12')),
                      adaptive_rho_until=int(os.environ.get(
                          'BENCH_ADAPT_UNTIL', '0')),
                      scaling=int(os.environ.get('BENCH_SCALING', '3')),
                      use_pallas=use_pallas,
                      kkt_refine=int(os.environ.get('BENCH_REFINE', '1')),
                      adaptive_rho=True)

    @jax.jit
    def step(jf, theta):
        data = canon_batch(jf, theta)
        l, u = qp_bounds_batch(jf, data['b'])
        res = admm_solve(data['P'], data['q'], data['A'], l, u,
                         jf.n_zero, st)
        return res['x'], res['obj'] + data['d'], res['solved'], res['iters']

    B = int(os.environ.get('BENCH_BATCH', '2048'))
    theta = jnp.asarray(np.tile(T16, (B // 16 + 1, 1))[:B],
                        dtype=dtype or jnp.float64)

    # compile + warmup; materialize a scalar -- on the axon relay,
    # block_until_ready alone does NOT guarantee compile/exec completed
    t0 = time.perf_counter()
    try:
        x, obj, solved, iters = step(jf, theta)
        _ = float(np.asarray(obj).sum())
    except Exception as e:  # pallas lowering issues -> plain XLA fallback
        print(f'# pallas path failed ({type(e).__name__}); falling back',
              file=sys.stderr, flush=True)
        st = ADMMSettings(eps_abs=1e-3, eps_rel=1e-3, max_iter=2000,
                          check_interval=25, use_pallas='never')

        @jax.jit
        def step(jf, theta):
            data = canon_batch(jf, theta)
            l, u = qp_bounds_batch(jf, data['b'])
            res = admm_solve(data['P'], data['q'], data['A'], l, u,
                             jf.n_zero, st)
            return res['x'], res['obj'] + data['d'], res['solved'], res['iters']

        x, obj, solved, iters = step(jf, theta)
        _ = float(np.asarray(obj).sum())
    print(f'# compile+first run: {time.perf_counter() - t0:.1f}s',
          file=sys.stderr, flush=True)

    reps = int(os.environ.get('BENCH_REPS', '3'))
    t0 = time.perf_counter()
    for _ in range(reps):
        x, obj, solved, iters = step(jf, theta)
        # force full materialization each rep (the axon tunnel's
        # block_until_ready alone proved unreliable for timing)
        _ = float(np.asarray(obj).sum())
    dt = time.perf_counter() - t0
    solves_per_s = B * reps / dt
    print(f'# timed {reps} reps in {dt:.3f}s', file=sys.stderr, flush=True)

    # objective parity vs float64 oracle on base instances
    n_check = 8
    obj_np = np.asarray(obj[:n_check], dtype=np.float64)
    max_rel = 0.0
    for i in range(n_check):
        res, _ = solve_family_numpy(fam, T16[i])
        tt = np.concatenate([T16[i], [1.0]])
        ref = res.obj + float(np.asarray(fam.d_map @ tt).ravel()[0])
        max_rel = max(max_rel, abs(obj_np[i] - ref) / max(1.0, abs(ref)))

    frac_solved = float(np.mean(np.asarray(solved)))
    result = {
        'metric': 'mpc_qp_solves_per_s_per_chip',
        'value': round(solves_per_s, 1),
        'unit': 'solves/s',
        'vs_baseline': round(solves_per_s / 10000.0, 4),
        'batch': B,
        'mean_iters': float(np.mean(np.asarray(iters))),
        'frac_solved': frac_solved,
        'max_obj_rel_err_vs_oracle': round(max_rel, 6),
        'backend': jax.default_backend(),
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()
