"""Multi-host / multi-chip scaling benchmark (BASELINE.md: >= 80%
iterations/s scaling efficiency at >= 2 hosts).

Run on every host of a pod slice, e.g.:
    python bench_multihost.py --coordinator <host0>:8476 --num-hosts N --host-id K
Single-host multi-chip: just `python bench_multihost.py`.
On CPU (no TPU) it exercises the same code path over the virtual device
mesh (correctness, not performance).

Prints one JSON line per run with iterations/s and scaling efficiency
relative to the single-device rate measured in the same run.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                'tests'))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--coordinator', default=None)
    ap.add_argument('--num-hosts', type=int, default=1)
    ap.add_argument('--host-id', type=int, default=0)
    ap.add_argument('--batch-per-device', type=int, default=256)
    ap.add_argument('--iters', type=int, default=200)
    args = ap.parse_args()

    import jax
    if args.coordinator:
        jax.distributed.initialize(coordinator_address=args.coordinator,
                                   num_processes=args.num_hosts,
                                   process_id=args.host_id)
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from problems import MPC_problem, assign_MPC
    from cvxpygen_tpu.canon.canonicalizer import canonicalize
    from cvxpygen_tpu.parallel.mesh import make_mesh
    from cvxpygen_tpu.runtime.jax_family import (
        JaxFamily, canon_batch, qp_bounds_batch)
    from cvxpygen_tpu.solvers.admm import ADMMSettings, admm_solve

    prob = MPC_problem()
    assign_MPC(prob, seed=0)
    fam = canonicalize(prob)
    dtype = jnp.float32 if jax.default_backend() != 'cpu' else None
    jf = JaxFamily.from_family(fam, dtype=dtype)
    thetas = [fam.pack_theta(params=assign_MPC(prob, seed=s).parameters())
              for s in range(8)]
    T8 = np.stack(thetas)
    # fixed iteration count isolates iterations/s from termination variance
    st = ADMMSettings(max_iter=args.iters, check_interval=args.iters,
                      eps_abs=0.0, eps_rel=0.0)

    def run_on(n_dev):
        mesh = make_mesh(n_dev)
        B = args.batch_per_device * n_dev
        theta = jnp.asarray(np.tile(T8, (B // 8 + 1, 1))[:B],
                            dtype=dtype or jnp.float64)
        theta = jax.device_put(theta, NamedSharding(mesh, P('batch', None)))

        @jax.jit
        def step(jf, theta):
            d = canon_batch(jf, theta)
            l, u = qp_bounds_batch(jf, d['b'])
            res = admm_solve(d['P'], d['q'], d['A'], l, u, jf.n_zero, st)
            return res['obj'].sum()

        s = step(jf, theta)
        _ = float(np.asarray(s))
        t0 = time.perf_counter()
        reps = 2
        for _ in range(reps):
            s = step(jf, theta)
            _ = float(np.asarray(s))
        dt = (time.perf_counter() - t0) / reps
        return B * args.iters / dt  # instance-iterations per second

    n_total = len(jax.devices())
    r1 = run_on(1)
    rN = run_on(n_total)
    eff = rN / (n_total * r1)
    print(json.dumps({
        'metric': 'admm_instance_iters_per_s',
        'devices': n_total,
        'hosts': args.num_hosts,
        'single_device': round(r1, 1),
        'all_devices': round(rN, 1),
        'scaling_efficiency': round(eff, 4),
        'backend': jax.default_backend(),
    }))


if __name__ == '__main__':
    main()
