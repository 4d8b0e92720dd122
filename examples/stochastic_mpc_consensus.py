"""Stochastic MPC via scenario-consensus ADMM (parallel/consensus.py).

Two-stage stochastic MPC: B scenarios of the reference's flagship MPC
family (reference examples/MPC.ipynb dynamics) drawn from an uncertain
state estimate, coupled through a SHARED first control move u_0
(non-anticipativity).  Consensus ADMM solves the coupled program with:

- the shared-KKT batched ADMM as the per-scenario prox engine (one
  factorization for the whole solve -- the consensus penalty is a
  constant diagonal P shift),
- ONE cross-scenario collective per outer iteration (the consensus mean;
  an ICI all-reduce when the scenario batch is sharded over a mesh).

Run on CPU or TPU:  python examples/stochastic_mpc_consensus.py
Shard over all local devices with:  CONSENSUS_MESH=1
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', 'tests'))

import numpy as np

from cvxpygen_tpu.canon.canonicalizer import canonicalize
from cvxpygen_tpu.parallel.consensus import consensus_solve


def main():
    from problems import MPC_problem, assign_MPC
    import jax

    prob = assign_MPC(MPC_problem())
    fam = canonicalize(prob)

    B = int(os.environ.get('CONSENSUS_B', '64'))
    rng = np.random.default_rng(0)
    base = fam.pack_theta(params=prob.parameters())
    xi = [pi for pi in fam.param_info if pi.name == 'x_init'][0]
    thetas = np.tile(base, (B, 1))
    # scenarios: uncertain state estimate (mean from the family values)
    x_hat = base[xi.offset:xi.offset + xi.flat_size]
    thetas[:, xi.offset:xi.offset + xi.flat_size] = \
        x_hat + 0.3 * rng.standard_normal((B, xi.flat_size))

    mesh = None
    if os.environ.get('CONSENSUS_MESH'):
        from cvxpygen_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()
        print(f'sharding {B} scenarios over {mesh.devices.size} devices')

    # first control move u_0 = U[:, 0] (Fortran layout: local 0..m-1)
    out = consensus_solve(fam, thetas, [('U', np.arange(3))],
                          rho_c=5.0, outer_iters=100, eps_consensus=1e-5,
                          mesh=mesh)
    u0 = np.asarray(out['z_consensus'])
    print(f'consensus first control u0 = {np.round(u0, 4)}')
    print(f'outer iterations: {int(out["outer_iters"])}, '
          f'consensus residual {float(out["consensus_residual"]):.2e} '
          f'(dual {float(out["consensus_dual_residual"]):.2e})')
    print(f'sample-average objective: '
          f'{float(np.mean(np.asarray(out["obj"]))):.6f}')


if __name__ == '__main__':
    main()
