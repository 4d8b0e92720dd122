"""ADP control SOCP (parity: reference examples/ADP.ipynb /
tests/test_E2E_SOCP.py): thrust-limited control via the batched conic IPM,
with gradients through the solution map."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tests'))

# CT_CPU=1 forces the CPU backend
import jax as _jax
if os.environ.get('CT_CPU') == '1':
    _jax.config.update('jax_platforms', 'cpu')
    _jax.config.update('jax_enable_x64', True)

import jax
import jax.numpy as jnp
import numpy as np

from problems import ADP_problem, assign_ADP
from cvxpygen_tpu.autodiff.conic_diff import make_conic_diff_solve
from cvxpygen_tpu.canon.canonicalizer import canonicalize
from cvxpygen_tpu.runtime.solver import CompiledConicSolver

if __name__ == '__main__':
    prob = ADP_problem()
    assign_ADP(prob, seed=0)
    val = prob.solve()
    u = prob.var_dict['u'].value
    print(f'oracle: objective {val:.4f}, row norms '
          f'{np.linalg.norm(u, axis=1).round(4)} (limit 0.1)')

    fam = canonicalize(prob)
    solver = CompiledConicSolver(fam)
    thetas = [fam.pack_theta(params=assign_ADP(prob, seed=s).parameters())
              for s in range(16)]
    out = solver.solve_batch(np.stack(thetas))
    print(f'batched IPM over 16 states: all solved = '
          f'{bool(np.asarray(out["solved"]).all())}, '
          f'mean iters = {float(np.asarray(out["iters"]).mean()):.1f}')

    # gradient of the optimal cost w.r.t. the state-dependent parameter f
    from cvxpygen_tpu.runtime.jax_family import JaxFamily
    jf = JaxFamily.from_family(fam)
    dsolve = make_conic_diff_solve(jf)
    g = jax.grad(lambda th: dsolve(th[None, :])['obj'][0])(
        jnp.asarray(thetas[0]))
    gd = fam.unpack_theta_grad(np.asarray(g))
    print('d cost*/d f =', np.round(gd['f'], 4))
