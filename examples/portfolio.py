"""Portfolio optimization family (parity: reference examples/portfolio.ipynb
/ tests/test_E2E_QP.py:76-110): maximize risk-adjusted return with
transaction and shorting costs, batched over market scenarios."""
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

import numpy as np

from problems import portfolio_problem, assign_portfolio
from cvxpygen_tpu.canon.canonicalizer import canonicalize
from cvxpygen_tpu.runtime.solver import CompiledQPSolver

if __name__ == '__main__':
    prob = portfolio_problem()
    assign_portfolio(prob, seed=0)
    val = prob.solve()
    w = prob.var_dict['w'].value
    print(f'oracle: objective {val:.4f}, sum(w) = {w.sum():.4f}, '
          f'||w||_1 = {np.abs(w).sum():.4f} (L = 1.6)')

    fam = canonicalize(prob)
    solver = CompiledQPSolver(fam)
    thetas = []
    for seed in range(32):
        assign_portfolio(prob, seed=seed)
        thetas.append(fam.pack_theta(params=prob.parameters()))
    out = solver.solve_batch(np.stack(thetas))
    objs = -np.asarray(out['obj'] + out['d'])  # maximization sign
    print(f'batch of 32 market scenarios: objectives in '
          f'[{objs.min():.3f}, {objs.max():.3f}], '
          f'all solved: {bool(np.asarray(out["solved"]).all())}')
