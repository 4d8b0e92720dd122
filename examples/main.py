"""nonneg_LS example (parity: reference examples/main.py:15-29).

Generate a solver package for a 3x2 nonnegative least-squares family with a
sparse parameter matrix, then solve via the stock oracle and via the
compiled method='CPG' path and compare.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# CT_CPU=1 forces the CPU backend (useful when no TPU is attached)
import jax as _jax
if os.environ.get('CT_CPU') == '1':
    _jax.config.update('jax_platforms', 'cpu')
    _jax.config.update('jax_enable_x64', True)

import numpy as np

import cvxpygen_tpu as ct
from cvxpygen_tpu import cpg

if __name__ == '__main__':
    m, n = 3, 2
    x = ct.Variable(n, name='x')
    A = ct.Parameter((m, n), name='A', sparsity=((0, 0, 1), (0, 1, 1)))
    b = ct.Parameter(m, name='b')
    problem = ct.Problem(ct.Minimize(ct.sum_squares(A @ x - b)), [x >= 0])

    np.random.seed(1)
    val = np.zeros((m, n))
    val[(0, 0, 1), (0, 1, 1)] = np.random.randn(3)
    A.value = val
    b.value = np.random.randn(m)
    problem.solve()

    cpg.generate_code(problem, code_dir='nonneg_LS', solver='OSQP')

    t0 = time.time()
    val = problem.solve()
    t1 = time.time()
    print('\nOracle\nSolve time: %.3f ms' % (1000 * (t1 - t0)))
    print('Primal solution: x = [%.6f, %.6f]' % tuple(x.value))
    print('Dual solution: d0 = [%.6f, %.6f]'
          % tuple(problem.constraints[0].dual_value))
    print('Objective function value: %.6f' % val)

    t0 = time.time()
    val = problem.solve(method='CPG', updated_params=['A', 'b'])
    t1 = time.time()
    print('\nCVXPYgen-TPU\nSolve time: %.3f ms' % (1000 * (t1 - t0)))
    print('Primal solution: x = [%.6f, %.6f]' % tuple(x.value))
    print('Dual solution: d0 = [%.6f, %.6f]'
          % tuple(problem.constraints[0].dual_value))
    print('Objective function value: %.6f' % val)
