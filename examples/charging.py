"""Battery charging QP (parity: reference examples/charging.ipynb).

The reference uses T = 1440 (24h at minute resolution).  Long horizons
route automatically to the block-banded ADMM solver
(solvers/admm_banded.py): the KKT matrix is block-tridiagonal after an
RCM permutation, so no dense (n x n) tensors are materialized and T=1440
(n = 2881) solves directly.  Default T=1440; set CHARGING_T to change.
"""
import os
import sys

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
    T = int(os.environ.get('CHARGING_T', '1440'))

    u = ct.Variable(T, name='u')
    q = ct.Variable(T + 1, name='q')

    p = ct.Parameter(T, nonneg=True, name='p')
    s = ct.Parameter(T, nonneg=True, name='s')
    D = ct.Parameter(nonneg=True, name='D')
    C = ct.Parameter(nonneg=True, name='C')
    Q = ct.Parameter(nonneg=True, name='Q')
    gamma = ct.Parameter(nonneg=True, name='gamma')

    objective = ct.Minimize(p @ u + s @ ct.abs(u) + gamma * ct.sum_squares(u))
    constraints = [q[1:] == q[:-1] + u,
                   -D <= u, u <= C,
                   ct.Constant(0) <= q, q <= Q,
                   q[0] == 0, q[T] == Q]
    problem = ct.Problem(objective, constraints)

    scale = T / 1440
    p.value = np.concatenate((3 * np.ones(int(3 * T / 24)),
                              5 * np.ones(int(7 * T / 24)),
                              1 * np.ones(T - int(3 * T / 24)
                                          - int(7 * T / 24))))
    s.value = 0.1 * p.value
    Q.value = 1.0
    C.value = 3 * Q.value / T
    D.value = 2 * C.value
    gamma.value = 100.0

    cpg.generate_code(problem, code_dir='charging_code', solver='OSQP')
    val = problem.solve(method='CPG', max_iter=20000)
    qv = problem.var_dict['q'].value
    print(f'objective = {val:.4f}; final SOC = {qv[-1]:.4f} '
          f'(target {Q.value}); max |u| = {np.abs(problem.var_dict["u"].value).max():.5f}')
