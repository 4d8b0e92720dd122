"""Infeasibility / unboundedness certificates (OSQP section 3.4 parity;
reference surfaces these as CPG_Info status + inf objective,
utils.py:213-228, 977-985)."""
import numpy as np

import cvxpygen_tpu as ct
from cvxpygen_tpu import cpg
from cvxpygen_tpu.canon.canonicalizer import canonicalize
from cvxpygen_tpu.runtime.solver import CompiledQPSolver


def test_primal_infeasible(tmp_path):
    x = ct.Variable(2, name='x')
    b = ct.Parameter(name='b')
    b.value = 1.0
    # x0 >= b and x0 <= b - 1 : infeasible for any b
    prob = ct.Problem(ct.Minimize(ct.sum_squares(x)),
                      [x[0] >= b, x[0] <= b - 1])
    cpg.generate_code(prob, code_dir=str(tmp_path / 'inf'), solver='OSQP')
    val = prob.solve(method='CPG')
    assert prob.status == 'infeasible'
    assert val == np.inf


def test_dual_infeasible_unbounded(tmp_path):
    x = ct.Variable(2, name='x')
    c = ct.Parameter(2, name='c')
    c.value = np.array([1.0, 1.0])
    # min c'x  s.t. x <= 0  : unbounded below (drive x -> -inf)
    prob = ct.Problem(ct.Minimize(c @ x), [x <= 0])
    cpg.generate_code(prob, code_dir=str(tmp_path / 'unb'), solver='OSQP')
    val = prob.solve(method='CPG')
    assert prob.status == 'unbounded'
    assert val == -np.inf


def test_feasible_not_flagged():
    """certificates must not fire on well-posed problems."""
    from problems import ALL
    make, assign = ALL['MPC']
    prob = make()
    assign(prob, seed=0)
    fam = canonicalize(prob)
    solver = CompiledQPSolver(fam)
    theta = fam.pack_theta(params=prob.parameters())
    out = solver.solve_batch(theta[None, :])
    assert int(np.asarray(out['status'])[0]) == 1
