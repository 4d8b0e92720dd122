"""Error-path tests (parity: reference tests/test_invalid_input.py and
test_unsupported_solvers.py)."""
import numpy as np
import pytest

import cvxpygen_tpu as ct
from cvxpygen_tpu import cpg
from cvxpygen_tpu.canon.paraff import DPPError


def test_parameter_free_problem_rejected(tmp_path):
    # reference canonicalizer.py:98-99
    x = ct.Variable(2, name='x')
    prob = ct.Problem(ct.Minimize(ct.sum_squares(x)), [x >= 0])
    with pytest.raises(ValueError, match='no parameters'):
        cpg.generate_code(prob, code_dir=str(tmp_path / 'p'))


def test_unknown_solver_rejected(tmp_path):
    x = ct.Variable(2, name='x')
    c = ct.Parameter(2, name='c')
    c.value = np.ones(2)
    prob = ct.Problem(ct.Minimize(c @ x), [x >= 0, x <= 1])
    with pytest.raises(ValueError, match='unsupported solver'):
        cpg.generate_code(prob, code_dir=str(tmp_path / 'p'), solver='GUROBI')


def test_non_dpp_product_rejected():
    x = ct.Variable(2, name='x')
    a = ct.Parameter(2, name='a')
    b = ct.Parameter(name='b')
    a.value, b.value = np.ones(2), 2.0
    prob = ct.Problem(ct.Minimize((b * a) @ x), [x >= 0, x <= 1])
    with pytest.raises(DPPError):
        prob.solve()


def test_non_dcp_rejected():
    x = ct.Variable(2, name='x')
    g = ct.Parameter(name='g')
    g.value = 1.0
    prob = ct.Problem(ct.Maximize(ct.sum_squares(x) + g), [x <= 1])
    with pytest.raises(ValueError, match='not DCP'):
        prob.solve()


def test_soc_family_via_qp_solver_rejected(tmp_path):
    u = ct.Variable(3, name='u')
    f = ct.Parameter(3, name='f')
    f.value = np.ones(3)
    prob = ct.Problem(ct.Minimize(ct.sum_squares(u - f)),
                      [ct.norm(u, 2) <= 1])
    with pytest.raises(ValueError, match='SOC'):
        cpg.generate_code(prob, code_dir=str(tmp_path / 'p'), solver='OSQP')


def test_gradient_on_conic_supported(tmp_path):
    """conic gradient=True is supported directly (the reference needs the
    two-stage OSQP-form construction for this)."""
    u = ct.Variable(3, name='u')
    f = ct.Parameter(3, name='f')
    f.value = np.ones(3)
    prob = ct.Problem(ct.Minimize(ct.sum_squares(u - f)),
                      [ct.norm(u, 2) <= 1])
    mod = cpg.generate_code(prob, code_dir=str(tmp_path / 'p'),
                            solver='ECOS', gradient=True)
    prob.solve(method='CPG')
    u.gradient = np.ones(3)
    grads = mod.cpg_gradient(prob)
    # ||f|| > 1 so the ball constraint is active: u* = f/||f||; the
    # gradient of sum(u*) w.r.t. f is the projection Jacobian
    fn = np.linalg.norm(f.value)
    J = (np.eye(3) - np.outer(f.value, f.value) / fn ** 2) / fn
    np.testing.assert_allclose(grads['f'], J.T @ np.ones(3), atol=1e-6)
