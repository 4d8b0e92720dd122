"""PSD-cone problems end-to-end: modeling -> svec lowering -> conic ADMM,
checked against closed forms (eigendecompositions).

Parity: the reference supports the PSD triangle cone through Clarabel
(cvxpygen/solvers/clarabel.py:148-154).
"""
import numpy as np
import pytest

import cvxpygen_tpu as ct
from cvxpygen_tpu.canon.canonicalizer import canonicalize
from cvxpygen_tpu.runtime.solver import make_compiled_solver


def _sym(rng, s):
    A = rng.normal(size=(s, s))
    return 0.5 * (A + A.T)


def test_lambda_max_analytic():
    """min x s.t. x I >> A  ->  x = lambda_max(A)."""
    s = 4
    rng = np.random.default_rng(0)
    Aval = _sym(rng, s)
    x = ct.Variable(name='x')
    A = ct.Parameter((s, s), name='A')
    eye = np.eye(s)
    prob = ct.Problem(ct.Minimize(x), [ct.multiply(x, eye) >> A])
    A.value = Aval
    ref = float(np.linalg.eigvalsh(Aval).max())
    obj = prob.solve()
    assert abs(obj - ref) < 1e-5 * max(1, abs(ref))
    # compiled conic ADMM path
    fam = canonicalize(prob)
    solv = make_compiled_solver(fam, 'CLARABEL')
    # CLARABEL alias -> IPM engine, which covers PSD cones natively
    assert type(solv).__name__ == 'CompiledConicSolver'
    solv.solve_into_problem(prob)
    assert abs(prob.value - ref) < 5e-3 * max(1, abs(ref))


def test_lambda_max_atom():
    """min lambda_max(A) via the atom (epigraph lowering)."""
    s = 3
    rng = np.random.default_rng(1)
    Aval = _sym(rng, s)
    x = ct.Variable(name='slack')
    A = ct.Parameter((s, s), name='A')
    prob = ct.Problem(ct.Minimize(ct.lambda_max(A + ct.multiply(x, np.eye(s)))
                                  + 0.0 * ct.square(x)), [x == 0.0])
    A.value = Aval
    ref = float(np.linalg.eigvalsh(Aval).max())
    obj = prob.solve()
    assert abs(obj - ref) < 1e-5 * max(1, abs(ref))


def test_lambda_min_analytic():
    """max lambda_min(A + x I) s.t. x <= p  ->  lambda_min(A) + p."""
    s = 3
    rng = np.random.default_rng(2)
    Aval = _sym(rng, s)
    x = ct.Variable(name='x')
    A = ct.Parameter((s, s), name='A')
    p = ct.Parameter(name='p')
    prob = ct.Problem(ct.Maximize(ct.lambda_min(A + ct.multiply(x, np.eye(s)))),
                      [x <= p])
    A.value = Aval
    p.value = 0.3
    ref = float(np.linalg.eigvalsh(Aval).min()) + 0.3
    obj = prob.solve()
    assert abs(obj - ref) < 1e-5 * max(1, abs(ref))


def test_psd_variable_projection():
    """min ||X - A||_F^2 over PSD X  ->  X = PSD projection of A."""
    s = 4
    rng = np.random.default_rng(3)
    Aval = _sym(rng, s)
    X = ct.Variable((s, s), name='X', PSD=True)
    A = ct.Parameter((s, s), name='A')
    prob = ct.Problem(ct.Minimize(ct.sum_squares(X - A)))
    A.value = Aval
    prob.solve()
    lam, Q = np.linalg.eigh(Aval)
    Xref = (Q * np.maximum(lam, 0.0)) @ Q.T
    assert np.allclose(X.value, Xref, atol=1e-4), (X.value, Xref)
    # compiled path
    fam = canonicalize(prob)
    solv = make_compiled_solver(fam, 'SCS')
    solv.solve_into_problem(prob)
    assert np.allclose(X.value, Xref, atol=5e-3)


def test_psd_constraint_dual_matrix():
    """Dual of X >> A at the optimum of min tr(X) s.t. X >> A (A PSD-part
    active): dual is PSD and complementary."""
    s = 3
    rng = np.random.default_rng(4)
    Aval = _sym(rng, s)
    X = ct.Variable((s, s), name='X', PSD=True)
    A = ct.Parameter((s, s), name='A')
    con = X >> A
    prob = ct.Problem(ct.Minimize(ct.trace(X)), [con])
    A.value = Aval
    obj = prob.solve()
    # optimum: X = A_+ (positive part), obj = sum of positive eigenvalues
    lam = np.linalg.eigvalsh(Aval)
    ref = float(np.maximum(lam, 0).sum())
    assert abs(obj - ref) < 1e-4 * max(1, abs(ref))
    Y = np.asarray(con.dual_value)
    assert Y.shape == (s, s)
    lamY = np.linalg.eigvalsh(0.5 * (Y + Y.T))
    assert lamY.min() > -1e-5


def test_nsd_variable():
    """min ||X - A||_F^2 over NSD X  ->  negative-part projection."""
    s = 3
    rng = np.random.default_rng(5)
    Aval = _sym(rng, s)
    X = ct.Variable((s, s), name='X', NSD=True)
    A = ct.Parameter((s, s), name='A')
    prob = ct.Problem(ct.Minimize(ct.sum_squares(X - A)))
    A.value = Aval
    prob.solve()
    lam, Q = np.linalg.eigh(Aval)
    Xref = (Q * np.minimum(lam, 0.0)) @ Q.T
    assert np.allclose(X.value, Xref, atol=1e-4)


def test_psd_rejects_nonsquare():
    X = ct.Variable((2, 3), name='X')
    with pytest.raises(ValueError):
        X >> 0


def test_log_det_analytic():
    """max log_det(X) s.t. trace(X) == p, X PSD  ->  X = (p/s) I."""
    s = 3
    X = ct.Variable((s, s), name='X', PSD=True)
    p = ct.Parameter(name='p')
    prob = ct.Problem(ct.Maximize(ct.log_det(X)), [ct.trace(X) == p])
    p.value = 6.0
    obj = prob.solve()
    ref = s * np.log(6.0 / s)
    assert abs(obj - ref) < 1e-3 * max(1, abs(ref))
    assert np.allclose(X.value, 2.0 * np.eye(s), atol=5e-3)


def test_log_det_parametrized_offset():
    """max log_det(X + A) s.t. trace(X) == p with A = a I: the shift adds
    to each eigenvalue -> X + A = ((p + s a)/s) I at the optimum."""
    s = 3
    X = ct.Variable((s, s), name='X', symmetric=True)
    A = ct.Parameter((s, s), name='A')
    p = ct.Parameter(name='p')
    prob = ct.Problem(ct.Maximize(ct.log_det(X + A)), [ct.trace(X) == p])
    a = 0.5
    A.value = a * np.eye(s)
    p.value = 3.0
    obj = prob.solve()
    ref = s * np.log((3.0 + s * a) / s)
    assert abs(obj - ref) < 1e-3 * max(1, abs(ref))
