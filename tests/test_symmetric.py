"""Symmetric matrix variables (reference upper-tri expansion parity)."""
import numpy as np

import cvxpygen_tpu as ct
from cvxpygen_tpu.canon.canonicalizer import canonicalize


def test_symmetric_variable_solve():
    """min ||X - M(theta)||_F^2 over symmetric X  ->  X* = sym(M)."""
    n = 3
    X = ct.Variable((n, n), name='X', symmetric=True)
    M = ct.Parameter((n, n), name='M')
    prob = ct.Problem(ct.Minimize(ct.sum_squares(X - M)),
                      [ct.sum(X) <= 100])
    rng = np.random.default_rng(0)
    Mv = rng.standard_normal((n, n))
    M.value = Mv
    fam = canonicalize(prob)
    xvi = [v for v in fam.var_info if v.name == 'X'][0]
    assert xvi.size == n * (n + 1) // 2  # free entries only

    prob.solve()
    Xv = X.value
    np.testing.assert_allclose(Xv, Xv.T, atol=1e-9)  # symmetric by layout
    np.testing.assert_allclose(Xv, 0.5 * (Mv + Mv.T), atol=1e-6)


def test_symmetric_in_constraints():
    n = 2
    X = ct.Variable((n, n), name='X', symmetric=True)
    c = ct.Parameter(name='c', nonneg=True)
    c.value = 1.0
    prob = ct.Problem(ct.Minimize(ct.sum_squares(X)),
                      [ct.trace(X) == c, X[0, 1] >= 0.1])
    prob.solve()
    Xv = X.value
    np.testing.assert_allclose(Xv[0, 1], Xv[1, 0], atol=1e-9)
    np.testing.assert_allclose(np.trace(Xv), 1.0, atol=1e-6)
