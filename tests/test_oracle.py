"""Oracle IPM correctness: independent cross-checks.

The oracle plays the role of the stock solvers in the reference's test
harness (tests/utils_test.py), so it must itself be validated against
independent references: scipy.linprog (HiGHS) for LPs, scipy SLSQP for
small QPs, KKT residuals and analytic solutions for SOCPs.
"""
import numpy as np
import pytest
import scipy.optimize as sopt

import cvxpygen_tpu as ct
from cvxpygen_tpu.solvers.oracle import (
    ConeDims, NTScaling, cone_e, jordan_div, jordan_prod, solve_conic_qp)
from problems import ALL


def test_nt_scaling_identity():
    rng = np.random.default_rng(0)
    dims = ConeDims(4, [3, 5])
    # random interior points
    s = np.abs(rng.standard_normal(dims.total)) + 0.5
    z = np.abs(rng.standard_normal(dims.total)) + 0.5
    off = dims.nonneg
    for d in dims.socs:
        s[off] = np.linalg.norm(s[off + 1:off + d]) + 1.0
        z[off] = np.linalg.norm(z[off + 1:off + d]) + 1.0
        off += d
    W = NTScaling(s, z, dims)
    lam1 = W.mul(z)
    lam2 = W.mul(s, inv=True)
    np.testing.assert_allclose(lam1, lam2, rtol=1e-10)
    # W^{-1} W = I
    v = rng.standard_normal(dims.total)
    np.testing.assert_allclose(W.mul(W.mul(v), inv=True), v, rtol=1e-10)
    # wtw consistency
    np.testing.assert_allclose(W.wtw() @ v, W.mul(W.mul(v)), rtol=1e-10)
    # jordan division inverse
    u = jordan_div(lam1, jordan_prod(lam1, v, dims), dims)
    np.testing.assert_allclose(u, v, rtol=1e-8)


def test_lp_vs_linprog():
    rng = np.random.default_rng(1)
    n, m = 20, 8
    c = rng.standard_normal(n)
    G = rng.standard_normal((m, n))
    h = G @ rng.random(n) + 1.0  # feasible
    lb, ub = np.zeros(n), np.ones(n)
    ref = sopt.linprog(c, A_ub=G, b_ub=h, bounds=list(zip(lb, ub)),
                       method='highs')
    assert ref.status == 0
    # our form: min c'x st  h - Gx >= 0, x >= 0, 1 - x >= 0
    Gc = np.vstack([-G, np.eye(n), -np.eye(n)])
    hc = np.concatenate([h, np.zeros(n), np.ones(n)])
    dims = ConeDims(Gc.shape[0], [])
    res = solve_conic_qp(np.zeros((n, n)), c, None, None, Gc, hc, dims)
    assert res.status == 'optimal'
    np.testing.assert_allclose(res.obj, ref.fun, rtol=1e-6, atol=1e-8)


def test_qp_vs_slsqp():
    rng = np.random.default_rng(2)
    n, m = 8, 5
    F = rng.standard_normal((m, n))
    P = F.T @ F + 0.1 * np.eye(n)
    q = rng.standard_normal(n)
    G = np.vstack([np.eye(n)])
    h = np.zeros(n)  # x >= 0
    dims = ConeDims(n, [])
    res = solve_conic_qp(P, q, None, None, G, h, dims)
    assert res.status == 'optimal'

    ref = sopt.minimize(lambda x: 0.5 * x @ P @ x + q @ x,
                        np.ones(n), jac=lambda x: P @ x + q,
                        bounds=[(0, None)] * n, method='L-BFGS-B',
                        options={'ftol': 1e-14, 'gtol': 1e-12})
    np.testing.assert_allclose(res.obj, ref.fun, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(res.x, ref.x, atol=1e-5)


def test_eq_qp_analytic():
    # min 0.5 x'x  s.t. sum(x) = 1  ->  x = 1/n
    n = 6
    E = np.ones((1, n))
    f = np.array([-1.0])
    dims = ConeDims(0, [])
    res = solve_conic_qp(np.eye(n), np.zeros(n), E, f,
                         np.zeros((0, n)), np.zeros(0), dims)
    np.testing.assert_allclose(res.x, np.ones(n) / n, atol=1e-9)


def test_socp_analytic():
    # min c'x st ||x|| <= 1  -> x = -c/||c||
    rng = np.random.default_rng(3)
    n = 5
    c = rng.standard_normal(n)
    # cone rows: aff = [1; x] in SOC  ->  G x + h = s with
    # G = [[0...];[I]], h = [1; 0...]
    G = np.vstack([np.zeros(n), np.eye(n)])
    h = np.concatenate([[1.0], np.zeros(n)])
    dims = ConeDims(0, [n + 1])
    res = solve_conic_qp(np.zeros((n, n)), c, None, None, G, h, dims)
    assert res.status == 'optimal'
    np.testing.assert_allclose(res.x, -c / np.linalg.norm(c), atol=1e-7)
    np.testing.assert_allclose(res.obj, -np.linalg.norm(c), rtol=1e-8)


@pytest.mark.parametrize('name', list(ALL))
def test_solve_families_kkt(name):
    """End-to-end: problem.solve() runs the oracle; check status + KKT
    stationarity + feasibility via constraint violations."""
    make, assign = ALL[name]
    prob = make()
    assign(prob)
    val = prob.solve()
    assert prob.status in ('optimal', 'optimal_inaccurate')
    assert np.isfinite(val)
    for con in prob.constraints:
        viol = con.violation()
        assert np.max(np.atleast_1d(viol)) < 1e-5, f'{con!r} violated'
    # objective value from expression tree must match reported value
    ov = prob.objective.value
    np.testing.assert_allclose(ov, val, rtol=1e-6, atol=1e-6)
