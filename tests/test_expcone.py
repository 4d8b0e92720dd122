"""Exponential-cone problems end-to-end: modeling -> lowering -> conic ADMM
engine, checked against closed-form solutions and the float64 oracle.

Parity: the reference supports exp cones through Clarabel
(cvxpygen/solvers/clarabel.py:139); here every conic solver alias routes
exp-cone families to the conic ADMM engine.
"""
import numpy as np
import pytest

import cvxpygen_tpu as ct
from cvxpygen_tpu.canon.canonicalizer import canonicalize
from cvxpygen_tpu.runtime.solver import make_compiled_solver


def _compiled_obj(prob, solver='SCS'):
    fam = canonicalize(prob)
    s = make_compiled_solver(fam, solver)
    assert type(s).__name__ == 'CompiledConicADMMSolver'
    s.solve_into_problem(prob)
    return prob.value


def test_exp_atom_analytic():
    """min sum(exp(x)) s.t. sum(x) == p  ->  x_i = p/n, obj = n e^{p/n}."""
    n = 4
    x = ct.Variable(n, name='x')
    p = ct.Parameter(name='p')
    prob = ct.Problem(ct.Minimize(ct.sum(ct.exp(x))), [ct.sum(x) == p])
    p.value = 2.0
    ref = n * np.exp(2.0 / n)
    # oracle path
    obj = prob.solve()
    assert abs(obj - ref) < 1e-5 * ref
    assert np.allclose(x.value, 0.5, atol=1e-5)
    # compiled conic ADMM path
    obj2 = _compiled_obj(prob)
    assert abs(obj2 - ref) < 5e-3 * ref


def test_log_atom_analytic():
    """max sum(log(x)) s.t. sum(x) == p  ->  x_i = p/n, obj = n log(p/n)."""
    n = 3
    x = ct.Variable(n, name='x')
    p = ct.Parameter(name='p')
    prob = ct.Problem(ct.Maximize(ct.sum(ct.log(x))), [ct.sum(x) == p])
    p.value = 6.0
    ref = n * np.log(6.0 / n)
    obj = prob.solve()
    assert abs(obj - ref) < 1e-5 * max(1, abs(ref))
    assert np.allclose(x.value, 2.0, atol=1e-4)
    obj2 = _compiled_obj(prob)
    assert abs(obj2 - ref) < 5e-3 * max(1, abs(ref))


def test_entr_softmax_analytic():
    """max c'x + sum(entr(x)) s.t. sum(x) == 1  ->  x = softmax(c)."""
    n = 4
    rng = np.random.default_rng(0)
    cval = rng.normal(size=n)
    x = ct.Variable(n, name='x')
    c = ct.Parameter(n, name='c')
    prob = ct.Problem(ct.Maximize(c @ x + ct.sum(ct.entr(x))),
                      [ct.sum(x) == 1.0])
    c.value = cval
    sm = np.exp(cval) / np.exp(cval).sum()
    ref = float(cval @ sm - np.sum(sm * np.log(sm)))
    obj = prob.solve()
    assert abs(obj - ref) < 1e-5 * max(1, abs(ref))
    assert np.allclose(x.value, sm, atol=1e-4)
    obj2 = _compiled_obj(prob)
    assert abs(obj2 - ref) < 5e-3 * max(1, abs(ref))
    assert np.allclose(x.value, sm, atol=5e-3)


def test_log_sum_exp_analytic():
    """min lse(x) s.t. x >= p elementwise  ->  x = p."""
    n = 3
    rng = np.random.default_rng(1)
    pv = rng.normal(size=n)
    x = ct.Variable(n, name='x')
    p = ct.Parameter(n, name='p')
    prob = ct.Problem(ct.Minimize(ct.log_sum_exp(x)), [x >= p])
    p.value = pv
    ref = float(np.log(np.sum(np.exp(pv))))
    obj = prob.solve()
    assert abs(obj - ref) < 1e-5 * max(1, abs(ref))
    obj2 = _compiled_obj(prob)
    assert abs(obj2 - ref) < 5e-3 * max(1, abs(ref))


def test_kl_div_projection():
    """min sum(kl_div(x, c)) s.t. sum(x) == 1  ->  x = c / sum(c)."""
    n = 4
    rng = np.random.default_rng(2)
    cval = rng.uniform(0.5, 2.0, size=n)
    x = ct.Variable(n, name='x')
    c = ct.Parameter(n, name='c')
    prob = ct.Problem(ct.Minimize(ct.sum(ct.kl_div(x, c))),
                      [ct.sum(x) == 1.0])
    c.value = cval
    prob.solve()
    xs = cval / cval.sum()
    assert np.allclose(x.value, xs, atol=1e-4), (x.value, xs)


def test_logistic_atom():
    """min logistic(x) + 0.5 (x - p)^2 : compare against scipy-style
    1-d numeric minimum."""
    x = ct.Variable(name='x')
    p = ct.Parameter(name='p')
    prob = ct.Problem(ct.Minimize(ct.logistic(x)
                                  + 0.5 * ct.sum_squares(x - p)))
    p.value = 2.0
    obj = prob.solve()
    ts = np.linspace(-3, 5, 400001)
    fref = np.logaddexp(0, ts) + 0.5 * (ts - 2.0) ** 2
    ref = fref.min()
    assert abs(obj - ref) < 1e-5 * max(1, abs(ref))


def test_expcone_constraint_direct_and_duals():
    """Direct ExpCone constraint + dual retrieval shape; also the dual must
    lie in the dual cone."""
    x = ct.Variable(name='x')
    z = ct.Variable(name='z')
    p = ct.Parameter(name='p')
    # min z s.t. (x, 1, z) in Kexp, x >= p  -> z = e^p
    con = ct.ExpCone(x, ct.Constant(1.0), z)
    prob = ct.Problem(ct.Minimize(z), [con, x >= p])
    p.value = 0.7
    obj = prob.solve()
    assert abs(obj - np.exp(0.7)) < 1e-5 * np.exp(0.7)
    dv = con.dual_value
    assert isinstance(dv, list) and len(dv) == 3
    u, v, w = (float(np.asarray(d)) for d in dv)
    # dual cone: u <= 0, -u log(-u/w) + u - v <= 0 (w > 0)
    assert u <= 1e-6
    assert w >= -1e-6


def test_exp_problem_batched_consistency():
    """Batched compiled solve == per-instance solves for an exp family."""
    import jax.numpy as jnp
    x = ct.Variable(3, name='x')
    p = ct.Parameter(3, name='p')
    prob = ct.Problem(ct.Minimize(ct.sum(ct.exp(x - p)) + ct.sum_squares(x)))
    fam = canonicalize(prob)
    rng = np.random.default_rng(3)
    thetas = rng.normal(size=(4, 3))
    s = make_compiled_solver(fam, 'SCS')
    out_b = s.solve_batch(jnp.asarray(thetas))
    for i in range(4):
        out_1 = s.solve_batch(jnp.asarray(thetas[i:i + 1]))
        assert np.allclose(np.asarray(out_b['x'])[i],
                           np.asarray(out_1['x'])[0], atol=5e-5)


def test_exp_curvature_rejections():
    x = ct.Variable(2, name='x')
    p = ct.Parameter(2, name='p')
    # log of convex expression: not DCP
    with pytest.raises(ValueError):
        ct.Problem(ct.Minimize(ct.sum(ct.log(ct.square(x)))),
                   [x >= p]).solve()
    # exp inside objective of concave arg: not DCP
    with pytest.raises(ValueError):
        ct.Problem(ct.Minimize(ct.sum(ct.exp(ct.log(x)))), [x >= p]).solve()
