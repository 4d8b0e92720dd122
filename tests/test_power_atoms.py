"""SOC-representable power-family atoms (sqrt, geo_mean, quad_over_lin,
inv_pos, power) vs closed forms, solved through the oracle and IPM engine."""
import numpy as np
import pytest

import cvxpygen_tpu as ct


def test_sqrt_analytic():
    """max sum(sqrt(x)) s.t. sum(x) == p  ->  x_i = p/n."""
    n = 4
    x = ct.Variable(n, name='x')
    p = ct.Parameter(name='p')
    prob = ct.Problem(ct.Maximize(ct.sum(ct.sqrt(x))), [ct.sum(x) == p])
    p.value = 4.0
    obj = prob.solve()
    ref = n * np.sqrt(4.0 / n)
    assert abs(obj - ref) < 1e-5 * ref
    assert np.allclose(x.value, 1.0, atol=1e-4)


def test_geo_mean_analytic():
    """max geo_mean(x, y) s.t. x + y == p  ->  x = y = p/2."""
    x = ct.Variable(name='x')
    y = ct.Variable(name='y')
    p = ct.Parameter(name='p')
    prob = ct.Problem(ct.Maximize(ct.geo_mean(x, y)), [x + y == p])
    p.value = 4.0
    obj = prob.solve()
    assert abs(obj - 2.0) < 1e-5
    assert abs(float(x.value) - 2.0) < 1e-4


def test_geo_mean_vector_form():
    v = ct.Variable(2, name='v')
    p = ct.Parameter(name='p')
    prob = ct.Problem(ct.Maximize(ct.geo_mean(v)), [ct.sum(v) == p])
    p.value = 2.0
    obj = prob.solve()
    assert abs(obj - 1.0) < 1e-5


def test_quad_over_lin_analytic():
    """min quad_over_lin(x - a, y) + y s.t. y <= b:
    for fixed y, optimal x = a giving min y s.t. ... -> x=a, y=b
    (decreasing in y up to b when x=a makes the quad term 0)."""
    n = 3
    x = ct.Variable(n, name='x')
    y = ct.Variable(name='y')
    a = ct.Parameter(n, name='a')
    prob = ct.Problem(ct.Minimize(ct.quad_over_lin(x - a, y) + y),
                      [y >= 0.25, y <= 2.0, x == 0.0])
    av = np.array([1.0, -1.0, 2.0])
    a.value = av
    # with x pinned to 0: minimize ||a||^2 / y + y over y in [0.25, 2]
    # -> y* = min(2, ||a||) = 2 (||a|| = sqrt(6) > 2)
    obj = prob.solve()
    ref = float(av @ av) / 2.0 + 2.0
    assert abs(obj - ref) < 1e-4 * ref


def test_inv_pos_analytic():
    """min inv_pos(x) + p*x  ->  x = 1/sqrt(p), obj = 2 sqrt(p)."""
    x = ct.Variable(name='x')
    p = ct.Parameter(name='p', nonneg=True)
    prob = ct.Problem(ct.Minimize(ct.inv_pos(x) + ct.multiply(p, x)))
    p.value = 4.0
    obj = prob.solve()
    assert abs(obj - 4.0) < 1e-4
    assert abs(float(x.value) - 0.5) < 1e-4


def test_power_dispatch():
    x = ct.Variable(name='x')
    p = ct.Parameter(name='p')
    assert type(ct.power(x, 2)).__name__ == 'Square'
    assert type(ct.power(x, 0.5)).__name__ == 'Sqrt'
    assert type(ct.power(x, -1)).__name__ == 'InvPos'
    assert type(ct.power(x, 0.3)).__name__ == 'Power'  # pow cone
    assert type(ct.power(x, 3.0)).__name__ == 'Power'
    with pytest.raises(ValueError):
        ct.power(x, 0)


def test_sqrt_batched_compiled():
    import jax.numpy as jnp
    from cvxpygen_tpu.canon.canonicalizer import canonicalize
    from cvxpygen_tpu.runtime.solver import make_compiled_solver
    x = ct.Variable(3, name='x')
    p = ct.Parameter(name='p')
    prob = ct.Problem(ct.Maximize(ct.sum(ct.sqrt(x))), [ct.sum(x) == p])
    p.value = 3.0
    fam = canonicalize(prob)
    s = make_compiled_solver(fam, 'ECOS')  # SOC-only family -> IPM engine
    out = s.solve_batch(jnp.asarray([[3.0], [6.0]]))
    obj = -np.asarray(out['obj'])  # maximization sign
    assert abs(obj[0] - 3 * np.sqrt(1.0)) < 1e-3
    assert abs(obj[1] - 3 * np.sqrt(2.0)) < 1e-3


def test_huber_analytic():
    """min sum(huber(x - a, M)): x free -> x = a, obj 0; with x pinned,
    obj = huber(a)."""
    n = 4
    av = np.array([0.3, -2.0, 0.9, 5.0])
    M = 1.0
    x = ct.Variable(n, name='x')
    a = ct.Parameter(n, name='a')
    prob = ct.Problem(ct.Minimize(ct.sum(ct.huber(x - a, M))), [x == 0.0])
    a.value = av
    obj = prob.solve()
    ref = float(np.sum(np.where(np.abs(av) <= M, av ** 2,
                                2 * M * np.abs(av) - M * M)))
    assert abs(obj - ref) < 1e-5 * max(1, ref)


def test_huber_scalar_and_weighting():
    x = ct.Variable(name='x')
    p = ct.Parameter(name='p')
    prob = ct.Problem(ct.Minimize(ct.huber(x, 2.0) + ct.multiply(p, x)))
    p.value = 1.0
    obj = prob.solve()
    # d/dx huber(x,2) = 2x on |x|<=2 -> 2x + 1 = 0 -> x=-0.5, obj = .25-.5
    assert abs(obj - (-0.25)) < 1e-5
    assert abs(float(x.value) + 0.5) < 1e-4
