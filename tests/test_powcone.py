"""3D power cone: projection optimality + general power atom end-to-end
(parity: the reference's Clarabel 'PowerConeT', clarabel.py:148-154)."""
import numpy as np
import pytest

import jax.numpy as jnp

import cvxpygen_tpu as ct
from cvxpygen_tpu.ops.cones import (ConeLayout, _proj_pow_np, project_cone,
                                    project_cone_np)


def _in_pow(x, a, tol=1e-7):
    r, s, t = x
    return (r >= -tol and s >= -tol
            and max(r, 0) ** a * max(s, 0) ** (1 - a) >= abs(t) - tol)


def _in_pow_dual(z, a, tol=1e-7):
    u, v, w = z
    return (u >= -tol and v >= -tol
            and (max(u, 0) / a) ** a * (max(v, 0) / (1 - a)) ** (1 - a)
            >= abs(w) - tol)


def test_pow_proj_optimality_numpy():
    rng = np.random.default_rng(0)
    for a in (0.3, 0.5, 0.75):
        for scale in (0.5, 1.0, 10.0):
            for _ in range(100):
                v = rng.normal(size=3) * scale
                x = _proj_pow_np(v, a)
                z = x - v
                nv = max(1.0, np.linalg.norm(v))
                assert _in_pow(x / nv, a, 1e-6), (a, v, x)
                # Moreau: x - v in K_a^* (self-dual up to the alpha scaling)
                assert _in_pow_dual(z / nv, a, 1e-5), (a, v, x, z)
                assert abs(np.dot(x, z)) <= 1e-5 * nv * nv, (a, v, x)


def test_pow_proj_jax_matches_numpy():
    rng = np.random.default_rng(1)
    a = 0.4
    V = rng.normal(size=(64, 3)) * rng.choice([0.3, 1, 5], size=(64, 1))
    layout = ConeLayout(pows=(a,))
    out = np.asarray(project_cone(jnp.asarray(V, jnp.float32), layout))
    ref = np.stack([_proj_pow_np(v, a) for v in V])
    scale = np.maximum(1.0, np.linalg.norm(V, axis=1, keepdims=True))
    assert np.max(np.abs(out - ref) / scale) < 1e-4


def test_power_atom_concave_analytic():
    """max sum(x^0.7) s.t. sum(x) == p  ->  x_i = p/n."""
    n = 3
    x = ct.Variable(n, name='x')
    p = ct.Parameter(name='p')
    prob = ct.Problem(ct.Maximize(ct.sum(ct.power(x, 0.7))),
                      [ct.sum(x) == p])
    p.value = 6.0
    obj = prob.solve()
    ref = n * (6.0 / n) ** 0.7
    assert abs(obj - ref) < 1e-4 * ref
    assert np.allclose(x.value, 2.0, atol=1e-3)


def test_power_atom_convex_analytic():
    """min sum(x^1.5) s.t. x >= a (a > 0)  ->  x = a."""
    av = np.array([0.5, 2.0, 1.2])
    x = ct.Variable(3, name='x')
    a = ct.Parameter(3, name='a')
    prob = ct.Problem(ct.Minimize(ct.sum(ct.power(x, 1.5))), [x >= a])
    a.value = av
    obj = prob.solve()
    ref = float(np.sum(av ** 1.5))
    assert abs(obj - ref) < 1e-4 * ref


def test_power_atom_negative_analytic():
    """min x^-2 + p*x  ->  x = (2/p)^(1/3)."""
    x = ct.Variable(name='x')
    p = ct.Parameter(name='p', nonneg=True)
    prob = ct.Problem(ct.Minimize(ct.power(x, -2.0) + ct.multiply(p, x)))
    p.value = 2.0
    obj = prob.solve()
    xs = 1.0  # (2/2)^(1/3)
    ref = xs ** -2 + 2.0 * xs
    assert abs(obj - ref) < 1e-3 * ref
    assert abs(float(x.value) - 1.0) < 1e-3


def test_powcone_constraint_direct():
    """min z s.t. (x, y, 1) reversed ... use: max z s.t. (x, y, z) in K_a,
    x == p1, y == p2  ->  z = x^a y^(1-a)."""
    a = 0.6
    x = ct.Variable(name='x')
    y = ct.Variable(name='y')
    z = ct.Variable(name='z')
    p1 = ct.Parameter(name='p1')
    p2 = ct.Parameter(name='p2')
    prob = ct.Problem(ct.Maximize(z),
                      [ct.PowCone3D(x, y, z, a), x == p1, y == p2])
    p1.value = 2.0
    p2.value = 3.0
    obj = prob.solve()
    ref = 2.0 ** a * 3.0 ** (1 - a)
    assert abs(obj - ref) < 1e-4 * ref
    dv = prob.constraints[0].dual_value
    assert isinstance(dv, list) and len(dv) == 3


def test_power_compiled_batch():
    import jax.numpy as jnp
    from cvxpygen_tpu.canon.canonicalizer import canonicalize
    from cvxpygen_tpu.runtime.solver import make_compiled_solver
    x = ct.Variable(2, name='x')
    p = ct.Parameter(name='p')
    prob = ct.Problem(ct.Maximize(ct.sum(ct.power(x, 0.7))),
                      [ct.sum(x) == p])
    p.value = 2.0
    fam = canonicalize(prob)
    s = make_compiled_solver(fam, 'CLARABEL')
    # CLARABEL alias -> IPM engine, which covers pow cones natively
    assert type(s).__name__ == 'CompiledConicSolver'
    out = s.solve_batch(jnp.asarray([[2.0], [4.0]]))
    obj = -np.asarray(out['obj'])
    assert abs(obj[0] - 2 * 1.0 ** 0.7) < 5e-3
    assert abs(obj[1] - 2 * 2.0 ** 0.7) < 5e-3
