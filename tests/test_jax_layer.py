"""JaxLayer (autodiff/jax_layer.py): cvxpylayers.jax-parity surface.

Parity target: reference tests/test_diff.py:72-117 (generated forward/
backward integrated with cvxpylayers.jax, atol 1e-4 bar).  The conic
(SOC/exp) coverage exceeds the reference, which differentiates only
OSQP-formable problems.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import cvxpygen_tpu as ct
from cvxpygen_tpu.autodiff.jax_layer import JaxLayer
from cvxpygen_tpu.canon.canonicalizer import canonicalize
from cvxpygen_tpu.solvers.oracle import solve_family_numpy


def _nonneg_ls(m=6, n=4):
    x = ct.Variable(n, name='x', nonneg=True)
    A = ct.Parameter((m, n), name='A')
    b = ct.Parameter(m, name='b')
    prob = ct.Problem(ct.Minimize(ct.sum_squares(A @ x - b)))
    return prob, A, b, x


def test_forward_matches_oracle():
    prob, A, b, x = _nonneg_ls()
    rng = np.random.default_rng(0)
    Av = rng.standard_normal((6, 4))
    bv = rng.standard_normal(6)
    layer = JaxLayer(prob, parameters=[A, b], variables=[x])
    (xj,) = layer(jnp.asarray(Av), jnp.asarray(bv))
    A.value, b.value = Av, bv
    prob.solve()
    np.testing.assert_allclose(np.asarray(xj), x.value, atol=1e-5)


def test_exported_lazy():
    assert ct.JaxLayer is JaxLayer


def test_grad_vs_finite_differences():
    prob, A, b, x = _nonneg_ls(m=4, n=3)
    fam = canonicalize(prob)
    rng = np.random.default_rng(1)
    Av = rng.standard_normal((4, 3))
    bv = rng.standard_normal(4)
    w = rng.standard_normal(3)
    layer = JaxLayer(prob, parameters=[A, b], variables=[x])

    def loss(bval):
        (xv,) = layer(jnp.asarray(Av), bval)
        return jnp.sum(xv * jnp.asarray(w))

    g = np.asarray(jax.grad(loss)(jnp.asarray(bv)))

    # finite differences through the float64 oracle
    def f(bval):
        theta = fam.pack_theta(values={'A': Av, 'b': bval})
        res, _ = solve_family_numpy(fam, theta)
        xi = [vi for vi in fam.var_info if vi.is_user][0]
        return float(w @ res.x[xi.offset:xi.offset + xi.size])

    eps = 1e-6
    fd = np.array([(f(bv + eps * np.eye(4)[i]) - f(bv - eps * np.eye(4)[i]))
                   / (2 * eps) for i in range(4)])
    np.testing.assert_allclose(g, fd, atol=1e-4)


def test_batched_and_jit():
    prob, A, b, x = _nonneg_ls(m=4, n=3)
    rng = np.random.default_rng(2)
    B = 3
    Av = rng.standard_normal((4, 3))           # unbatched -> broadcast
    bv = rng.standard_normal((B, 4))           # batched
    layer = JaxLayer(prob, parameters=[A, b], variables=[x])
    fn = jax.jit(lambda a, bb: layer(a, bb)[0])
    xb = np.asarray(fn(jnp.asarray(Av), jnp.asarray(bv)))
    assert xb.shape == (B, 3)
    # row-wise agreement with single solves
    for i in range(B):
        (xi,) = layer(jnp.asarray(Av), jnp.asarray(bv[i]))
        np.testing.assert_allclose(xb[i], np.asarray(xi), atol=1e-6)


def test_soc_layer_grad():
    """Conic (SOC) family through the layer -- exceeds the reference's
    OSQP-only differentiation."""
    n = 3
    x = ct.Variable(n, name='x')
    a = ct.Parameter(n, name='a')
    prob = ct.Problem(ct.Minimize(ct.norm(x - a, 2) + 0.1 * ct.sum(x)),
                      [x >= 0.0])
    rng = np.random.default_rng(3)
    av = np.abs(rng.standard_normal(n)) + 0.5
    layer = JaxLayer(prob, parameters=[a], variables=[x])
    (xv,) = layer(jnp.asarray(av))
    a.value = av
    prob.solve()
    np.testing.assert_allclose(np.asarray(xv), x.value, atol=1e-4)

    def loss(aval):
        return jnp.sum(layer(aval)[0])

    g = np.asarray(jax.grad(loss)(jnp.asarray(av)))
    eps = 1e-5
    for i in range(n):
        ap = av.copy(); ap[i] += eps
        am = av.copy(); am[i] -= eps
        a.value = ap
        prob.solve()
        xp = np.sum(x.value)
        a.value = am
        prob.solve()
        xm = np.sum(x.value)
        np.testing.assert_allclose(g[i], (xp - xm) / (2 * eps), atol=2e-3)
