"""Banded implicit differentiation (autodiff/qp_diff_banded.py).

VERDICT r4 missing #3: the dense diff path forms the (B, n+m, n+m)
reduced KKT -- impossible at charging scale.  These tests check the
banded vjp against central finite differences and against the dense
implementation on a size where both run.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import cvxpygen_tpu as ct
from cvxpygen_tpu.canon.canonicalizer import canonicalize
from test_admm_banded import assign_charging, charging_problem


def test_layer_routes_banded():
    T = 288
    prob = assign_charging(charging_problem(T), T=T)
    layer = ct.JaxLayer(prob,
                        parameters=[prob.param_dict['p'],
                                    prob.param_dict['gamma']],
                        variables=[prob.var_dict['u']])
    assert layer._banded  # n + m = 2021 > 1500 -> banded auto-routing


def test_banded_layer_matches_fd():
    """JaxLayer gradient over a charging T=288 solve vs central finite
    differences (VERDICT r4 item 7 done-criterion: T >= 288, 1e-3)."""
    T = 288
    prob = assign_charging(charging_problem(T), T=T)
    p = prob.param_dict['p']
    gamma = prob.param_dict['gamma']
    u = prob.var_dict['u']
    from cvxpygen_tpu.solvers.admm import ADMMSettings
    st = ADMMSettings(eps_abs=1e-10, eps_rel=1e-10, max_iter=200000,
                      check_interval=50)
    layer = ct.JaxLayer(prob, parameters=[p, gamma], variables=[u],
                        settings=st)
    assert layer._banded

    pv = jnp.asarray(p.value)
    gv = jnp.asarray(float(gamma.value))
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal(T))

    def loss(pval):
        (uval,) = layer(pval, gv)
        return jnp.sum(w * uval)

    g = np.asarray(jax.grad(loss)(pv))
    assert g.shape == (T,)
    assert np.all(np.isfinite(g))

    h = 1e-5
    idx = rng.choice(T, size=5, replace=False)
    for i in idx:
        ppl = pv.at[i].add(h)
        pmi = pv.at[i].add(-h)
        fd = (float(loss(ppl)) - float(loss(pmi))) / (2 * h)
        assert abs(g[i] - fd) <= 1e-3 * max(1.0, abs(fd)), (i, g[i], fd)


def test_banded_bwd_matches_dense_small():
    """On a small charging family both backward implementations run:
    banded vjp == dense qp_diff vjp."""
    from cvxpygen_tpu.autodiff.qp_diff import make_diff_solve
    from cvxpygen_tpu.autodiff.qp_diff_banded import make_diff_solve_banded
    from cvxpygen_tpu.runtime.jax_family import JaxFamily
    from cvxpygen_tpu.solvers.admm import ADMMSettings
    from cvxpygen_tpu.solvers.admm_banded import build_banded_structure

    T = 24
    prob = assign_charging(charging_problem(T), T=T)
    fam = canonicalize(prob)
    theta = fam.pack_theta(params=prob.parameters())[None, :]
    theta = jnp.asarray(theta)

    st = ADMMSettings(eps_abs=1e-10, eps_rel=1e-10, max_iter=200000,
                      use_pallas='never')
    jf = JaxFamily.from_family(fam)
    dense = make_diff_solve(jf, st)
    jf_sc = JaxFamily.from_family(fam, force_scatter=True)
    struct = build_banded_structure(fam.P_idx, fam.A_idx, fam.n, fam.m)
    assert struct is not None
    band = make_diff_solve_banded(jf_sc, struct, st)

    rng = np.random.default_rng(1)
    gx = jnp.asarray(rng.standard_normal(fam.n))

    def loss_with(solve, th):
        return jnp.sum(solve(th)['x'][0] * gx)

    gd = np.asarray(jax.grad(lambda th: loss_with(dense, th))(theta))
    gb = np.asarray(jax.grad(lambda th: loss_with(band, th))(theta))
    np.testing.assert_allclose(gb, gd, rtol=2e-4, atol=1e-7)

    # objective seed path too
    god = np.asarray(jax.grad(
        lambda th: jnp.sum(dense(th)['obj']))(theta))
    gob = np.asarray(jax.grad(
        lambda th: jnp.sum(band(th)['obj']))(theta))
    np.testing.assert_allclose(gob, god, rtol=2e-4, atol=1e-7)


def test_torch_layer_routes_banded():
    """TorchLayer mirrors JaxLayer's banded auto-routing; gradients flow
    through the banded vjp into torch autograd."""
    torch = pytest.importorskip('torch')
    from cvxpygen_tpu.autodiff.torch_layer import TorchLayer
    T = 288
    prob = assign_charging(charging_problem(T), T=T)
    p = prob.param_dict['p']
    gamma = prob.param_dict['gamma']
    u = prob.var_dict['u']
    layer = TorchLayer(prob, parameters=[p, gamma], variables=[u])
    assert layer._banded
    pv = torch.tensor(np.asarray(p.value), requires_grad=True,
                      dtype=torch.float64)
    gv = torch.tensor(float(gamma.value), dtype=torch.float64)
    (uval,) = layer(pv, gv)
    loss = uval.sum()
    loss.backward()
    g = pv.grad.numpy()
    assert g.shape == (T,)
    assert np.all(np.isfinite(g)) and np.any(g != 0)
