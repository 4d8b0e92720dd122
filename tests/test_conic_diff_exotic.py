"""Implicit differentiation through exp/PSD-cone families: projection
Jacobians vs finite differences, and end-to-end gradients vs finite
differences (reference pattern: tests/test_diff.py:120-164 checks explicit
gradients against central differences at atol 1e-3)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import cvxpygen_tpu as ct
from cvxpygen_tpu.autodiff.conic_diff import (
    _exp_proj_jacobian, _psd_proj_jacobian, make_conic_diff_solve)
from cvxpygen_tpu.canon.canonicalizer import canonicalize
from cvxpygen_tpu.ops.cones import ConeLayout, project_cone_np
from cvxpygen_tpu.runtime.jax_family import JaxFamily


def _fd_jac(v, layout, eps=1e-6):
    mc = len(v)
    J = np.zeros((mc, mc))
    for j in range(mc):
        e = np.zeros(mc)
        e[j] = eps
        J[:, j] = (project_cone_np(v + e, layout)
                   - project_cone_np(v - e, layout)) / (2 * eps)
    return J


def test_exp_proj_jacobian_vs_fd():
    rng = np.random.default_rng(0)
    layout = ConeLayout(n_exp=1)
    n_checked = 0
    for _ in range(60):
        v = rng.normal(size=3) * rng.choice([0.3, 1.0, 3.0])
        J_fd = _fd_jac(v, layout)
        J = np.asarray(_exp_proj_jacobian(
            jnp.asarray(v[None, :], jnp.float64), jnp.float64))[0]
        # skip points near case boundaries where FD straddles a kink
        if np.max(np.abs(J - J_fd)) > 1e-4:
            x = project_cone_np(v, layout)
            d = np.linalg.norm(x - v)
            # non-smooth points: projection distance tiny or on a face
            assert d < 1e-3 or abs(x[1]) < 1e-3, (v, J, J_fd)
        else:
            n_checked += 1
    assert n_checked >= 45


def test_psd_proj_jacobian_vs_fd():
    rng = np.random.default_rng(1)
    s = 3
    layout = ConeLayout(psds=(s,))
    k = s * (s + 1) // 2
    ok = 0
    for _ in range(20):
        v = rng.normal(size=k)
        J_fd = _fd_jac(v, layout)
        J = np.asarray(_psd_proj_jacobian(
            jnp.asarray(v[None, :], jnp.float64), s, jnp.float64))[0]
        assert np.max(np.abs(J - J_fd)) < 1e-5, (v,)
        ok += 1
    assert ok == 20


def _fd_grad(fam, theta, loss_on_x, eps=1e-5):
    from cvxpygen_tpu.solvers.oracle import solve_family_numpy
    g = np.zeros_like(theta)
    for i in range(len(theta)):
        tp = theta.copy()
        tp[i] += eps
        tm = theta.copy()
        tm[i] -= eps
        rp, _ = solve_family_numpy(fam, tp, tol=1e-11, max_iter=400000)
        rm, _ = solve_family_numpy(fam, tm, tol=1e-11, max_iter=400000)
        g[i] = (loss_on_x(rp.x) - loss_on_x(rm.x)) / (2 * eps)
    return g


def test_expcone_gradient_vs_fd():
    """d/dp of sum(x*) for min sum(exp(x - p)) + sum_squares(x)."""
    x = ct.Variable(3, name='x')
    p = ct.Parameter(3, name='p')
    prob = ct.Problem(ct.Minimize(ct.sum(ct.exp(x - p)) + ct.sum_squares(x)))
    fam = canonicalize(prob)
    jf = JaxFamily.from_family(fam)
    from cvxpygen_tpu.solvers.conic_admm import ConicADMMSettings
    solve = make_conic_diff_solve(
        jf, ConicADMMSettings(eps_abs=1e-9, eps_rel=1e-9, max_iter=20000))

    theta = np.array([0.2, -0.5, 1.0])
    nx = len([v for v in fam.var_info if v.is_user][0:1][0].shape or [3])
    w = np.array([1.0, -2.0, 0.5])

    def loss(theta_j):
        out = solve(jnp.asarray(theta_j[None, :]))
        return jnp.sum(jnp.asarray(w) * out['x'][0, :3])

    g = np.asarray(jax.grad(lambda t: loss(t))(jnp.asarray(theta)))
    g_fd = _fd_grad(fam, theta,
                    lambda xs: float(w @ xs[:3]))
    assert np.max(np.abs(g - g_fd)) < 2e-3, (g, g_fd)


def test_psd_gradient_vs_fd():
    """d/dtheta of t* for min t s.t. t I >> A(theta): gradient of
    lambda_max = vv' at the top eigenvector (analytic!)."""
    s = 3
    rng = np.random.default_rng(2)
    Aval = rng.normal(size=(s, s))
    Aval = 0.5 * (Aval + Aval.T)
    t = ct.Variable(name='t')
    A = ct.Parameter((s, s), name='A')
    prob = ct.Problem(ct.Minimize(t), [ct.multiply(t, np.eye(s)) >> A])
    A.value = Aval
    fam = canonicalize(prob)
    jf = JaxFamily.from_family(fam)
    from cvxpygen_tpu.solvers.conic_admm import ConicADMMSettings
    solve = make_conic_diff_solve(
        jf, ConicADMMSettings(eps_abs=1e-9, eps_rel=1e-9, max_iter=30000))
    theta = fam.pack_theta(params=prob.parameters())
    t_off = [vi.offset for vi in fam.var_info if vi.name == 't'][0]

    def loss(th):
        out = solve(th[None, :])
        return out['x'][0, t_off]

    g = np.asarray(jax.grad(loss)(jnp.asarray(theta)))
    dA = fam.unpack_theta_grad(g)['A']
    lam, Q = np.linalg.eigh(Aval)
    v = Q[:, -1]
    ref = np.outer(v, v)  # d lambda_max / dA (simple top eigenvalue)
    assert np.max(np.abs(dA - ref)) < 2e-3, (dA, ref)


def test_generate_code_gradient_expcone(tmp_path):
    """cpg.generate_code(gradient=True) forward/backward on an exp family
    (reference cvxpylayers-style flow, templates/cpg_solver.py.jinja2:
    176-213): param.gradient vs central finite differences."""
    from cvxpygen_tpu import cpg
    x = ct.Variable(2, name='x')
    p = ct.Parameter(2, name='p')
    prob = ct.Problem(ct.Minimize(ct.sum(ct.exp(x - p))
                                  + ct.sum_squares(x)))
    p.value = np.array([0.5, -0.3])
    mod = cpg.generate_code(prob, code_dir=str(tmp_path / 'g'), solver='SCS',
                            gradient=True, prefix='expgrad')
    prob.solve(method='CPG')
    x.gradient = np.array([1.0, 0.0])
    grads = mod.cpg_gradient(prob)
    assert 'p' in grads

    fam = canonicalize(prob)

    def x0_of(pv):
        from cvxpygen_tpu.solvers.oracle import solve_family_numpy
        th = fam.pack_theta(values={'p': pv})
        r, _ = solve_family_numpy(fam, th, tol=1e-11, max_iter=200000)
        return r.x[0]

    eps = 1e-5
    base = np.array([0.5, -0.3])
    for k in range(2):
        e = np.zeros(2)
        e[k] = eps
        fd = (x0_of(base + e) - x0_of(base - e)) / (2 * eps)
        assert abs(grads['p'][k] - fd) < 2e-3, (k, grads['p'][k], fd)
