"""Gradient correctness (parity target: reference tests/test_diff.py --
generated forward/backward vs cvxpylayers, atol 1e-4; here vs central
finite differences of the float64 oracle)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import cvxpygen_tpu as ct
from cvxpygen_tpu.canon.canonicalizer import canonicalize
from cvxpygen_tpu.autodiff.qp_diff import make_diff_solve
from cvxpygen_tpu.runtime.jax_family import JaxFamily
from cvxpygen_tpu.solvers.admm import ADMMSettings
from cvxpygen_tpu.solvers.oracle import solve_family_numpy

TIGHT = ADMMSettings(eps_abs=1e-10, eps_rel=1e-10, max_iter=20000)


def _fd_grad(fam, theta, w, eps=1e-6):
    """central finite differences of f(theta) = w . x*(theta) via oracle."""
    g = np.zeros_like(theta)
    for i in range(len(theta)):
        tp = theta.copy(); tp[i] += eps
        rp, _ = solve_family_numpy(fam, tp)
        tm = theta.copy(); tm[i] -= eps
        rm, _ = solve_family_numpy(fam, tm)
        fp = float(w @ rp.x)
        fm = float(w @ rm.x)
        g[i] = (fp - fm) / (2 * eps)
    return g


@pytest.mark.parametrize('m,n', [(10, 5), (1, 1)])
def test_nonneg_ls_grad_vs_fd(m, n):
    """reference tests/test_diff.py:14-69 problem (x >= 0 via attribute)."""
    x = ct.Variable(n, name='x', nonneg=True)
    A = ct.Parameter((m, n), name='A')
    b = ct.Parameter(m, name='b')
    prob = ct.Problem(ct.Minimize(ct.sum_squares(A @ x - b)))
    np.random.seed(0)
    A.value = np.random.randn(m, n)
    b.value = np.random.randn(m)

    fam = canonicalize(prob)
    theta = fam.pack_theta(params=prob.parameters())
    jf = JaxFamily.from_family(fam)
    solve = make_diff_solve(jf, TIGHT)

    # dL/dx = 0.1 on the user variable block
    w = np.zeros(fam.n)
    vi = [v for v in fam.var_info if v.name == 'x'][0]
    w[vi.offset:vi.offset + vi.size] = 0.1

    def f(th):
        out = solve(th[None, :])
        return jnp.sum(jnp.asarray(w) * out['x'][0])

    g = np.asarray(jax.grad(f)(jnp.asarray(theta)))
    g_fd = _fd_grad(fam, theta, w)
    np.testing.assert_allclose(g, g_fd, atol=1e-4, rtol=1e-3)

    grads = fam.unpack_theta_grad(g)
    assert grads['A'].shape == (m, n)
    assert np.asarray(grads['b']).shape == ((m,) if m > 1 else (m,))

    # second parameter values (reference re-checks after update)
    A.value = np.random.rand(m, n)
    b.value = np.random.rand(m)
    theta2 = fam.pack_theta(params=prob.parameters())
    g2 = np.asarray(jax.grad(f)(jnp.asarray(theta2)))
    g2_fd = _fd_grad(fam, theta2, w)
    np.testing.assert_allclose(g2, g2_fd, atol=1e-4, rtol=1e-3)


def test_grad_objective_output():
    """gradient of the optimal objective w.r.t. theta = envelope theorem."""
    n = 3
    x = ct.Variable(n, name='x')
    c = ct.Parameter(n, name='c')
    prob = ct.Problem(ct.Minimize(ct.sum_squares(x) + c @ x), [x >= -10])
    np.random.seed(1)
    c.value = np.random.randn(n)
    fam = canonicalize(prob)
    theta = fam.pack_theta(params=prob.parameters())
    jf = JaxFamily.from_family(fam)
    solve = make_diff_solve(jf, TIGHT)

    def f(th):
        return solve(th[None, :])['obj'][0]

    g = np.asarray(jax.grad(f)(jnp.asarray(theta)))
    # analytic: obj* = -||c||^2/4 (x* = -c/2, interior), d obj*/dc = -c/2 = x*
    np.testing.assert_allclose(g, -theta / 2, atol=1e-6)


def test_grad_mpc_x_init():
    """MPC family: gradient of sum(U) w.r.t. x_init vs finite differences."""
    from problems import ALL
    make, assign = ALL['MPC']
    prob = make()
    assign(prob, seed=0)
    fam = canonicalize(prob)
    theta = fam.pack_theta(params=prob.parameters())
    jf = JaxFamily.from_family(fam)
    solve = make_diff_solve(jf, TIGHT)

    vi = [v for v in fam.var_info if v.name == 'U'][0]
    w = np.zeros(fam.n)
    w[vi.offset:vi.offset + vi.size] = 1.0

    def f(th):
        out = solve(th[None, :])
        return jnp.sum(jnp.asarray(w) * out['x'][0])

    g = np.asarray(jax.grad(f)(jnp.asarray(theta)))
    xi = [pi for pi in fam.param_info if pi.name == 'x_init'][0]
    # finite differences only over the x_init block (cheap)
    eps = 1e-5
    for k in range(xi.flat_size):
        i = xi.offset + k
        tp = theta.copy(); tp[i] += eps
        tm = theta.copy(); tm[i] -= eps
        rp, _ = solve_family_numpy(fam, tp)
        rm, _ = solve_family_numpy(fam, tm)
        fd = (w @ rp.x - w @ rm.x) / (2 * eps)
        assert abs(g[i] - fd) < 5e-3 * max(1.0, abs(fd)), (k, g[i], fd)
