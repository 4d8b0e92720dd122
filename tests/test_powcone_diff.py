"""Pow-cone implicit differentiation (closes the r1 NotImplementedError,
VERDICT item 8): projection Jacobian vs finite differences and an
end-to-end gradient vs finite differences (reference FD pattern:
tests/test_diff.py:120-164, atol 1e-3)."""
import numpy as np
import jax
import jax.numpy as jnp

import cvxpygen_tpu as ct
from cvxpygen_tpu.autodiff.conic_diff import (_pow_proj_jacobian,
                                              make_conic_diff_solve)
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


def test_pow_proj_jacobian_vs_fd():
    rng = np.random.default_rng(0)
    for a in (0.3, 0.5, 0.75):
        layout = ConeLayout(pows=(a,))
        n_checked = 0
        for _ in range(60):
            v = rng.normal(size=3) * rng.choice([0.3, 1.0, 3.0])
            J_fd = _fd_jac(v, layout)
            J = np.asarray(_pow_proj_jacobian(
                jnp.asarray(v[None, :], jnp.float64), a, jnp.float64))[0]
            if np.max(np.abs(J - J_fd)) > 1e-4:
                # non-smooth points: near case boundaries FD straddles a
                # kink -- same skip rule as the exp-cone test
                x = project_cone_np(v, layout)
                d = np.linalg.norm(x - v)
                assert (d < 1e-3 or abs(v[2]) < 1e-3
                        or min(abs(x[0]), abs(x[1])) < 1e-3), (a, v, J, J_fd)
            else:
                n_checked += 1
        assert n_checked >= 40, (a, n_checked)


def _fd_grad(fam, theta, loss_of_x, eps=1e-5):
    from cvxpygen_tpu.solvers.oracle import solve_family_numpy
    g = np.zeros(len(theta))
    for j in range(len(theta)):
        e = np.zeros(len(theta))
        e[j] = eps
        rp, _ = solve_family_numpy(fam, theta + e)
        rm, _ = solve_family_numpy(fam, theta - e)
        g[j] = (loss_of_x(rp.x) - loss_of_x(rm.x)) / (2 * eps)
    return g


def test_powcone_gradient_vs_fd():
    """d/dp of w'x* for min p'x - sum(x .^ 0.6) over x >= 0 box -- the
    power atom lowers to 3D power cones."""
    x = ct.Variable(2, name='x')
    p = ct.Parameter(2, name='p')
    prob = ct.Problem(
        ct.Minimize(p @ x - ct.sum(ct.power(x, 0.6))),
        [x >= 0, x <= 3])
    p.value = np.array([0.8, 1.3])
    fam = canonicalize(prob)
    assert getattr(fam, 'pow_alphas', ()), 'family must carry pow cones'
    jf = JaxFamily.from_family(fam)
    from cvxpygen_tpu.solvers.conic_admm import ConicADMMSettings
    solve = make_conic_diff_solve(
        jf, ConicADMMSettings(eps_abs=1e-10, eps_rel=1e-10,
                              max_iter=40000))
    theta = fam.pack_theta(params=prob.parameters())
    w = np.array([1.0, -0.5])
    x_off = [vi.offset for vi in fam.var_info if vi.name == 'x'][0]

    def loss(th):
        out = solve(th[None, :])
        return jnp.sum(jnp.asarray(w) * out['x'][0, x_off:x_off + 2])

    g = np.asarray(jax.grad(loss)(jnp.asarray(theta)))
    g_fd = _fd_grad(fam, theta,
                    lambda xs: float(w @ xs[x_off:x_off + 2]))
    assert np.max(np.abs(g - g_fd)) < 2e-3, (g, g_fd)
