"""Conic implicit differentiation vs finite differences (the reference's
gradient-for-conic-solvers capability, done directly; tests/test_diff.py
pattern on the ADP SOCP family)."""
import numpy as np

import jax
import jax.numpy as jnp

from cvxpygen_tpu.autodiff.conic_diff import make_conic_diff_solve
from cvxpygen_tpu.canon.canonicalizer import canonicalize
from cvxpygen_tpu.runtime.jax_family import JaxFamily
from cvxpygen_tpu.solvers.ipm import IPMSettings
from cvxpygen_tpu.solvers.oracle import solve_family_numpy
from problems import ADP_problem, assign_ADP

TIGHT = IPMSettings(max_iter=100, tol_feas=1e-11, tol_gap=1e-11)


def test_adp_grad_vs_fd():
    prob = ADP_problem()
    assign_ADP(prob, seed=0)
    fam = canonicalize(prob)
    theta = fam.pack_theta(params=prob.parameters())
    jf = JaxFamily.from_family(fam)
    solve = make_conic_diff_solve(jf, TIGHT)

    vi = [v for v in fam.var_info if v.name == 'u'][0]
    w = np.zeros(fam.n)
    w[vi.offset:vi.offset + vi.size] = 1.0

    def fx(th):
        out = solve(th[None, :])
        return jnp.sum(jnp.asarray(w) * out['x'][0])

    g = np.asarray(jax.grad(fx)(jnp.asarray(theta)))

    eps = 1e-6
    for i in range(0, fam.p, 3):  # subsample for speed
        tp = theta.copy(); tp[i] += eps
        tm = theta.copy(); tm[i] -= eps
        rp, _ = solve_family_numpy(fam, tp)
        rm, _ = solve_family_numpy(fam, tm)
        fd = (w @ rp.x - w @ rm.x) / (2 * eps)
        assert abs(g[i] - fd) < 2e-4 + 2e-3 * abs(fd), (i, g[i], fd)


def test_adp_obj_grad_vs_fd():
    prob = ADP_problem()
    assign_ADP(prob, seed=0)
    fam = canonicalize(prob)
    theta = fam.pack_theta(params=prob.parameters())
    jf = JaxFamily.from_family(fam)
    solve = make_conic_diff_solve(jf, TIGHT)

    def fobj(th):
        return solve(th[None, :])['obj'][0]

    g = np.asarray(jax.grad(fobj)(jnp.asarray(theta)))
    eps = 1e-6
    tt = np.concatenate([theta, [1.0]])

    def full_obj(th):
        res, _ = solve_family_numpy(fam, th)
        t2 = np.concatenate([th, [1.0]])
        d = float(np.asarray(fam.d_map @ t2).ravel()[0])
        if fam.d_quad is not None:
            d += float(t2 @ (fam.d_quad @ t2))
        return res.obj + d

    for i in range(0, fam.p, 4):
        tp = theta.copy(); tp[i] += eps
        tm = theta.copy(); tm[i] -= eps
        fd = (full_obj(tp) - full_obj(tm)) / (2 * eps)
        assert abs(g[i] - fd) < 2e-4 + 2e-3 * abs(fd), (i, g[i], fd)
