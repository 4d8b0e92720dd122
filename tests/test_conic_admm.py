"""Conic ADMM engine (SCS role) vs the float64 oracle on SOCP/QP/LP
families (pattern of reference tests/test_E2E_SOCP.py with SCS: rel.
objective gap < 0.1; we require much tighter)."""
import numpy as np
import jax.numpy as jnp
import pytest

from cvxpygen_tpu.canon.canonicalizer import canonicalize
from cvxpygen_tpu.ops.cones import ConeLayout
from cvxpygen_tpu.runtime.jax_family import JaxFamily, canon_batch
from cvxpygen_tpu.solvers.conic_admm import (
    ConicADMMSettings, conic_admm_solve)
from cvxpygen_tpu.solvers.oracle import solve_family_numpy
from problems import ALL


def _solve(fam, thetas, st=None):
    jf = JaxFamily.from_family(fam)
    d = canon_batch(jf, jnp.asarray(np.atleast_2d(thetas)))
    layout = ConeLayout(n_nonneg=fam.n_nonneg, socs=tuple(fam.soc_dims))
    st = st or ConicADMMSettings()
    return conic_admm_solve(d['P'], d['q'], d['A'], d['b'],
                            fam.n_zero, layout, st), d


@pytest.mark.parametrize('name', ['ADP', 'nonneg_LS', 'network', 'MPC'])
def test_conic_admm_vs_oracle(name):
    make, assign = ALL[name]
    prob = make()
    assign(prob, seed=0)
    fam = canonicalize(prob)
    theta = fam.pack_theta(params=prob.parameters())

    res, y_ref = solve_family_numpy(fam, theta)
    assert res.status == 'optimal'

    out, d = _solve(fam, theta)
    assert bool(np.asarray(out['solved'])[0]), (
        float(out['pri_res'][0]), float(out['dua_res'][0]),
        int(out['iters'][0]))
    obj = float(np.asarray(out['obj'])[0])
    assert abs(obj - res.obj) < 5e-3 * max(1.0, abs(res.obj))
    # USER-variable agreement (the canonical x can be non-unique along
    # null(P) directions -- same convention as test_e2e_qp.py)
    x = np.asarray(out['x'])[0]
    prim = np.concatenate([x[vi.offset:vi.offset + vi.size]
                           for vi in fam.user_vars])
    prim_ref = np.concatenate([res.x[vi.offset:vi.offset + vi.size]
                               for vi in fam.user_vars])
    den = max(1.0, np.linalg.norm(prim_ref))
    assert np.linalg.norm(prim - prim_ref) / den < 5e-2
    # dual agreement (y_canon = -y vs oracle [nu; z])
    y = -np.asarray(out['y'])[0]
    den = max(1.0, np.linalg.norm(y_ref))
    assert np.linalg.norm(y - y_ref) / den < 1e-1


def test_conic_admm_batch_consistency():
    make, assign = ALL['ADP']
    prob = make()
    fam = canonicalize(prob)
    thetas = np.stack([fam.pack_theta(params=assign(prob, seed=s).parameters())
                       for s in range(3)])
    out_b, _ = _solve(fam, thetas)
    for i in range(3):
        out_1, _ = _solve(fam, thetas[i:i + 1])
        assert np.allclose(np.asarray(out_b['x'])[i],
                           np.asarray(out_1['x'])[0], atol=5e-5)


def test_conic_admm_primal_infeasible():
    """x >= p with sum(x) <= -1 and p = 1: infeasible."""
    import cvxpygen_tpu as ct
    x = ct.Variable(3, name='x')
    p = ct.Parameter(3, name='p')
    prob = ct.Problem(ct.Minimize(ct.sum_squares(x)),
                      [x >= p, ct.sum(x) <= -1.0])
    p.value = np.ones(3)
    fam = canonicalize(prob)
    theta = fam.pack_theta(params=prob.parameters())
    out, _ = _solve(fam, theta, ConicADMMSettings(max_iter=4000))
    assert int(np.asarray(out['status'])[0]) == -3
    assert np.isposinf(float(np.asarray(out['obj'])[0]))


def test_conic_admm_warm_start():
    make, assign = ALL['ADP']
    prob = make()
    assign(prob, seed=0)
    fam = canonicalize(prob)
    theta = fam.pack_theta(params=prob.parameters())
    jf = JaxFamily.from_family(fam)
    d = canon_batch(jf, jnp.asarray(theta[None, :]))
    layout = ConeLayout(n_nonneg=fam.n_nonneg, socs=tuple(fam.soc_dims))
    st = ConicADMMSettings()
    cold = conic_admm_solve(d['P'], d['q'], d['A'], d['b'], fam.n_zero,
                            layout, st)
    warm = conic_admm_solve(d['P'], d['q'], d['A'], d['b'], fam.n_zero,
                            layout, st, x0=cold['x'], y0=cold['y'])
    assert int(np.asarray(warm['iters'])[0]) <= \
        int(np.asarray(cold['iters'])[0])
