"""Block-banded ADMM solver (solvers/admm_banded.py).

Equivalence vs the dense ADMM path on the charging family (reference
examples/charging.ipynb), structure detection, and a long-horizon smoke
test at a size the dense path cannot reasonably materialize batched.
"""
import numpy as np
import pytest

import jax.numpy as jnp

import cvxpygen_tpu as ct
from cvxpygen_tpu.canon.canonicalizer import canonicalize
from cvxpygen_tpu.runtime.jax_family import (
    JaxFamily, canon_batch, canon_batch_sparse, qp_bounds_batch)
from cvxpygen_tpu.runtime.solver import (
    CompiledBandedQPSolver, make_compiled_solver)
from cvxpygen_tpu.solvers.admm import ADMMSettings, admm_solve
from cvxpygen_tpu.solvers.admm_banded import (
    admm_solve_banded, build_banded_structure)


def charging_problem(T=48):
    u = ct.Variable(T, name='u')
    q = ct.Variable(T + 1, name='q')
    p = ct.Parameter(T, nonneg=True, name='p')
    gamma = ct.Parameter(nonneg=True, name='gamma')
    objective = ct.Minimize(p @ u + gamma * ct.sum_squares(u))
    constraints = [q[1:] == q[:-1] + u,
                   ct.Constant(-0.1) <= u, u <= ct.Constant(0.05),
                   ct.Constant(0) <= q, q <= ct.Constant(1.0),
                   q[0] == 0, q[T] == ct.Constant(1.0)]
    return ct.Problem(objective, constraints)


def assign_charging(prob, T=48, seed=0):
    rng = np.random.default_rng(seed)
    prob.param_dict['p'].value = 1.0 + 4.0 * rng.random(T)
    prob.param_dict['gamma'].value = 50.0
    return prob


def _thetas(fam, prob, T, n_inst=4):
    outs = []
    for s in range(n_inst):
        assign_charging(prob, T=T, seed=s)
        outs.append(fam.pack_theta(params=prob.parameters()))
    return np.stack(outs)


def test_structure_detected():
    T = 48
    prob = assign_charging(charging_problem(T), T=T)
    fam = canonicalize(prob)
    st = build_banded_structure(fam.P_idx, fam.A_idx, fam.n, fam.m)
    assert st is not None
    assert st.nb >= 4
    # banded storage must be much smaller than dense n^2
    assert st.nb * 3 * st.s * st.s < fam.n * fam.n


@pytest.mark.parametrize('adaptive', [False, True])
def test_banded_matches_dense(adaptive):
    T = 48
    prob = assign_charging(charging_problem(T), T=T)
    fam = canonicalize(prob)
    theta = _thetas(fam, prob, T)

    jf_d = JaxFamily.from_family(fam)
    jf_s = JaxFamily.from_family(fam, force_scatter=True)
    struct = build_banded_structure(fam.P_idx, fam.A_idx, fam.n, fam.m)
    st = ADMMSettings(eps_abs=1e-5, eps_rel=1e-5, max_iter=8000,
                      adaptive_rho=adaptive, kkt_solver='inv',
                      use_pallas='never')

    data = canon_batch(jf_d, jnp.asarray(theta))
    l, u = qp_bounds_batch(jf_d, data['b'])
    dense = admm_solve(data['P'], data['q'], data['A'], l, u,
                       jf_d.n_zero, st)

    ds = canon_batch_sparse(jf_s, jnp.asarray(theta))
    banded = admm_solve_banded(struct, ds['pvals'], ds['q'], ds['avals'],
                               l, u, jf_s.n_zero, st)

    assert bool(np.all(np.asarray(banded['solved'])))
    np.testing.assert_allclose(np.asarray(banded['obj']),
                               np.asarray(dense['obj']),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(banded['x']),
                               np.asarray(dense['x']),
                               rtol=1e-2, atol=1e-3)


def test_compiled_banded_solver_and_routing():
    T = 48
    prob = assign_charging(charging_problem(T), T=T)
    fam = canonicalize(prob)
    solver = CompiledBandedQPSolver(fam)
    theta = _thetas(fam, prob, T, n_inst=2)
    out = solver.solve_batch(theta)
    assert bool(np.all(np.asarray(out['solved'])))

    # problem-level parity: solve via the compiled banded solver ==
    # float64 oracle objective
    from cvxpygen_tpu.solvers.oracle import solve_family_numpy
    res, _ = solve_family_numpy(fam, theta[0])
    obj_banded = float(np.asarray(out['obj'][0] + out['d'][0]))
    ref = res.obj + float(np.asarray(
        fam.d_map @ np.concatenate([theta[0], [1.0]])).ravel()[0])
    assert abs(obj_banded - ref) / max(1.0, abs(ref)) < 1e-3

    # auto-routing picks the banded solver for long horizons
    T2 = 400
    prob2 = assign_charging(charging_problem(T2), T=T2)
    fam2 = canonicalize(prob2)
    s2 = make_compiled_solver(fam2, 'OSQP')
    assert s2.solver_name == 'ADMM_BANDED'


def test_long_horizon_smoke():
    # T=720: n = 1441 -- dense batched KKT (B x n x n) would be ~8.3 MB
    # per instance; the banded path stores nb s^2 blocks only
    T = 720
    prob = assign_charging(charging_problem(T), T=T)
    fam = canonicalize(prob)
    solver = CompiledBandedQPSolver(
        fam, settings=ADMMSettings(eps_abs=1e-4, eps_rel=1e-4,
                                   max_iter=20000, check_interval=100,
                                   adaptive_rho=True))
    theta = fam.pack_theta(params=prob.parameters())
    out = solver.solve_batch(theta[None])
    assert bool(np.asarray(out['solved'][0]))
    # physics: q ends at capacity, u within box (retrieve_primal keys by
    # variable id)
    from cvxpygen_tpu.canon.canonicalizer import retrieve_primal
    prim = retrieve_primal(fam, np.asarray(out['x'][0]))
    q = prim[prob.var_dict['q'].id]
    u = prim[prob.var_dict['u'].id]
    assert abs(q[-1] - 1.0) < 1e-2
    assert np.all(u <= 0.05 + 1e-3) and np.all(u >= -0.1 - 1e-3)
