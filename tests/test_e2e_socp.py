"""E2E SOCP/conic: compiled batched IPM vs float64 oracle (pattern of
reference tests/test_E2E_SOCP.py with our solvers)."""
import numpy as np
import pytest

from cvxpygen_tpu.canon.canonicalizer import canonicalize, retrieve_duals
from cvxpygen_tpu.runtime.solver import CompiledConicSolver, make_compiled_solver
from cvxpygen_tpu.solvers.oracle import solve_family_numpy
from problems import ALL, ADP_problem, assign_ADP


def _dual_vec(duals):
    out = []
    for dv in duals:
        if isinstance(dv, list):
            for d in dv:
                out.append(np.atleast_1d(np.asarray(d)).ravel())
        else:
            out.append(np.atleast_1d(np.asarray(dv)).ravel())
    return np.concatenate(out) if out else np.zeros(0)


@pytest.mark.parametrize('use_soc_class', [False, True])
def test_adp_ipm_vs_oracle(use_soc_class):
    prob = ADP_problem(use_soc_class=use_soc_class)
    assign_ADP(prob)
    fam = canonicalize(prob)
    assert fam.soc_dims, 'ADP should lower to SOC cones'
    theta = fam.pack_theta(params=prob.parameters())

    res, y = solve_family_numpy(fam, theta)
    assert res.status == 'optimal'
    tt = np.concatenate([theta, [1.0]])
    d = float(np.asarray(fam.d_map @ tt).ravel()[0])

    solver = CompiledConicSolver(fam)
    out = solver.solve_batch(theta[None, :])
    out = {k: np.asarray(v) for k, v in out.items()}
    assert bool(out['solved'][0]), f'IPM not converged: gap={out["gap"]}, rp={out["res_primal"]}, rd={out["res_dual"]}'

    obj_ref, obj_cg = res.obj + d, float(out['obj'][0] + d)
    assert abs(obj_cg - obj_ref) / max(1.0, abs(obj_ref)) < 1e-5

    prim_ref = np.concatenate([res.x[vi.offset:vi.offset + vi.size]
                               for vi in fam.user_vars])
    prim_cg = np.concatenate([out['x'][0][vi.offset:vi.offset + vi.size]
                              for vi in fam.user_vars])
    np.testing.assert_allclose(prim_cg, prim_ref, atol=1e-5)

    dual_ref = _dual_vec(retrieve_duals(fam, y))
    dual_cg = _dual_vec(retrieve_duals(fam, out['y_canon'][0]))
    np.testing.assert_allclose(dual_cg, dual_ref, atol=1e-4)


@pytest.mark.parametrize('name', ['nonneg_LS', 'network', 'MPC'])
def test_ipm_on_qp_families(name):
    """The conic IPM must also handle pure QP/LP families (reference lets
    SCS/Clarabel solve the QP tests, test_E2E_QP.py:179)."""
    make, assign = ALL[name]
    prob = make()
    assign(prob)
    fam = canonicalize(prob)
    theta = fam.pack_theta(params=prob.parameters())
    res, _ = solve_family_numpy(fam, theta)
    solver = make_compiled_solver(fam, 'CLARABEL')
    out = solver.solve_batch(theta[None, :])
    out = {k: np.asarray(v) for k, v in out.items()}
    assert bool(out['solved'][0])
    assert abs(float(out['obj'][0]) - res.obj) / max(1.0, abs(res.obj)) < 1e-5


def test_ipm_batch_consistency():
    prob = ADP_problem()
    fam = canonicalize(prob)
    thetas = []
    for seed in range(3):
        assign_ADP(prob, seed=seed)
        thetas.append(fam.pack_theta(params=prob.parameters()))
    T = np.stack(thetas)
    solver = CompiledConicSolver(fam)
    batch = {k: np.asarray(v) for k, v in solver.solve_batch(T).items()}
    for i in range(3):
        single = {k: np.asarray(v) for k, v in
                  solver.solve_batch(T[i][None, :]).items()}
        np.testing.assert_allclose(single['x'][0], batch['x'][i],
                                   rtol=1e-5, atol=1e-7)
