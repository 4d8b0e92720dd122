"""E2E QP: compiled batched ADMM vs float64 oracle on the reference's
QP/LP families (pattern and tolerances of reference tests/test_E2E_QP.py:
205-223 -- rel. objective gap < 0.1, rel. primal/dual L2 error < 0.1;
we additionally require much tighter objective agreement)."""
import numpy as np
import pytest

from cvxpygen_tpu.canon.canonicalizer import (
    canonicalize, retrieve_duals, retrieve_primal)
from cvxpygen_tpu.runtime.solver import CompiledQPSolver
from cvxpygen_tpu.solvers.oracle import solve_family_numpy
from problems import ALL

QP_FAMILIES = ['nonneg_LS', 'actuator', 'MPC', 'portfolio', 'network', 'resource']
N_RAND = 2


def _dual_vec(duals):
    out = []
    for dv in duals:
        if isinstance(dv, list):
            for d in dv:
                out.append(np.atleast_1d(np.asarray(d)).ravel())
        else:
            out.append(np.atleast_1d(np.asarray(dv)).ravel())
    return np.concatenate(out) if out else np.zeros(0)


@pytest.mark.parametrize('name', QP_FAMILIES)
@pytest.mark.parametrize('seed', list(range(N_RAND)))
def test_admm_vs_oracle(name, seed):
    make, assign = ALL[name]
    prob = make()
    assign(prob, seed=seed)
    fam = canonicalize(prob)
    theta = fam.pack_theta(params=prob.parameters())

    # oracle (float64 CPU reference)
    res, y = solve_family_numpy(fam, theta)
    assert res.status in ('optimal', 'optimal_inaccurate')
    tt = np.concatenate([theta, [1.0]])
    d = float(np.asarray(fam.d_map @ tt).ravel()[0])
    obj_ref = res.obj + d
    prim_ref = np.concatenate([
        res.x[vi.offset:vi.offset + vi.size] for vi in fam.user_vars])
    dual_ref = _dual_vec(retrieve_duals(fam, y))

    # compiled batched ADMM
    solver = CompiledQPSolver(fam)
    out = solver.solve_batch(theta[None, :])
    out = {k: np.asarray(v) for k, v in out.items()}
    assert bool(out['solved'][0]), f'ADMM did not converge: {out["iters"]}'
    obj_cg = float(out['obj'][0]) + d
    prim_cg = np.concatenate([
        out['x'][0][vi.offset:vi.offset + vi.size] for vi in fam.user_vars])
    dual_cg = _dual_vec(retrieve_duals(fam, out['y_canon'][0]))

    if abs(obj_ref) > 1e-9:
        assert abs(obj_cg - obj_ref) / abs(obj_ref) < 2e-2
    else:
        assert abs(obj_cg) < 1e-3
    if name == 'resource':
        # degenerate LP: optimal face is not a point, so primal iterates of
        # different algorithms legitimately differ.  Check feasibility of
        # the ADMM solution instead.
        primal = retrieve_primal(fam, out['x'][0])
        for v in prob.variables():
            val = primal[v.id]
            v.value = val.reshape(v.shape, order='F') if v.shape else float(val[0])
        for con in prob.constraints:
            assert np.max(np.atleast_1d(con.violation())) < 5e-3
        return
    pn = np.linalg.norm(prim_ref)
    if pn > 1e-6:
        assert np.linalg.norm(prim_cg - prim_ref) / pn < 0.1
    else:
        assert np.linalg.norm(prim_cg) < 1e-3
    dn = np.linalg.norm(dual_ref)
    if dn > 1e-6:
        assert np.linalg.norm(dual_cg - dual_ref) / dn < 0.1
    else:
        assert np.linalg.norm(dual_cg) < 1e-3


def test_batch_consistency():
    """vmap batch of N different instances == N single solves (a test class
    the reference lacks entirely; SURVEY.md section 4)."""
    make, assign = ALL['MPC']
    prob = make()
    fam = canonicalize(prob)
    thetas = []
    for seed in range(4):
        assign(prob, seed=seed)
        thetas.append(fam.pack_theta(params=prob.parameters()))
    T = np.stack(thetas)
    solver = CompiledQPSolver(fam)
    batch = solver.solve_batch(T)
    batch = {k: np.asarray(v) for k, v in batch.items()}
    for i in range(4):
        single = solver.solve_batch(T[i][None, :])
        np.testing.assert_allclose(np.asarray(single['x'])[0],
                                   batch['x'][i], rtol=1e-6, atol=1e-8)


def test_solve_into_problem():
    make, assign = ALL['nonneg_LS']
    prob = make()
    assign(prob)
    obj_oracle = prob.solve()
    x_oracle = prob.var_dict['x'].value.copy()
    fam = canonicalize(prob)
    solver = CompiledQPSolver(fam)
    obj_admm = solver.solve_into_problem(prob)
    assert prob.solver_stats.solver_name == 'ADMM'
    assert abs(obj_admm - obj_oracle) < 1e-3 * max(1, abs(obj_oracle))
    np.testing.assert_allclose(prob.var_dict['x'].value, x_oracle, atol=1e-2)


def test_warm_start_fewer_iters():
    make, assign = ALL['MPC']
    prob = make()
    assign(prob, seed=0)
    fam = canonicalize(prob)
    solver = CompiledQPSolver(fam)
    theta = fam.pack_theta(params=prob.parameters())[None, :]
    cold = solver.solve_batch(theta)
    import jax.numpy as jnp
    warm = solver.solve_batch(theta, x0=cold['x'], y0=cold['y'])
    assert int(np.asarray(warm['iters'])[0]) <= int(np.asarray(cold['iters'])[0])
