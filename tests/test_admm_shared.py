"""Shared-KKT ADMM (solvers/admm_shared.py + ops/admm_shared_kernel.py)
vs the per-instance dense path (solvers/admm.py).

The shared path is the batched analogue of the reference's vector-only
parameter updates, where the factorization is never redone (reference
cvxpygen/solvers/osqp.py:20-61 update table, cases q/l/u/qlu...).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from cvxpygen_tpu.solvers.admm import ADMMSettings, admm_solve
from cvxpygen_tpu.solvers.admm_shared import admm_solve_shared


def _shared_qp_batch(B=16, n=12, m=18, n_eq=3, seed=0):
    """One (P, A) pair; B instances differing in q, l, u."""
    rng = np.random.default_rng(seed)
    F = rng.standard_normal((n, n)) / np.sqrt(n)
    P = F @ F.T + 0.1 * np.eye(n)
    A = rng.standard_normal((m, n)) / np.sqrt(n)
    q = rng.standard_normal((B, n))
    x_feas = rng.standard_normal((B, n))
    Ax = x_feas @ A.T
    l = Ax - np.abs(rng.standard_normal((B, m))) - 0.1
    u = Ax + np.abs(rng.standard_normal((B, m))) + 0.1
    l[:, :n_eq] = u[:, :n_eq] = Ax[:, :n_eq]
    u[:, n_eq:n_eq + 2] = 1e30
    l[:, n_eq + 2:n_eq + 4] = -1e30
    return (jnp.asarray(P, jnp.float64), jnp.asarray(q, jnp.float64),
            jnp.asarray(A, jnp.float64), jnp.asarray(l, jnp.float64),
            jnp.asarray(u, jnp.float64)), n_eq


def _dense_ref(P, q, A, l, u, n_eq, **kw):
    B = q.shape[0]
    Pb = jnp.broadcast_to(P, (B,) + P.shape)
    Ab = jnp.broadcast_to(A, (B,) + A.shape)
    st = ADMMSettings(eps_abs=1e-6, eps_rel=1e-6, max_iter=8000,
                      kkt_solver='inv', use_pallas='never', **kw)
    return admm_solve(Pb, q, Ab, l, u, n_eq, st)


@pytest.mark.parametrize('adaptive', [False, True])
@pytest.mark.parametrize('kkt', ['inv', 'ns', 'chol'])
def test_shared_matches_per_instance(adaptive, kkt):
    (P, q, A, l, u), n_eq = _shared_qp_batch()
    ref = _dense_ref(P, q, A, l, u, n_eq)
    st = ADMMSettings(eps_abs=1e-6, eps_rel=1e-6, max_iter=8000,
                      kkt_solver=kkt, ns_iters=40, use_pallas='never',
                      adaptive_rho=adaptive)
    out = admm_solve_shared(P, q, A, l, u, n_eq, st)
    assert np.all(np.asarray(out['solved']))
    np.testing.assert_allclose(np.asarray(out['x']), np.asarray(ref['x']),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out['obj']),
                               np.asarray(ref['obj']), rtol=1e-4, atol=1e-5)


def test_shared_warm_start_fewer_iters():
    (P, q, A, l, u), n_eq = _shared_qp_batch(seed=2)
    st = ADMMSettings(eps_abs=1e-6, eps_rel=1e-6, max_iter=8000,
                      kkt_solver='inv', use_pallas='never')
    cold = admm_solve_shared(P, q, A, l, u, n_eq, st)
    warm = admm_solve_shared(P, q, A, l, u, n_eq, st,
                             x0=cold['x'], y0=cold['y'])
    assert np.all(np.asarray(warm['solved']))
    assert (np.asarray(warm['iters']).mean()
            < np.asarray(cold['iters']).mean())
    np.testing.assert_allclose(np.asarray(warm['x']), np.asarray(cold['x']),
                               rtol=0, atol=5e-4)


def test_shared_primal_infeasible():
    # x >= 1 and x <= -1 simultaneously -> primal infeasible
    n, m, B = 2, 4, 3
    P = jnp.eye(n, dtype=jnp.float64)
    A = jnp.asarray(np.vstack([np.eye(n), np.eye(n)]), jnp.float64)
    q = jnp.zeros((B, n), jnp.float64)
    l = jnp.tile(jnp.asarray([1.0, 1.0, -1e30, -1e30]), (B, 1))
    u = jnp.tile(jnp.asarray([1e30, 1e30, -1.0, -1.0]), (B, 1))
    st = ADMMSettings(max_iter=4000, kkt_solver='inv', use_pallas='never')
    out = admm_solve_shared(P, q, A, l, u, 0, st)
    assert np.all(np.asarray(out['status']) == -3)
    assert np.all(np.isinf(np.asarray(out['obj'])))


def test_shared_dual_infeasible():
    # min -x s.t. x >= 0 -> unbounded below (dual infeasible)
    n, m, B = 1, 1, 2
    P = jnp.zeros((n, n), jnp.float64)
    A = jnp.ones((m, n), jnp.float64)
    q = jnp.full((B, n), -1.0, jnp.float64)
    l = jnp.zeros((B, m), jnp.float64)
    u = jnp.full((B, m), 1e30, jnp.float64)
    st = ADMMSettings(max_iter=4000, kkt_solver='inv', use_pallas='never')
    out = admm_solve_shared(P, q, A, l, u, 0, st)
    assert np.all(np.asarray(out['status']) == -4)


@pytest.mark.parametrize('adaptive', [False, True])
def test_shared_pallas_kernel_matches(adaptive):
    """ops/admm_shared_kernel.py (interpret mode) vs the shared XLA path."""
    (P, q, A, l, u), n_eq = _shared_qp_batch(B=16, seed=1)
    P, q, A, l, u = (v.astype(jnp.float32) for v in (P, q, A, l, u))
    base = ADMMSettings(eps_abs=1e-4, eps_rel=1e-4, max_iter=2000,
                        check_interval=20, kkt_solver='ns', ns_iters=40,
                        adaptive_rho=adaptive, use_pallas='never')
    ref = admm_solve_shared(P, q, A, l, u, n_eq, base)
    st = ADMMSettings(eps_abs=1e-4, eps_rel=1e-4, max_iter=2000,
                      check_interval=20, kkt_solver='ns', ns_iters=40,
                      adaptive_rho=adaptive, use_pallas='full_interpret')
    out = admm_solve_shared(P, q, A, l, u, n_eq, st)
    assert np.all(np.asarray(out['solved']))
    np.testing.assert_allclose(np.asarray(out['x']), np.asarray(ref['x']),
                               rtol=0, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out['obj']),
                               np.asarray(ref['obj']), rtol=1e-3, atol=1e-3)


def test_shared_pallas_warm_start():
    (P, q, A, l, u), n_eq = _shared_qp_batch(B=8, seed=3)
    P, q, A, l, u = (v.astype(jnp.float32) for v in (P, q, A, l, u))
    st = ADMMSettings(eps_abs=1e-4, eps_rel=1e-4, max_iter=2000,
                      check_interval=10, kkt_solver='ns', ns_iters=40,
                      use_pallas='full_interpret')
    cold = admm_solve_shared(P, q, A, l, u, n_eq, st)
    warm = admm_solve_shared(P, q, A, l, u, n_eq, st,
                             x0=cold['x'], y0=cold['y'])
    assert np.all(np.asarray(warm['solved']))
    assert (np.asarray(warm['iters']).mean()
            <= np.asarray(cold['iters']).mean())


def test_solver_auto_detects_shared_batch():
    """CompiledQPSolver routes a vector-params-only batch through the
    shared path and matches the per-instance path."""
    import cvxpygen_tpu  # noqa: F401
    from problems import MPC_problem, assign_MPC
    from cvxpygen_tpu.canon.canonicalizer import canonicalize
    from cvxpygen_tpu.runtime.solver import CompiledQPSolver

    prob = MPC_problem(H=3)
    assign_MPC(prob, seed=0)
    fam = canonicalize(prob)
    solver = CompiledQPSolver(fam, settings=ADMMSettings(
        eps_abs=1e-6, eps_rel=1e-6, max_iter=8000, kkt_solver='inv',
        use_pallas='never'))
    # batch varying ONLY x_init -> shared-eligible
    rng = np.random.default_rng(0)
    thetas = []
    for _ in range(5):
        prob.param_dict['x_init'].value = rng.uniform(-2, 2, 6)
        thetas.append(fam.pack_theta(params=prob.parameters()))
    theta = np.stack(thetas)
    assert solver._use_shared(theta, 'auto')
    out_shared = solver.solve_batch(theta)
    out_dense = solver.solve_batch(theta, shared_PA=False)
    np.testing.assert_allclose(np.asarray(out_shared['x']),
                               np.asarray(out_dense['x']),
                               rtol=0, atol=2e-4)
    # batch varying the dynamics matrix -> NOT shared-eligible
    theta2 = theta.copy()
    pa_cols = np.where(solver._pa_mask)[0]
    theta2[0, pa_cols[0]] += 0.1
    assert not solver._use_shared(theta2, 'auto')


def test_canon_batch_shared_scatter_mode():
    """canon_batch_shared must agree with canon_batch in BOTH map layouts
    (dense GEMM and scatter for large families)."""
    import jax.numpy as jnp
    from problems import MPC_problem, assign_MPC
    from cvxpygen_tpu.canon.canonicalizer import canonicalize
    from cvxpygen_tpu.runtime.jax_family import (JaxFamily, canon_batch,
                                                 canon_batch_shared)
    prob = assign_MPC(MPC_problem(H=3), seed=0)
    fam = canonicalize(prob)
    rng = np.random.default_rng(3)
    base = fam.pack_theta(params=prob.parameters())
    xi = [pi for pi in fam.param_info if pi.name == 'x_init'][0]
    theta = np.tile(base, (4, 1))
    theta[:, xi.offset:xi.offset + xi.flat_size] = rng.uniform(-1, 1, (4, 6))
    theta = jnp.asarray(theta)
    for force_scatter in (False, True):
        jf = JaxFamily.from_family(fam, force_scatter=force_scatter)
        full = canon_batch(jf, theta)
        shared = canon_batch_shared(jf, theta)
        np.testing.assert_allclose(np.asarray(shared['P']),
                                   np.asarray(full['P'][0]), atol=1e-12)
        np.testing.assert_allclose(np.asarray(shared['A']),
                                   np.asarray(full['A'][0]), atol=1e-12)
        np.testing.assert_allclose(np.asarray(shared['q']),
                                   np.asarray(full['q']), atol=1e-12)
        np.testing.assert_allclose(np.asarray(shared['b']),
                                   np.asarray(full['b']), atol=1e-12)
        np.testing.assert_allclose(np.asarray(shared['d']),
                                   np.asarray(full['d']), atol=1e-12)
