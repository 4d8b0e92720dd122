"""Shared-KKT conic ADMM (solvers/conic_admm_shared.py) vs the
per-instance conic path -- the batched analogue of SCS keeping its
factorization when only b/c change (reference scs.py:24-45)."""
import numpy as np
import pytest

import jax.numpy as jnp

from cvxpygen_tpu.ops.cones import ConeLayout
from cvxpygen_tpu.solvers.conic_admm import (ConicADMMSettings,
                                             conic_admm_solve)
from cvxpygen_tpu.solvers.conic_admm_shared import conic_admm_solve_shared


def _shared_conic_batch(B=12, n=10, n_zero=3, l=5, soc=4, seed=0):
    """One (P, A); B instances differing in q, b.  Rows: zero | nonneg |
    SOC, strictly feasible by construction."""
    rng = np.random.default_rng(seed)
    F = rng.standard_normal((n, n)) / np.sqrt(n)
    P = F @ F.T + 0.1 * np.eye(n)
    m = n_zero + l + soc
    A = rng.standard_normal((m, n)) / np.sqrt(n)
    q = rng.standard_normal((B, n))
    x0 = rng.standard_normal((B, n))
    s0 = np.zeros((B, m))
    s0[:, n_zero:n_zero + l] = np.abs(rng.standard_normal((B, l))) + 0.1
    s0[:, n_zero + l] = 2.0 + np.abs(rng.standard_normal(B))
    s0[:, n_zero + l + 1:] = 0.3 * rng.standard_normal((B, soc - 1))
    # aff = A x + b must land in {0} x R+^l x SOC at x0
    b = s0 - x0 @ A.T
    layout = ConeLayout(n_nonneg=l, socs=(soc,))
    return (jnp.asarray(P), jnp.asarray(q), jnp.asarray(A),
            jnp.asarray(b)), n_zero, layout


@pytest.mark.parametrize('adaptive', [False, True])
def test_conic_shared_matches_per_instance(adaptive):
    (P, q, A, b), nz, layout = _shared_conic_batch()
    B = q.shape[0]
    st = ConicADMMSettings(eps_abs=1e-7, eps_rel=1e-7, max_iter=20000,
                           kkt_solver='inv', adaptive_rho=adaptive)
    ref = conic_admm_solve(jnp.broadcast_to(P, (B,) + P.shape), q,
                           jnp.broadcast_to(A, (B,) + A.shape), b,
                           nz, layout, st)
    out = conic_admm_solve_shared(P, q, A, b, nz, layout, st)
    assert np.all(np.asarray(out['solved']))
    np.testing.assert_allclose(np.asarray(out['x']), np.asarray(ref['x']),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out['obj']),
                               np.asarray(ref['obj']), rtol=1e-5,
                               atol=1e-6)


def test_conic_shared_warm_start():
    (P, q, A, b), nz, layout = _shared_conic_batch(seed=2)
    st = ConicADMMSettings(eps_abs=1e-7, eps_rel=1e-7, max_iter=20000,
                           kkt_solver='inv')
    cold = conic_admm_solve_shared(P, q, A, b, nz, layout, st)
    warm = conic_admm_solve_shared(P, q, A, b, nz, layout, st,
                                   x0=cold['x'], y0=cold['y'])
    assert np.all(np.asarray(warm['solved']))
    assert (np.asarray(warm['iters']).mean()
            <= np.asarray(cold['iters']).mean())


def test_conic_shared_primal_infeasible():
    # nonneg rows force x >= 1 and -x >= 1 simultaneously
    n, B = 2, 3
    P = jnp.zeros((n, n)).at[0, 0].set(1.0).at[1, 1].set(1.0)
    A = jnp.asarray(np.vstack([np.eye(n), -np.eye(n)]))
    q = jnp.zeros((B, n))
    b = jnp.tile(jnp.asarray([-1.0, -1.0, -1.0, -1.0]), (B, 1))
    layout = ConeLayout(n_nonneg=4)
    st = ConicADMMSettings(max_iter=20000, kkt_solver='inv')
    out = conic_admm_solve_shared(P, q, A, b, 0, layout, st)
    assert np.all(np.asarray(out['status']) == -3), \
        np.asarray(out['status'])


def test_solver_auto_detects_shared_socp_batch():
    """CompiledConicADMMSolver routes an ADP batch varying only the f
    parameter (G fixed) through the shared path; results match."""
    from problems import ADP_problem, assign_ADP
    from cvxpygen_tpu.canon.canonicalizer import canonicalize
    from cvxpygen_tpu.runtime.solver import CompiledConicADMMSolver

    prob = assign_ADP(ADP_problem())
    fam = canonicalize(prob)
    solver = CompiledConicADMMSolver(fam, settings=ConicADMMSettings(
        eps_abs=1e-7, eps_rel=1e-7, max_iter=20000, kkt_solver='inv'))
    rng = np.random.default_rng(0)
    base = fam.pack_theta(params=prob.parameters())
    fi = [pi for pi in fam.param_info if pi.name == 'f'][0]
    theta = np.tile(base, (6, 1))
    theta[:, fi.offset:fi.offset + fi.flat_size] *= rng.uniform(
        0.5, 1.5, (6, fi.flat_size))
    from cvxpygen_tpu.runtime.solver import use_shared_path
    assert use_shared_path(solver._pa_mask, theta, 'auto')
    out_s = {k: np.asarray(v) for k, v in
             solver.solve_batch(theta).items()}
    out_d = {k: np.asarray(v) for k, v in
             solver.solve_batch(theta, shared_PA=False).items()}
    assert np.all(out_s['solved'])
    np.testing.assert_allclose(out_s['obj'], out_d['obj'], rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(out_s['x'], out_d['x'], rtol=1e-4,
                               atol=1e-5)
