"""Full-solve Pallas kernel (ops/admm_full_kernel.py) vs the XLA ADMM path.

Interpret mode on CPU; the same code compiles on TPU (bench.py BENCH_FULL=1).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cvxpygen_tpu.solvers.admm import ADMMSettings, admm_solve


def _random_qp_batch(B=8, n=12, m=16, n_eq=3, seed=0):
    rng = np.random.default_rng(seed)
    F = rng.standard_normal((B, n, n)) / np.sqrt(n)
    P = F @ np.swapaxes(F, 1, 2) + 0.1 * np.eye(n)
    q = rng.standard_normal((B, n))
    A = rng.standard_normal((B, m, n)) / np.sqrt(n)
    x_feas = rng.standard_normal((B, n))
    Ax = np.einsum('bij,bj->bi', A, x_feas)
    l = Ax - np.abs(rng.standard_normal((B, m))) - 0.1
    u = Ax + np.abs(rng.standard_normal((B, m))) + 0.1
    l[:, :n_eq] = u[:, :n_eq] = Ax[:, :n_eq]
    # a few one-sided rows (inf bounds)
    u[:, n_eq:n_eq + 2] = 1e30
    l[:, n_eq + 2:n_eq + 4] = -1e30
    arrs = (P, q, A, l, u)
    return tuple(jnp.asarray(v, jnp.float32) for v in arrs), n_eq


@pytest.mark.parametrize('adaptive', [False, True])
def test_full_kernel_matches_xla_path(adaptive):
    (P, q, A, l, u), n_eq = _random_qp_batch()
    base = ADMMSettings(eps_abs=1e-4, eps_rel=1e-4, max_iter=2000,
                        check_interval=20, kkt_solver='ns', ns_iters=40,
                        adaptive_rho=adaptive, use_pallas='never')
    ref = admm_solve(P, q, A, l, u, n_eq, base)
    st = ADMMSettings(eps_abs=1e-4, eps_rel=1e-4, max_iter=2000,
                      check_interval=20, ns_iters=40,
                      adaptive_rho=adaptive, use_pallas='full_interpret')
    out = admm_solve(P, q, A, l, u, n_eq, st)
    assert np.all(np.asarray(out['solved']))
    np.testing.assert_allclose(np.asarray(out['x']), np.asarray(ref['x']),
                               rtol=0, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out['obj']),
                               np.asarray(ref['obj']), rtol=1e-3, atol=1e-3)


def test_full_kernel_adapt_until():
    """rho adaptation cutoff still converges (refactors only early)."""
    (P, q, A, l, u), n_eq = _random_qp_batch(seed=4)
    st = ADMMSettings(eps_abs=1e-4, eps_rel=1e-4, max_iter=2000,
                      check_interval=20, ns_iters=40, adaptive_rho=True,
                      adaptive_rho_until=60, use_pallas='full_interpret')
    out = admm_solve(P, q, A, l, u, n_eq, st)
    assert np.all(np.asarray(out['solved']))


def test_full_kernel_infeasible_detection():
    (P, q, A, l, u), n_eq = _random_qp_batch(B=8, seed=1)
    # make instance 0 primal infeasible: contradictory rows a'x <= -1, a'x >= 1
    A = A.at[0, 4].set(A[0, 5])
    l = l.at[0, 4].set(-1e30)
    u = u.at[0, 4].set(-1.0)
    l = l.at[0, 5].set(1.0)
    u = u.at[0, 5].set(1e30)
    st = ADMMSettings(eps_abs=1e-4, eps_rel=1e-4, max_iter=2000,
                      check_interval=20, ns_iters=40,
                      use_pallas='full_interpret')
    out = admm_solve(P, q, A, l, u, n_eq, st)
    status = np.asarray(out['status'])
    assert status[0] == -3
    assert np.all(status[1:] == 1)
    assert np.isinf(np.asarray(out['obj'])[0])


def test_full_kernel_warm_start():
    (P, q, A, l, u), n_eq = _random_qp_batch(seed=2)
    st = ADMMSettings(eps_abs=1e-4, eps_rel=1e-4, max_iter=2000,
                      check_interval=10, ns_iters=40,
                      use_pallas='full_interpret')
    cold = admm_solve(P, q, A, l, u, n_eq, st)
    warm = admm_solve(P, q, A, l, u, n_eq, st,
                      x0=cold['x'], y0=cold['y'])
    assert np.all(np.asarray(warm['solved']))
    assert np.asarray(warm['iters']).mean() <= \
        np.asarray(cold['iters']).mean()
