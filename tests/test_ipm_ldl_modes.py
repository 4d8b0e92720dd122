"""'ldl' KKT mode of the conic IPM: full-K vs two-level fixed-Schur.

The 'ldl' mode is the TPU default for exotic and P=0 layouts
(solvers/ipm.py kkt policy) but CPU 'auto' routes to 'lu', so these
tests pin kkt_solver='ldl' explicitly.  The two-level path
(IPMSettings.ldl_two_level) factors the loop-invariant (n+mz) saddle
block once per solve and per-iteration only the (mc, mc) Schur
complement S = H + C'Ktop^{-1}C -- eliminating the well-conditioned
block FIRST so cond(S) ~ cond(H) (the reference-grade requirement the
round-2 H-first condensation violated; see BENCH.md).  Both variants
must agree with the batched-LU reference solve on mixed cone layouts.
"""
import numpy as np

import jax.numpy as jnp

from cvxpygen_tpu.solvers.ipm import IPMSettings, ipm_solve


def _random_feasible(rng, B, n, mz, l_nonneg, socs, n_exp):
    mc = l_nonneg + sum(socs) + 3 * n_exp
    P = rng.normal(size=(B, n, n))
    P = P @ np.swapaxes(P, 1, 2) * 0.1
    E = rng.normal(size=(B, mz, n))
    G = rng.normal(size=(B, mc, n))
    x_true = rng.normal(size=(B, n))
    f = -np.einsum('bij,bj->bi', E, x_true)
    parts = [np.ones((B, l_nonneg))]
    for d in socs:
        s = np.full((B, d), 0.5)
        s[:, 0] = 2.0
        parts.append(s)
    if n_exp:
        parts.append(np.tile([1.0, 1.0, 3.0] * n_exp, (B, 1)))
    s0 = np.concatenate(parts, axis=1)
    h = s0 - np.einsum('bij,bj->bi', G, x_true)
    q = rng.normal(size=(B, n))
    return P, q, E, f, G, h


def _solve(dat, cone, **stg):
    J = jnp.asarray
    P, q, E, f, G, h = dat
    return ipm_solve(J(P), J(q), J(E), J(f), J(G), J(h),
                     settings=IPMSettings(**stg), **cone)


def test_ldl_modes_match_lu_mixed_cones():
    """nonneg + SOC + exp layout: both 'ldl' variants == 'lu' to 1e-5."""
    rng = np.random.default_rng(0)
    cone = dict(l_nonneg=4, socs=(3,), n_exp=2)
    dat = _random_feasible(rng, B=8, n=10, mz=3, **cone)
    tols = dict(tol_feas=1e-8, tol_gap=1e-8, max_iter=60)
    lu = _solve(dat, cone, kkt_solver='lu', **tols)
    two = _solve(dat, cone, kkt_solver='ldl', ldl_two_level=True, **tols)
    full = _solve(dat, cone, kkt_solver='ldl', ldl_two_level=False, **tols)
    assert np.asarray(lu['solved']).all()
    assert np.asarray(two['solved']).all()
    assert np.asarray(full['solved']).all()
    np.testing.assert_allclose(np.asarray(two['obj']),
                               np.asarray(lu['obj']), atol=1e-5)
    np.testing.assert_allclose(np.asarray(full['obj']),
                               np.asarray(lu['obj']), atol=1e-5)
    np.testing.assert_allclose(np.asarray(two['x']),
                               np.asarray(lu['x']), atol=1e-4)


def test_ldl_two_level_no_equalities():
    """mz = 0 exercises the empty-nu slicing in the two-level solve."""
    rng = np.random.default_rng(1)
    cone = dict(l_nonneg=5, socs=(4,), n_exp=0)
    dat = _random_feasible(rng, B=6, n=8, mz=0, **cone)
    tols = dict(tol_feas=1e-9, tol_gap=1e-9, max_iter=60)
    lu = _solve(dat, cone, kkt_solver='lu', **tols)
    two = _solve(dat, cone, kkt_solver='ldl', ldl_two_level=True, **tols)
    assert np.asarray(lu['solved']).all()
    assert np.asarray(two['solved']).all()
    np.testing.assert_allclose(np.asarray(two['obj']),
                               np.asarray(lu['obj']), atol=1e-6)


def test_ldl_two_level_p_zero_entropy_like():
    """P = 0 exp-cone layout (the entropy family shape): statuses and
    objectives agree across the three KKT modes in f64."""
    rng = np.random.default_rng(2)
    cone = dict(l_nonneg=0, socs=(), n_exp=4)
    B, n, mz = 8, 9, 2
    mc = 12
    P = np.zeros((B, n, n))
    E = rng.normal(size=(B, mz, n))
    G = rng.normal(size=(B, mc, n))
    x_true = rng.normal(size=(B, n))
    f = -np.einsum('bij,bj->bi', E, x_true)
    s0 = np.tile([1.0, 1.0, 3.0] * 4, (B, 1))
    h = s0 - np.einsum('bij,bj->bi', G, x_true)
    q = rng.normal(size=(B, n))
    dat = (P, q, E, f, G, h)
    tols = dict(tol_feas=1e-8, tol_gap=1e-8, max_iter=60)
    lu = _solve(dat, cone, kkt_solver='lu', **tols)
    two = _solve(dat, cone, kkt_solver='ldl', ldl_two_level=True, **tols)
    full = _solve(dat, cone, kkt_solver='ldl', ldl_two_level=False, **tols)
    ok = np.asarray(lu['solved'])
    # P = 0 with few cone rows leaves many random instances unbounded;
    # the parity claim only needs a non-trivial solved subset
    assert ok.sum() >= 2
    np.testing.assert_allclose(np.asarray(two['obj'])[ok],
                               np.asarray(lu['obj'])[ok], atol=1e-5)
    np.testing.assert_allclose(np.asarray(full['obj'])[ok],
                               np.asarray(lu['obj'])[ok], atol=1e-5)
