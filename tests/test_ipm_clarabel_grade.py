"""Clarabel-grade IPM features (VERDICT r1 item 3): Ruiz equilibration,
primal/dual infeasibility statuses, per-instance iteration counts, and the
TPU-native Schur-complement KKT mode.

Status codes mirror the reference's surfaced solver statuses
(reference cvxpygen/utils.py:977-985: optimal / infeasible / unbounded)."""
import numpy as np
import pytest

import jax.numpy as jnp

import cvxpygen_tpu as ct
from cvxpygen_tpu import cpg
from cvxpygen_tpu.solvers.ipm import IPMSettings, ipm_solve


def _socp_batch(B=4, n=6, mz=2, l=4, soc=4, seed=0):
    """min 0.5||x||^2 + q'x s.t. Ex+f=0, Gx+h in R+^l x SOC(soc).

    Constructed strictly feasible: h = s0 - G x0 with s0 interior of K
    (random h can produce genuinely infeasible instances, which belong in
    the infeasibility tests, not here)."""
    rng = np.random.default_rng(seed)
    P = np.tile(np.eye(n), (B, 1, 1))
    q = rng.standard_normal((B, n))
    E = np.tile(rng.standard_normal((mz, n)), (B, 1, 1))
    x0 = rng.standard_normal((B, n))
    f = -np.einsum('bij,bj->bi', E, x0)
    G = np.tile(rng.standard_normal((l + soc, n)), (B, 1, 1))
    s0 = np.abs(rng.standard_normal((B, l + soc))) + 0.1
    s0[:, l] = np.linalg.norm(s0[:, l + 1:], axis=1) + 1.0
    h = s0 - np.einsum('bij,bj->bi', G, x0)
    arrs = (P, q, E, f, G, h)
    return tuple(jnp.asarray(a) for a in arrs), l, (soc,)


def test_equilibration_badly_scaled():
    """A badly row/column-scaled SOCP converges with Ruiz on."""
    (P, q, E, f, G, h), l, socs = _socp_batch()
    # scale rows/cols by 1e3 factors; SOC rows share one scale (non-uniform
    # SOC row scaling would change the problem, not re-scale it)
    rs = np.geomspace(1e-3, 1e3, G.shape[1])
    rs[l:] = rs[l]
    rs = jnp.asarray(rs)
    cs = jnp.asarray(np.geomspace(1e-2, 1e2, P.shape[1]))
    P2 = cs[None, :, None] * P * cs[None, None, :]
    q2 = q * cs
    E2 = E * cs[None, None, :]
    G2 = rs[None, :, None] * G * cs[None, None, :]
    h2 = rs * h
    out = ipm_solve(P2, q2, E2, f, G2, h2, l, socs,
                    IPMSettings(scaling=10))
    assert np.all(np.asarray(out['solved']))
    # solution maps back to the unscaled problem's (x = cs * x_scaled)
    ref = ipm_solve(P, q, E, f, G, h, l, socs, IPMSettings(scaling=10))
    np.testing.assert_allclose(np.asarray(out['x']) * np.asarray(cs),
                               np.asarray(ref['x']), rtol=1e-4, atol=1e-5)


def test_per_instance_iteration_counts():
    (P, q, E, f, G, h), l, socs = _socp_batch(B=6, seed=3)
    # make instance 0 trivial (q = 0 -> x = 0 nearly feasible center)
    q = q.at[0].set(0.0)
    out = ipm_solve(P, q, E, f, G, h, l, socs, IPMSettings())
    iters = np.asarray(out['iters'])
    assert np.all(np.asarray(out['solved']))
    # per-instance counts: not all identical (the old engine returned a
    # batch-uniform fill)
    assert iters.min() >= 1
    assert iters.min() < iters.max()


@pytest.mark.parametrize('mode', ['lu', 'schur'])
def test_schur_mode_matches_lu(mode):
    (P, q, E, f, G, h), l, socs = _socp_batch(B=4, seed=1)
    out = ipm_solve(P, q, E, f, G, h, l, socs,
                    IPMSettings(kkt_solver=mode, ns_iters=40,
                                refine_steps=2))
    assert np.all(np.asarray(out['solved'])), np.asarray(out['status'])
    ref = ipm_solve(P, q, E, f, G, h, l, socs, IPMSettings(kkt_solver='lu'))
    np.testing.assert_allclose(np.asarray(out['x']), np.asarray(ref['x']),
                               rtol=1e-5, atol=1e-6)


def test_ipm_primal_infeasible_status():
    # x >= 1, x <= -1 (via nonneg rows: x - 1 >= 0 and -x - 1 >= 0)
    B, n = 3, 2
    P = jnp.zeros((B, n, n)).at[:, 0, 0].set(1.0).at[:, 1, 1].set(1.0)
    q = jnp.zeros((B, n))
    E = jnp.zeros((B, 0, n))
    f = jnp.zeros((B, 0))
    G = jnp.tile(jnp.concatenate([jnp.eye(n), -jnp.eye(n)], 0), (B, 1, 1))
    h = jnp.tile(jnp.asarray([-1.0, -1.0, -1.0, -1.0]), (B, 1))
    out = ipm_solve(P, q, E, f, G, h, 2 * n, (), IPMSettings(max_iter=60))
    assert np.all(np.asarray(out['status']) == -3), np.asarray(out['status'])
    assert np.all(np.isinf(np.asarray(out['obj'])))


def test_ipm_dual_infeasible_status():
    # min -x s.t. x >= 0 : unbounded below
    B, n = 2, 1
    P = jnp.zeros((B, n, n))
    q = jnp.full((B, n), -1.0)
    E = jnp.zeros((B, 0, n))
    f = jnp.zeros((B, 0))
    G = jnp.ones((B, 1, n))
    h = jnp.zeros((B, 1))
    out = ipm_solve(P, q, E, f, G, h, 1, (), IPMSettings(max_iter=60))
    assert np.all(np.asarray(out['status']) == -4), np.asarray(out['status'])
    assert np.all(np.asarray(out['obj']) == -np.inf)


def test_ipm_infeasible_socp_through_cpg(tmp_path):
    """End-to-end: infeasible SOCP family surfaces status 'infeasible'
    through problem.solve(method='CPG') with a conic solver."""
    x = ct.Variable(2, name='x')
    t = ct.Parameter(name='t')
    t.value = 0.5
    # ||x|| <= t and x[0] >= t + 1 : infeasible for t = 0.5
    prob = ct.Problem(ct.Minimize(ct.sum_squares(x)),
                      [ct.norm(x, 2) <= t, x[0] >= t + 1])
    cpg.generate_code(prob, code_dir=str(tmp_path / 'soc_inf'),
                      solver='CLARABEL')
    val = prob.solve(method='CPG', max_iter=60)
    assert prob.status == 'infeasible'
    assert val == np.inf


def test_f32_settings_reachable():
    """f32 data + for_dtype defaults converge (the r1 defaults of 1e-8
    were unreachable in f32)."""
    (P, q, E, f, G, h), l, socs = _socp_batch(B=4, seed=2)
    arrs = tuple(a.astype(jnp.float32) for a in (P, q, E, f, G, h))
    st = IPMSettings.for_dtype(jnp.float32)
    out = ipm_solve(*arrs, l, socs, st)
    assert np.all(np.asarray(out['solved'])), (
        np.asarray(out['status']), np.asarray(out['res_primal']),
        np.asarray(out['res_dual']))
    ref = ipm_solve(P, q, E, f, G, h, l, socs, IPMSettings())
    np.testing.assert_allclose(np.asarray(out['x']), np.asarray(ref['x']),
                               rtol=1e-3, atol=1e-3)
