"""Cone projections: optimality conditions + NumPy/JAX twin agreement.

For a closed convex cone K, x = Pi_K(v) iff
    x in K,   v - x in K_polar,   <x, v - x> = 0
-- necessary AND sufficient, so these tests are complete correctness checks
without an external oracle (role of the reference's vendored SCS cone code,
scs submodule src/cones.c).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from cvxpygen_tpu.ops.cones import (
    ConeLayout, project_cone, project_cone_np, project_dual_cone,
    project_dual_cone_np, svec_indices, svec_np, unsvec_np,
    _proj_exp_np)


def _in_exp_cone(x, tol=1e-6):
    r, s, t = x
    if s > tol:
        return s * np.exp(min(r / s, 700)) <= t + tol * max(1, abs(t))
    return (abs(s) <= tol) and (r <= tol) and (t >= -tol)


def _in_exp_dual(z, tol=1e-6):
    u, v, w = z
    if u < -tol:
        return -u * np.exp(min(v / u, 700)) <= np.e * w + tol * max(1, abs(w))
    return (abs(u) <= tol) and (v >= -tol) and (w >= -tol)


# ---------------------------------------------------------------------------
# exp cone
# ---------------------------------------------------------------------------

def test_exp_proj_optimality_numpy():
    rng = np.random.default_rng(0)
    for scale in (0.1, 1.0, 10.0, 1000.0):
        for _ in range(200):
            v = rng.normal(size=3) * scale
            x = _proj_exp_np(v)
            z = x - v          # Moreau: x - v in K^* (v - x in K_polar)
            nv = max(1.0, np.linalg.norm(v))
            assert _in_exp_cone(x / nv, 1e-6), (v, x)
            assert _in_exp_dual(z / nv, 1e-6), (v, x, z)
            assert abs(np.dot(x, z)) <= 1e-6 * nv * nv, (v, x)


def test_exp_proj_special_points():
    # interior point: identity
    v = np.array([0.0, 1.0, 2.0])
    assert np.allclose(_proj_exp_np(v), v)
    # deep in polar: zero
    v = np.array([1.0, -5.0, -5.0])
    x = _proj_exp_np(v)
    assert np.allclose(x, 0.0, atol=1e-9)
    # third quadrant r<=0, s<=0
    v = np.array([-1.0, -2.0, 3.0])
    assert np.allclose(_proj_exp_np(v), [-1.0, 0.0, 3.0])
    v = np.array([-1.0, -2.0, -3.0])
    assert np.allclose(_proj_exp_np(v), [-1.0, 0.0, 0.0])


def test_exp_proj_jax_matches_numpy():
    rng = np.random.default_rng(1)
    V = rng.normal(size=(64, 3)) * rng.choice([0.1, 1, 10], size=(64, 1))
    layout = ConeLayout(n_exp=1)
    out = np.asarray(project_cone(jnp.asarray(V, jnp.float32), layout))
    ref = np.stack([_proj_exp_np(v) for v in V])
    scale = np.maximum(1.0, np.linalg.norm(V, axis=1, keepdims=True))
    assert np.max(np.abs(out - ref) / scale) < 5e-5


def test_exp_proj_idempotent_jax():
    rng = np.random.default_rng(2)
    V = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
    layout = ConeLayout(n_exp=1)
    P1 = project_cone(V, layout)
    P2 = project_cone(P1, layout)
    assert float(jnp.max(jnp.abs(P2 - P1))) < 1e-4


# ---------------------------------------------------------------------------
# PSD cone
# ---------------------------------------------------------------------------

def test_svec_isometry():
    rng = np.random.default_rng(3)
    A = rng.normal(size=(5, 5))
    A = A + A.T
    B_ = rng.normal(size=(5, 5))
    B_ = B_ + B_.T
    assert np.isclose(np.dot(svec_np(A), svec_np(B_)), np.sum(A * B_))
    assert np.allclose(unsvec_np(svec_np(A), 5), A)


def test_psd_proj_numpy():
    rng = np.random.default_rng(4)
    s = 4
    A = rng.normal(size=(s, s))
    A = (A + A.T) / 2
    w = svec_np(A)
    layout = ConeLayout(psds=(s,))
    wp = project_cone_np(w, layout)
    Xp = unsvec_np(wp, s)
    lam = np.linalg.eigvalsh(Xp)
    assert lam.min() >= -1e-10
    # optimality: A - Xp is NSD and orthogonal to Xp
    R = unsvec_np(w - wp, s)
    assert np.linalg.eigvalsh(R).max() <= 1e-10
    assert abs(np.sum(R * Xp)) < 1e-9


def test_psd_proj_jax_matches_numpy():
    rng = np.random.default_rng(5)
    s = 3
    k = s * (s + 1) // 2
    W = rng.normal(size=(8, k))
    layout = ConeLayout(psds=(s,))
    out = np.asarray(project_cone(jnp.asarray(W, jnp.float32), layout))
    ref = np.stack([project_cone_np(w, layout) for w in W])
    assert np.max(np.abs(out - ref)) < 1e-5


# ---------------------------------------------------------------------------
# mixed layout + Moreau
# ---------------------------------------------------------------------------

def test_mixed_layout_moreau():
    rng = np.random.default_rng(6)
    layout = ConeLayout(n_nonneg=4, socs=(3, 5), n_exp=2, psds=(3,))
    mc = layout.total
    V = rng.normal(size=(16, mc))
    Vj = jnp.asarray(V, jnp.float32)
    P = np.asarray(project_cone(Vj, layout))
    D = np.asarray(project_dual_cone(Vj, layout))
    # Moreau: v = Pi_K(v) - Pi_K*(-v)  (equivalently  Pi_K(v) + Pi_Ko(v))
    Dn = np.asarray(project_dual_cone(-Vj, layout))
    assert np.max(np.abs(P - Dn - V)) < 2e-5
    # numpy twin agreement
    ref = np.stack([project_cone_np(v, layout) for v in V])
    assert np.max(np.abs(P - ref)) < 5e-5
    refd = np.stack([project_dual_cone_np(v, layout) for v in V])
    assert np.max(np.abs(D - refd)) < 2e-4


def test_soc_and_nonneg_blocks():
    layout = ConeLayout(n_nonneg=2, socs=(3,))
    v = jnp.asarray([[-1.0, 2.0, 1.0, 3.0, 4.0]], jnp.float32)
    out = np.asarray(project_cone(v, layout))[0]
    assert np.allclose(out[:2], [0.0, 2.0])
    t, x = out[2], out[3:]
    assert np.linalg.norm(x) <= t + 1e-6
