"""Pallas kernel correctness (interpret mode on CPU; compiled on TPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cvxpygen_tpu.ops.admm_kernel import (
    admm_iterate_pallas, admm_iterate_reference)


def _rand_problem(B=8, m=12, n=10, seed=0):
    rng = np.random.default_rng(seed)
    F = rng.standard_normal((B, n, n))
    M = F @ np.swapaxes(F, 1, 2) + 5 * np.eye(n)
    Minv = np.linalg.inv(M)
    A = rng.standard_normal((B, m, n))
    q = rng.standard_normal((B, n))
    l = -np.abs(rng.standard_normal((B, m))) - 0.5
    u = np.abs(rng.standard_normal((B, m))) + 0.5
    rho = np.full((B, m), 0.1)
    x = rng.standard_normal((B, n))
    z = rng.standard_normal((B, m))
    y = rng.standard_normal((B, m))
    return tuple(jnp.asarray(v) for v in (Minv, A, q, l, u, rho, x, z, y))


def test_fused_block_matches_reference():
    args = _rand_problem()
    ref = admm_iterate_reference(*args, sigma=1e-6, alpha=1.6, n_iters=20)
    out = admm_iterate_pallas(*args, sigma=1e-6, alpha=1.6, n_iters=20,
                              block=4, interpret=True)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=1e-6, atol=1e-8)


def test_fused_block_iteration_semantics():
    """1 fused iteration == 1 reference iteration (catches off-by-one)."""
    args = _rand_problem(seed=3)
    ref = admm_iterate_reference(*args, sigma=1e-6, alpha=1.6, n_iters=1)
    out = admm_iterate_pallas(*args, sigma=1e-6, alpha=1.6, n_iters=1,
                              block=8, interpret=True)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=1e-6, atol=1e-8)


def test_block_size_invariance():
    args = _rand_problem(B=8)
    o1 = admm_iterate_pallas(*args, sigma=1e-6, alpha=1.6, n_iters=5,
                             block=2, interpret=True)
    o2 = admm_iterate_pallas(*args, sigma=1e-6, alpha=1.6, n_iters=5,
                             block=8, interpret=True)
    for a, b in zip(o1, o2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
