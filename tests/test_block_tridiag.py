"""Block-tridiagonal solver (ops/block_tridiag.py) vs dense reference."""
import numpy as np
import pytest

import jax.numpy as jnp

from cvxpygen_tpu.ops.block_tridiag import (
    bt_factor, bt_matvec, bt_solve, dense_to_bt, detect_block_bandwidth)


def _random_bt_spd(B=4, nb=16, s=3, seed=0):
    """Random SPD block-tridiagonal (diagonally dominant)."""
    rng = np.random.default_rng(seed)
    D = rng.standard_normal((B, nb, s, s))
    D = 0.5 * (D + np.swapaxes(D, 2, 3)) + (2.0 * s) * np.eye(s)
    L = 0.3 * rng.standard_normal((B, nb - 1, s, s))
    return jnp.asarray(D), jnp.asarray(L)


def _to_dense(D, L):
    B, nb, s, _ = D.shape
    n = nb * s
    M = np.zeros((B, n, n))
    for i in range(nb):
        M[:, i*s:(i+1)*s, i*s:(i+1)*s] = np.asarray(D[:, i])
        if i:
            M[:, i*s:(i+1)*s, (i-1)*s:i*s] = np.asarray(L[:, i-1])
            M[:, (i-1)*s:i*s, i*s:(i+1)*s] = np.swapaxes(
                np.asarray(L[:, i-1]), 1, 2)
    return M


def test_bt_solve_matches_dense():
    D, L = _random_bt_spd()
    M = _to_dense(D, L)
    rng = np.random.default_rng(1)
    b = rng.standard_normal((4, 16, 3))
    fac = bt_factor(D, L)
    x = np.asarray(bt_solve(fac, jnp.asarray(b)))
    x_ref = np.linalg.solve(M, b.reshape(4, -1)[..., None])[..., 0]
    np.testing.assert_allclose(x.reshape(4, -1), x_ref, rtol=1e-8,
                               atol=1e-10)


def test_bt_matvec_matches_dense():
    D, L = _random_bt_spd(B=2, nb=5, s=2, seed=2)
    M = _to_dense(D, L)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 5, 2))
    y = np.asarray(bt_matvec(D, L, jnp.asarray(x)))
    y_ref = np.einsum('bij,bj->bi', M, x.reshape(2, -1))
    np.testing.assert_allclose(y.reshape(2, -1), y_ref, rtol=1e-10,
                               atol=1e-12)


def test_dense_roundtrip():
    D, L = _random_bt_spd(B=2, nb=6, s=2, seed=4)
    M = jnp.asarray(_to_dense(D, L))
    D2, L2 = dense_to_bt(M, 2)
    np.testing.assert_allclose(np.asarray(D2), np.asarray(D), atol=1e-12)
    np.testing.assert_allclose(np.asarray(L2), np.asarray(L), atol=1e-12)


def test_detect_block_bandwidth():
    D, L = _random_bt_spd(B=1, nb=8, s=3, seed=5)
    M = _to_dense(D, L)[0]
    assert detect_block_bandwidth(M) == 3
    # dense matrix: no block-tridiagonal structure at any candidate s
    assert detect_block_bandwidth(np.ones((24, 24))) is None
    # diagonal matrix: trivially block-tridiagonal at s=1
    assert detect_block_bandwidth(np.eye(24)) == 1


def test_long_horizon_scaling_shape():
    """charging-scale: nb=480, s=3 (n=1440) factors+solves without dense."""
    D, L = _random_bt_spd(B=2, nb=480, s=3, seed=6)
    b = jnp.asarray(np.random.default_rng(7).standard_normal((2, 480, 3)))
    fac = bt_factor(D, L)
    x = bt_solve(fac, b)
    r = bt_matvec(D, L, x) - b
    assert float(jnp.max(jnp.abs(r))) < 1e-8


def test_cyclic_reduction_matches_scan():
    """cr_factor/cr_solve (FLOP-optimal banded solve) agrees with the
    associative-scan path and with the true matvec residual, including
    odd/padded block counts."""
    import numpy as np
    import jax.numpy as jnp
    from cvxpygen_tpu.ops.block_tridiag import (bt_factor, bt_matvec,
                                                bt_solve, cr_factor,
                                                cr_solve)
    rng = np.random.default_rng(0)
    for (B, nb, s) in ((3, 7, 4), (2, 12, 8), (1, 33, 4)):
        D = rng.standard_normal((B, nb, s, s))
        D = D @ np.swapaxes(D, 2, 3) + 4 * s * np.eye(s)
        L = 0.3 * rng.standard_normal((B, nb - 1, s, s))
        b = rng.standard_normal((B, nb, s))
        Dj, Lj, bj = map(jnp.asarray, (D, L, b))
        x_scan = bt_solve(bt_factor(Dj, Lj), bj)
        x_cr = cr_solve(cr_factor(Dj, Lj), bj)
        np.testing.assert_allclose(np.asarray(x_cr), np.asarray(x_scan),
                                   atol=1e-10)
        resid = bj - bt_matvec(Dj, Lj, x_cr)
        assert float(jnp.max(jnp.abs(resid))) < 1e-10
