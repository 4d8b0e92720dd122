"""Batched static-pivot blocked LDL^T (ops/ldl_batched.py +
ops/ldl_kernel.py) -- the QDLDL-role factorization behind the conic
IPM's 'ldl' KKT mode (quasidefinite systems, reference Clarabel /
OSQP qdldl role, SURVEY.md section 2.3)."""
import numpy as np
import pytest

import jax.numpy as jnp

from cvxpygen_tpu.ops.ldl_batched import ldl_factor, ldl_solve


def _quasidefinite(B, N, nblk, rng, dtype=np.float64):
    P = rng.standard_normal((B, nblk, nblk))
    K = np.zeros((B, N, N))
    K[:, :nblk, :nblk] = P @ np.swapaxes(P, 1, 2) + 1e-3 * np.eye(nblk)
    Bb = rng.standard_normal((B, N - nblk, nblk))
    K[:, nblk:, :nblk] = Bb
    K[:, :nblk, nblk:] = np.swapaxes(Bb, 1, 2)
    H = rng.standard_normal((B, N - nblk, N - nblk))
    K[:, nblk:, nblk:] = -(H @ np.swapaxes(H, 1, 2)
                           + 1e-3 * np.eye(N - nblk))
    signs = np.concatenate([np.ones(nblk), -np.ones(N - nblk)])
    return K.astype(dtype), signs


@pytest.mark.parametrize('N,nblk', [(23, 7), (37, 17), (64, 32)])
def test_ldl_solves_quasidefinite(N, nblk):
    rng = np.random.default_rng(0)
    B = 4
    K, signs = _quasidefinite(B, N, nblk, rng)
    b = rng.standard_normal((B, N))
    fac = ldl_factor(jnp.asarray(K), signs=signs)
    x = np.asarray(ldl_solve(fac, jnp.asarray(b)))
    xe = np.linalg.solve(K, b[..., None])[..., 0]
    np.testing.assert_allclose(x, xe, rtol=1e-8, atol=1e-8)


def test_ldl_dynamic_regularization_refinable():
    """With near-singular pivots the dynamically regularized factor is a
    contraction for iterative refinement against the true K (the
    QDLDL/Clarabel recipe the IPM relies on)."""
    rng = np.random.default_rng(1)
    B, N, nblk = 2, 24, 8
    K, signs = _quasidefinite(B, N, nblk, rng)
    K[:, :nblk, :nblk] *= 1e-7   # nearly-zero primal block (P ~ 0 LP)
    b = rng.standard_normal((B, N))
    fac = ldl_factor(jnp.asarray(K), signs=signs, dyn_delta=1e-6)
    x = np.asarray(ldl_solve(fac, jnp.asarray(b)))
    for _ in range(5):
        r = b - np.einsum('bij,bj->bi', K, x)
        x = x + np.asarray(ldl_solve(fac, jnp.asarray(r)))
    resid = b - np.einsum('bij,bj->bi', K, x)
    assert np.max(np.abs(resid)) < 1e-8


def test_ldl_pallas_matches_xla_interpret():
    """Fused Pallas kernels (interpret mode on CPU) == XLA lowering."""
    from cvxpygen_tpu.ops.ldl_kernel import (ldl_factor_pallas,
                                             ldl_solve_pallas)
    rng = np.random.default_rng(2)
    B, N, nblk = 5, 37, 17
    K, signs = _quasidefinite(B, N, nblk, rng, dtype=np.float32)
    b = rng.standard_normal((B, N)).astype(np.float32)
    Kj, bj = jnp.asarray(K), jnp.asarray(b)
    fac_x = ldl_factor(Kj, signs=signs, dyn_delta=1e-5)
    x_x = np.asarray(ldl_solve(fac_x, bj))
    fac_p = ldl_factor_pallas(Kj, signs=signs, dyn_delta=1e-5,
                              block_b=4, interpret=True)
    np.testing.assert_allclose(np.asarray(fac_p['d']),
                               np.asarray(fac_x['d']), rtol=5e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(fac_p['L']),
                               np.asarray(fac_x['L']), rtol=1e-3,
                               atol=1e-4)
    x_p = np.asarray(ldl_solve_pallas(fac_p, bj, block_b=4,
                                      interpret=True))
    np.testing.assert_allclose(x_p, x_x, rtol=1e-3, atol=1e-4)


def test_ldl_inverse_matches_solve():
    """ldl_inverse (explicit inverse of the regularized K via multi-RHS
    sweeps, the TPU solve path) applied to a rhs matches ldl_solve."""
    from cvxpygen_tpu.ops.ldl_batched import ldl_inverse
    rng = np.random.default_rng(3)
    B, N, nblk = 3, 37, 17
    K, signs = _quasidefinite(B, N, nblk, rng)
    b = rng.standard_normal((B, N))
    fac = ldl_factor(jnp.asarray(K), signs=signs)
    x1 = np.asarray(ldl_solve(fac, jnp.asarray(b)))
    Kinv = ldl_inverse(fac)
    x2 = np.einsum('bij,bj->bi', np.asarray(Kinv), b)
    np.testing.assert_allclose(x2, x1, rtol=1e-8, atol=1e-9)


def test_factor_inverse_pallas_matches_xla():
    """Lane-batched fused factor+inverse (interpret) == ldl_factor +
    ldl_inverse on a quasidefinite KKT batch."""
    import jax.numpy as jnp
    from cvxpygen_tpu.ops.ldl_batched import ldl_factor, ldl_inverse
    from cvxpygen_tpu.ops.ldl_kernel import ldl_factor_inverse_pallas
    rng = np.random.default_rng(11)
    B, n, mc = 4, 10, 14
    N = n + mc
    G = rng.standard_normal((B, mc, n))
    Hs = rng.standard_normal((B, mc, mc)) * 0.3
    H = np.einsum('bij,bkj->bik', Hs, Hs) + np.eye(mc)
    K = np.zeros((B, N, N))
    # well-conditioned quasidefinite: at the IPM's 1e-6-regularized
    # conditioning, BOTH algorithms produce f32 inverses that differ at
    # the ~1% level from each other (eps * cond), which is exactly what
    # the caller's refinement absorbs -- the equivalence check needs a
    # benign cond
    K[:, :n, :n] = np.eye(n)
    K[:, :n, n:] = -np.swapaxes(G, 1, 2)
    K[:, n:, :n] = -G
    K[:, n:, n:] = -H
    signs = np.concatenate([np.ones(n), -np.ones(mc)])
    Kj = jnp.asarray(K, jnp.float32)
    dd = float(jnp.finfo(jnp.float32).eps) ** 0.5 * 0.1
    fac = ldl_factor(Kj, signs=signs, dyn_delta=dd)
    Kinv_ref = np.asarray(ldl_inverse(fac))
    Kinv = np.asarray(ldl_factor_inverse_pallas(
        Kj, signs=signs, dyn_delta=dd, block_b=4, interpret=True))
    np.testing.assert_allclose(Kinv, Kinv_ref, rtol=2e-3, atol=2e-4)
    # and it really inverts K (true f64 check)
    R = np.eye(N) - np.einsum('bij,bjk->bik', K, Kinv.astype(np.float64))
    assert np.abs(R).max() < 1e-3


def test_inverse_pallas_matches_xla():
    """One-launch ldl_inverse_pallas (interpret) == XLA ldl_inverse on a
    Pallas-layout fac (flat Linv), including batch padding."""
    import jax.numpy as jnp
    from cvxpygen_tpu.ops.ldl_batched import ldl_inverse
    from cvxpygen_tpu.ops.ldl_kernel import (ldl_factor_pallas,
                                             ldl_inverse_pallas)
    rng = np.random.default_rng(12)
    B, n, mc = 5, 9, 12                      # B=5 exercises pad to 8
    N = n + mc
    G = rng.standard_normal((B, mc, n))
    Hs = rng.standard_normal((B, mc, mc)) * 0.3
    H = np.einsum('bij,bkj->bik', Hs, Hs) + np.eye(mc)
    K = np.zeros((B, N, N))
    K[:, :n, :n] = np.eye(n)
    K[:, :n, n:] = -np.swapaxes(G, 1, 2)
    K[:, n:, :n] = -G
    K[:, n:, n:] = -H
    signs = np.concatenate([np.ones(n), -np.ones(mc)])
    Kj = jnp.asarray(K, jnp.float32)
    dd = float(jnp.finfo(jnp.float32).eps) ** 0.5 * 0.1
    fac = ldl_factor_pallas(Kj, signs=signs, dyn_delta=dd, block_b=4,
                            interpret=True)
    Kinv_ref = np.asarray(ldl_inverse(fac))
    Kinv = np.asarray(ldl_inverse_pallas(fac, block_b=8, interpret=True))
    np.testing.assert_allclose(Kinv, Kinv_ref, rtol=2e-3, atol=2e-4)
    R = np.eye(N) - np.einsum('bij,bjk->bik', K, Kinv.astype(np.float64))
    assert np.abs(R).max() < 1e-3


def test_kinv_pallas_batch_major_matches_xla():
    """Batch-major fused factor+inverse (interpret) == ldl_factor +
    ldl_inverse."""
    import jax.numpy as jnp
    from cvxpygen_tpu.ops.ldl_batched import ldl_factor, ldl_inverse
    from cvxpygen_tpu.ops.ldl_kernel import ldl_kinv_pallas
    rng = np.random.default_rng(13)
    B, n, mc = 5, 9, 12
    N = n + mc
    G = rng.standard_normal((B, mc, n))
    Hs = rng.standard_normal((B, mc, mc)) * 0.3
    H = np.einsum('bij,bkj->bik', Hs, Hs) + np.eye(mc)
    K = np.zeros((B, N, N))
    K[:, :n, :n] = np.eye(n)
    K[:, :n, n:] = -np.swapaxes(G, 1, 2)
    K[:, n:, :n] = -G
    K[:, n:, n:] = -H
    signs = np.concatenate([np.ones(n), -np.ones(mc)])
    Kj = jnp.asarray(K, jnp.float32)
    dd = float(jnp.finfo(jnp.float32).eps) ** 0.5 * 0.1
    fac = ldl_factor(Kj, signs=signs, dyn_delta=dd)
    Kinv_ref = np.asarray(ldl_inverse(fac))
    Kinv = np.asarray(ldl_kinv_pallas(Kj, signs=signs, dyn_delta=dd,
                                      block_b=4, interpret=True))
    np.testing.assert_allclose(Kinv, Kinv_ref, rtol=2e-3, atol=2e-4)
    R = np.eye(N) - np.einsum('bij,bjk->bik', K, Kinv.astype(np.float64))
    assert np.abs(R).max() < 1e-3
