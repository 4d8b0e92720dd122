"""Pallas TPU kernel: fused ADMM iteration block.

The ADMM inner loop is bandwidth-bound: every iteration streams M^{-1}
(B,n,n) and A (B,m,n) from HBM for three batched matvecs.  This kernel
keeps a block of instances' matrices RESIDENT IN VMEM and runs
``n_iters`` iterations on them before moving to the next block, cutting
HBM traffic by ~n_iters (the hot-kernel design SURVEY.md section 7 step 3;
replaces the reference's per-iteration QDLDL triangular solves).

Layout: grid over batch blocks; per block, M^{-1} (BLK,n,n) and A (BLK,m,n)
are loaded once; the (BLK,n)/(BLK,m) state vectors iterate in registers/VMEM
with VPU multiply-reduce matvecs (MXU batched matvecs are not the win here
-- the arithmetic intensity is 2 flops/byte regardless; locality is).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _admm_block_kernel(sigma, alpha, n_iters,
                       minv_ref, a_ref, q_ref, l_ref, u_ref, rho_ref,
                       x_ref, z_ref, y_ref,
                       ox_ref, oz_ref, oy_ref):
    Minv = minv_ref[:]          # (BLK, n, n)
    A = a_ref[:]                # (BLK, m, n)
    q = q_ref[:]                # (BLK, n)
    l = l_ref[:]
    u = u_ref[:]
    rho = rho_ref[:]            # (BLK, m)
    rho_inv = 1.0 / rho

    def body(_, carry):
        x, z, y = carry
        v = rho * z - y                                   # (BLK, m)
        # rhs_j = sigma x_j - q_j + sum_k A[k, j] v[k]
        rhs = sigma * x - q + jnp.sum(A * v[:, :, None], axis=1)
        xt = jnp.sum(Minv * rhs[:, None, :], axis=2)      # (BLK, n)
        zt = jnp.sum(A * xt[:, None, :], axis=2)          # (BLK, m)
        x1 = alpha * xt + (1.0 - alpha) * x
        w = alpha * zt + (1.0 - alpha) * z + rho_inv * y
        z1 = jnp.clip(w, l, u)
        y1 = rho * (w - z1)
        return x1, z1, y1

    x, z, y = jax.lax.fori_loop(
        0, n_iters, body, (x_ref[:], z_ref[:], y_ref[:]))
    ox_ref[:] = x
    oz_ref[:] = z
    oy_ref[:] = y


def admm_iterate_pallas(Minv, A, q, l, u, rho_vec, x, z, y,
                        sigma, alpha, n_iters, block=8, interpret=False):
    """Run n_iters fused ADMM iterations.  All arrays batched on axis 0;
    B must be a multiple of ``block``."""
    B, m, n = A.shape
    assert B % block == 0, f'batch {B} not a multiple of block {block}'
    dtype = Minv.dtype
    grid = (B // block,)

    def vec_spec(cols):
        return pl.BlockSpec((block, cols), lambda i: (i, 0),
                            memory_space=pltpu.ANY if False else pltpu.VMEM)

    mat_spec_n = pl.BlockSpec((block, n, n), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    mat_spec_mn = pl.BlockSpec((block, m, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)

    kernel = functools.partial(_admm_block_kernel,
                               float(sigma), float(alpha), n_iters)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[mat_spec_n, mat_spec_mn, vec_spec(n), vec_spec(m),
                  vec_spec(m), vec_spec(m), vec_spec(n), vec_spec(m),
                  vec_spec(m)],
        out_specs=(vec_spec(n), vec_spec(m), vec_spec(m)),
        out_shape=(jax.ShapeDtypeStruct((B, n), dtype),
                   jax.ShapeDtypeStruct((B, m), dtype),
                   jax.ShapeDtypeStruct((B, m), dtype)),
        interpret=interpret,
    )(Minv, A, q, l, u, rho_vec, x, z, y)
    return out


def admm_iterate_reference(Minv, A, q, l, u, rho_vec, x, z, y,
                           sigma, alpha, n_iters):
    """Pure-jnp reference implementation (same math, XLA-scheduled)."""
    rho_inv = 1.0 / rho_vec

    def body(_, carry):
        x, z, y = carry
        rhs = sigma * x - q + jnp.einsum('bkj,bk->bj', A, rho_vec * z - y)
        xt = jnp.einsum('bij,bj->bi', Minv, rhs)
        zt = jnp.einsum('bij,bj->bi', A, xt)
        x1 = alpha * xt + (1 - alpha) * x
        w = alpha * zt + (1 - alpha) * z + rho_inv * y
        z1 = jnp.clip(w, l, u)
        y1 = rho_vec * (w - z1)
        return x1, z1, y1

    return jax.lax.fori_loop(0, n_iters, body, (x, z, y))
