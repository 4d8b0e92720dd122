"""Pallas TPU kernels for the batched static-pivot blocked LDL^T.

The XLA lowering of ops/ldl_batched.py is correct but launch-bound on
TPU: the blocked factorization is ~300 small ops (unrolled panel columns,
triangular-inverse rows, block copies) and each solve ~90, at ~100 us of
launch overhead apiece (measured: 39 ms per factor at (1024, 176, 176)
where the FLOPs cost ~1 ms).  Here the WHOLE factorization is one
pallas_call (the batch block's KKT matrix stays VMEM-resident across all
panels; trailing updates are in-kernel MXU dot_generals) and the whole
forward/diagonal/backward solve is a second single kernel -- the same
fuse-the-loop recipe as ops/admm_full_kernel.py.

Mosaic notes: all indexing is slice-only (integer middle-axis indexing
lowers to gather, which Mosaic rejects); the panel inverses are stored
flat as (B, nbp*p, p) so per-panel access is a 2nd-axis slice.

Math identical to ops/ldl_batched.ldl_factor/ldl_solve (same dynamic
pivot regularization, same panel structure); equivalence is tested in
tests/test_ldl.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST


def _eye(p, dtype):
    return (jax.lax.broadcasted_iota(jnp.int32, (p, p), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (p, p), 1)).astype(dtype)


def _panel_ldl(A, signs, delta, p):
    """In-kernel unblocked LDL of (bb, p, p); returns (L, d, Linv).

    Mosaic-friendly shape discipline: no concatenates (minor-axis concat
    of 1-wide pieces is unsupported) -- columns/rows are accumulated via
    one-hot masks built from iota."""
    dtype = A.dtype
    bb = A.shape[0]
    eye = _eye(p, dtype)
    L = jnp.broadcast_to(eye[None], (bb, p, p))
    d = jnp.zeros((bb, p), dtype)
    for j in range(p):
        dj = A[:, j:j + 1, j:j + 1].reshape(bb, 1)
        sj = float(signs[j])
        dj = sj * jnp.maximum(sj * dj, delta)
        col = A[:, :, j:j + 1].reshape(bb, p) / dj
        row_gt = (jax.lax.broadcasted_iota(jnp.int32, (1, p), 1) > j)
        col = jnp.where(row_gt, col, 0.0)
        ej_row = (jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
                  == j).astype(dtype)                  # (1, p)
        L = L + col[:, :, None] * ej_row[None]
        d = d + dj * ej_row
        A = A - dj[:, :, None] * col[:, :, None] * col[:, None, :]
    # unit-lower inverse by unrolled forward substitution with a masked
    # full-row dot: X[i] = e_i - sum_{j<i} L[i, j] X[j]; rows >= i of the
    # accumulator are still zero and L[i, i] = 1 hits the zero row i, so
    # the full-row product needs no slicing.
    Linv = jnp.zeros((bb, p, p), dtype)
    for i in range(p):
        acc = (jnp.broadcast_to(eye[i:i + 1, :], (bb, p))
               - jax.lax.dot_general(
                   L[:, i:i + 1, :], Linv, (((2,), (1,)), ((0,), (0,))),
                   precision=_HI).reshape(bb, p))
        ei_row = (jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
                  == i).astype(dtype)                  # (p, 1)
        Linv = Linv + acc[:, None, :] * ei_row[None]
    return L, d, Linv


def _factor_kernel(cfg, k_ref, l_ref, d_ref, linv_ref):
    p, nbp, signs, delta = cfg
    A = k_ref[:]                                       # (bb, Np, Np)
    bb, Np, _ = A.shape
    dtype = A.dtype
    # panel results are written straight into the output refs (slice
    # stores) -- Mosaic rejects the block-assembly concatenates
    l_ref[:] = jnp.zeros((bb, Np, Np), dtype)
    Acur = A
    for k in range(nbp):
        o = k * p
        L11, d1, Linv = _panel_ldl(Acur[:, :p, :p], signs[o:o + p], delta, p)
        l_ref[:, o:o + p, o:o + p] = L11
        d_ref[:, o:o + p] = d1
        linv_ref[:, o:o + p, :] = Linv
        rest = Np - o - p
        if rest > 0:
            # Minv = (D1 L11')^{-1} = L11'^{-1} D1^{-1}
            Minv = jnp.swapaxes(Linv, 1, 2) / d1[:, None, :]
            A21 = Acur[:, p:, :p]
            L21 = jax.lax.dot_general(A21, Minv,
                                      (((2,), (1,)), ((0,), (0,))),
                                      precision=_HI)   # (bb, rest, p)
            l_ref[:, o + p:, o:o + p] = L21
            W = L21 * d1[:, None, :]
            Acur = Acur[:, p:, p:] - jax.lax.dot_general(
                W, L21, (((2,), (2,)), ((0,), (0,))), precision=_HI)


def _solve_kernel(cfg, l_ref, d_ref, linv_ref, b_ref, x_ref):
    p, nbp = cfg
    L = l_ref[:]                                       # (bb, Np, Np)
    d = d_ref[:]
    Linv = linv_ref[:]                                 # (bb, nbp*p, p)
    r = b_ref[:]                                       # (bb, Np)
    bb, Np = r.shape
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)

    # forward: L z = b (z assembled via slice stores into the out ref)
    for k in range(nbp):
        o = k * p
        Linv_k = Linv[:, o:o + p, :]                   # (bb, p, p)
        zk = jax.lax.dot_general(Linv_k, r[:, o:o + p],
                                 (((2,), (1,)), ((0,), (0,))),
                                 precision=_HI)        # (bb, p)
        x_ref[:, o:o + p] = zk
        if o + p < Np:
            Lz = jax.lax.dot_general(L[:, :, o:o + p], zk,
                                     (((2,), (1,)), ((0,), (0,))),
                                     precision=_HI)    # (bb, Np)
            r = r - jnp.where(row_ids >= o + p, Lz, 0.0)
    r = x_ref[:] / d
    # backward: L' x = w.  Mosaic's tpu.matmul only supports the
    # matrix-times-vector form with the lhs contracting dim LAST, so the
    # transposed products use per-panel explicitly transposed matrices.
    for k in reversed(range(nbp)):
        o = k * p
        LinvT_k = jnp.swapaxes(Linv[:, o:o + p, :], 1, 2)
        xk = jax.lax.dot_general(LinvT_k, r[:, o:o + p],
                                 (((2,), (1,)), ((0,), (0,))),
                                 precision=_HI)        # Linv' r
        x_ref[:, o:o + p] = xk
        if o:
            LT_k = jnp.swapaxes(L[:, o:o + p, :], 1, 2)   # (bb, Np, p)
            Ltx = jax.lax.dot_general(LT_k, xk,
                                      (((2,), (1,)), ((0,), (0,))),
                                      precision=_HI)   # (bb, Np)
            r = r - jnp.where(row_ids < o, Ltx, 0.0)


def _pad_batch(x, bb):
    B = x.shape[0]
    Bp = -(-B // bb) * bb
    if Bp == B:
        return x, B
    pad = jnp.zeros((Bp - B,) + x.shape[1:], x.dtype)
    return jnp.concatenate([x, pad], axis=0), B


def ldl_factor_pallas(K, signs, dyn_delta, panel: int = 16,
                      block_b: int = 32, interpret=False):
    """One-kernel blocked LDL^T; same contract as ldl_batched.ldl_factor
    (Linv stored flat (B, nbp*p, p)).  Returns the fac dict consumed by
    ldl_solve_pallas."""
    import numpy as np
    B, N, _ = K.shape
    dtype = K.dtype
    p = min(panel, N)
    nbp = -(-N // p)
    Np = nbp * p
    signs = np.concatenate([np.asarray(signs, float), np.ones(Np - N)])
    if Np != N:
        Kp = jnp.zeros((B, Np, Np), dtype)
        Kp = Kp.at[:, :N, :N].set(K)
        Kp = Kp.at[:, jnp.arange(N, Np), jnp.arange(N, Np)].set(1.0)
        K = Kp
    K, B0 = _pad_batch(K, block_b)
    Bp = K.shape[0]
    grid = (Bp // block_b,)
    cfg = (p, nbp, tuple(float(s) for s in signs), float(dyn_delta))
    kern = functools.partial(_factor_kernel, cfg)
    L, d, Linv = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec((block_b, Np, Np), lambda i: (i, 0, 0))],
        out_specs=[
            pl.BlockSpec((block_b, Np, Np), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_b, Np), lambda i: (i, 0)),
            pl.BlockSpec((block_b, Np, p), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, Np, Np), dtype),
            jax.ShapeDtypeStruct((Bp, Np), dtype),
            jax.ShapeDtypeStruct((Bp, Np, p), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(K)
    return dict(L=L[:B0], d=d[:B0], Linv=Linv[:B0], panel=p, N=N, Np=Np)


def ldl_solve_pallas(fac, b, block_b: int = 128, interpret=False):
    """One-kernel forward/diag/backward solve for ldl_factor_pallas."""
    L, d, Linv = fac['L'], fac['d'], fac['Linv']
    p, N, Np = fac['panel'], fac['N'], fac['Np']
    nbp = Np // p
    B = b.shape[0]
    dtype = b.dtype
    if Np != N:
        b = jnp.concatenate([b, jnp.zeros((B, Np - N), dtype)], axis=1)
    Lp, _ = _pad_batch(L, block_b)
    dp, _ = _pad_batch(d, block_b)
    # padded instances: identity factor avoids 0/0 in the diagonal solve
    if Lp.shape[0] != B:
        dp = dp.at[B:].set(1.0)
    Linvp, _ = _pad_batch(Linv, block_b)
    bp, _ = _pad_batch(b, block_b)
    Bp = bp.shape[0]
    grid = (Bp // block_b,)
    cfg = (p, nbp)
    kern = functools.partial(_solve_kernel, cfg)
    x = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, Np, Np), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_b, Np), lambda i: (i, 0)),
            pl.BlockSpec((block_b, Np, p), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_b, Np), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block_b, Np), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, Np), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(Lp, dp, Linvp, bp)
    return x[:B, :N]


def _inverse_kernel(cfg, l_ref, d_ref, linv_ref, kinv_ref):
    """One-launch explicit inverse from a ldl_factor_pallas fac:
    Kinv = L'^{-1} D^{-1} L^{-1} by two panel sweeps on the identity.
    Batch-major (bb, Np, Np) like the factor kernel -- every panel step
    is an MXU dot_general over the full Np-wide right-hand block, so
    the whole build is ~4 ops x nbp panels in ONE launch (the XLA
    ldl_inverse lowering pays ~70 HBM-streaming launches)."""
    p, nbp = cfg
    bb, Np, _ = kinv_ref.shape
    dtype = kinv_ref.dtype
    eye = (jax.lax.broadcasted_iota(jnp.int32, (Np, Np), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (Np, Np), 1)
           ).astype(dtype)
    kinv_ref[:] = jnp.broadcast_to(eye[None], (bb, Np, Np))
    # forward: L Z = I, panel by panel
    for k in range(nbp):
        o = k * p
        Linv_k = linv_ref[:, o:o + p, :]               # (bb, p, p)
        Zk = jax.lax.dot_general(
            Linv_k, kinv_ref[:, o:o + p, :],
            (((2,), (1,)), ((0,), (0,))), precision=_HI)   # (bb, p, Np)
        kinv_ref[:, o:o + p, :] = Zk
        rest = Np - o - p
        if rest > 0:
            L21 = l_ref[:, o + p:, o:o + p]            # (bb, rest, p)
            kinv_ref[:, o + p:, :] = kinv_ref[:, o + p:, :] \
                - jax.lax.dot_general(L21, Zk,
                                      (((2,), (1,)), ((0,), (0,))),
                                      precision=_HI)
    # diagonal
    kinv_ref[:] = kinv_ref[:] / d_ref[:][:, :, None]
    # backward: L' X = W, reversed panels
    for k in reversed(range(nbp)):
        o = k * p
        LinvT_k = jnp.swapaxes(linv_ref[:, o:o + p, :], 1, 2)
        Xk = jax.lax.dot_general(
            LinvT_k, kinv_ref[:, o:o + p, :],
            (((2,), (1,)), ((0,), (0,))), precision=_HI)   # (bb, p, Np)
        kinv_ref[:, o:o + p, :] = Xk
        if o:
            LkT = jnp.swapaxes(l_ref[:, o:o + p, :o], 1, 2)  # (bb, o, p)
            kinv_ref[:, :o, :] = kinv_ref[:, :o, :] \
                - jax.lax.dot_general(LkT, Xk,
                                      (((2,), (1,)), ((0,), (0,))),
                                      precision=_HI)


def ldl_inverse_pallas(fac, block_b: int = None, interpret=False):
    """Explicit inverse of the regularized K from a ldl_factor_pallas
    fac dict, as one pallas launch per batch block.  Same contract as
    ops/ldl_batched.ldl_inverse (returns (B, N, N)).

    block_b default 32 (override: CPG_LDL_INV_BB): the Mosaic register
    allocator gives vector values no spill-slot reuse, so the per-panel
    full-width update temporaries (~nbp x (bb, Np-p, Np) values) all
    count against scoped VMEM -- bb=64 at Np=176 measured 111.6M
    demand vs the 101.6M limit; bb=32 fits with ~45M headroom."""
    import os
    if block_b is None:
        try:
            block_b = int(os.environ.get('CPG_LDL_INV_BB', '32'))
        except ValueError:
            block_b = 32
        if block_b <= 0:
            block_b = 32
    L, d, Linv = fac['L'], fac['d'], fac['Linv']
    # small batches: don't pad B up to a full block (ADVICE r4)
    block_b = min(block_b, L.shape[0])
    p, N, Np = fac['panel'], fac['N'], fac['Np']
    nbp = Np // p
    B = L.shape[0]
    dtype = L.dtype
    Lp, _ = _pad_batch(L, block_b)
    dp, _ = _pad_batch(d, block_b)
    if Lp.shape[0] != B:
        dp = dp.at[B:].set(1.0)
    Linvp, _ = _pad_batch(Linv, block_b)
    Bp = Lp.shape[0]
    grid = (Bp // block_b,)
    kern = functools.partial(_inverse_kernel, (p, nbp))
    kinv = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, Np, Np), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_b, Np), lambda i: (i, 0)),
            pl.BlockSpec((block_b, Np, p), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((block_b, Np, Np), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, Np, Np), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(Lp, dp, Linvp)
    return kinv[:B, :N, :N]


def _factor_inverse_bm_kernel(cfg, k_ref, kinv_ref, l_scr, linv_scr,
                              d_scr):
    """Batch-major fused LDL factor + explicit inverse: one launch per
    batch block, K (bb, Np, Np) -> Kinv (bb, Np, Np).  The factor
    panels live in VMEM scratch (no L/d/Linv round-trip through HBM
    between the factor and inverse kernels); the inverse build is the
    same two MXU panel sweeps as _inverse_kernel."""
    p, nbp, signs, delta = cfg
    bb, Np, _ = k_ref.shape
    dtype = k_ref.dtype
    # ---- factor (as _factor_kernel, outputs to scratch) ---------------
    l_scr[:] = jnp.zeros((bb, Np, Np), dtype)
    Acur = k_ref[:]
    for k in range(nbp):
        o = k * p
        L11, d1, Linv = _panel_ldl(Acur[:, :p, :p], signs[o:o + p], delta, p)
        l_scr[:, o:o + p, o:o + p] = L11
        d_scr[:, o:o + p] = d1
        linv_scr[:, o:o + p, :] = Linv
        rest = Np - o - p
        if rest > 0:
            Minv = jnp.swapaxes(Linv, 1, 2) / d1[:, None, :]
            A21 = Acur[:, p:, :p]
            L21 = jax.lax.dot_general(A21, Minv,
                                      (((2,), (1,)), ((0,), (0,))),
                                      precision=_HI)
            l_scr[:, o + p:, o:o + p] = L21
            W = L21 * d1[:, None, :]
            Acur = Acur[:, p:, p:] - jax.lax.dot_general(
                W, L21, (((2,), (2,)), ((0,), (0,))), precision=_HI)
    # ---- inverse (as _inverse_kernel, reading scratch) ----------------
    eye = (jax.lax.broadcasted_iota(jnp.int32, (Np, Np), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (Np, Np), 1)
           ).astype(dtype)
    kinv_ref[:] = jnp.broadcast_to(eye[None], (bb, Np, Np))
    for k in range(nbp):
        o = k * p
        Linv_k = linv_scr[:, o:o + p, :]
        Zk = jax.lax.dot_general(
            Linv_k, kinv_ref[:, o:o + p, :],
            (((2,), (1,)), ((0,), (0,))), precision=_HI)
        kinv_ref[:, o:o + p, :] = Zk
        rest = Np - o - p
        if rest > 0:
            L21 = l_scr[:, o + p:, o:o + p]
            kinv_ref[:, o + p:, :] = kinv_ref[:, o + p:, :] \
                - jax.lax.dot_general(L21, Zk,
                                      (((2,), (1,)), ((0,), (0,))),
                                      precision=_HI)
    kinv_ref[:] = kinv_ref[:] / d_scr[:][:, :, None]
    for k in reversed(range(nbp)):
        o = k * p
        LinvT_k = jnp.swapaxes(linv_scr[:, o:o + p, :], 1, 2)
        Xk = jax.lax.dot_general(
            LinvT_k, kinv_ref[:, o:o + p, :],
            (((2,), (1,)), ((0,), (0,))), precision=_HI)
        kinv_ref[:, o:o + p, :] = Xk
        if o:
            LkT = jnp.swapaxes(l_scr[:, o:o + p, :o], 1, 2)
            kinv_ref[:, :o, :] = kinv_ref[:, :o, :] \
                - jax.lax.dot_general(LkT, Xk,
                                      (((2,), (1,)), ((0,), (0,))),
                                      precision=_HI)


def ldl_kinv_pallas(K, signs, dyn_delta, panel: int = 16,
                    block_b: int = 32, interpret=False):
    """Batch-major fused factor + inverse: K (B, N, N) -> Kinv of the
    pivot-regularized K, one launch per batch block, factor panels
    VMEM-resident (no L/d/Linv HBM round-trip)."""
    import numpy as np
    B, N, _ = K.shape
    dtype = K.dtype
    p = min(panel, N)
    nbp = -(-N // p)
    Np = nbp * p
    signs = np.concatenate([np.asarray(signs, float), np.ones(Np - N)])
    if Np != N:
        Kp = jnp.zeros((B, Np, Np), dtype)
        Kp = Kp.at[:, :N, :N].set(K)
        Kp = Kp.at[:, jnp.arange(N, Np), jnp.arange(N, Np)].set(1.0)
        K = Kp
    K, B0 = _pad_batch(K, block_b)
    Bp = K.shape[0]
    grid = (Bp // block_b,)
    cfg = (p, nbp, tuple(float(s) for s in signs), float(dyn_delta))
    kern = functools.partial(_factor_inverse_bm_kernel, cfg)
    kinv = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec((block_b, Np, Np), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((block_b, Np, Np), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, Np, Np), dtype),
        scratch_shapes=[pltpu.VMEM((block_b, Np, Np), dtype),
                        pltpu.VMEM((block_b, Np, p), dtype),
                        pltpu.VMEM((block_b, Np), dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(K)
    return kinv[:B0, :N, :N]


# ---------------------------------------------------------------------------
# lane-batched fused factor + explicit inverse
# ---------------------------------------------------------------------------

def _factor_inverse_kernel(cfg, k_ref, kinv_ref, l_scr, linv_scr, d_scr):
    """Lane-batched LDL^T + explicit inverse of the regularized K.

    Layout: instances ride the 128 LANES -- K arrives (Np, Np, bb).  The
    per-instance-batched kernel (_factor_kernel) issues its ~2.3k small
    ops once per 32-instance grid step; here the same instruction stream
    covers a full 128-lane block, so per-instance instruction cost drops
    ~4x, and the inverse build (the XLA ldl_inverse's ~70 launch-bound
    ops) fuses into the same launch.  Every product is a static FMA loop
    over the panel index (batched (p, p) shapes have no MXU routing);
    indexing is slice-only (Mosaic rejects integer middle-axis gathers);
    K's SYMMETRY supplies every needed row/column transpose for free
    during elimination.

    Phase 1 factors IN PLACE in kinv_ref (the trailing matrix); phase 2
    rebuilds kinv_ref as the inverse via the two panel sweeps.  Reads
    come from refs at use sites (register-allocator spill discipline,
    see ops/banded_shared_kernel.py)."""
    p, nbp, signs, delta = cfg
    Np = p * nbp
    dtype = k_ref.dtype
    bb = k_ref.shape[2]
    row_p = jax.lax.broadcasted_iota(jnp.int32, (p, 1, 1), 0)
    col_p = jax.lax.broadcasted_iota(jnp.int32, (1, p, 1), 1)

    kinv_ref[:] = k_ref[:]

    for k in range(nbp):
        o = k * p
        P = kinv_ref[o:o + p, o:o + p, :]              # (p, p, bb)
        L11 = jnp.zeros((p, p, bb), dtype)
        d1c = jnp.zeros((p, 1, bb), dtype)             # column layout
        d1r = jnp.zeros((1, p, bb), dtype)             # row layout
        for j in range(p):
            sj = float(signs[o + j])
            dj = P[j:j + 1, j:j + 1, :]                # (1, 1, bb)
            dj = sj * jnp.maximum(sj * dj, delta)
            col = jnp.where(row_p > j, P[:, j:j + 1, :] / dj, 0.0)
            # P stays symmetric through the elimination, so row j IS
            # column j -- no transpose needed for the outer product
            row = jnp.where(col_p > j, P[j:j + 1, :, :] / dj, 0.0)
            L11 = L11 + col * (col_p == j).astype(dtype)
            d1c = d1c + dj * (row_p == j).astype(dtype)
            d1r = d1r + dj * (col_p == j).astype(dtype)
            P = P - dj * col * row
        # unit-lower panel inverse by forward substitution:
        # Linv row i = e_i - sum_{j<i} L11[i, j] * (Linv row j)
        Linv = jnp.zeros((p, p, bb), dtype)
        for i in range(p):
            acc = jnp.broadcast_to(
                (col_p == i).astype(dtype), (1, p, bb))
            for j in range(i):
                acc = acc - L11[i:i + 1, j:j + 1, :] * Linv[j:j + 1, :, :]
            Linv = Linv + acc * (row_p == i).astype(dtype)
        linv_scr[o:o + p, :, :] = Linv
        d_scr[o:o + p, :] = d1c.reshape(p, bb)
        rest = Np - o - p
        if rest > 0:
            # Minv = L11'^{-1} D1^{-1}  (columns scaled by 1/d)
            Minv = jnp.swapaxes(Linv, 0, 1) / d1r
            A21 = kinv_ref[o + p:, o:o + p, :]         # (rest, p, bb)
            L21 = A21[:, 0:1, :] * Minv[0:1, :, :]
            for j in range(1, p):
                L21 = L21 + A21[:, j:j + 1, :] * Minv[j:j + 1, :, :]
            l_scr[o + p:, o:o + p, :] = L21
            W = L21 * d1r                              # L21 D1
            L21T = jnp.swapaxes(L21, 0, 1)             # (p, rest, bb)
            tr = kinv_ref[o + p:, o + p:, :]
            for j in range(p):
                tr = tr - W[:, j:j + 1, :] * L21T[j:j + 1, :, :]
            kinv_ref[o + p:, o + p:, :] = tr

    # ---- phase 2: inverse build (two panel sweeps on I) ----------------
    eye_np = (jax.lax.broadcasted_iota(jnp.int32, (Np, Np, 1), 0)
              == jax.lax.broadcasted_iota(jnp.int32, (Np, Np, 1), 1)
              ).astype(dtype)
    kinv_ref[:] = jnp.broadcast_to(eye_np, (Np, Np, bb))
    # forward: L Z = I, panel by panel
    for k in range(nbp):
        o = k * p
        Linv = linv_scr[o:o + p, :, :]                 # (p, p, bb)
        R = kinv_ref[o:o + p, :, :]                    # (p, Np, bb)
        Zk = Linv[:, 0:1, :] * R[0:1, :, :]
        for j in range(1, p):
            Zk = Zk + Linv[:, j:j + 1, :] * R[j:j + 1, :, :]
        kinv_ref[o:o + p, :, :] = Zk
        rest = Np - o - p
        if rest > 0:
            L21 = l_scr[o + p:, o:o + p, :]            # (rest, p, bb)
            Rl = kinv_ref[o + p:, :, :]
            for j in range(p):
                Rl = Rl - L21[:, j:j + 1, :] * Zk[j:j + 1, :, :]
            kinv_ref[o + p:, :, :] = Rl
    # diagonal: W = D^{-1} Z
    d_all = d_scr[:]                                   # (Np, bb)
    kinv_ref[:] = kinv_ref[:] / d_all[:, None, :]
    # backward: L' X = W, reversed panels; Xk[i] = sum_j Linv[j, i] W[j]
    for k in reversed(range(nbp)):
        o = k * p
        LinvT = jnp.swapaxes(linv_scr[o:o + p, :, :], 0, 1)
        Wk = kinv_ref[o:o + p, :, :]
        Xk = LinvT[:, 0:1, :] * Wk[0:1, :, :]
        for j in range(1, p):
            Xk = Xk + LinvT[:, j:j + 1, :] * Wk[j:j + 1, :, :]
        kinv_ref[o:o + p, :, :] = Xk
        if o:
            # rows above the panel: subtract (L[o:o+p, :o])' Xk
            LkT = jnp.swapaxes(l_scr[o:o + p, :o, :], 0, 1)  # (o, p, bb)
            Ru = kinv_ref[:o, :, :]
            for j in range(p):
                Ru = Ru - LkT[:, j:j + 1, :] * Xk[j:j + 1, :, :]
            kinv_ref[:o, :, :] = Ru


def pick_fi_block(Np, dtype=jnp.float32):
    """Lane-block for the fused factor+inverse: with the input aliased
    onto the output the kernel keeps ~2 full (Np, Np, bb) buffers
    (in+out/trailing shared, L scratch) plus (rest, Np, bb)-sized sweep
    temporaries; budget ~5 full-size equivalents against 90MB (the
    pre-aliasing budget of 6 forced bb=64 at Np=176, and the half-lane
    sub-batching ate the fused kernel's win -- see solvers/ipm.py)."""
    esize = jnp.dtype(dtype).itemsize
    for bb in (128, 64, 32, 16, 8):
        if 5 * Np * Np * bb * esize <= 90 * 1024 * 1024:
            return bb
    return 8


def ldl_factor_inverse_pallas(K, signs, dyn_delta, panel: int = 16,
                              block_b: int = None, interpret=False):
    """Lane-batched fused LDL factor + explicit inverse: K (B, N, N) ->
    Kinv (B, N, N) of the pivot-regularized K.  Replaces
    ldl_factor_pallas + ldl_inverse on TPU (one launch, ~4x fewer
    per-instance instruction issues)."""
    import numpy as np
    B, N, _ = K.shape
    dtype = K.dtype
    p = min(panel, N)
    nbp = -(-N // p)
    Np = nbp * p
    if block_b is None:
        block_b = pick_fi_block(Np, dtype)
    signs = np.concatenate([np.asarray(signs, float), np.ones(Np - N)])
    if Np != N:
        Kp = jnp.zeros((B, Np, Np), dtype)
        Kp = Kp.at[:, :N, :N].set(K)
        Kp = Kp.at[:, jnp.arange(N, Np), jnp.arange(N, Np)].set(1.0)
        K = Kp
    Bp = -(-B // block_b) * block_b
    KT = jnp.transpose(K, (1, 2, 0))                  # (Np, Np, B)
    if Bp != B:
        KT = jnp.concatenate(
            [KT, jnp.broadcast_to(
                jnp.eye(Np, dtype=dtype)[:, :, None],
                (Np, Np, Bp - B))], axis=2)
    cfg = (p, nbp, tuple(float(s) for s in signs), float(dyn_delta))
    kern = functools.partial(_factor_inverse_kernel, cfg)
    # lane sub-batches ride the GRID (sequential on the core, scratch
    # reused per step) -- the earlier lax.map-over-pallas_call form paid
    # a big moveaxis repack either side of every sub-launch; the input
    # is aliased onto the output (the kernel's first store is the
    # k -> kinv copy and k is never read again), saving one full
    # (Np, Np, bb) VMEM buffer so Np=176 fits bb=128
    nsub = Bp // block_b
    KinvT = pl.pallas_call(
        kern,
        grid=(nsub,),
        in_specs=[pl.BlockSpec((Np, Np, block_b), lambda i: (0, 0, i))],
        out_specs=pl.BlockSpec((Np, Np, block_b), lambda i: (0, 0, i)),
        out_shape=jax.ShapeDtypeStruct((Np, Np, Bp), dtype),
        scratch_shapes=[pltpu.VMEM((Np, Np, block_b), dtype),
                        pltpu.VMEM((Np, p, block_b), dtype),
                        pltpu.VMEM((Np, block_b), dtype)],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(KT)
    return jnp.transpose(KinvT[:, :, :B], (2, 0, 1))[:, :N, :N]
