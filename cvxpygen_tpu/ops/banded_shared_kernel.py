"""Pallas TPU kernel: fused block-banded shared-KKT ADMM chunk.

The round-3 banded engine (solvers/admm_banded.py) ran each ADMM
iteration as ~60 XLA ops (sparse gather/segment matvecs + the cyclic-
reduction tree), each streaming (B, nnz)-sized tensors through HBM --
measured ~90 us apiece against ~0.15 ms of real per-iteration compute
(BENCH.md round-3 speed-of-light analysis).  This kernel runs
``check_interval`` iterations per launch with EVERYTHING VMEM-resident:

- A in the grouped block-window layout (ops/banded_grouped.py): every
  matvec is a fixed sequence of broadcast-FMA ops over
  (nb, r_max, chunk) / (nb, s, chunk) tensors -- block index on the
  leading (untiled) dim, instances on the 128 lanes;
- the KKT solve is block cyclic reduction with SHARED factors (packed
  into one (NB_TOT, s, s) tensor): even/odd splits are free leading-dim
  reshapes, each level a handful of FMAs;
- P and M ride as shared block-tridiagonal (D, L) tensors for the
  residual and refinement matvecs;
- residuals + OSQP infeasibility certificates computed in-kernel.

The driver (solvers/admm_banded_shared.py) owns the outer while_loop,
batch-shared adaptive rho, and CR refactorization (cheap XLA at B=1).

Shared-path preconditions (P/A batch-invariant) mirror the reference's
no-refactorize update cases (reference cvxpygen/solvers/osqp.py:20-61);
the per-instance banded engine remains the fallback.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 1e30


def cr_level_shapes(nb):
    """Static per-level shapes of cr_factor for nb starting blocks:
    list of dicts(nb_in, nb_pad, n2) ending when one block remains."""
    out = []
    while nb > 1:
        nbp = nb + (nb % 2)
        n2 = nbp // 2
        out.append(dict(nb_in=nb, nb_pad=nbp, n2=n2))
        nb = n2
    return out


def estimate_nb_tot(nb):
    """Total (s, s) blocks in the packed CR factor (pack_cr_levels
    layout): per level Dinv(n2) + A(n2-1) + C(n2) + L_left(n2-1) +
    L_even(n2), plus the root."""
    tot = 1
    for shp in cr_level_shapes(nb):
        n2 = shp['n2']
        tot += 5 * n2 - 2
    return tot


def _mv(M3, v3):
    """Batched block matvec: M3 (n, s, s) x v3 (n, s, chunk) ->
    (n, s, chunk) as ONE broadcast-multiply + ONE sublane reduction over
    a (n, s, s, chunk) temporary.

    The batched-small-matmul shape has no MXU routing, and the
    alternative -- an unrolled FMA chain over the contraction index --
    was measured to blow the Mosaic register allocator's spill-slot
    budget (~500MB of slots at nb=541: every chain link is a spilled
    multi-MB vector value).  The 4D form touches s x more data per
    matvec but is 2 instructions with a single live temporary."""
    t = M3[:, :, :, None] * v3[:, None, :, :]
    return jnp.sum(t, axis=2)


def _mvT(M3, v3):
    """Transposed block matvec: out = M3' v3 per block (same 4D form;
    the contraction runs over M3's ROW index)."""
    t = M3[:, :, :, None] * v3[:, :, None, :]
    return jnp.sum(t, axis=1)


def _cr_solve_inkernel(fac_ref, meta, levels, b, s, chunk):
    """Cyclic-reduction solve on (nb, s, chunk) values with shared packed
    factors; mirrors ops/block_tridiag.cr_solve.  Factor slices are read
    from the REF at each use so their live ranges end per level (loading
    the whole packed factor up front put ~460MB of spill slots on the
    Mosaic register allocator)."""
    dtype = b.dtype
    nb0 = b.shape[0]
    stack = []
    for lvm, shp in zip(meta['levels'], levels):
        if shp['nb_pad'] != shp['nb_in']:
            b = jnp.concatenate(
                [b, jnp.zeros((1, s, chunk), dtype)], axis=0)
        n2 = shp['n2']
        b4 = b.reshape(n2, 2, s, chunk)
        b_even = b4[:, 0]
        b_odd = b4[:, 1]
        oA, nA = lvm['A']
        oC, nC = lvm['C']
        # nA == 0 at the deepest levels (n2 == 1): Mosaic rejects
        # zero-size vectors, so guard statically
        if nA:
            bp_tail = b_even[1:] - _mv(fac_ref[oA:oA + nA], b_odd[:nA])
            bp = jnp.concatenate([b_even[:1], bp_tail], axis=0)
        else:
            bp = b_even
        bp = bp - _mv(fac_ref[oC:oC + nC], b_odd)
        stack.append(b_odd)
        b = bp
    oR = meta['root']
    x = _mv(fac_ref[oR:oR + 1], b)
    for lvm, shp, b_odd in zip(reversed(meta['levels']), reversed(levels),
                               reversed(stack)):
        n2 = shp['n2']
        x = x[:n2]
        oD, nD = lvm['Dinv_odd']
        oLe, nLe = lvm['L_even']
        oLl, nLl = lvm['L_left']
        r = b_odd - _mv(fac_ref[oLe:oLe + nLe], x)
        if nLl:
            up = _mvT(fac_ref[oLl:oLl + nLl], x[1:1 + nLl])
            r = jnp.concatenate([r[:nLl] - up, r[nLl:]], axis=0)
        x_odd = _mv(fac_ref[oD:oD + nD], r)
        x = jnp.stack([x, x_odd], axis=1).reshape(2 * n2, s, chunk)
    return x[:nb0]


def _cr_solve_only_kernel(cfg, meta, levels, fac_ref, b_ref, x_ref):
    """Standalone cyclic-reduction solve: collapses the ~32-op XLA CR
    tree (the round-3 banded engine's launch-bound core) into one
    launch.  b arrives (nb, s, chunk) with instances on the lanes."""
    s, chunk = cfg
    x_ref[:] = _cr_solve_inkernel(fac_ref, meta, levels, b_ref[:], s,
                                  chunk)


def cr_solve_pallas(fac_packed, meta, b, block_b: int = 128,
                    interpret=False):
    """Shared-factor CR solve for a batch of RHS: fac_packed
    (NB_TOT, s, s) from ops/banded_grouped.pack_cr_levels; b (nb, s, B).
    Returns x (nb, s, B).  One grid step per 128-lane instance block."""
    nb, s, B = b.shape
    dtype = b.dtype
    nb_tot = fac_packed.shape[0]
    Bp = -(-B // block_b) * block_b
    if Bp != B:
        b = jnp.concatenate(
            [b, jnp.zeros((nb, s, Bp - B), dtype)], axis=2)
    levels = cr_level_shapes(nb)
    kern = functools.partial(_cr_solve_only_kernel, (s, block_b), meta,
                             levels)
    x = pl.pallas_call(
        kern,
        grid=(Bp // block_b,),
        in_specs=[pl.BlockSpec((nb_tot, s, s), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((nb, s, block_b), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((nb, s, block_b), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, s, Bp), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(fac_packed, b)
    return x[:, :, :B]


def _banded_shared_kernel(cfg, meta, levels,
                          fac_ref, b0_ref, b1_ref, dp_ref, lp_ref,
                          dm_ref, lm_ref, dsc_ref, einv_ref, esc_ref,
                          rho_ref, scal_ref, q_ref, l_ref, u_ref,
                          x_ref, z_ref, y_ref, done_ref,
                          ox_ref, oz_ref, oy_ref, orp_ref, ord_ref,
                          orpd_ref, ordd_ref, oflag_ref):
    (chunk, nb, s, r_max, sigma, alpha, eps_abs, eps_rel,
     check_interval, kkt_refine) = cfg

    # NOTE on liveness: every shared tensor is read from its REF inside
    # the helper that consumes it.  Loading them once at kernel entry
    # keeps the values live across the whole fori_loop and the Mosaic
    # register allocator spills them -- measured 463MB of spill slots on
    # the charging T=1440 shape, 5x the v5e VMEM.
    cinv = scal_ref[0, 0]
    dtype = q_ref.dtype

    zero_blk = jnp.zeros((1, s, chunk), dtype)

    def rho3():
        return rho_ref[:][:, :, None]    # (nb, r_max, 1), pads 1

    def Av(xb, x_hi):
        # (nb, r_max, chunk) <- windowed A; xb = x blocks, x_hi = shifted
        t = (b0_ref[:][:, :, :, None] * xb[:, None, :, :]
             + b1_ref[:][:, :, :, None] * x_hi[:, None, :, :])
        return jnp.sum(t, axis=2)

    def Atv(v):
        # (nb, s, chunk) <- A' v with the B1 half shifted down one block
        lo = jnp.sum(b0_ref[:][:, :, :, None] * v[:, :, None, :], axis=1)
        hi = jnp.sum(b1_ref[:][:, :, :, None] * v[:, :, None, :], axis=1)
        return jnp.concatenate(
            [lo[:1], lo[1:] + hi[:nb - 1]], axis=0)

    def shift_up(xb):
        # x_{g+1} aligned at g (last block sees zeros)
        return jnp.concatenate([xb[1:], zero_blk], axis=0)

    def bt_mv(d_ref2, l_ref2, xb):
        # block-tridiagonal matvec with shared (D, L) block refs
        y = _mv(d_ref2[:], xb)
        lo = _mv(l_ref2[:], xb[:-1])
        up = _mvT(l_ref2[:], xb[1:])
        y = jnp.concatenate([y[:1], y[1:] + lo], axis=0)
        return jnp.concatenate([y[:-1] + up, y[-1:]], axis=0)

    def kkt_solve(rhs):
        xt = _cr_solve_inkernel(fac_ref, meta, levels, rhs, s, chunk)
        for _ in range(kkt_refine):
            r = rhs - bt_mv(dm_ref, lm_ref, xt)
            xt = xt + _cr_solve_inkernel(fac_ref, meta, levels, r, s,
                                         chunk)
        return xt

    def one_iter(_, carry):
        x, z, y = carry
        rho = rho3()
        rhs = sigma * x - q_ref[:] + Atv(rho * z - y)
        xt = kkt_solve(rhs)
        zt = Av(xt, shift_up(xt))
        x1 = alpha * xt + (1.0 - alpha) * x
        w = alpha * zt + (1.0 - alpha) * z + y / rho
        z1 = jnp.clip(w, l_ref[:], u_ref[:])
        y1 = rho * (w - z1)
        return x1, z1, y1

    x0 = x_ref[:]
    z0 = z_ref[:]
    y0 = y_ref[:]
    done = done_ref[:]                   # (1, 1, chunk) int32

    xn, zn, yn = jax.lax.fori_loop(0, check_interval, one_iter,
                                   (x0, z0, y0))
    keep = 1.0 - (done > 0).astype(dtype)        # (1, 1, chunk)
    dx = keep * (xn - x0)
    dy = keep * (yn - y0)
    x = jnp.where(done > 0, x0, xn)
    z = jnp.where(done > 0, z0, zn)
    y = jnp.where(done > 0, y0, yn)

    def inf_norm_rows(v):                # (nb, r_max, chunk) -> (1,1,chunk)
        return jnp.max(jnp.max(jnp.abs(v), axis=0, keepdims=True),
                       axis=1, keepdims=True)

    def inf_norm_x(v):
        return jnp.max(jnp.max(jnp.abs(v), axis=0, keepdims=True),
                       axis=1, keepdims=True)

    E_inv = einv_ref[:][:, :, None]      # (nb, r_max, 1), pads 0
    D_inv = 1.0 / dsc_ref[:][:, :, None]

    Ax = Av(x, shift_up(x))
    Aty = Atv(y)
    rp = inf_norm_rows(E_inv * (Ax - z))
    rp_den = jnp.maximum(inf_norm_rows(E_inv * Ax),
                         inf_norm_rows(E_inv * z))
    rd = cinv * inf_norm_x(D_inv * (bt_mv(dp_ref, lp_ref, x) + q_ref[:]
                                    + Aty))
    rd_den = cinv * jnp.maximum(
        jnp.maximum(inf_norm_x(D_inv * bt_mv(dp_ref, lp_ref, x)),
                    inf_norm_x(D_inv * Aty)),
        inf_norm_x(D_inv * q_ref[:]))
    ok = ((rp <= eps_abs + eps_rel * rp_den)
          & (rd <= eps_abs + eps_rel * rd_den))

    # infeasibility certificates (OSQP section 3.4) on the chunk deltas
    E = esc_ref[:][:, :, None]
    eps_inf = jnp.asarray(1e-4, dtype)
    dy_n = inf_norm_rows(E * dy) * cinv
    cert_p1 = inf_norm_x(D_inv * Atv(dy)) * cinv <= eps_inf * dy_n
    us = u_ref[:]
    ls = l_ref[:]
    u_fin = jnp.where(us < _INF * 0.5, us * E_inv, 0.0)
    l_fin = jnp.where(ls > -_INF * 0.5, ls * E_inv, 0.0)
    sup = jnp.sum(jnp.sum(u_fin * jnp.maximum(E * dy, 0.0)
                          + l_fin * jnp.minimum(E * dy, 0.0),
                          axis=0, keepdims=True),
                  axis=1, keepdims=True) * cinv
    u_open = us >= _INF * 0.5
    l_open = ls <= -_INF * 0.5
    open_dir = (
        jnp.any(jnp.any((dy > 1e-12) & u_open, axis=0, keepdims=True),
                axis=1, keepdims=True)
        | jnp.any(jnp.any((dy < -1e-12) & l_open, axis=0, keepdims=True),
                  axis=1, keepdims=True))
    p_inf = ((dy_n > 1e-10) & cert_p1 & (sup <= -eps_inf * dy_n)
             & ~open_dir)

    Adx = Av(dx, shift_up(dx))
    dx_n = inf_norm_x(dsc_ref[:][:, :, None] * dx)
    cert_d1 = (inf_norm_x(D_inv * bt_mv(dp_ref, lp_ref, dx)) * cinv
               <= eps_inf * dx_n)
    cert_d2 = (jnp.sum(jnp.sum(q_ref[:] * dx, axis=0, keepdims=True),
                       axis=1, keepdims=True) * cinv
               <= -eps_inf * dx_n)
    up_ok = u_open | (E_inv * Adx <= eps_inf * dx_n)
    lo_ok = l_open | (E_inv * Adx >= -eps_inf * dx_n)
    d_inf = ((dx_n > 1e-10) & cert_d1 & cert_d2
             & jnp.all(jnp.all(up_ok & lo_ok, axis=0, keepdims=True),
                       axis=1, keepdims=True))

    ox_ref[:] = x
    oz_ref[:] = z
    oy_ref[:] = y
    orp_ref[:] = rp
    ord_ref[:] = rd
    orpd_ref[:] = rp_den
    ordd_ref[:] = rd_den
    # flags packed as int32 bits: 1 ok, 2 p_inf, 4 d_inf
    oflag_ref[:] = (ok.astype(jnp.int32) + 2 * p_inf.astype(jnp.int32)
                    + 4 * d_inf.astype(jnp.int32))


_VMEM_LIMIT = 107 * 1024 * 1024


def pick_banded_chunk(B, nb, s, r_max, nb_tot, dtype=jnp.float32):
    """Largest sub-batch fitting VMEM.  The wrapper issues one grid=1
    pallas_call per sub-batch (block dims == array dims, so any chunk
    size is Mosaic-legal and inputs are single-buffered); shared
    (·, s, s)/(·, r, s) tensors pad their lane dim to 128."""
    import os
    forced = os.environ.get('CPG_BANDED_CHUNK')
    if forced:
        return int(forced) if int(forced) else None
    esize = jnp.dtype(dtype).itemsize
    shared = (nb_tot + 4 * nb) * s * 128 * esize \
        + 2 * nb * r_max * 128 * esize
    for chunk in (256, 128, 64, 32, 16, 8, 4, 2, 1):
        if B % chunk:
            continue
        lanes = max(chunk, 128)
        # single-buffered per-chunk state (q, l, u, x, z, y) + live
        # FMA temporaries (~5 row-space + ~4 x-space tensors)
        state = (2 * nb * s * lanes + 5 * nb * r_max * lanes) * esize
        temps = (5 * nb * r_max * lanes + 4 * nb * s * lanes) * esize
        est = int(shared + state + int(temps * 1.6))
        if est <= int(_VMEM_LIMIT * 0.9):
            return chunk
    return None


def banded_shared_chunk(fac_packed, meta, B0, B1, D_P, L_P, D_M, L_M,
                        D, E_inv, E, rho, c_inv, q, l, u, x, z, y, done,
                        *, sigma, alpha, eps_abs, eps_rel, check_interval,
                        kkt_refine, chunk=None, interpret=False):
    """Run check_interval fused iterations on the whole batch.

    Layouts (driver-prepared): q/x (nb, s, B); l/u/z/y (nb, r_max, B);
    D (nb, s) / E, E_inv, rho (nb, r_max) shared 2D vectors; done
    (1, 1, B) int32.  x/z/y update IN-PLACE (input_output_aliases).
    Returns (x, z, y, rp, rd, rp_den, rd_den, flags)."""
    nb, s, B = x.shape
    r_max = l.shape[1]
    dtype = x.dtype
    nb_tot = fac_packed.shape[0]
    if chunk is None:
        chunk = pick_banded_chunk(B, nb, s, r_max, nb_tot, dtype)
    assert chunk is not None and B % chunk == 0, (B, chunk)
    levels = cr_level_shapes(nb)

    cfg = (chunk, nb, s, r_max, float(sigma), float(alpha),
           float(eps_abs), float(eps_rel), int(check_interval),
           int(kkt_refine))

    def vmem_spec():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    kernel = functools.partial(_banded_shared_kernel, cfg, meta, levels)
    shared_args = (fac_packed, B0, B1, D_P, L_P, D_M, L_M,
                   D.astype(dtype), E_inv.astype(dtype), E.astype(dtype),
                   rho.astype(dtype),
                   jnp.asarray(c_inv, dtype).reshape(1, 1))
    n_in = len(shared_args) + 7
    call = pl.pallas_call(
        kernel,
        in_specs=[vmem_spec()] * 11
        + [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [vmem_spec()] * 7,
        out_specs=tuple([vmem_spec()] * 8),
        out_shape=(jax.ShapeDtypeStruct((nb, s, chunk), dtype),
                   jax.ShapeDtypeStruct((nb, r_max, chunk), dtype),
                   jax.ShapeDtypeStruct((nb, r_max, chunk), dtype),
                   jax.ShapeDtypeStruct((1, 1, chunk), dtype),
                   jax.ShapeDtypeStruct((1, 1, chunk), dtype),
                   jax.ShapeDtypeStruct((1, 1, chunk), dtype),
                   jax.ShapeDtypeStruct((1, 1, chunk), dtype),
                   jax.ShapeDtypeStruct((1, 1, chunk), jnp.int32)),
        # x, z, y update in place: inputs 15, 16, 17 -> outputs 0, 1, 2
        input_output_aliases={n_in - 7 + 3: 0, n_in - 7 + 4: 1,
                              n_in - 7 + 5: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )
    # one grid=1 launch per sub-batch: block dims == array dims keeps
    # Mosaic's lane-divisibility rule satisfied for ANY chunk size and
    # avoids double-buffering the large per-chunk state
    pieces = []
    for o in range(0, B, chunk):
        sl = slice(o, o + chunk)
        pieces.append(call(*shared_args, q[..., sl], l[..., sl],
                           u[..., sl], x[..., sl], z[..., sl],
                           y[..., sl], done[..., sl]))
    outs = [jnp.concatenate([p[i] for p in pieces], axis=-1)
            if len(pieces) > 1 else pieces[0][i] for i in range(8)]
    x_out, z, y, rp, rd, rp_den, rd_den, flags = outs
    return (x_out, z, y,
            rp[0, 0], rd[0, 0], rp_den[0, 0], rd_den[0, 0], flags[0, 0])


# ---------------------------------------------------------------------------
# fused iterate kernel (large nb): fori-loop matvecs under the spill budget
# ---------------------------------------------------------------------------

def _mv_fori(facT_ref, off, cnt, scr_ref, s, chunk, dtype,
             row0=0):
    """CR block matvec out_i = sum_j M[i,j] v_j as a fori loop over a
    SCRATCH-staged operand: the caller writes v into scr_ref[row0:row0+
    cnt] first; per-term reads are dynamic REF slices (Mosaic has no
    dynamic_slice on values) and the body keeps ONE live accumulator
    (the register allocator gives vector values ~no spill-slot reuse,
    so unrolled chains at nb~541 cost hundreds of MB of slots).  facT
    stores TRANSPOSED blocks (facT[g, j, i] = M[g, i, j]) so the
    contraction index rides the sublane dim."""

    def body(j, acc):
        Mj = jnp.swapaxes(facT_ref[off:off + cnt, pl.ds(j, 1), :], 1, 2)
        vj = scr_ref[row0:row0 + cnt, pl.ds(j, 1), :]
        return acc + Mj * vj

    return jax.lax.fori_loop(0, s, body,
                             jnp.zeros((cnt, s, chunk), dtype))


def _cr_solve_fori(ll_ref, facT_ref, meta, levels, b, s1_ref, s, chunk):
    """Cyclic-reduction solve with scratch-staged fori matvecs.  Every
    matvec slices the TRANSPOSED packed factor (facT); the only
    transposed product (L_left') reads a small dedicated pack of the
    UNtransposed L_left blocks (ll_ref) so the full untransposed factor
    never occupies VMEM."""
    dtype = b.dtype
    nb0 = b.shape[0]
    stack = []
    for lvm, shp in zip(meta['levels'], levels):
        if shp['nb_pad'] != shp['nb_in']:
            b = jnp.concatenate(
                [b, jnp.zeros((1, s, chunk), dtype)], axis=0)
        n2 = shp['n2']
        b4 = b.reshape(n2, 2, s, chunk)
        b_even = b4[:, 0]
        b_odd = b4[:, 1]
        oA, nA = lvm['A']
        oC, nC = lvm['C']
        s1_ref[0:n2] = b_odd
        if nA:
            bp_tail = b_even[1:] - _mv_fori(facT_ref, oA, nA, s1_ref,
                                            s, chunk, dtype)
            bp = jnp.concatenate([b_even[:1], bp_tail], axis=0)
        else:
            bp = b_even
        bp = bp - _mv_fori(facT_ref, oC, nC, s1_ref, s, chunk, dtype)
        stack.append(b_odd)
        b = bp
    oR = meta['root']
    s1_ref[0:1] = b
    x = _mv_fori(facT_ref, oR, 1, s1_ref, s, chunk, dtype)
    for lvm, shp, b_odd in zip(reversed(meta['levels']), reversed(levels),
                               reversed(stack)):
        n2 = shp['n2']
        x = x[:n2]
        oD, nD = lvm['Dinv_odd']
        oLe, nLe = lvm['L_even']
        oLl, nLl = lvm['L_left']
        s1_ref[0:n2] = x
        r = b_odd - _mv_fori(facT_ref, oLe, nLe, s1_ref, s, chunk, dtype)
        if nLl:
            # L_left' x[1:]: transposed product reads the dedicated
            # untransposed L_left pack (offsets from meta['lleft'])
            oL2 = lvm['lleft']

            def bodyT(j, acc, oL2=oL2, nLl=nLl):
                Mj = jnp.swapaxes(
                    ll_ref[oL2:oL2 + nLl, pl.ds(j, 1), :], 1, 2)
                vj = s1_ref[1:1 + nLl, pl.ds(j, 1), :]
                return acc + Mj * vj

            up = jax.lax.fori_loop(
                0, s, bodyT, jnp.zeros((nLl, s, chunk), dtype))
            r = jnp.concatenate([r[:nLl] - up, r[nLl:]], axis=0)
        s1_ref[0:n2] = r
        x_odd = _mv_fori(facT_ref, oD, nD, s1_ref, s, chunk, dtype)
        x = jnp.stack([x, x_odd], axis=1).reshape(2 * n2, s, chunk)
    return x[:nb0]


def _banded_iterate_kernel(cfg, meta, levels,
                           ll_ref, facT_ref, b0t_ref,
                           b1t_ref, b0tr_ref, b1tr_ref, dmt_ref, lm_ref,
                           lmt_ref, q_ref, l_ref, u_ref, x_ref, z_ref,
                           y_ref, ox_ref, oz_ref, oy_ref, s1_ref,
                           s3_ref):
    """check_interval fused ADMM iterations, large-nb variant: fori-loop
    matvecs over scratch-staged operands; residual checks and
    certificates stay in the XLA driver (once per chunk)."""
    (chunk, nb, s, r_max, sigma, alpha, check_interval, kkt_refine) = cfg
    dtype = q_ref.dtype
    zero1 = jnp.zeros((1, 1, chunk), dtype)

    def Av_rho(xb):
        # rho-scaled A x (the driver pre-scales these stores by the
        # CURRENT rho, folding every rho multiply out of the kernel);
        # xb staged in s1 (free after the CR solve)
        s1_ref[:] = xb

        def body(i, acc):
            b0i = jnp.swapaxes(b0tr_ref[:, pl.ds(i, 1), :], 1, 2)
            b1i = jnp.swapaxes(b1tr_ref[:, pl.ds(i, 1), :], 1, 2)
            xi = s1_ref[0:nb, pl.ds(i, 1), :]
            xhi = jnp.concatenate(
                [s1_ref[1:nb, pl.ds(i, 1), :], zero1], axis=0)
            return acc + b0i * xi + b1i * xhi

        return jax.lax.fori_loop(
            0, s, body, jnp.zeros((nb, r_max, chunk), dtype))

    def Atv(v):
        # i-loop over the COMPACT transposed stores: per term one
        # contraction over r via a product + sublane reduction (keeps
        # the big (nb, r_max, s) untransposed stores out of VMEM)
        s3_ref[:] = v

        def body(i, lh):
            lo, hi = lh
            b0i = jnp.swapaxes(b0t_ref[:, pl.ds(i, 1), :], 1, 2)
            b1i = jnp.swapaxes(b1t_ref[:, pl.ds(i, 1), :], 1, 2)
            vv = s3_ref[:]
            ti = jnp.sum(b0i * vv, axis=1, keepdims=True)
            ui = jnp.sum(b1i * vv, axis=1, keepdims=True)
            ei = (jax.lax.broadcasted_iota(jnp.int32, (1, s, 1), 1)
                  == i).astype(dtype)
            return (lo + ti * ei, hi + ui * ei)

        lo, hi = jax.lax.fori_loop(
            0, s, body,
            (jnp.zeros((nb, s, chunk), dtype),
             jnp.zeros((nb, s, chunk), dtype)))
        return jnp.concatenate([lo[:1], lo[1:] + hi[:nb - 1]], axis=0)

    def M_mv(xt):
        # banded M matvec: D_M (symmetric; dmt holds it as-is) + L_M
        s2_ref = s1_ref
        s2_ref[:] = xt

        def body(j, acc):
            Dj = jnp.swapaxes(dmt_ref[:, pl.ds(j, 1), :], 1, 2)
            xj = s1_ref[0:nb, pl.ds(j, 1), :]
            out = acc + Dj * xj
            # lo_i = L_i x_{i-1} at rows 1: (lmt = L transposed blocks)
            Lj = jnp.swapaxes(lmt_ref[:, pl.ds(j, 1), :], 1, 2)
            xlo = s1_ref[0:nb - 1, pl.ds(j, 1), :]
            out = out + jnp.concatenate(
                [jnp.zeros((1, s, chunk), dtype), Lj * xlo], axis=0)
            # up_i = L'_{i+1} x_{i+1} at rows :-1 (untransposed blocks)
            Uj = jnp.swapaxes(lm_ref[:, pl.ds(j, 1), :], 1, 2)
            xup = s1_ref[1:nb, pl.ds(j, 1), :]
            out = out + jnp.concatenate(
                [Uj * xup, jnp.zeros((1, s, chunk), dtype)], axis=0)
            return out

        return jax.lax.fori_loop(
            0, s, body, jnp.zeros((nb, s, chunk), dtype))

    def kkt_solve(rhs):
        xt = _cr_solve_fori(ll_ref, facT_ref, meta, levels, rhs,
                            s1_ref, s, chunk)
        for _ in range(kkt_refine):
            xt = xt + _cr_solve_fori(ll_ref, facT_ref, meta, levels,
                                     rhs - M_mv(xt), s1_ref, s, chunk)
        return xt

    def one_iter(_, carry):
        # rho-SCALED splitting state: zt_ = rho z, bounds and the Av
        # stores pre-scaled by rho driver-side -- every removed
        # row-space op is a 6.3MB Mosaic spill slot at nb=541
        x, zt_, y = carry
        rhs = sigma * x - q_ref[:] + Atv(zt_ - y)
        xt = kkt_solve(rhs)
        wt = alpha * Av_rho(xt) + (1.0 - alpha) * zt_ + y
        z1t = jnp.clip(wt, l_ref[:], u_ref[:])
        y1 = wt - z1t
        x1 = alpha * xt + (1.0 - alpha) * x
        return x1, z1t, y1

    xn, zn, yn = jax.lax.fori_loop(
        0, check_interval, one_iter, (x_ref[:], z_ref[:], y_ref[:]))
    ox_ref[:] = xn
    oz_ref[:] = zn
    oy_ref[:] = yn


def banded_iterate(fac_packed, ll_pack, meta, B0, B1, D_M, L_M, rho_g,
                   q, l, u, x, z, y, *, sigma, alpha, check_interval,
                   kkt_refine, chunk=128, interpret=False):
    """Run check_interval fused iterations (large-nb engine).

    EXPERIMENTAL: interpret-verified (tests/test_admm_banded_shared.py)
    but not yet deployed -- at nb=541 the Mosaic register allocator's
    scoped demand expands to fill any granted vmem limit (measured
    104MB limit -> 105.4MB demand, 107 -> 118.1) against a ~111MB
    total-program budget; landing it needs ~15% more intrinsic body
    shrinkage (see BENCH.md round-4 notes).  The shipping driver uses
    the CR-solve hybrid instead.

    Layouts as in banded_shared_chunk; rho_g (nb, r_max) shared.  x/z/y
    update in place via aliasing; sub-batches run SEQUENTIALLY via
    lax.map (concurrent pallas_calls stack their scoped VMEM).  Returns
    (x, z, y)."""
    nb, s, B = x.shape
    r_max = l.shape[1]
    dtype = x.dtype
    levels = cr_level_shapes(nb)
    chunk = min(chunk, B)
    assert B % chunk == 0, (B, chunk)
    cfg = (chunk, nb, s, r_max, float(sigma), float(alpha),
           int(check_interval), int(kkt_refine))

    def vspec():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    if kkt_refine == 0:
        # M never applied: placeholder inputs keep the spec count fixed
        # without allocating full banded-M VMEM
        D_Mk = jnp.zeros((1, s, s), dtype)
        L_Mk = jnp.zeros((1, s, s), dtype)
    else:
        D_Mk, L_Mk = D_M, L_M

    kern = functools.partial(_banded_iterate_kernel, cfg, meta, levels)
    call = pl.pallas_call(
        kern,
        in_specs=[vspec()] * 15,
        out_specs=tuple([vspec()] * 3),
        out_shape=(jax.ShapeDtypeStruct((nb, s, chunk), dtype),
                   jax.ShapeDtypeStruct((nb, r_max, chunk), dtype),
                   jax.ShapeDtypeStruct((nb, r_max, chunk), dtype)),
        input_output_aliases={12: 0, 13: 1, 14: 2},
        scratch_shapes=[pltpu.VMEM((nb, s, chunk), dtype),
                        pltpu.VMEM((nb, r_max, chunk), dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )
    rho3g = rho_g.astype(dtype)[:, :, None]
    shared = (ll_pack, jnp.swapaxes(fac_packed, 1, 2),
              jnp.swapaxes(B0, 1, 2), jnp.swapaxes(B1, 1, 2),
              jnp.swapaxes(B0 * rho3g, 1, 2),
              jnp.swapaxes(B1 * rho3g, 1, 2), D_Mk,
              L_Mk, jnp.swapaxes(L_Mk, 1, 2))
    if chunk == B:
        return call(*shared, q, l, u, x, z, y)
    nsub = B // chunk

    def split(a):
        return jnp.moveaxis(
            a.reshape(a.shape[:-1] + (nsub, chunk)), -2, 0)

    def unsplit(a):
        return jnp.moveaxis(a, 0, -2).reshape(
            a.shape[1:-1] + (B,))

    outs = jax.lax.map(
        lambda args: call(*shared, *args),
        tuple(split(a) for a in (q, l, u, x, z, y)))
    return tuple(unsplit(o) for o in outs)
