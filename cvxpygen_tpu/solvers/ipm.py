"""Batched conic-QP interior-point solver (JAX, jit/vmap-native).

TPU-native replacement for the reference's embedded conic solvers --
Clarabel (solvers/clarabel.py), ECOS (ecos.py), SCS (scs.py), QOCO
(qoco.py): one Mehrotra predictor-corrector primal-dual IPM with
Nesterov-Todd scalings over zero/nonneg/SOC cones, batched over parameter
instances, with a dense batched-LU KKT solve on the MXU instead of
per-instance sparse LDL (QDLDL/AMD).

Form (canon/canonicalizer.py convention):
    min 0.5 x'Px + q'x   s.t.  E x + f = 0,   G x + h = s,  s in K
    K = R+^l x SOC(d_1) x ... x SOC(d_k)
Duals: P x + q - E'nu - G'z = 0, z in K.

The cone layout (l, (d_1..d_k)) is static; all cone operations unroll at
trace time and vectorize over the batch.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class IPMSettings:
    max_iter: int = 50
    tol_feas: float = 1e-8
    tol_gap: float = 1e-8
    static_reg: float = 1e-10
    frac_to_boundary: float = 0.99
    refine_steps: int = 1


# ---------------------------------------------------------------------------
# batched cone calculus over static layout (l, socs)
# ---------------------------------------------------------------------------

def _soc_slices(l, socs):
    off = l
    out = []
    for d in socs:
        out.append((off, d))
        off += d
    return out


def cone_e(B, l, socs, dtype):
    parts = [jnp.ones((B, l), dtype)]
    for d in socs:
        e = jnp.zeros((B, d), dtype).at[:, 0].set(1.0)
        parts.append(e)
    return jnp.concatenate(parts, axis=1) if parts else jnp.zeros((B, 0), dtype)


def jprod(u, v, l, socs):
    parts = [u[:, :l] * v[:, :l]]
    for (o, d) in _soc_slices(l, socs):
        u0, u1 = u[:, o], u[:, o + 1:o + d]
        v0, v1 = v[:, o], v[:, o + 1:o + d]
        top = u0 * v0 + jnp.sum(u1 * v1, axis=1)
        rest = u0[:, None] * v1 + v0[:, None] * u1
        parts.append(jnp.concatenate([top[:, None], rest], axis=1))
    return jnp.concatenate(parts, axis=1)


def jdiv(lam, v, l, socs):
    """Solve lam o u = v (arrow-matrix inverse, closed form)."""
    parts = [v[:, :l] / lam[:, :l]]
    for (o, d) in _soc_slices(l, socs):
        l0, l1 = lam[:, o], lam[:, o + 1:o + d]
        v0, v1 = v[:, o], v[:, o + 1:o + d]
        det = l0 * l0 - jnp.sum(l1 * l1, axis=1)
        l1v1 = jnp.sum(l1 * v1, axis=1)
        u0 = (l0 * v0 - l1v1) / det
        u1 = (v1 - u0[:, None] * l1) / l0[:, None]
        parts.append(jnp.concatenate([u0[:, None], u1], axis=1))
    return jnp.concatenate(parts, axis=1)


class BatchNT:
    """Nesterov-Todd scaling W (W z = W^{-T} s = lambda), batched."""

    def __init__(self, s, z, l, socs):
        self.l, self.socs = l, socs
        self.d_nn = jnp.sqrt(s[:, :l] / z[:, :l])
        self.soc_params = []
        for (o, d) in _soc_slices(l, socs):
            ss, zz = s[:, o:o + d], z[:, o:o + d]
            det_s = ss[:, 0] ** 2 - jnp.sum(ss[:, 1:] ** 2, axis=1)
            det_z = zz[:, 0] ** 2 - jnp.sum(zz[:, 1:] ** 2, axis=1)
            sb = ss / jnp.sqrt(det_s)[:, None]
            zb = zz / jnp.sqrt(det_z)[:, None]
            gamma = jnp.sqrt((1.0 + jnp.sum(sb * zb, axis=1)) / 2.0)
            wb0 = (sb[:, 0] + zb[:, 0]) / (2 * gamma)
            wb1 = (sb[:, 1:] - zb[:, 1:]) / (2 * gamma[:, None])
            eta = (det_s / det_z) ** 0.25
            self.soc_params.append((wb0, wb1, eta, o, d))

    def _soc_apply(self, wb0, wb1, eta, v, inv):
        v0, v1 = v[:, 0], v[:, 1:]
        sgn = -1.0 if inv else 1.0
        w1v1 = jnp.sum(wb1 * v1, axis=1)
        out0 = wb0 * v0 + sgn * w1v1
        out1 = (sgn * v0[:, None] * wb1 + v1
                + (w1v1 / (1.0 + wb0))[:, None] * wb1)
        scale = (1.0 / eta) if inv else eta
        return jnp.concatenate([out0[:, None], out1], axis=1) * scale[:, None]

    def mul(self, v, inv=False):
        parts = [v[:, :self.l] * (1.0 / self.d_nn if inv else self.d_nn)]
        for (wb0, wb1, eta, o, d) in self.soc_params:
            parts.append(self._soc_apply(wb0, wb1, eta, v[:, o:o + d], inv))
        return jnp.concatenate(parts, axis=1)

    def wtw_dense(self, B, mc, dtype):
        """Dense W^2 (block diagonal) for KKT assembly.
        SOC block: W^2 = eta^2 (2 wb wb' - J)."""
        H = jnp.zeros((B, mc, mc), dtype)
        idx = jnp.arange(self.l)
        H = H.at[:, idx, idx].set(self.d_nn ** 2)
        for (wb0, wb1, eta, o, d) in self.soc_params:
            wb = jnp.concatenate([wb0[:, None], wb1], axis=1)  # (B, d)
            J = jnp.concatenate(
                [jnp.ones((1,), H.dtype), -jnp.ones((d - 1,), H.dtype)])
            blk = 2.0 * wb[:, :, None] * wb[:, None, :] - jnp.diag(J)[None]
            blk = blk * (eta ** 2)[:, None, None]
            H = H.at[:, o:o + d, o:o + d].set(blk)
        return H


def max_step_cone(v, dv, l, socs):
    """Largest alpha in (0, inf] with v + alpha dv in cone; batched."""
    big = jnp.asarray(1e20, v.dtype)
    alphas = [jnp.full((v.shape[0],), 1e20, v.dtype)]
    if l:
        neg = dv[:, :l] < 0
        cand = jnp.where(neg, -v[:, :l] / jnp.where(neg, dv[:, :l], -1.0), big)
        alphas.append(jnp.min(cand, axis=1))
    for (o, d) in _soc_slices(l, socs):
        t, x = v[:, o], v[:, o + 1:o + d]
        dt, dx = dv[:, o], dv[:, o + 1:o + d]
        a2 = dt * dt - jnp.sum(dx * dx, axis=1)
        a1 = t * dt - jnp.sum(x * dx, axis=1)
        a0 = t * t - jnp.sum(x * x, axis=1)
        disc = a1 * a1 - a2 * a0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        # roots of a2 r^2 + 2 a1 r + a0 = 0
        r1 = jnp.where(jnp.abs(a2) > 1e-14, (-a1 + sq) / a2, big)
        r2 = jnp.where(jnp.abs(a2) > 1e-14, (-a1 - sq) / a2, big)
        rl = jnp.where(jnp.abs(a2) <= 1e-14,
                       jnp.where(jnp.abs(a1) > 1e-14, -a0 / (2 * a1), big), big)
        rt = jnp.where(dt < 0, -t / jnp.where(dt < 0, dt, -1.0), big)

        def pos_or_big(r):
            return jnp.where((r > 1e-14) & jnp.isfinite(r), r, big)

        r1, r2, rl, rt = map(pos_or_big, (r1, r2, rl, rt))
        # boundary only counts if there is a real crossing
        no_cross = disc < 0
        rq = jnp.where(no_cross, big, jnp.minimum(r1, r2))
        # if the midpoint of [0, rq] stays interior for t-component, the
        # first quadratic root is the exit point; take min with t-root
        alpha_soc = jnp.minimum(rq, rt)
        # guard: if currently ON boundary heading inward, allow big
        alphas.append(jnp.where(no_cross & (dt >= 0), big, alpha_soc))
    out = alphas[0]
    for a in alphas[1:]:
        out = jnp.minimum(out, a)
    return out


# ---------------------------------------------------------------------------
# solver
# ---------------------------------------------------------------------------

def ipm_solve(P, q, E, f, G, h, l_nonneg: int, socs: Tuple[int, ...],
              settings: IPMSettings = IPMSettings()):
    """Solve a batch of conic QPs.  Returns dict(x, nu, z, s, obj, iters,
    gap, res_primal, res_dual, solved).  Full-f32 matmul precision on TPU
    (see admm_solve note)."""
    with jax.default_matmul_precision('highest'):
        return _ipm_solve_impl(P, q, E, f, G, h, l_nonneg, socs, settings)


def _ipm_solve_impl(P, q, E, f, G, h, l_nonneg, socs,
                    settings: IPMSettings = IPMSettings()):
    st = settings
    B, n = q.shape
    mz = E.shape[1] if E.ndim == 3 else 0
    mc = G.shape[1]
    dtype = P.dtype
    N = n + mz + mc

    e = cone_e(B, l_nonneg, socs, dtype)
    kdeg = l_nonneg + len(socs)

    x0 = jnp.zeros((B, n), dtype)
    nu0 = jnp.zeros((B, mz), dtype)
    s0 = e
    z0 = e

    I_n = jnp.eye(n, dtype=dtype)

    def residuals(x, nu, z, s):
        Px = jnp.einsum('bij,bj->bi', P, x)
        rx = Px + q - jnp.einsum('bij,bi->bj', G, z)
        if mz:
            rx = rx - jnp.einsum('bij,bi->bj', E, nu)
            ry = jnp.einsum('bij,bj->bi', E, x) + f
        else:
            ry = jnp.zeros((B, 0), dtype)
        rz = jnp.einsum('bij,bj->bi', G, x) + h - s
        return rx, ry, rz, Px

    def converged(rx, ry, rz, x, z, s, Px):
        obj = 0.5 * jnp.sum(x * Px, axis=1) + jnp.sum(q * x, axis=1)
        gap = jnp.abs(jnp.sum(s * z, axis=1))
        rp = jnp.maximum(
            jnp.linalg.norm(ry, axis=1) if mz else jnp.zeros((B,), dtype),
            jnp.linalg.norm(rz, axis=1))
        rd = jnp.linalg.norm(rx, axis=1)
        fnorm = (jnp.linalg.norm(h, axis=1)
                 + (jnp.linalg.norm(f, axis=1) if mz else 0.0))
        ok = ((rp < st.tol_feas * jnp.maximum(1.0, fnorm))
              & (rd < st.tol_feas * jnp.maximum(1.0, jnp.linalg.norm(q, axis=1)))
              & (gap < st.tol_gap * jnp.maximum(1.0, jnp.abs(obj))))
        return ok, rp, rd, gap

    def body(state):
        x, nu, z, s, it, done = state
        rx, ry, rz, Px = residuals(x, nu, z, s)
        mu = jnp.sum(s * z, axis=1) / kdeg

        W = BatchNT(s, z, l_nonneg, socs)
        lam = W.mul(z)
        H = W.wtw_dense(B, mc, dtype)

        K = jnp.zeros((B, N, N), dtype)
        K = K.at[:, :n, :n].set(P + st.static_reg * I_n)
        if mz:
            K = K.at[:, :n, n:n + mz].set(-jnp.swapaxes(E, 1, 2))
            K = K.at[:, n:n + mz, :n].set(E)
        K = K.at[:, :n, n + mz:].set(-jnp.swapaxes(G, 1, 2))
        K = K.at[:, n + mz:, :n].set(G)
        K = K.at[:, n + mz:, n + mz:].set(H)
        lu, piv = jax.scipy.linalg.lu_factor(K)

        def solve_dir(dtv):
            rhs = jnp.concatenate(
                [-rx, -ry, -rz + W.mul(jdiv(lam, dtv, l_nonneg, socs))],
                axis=1)
            sol = jax.scipy.linalg.lu_solve((lu, piv), rhs[..., None])[..., 0]
            dx = sol[:, :n]
            dnu = sol[:, n:n + mz]
            dz = sol[:, n + mz:]
            ds = jnp.einsum('bij,bj->bi', G, dx) + rz
            return dx, dnu, dz, ds

        lam2 = jprod(lam, lam, l_nonneg, socs)
        dx_a, dnu_a, dz_a, ds_a = solve_dir(-lam2)
        a_s = max_step_cone(s, ds_a, l_nonneg, socs)
        a_z = max_step_cone(z, dz_a, l_nonneg, socs)
        alpha_aff = jnp.minimum(1.0, jnp.minimum(a_s, a_z))
        mu_aff = jnp.sum((s + alpha_aff[:, None] * ds_a)
                         * (z + alpha_aff[:, None] * dz_a), axis=1) / kdeg
        sigma = jnp.clip((mu_aff / mu) ** 3, 1e-8, 1.0 - 1e-8)

        corr = jprod(W.mul(ds_a, inv=True), W.mul(dz_a), l_nonneg, socs)
        dtv = sigma[:, None] * mu[:, None] * e - lam2 - corr
        dx, dnu, dz, ds = solve_dir(dtv)

        a_s = max_step_cone(s, ds, l_nonneg, socs)
        a_z = max_step_cone(z, dz, l_nonneg, socs)
        alpha = jnp.minimum(1.0, st.frac_to_boundary * jnp.minimum(a_s, a_z))
        alpha = jnp.where(done, 0.0, alpha)  # freeze converged instances

        x = x + alpha[:, None] * dx
        nu = nu + alpha[:, None] * dnu if mz else nu
        z = z + alpha[:, None] * dz
        s = s + alpha[:, None] * ds
        it = it + 1

        rx2, ry2, rz2, Px2 = residuals(x, nu, z, s)
        ok, _, _, _ = converged(rx2, ry2, rz2, x, z, s, Px2)
        return x, nu, z, s, it, done | ok

    def cond(state):
        _, _, _, _, it, done = state
        return (~jnp.all(done)) & (it < st.max_iter)

    state0 = (x0, nu0, z0, s0, jnp.int32(0), jnp.zeros((B,), jnp.bool_))
    x, nu, z, s, it, done = jax.lax.while_loop(cond, body, state0)

    rx, ry, rz, Px = residuals(x, nu, z, s)
    ok, rp, rd, gap = converged(rx, ry, rz, x, z, s, Px)
    obj = 0.5 * jnp.sum(x * Px, axis=1) + jnp.sum(q * x, axis=1)
    return dict(x=x, nu=nu, z=z, s=s, obj=obj,
                iters=jnp.full((B,), it, jnp.int32), gap=gap,
                res_primal=rp, res_dual=rd, solved=done | ok)
