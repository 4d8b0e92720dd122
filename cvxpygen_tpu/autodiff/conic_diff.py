"""Implicit differentiation of the conic-QP solution map (SOCP families).

The reference differentiates conic-solved problems via a two-stage
construction: re-canonicalize to an OSQP-form QP whose parameters are the
conic solver's canonical data, and run the QP gradient on that
(reference canonicalizer.py:54-65,334-406; writer.py:145-312).  Because we
own the conic IPM, we differentiate the conic KKT system directly instead:
at the solution, the Newton system with the final Nesterov-Todd scaling IS
the sensitivity system, so the backward pass is one transpose KKT solve.

Derivation (diffcp-style, Busseti et al.): parameterize the cone
complementarity via u = s - z with s = Proj_K(u), z = Proj_K(u) - u; then
ds = DP du, dz = (DP - I) du where DP = DProj_K(u) (closed form for
nonneg/SOC).  The sensitivity system is
    K = [[P, -E', G'(I - DP)], [E, 0, 0], [G, 0, -DP]]
and with the adjoint w = K^{-T} [gx; 0; 0] = [wx; wnu; wu]:
    dL/dq = -wx                    dL/dP = -(wx x' + x wx')/2
    dL/dE = nu wx' - wnu x'        dL/df = -wnu
    dL/dG = z wx' - wu x'          dL/dh = -wu
(The IPM's NT-scaled KKT is NOT the correct linearization at an active SOC
boundary -- verified numerically against finite differences.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..runtime.jax_family import JaxFamily, canon_batch
from ..solvers.ipm import IPMSettings, ipm_solve, _soc_slices


def make_conic_diff_solve(jf: JaxFamily, settings: IPMSettings = None):
    """Differentiable batched conic solve: theta (B,p) -> dict(x, y, obj).
    y is the canonical dual [nu; z] (Family convention)."""
    settings = settings or IPMSettings()
    mz = jf.n_zero
    socs = jf.soc_dims
    l_nn = jf.n_nonneg

    def fwd_raw(theta):
        data = canon_batch(jf, theta)
        A, b = data['A'], data['b']
        E, f = A[:, :mz], b[:, :mz]
        G, h = A[:, mz:], b[:, mz:]
        res = ipm_solve(data['P'], data['q'], E, f, G, h, l_nn, socs,
                        settings)
        res.update(P=data['P'], q=data['q'], E=E, G=G, d=data['d'])
        return res

    @jax.custom_vjp
    def solve(theta):
        out = fwd_raw(theta)
        y = jnp.concatenate([out['nu'], out['z']], axis=1)
        return dict(x=out['x'], y=y, obj=out['obj'] + out['d'])

    def solve_fwd(theta):
        out = fwd_raw(theta)
        y = jnp.concatenate([out['nu'], out['z']], axis=1)
        primal = dict(x=out['x'], y=y, obj=out['obj'] + out['d'])
        resid = (theta, out['x'], out['nu'], out['z'], out['s'],
                 out['P'], out['q'], out['E'], out['G'])
        return primal, resid

    def solve_bwd(resid, g):
        theta, x, nu, z, s, P, q, E, G = resid
        B, n = x.shape
        mc = z.shape[1]
        dtype = x.dtype
        gx = g['x']
        gobj = g['obj']

        Px = jnp.einsum('bij,bj->bi', P, x)
        gx = gx + gobj[:, None] * (Px + q)

        DP = _proj_jacobian(s - z, l_nn, socs, dtype)  # (B, mc, mc)
        Gt = jnp.swapaxes(G, 1, 2)
        I_mc = jnp.eye(mc, dtype=dtype)

        N = n + mz + mc
        K = jnp.zeros((B, N, N), dtype)
        K = K.at[:, :n, :n].set(P + 1e-12 * jnp.eye(n, dtype=dtype))
        if mz:
            K = K.at[:, :n, n:n + mz].set(-jnp.swapaxes(E, 1, 2))
            K = K.at[:, n:n + mz, :n].set(E)
        K = K.at[:, :n, n + mz:].set(jnp.einsum('bij,bjk->bik', Gt, I_mc - DP))
        K = K.at[:, n + mz:, :n].set(G)
        K = K.at[:, n + mz:, n + mz:].set(-DP - 1e-12 * I_mc)

        rhs = jnp.concatenate(
            [gx, jnp.zeros((B, mz + mc), dtype)], axis=1)
        lu, piv = jax.scipy.linalg.lu_factor(K)
        w = jax.scipy.linalg.lu_solve((lu, piv), rhs[..., None],
                                      trans=1)[..., 0]
        wx = w[:, :n]
        wnu = w[:, n:n + mz]
        wu = w[:, n + mz:]

        dq = -wx
        dP = -0.5 * (wx[:, :, None] * x[:, None, :]
                     + x[:, :, None] * wx[:, None, :])
        dE = (nu[:, :, None] * wx[:, None, :]
              - wnu[:, :, None] * x[:, None, :]) if mz else \
            jnp.zeros((B, 0, n), dtype)
        df = -wnu
        dG = (z[:, :, None] * wx[:, None, :] - wu[:, :, None] * x[:, None, :])
        dh = -wu

        # objective explicit terms
        dP = dP + gobj[:, None, None] * 0.5 * (x[:, :, None] * x[:, None, :])
        dq = dq + gobj[:, None] * x
        dd = gobj

        dA = jnp.concatenate([dE, dG], axis=1)
        db = jnp.concatenate([df, dh], axis=1)
        m = jf.m
        if jf.dense_mode:
            dPv = dP.reshape(B, n * n)
            dAv = dA.reshape(B, m * n)
        else:
            dPv = dP[:, jf.P_ij[:, 0], jf.P_ij[:, 1]]
            dAv = dA[:, jf.A_ij[:, 0], jf.A_ij[:, 1]]
        dvals = jnp.concatenate([dPv, dq, dd[:, None], dAv, db], axis=1)
        dtt = dvals @ jf.maps
        if jf.d_quad is not None:
            tt = jnp.concatenate(
                [theta, jnp.ones((theta.shape[0], 1), theta.dtype)], axis=1)
            dtt = dtt + gobj[:, None] * (tt @ (jf.d_quad + jf.d_quad.T))
        return (dtt[:, :-1],)

    solve.defvjp(solve_fwd, solve_bwd)
    return solve


def _proj_jacobian(u, l_nn, socs, dtype):
    """Derivative of Proj_K at u, block diagonal (B, mc, mc).

    nonneg: diag(u > 0).  SOC (t, w): identity if ||w|| <= t; zero if
    ||w|| <= -t; else the boundary formula
        DP = 0.5 [[1, wb'], [wb, (1 + t/||w||) I - (t/||w||) wb wb']].
    """
    B, mc = u.shape
    DP = jnp.zeros((B, mc, mc), dtype)
    if l_nn:
        idx = jnp.arange(l_nn)
        DP = DP.at[:, idx, idx].set((u[:, :l_nn] > 0).astype(dtype))
    for (o, d) in _soc_slices(l_nn, socs):
        t = u[:, o]
        w = u[:, o + 1:o + d]
        nw = jnp.linalg.norm(w, axis=1)
        nw_safe = jnp.maximum(nw, 1e-30)
        wb = w / nw_safe[:, None]
        blk = jnp.zeros((B, d, d), dtype)
        blk = blk.at[:, 0, 0].set(0.5)
        blk = blk.at[:, 0, 1:].set(0.5 * wb)
        blk = blk.at[:, 1:, 0].set(0.5 * wb)
        eye = jnp.eye(d - 1, dtype=dtype)
        blk = blk.at[:, 1:, 1:].set(
            0.5 * ((1 + t / nw_safe)[:, None, None] * eye
                   - (t / nw_safe)[:, None, None]
                   * wb[:, :, None] * wb[:, None, :]))
        interior = nw <= t
        polar = nw <= -t
        I_d = jnp.broadcast_to(jnp.eye(d, dtype=dtype), (B, d, d))
        blk = jnp.where(interior[:, None, None], I_d, blk)
        blk = jnp.where(polar[:, None, None], jnp.zeros_like(blk), blk)
        DP = DP.at[:, o:o + d, o:o + d].set(blk)
    return DP
