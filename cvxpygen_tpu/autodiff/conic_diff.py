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

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.cones import ConeLayout, svec_indices
from ..runtime.jax_family import JaxFamily, canon_batch
from ..solvers.ipm import IPMSettings, ipm_solve, _soc_slices


def make_conic_diff_solve(jf: JaxFamily, settings=None):
    """Differentiable batched conic solve: theta (B,p) -> dict(x, y, obj).
    y is the canonical dual [nu; z] (Family convention).

    Families with exp/PSD cones run the conic-ADMM forward (the only engine
    with those cones); the backward pass is engine-independent (diffcp
    sensitivity at the optimum)."""
    mz = jf.n_zero
    socs = jf.soc_dims
    l_nn = jf.n_nonneg
    layout = ConeLayout(n_nonneg=l_nn, socs=tuple(socs),
                        n_exp=jf.n_exp, psds=tuple(jf.psd_dims),
                        pows=tuple(getattr(jf, 'pow_alphas', ()) or ()))
    exotic = bool(jf.n_exp or jf.psd_dims or layout.pows)

    if exotic:
        from ..solvers.conic_admm import (ConicADMMSettings,
                                          conic_admm_solve)
        settings = settings or ConicADMMSettings()

        def fwd_raw(theta):
            data = canon_batch(jf, theta)
            A, b = data['A'], data['b']
            res = conic_admm_solve(data['P'], data['q'], A, b, mz, layout,
                                   settings)
            y_canon = -res['y']
            out = dict(x=res['x'], obj=res['obj'],
                       nu=y_canon[:, :mz], z=y_canon[:, mz:],
                       s=res['z'][:, mz:] + b[:, mz:],
                       P=data['P'], q=data['q'],
                       E=A[:, :mz], G=A[:, mz:], d=data['d'])
            return out
    else:
        settings = settings or IPMSettings()

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

        DP = _proj_jacobian(s - z, layout, dtype)  # (B, mc, mc)
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
        # TPU has no f64 LU lowering; factor in f32 there and refine the
        # transpose solve in the working dtype (mixed-precision refinement)
        fac_dtype = (jnp.float32
                     if (dtype == jnp.float64
                         and jax.default_backend() == 'tpu') else dtype)
        lu, piv = jax.scipy.linalg.lu_factor(K.astype(fac_dtype))

        def kkt_solve_t(r):
            return jax.scipy.linalg.lu_solve(
                (lu, piv), r.astype(fac_dtype)[..., None],
                trans=1)[..., 0].astype(dtype)

        w = kkt_solve_t(rhs)
        if fac_dtype != dtype:
            Kt = jnp.swapaxes(K, 1, 2)
            for _ in range(3):
                r = rhs - jnp.einsum('bij,bj->bi', Kt, w)
                w = w + kkt_solve_t(r)
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


def _proj_jacobian(u, layout: ConeLayout, dtype):
    """Derivative of Proj_K at u, block diagonal (B, mc, mc).

    nonneg: diag(u > 0).
    SOC (t, w): identity if ||w|| <= t; zero if ||w|| <= -t; else
        DP = 0.5 [[1, wb'], [wb, (1 + t/||w||) I - (t/||w||) wb wb']].
    EXP: implicit differentiation of the boundary-projection KKT
        (see _exp_proj_jacobian).
    PSD (svec): Daleckii-Krein divided differences of ReLU on the spectrum.
    """
    B, mc = u.shape
    DP = jnp.zeros((B, mc, mc), dtype)
    l_nn = layout.n_nonneg
    if l_nn:
        idx = jnp.arange(l_nn)
        DP = DP.at[:, idx, idx].set((u[:, :l_nn] > 0).astype(dtype))
    for (o, d) in _soc_slices(l_nn, layout.socs):
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
    off = l_nn + int(sum(layout.socs))
    if layout.n_exp:
        tri = u[:, off:off + 3 * layout.n_exp].reshape(B * layout.n_exp, 3)
        blk = _exp_proj_jacobian(tri, dtype)  # (B*ne, 3, 3)
        blk = blk.reshape(B, layout.n_exp, 3, 3)
        for k in range(layout.n_exp):
            o = off + 3 * k
            DP = DP.at[:, o:o + 3, o:o + 3].set(blk[:, k])
        off += 3 * layout.n_exp
    for s_dim in layout.psds:
        k = s_dim * (s_dim + 1) // 2
        DP = DP.at[:, off:off + k, off:off + k].set(
            _psd_proj_jacobian(u[:, off:off + k], s_dim, dtype))
        off += k
    for a in layout.pows:
        tri = u[:, off:off + 3]
        DP = DP.at[:, off:off + 3, off:off + 3].set(
            _pow_proj_jacobian(tri, a, dtype))
        off += 3
    return DP


def _exp_proj_jacobian(u, dtype):
    """DProj_{K_exp}(u) for triples u (N, 3).

    Boundary case by the implicit function theorem on the projection KKT
    x - u + mu grad f(x) = 0, f(x) = x2 e^{x1/x2} - x3 = 0:
        DP = S^-1 - (S^-1 g g' S^-1) / (g' S^-1 g),   S = I + mu H(x)
    with g = grad f, H = hess f.  Interior -> I, polar -> 0, face cases ->
    the diagonal mask of the face."""
    from ..ops.cones import _proj_exp_block

    N = u.shape[0]
    x = _proj_exp_block(u)                      # (N, 3) projection
    r, s_, t = u[:, 0], u[:, 1], u[:, 2]
    x1, x2, x3 = x[:, 0], x[:, 1], x[:, 2]
    mu = x3 - t                                 # multiplier >= 0

    tol = 1e-7
    nrm = jnp.maximum(jnp.linalg.norm(u, axis=1), 1e-30)
    # same case analysis as the projection (ops/cones.py)
    interior = jnp.linalg.norm(x - u, axis=1) <= tol * nrm
    polar = jnp.linalg.norm(x, axis=1) <= tol * nrm
    face = x2 <= tol * nrm                      # projection on the x2=0 face

    x2s = jnp.maximum(x2, 1e-30)
    alpha = x1 / x2s
    ea = jnp.exp(jnp.clip(alpha, -60.0, 60.0))
    g = jnp.stack([ea, ea * (1.0 - alpha), -jnp.ones_like(ea)], axis=1)
    # hess f = (e^a / x2) [[1, -a, 0], [-a, a^2, 0], [0, 0, 0]]
    hcoef = mu * ea / x2s
    S = jnp.zeros((N, 3, 3), dtype)
    S = S.at[:, 0, 0].set(1.0 + hcoef)
    S = S.at[:, 0, 1].set(-hcoef * alpha)
    S = S.at[:, 1, 0].set(-hcoef * alpha)
    S = S.at[:, 1, 1].set(1.0 + hcoef * alpha * alpha)
    S = S.at[:, 2, 2].set(1.0)
    Sinv = jnp.linalg.inv(S)
    Sg = jnp.einsum('nij,nj->ni', Sinv, g)
    denom = jnp.maximum(jnp.einsum('ni,ni->n', g, Sg), 1e-30)
    DP = Sinv - Sg[:, :, None] * Sg[:, None, :] / denom[:, None, None]

    I3 = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (N, 3, 3))
    face_mask = jnp.stack([(x1 < -tol * nrm).astype(dtype),
                           jnp.zeros((N,), dtype),
                           (x3 > tol * nrm).astype(dtype)], axis=1)
    DP_face = I3 * face_mask[:, :, None]
    DP = jnp.where(face[:, None, None], DP_face, DP)
    DP = jnp.where(polar[:, None, None], jnp.zeros_like(DP), DP)
    DP = jnp.where(interior[:, None, None], I3, DP)
    return DP


def _pow_proj_jacobian(u, a, dtype):
    """DProj_{K_pow(a)}(u) for triples u (B, 3), closing the r1
    NotImplementedError (VERDICT r1 item 8).

    Same implicit-function-theorem construction as the exp cone
    (_exp_proj_jacobian): the boundary projection solves
        x - u + mu grad f(x) = 0,  f(x) = |x3| - x1^a x2^(1-a) = 0
    (smooth near the projection: x1, x2 > 0, x3 != 0 there), so
        DP = S^{-1} - (S^{-1} g g' S^{-1}) / (g' S^{-1} g),  S = I + mu H.
    Interior -> I; polar cone -> 0; u3 ~ 0 face (proj = (u1+, u2+, 0)) ->
    diag(u1>0, u2>0, 0).  Mirrors the case split of the projection itself
    (ops/cones.py _proj_pow_block, Hien 2015)."""
    from ..ops.cones import _proj_pow_block

    B = u.shape[0]
    x = _proj_pow_block(u, a)
    u1, u2, u3 = u[:, 0], u[:, 1], u[:, 2]
    x1, x2, x3 = x[:, 0], x[:, 1], x[:, 2]
    mu = jnp.abs(u3) - jnp.abs(x3)             # multiplier >= 0 off-cone

    tol = 1e-7
    nrm = jnp.maximum(jnp.linalg.norm(u, axis=1), 1e-30)
    interior = jnp.linalg.norm(x - u, axis=1) <= tol * nrm
    polar = jnp.linalg.norm(x, axis=1) <= tol * nrm
    degenerate = jnp.abs(u3) <= tol * nrm

    x1s = jnp.maximum(x1, 1e-30)
    x2s = jnp.maximum(x2, 1e-30)
    pw = x1s ** a * x2s ** (1.0 - a)
    # g = grad f, H = hess f of f = |x3| - x1^a x2^(1-a)
    g1 = -a * pw / x1s
    g2 = -(1.0 - a) * pw / x2s
    g3 = jnp.sign(x3)
    g = jnp.stack([g1, g2, g3], axis=1)
    h11 = a * (1.0 - a) * pw / (x1s * x1s)
    h12 = -a * (1.0 - a) * pw / (x1s * x2s)
    h22 = a * (1.0 - a) * pw / (x2s * x2s)
    S = jnp.zeros((B, 3, 3), dtype)
    S = S.at[:, 0, 0].set(1.0 + mu * h11)
    S = S.at[:, 0, 1].set(mu * h12)
    S = S.at[:, 1, 0].set(mu * h12)
    S = S.at[:, 1, 1].set(1.0 + mu * h22)
    S = S.at[:, 2, 2].set(1.0)
    Sinv = jnp.linalg.inv(S)
    Sg = jnp.einsum('nij,nj->ni', Sinv, g)
    denom = jnp.maximum(jnp.einsum('ni,ni->n', g, Sg), 1e-30)
    DP = Sinv - Sg[:, :, None] * Sg[:, None, :] / denom[:, None, None]

    I3 = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (B, 3, 3))
    face_mask = jnp.stack([(u1 > tol * nrm).astype(dtype),
                           (u2 > tol * nrm).astype(dtype),
                           jnp.zeros((B,), dtype)], axis=1)
    DP_face = I3 * face_mask[:, :, None]
    DP = jnp.where(degenerate[:, None, None], DP_face, DP)
    DP = jnp.where(polar[:, None, None], jnp.zeros_like(DP), DP)
    DP = jnp.where(interior[:, None, None], I3, DP)
    return DP


def _psd_proj_jacobian(w, s_dim, dtype):
    """DProj_{PSD}(w) in svec coordinates (B, k, k): Daleckii-Krein
    formula DP[H] = Q (Gamma o (Q' H Q)) Q' with
    Gamma_ij = relu-divided-differences of the spectrum."""
    B = w.shape[0]
    k = s_dim * (s_dim + 1) // 2
    r, c, sc = svec_indices(s_dim)
    scj = jnp.asarray(sc, dtype)
    vals = w / scj
    X = jnp.zeros((B, s_dim, s_dim), dtype)
    X = X.at[:, r, c].set(vals)
    X = X.at[:, c, r].set(vals)
    lam, Q = jnp.linalg.eigh(X)
    lp = jnp.maximum(lam, 0.0)
    dl = lam[:, :, None] - lam[:, None, :]
    same = jnp.abs(dl) <= 1e-10 * jnp.maximum(
        1.0, jnp.abs(lam[:, :, None]) + jnp.abs(lam[:, None, :]))
    gamma = jnp.where(same,
                      jnp.where(lam[:, :, None] > 0, 1.0, 0.0),
                      (lp[:, :, None] - lp[:, None, :])
                      / jnp.where(same, 1.0, dl))
    # svec basis tensor U (k, s, s), constant
    U = np.zeros((k, s_dim, s_dim))
    for a in range(k):
        i, j, sa = r[a], c[a], sc[a]
        U[a, i, j] += 1.0 / sa
        if i != j:
            U[a, j, i] += 1.0 / sa
    Uj = jnp.asarray(U, dtype)
    # columns of DP: svec( Q (gamma o (Q' U_a Q)) Q' )
    T1 = jnp.einsum('bpi,apq,bqj->baij', Q, Uj, Q)
    T2 = gamma[:, None] * T1
    T3 = jnp.einsum('bip,bapq,bjq->baij', Q, T2, Q)
    DP = T3[:, :, r, c] * scj[None, None, :]          # (B, a_col, row)
    return jnp.swapaxes(DP, 1, 2)
