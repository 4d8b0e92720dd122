"""Batched conic-QP interior-point solver (JAX, jit/vmap-native).

TPU-native replacement for the reference's embedded conic solvers --
Clarabel (solvers/clarabel.py), ECOS (ecos.py), QOCO (qoco.py): one
Mehrotra predictor-corrector primal-dual IPM with Nesterov-Todd scalings
over zero/nonneg/SOC cones, batched over parameter instances.

Clarabel-grade features (reference clarabel.py:63-119 settings surface):
- Ruiz equilibration with block-uniform scales on SOC rows
  (``equilibrate_enable``/``equilibrate_max_iter`` role);
- iterative refinement of every KKT solve against the unregularized
  system (``iterative_refinement_*`` role) -- this is what makes f32 TPU
  execution reach 1e-5-grade tolerances;
- primal/dual infeasibility certificates + status codes (reference
  status surface utils.py:977-985: 'infeasible'/'unbounded');
- per-instance iteration counts and instance freezing.

KKT solve modes (``kkt_solver``):
- ``'lu'``: batched LU on the full quasi-definite 3x3 system -- robust,
  the CPU/x64 default;
- ``'schur'``: TPU-native block elimination.  H = W'W is inverted in
  closed form per cone block, dz is eliminated, the SPD Schur complement
  S = P + G' H^{-1} G is inverted by Newton-Schulz (pure MXU matmuls,
  warm-started across IPM iterations), and the equality block by a second
  small Schur complement.  No LAPACK-style factorization anywhere -- the
  TPU-first choice (XLA's batched LU/Cholesky lowering is catastrophically
  slow on TPU at these batch sizes, see solvers/admm.py).
- ``'auto'``: 'schur' on TPU, 'lu' elsewhere.

Form (canon/canonicalizer.py convention):
    min 0.5 x'Px + q'x   s.t.  E x + f = 0,   G x + h = s,  s in K
    K = R+^l x SOC(d_1..d_k) x EXP^ne x PSD(s_1..) x POW(a_1..)
Duals: P x + q - E'nu - G'z = 0, z in K*.

Symmetric blocks (nonneg/SOC) use Nesterov-Todd scalings with the full
Mehrotra corrector; exponential / power / PSD blocks use the
dual-barrier-Hessian scaling H = mu grad^2 F*(z) (PSD: NT geometric-mean
scaling) with a sigma-weighted centering RHS -- the ECOS-exp-style
nonsymmetric extension (see solvers/ipm_cones.py).  This covers the
reference Clarabel interface's full cone list
(cvxpygen/solvers/clarabel.py:133-155); reference ECOS rejects exp cones
(ecos.py:121-125) but this engine accepts them for every IPM alias.

The cone layout is static; all cone operations unroll at trace time and
vectorize over the batch.
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
    tol_infeas: float = 1e-8
    static_reg: float = 1e-10
    frac_to_boundary: float = 0.99
    refine_steps: int = 1
    scaling: int = 10            # Ruiz iterations (0 disables)
    kkt_solver: str = 'auto'  # 'lu'|'schur'|'schur_chol'|'schur_lu'|'auto'
    ns_iters: int = 24           # cold Newton-Schulz iterations ('schur')
    ns_warm_iters: int = 12      # warm restart across IPM iterations
    # nonsymmetric-cone (exp/pow) neighborhood (solvers/ipm_cones.py).
    # Swept on the 32-exp-cone entropy family (B=256): beta in [1.5, 3]
    # with a 0.85-0.95 boundary fraction solves 100% in ~11 iters; the
    # symmetric 0.99 boundary fraction or a tight beta strand ~7-25% of
    # instances (BENCH.md)
    exotic_beta: float = 2.0
    exotic_shrink: float = 0.7
    exotic_backtracks: int = 12
    exotic_frac_to_boundary: float = 0.9
    exotic_scaling: str = 'pd'   # 'pd' (two-secant) | 'dual' (mu H*(z))
    # 'ldl' KKT mode: dynamic pivot-regularization floor (0 = dtype auto,
    # ~0.1 sqrt(eps); see ops/ldl_batched.py)
    ldl_dyn_delta: float = 0.0
    # 'ldl' mode: apply the explicit inverse of the regularized K (one
    # multi-RHS sweep per factorization, then einsum per solve) instead
    # of panel-sweep solves -- the TPU-fast choice (sweeps are
    # launch-bound); accuracy is equivalent because cond(K') is capped
    # by the dynamic regularization and refinement targets the true K
    ldl_inverse: bool = True
    # 'ldl' mode: two-level fixed-Schur factorization.  P/E/G are
    # loop-invariant after equilibration -- only the cone-scaling block
    # H changes per IPM iteration -- so the (n+mz) saddle block is
    # factored ONCE per solve and each iteration only factors the
    # (mc, mc) Schur complement S = H + C' Ktop^{-1} C.  Only sound
    # when the top block is genuinely well-conditioned (P > 0): with
    # P = 0 the top block is the static_reg-scaled saddle, Ktop^{-1}
    # carries 1/reg-scale entries, and T = C'Ktop^{-1}C drowns H --
    # measured on the entropy family (P = 0, f32 TPU): frac_solved
    # drops 1.0 -> 0.95 and iterations double.  Hence OPT-IN; the
    # default full-K factorization handles every layout.
    ldl_two_level: bool = False
    # HSDE infeasibility post-pass iteration budget (exotic P=0 layouts
    # only; solvers/ipm_hsde.py).  LATENCY NOTE: the pass runs under
    # lax.cond whenever ANY instance is still status 0 at max_iter --
    # including feasible-but-slow ones -- so a batch with one straggler
    # pays `hsde_iters` extra full-KKT iterations on the whole batch.
    # 50 is enough for the Farkas ray to dominate (kappa > 10 tau) on
    # every tested infeasible family; it deliberately does NOT scale
    # with max_iter (ADVICE r3: max(40, max_iter) doubled worst-case
    # latency).  0 disables the pass.
    hsde_iters: int = 50

    @classmethod
    def for_dtype(cls, dtype, **overrides):
        """Defaults reachable at the given precision.  f32 floors: KKT
        solves with refinement bottom out ~1e-5, but TPU bf16-pass matmul
        noise leaves ~2% of SOCP instances unconverged at 1e-5 (swept on
        the ADP family, BENCH.md) -- 3e-5 achieves frac_solved 1.0 at
        defaults, no bench-side overrides needed."""
        if jnp.dtype(dtype) == jnp.float32:
            base = dict(tol_feas=3e-5, tol_gap=3e-5, tol_infeas=1e-6,
                        static_reg=1e-8, refine_steps=2)
        else:
            base = {}
        base.update(overrides)
        return cls(**base)


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


def cone_dist(v, l, socs):
    """Per-instance violation measure of v vs K (inf norm of the negative
    part / SOC violation) -- used by the dual-infeasibility certificate:
    an unbounded direction dx must keep s = G x + h in K, i.e. G dx must
    lie in K's recession cone = K."""
    parts = []
    if l:
        parts.append(jnp.max(jnp.maximum(-v[:, :l], 0.0), axis=1))
    for (o, d) in _soc_slices(l, socs):
        # v in SOC  <=>  v0 >= ||v1||
        viol = jnp.linalg.norm(v[:, o + 1:o + d], axis=1) - v[:, o]
        parts.append(jnp.maximum(viol, 0.0))
    if not parts:
        return jnp.zeros((v.shape[0],), v.dtype)
    out = parts[0]
    for p in parts[1:]:
        out = jnp.maximum(out, p)
    return out


class BatchNT:
    """Nesterov-Todd scaling W (W z = W^{-T} s = lambda), batched."""

    def __init__(self, s, z, l, socs):
        self.l, self.socs = l, socs
        tiny = jnp.asarray(jnp.finfo(s.dtype).tiny, s.dtype)
        self.d_nn = jnp.sqrt(jnp.maximum(s[:, :l], tiny)
                             / jnp.maximum(z[:, :l], tiny))
        self.soc_params = []
        for (o, d) in _soc_slices(l, socs):
            ss, zz = s[:, o:o + d], z[:, o:o + d]
            # clamp the Jordan determinants to a positive floor: near the
            # boundary the f32 cancellation s0^2 - ||s1||^2 can go exactly
            # 0 or negative, and sqrt then poisons every direction with
            # NaN (a frozen/converged instance would otherwise take the
            # whole batch's step computation down)
            det_s = jnp.maximum(
                ss[:, 0] ** 2 - jnp.sum(ss[:, 1:] ** 2, axis=1), tiny)
            det_z = jnp.maximum(
                zz[:, 0] ** 2 - jnp.sum(zz[:, 1:] ** 2, axis=1), tiny)
            sb = ss / jnp.sqrt(det_s)[:, None]
            zb = zz / jnp.sqrt(det_z)[:, None]
            gamma = jnp.sqrt(jnp.maximum(
                (1.0 + jnp.sum(sb * zb, axis=1)) / 2.0, tiny))
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

    def wtw_dense(self, B, mc, dtype, inv=False):
        """Dense W^2 (or W^{-2}) block-diagonal matrix for KKT assembly.

        SOC block: W^2 = eta^2 (2 wb wb' - J); closed-form inverse
        (Sherman-Morrison on -J + 2 wb wb', using wb'J wb = 1):
        W^{-2} = eta^{-2} (2 (J wb)(J wb)' - J)."""
        H = jnp.zeros((B, mc, mc), dtype)
        idx = jnp.arange(self.l)
        dd = self.d_nn ** (-2 if inv else 2)
        H = H.at[:, idx, idx].set(dd)
        for (wb0, wb1, eta, o, d) in self.soc_params:
            wb = jnp.concatenate([wb0[:, None], wb1], axis=1)  # (B, d)
            J = jnp.concatenate(
                [jnp.ones((1,), H.dtype), -jnp.ones((d - 1,), H.dtype)])
            if inv:
                wb = wb * J[None, :]  # J wb
            blk = 2.0 * wb[:, :, None] * wb[:, None, :] - jnp.diag(J)[None]
            sc = eta ** (-2 if inv else 2)
            H = H.at[:, o:o + d, o:o + d].set(blk * sc[:, None, None])
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
# Ruiz equilibration (block-uniform on SOC rows)
# ---------------------------------------------------------------------------

def ruiz_equilibrate_ipm(P, q, E, f, G, h, blocks, iters):
    """Modified Ruiz on the stacked [E; G] rows + P columns + cost scaling,
    with one shared scale per cone block (SOC/exp/PSD/pow -- cone
    invariance requires a uniform positive scale within each block).
    Returns scaled data + (c, D, Ef, Eg) unscaling factors.  Mirrors
    solvers/conic_admm.py ruiz_equilibrate_conic."""
    B, n = q.shape
    mz = E.shape[1]
    mc = G.shape[1]
    dtype = P.dtype
    c = jnp.ones((B,), dtype)
    D = jnp.ones((B, n), dtype)
    Ef = jnp.ones((B, mz), dtype)
    Eg = jnp.ones((B, mc), dtype)
    for _ in range(iters):
        nx_P = jnp.max(jnp.abs(P), axis=1)
        nx_E = jnp.max(jnp.abs(E), axis=1) if mz else jnp.zeros_like(nx_P)
        nx_G = jnp.max(jnp.abs(G), axis=1) if mc else jnp.zeros_like(nx_P)
        nx = jnp.maximum(nx_P, jnp.maximum(nx_E, nx_G))
        dx = jnp.where(nx > 1e-12,
                       1.0 / jnp.sqrt(jnp.maximum(nx, 1e-12)), 1.0)
        dx = jnp.clip(dx, 1e-4, 1e4)
        if mz:
            ne = jnp.max(jnp.abs(E), axis=2)
            de = jnp.clip(jnp.where(ne > 1e-12,
                                    1.0 / jnp.sqrt(jnp.maximum(ne, 1e-12)),
                                    1.0), 1e-4, 1e4)
        else:
            de = jnp.ones((B, 0), dtype)
        ng = jnp.max(jnp.abs(G), axis=2)
        dg = jnp.clip(jnp.where(ng > 1e-12,
                                1.0 / jnp.sqrt(jnp.maximum(ng, 1e-12)), 1.0),
                      1e-4, 1e4)
        for (o, L) in blocks:
            gmean = jnp.exp(jnp.mean(jnp.log(dg[:, o:o + L]), axis=1))
            dg = dg.at[:, o:o + L].set(gmean[:, None])
        P = dx[:, :, None] * P * dx[:, None, :]
        if mz:
            E = de[:, :, None] * E * dx[:, None, :]
            f = de * f
        G = dg[:, :, None] * G * dx[:, None, :]
        h = dg * h
        q = dx * q
        D = D * dx
        Ef = Ef * de
        Eg = Eg * dg
        col = jnp.mean(jnp.max(jnp.abs(P), axis=1), axis=1)
        col = jnp.where(col < 1e-12, 1.0, col)
        qn = jnp.max(jnp.abs(q), axis=1)
        qn = jnp.where(qn < 1e-12, 1.0, qn)
        g = jnp.clip(1.0 / jnp.maximum(col, qn), 1e-4, 1e4)
        P = P * g[:, None, None]
        q = q * g[:, None]
        c = c * g
    return P, q, E, f, G, h, c, D, Ef, Eg


# ---------------------------------------------------------------------------
# solver
# ---------------------------------------------------------------------------

def _ldl_kinv(K, signs, st, dtype):
    """Explicit inverse of the pivot-regularized quasidefinite K via the
    static-pivot blocked LDL^T (ops/ldl_batched.py math; one-kernel
    Pallas factorization on TPU, fused factor+inverse opt-in via
    CPG_LDL_FUSED).  Shared by the full-K 'ldl' path and both levels of
    the two-level fixed-Schur path."""
    import os as _os
    from ..ops.ldl_batched import ldl_factor, ldl_inverse
    B = K.shape[0]
    dd = st.ldl_dyn_delta or float(jnp.finfo(dtype).eps) ** 0.5 * 0.1
    on_tpu_kernels = (jax.default_backend() == 'tpu'
                      and _os.environ.get('CPG_LDL_PALLAS', '1') != '0')
    if on_tpu_kernels and _os.environ.get('CPG_LDL_FUSED', '0') == '1':
        from ..ops.ldl_kernel import ldl_factor_inverse_pallas
        return ldl_factor_inverse_pallas(K, signs=signs, dyn_delta=dd)
    if on_tpu_kernels:
        from ..ops.ldl_kernel import ldl_factor_pallas, ldl_inverse_pallas
        fac = ldl_factor_pallas(K, signs=signs, dyn_delta=dd,
                                block_b=min(32, B))
        return ldl_inverse_pallas(fac)
    fac = ldl_factor(K, signs=signs, dyn_delta=st.ldl_dyn_delta or None)
    return ldl_inverse(fac)


def ipm_solve(P, q, E, f, G, h, l_nonneg: int, socs: Tuple[int, ...],
              settings: IPMSettings = IPMSettings(),
              n_exp: int = 0, psd_dims: Tuple[int, ...] = (),
              pow_alphas: Tuple[float, ...] = (), P_is_zero: bool = False):
    """Solve a batch of conic QPs.  Returns dict(x, nu, z, s, obj, iters,
    gap, res_primal, res_dual, solved, status).  Status codes match the
    ADMM engine (reference CPG_Info statuses, utils.py:977-985):
    1 solved, 0 max_iter, -3 primal infeasible, -4 dual infeasible.
    Full-f32 matmul precision on TPU (see admm_solve note).

    ``P_is_zero`` (static): the caller asserts P == 0 structurally
    (linear-objective family).  Exotic-cone layouts then get the
    homogeneous-self-dual-embedding post-pass for reliable
    infeasible/unbounded statuses (solvers/ipm_hsde.py) when instances
    are left undetermined at max_iter."""
    with jax.default_matmul_precision('highest'):
        return _ipm_solve_impl(P, q, E, f, G, h, l_nonneg, socs, settings,
                               n_exp, psd_dims, pow_alphas, P_is_zero)


def _ipm_solve_impl(P, q, E, f, G, h, l_nonneg, socs,
                    settings: IPMSettings = IPMSettings(),
                    n_exp=0, psd_dims=(), pow_alphas=(), P_is_zero=False):
    from .ipm_cones import (ExoticCones, ExoticScaling,
                            exotic_centrality_alpha, exotic_dual_dist,
                            exotic_init, exotic_max_step,
                            exotic_primal_dist)
    st = settings
    B, n = q.shape
    mz = E.shape[1] if E.ndim == 3 else 0
    mc = G.shape[1]
    dtype = P.dtype
    N = n + mz + mc
    exo = ExoticCones(int(n_exp), tuple(psd_dims), tuple(pow_alphas))
    ms = l_nonneg + int(sum(socs))          # symmetric rows come first
    assert ms + exo.dim == mc, (ms, exo.dim, mc)

    # precision floor: f32 KKT solves + refinement bottom out ~1e-5
    eps_mach = float(jnp.finfo(dtype).eps)
    tol_feas = max(st.tol_feas, 30 * eps_mach)
    tol_gap = max(st.tol_gap, 30 * eps_mach)
    tol_inf = max(st.tol_infeas, 10 * eps_mach)

    kkt_mode = st.kkt_solver
    if kkt_mode == 'auto':
        # TPU policy.  Condensation (eliminating dz) SQUARES the system
        # conditioning: the condensed S sees cond(H)^2 when P = 0 (no PD
        # lower bound), and the exp/pow barrier Hessians have
        # cond(H) ~ 1/mu^2 -- measured: the KKT solve residual blows up
        # (1e-16 -> 1e4) right as mu crosses ~1e-5 even in f64, which is
        # the true root cause of round 2's "schur_chol wedge".  So:
        #   - symmetric layouts with a quadratic objective (P > 0 keeps
        #     the condensed system's lower spectrum): 'schur'
        #     (factorization-free Newton-Schulz, pure MXU);
        #   - exotic layouts and P == 0 symmetric layouts: 'ldl' --
        #     full-system static-pivot blocked LDL' (QDLDL's recipe,
        #     TPU-blocked; sees cond(H), stays refinable, and avoids
        #     XLA's slow column-loop LU lowering).
        if jax.default_backend() == 'tpu':
            kkt_mode = 'ldl' if (exo or P_is_zero) else 'schur'
        else:
            kkt_mode = 'lu'

    # keep unscaled data for honest termination / certificates
    P0, q0, E0, f0, G0, h0 = P, q, E, f, G, h
    if st.scaling > 0:
        eq_blocks = (_soc_slices(l_nonneg, socs)
                     + [(ms + o, L) for (o, L) in exo.blocks()])
        P, q, E, f, G, h, c_s, D_s, Ef_s, Eg_s = ruiz_equilibrate_ipm(
            P, q, E, f, G, h, eq_blocks, st.scaling)
    else:
        c_s = jnp.ones((B,), dtype)
        D_s = jnp.ones((B, n), dtype)
        Ef_s = jnp.ones((B, mz), dtype)
        Eg_s = jnp.ones((B, mc), dtype)
    c_inv = 1.0 / c_s

    e = cone_e(B, l_nonneg, socs, dtype)   # symmetric central ray (B, ms)
    kdeg = l_nonneg + len(socs) + exo.degree

    x0 = jnp.zeros((B, n), dtype)
    nu0 = jnp.zeros((B, mz), dtype)
    s0 = jnp.concatenate([e, exotic_init(B, exo, dtype)], axis=1)
    z0 = s0
    s0_ray, z0_ray = s0, z0   # strictly interior ray (restoration lifts)

    I_n = jnp.eye(n, dtype=dtype)

    def unscale(x, nu, z, s):
        # x = D x^; scaled stationarity c(Px+q) = E'(Ef nu^) + G'(Eg z^)
        # gives nu = c^{-1} Ef nu^, z = c^{-1} Eg z^; s^ = Eg s
        return (D_s * x,
                c_inv[:, None] * Ef_s * nu if mz else nu,
                c_inv[:, None] * Eg_s * z,
                s / Eg_s)

    if mc == 0:
        # equality-constrained QP: one saddle KKT solve, no cone loop
        K = jnp.zeros((B, n + mz, n + mz), dtype)
        K = K.at[:, :n, :n].set(P + st.static_reg * I_n)
        if mz:
            K = K.at[:, :n, n:].set(-jnp.swapaxes(E, 1, 2))
            K = K.at[:, n:, :n].set(E)
        rhs = jnp.concatenate([-q, -f], axis=1)
        sol = jnp.linalg.solve(K, rhs[..., None])[..., 0]
        zeros = jnp.zeros((B, 0), dtype)
        xu, nuu, _, _ = unscale(sol[:, :n], sol[:, n:], zeros, zeros)
        Px = jnp.einsum('bij,bj->bi', P0, xu)
        obj = 0.5 * jnp.sum(xu * Px, axis=1) + jnp.sum(q0 * xu, axis=1)
        ry = (jnp.einsum('bij,bj->bi', E0, xu) + f0 if mz
              else jnp.zeros((B, 0), dtype))
        rp = jnp.linalg.norm(ry, axis=1)
        rd = jnp.linalg.norm(
            Px + q0 - (jnp.einsum('bij,bi->bj', E0, nuu) if mz
                       else jnp.zeros((B, n), dtype)), axis=1)
        return dict(x=xu, nu=nuu, z=zeros, s=zeros, obj=obj,
                    iters=jnp.ones((B,), jnp.int32),
                    gap=jnp.zeros((B,), dtype), res_primal=rp, res_dual=rd,
                    solved=jnp.ones((B,), jnp.bool_),
                    status=jnp.ones((B,), jnp.int32))

    # ---- 'ldl' two-level fixed-Schur precomputation ------------------
    # P/E/G are loop-invariant after equilibration; only the cone
    # scaling block H varies per iteration.  Factor the (n+mz) saddle
    # block ONCE here; each iteration then factors only the (mc, mc)
    # Schur complement S = H + C' Ktop^{-1} C (see IPMSettings
    # .ldl_two_level).  C = [[-G'], [0]] is the fixed coupling block.
    ldl_fixed = None
    if kkt_mode == 'ldl' and st.ldl_two_level and not st.ldl_inverse:
        # the two-level path is only implemented over the explicit-
        # inverse solve; silently falling back to the full-K
        # factorization would hide the setting (ADVICE r4)
        import warnings
        warnings.warn('IPMSettings.ldl_two_level requires '
                      'ldl_inverse=True; falling back to the full-K '
                      'LDL factorization', stacklevel=2)
    if kkt_mode == 'ldl' and st.ldl_two_level and st.ldl_inverse:
        import numpy as _np
        Nt = n + mz
        reg2f = jnp.asarray(max(st.static_reg, 1e-8), dtype)
        Ktop = jnp.zeros((B, Nt, Nt), dtype)
        Ktop = Ktop.at[:, :n, :n].set(P + st.static_reg * I_n)
        if mz:
            Ktop = Ktop.at[:, :n, n:].set(-jnp.swapaxes(E, 1, 2))
            Ktop = Ktop.at[:, n:, :n].set(-E)
            Ktop = Ktop.at[:, n + jnp.arange(mz),
                           n + jnp.arange(mz)].set(-reg2f)
        signs_top = _np.concatenate([_np.ones(n), -_np.ones(mz)])
        Ktop_inv = _ldl_kinv(Ktop, signs_top, st, dtype)
        Ct = jnp.zeros((B, Nt, mc), dtype)
        Ct = Ct.at[:, :n, :].set(-jnp.swapaxes(G, 1, 2))
        KiC = jnp.einsum('bij,bjk->bik', Ktop_inv, Ct)
        T_fix = jnp.einsum('bji,bjk->bik', Ct, KiC)
        ldl_fixed = (Ktop_inv, KiC, T_fix)

    def residuals_unscaled(xu, nuu, zu, su):
        Px = jnp.einsum('bij,bj->bi', P0, xu)
        rx = Px + q0 - jnp.einsum('bij,bi->bj', G0, zu)
        if mz:
            rx = rx - jnp.einsum('bij,bi->bj', E0, nuu)
            ry = jnp.einsum('bij,bj->bi', E0, xu) + f0
        else:
            ry = jnp.zeros((B, 0), dtype)
        rz = jnp.einsum('bij,bj->bi', G0, xu) + h0 - su
        return rx, ry, rz, Px

    def converged(rx, ry, rz, xu, zu, su, Px):
        obj = 0.5 * jnp.sum(xu * Px, axis=1) + jnp.sum(q0 * xu, axis=1)
        gap = jnp.abs(jnp.sum(su * zu, axis=1))
        rp = jnp.maximum(
            jnp.linalg.norm(ry, axis=1) if mz else jnp.zeros((B,), dtype),
            jnp.linalg.norm(rz, axis=1))
        rd = jnp.linalg.norm(rx, axis=1)
        fnorm = (jnp.linalg.norm(h0, axis=1)
                 + (jnp.linalg.norm(f0, axis=1) if mz else 0.0))
        ok = ((rp < tol_feas * jnp.maximum(1.0, fnorm))
              & (rd < tol_feas
                 * jnp.maximum(1.0, jnp.linalg.norm(q0, axis=1)))
              & (gap < tol_gap * jnp.maximum(1.0, jnp.abs(obj))))
        return ok, rp, rd, gap

    def infeasibility(xu, nuu, zu, membership=False):
        """Certificates on (unscaled) candidate rays, Clarabel-style:
        primal infeasible when y = (nu, z) approximately satisfies
        E'nu + G'z = 0, z in K*, f'nu + h'z < 0; dual infeasible when x
        approximately satisfies Px = 0, Ex = 0, Gx in -K, q'x < 0.
        ``membership``: additionally require z in K* explicitly -- needed
        when the candidate is a step DIRECTION rather than an iterate
        (iterates satisfy z in K* by construction)."""
        y_n = jnp.maximum(
            jnp.max(jnp.abs(zu), axis=1),
            jnp.max(jnp.abs(nuu), axis=1) if mz else 0.0)
        Aty = jnp.einsum('bij,bi->bj', G0, zu)
        by = jnp.sum(h0 * zu, axis=1)
        if mz:
            Aty = Aty + jnp.einsum('bij,bi->bj', E0, nuu)
            by = by + jnp.sum(f0 * nuu, axis=1)
        p_inf = ((y_n > 1e-8)
                 & (jnp.max(jnp.abs(Aty), axis=1) <= tol_inf * y_n)
                 & (by <= -tol_inf * y_n))
        if membership:
            zdist = cone_dist(zu[:, :ms], l_nonneg, socs)  # self-dual part
            if exo:
                zdist = jnp.maximum(zdist,
                                    exotic_dual_dist(exo, zu[:, ms:]))
            p_inf = p_inf & (zdist <= tol_inf * y_n)

        x_n = jnp.max(jnp.abs(xu), axis=1)
        Px = jnp.einsum('bij,bj->bi', P0, xu)
        Gx = jnp.einsum('bij,bj->bi', G0, xu)
        d_ok = (jnp.max(jnp.abs(Px), axis=1) <= tol_inf * x_n)
        if mz:
            d_ok = d_ok & (jnp.max(jnp.abs(
                jnp.einsum('bij,bj->bi', E0, xu)), axis=1) <= tol_inf * x_n)
        gx_dist = cone_dist(Gx[:, :ms], l_nonneg, socs)
        if exo:
            gx_dist = jnp.maximum(gx_dist,
                                  exotic_primal_dist(exo, Gx[:, ms:]))
        d_ok = d_ok & (gx_dist <= tol_inf * x_n)
        d_inf = ((x_n > 1e-8) & d_ok
                 & (jnp.sum(q0 * xu, axis=1) <= -tol_inf * x_n))
        return p_inf, d_inf

    # ---- KKT machinery (scaled space) ---------------------------------
    def applyH(W, ES, dz):
        """H dz over all cone rows: W(W .) on the symmetric part (W
        symmetric), dense block action on the exotic part."""
        Hdz = W.mul(W.mul(dz[:, :ms]))
        if exo:
            Hdz = jnp.concatenate([Hdz, ES.apply(dz[:, ms:])], axis=1)
        return Hdz

    def apply_K(W, ES, dx, dnu, dz):
        """Unregularized KKT application for iterative refinement."""
        r1 = jnp.einsum('bij,bj->bi', P, dx) \
            - jnp.einsum('bij,bi->bj', G, dz)
        if mz:
            r1 = r1 - jnp.einsum('bij,bi->bj', E, dnu)
            r2 = jnp.einsum('bij,bj->bi', E, dx)
        else:
            r2 = jnp.zeros((B, 0), dtype)
        r3 = jnp.einsum('bij,bj->bi', G, dx) + applyH(W, ES, dz)
        return r1, r2, r3

    def make_solver(W, ES):
        """Returns solve(r1, r2, r3) -> (dx, dnu, dz) for the current
        scalings, with st.refine_steps refinement sweeps."""
        if kkt_mode == 'lu':
            H = W.wtw_dense(B, mc, dtype)
            if exo:
                H = ES.set_H(H, ms)
            K = jnp.zeros((B, N, N), dtype)
            K = K.at[:, :n, :n].set(P + st.static_reg * I_n)
            if mz:
                K = K.at[:, :n, n:n + mz].set(-jnp.swapaxes(E, 1, 2))
                K = K.at[:, n:n + mz, :n].set(E)
            K = K.at[:, :n, n + mz:].set(-jnp.swapaxes(G, 1, 2))
            K = K.at[:, n + mz:, :n].set(G)
            K = K.at[:, n + mz:, n + mz:].set(H)
            lu, piv = jax.scipy.linalg.lu_factor(K)

            def base_solve(r1, r2, r3):
                rhs = jnp.concatenate([r1, r2, r3], axis=1)
                sol = jax.scipy.linalg.lu_solve(
                    (lu, piv), rhs[..., None])[..., 0]
                return sol[:, :n], sol[:, n:n + mz], sol[:, n + mz:]
        elif kkt_mode == 'ldl':
            # full-system static-pivot blocked LDL' (ops/ldl_batched.py,
            # QDLDL's role): symmetrize by negating rows 2-3 and the dz
            # sign, giving the quasidefinite
            #   [[P + reg I, -E', -G'], [-E, -reg I, 0], [-G, 0, -H]]
            # -- a FIXED batched op sequence (no pivot loop), the
            # TPU-fast full-system factorization.  Unlike the condensed
            # Schur modes it sees cond(K) ~ cond(H), not cond(H)^2, so
            # it stays refinable in f32 even for exp/pow barrier
            # Hessians (cond(H) ~ 1/mu^2).
            from ..ops.ldl_batched import ldl_factor, ldl_solve
            H = W.wtw_dense(B, mc, dtype)
            if exo:
                H = ES.set_H(H, ms)
            if ldl_fixed is not None:
                # two-level fixed-Schur path: only S = H + C'Ktop^{-1}C
                # is factored per iteration (mc x mc instead of N x N).
                # Solve of [[Ktop, C], [C', -H]] [u; dz] = [b1; -r3]:
                #   u0 = Ktop^{-1} b1
                #   dz = S^{-1} (r3 - G u0_x)       (C'u0 = -G u0_x)
                #   u  = u0 - (Ktop^{-1} C) dz
                # S keeps cond ~ cond(H) because the well-conditioned
                # block is eliminated first; the dynamic pivot
                # regularization caps S's small pivots and the
                # refinement sweeps below target the true K.
                import numpy as _np
                Ktop_inv, KiC, T_fix = ldl_fixed
                S_neg = H + T_fix
                S_inv = _ldl_kinv(S_neg, _np.ones(mc), st, dtype)

                def base_solve(r1, r2, r3):
                    b1 = jnp.concatenate([r1, -r2], axis=1)
                    u0 = jnp.einsum('bij,bj->bi', Ktop_inv, b1)
                    rhs_z = r3 - jnp.einsum('bij,bj->bi', G, u0[:, :n])
                    dzv = jnp.einsum('bij,bj->bi', S_inv, rhs_z)
                    u = u0 - jnp.einsum('bij,bj->bi', KiC, dzv)
                    return u[:, :n], u[:, n:], dzv

                def solve(r1, r2, r3):
                    dx, dnu, dz = base_solve(r1, r2, r3)
                    for _ in range(st.refine_steps):
                        a1, a2, a3 = apply_K(W, ES, dx, dnu, dz)
                        cx, cnu, cz = base_solve(r1 - a1, r2 - a2, r3 - a3)
                        dx, dnu, dz = dx + cx, dnu + cnu, dz + cz
                    return dx, dnu, dz

                return solve
            reg2 = jnp.asarray(max(st.static_reg, 1e-8), dtype)
            K = jnp.zeros((B, N, N), dtype)
            K = K.at[:, :n, :n].set(P + st.static_reg * I_n)
            if mz:
                K = K.at[:, :n, n:n + mz].set(-jnp.swapaxes(E, 1, 2))
                K = K.at[:, n:n + mz, :n].set(-E)
                K = K.at[:, n + jnp.arange(mz), n + jnp.arange(mz)].set(
                    -reg2)
            K = K.at[:, :n, n + mz:].set(-jnp.swapaxes(G, 1, 2))
            K = K.at[:, n + mz:, :n].set(-G)
            K = K.at[:, n + mz:, n + mz:].set(-H)
            import numpy as _np
            from ..ops.ldl_batched import ldl_inverse
            signs = _np.concatenate([_np.ones(n), -_np.ones(mz + mc)])
            import os as _os
            on_tpu_kernels = (jax.default_backend() == 'tpu'
                              and _os.environ.get('CPG_LDL_PALLAS',
                                                  '1') != '0')
            fac_is_pallas = False
            # the lane-batched fused factor+inverse wins its stage
            # standalone (27.7ms vs 67ms at Np=144/bb=128) but LOSES
            # end-to-end at the entropy family's real Np=176 (1149 vs
            # 1658 solves/s): the (B, N, N) <-> (N, N, B) transposes and
            # the bb=64 sub-batching (VMEM forces half-lane blocks above
            # Np~152) eat the gain -- opt-in until the phase-split
            # variant lands
            use_fused_inv = (_os.environ.get('CPG_LDL_FUSED', '0') == '1')
            if on_tpu_kernels and st.ldl_inverse and use_fused_inv:
                # lane-batched fused factor + inverse (ops/ldl_kernel.py
                # _factor_inverse_kernel): one launch per 128-instance
                # lane block replaces the per-32-instance factor kernel
                # (34 ms at (1024, 176, 176)) AND the ~70 launch-bound
                # XLA inverse-build ops -- round-4 exotic-IPM speedup
                from ..ops.ldl_kernel import ldl_factor_inverse_pallas
                dd = st.ldl_dyn_delta or \
                    float(jnp.finfo(dtype).eps) ** 0.5 * 0.1
                Kinv = ldl_factor_inverse_pallas(K, signs=signs,
                                                 dyn_delta=dd)

                def _ldl_solve(rhs):
                    return jnp.einsum('bij,bj->bi', Kinv, rhs)

                fac = None
            elif (on_tpu_kernels and st.ldl_inverse
                  and _os.environ.get('CPG_LDL_BM_FUSED', '0') == '1'):
                # batch-major fused factor+inverse: one launch, factor
                # panels VMEM-resident (no L/d/Linv HBM round-trip
                # between the factor and inverse kernels)
                from ..ops.ldl_kernel import ldl_kinv_pallas
                dd = st.ldl_dyn_delta or \
                    float(jnp.finfo(dtype).eps) ** 0.5 * 0.1
                Kinv = ldl_kinv_pallas(K, signs=signs, dyn_delta=dd,
                                       block_b=min(32, B))

                def _ldl_solve(rhs):
                    return jnp.einsum('bij,bj->bi', Kinv, rhs)

                fac = None
            elif on_tpu_kernels:
                # fused one-kernel factorization (ops/ldl_kernel.py): the
                # XLA lowering is launch-bound on TPU.  block_b capped at
                # 32: Mosaic hangs compiling this kernel with larger VMEM
                # blocks (measured: bb=64/128/256 never finish)
                from ..ops.ldl_kernel import ldl_factor_pallas
                dd = st.ldl_dyn_delta or \
                    float(jnp.finfo(dtype).eps) ** 0.5 * 0.1
                fac = ldl_factor_pallas(K, signs=signs, dyn_delta=dd,
                                        block_b=min(32, B))
                fac_is_pallas = True
            else:
                fac = ldl_factor(K, signs=signs,
                                 dyn_delta=st.ldl_dyn_delta or None)
            if fac is None:
                pass                     # fused Kinv path above
            elif st.ldl_inverse:
                # one multi-RHS sweep builds the explicit inverse of the
                # REGULARIZED K (MXU GEMMs); each subsequent solve is a
                # single einsum.  cond(K') is capped by the dynamic pivot
                # regularization, so inverse-apply error stays within
                # what the refinement against the true K absorbs.  For a
                # Pallas fac the build is ONE launch (ldl_inverse_pallas)
                # instead of the ~70-op XLA sweep lowering -- measured
                # 23 ms of the 47 ms entropy iteration (BENCH.md r4).
                if fac_is_pallas:
                    from ..ops.ldl_kernel import ldl_inverse_pallas
                    Kinv = ldl_inverse_pallas(fac)
                else:
                    Kinv = ldl_inverse(fac)

                def _ldl_solve(rhs):
                    return jnp.einsum('bij,bj->bi', Kinv, rhs)
            elif fac_is_pallas:
                # Pallas facs store Linv FLAT (B, nbp*p, p); ldl_solve
                # expects the (B, nbp, p, p) layout -- route to the
                # matching one-kernel solve (ADVICE r3 medium)
                from ..ops.ldl_kernel import ldl_solve_pallas

                def _ldl_solve(rhs):
                    return ldl_solve_pallas(fac, rhs)
            else:
                def _ldl_solve(rhs):
                    return ldl_solve(fac, rhs)

            def base_solve(r1, r2, r3):
                rhs = jnp.concatenate([r1, -r2, -r3], axis=1)
                sol = _ldl_solve(rhs)
                return sol[:, :n], sol[:, n:n + mz], sol[:, n + mz:]
        else:
            # 'schur' / 'schur_chol' / 'schur_lu': eliminate dz, then dnu.
            # The SPD Schur complement is inverted by Newton-Schulz
            # ('schur' -- MXU matmuls, no factorization; right when the
            # cone scalings are NT-bounded), factored by batched Cholesky
            # ('schur_chol'), or by Jacobi-scaled batched LU ('schur_lu').
            # The exotic (exp/pow) barrier Hessians overwhelm NS, and in
            # f32 the roundoff while forming S = P + G'H^{-1}G (entries
            # up to ~1/mu) can make S numerically indefinite --
            # jnp.linalg.cholesky then returns NaN and the globalization
            # wedges (the round-2 schur_chol failure, BENCH.md).  LU with
            # partial pivoting tolerates that roundoff; Jacobi
            # pre-scaling tames the 1/mu dynamic range; the refinement
            # sweeps against the true K (below) recover full accuracy.
            # For the entropy family (n=32 vs full N=160) this is ~125x
            # fewer factorization FLOPs than 'lu' -- the structured-KKT
            # lever VERDICT r2 item 1 names.
            from .admm import newton_schulz_inverse
            Hinv = W.wtw_dense(B, mc, dtype, inv=True)
            if exo:
                Hinv = ES.set_H(Hinv, ms, inv=True)
            HiG = jnp.einsum('bij,bjk->bik', Hinv, G)       # (B, mc, n)
            S = (P + st.static_reg * I_n
                 + jnp.einsum('bji,bjk->bik', G, HiG))      # SPD (B, n, n)
            if kkt_mode in ('schur_chol', 'schur_lu'):
                if kkt_mode == 'schur_chol':
                    Lc = jnp.linalg.cholesky(S)

                    def S_solve(Xcols):
                        return jax.scipy.linalg.cho_solve((Lc, True), Xcols)

                    def small_factor(T):
                        Tc = jnp.linalg.cholesky(T)
                        return lambda r: jax.scipy.linalg.cho_solve(
                            (Tc, True), r[..., None])[..., 0]
                else:
                    dSc = jnp.sqrt(jnp.clip(
                        jnp.abs(S[:, jnp.arange(n), jnp.arange(n)]),
                        1e-30, None))
                    Ssc = S / dSc[:, :, None] / dSc[:, None, :]
                    lu_S, piv_S = jax.scipy.linalg.lu_factor(Ssc)

                    def S_solve(Xcols):
                        Xs = Xcols / dSc[..., None]
                        sol = jax.scipy.linalg.lu_solve((lu_S, piv_S), Xs)
                        return sol / dSc[..., None]

                    def small_factor(T):
                        lu_T, piv_T = jax.scipy.linalg.lu_factor(T)
                        return lambda r: jax.scipy.linalg.lu_solve(
                            (lu_T, piv_T), r[..., None])[..., 0]

                if mz:
                    SiEt = S_solve(jnp.swapaxes(E, 1, 2))   # (B, n, mz)
                    T = jnp.einsum('bij,bjk->bik', E, SiEt)
                    T_solve = small_factor(T)

                def base_solve(r1, r2, r3):
                    rS = r1 + jnp.einsum('bji,bj->bi', HiG, r3)
                    SirS = S_solve(rS[..., None])[..., 0]
                    if mz:
                        rhs_nu = r2 - jnp.einsum('bij,bj->bi', E, SirS)
                        dnu = T_solve(rhs_nu)
                        dx = SirS + jnp.einsum('bij,bj->bi', SiEt, dnu)
                    else:
                        dnu = jnp.zeros((B, 0), dtype)
                        dx = SirS
                    dz = jnp.einsum('bij,bj->bi', Hinv,
                                    r3 - jnp.einsum('bij,bj->bi', G, dx))
                    return dx, dnu, dz
            else:
                Sinv = newton_schulz_inverse(S, st.ns_iters)
                if mz:
                    SiEt = jnp.einsum('bij,bkj->bik', Sinv, E)
                    T = jnp.einsum('bij,bjk->bik', E, SiEt)  # SPD (B,mz,mz)
                    Tinv = newton_schulz_inverse(T, st.ns_iters)

                def base_solve(r1, r2, r3):
                    rS = r1 + jnp.einsum('bji,bj->bi', HiG, r3)
                    if mz:
                        SirS = jnp.einsum('bij,bj->bi', Sinv, rS)
                        rhs_nu = r2 - jnp.einsum('bij,bj->bi', E, SirS)
                        dnu = jnp.einsum('bij,bj->bi', Tinv, rhs_nu)
                        dx = SirS + jnp.einsum('bij,bj->bi', SiEt, dnu)
                    else:
                        dnu = jnp.zeros((B, 0), dtype)
                        dx = jnp.einsum('bij,bj->bi', Sinv, rS)
                    dz = jnp.einsum('bij,bj->bi', Hinv,
                                    r3 - jnp.einsum('bij,bj->bi', G, dx))
                    return dx, dnu, dz

        def solve(r1, r2, r3):
            dx, dnu, dz = base_solve(r1, r2, r3)
            for _ in range(st.refine_steps):
                a1, a2, a3 = apply_K(W, ES, dx, dnu, dz)
                cx, cnu, cz = base_solve(r1 - a1, r2 - a2, r3 - a3)
                dx, dnu, dz = dx + cx, dnu + cnu, dz + cz
            return dx, dnu, dz

        return solve

    def residuals_scaled(x, nu, z, s):
        Px = jnp.einsum('bij,bj->bi', P, x)
        rx = Px + q - jnp.einsum('bij,bi->bj', G, z)
        if mz:
            rx = rx - jnp.einsum('bij,bi->bj', E, nu)
            ry = jnp.einsum('bij,bj->bi', E, x) + f
        else:
            ry = jnp.zeros((B, 0), dtype)
        rz = jnp.einsum('bij,bj->bi', G, x) + h - s
        return rx, ry, rz

    def body(state):
        x, nu, z, s, it, status, it_vec, streak_p, streak_d = state
        done = status != 0
        rx, ry, rz = residuals_scaled(x, nu, z, s)
        mu = jnp.sum(s * z, axis=1) / kdeg

        ssym, sexo = s[:, :ms], s[:, ms:]
        zsym, zexo = z[:, :ms], z[:, ms:]
        W = BatchNT(ssym, zsym, l_nonneg, socs)
        lam = W.mul(zsym)
        ES = ExoticScaling(exo, sexo, zexo, mu,
                           strategy=st.exotic_scaling) if exo else None
        solve = make_solver(W, ES)

        def with_ds(dx, dz):
            return jnp.einsum('bij,bj->bi', G, dx) + rz

        def max_step(v, dv):
            return jnp.minimum(
                max_step_cone(v[:, :ms], dv[:, :ms], l_nonneg, socs),
                jnp.full((B,), 1e20, dtype))

        # affine direction: the scaled complementarity linearization gives
        # ds = -s - H dz for EVERY cone type, so the third-row RHS is
        # -rz - s (symmetric blocks: -rz + W(lam \ -lam o lam) = -rz - s)
        dx_a, dnu_a, dz_a = solve(-rx, -ry, -rz - s)
        ds_a = with_ds(dx_a, dz_a)
        a_sym = jnp.minimum(max_step(s, ds_a), max_step(z, dz_a))
        if exo:
            a_exo = exotic_max_step(exo, sexo, ds_a[:, ms:],
                                    zexo, dz_a[:, ms:])
            a_sym = jnp.minimum(a_sym, a_exo)
        alpha_aff = jnp.minimum(1.0, a_sym)
        if exo:
            # proximity-backtrack the affine step too: the combined
            # step's sigma comes from mu_aff, and if the affine step
            # pretends it can travel further than the neighborhood
            # allows, sigma under-centers and the combined step is
            # strangled by the same neighborhood (measured deadlock:
            # prox pins at beta, alpha -> 0, mu frozen)
            alpha_aff = exotic_centrality_alpha(
                exo, s, ds_a, z, dz_a, kdeg, alpha_aff,
                beta=st.exotic_beta, shrink=st.exotic_shrink,
                backtracks=st.exotic_backtracks)
        mu_aff = jnp.sum((s + alpha_aff[:, None] * ds_a)
                         * (z + alpha_aff[:, None] * dz_a), axis=1) / kdeg
        sigma = jnp.clip((mu_aff / mu) ** 3, 1e-8, 1.0 - 1e-8)
        # a NaN affine direction (degenerate f32 scaling) must not poison
        # the combined step: fall back to a centering-weighted sigma
        sigma = jnp.where(jnp.isfinite(sigma), sigma, 0.5)
        if exo:
            # residual-balance floor: with nonsymmetric scalings the
            # proximity line search caps alpha below 1, so feasibility
            # residuals contract slower than Mehrotra drives mu down.
            # Once mu << residual norm the KKT system is dominated by the
            # degenerate barrier Hessians and feasibility stalls for good.
            # Keep mu >= 0.1 * res_k * (mu_0/res_0) by flooring sigma
            # (pure centering while feasibility catches up) -- the
            # infeasible-IPM neighborhood, enforced through sigma.
            res_k = jnp.sqrt(jnp.sum(rx * rx, axis=1)
                             + (jnp.sum(ry * ry, axis=1) if mz else 0.0)
                             + jnp.sum(rz * rz, axis=1))
            floor = 0.1 * res_k * inv_ratio0 / jnp.maximum(mu, 1e-300)
            sigma = jnp.maximum(sigma, jnp.minimum(1.0 - 1e-8, floor))

        # combined direction: symmetric blocks get the full Mehrotra
        # corrector in lambda coordinates; exotic blocks the sigma-weighted
        # dual-barrier centering RHS (ipm_cones docstring)
        lam2 = jprod(lam, lam, l_nonneg, socs)
        corr = jprod(W.mul(ds_a[:, :ms], inv=True), W.mul(dz_a[:, :ms]),
                     l_nonneg, socs)
        dtv = sigma[:, None] * mu[:, None] * e - lam2 - corr
        rhs3 = -rz[:, :ms] + W.mul(jdiv(lam, dtv, l_nonneg, socs))
        if exo:
            rhs3_exo = (-rz[:, ms:] - sexo
                        + (sigma * mu)[:, None] * ES.centering_rhs(zexo))
            rhs3 = jnp.concatenate([rhs3, rhs3_exo], axis=1)
        dx, dnu, dz = solve(-rx, -ry, rhs3)
        ds = with_ds(dx, dz)

        # per-block boundary fractions: the symmetric blocks keep the
        # aggressive 0.99 fraction even in mixed layouts; only the exotic
        # max-step gets the conservative exotic fraction (ADVICE r2:
        # replacing frac_to_boundary wholesale slowed the symmetric
        # endgame in mixed symmetric+exotic layouts)
        a_sym = jnp.minimum(max_step(s, ds), max_step(z, dz))
        alpha = jnp.minimum(1.0, st.frac_to_boundary * a_sym)
        if exo:
            a_exo = exotic_max_step(exo, sexo, ds[:, ms:], zexo, dz[:, ms:])
            alpha = jnp.minimum(alpha, st.exotic_frac_to_boundary * a_exo)
        if exo:
            alpha = exotic_centrality_alpha(
                exo, s, ds, z, dz, kdeg, alpha, beta=st.exotic_beta,
                shrink=st.exotic_shrink, backtracks=st.exotic_backtracks)

        # freeze finished instances with where, NOT alpha=0: a converged
        # instance's NT scaling degenerates (s, z on the boundary) and its
        # direction can be NaN -- and 0 * NaN = NaN.  An UNFINISHED
        # instance with a non-finite direction (f32 endgame: an iterate
        # ~1e-12 from the cone boundary overflows the barrier-Hessian
        # products) skips the step AND gets a neighborhood restoration:
        # lifting (s, z) toward the strictly interior starting ray by
        # O(mu) re-centers the sick blocks so the next iteration's
        # scalings are finite -- without this the instance deadlocks at
        # max_iter (measured: ~1-5% of entropy-family instances)
        fin = (jnp.all(jnp.isfinite(dx), axis=1)
               & jnp.all(jnp.isfinite(dz), axis=1)
               & jnp.all(jnp.isfinite(ds), axis=1)
               & jnp.isfinite(alpha))
        if mz:
            fin = fin & jnp.all(jnp.isfinite(dnu), axis=1)
        bad = (~fin | (alpha < 1e-6)) & (~done)
        lift = jnp.maximum(mu, 100 * eps_mach)
        s = jnp.where(bad[:, None], s + lift[:, None] * s0_ray, s)
        z = jnp.where(bad[:, None], z + lift[:, None] * z0_ray, z)
        msk = (done | ~fin)[:, None]
        x = jnp.where(msk, x, x + alpha[:, None] * dx)
        nu = jnp.where(msk, nu, nu + alpha[:, None] * dnu) if mz else nu
        z = jnp.where(msk, z, z + alpha[:, None] * dz)
        s = jnp.where(msk, s, s + alpha[:, None] * ds)
        it = it + 1

        xu, nuu, zu, su = unscale(x, nu, z, s)
        rxu, ryu, rzu, Pxu = residuals_unscaled(xu, nuu, zu, su)
        ok, _, _, _ = converged(rxu, ryu, rzu, xu, zu, su, Pxu)
        p_inf, d_inf = infeasibility(xu, nuu, zu)
        if exo:
            # direction-based certificates (the OSQP delta-y pattern):
            # the neighborhood safeguards throttle iterate divergence for
            # nonsymmetric layouts, so the certificate ray shows up in
            # the step direction, not the iterate.  The AFFINE direction
            # is the one that chases the (infeasible) target -- the
            # combined direction under a sigma~1 floor is a centering
            # direction and never aligns with the ray
            dxu, dnuu, dzu, _ = unscale(dx_a, dnu_a, dz_a, ds_a)
            p_dir, d_dir = infeasibility(dxu, dnuu, dzu, membership=True)
            # require the direction certificate to hold on CONSECUTIVE
            # iterations before committing a terminal status: a feasible
            # but ill-conditioned instance can transiently satisfy the
            # tol_inf conditions on a single affine direction (ADVICE r2)
            streak_p = jnp.where(p_dir, streak_p + 1, 0)
            streak_d = jnp.where(d_dir, streak_d + 1, 0)
            p_inf = p_inf | (streak_p >= 2)
            d_inf = d_inf | (streak_d >= 2)
        import os as _os
        if _os.environ.get('CPG_IPM_DEBUG'):
            kr1, kr2, kr3 = apply_K(W, ES, dx, dnu, dz)
            serr = jnp.max(jnp.abs(jnp.concatenate(
                [kr1 + rx, kr2 + ry, kr3 - rhs3], axis=1)), axis=1)
            jax.debug.print(
                'it={i} mu={mu} sig={sg} a={a} gap={gp} rp={rp} kerr={ke}',
                i=it, mu=mu[0], sg=sigma[0], a=alpha[0],
                gp=jnp.sum(s * z, axis=1)[0], rp=jnp.linalg.norm(rx[0]),
                ke=serr[0])
        newly_ok = ok & ~done
        status = jnp.where(newly_ok, 1, status)
        status = jnp.where(p_inf & (status == 0), -3, status)
        status = jnp.where(d_inf & (status == 0), -4, status)
        it_vec = jnp.where((status != 0) & ~done, it, it_vec)
        return x, nu, z, s, it, status, it_vec, streak_p, streak_d

    if exo:
        rx0, ry0, rz0 = residuals_scaled(x0, nu0, z0, s0)
        res00 = jnp.sqrt(jnp.sum(rx0 * rx0, axis=1)
                         + (jnp.sum(ry0 * ry0, axis=1) if mz else 0.0)
                         + jnp.sum(rz0 * rz0, axis=1))
        mu00 = jnp.sum(s0 * z0, axis=1) / kdeg
        inv_ratio0 = mu00 / jnp.maximum(res00, 1e-10)

    def cond(state):
        it, status = state[4], state[5]
        return (~jnp.all(status != 0)) & (it < st.max_iter)

    state0 = (x0, nu0, z0, s0, jnp.int32(0),
              jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32),
              jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32))
    x, nu, z, s, it, status, it_vec, _, _ = jax.lax.while_loop(
        cond, body, state0)
    it_vec = jnp.where(status != 0, it_vec, it)

    if exo and st.hsde_iters > 0:
        # HSDE post-pass (solvers/ipm_hsde.py): instances still
        # undetermined after max_iter get classified through the
        # homogeneous embedding -- its final iterate is a Farkas ray for
        # infeasible/unbounded instances.  The ray is verified by the
        # same certificate tests as the main loop (membership included),
        # so -3/-4 is only committed on a checked certificate; feasible
        # instances keep status 0 (honest max_iter).  Runs only when
        # needed (lax.cond), on the Ruiz-scaled data; the positive
        # diagonal unscaling maps rays to rays.
        #
        # P != 0 layouts reduce to the P = 0 homogeneous model through
        # the EPIGRAPH form (VERDICT r3 item 5):
        #   min q'x + 0.5 x'Px  ==  min_{x,t} q'x + t
        #                           s.t. x'Px <= 2t  (rotated cone),
        # encoded as the standard SOC  t+1 >= ||(sqrt(2) W x, t-1)||
        # with W'W = P via a batched eigendecomposition (exact for
        # rank-deficient P -- a Cholesky jitter would make every
        # unbounded instance look bounded).  Feasible sets in x match,
        # objectives match, so primal/dual infeasibility transfers; the
        # returned ray is restricted to the original rows and
        # re-verified against the ORIGINAL problem data.
        from .ipm_hsde import hsde_run

        def classify(status_in):
            if P_is_zero:
                xh, nuh, zh, sh, tau, kap = hsde_run(
                    q, E, f, G, h, l_nonneg, socs, exo,
                    iters=st.hsde_iters,
                    exotic_beta=st.exotic_beta,
                    exotic_shrink=st.exotic_shrink,
                    exotic_backtracks=st.exotic_backtracks,
                    static_reg=max(st.static_reg, 1e-8),
                    refine_steps=st.refine_steps)
                x_r, z_r, s_r = xh, zh, sh
            else:
                w_eig, V = jnp.linalg.eigh(P)
                W_fac = (jnp.sqrt(jnp.clip(w_eig, 0.0, None))[:, :, None]
                         * jnp.swapaxes(V, 1, 2))        # (B, n, n)
                sq2 = jnp.asarray(jnp.sqrt(2.0), dtype)
                zc = jnp.zeros((B, 1), dtype)
                q_t = jnp.concatenate([q, jnp.ones((B, 1), dtype)], axis=1)
                E_t = (jnp.concatenate([E, jnp.zeros((B, mz, 1), dtype)],
                                       axis=2) if mz else E)
                tcol = jnp.zeros((B, 1, n + 1), dtype)
                tcol = tcol.at[:, 0, n].set(1.0)
                G_soc = jnp.concatenate(
                    [tcol,
                     jnp.concatenate([sq2 * W_fac,
                                      jnp.zeros((B, n, 1), dtype)], axis=2),
                     tcol], axis=1)                      # (B, n+2, n+1)
                h_soc = jnp.concatenate(
                    [jnp.ones((B, 1), dtype), jnp.zeros((B, n), dtype),
                     -jnp.ones((B, 1), dtype)], axis=1)
                G_e = jnp.concatenate(
                    [G, jnp.zeros((B, mc, 1), dtype)], axis=2)
                G_t = jnp.concatenate(
                    [G_e[:, :ms], G_soc, G_e[:, ms:]], axis=1)
                h_t = jnp.concatenate(
                    [h[:, :ms], h_soc, h[:, ms:]], axis=1)
                xh, nuh, zh, sh, tau, kap = hsde_run(
                    q_t, E_t, f, G_t, h_t, l_nonneg, socs + (n + 2,), exo,
                    iters=st.hsde_iters,
                    exotic_beta=st.exotic_beta,
                    exotic_shrink=st.exotic_shrink,
                    exotic_backtracks=st.exotic_backtracks,
                    static_reg=max(st.static_reg, 1e-8),
                    refine_steps=st.refine_steps)
                x_r = xh[:, :n]
                z_r = jnp.concatenate([zh[:, :ms], zh[:, ms + n + 2:]],
                                      axis=1)
                s_r = jnp.concatenate([sh[:, :ms], sh[:, ms + n + 2:]],
                                      axis=1)
            xu_r, nuu_r, zu_r, _ = unscale(x_r, nuh, z_r, s_r)
            p_inf, d_inf = infeasibility(xu_r, nuu_r, zu_r, membership=True)
            # the embedding's own signal gates the classification: a ray
            # only exists when kappa dominates tau
            ray = kap > 10.0 * tau
            status_out = jnp.where(
                ray & p_inf & (status_in == 0), -3, status_in)
            status_out = jnp.where(
                ray & d_inf & (status_out == 0), -4, status_out)
            return status_out

        status = jax.lax.cond(jnp.any(status == 0), classify,
                              lambda s_: s_, status)

    xu, nuu, zu, su = unscale(x, nu, z, s)
    rx, ry, rz, Px = residuals_unscaled(xu, nuu, zu, su)
    ok, rp, rd, gap = converged(rx, ry, rz, xu, zu, su, Px)
    obj = 0.5 * jnp.sum(xu * Px, axis=1) + jnp.sum(q0 * xu, axis=1)
    status = jnp.where((status == 0) & ok, 1, status)
    obj = jnp.where(status == -3, jnp.inf, obj)
    obj = jnp.where(status == -4, -jnp.inf, obj)
    return dict(x=xu, nu=nuu, z=zu, s=su, obj=obj,
                iters=it_vec, gap=gap,
                res_primal=rp, res_dual=rd, solved=(status == 1),
                status=status)
