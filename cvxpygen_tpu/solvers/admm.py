"""Batched OSQP-style ADMM QP solver (JAX, jit/vmap-native).

TPU-native replacement for the reference's embedded OSQP C solver
(reference cvxpygen/solvers/osqp.py + vendored osqp-python codegen): same
algorithm family -- Ruiz equilibration, rho-scaled ADMM with KKT solve,
residual-based termination (OSQP paper alg. 1-3) -- but batched over B
parameter instances with dense KKT Cholesky on the MXU instead of a
per-instance QDLDL sparse factorization.

Problem form:  min 0.5 x'Px + q'x  s.t.  l <= A x <= u  (rows 0..n_eq are
equalities, l==u), matching the reference's QPCanonMixin canonical form
(solvers/_interface.py:18-79).

Default settings mirror reference osqp.py:102-115 (rho=0.1, sigma=1e-6,
alpha=1.6, eps 1e-3, max_iter 4000) with adaptive_rho off -- the setting the
reference's own tests pin (tests/utils_test.py:25-28).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp

_INF = 1e30  # parity: reference replace_inf (utils.py:213-228)


@dataclass(frozen=True)
class ADMMSettings:
    rho: float = 0.1
    rho_eq_scale: float = 1e3
    sigma: float = 1e-6
    alpha: float = 1.6
    eps_abs: float = 1e-3
    eps_rel: float = 1e-3
    max_iter: int = 4000
    check_interval: int = 25
    scaling: int = 10
    warm_starting: bool = True
    # KKT application mode:
    #   'ns'   Newton-Schulz iterations for M^{-1}: pure batched matmuls on
    #          the MXU, no factorization at all -- the TPU-first choice
    #          (XLA's batched Cholesky/triangular-solve lowering measured
    #          minutes per call at B=1024, n=222 on v5e);
    #   'inv'  Cholesky once + explicit inverse (good on CPU/x64);
    #   'chol' triangular solves every iteration (reference-like);
    #   'auto' 'ns' on TPU, 'inv' elsewhere.
    kkt_solver: str = 'auto'
    kkt_refine: int = 1
    # 16 sweeps land ||I - MX|| ~ 1e-3 from the diagonal start on Ruiz-
    # equilibrated families (slope-measured on MPC/portfolio); the
    # residual-certificate rescue redoes any instance that needs more at
    # >= 30 full-f32 sweeps, so the default buys ~12ms/solve-batch on the
    # full-kernel path with correctness guarded per instance.
    ns_iters: int = 16
    # fused Pallas iteration blocks (ops/admm_kernel.py): keeps M^{-1}/A
    # VMEM-resident across check_interval iterations.  'auto' enables on
    # TPU when a block fits VMEM; 'always'/'never' force; 'full' runs the
    # ENTIRE solve in one kernel (ops/admm_full_kernel.py): in-kernel
    # Newton-Schulz factorization, per-block early termination and
    # per-block adaptive-rho refactorization.
    use_pallas: str = 'auto'
    # f32-precision tail of the in-kernel cold Newton-Schulz ('full' mode)
    ns_f32_iters: int = 5
    # adaptive rho (OSQP section 5.2): rescale by the normalized residual
    # ratio at each check; re-"factorization" is a warm Newton-Schulz
    # restart.  Off by default (reference comparison settings pin it off,
    # tests/utils_test.py:25-28).
    adaptive_rho: bool = False
    adaptive_rho_tolerance: float = 5.0
    # 8 full-f32 sweeps recover the inverse after a clipped (0.1x-10x)
    # rho change from the spectral-rescaled warm start (measured: same
    # mean iterations as 12 on the adaptive MPC bench, ~5% faster end to
    # end); the refactorization's certificate rescue guards the tail.
    ns_adapt_iters: int = 8
    # stop adapting rho after this many iterations (0 = never stop): rho
    # settles in the first few checks on well-scaled families, and each
    # adaptation pays a warm NS refactorization
    adaptive_rho_until: int = 0


def _inf_norm(v, axis=-1):
    return jnp.max(jnp.abs(v), axis=axis)


def ruiz_equilibrate(P, q, A, l, u, iters):
    """Modified Ruiz scaling on [[P, A'],[A, 0]] + cost scaling c
    (OSQP paper alg. 2).  Batched over leading axis."""
    B, m, n = A.shape
    dtype = P.dtype
    c = jnp.ones((B,), dtype)
    D = jnp.ones((B, n), dtype)
    E = jnp.ones((B, m), dtype)
    for _ in range(iters):
        nx_P = jnp.max(jnp.abs(P), axis=1)                     # (B, n)
        nx_A = jnp.max(jnp.abs(A), axis=1) if m else jnp.zeros_like(nx_P)
        nx = jnp.maximum(nx_P, nx_A)
        nc = jnp.max(jnp.abs(A), axis=2) if m else jnp.zeros((B, 0), dtype)
        dx = jnp.where(nx > 1e-12, 1.0 / jnp.sqrt(jnp.maximum(nx, 1e-12)), 1.0)
        dc = jnp.where(nc > 1e-12, 1.0 / jnp.sqrt(jnp.maximum(nc, 1e-12)), 1.0)
        dx = jnp.clip(dx, 1e-4, 1e4)
        dc = jnp.clip(dc, 1e-4, 1e4)
        P = dx[:, :, None] * P * dx[:, None, :]
        A = dc[:, :, None] * A * dx[:, None, :]
        q = dx * q
        D = D * dx
        E = E * dc
        # cost scaling (OSQP scaling.c: each zero norm is replaced by 1
        # before the max, so q == 0 cannot inflate the cost)
        col = jnp.mean(jnp.max(jnp.abs(P), axis=1), axis=1)
        col = jnp.where(col < 1e-12, 1.0, col)
        qn = _inf_norm(q)
        qn = jnp.where(qn < 1e-12, 1.0, qn)
        g = 1.0 / jnp.maximum(col, qn)
        g = jnp.clip(g, 1e-4, 1e4)
        P = P * g[:, None, None]
        q = q * g[:, None]
        c = c * g
    l = E * l
    u = E * u
    return P, q, A, l, u, c, D, E


def _ns_diag_start(M):
    """Diagonal-preconditioner NS start X0 = diag(M)^{-1} rescaled so
    eig(M X0) in (0, 1] -- monotone NS from any SPD M."""
    n = M.shape[-1]
    dg = jnp.diagonal(M, axis1=1, axis2=2)
    dg_inv = 1.0 / jnp.maximum(dg, 1e-12)
    ninf = jnp.max(jnp.sum(jnp.abs(M * dg_inv[:, None, :]), axis=2), axis=1)
    scale = dg_inv / jnp.maximum(ninf, 1.0)[:, None]
    return jnp.eye(n, dtype=M.dtype)[None] * scale[:, None, :]


def ns_residual_err(M, X):
    """Per-instance ||I - M X||_inf (entrywise), full precision: the NS
    convergence certificate.  NaN iterates compare as 'not < threshold',
    so err-based guards catch divergence AND overflow."""
    n = M.shape[-1]
    MX = jnp.einsum('bij,bjk->bik', M, X,
                    precision=jax.lax.Precision.HIGHEST)
    R = jnp.eye(n, dtype=M.dtype)[None] - MX
    return jnp.max(jnp.abs(R), axis=(1, 2))


def _ns_rescue(M, X, iters):
    """Divergence rescue: NS with bf16-pass bulk iterations can leave the
    convergence basin on ill-conditioned instances (rounding noise x
    cond(M) > 1 -- observed on the portfolio varying-P family on TPU,
    where every instance overflowed to NaN while full-f32 NS converges to
    ~1e-4 on the same chip).  Detect per instance via the residual
    certificate and recompute ONLY-IF-NEEDED (lax.cond) with a fully
    f32-HIGHEST NS from the guaranteed-monotone diagonal start."""
    # threshold 0.05: a shortened cold phase (ns_iters=16) can leave
    # ill-conditioned instances at err ~ 0.2-0.4 -- no longer diverged,
    # but too inaccurate for tight-eps families even with refinement
    # (portfolio varying-P measured frac 1.0 -> 0.994 under the old
    # 0.5 gate).  Clean instances sit at ~1e-3 and still skip.
    bad = ~(ns_residual_err(M, X) < 0.05)

    def rescue(X):
        I2 = 2.0 * jnp.eye(M.shape[-1], dtype=M.dtype)

        def body(_, Xr):
            MX = jnp.einsum('bij,bjk->bik', M, Xr,
                            precision=jax.lax.Precision.HIGHEST)
            return jnp.einsum('bij,bjk->bik', Xr, I2 - MX,
                              precision=jax.lax.Precision.HIGHEST)

        Xr = jax.lax.fori_loop(0, iters, body, _ns_diag_start(M))
        return jnp.where(bad[:, None, None], Xr, X)

    return jax.lax.cond(jnp.any(bad), rescue, lambda X: X, X)


def newton_schulz_inverse(M, iters, f32_iters=5):
    """Batched SPD inverse by Newton-Schulz: X <- X(2I - MX).

    Pure matmuls (MXU speed-of-light path); starts from the DIAGONAL
    preconditioner X0 = diag(M)^{-1} rescaled so eig(M X0) in (0, 1]
    (monotone NS from any SPD start): after Ruiz equilibration
    cond(diag(M)^{-1} M) << cond(M), so the pre-quadratic phase is ~2x
    shorter than from the classic M'/(||M||_1 ||M||_inf) start (measured:
    err 9e-4 at iter 15 vs 0.5).  Combined with the iterative-refinement
    step in kkt_apply, moderate inverse accuracy suffices for the solver
    tolerances.

    NS is self-correcting (each step contracts toward M^-1 from the current
    X), so the bulk iterations run in fast single-pass bf16 matmuls and only
    the last `f32_iters` run at full f32 precision: the bf16 phase lands X
    within ~1e-2 of M^-1, two quadratic f32 steps take it to roundoff.
    The bf16 phase is NOT unconditionally safe -- above cond(M) ~ 1e4 its
    rounding noise can leave the NS basin entirely -- so the fast path ends
    with a residual-certificate check and a full-f32 rescue for the
    diverged instances (_ns_rescue); the guard made `kkt_solver='auto'`
    correct on the portfolio varying-P family (VERDICT r3 item 1)."""
    B, n, _ = M.shape
    dtype = M.dtype
    X = _ns_diag_start(M)
    I2 = 2.0 * jnp.eye(n, dtype=dtype)
    fast = (jax.default_backend() == 'tpu' and dtype == jnp.float32)

    def body(_, X):
        MX = jnp.einsum('bij,bjk->bik', M, X)
        return jnp.einsum('bij,bjk->bik', X, I2 - MX)

    if fast and iters > f32_iters:
        # bulk phase with single-pass bf16 matmuls but f32 STORAGE and
        # accumulation (Precision.DEFAULT); the f32-highest tail then
        # contracts the ~1e-3 plateau toward roundoff quadratically
        def body_fast(_, X):
            MX = jnp.einsum('bij,bjk->bik', M, X,
                            precision=jax.lax.Precision.DEFAULT)
            return jnp.einsum('bij,bjk->bik', X, I2 - MX,
                              precision=jax.lax.Precision.DEFAULT)

        X = jax.lax.fori_loop(0, iters - f32_iters, body_fast, X)
        X = jax.lax.fori_loop(0, f32_iters, body, X)
        return _ns_rescue(M, X, max(iters, 30))
    return jax.lax.fori_loop(0, iters, body, X)


def newton_schulz_warm(M, X0, iters):
    """Newton-Schulz restarted from a previous inverse (adaptive-rho
    refactorization: M changed by a diagonal-rho update, so the old inverse
    is a good starting point).

    NS diverges unless eig(M X0) in (0, 2); a stale X0 after a large rho
    change can violate that.  Since eig(M X0) > 0 for SPD M, X0 (similar to
    an SPD product), rescaling X0 by ||M X0||_inf >= lambda_max pins the
    spectrum into (0, 1] -- monotone convergence from ANY SPD warm start.
    When X0 is already accurate the scale is ~1 and convergence stays
    quadratic."""
    n = M.shape[-1]
    dtype = M.dtype
    I2 = 2.0 * jnp.eye(n, dtype=dtype)
    MX0 = jnp.einsum('bij,bjk->bik', M, X0)
    ninf = jnp.max(jnp.sum(jnp.abs(MX0), axis=2), axis=1)
    X0 = X0 / jnp.maximum(ninf, 1.0)[:, None, None]

    def body(_, X):
        MX = jnp.einsum('bij,bjk->bik', M, X)
        return jnp.einsum('bij,bjk->bik', X, I2 - MX)

    # NOTE: keep the warm restart at full f32 precision.  A warm X0 is
    # already near M^-1; bf16-pass iterations (as in the cold start's bulk
    # phase) cannot contract below their ~4e-3 noise floor and instead
    # INJECT noise that can leave the NS basin on ill-conditioned
    # instances -- measured as a batch-wide convergence collapse.
    X = jax.lax.fori_loop(0, iters, body, X0)
    # spectral rescale + full precision make this monotone for SPD inputs,
    # but a stale/contaminated X0 (e.g. carrying non-finite entries) still
    # needs the certificate guard -- same rescue as the cold start
    return _ns_rescue(M, X, max(iters, 30))


def _pick_block(B, m, n, dtype):
    """Batch block for the fused kernel: must be a multiple of 8 (Mosaic
    sublane tiling on the (block, n) operands) and fit scoped VMEM
    (double-buffered inputs + ~2 (blk,m,n) broadcast temporaries < 14MB)."""
    esize = 4 if dtype == jnp.float32 else 8
    for blk in (32, 16, 8):
        est = blk * (2 * (n * n + m * n) + 2 * m * n) * esize
        if B % blk == 0 and est <= 14 * 1024 * 1024:
            return blk
    return None


def admm_solve(P, q, A, l, u, n_eq, settings: ADMMSettings,
               x0=None, y0=None):
    """Solve a batch of QPs.  All arrays batched on axis 0.

    Returns dict(x, y, z, obj, iters, pri_res, dua_res, solved) with y in
    OSQP sign convention (Px + q + A'y = 0 at optimum).

    NOTE: TPU matmuls default to bf16 accumulation, which stalls ADMM above
    the 1e-3 termination bars; the body runs under full-f32 matmul
    precision."""
    with jax.default_matmul_precision('highest'):
        return _admm_solve_impl(P, q, A, l, u, n_eq, settings, x0, y0)


def _admm_solve_impl(P, q, A, l, u, n_eq, settings: ADMMSettings,
                     x0=None, y0=None):
    B, m, n = A.shape
    dtype = P.dtype
    st = settings

    if m == 0:
        Preg = P + st.sigma * jnp.eye(n, dtype=dtype)
        L = jnp.linalg.cholesky(Preg)
        x = jax.scipy.linalg.cho_solve((L, True), -q[..., None])[..., 0]
        obj = 0.5 * jnp.einsum('bi,bij,bj->b', x, P, x) + jnp.einsum('bi,bi->b', q, x)
        zero = jnp.zeros((B, 0), dtype)
        return dict(x=x, y=zero, z=zero, obj=obj,
                    iters=jnp.ones((B,), jnp.int32),
                    pri_res=jnp.zeros((B,), dtype),
                    dua_res=jnp.zeros((B,), dtype),
                    solved=jnp.ones((B,), jnp.bool_),
                    status=jnp.ones((B,), jnp.int32))

    # clamp infinities (parity with generated C: +-1e30)
    l = jnp.clip(l, -_INF, _INF)
    u = jnp.clip(u, -_INF, _INF)

    Ps, qs, As, ls, us, c, D, E = ruiz_equilibrate(P, q, A, l, u, st.scaling)
    c_inv = 1.0 / c
    D_inv = 1.0 / D
    E_inv = 1.0 / E

    # per-row rho: equalities get rho_eq_scale * rho (OSQP convention);
    # a per-instance scale factor supports adaptive rho
    is_eq = jnp.arange(m) < n_eq
    rho_base = jnp.broadcast_to(
        jnp.where(is_eq, st.rho * st.rho_eq_scale, st.rho).astype(dtype),
        (B, m))

    def form_M(rho_vec):
        return (Ps + st.sigma * jnp.eye(n, dtype=dtype)
                + jnp.einsum('bki,bk,bkj->bij', As, rho_vec, As))

    if st.kkt_solver not in ('auto', 'ns', 'inv', 'chol'):
        raise ValueError(
            f"ADMMSettings.kkt_solver={st.kkt_solver!r}: expected one of "
            "'auto', 'ns', 'inv', 'chol'")
    if st.use_pallas not in ('auto', 'always', 'never', 'full',
                             'full_interpret'):
        raise ValueError(
            f"ADMMSettings.use_pallas={st.use_pallas!r}: expected one of "
            "'auto', 'always', 'never', 'full', 'full_interpret'")
    kkt_mode = st.kkt_solver
    if kkt_mode == 'auto':
        kkt_mode = 'ns' if jax.default_backend() not in ('cpu',) else 'inv'

    adaptive = st.adaptive_rho and kkt_mode != 'chol'

    if st.use_pallas in ('full', 'full_interpret'):
        from ..ops.admm_full_kernel import (
            admm_solve_full_pallas, pick_full_block)
        if pick_full_block(B, m, n, dtype) is not None:
            if x0 is not None:
                x_init = D_inv * x0.astype(dtype)
                z_init = E * (A @ x0[..., None].astype(dtype))[..., 0]
            else:
                x_init = jnp.zeros((B, n), dtype)
                z_init = jnp.zeros((B, m), dtype)
            y_init = (c[:, None] * E_inv * y0.astype(dtype)
                      if y0 is not None else jnp.zeros((B, m), dtype))
            x, z, y, obj, it_vec, status, rp, rd = admm_solve_full_pallas(
                Ps, qs, As, ls, us, rho_base, D, E, c_inv,
                x_init, z_init, y_init,
                sigma=st.sigma, alpha=st.alpha,
                eps_abs=st.eps_abs, eps_rel=st.eps_rel,
                check_interval=st.check_interval, max_iter=st.max_iter,
                ns_iters=st.ns_iters, ns_f32_iters=st.ns_f32_iters,
                ns_adapt_iters=st.ns_adapt_iters,
                adaptive=st.adaptive_rho,
                rho_tol=st.adaptive_rho_tolerance,
                kkt_refine=st.kkt_refine,
                adapt_until=st.adaptive_rho_until,
                interpret=(st.use_pallas == 'full_interpret'))
            x_u = D * x
            z_u = E_inv * z
            y_u = c_inv[:, None] * E * y
            # obj computed IN-KERNEL from the resident scaled data
            obj = jnp.where(status == -3, jnp.inf, obj)
            obj = jnp.where(status == -4, -jnp.inf, obj)
            return dict(x=x_u, y=y_u, z=z_u, obj=obj, iters=it_vec,
                        pri_res=rp, dua_res=rd, solved=(status == 1),
                        status=status)

    def factor(rho_vec, Minv_warm=None):
        M = form_M(rho_vec)
        if kkt_mode == 'ns':
            if Minv_warm is None:
                return newton_schulz_inverse(M, st.ns_iters,
                                             st.ns_f32_iters)
            return newton_schulz_warm(M, Minv_warm, st.ns_adapt_iters)
        Lc = jnp.linalg.cholesky(M)
        if kkt_mode == 'inv':
            return jax.scipy.linalg.cho_solve(
                (Lc, True),
                jnp.broadcast_to(jnp.eye(n, dtype=dtype), M.shape))
        return Lc

    Minv0 = factor(rho_base)
    use_chol = (kkt_mode == 'chol')

    def M_matvec(rho_vec, x):
        # M x without materializing M (used by iterative refinement)
        Ax = jnp.einsum('bij,bj->bi', As, x)
        return (jnp.einsum('bij,bj->bi', Ps, x) + st.sigma * x
                + jnp.einsum('bkj,bk->bj', As, rho_vec * Ax))

    def kkt_apply(Minv, rho_vec, rhs):
        if use_chol:
            return jax.scipy.linalg.cho_solve((Minv, True),
                                              rhs[..., None])[..., 0]
        xt = jnp.einsum('bij,bj->bi', Minv, rhs)
        for _ in range(st.kkt_refine):
            r = rhs - M_matvec(rho_vec, xt)
            xt = xt + jnp.einsum('bij,bj->bi', Minv, r)
        return xt

    if x0 is not None:
        x_init = D_inv * x0.astype(dtype)
        z_init = E * (A @ x0[..., None].astype(dtype))[..., 0]
    else:
        x_init = jnp.zeros((B, n), dtype)
        z_init = jnp.zeros((B, m), dtype)
    if y0 is not None:
        y_init = c[:, None] * E_inv * y0.astype(dtype)
    else:
        y_init = jnp.zeros((B, m), dtype)

    def one_iter(carry, Minv, rho_vec):
        x, z, y = carry
        rhs = st.sigma * x - qs + jnp.einsum('bkj,bk->bj', As, rho_vec * z - y)
        xt = kkt_apply(Minv, rho_vec, rhs)
        zt = jnp.einsum('bij,bj->bi', As, xt)
        x1 = st.alpha * xt + (1 - st.alpha) * x
        w = st.alpha * zt + (1 - st.alpha) * z + y / rho_vec
        z1 = jnp.clip(w, ls, us)
        y1 = rho_vec * (w - z1)
        return x1, z1, y1

    def residuals(x, z, y, Ax=None, Px=None, Aty=None):
        if Ax is None:
            Ax = jnp.einsum('bij,bj->bi', As, x)
            Px = jnp.einsum('bij,bj->bi', Ps, x)
            Aty = jnp.einsum('bij,bi->bj', As, y)
        rp = _inf_norm(E_inv * (Ax - z))
        rp_den = jnp.maximum(_inf_norm(E_inv * Ax), _inf_norm(E_inv * z))
        rd = c_inv * _inf_norm(D_inv * (Px + qs + Aty))
        rd_den = c_inv * jnp.maximum(
            jnp.maximum(_inf_norm(D_inv * Px), _inf_norm(D_inv * Aty)),
            _inf_norm(D_inv * qs))
        ok = ((rp <= st.eps_abs + st.eps_rel * rp_den)
              & (rd <= st.eps_abs + st.eps_rel * rd_den))
        return rp, rd, rp_den, rd_den, ok

    def cond(state):
        it, done = state[5], state[6]
        return (~jnp.all(done)) & (it < st.max_iter)

    # fused-kernel eligibility: needs the explicit inverse and VMEM room
    use_pallas = st.use_pallas
    # note: the fused kernel applies M^{-1} without the refinement matmul;
    # ADMM tolerates ~1e-5 inexact KKT solves (fixed-point iteration), and
    # the NS inverse reaches f32 roundoff levels
    if use_pallas == 'auto':
        blk = _pick_block(B, m, n, dtype)
        use_pallas = (kkt_mode == 'ns' and blk is not None
                      and jax.default_backend() == 'tpu')
    elif use_pallas == 'always':
        blk = _pick_block(B, m, n, dtype) or 1
        use_pallas = kkt_mode in ('ns', 'inv')
    else:
        use_pallas = False

    def infeasibility(dx, dy, Pdx, Adx, Atdy):
        """OSQP section 3.4 certificates, per instance (scaled space with
        unscaling factors applied; reference CPG_Info infeasible statuses,
        utils.py:977-985).  Returns (prim_inf, dual_inf) masks.  The
        matvecs are computed by the caller, fused with the residual ones."""
        eps = jnp.asarray(1e-4, dtype)
        dy_n = _inf_norm(E * dy) * c_inv
        cert_p1 = _inf_norm(D_inv * Atdy) * c_inv <= eps * dy_n
        u_fin = jnp.where(us < _INF * 0.5, us * E_inv, 0.0)
        l_fin = jnp.where(ls > -_INF * 0.5, ls * E_inv, 0.0)
        sup = jnp.sum(u_fin * jnp.maximum(E * dy, 0.0)
                      + l_fin * jnp.minimum(E * dy, 0.0), axis=1) * c_inv
        open_dir = (jnp.any((dy > 1e-12) & (us >= _INF * 0.5), axis=1)
                    | jnp.any((dy < -1e-12) & (ls <= -_INF * 0.5), axis=1))
        prim_inf = (dy_n > 1e-10) & cert_p1 & (sup <= -eps * dy_n) & ~open_dir

        dx_n = _inf_norm(D * dx)
        cert_d1 = _inf_norm(D_inv * Pdx) * c_inv <= eps * dx_n
        cert_d2 = (jnp.einsum('bi,bi->b', qs, dx) * c_inv) <= -eps * dx_n
        up_ok = jnp.where(us >= _INF * 0.5, True,
                          E_inv * Adx <= eps * dx_n[:, None])
        lo_ok = jnp.where(ls <= -_INF * 0.5, True,
                          E_inv * Adx >= -eps * dx_n[:, None])
        dual_inf = ((dx_n > 1e-10) & cert_d1 & cert_d2
                    & jnp.all(up_ok & lo_ok, axis=1))
        return prim_inf, dual_inf

    def body(state):
        (x, z, y, rho_scale, Minv, it, done, it_vec, rp_last, rd_last,
         status) = state
        rho_vec = rho_base * rho_scale[:, None]
        if use_pallas:
            from ..ops.admm_kernel import admm_iterate_pallas
            xn, zn, yn = admm_iterate_pallas(
                Minv, As, qs, ls, us, rho_vec, x, z, y,
                st.sigma, st.alpha, st.check_interval, block=blk)
        else:
            def inner(_, carry):
                return one_iter(carry, Minv, rho_vec)
            xn, zn, yn = jax.lax.fori_loop(
                0, st.check_interval, inner, (x, z, y))
        # freeze converged instances: batch result == single-instance result
        mask = done[:, None]
        dx = jnp.where(mask, 0.0, xn - x)
        dy = jnp.where(mask, 0.0, yn - y)
        x = jnp.where(mask, x, xn)
        z = jnp.where(mask, z, zn)
        y = jnp.where(mask, y, yn)
        it = it + st.check_interval
        # fused check matvecs: one pass over As/Ps for BOTH the residuals
        # (x, y) and the infeasibility certificates (dx, dy)
        xs = jnp.stack([x, dx], axis=1)             # (B, 2, n)
        ys = jnp.stack([y, dy], axis=1)             # (B, 2, m)
        Axs = jnp.einsum('bij,bcj->bci', As, xs)
        Pxs = jnp.einsum('bij,bcj->bci', Ps, xs)
        Atys = jnp.einsum('bij,bci->bcj', As, ys)
        rp, rd, rp_den, rd_den, ok = residuals(
            x, z, y, Ax=Axs[:, 0], Px=Pxs[:, 0], Aty=Atys[:, 0])
        p_inf, d_inf = infeasibility(dx, dy, Pxs[:, 1], Axs[:, 1],
                                     Atys[:, 1])
        newly = ok & (~done)
        it_vec = jnp.where(newly, it, it_vec)
        status = jnp.where(ok & (status == 0), 1, status)
        status = jnp.where(p_inf & (status == 0), -3, status)
        status = jnp.where(d_inf & (status == 0), -4, status)
        done = done | ok | p_inf | d_inf

        if adaptive:
            # OSQP adaptive rho: scale by sqrt of normalized residual ratio;
            # with the NS inverse a "re-factorization" is a warm restart
            ratio = jnp.sqrt(
                (rp / jnp.maximum(rp_den, 1e-10))
                / jnp.maximum(rd / jnp.maximum(rd_den, 1e-10), 1e-10))
            tol = st.adaptive_rho_tolerance
            change = ((ratio > tol) | (ratio < 1.0 / tol)) & (~done)
            # clamp the per-update factor: the warm NS restart recovers a
            # bounded spectrum shift per refactorization (see
            # newton_schulz_warm), and OSQP's own rho updates are gradual
            step_f = jnp.clip(jnp.where(change, ratio, 1.0), 0.1, 10.0)
            new_scale = jnp.clip(rho_scale * step_f, 1e-6, 1e6)

            def refactor(_):
                return factor(rho_base * new_scale[:, None], Minv_warm=Minv)

            Minv2 = jax.lax.cond(jnp.any(change), refactor,
                                 lambda _: Minv, operand=None)
            # rescale duals so y/rho stays consistent (OSQP keeps y)
            rho_scale = new_scale
            Minv = Minv2

        return (x, z, y, rho_scale, Minv, it, done, it_vec, rp, rd, status)

    state0 = (x_init, z_init, y_init, jnp.ones((B,), dtype), Minv0,
              jnp.int32(0),
              jnp.zeros((B,), jnp.bool_), jnp.zeros((B,), jnp.int32),
              jnp.full((B,), jnp.inf, dtype), jnp.full((B,), jnp.inf, dtype),
              jnp.zeros((B,), jnp.int32))
    (x, z, y, _, _, it, done, it_vec, rp, rd,
     status) = jax.lax.while_loop(cond, body, state0)
    it_vec = jnp.where(done, it_vec, it)

    # unscale
    x_u = D * x
    z_u = E_inv * z
    y_u = c_inv[:, None] * E * y
    obj = c_inv * (0.5 * jnp.einsum('bi,bij,bj->b', x, Ps, x)
                   + jnp.einsum('bi,bi->b', qs, x))
    # status codes (OSQP-like): 1 solved, 0 max_iter,
    # -3 primal_infeasible, -4 dual_infeasible
    obj = jnp.where(status == -3, jnp.inf, obj)
    obj = jnp.where(status == -4, -jnp.inf, obj)
    return dict(x=x_u, y=y_u, z=z_u, obj=obj, iters=it_vec,
                pri_res=rp, dua_res=rd, solved=(status == 1),
                status=status)
