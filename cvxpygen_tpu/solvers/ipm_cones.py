"""Exotic-cone (exponential / 3D power / PSD) calculus for the conic IPM.

Extends solvers/ipm.py beyond the symmetric (nonneg/SOC) cones so the IPM
engine covers the reference Clarabel interface's full cone list (reference
cvxpygen/solvers/clarabel.py:133-155: zero/nonneg/SOC/exp/PSD/pow).

Method (the TPU-friendly shape of the ECOS-exp / MOSEK nonsymmetric IPM,
Serrano 2015; Dahl & Andersen 2021):

- For each nonsymmetric cone block the KKT scaling is the dual-barrier
  Hessian  H = mu * grad^2 F*(z)  (3x3 dense for exp/pow).  F* is the
  standard nu=3 logarithmically homogeneous barrier of the DUAL cone; its
  gradient/Hessian come from jax autodiff (vmapped over blocks) rather
  than hand-derived formulas.
- PSD blocks use the Nesterov-Todd scaling point W (matrix geometric mean
  of S and Z, computed by eigh): H svec(M) = svec(W M W), so H z = s holds
  exactly (symmetric-cone theory, batched over instances).
- Complementarity RHS for these blocks (H-form):
      affine    ds = -s - H dz
      combined  ds = -s - H dz - sigma*mu*grad F*(z)
  which coincides with the NT/Jordan form the symmetric blocks use.
- Step length to the boundary has no closed form for exp/pow: a batched
  bisection on strict cone membership (primal cone for s, dual cone for
  z); PSD uses the closed form 1/max(0, -lambda_min(S^-1/2 dS S^-1/2)).

Conventions match ops/cones.py:
    EXP      K = cl{(x,y,z): y>0, y e^{x/y} <= z}
    EXP dual K* = cl{(u,v,w): u<0, -u e^{v/u} <= e w}
             barrier F*(u,v,w) = -log(v - u + u log(-u/w)) - log(-u) - log(w)
    POW(a)   K = {(x,y,z): x^a y^(1-a) >= |z|, x,y >= 0}
    POW dual K* = {(u,v,w): (u/a)^a (v/(1-a))^(1-a) >= |w|}
             barrier F*(u,v,w) = F_pow(u/a, v/(1-a), w) with
             F_pow(x,y,z) = -log(x^{2a} y^{2(1-a)} - z^2)
                            - (1-a) log x - a log y
    PSD(s)   svec (upper triangle, column-major, sqrt(2) off-diag)

Exotic rows sit after the symmetric rows:
    [nonneg | SOC | EXP triples | PSD svec blocks | POW triples].
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.cones import svec_indices

_BIG = 1e20
import os
# PD/dual crossover (see _pd_scaling_full): blocks with
# det(S'Z)/(s'z s~'z~) below this use the plain dual scaling (exact and
# fastest near the central path), above it the two-secant primal-dual
# scaling (robust off-center).  Swept on sum-exp/log/entropy-32 families
# (BENCH.md): 0.1 keeps every stress instance solving with ~1.5-2x fewer
# iterations than pure-PD; 0.3+ is faster still but loses extreme-theta
# instances.  Env override for experimentation only.
_PD_THRESH = float(os.environ.get('CPG_PD_THRESH', '0.1'))


@dataclass(frozen=True)
class ExoticCones:
    """Static exotic-cone layout (hashable; trace-time constant)."""
    n_exp: int = 0
    psd_dims: Tuple[int, ...] = ()
    pow_alphas: Tuple[float, ...] = ()

    @property
    def dim(self) -> int:
        return (3 * self.n_exp
                + int(sum(s * (s + 1) // 2 for s in self.psd_dims))
                + 3 * len(self.pow_alphas))

    @property
    def degree(self) -> int:
        """Barrier degree: 3 per exp/pow cone, s per PSD(s) block."""
        return (3 * self.n_exp + int(sum(self.psd_dims))
                + 3 * len(self.pow_alphas))

    def __bool__(self):
        return bool(self.n_exp or self.psd_dims or self.pow_alphas)

    # offsets within the exotic subvector
    @property
    def psd_off(self) -> int:
        return 3 * self.n_exp

    @property
    def pow_off(self) -> int:
        return self.psd_off + int(sum(s * (s + 1) // 2
                                      for s in self.psd_dims))

    def blocks(self):
        """(start, length) of every exotic block within the exotic rows."""
        out = []
        off = 0
        for _ in range(self.n_exp):
            out.append((off, 3))
            off += 3
        for s in self.psd_dims:
            k = s * (s + 1) // 2
            out.append((off, k))
            off += k
        for _ in self.pow_alphas:
            out.append((off, 3))
            off += 3
        return out


# ---------------------------------------------------------------------------
# dual barriers (autodiff supplies gradients and Hessians)
# ---------------------------------------------------------------------------

def _exp_dual_barrier(z):
    """nu=3 barrier of K*_exp = cl{(u,v,w): u<0, -u e^{v/u} <= e w}.
    Interior condition: -u>0, w>0, v - u + u log(-u/w) > 0."""
    u, v, w = z[0], z[1], z[2]
    t = v - u + u * jnp.log(-u / w)
    return -jnp.log(t) - jnp.log(-u) - jnp.log(w)


def _pow_barrier(x, y, zz, a):
    """Chares nu=3 barrier of K_pow(a) (used for the dual via coordinate
    scaling)."""
    phi = 2.0 * (a * jnp.log(x) + (1.0 - a) * jnp.log(y))
    return (-jnp.log(jnp.exp(phi) - zz * zz)
            - (1.0 - a) * jnp.log(x) - a * jnp.log(y))


def _pow_dual_barrier(z, a):
    return _pow_barrier(z[0] / a, z[1] / (1.0 - a), z[2], a)


def _exp_primal_barrier(s):
    """nu=3 barrier of K_exp = cl{(x,y,z): y>0, y e^{x/y} <= z}."""
    x, y, z = s[0], s[1], s[2]
    return (-jnp.log(y * jnp.log(z / y) - x) - jnp.log(y) - jnp.log(z))


def _pow_primal_barrier(s, a):
    return _pow_barrier(s[0], s[1], s[2], a)


_exp_grad = jax.vmap(jax.grad(_exp_dual_barrier))
_exp_hess = jax.vmap(jax.hessian(_exp_dual_barrier))
_exp_pgrad = jax.vmap(jax.grad(_exp_primal_barrier))


def _pow_grad_hess(z3, a):
    """z3 (B, 3) -> grad (B, 3), hess (B, 3, 3) of the dual pow barrier."""
    g = jax.vmap(jax.grad(lambda z: _pow_dual_barrier(z, a)))(z3)
    h = jax.vmap(jax.hessian(lambda z: _pow_dual_barrier(z, a)))(z3)
    return g, h


def _sanitize_blocks(H, g, s3, z3, mu_floor=None):
    """Replace non-finite 3x3 scaling blocks / gradients with a finite
    SPD fallback.

    f32 failure mode (measured on the entropy family, ~1.5% of
    instances): a step accepted with the dual iterate ~1e-12 from the
    cone boundary makes the barrier Hessian entries ~1/t^2 ~ 1e24 and
    the two-secant products overflow -> NaN; sigma and every subsequent
    direction go NaN and the instance freezes at max_iter (VERDICT r3
    straggler).  Fallback: H = (s'z/3) I (the scaling of a centered
    block) and -grad F*(z) ~ 3 s / s'z, giving a finite centering-flavored
    direction that re-enters the neighborhood within a few iterations."""
    # sick = non-finite OR so large that downstream squares overflow /
    # carry no precision (f32: entries ~1e24 from a 1e-12-deep boundary
    # iterate stay finite here but NaN inside the KKT factorization)
    big = jnp.asarray(float(jnp.finfo(H.dtype).eps) ** -1.5, H.dtype)
    bad = ~(jnp.all(jnp.isfinite(H), axis=(1, 2))
            & jnp.all(jnp.isfinite(g), axis=1)
            & (jnp.max(jnp.abs(H), axis=(1, 2)) < big)
            & (jnp.max(jnp.abs(g), axis=1) < big))
    # floor the fallback scale with the INSTANCE mu: a sick block that is
    # itself nearly complementarity-converged (s'z ~ 0) would otherwise
    # get H ~ 0 and make the KKT near-singular (measured: finite
    # directions with 1e23 solve residual -> alpha 0 deadlock)
    mu_b = jnp.sum(s3 * z3, axis=1) / 3.0
    if mu_floor is not None:
        mu_b = jnp.maximum(mu_b, 0.01 * mu_floor)
    mu_b = jnp.clip(mu_b, 100 * float(jnp.finfo(H.dtype).eps) ** 2, None)
    eye3 = jnp.eye(3, dtype=H.dtype)
    H = jnp.where(bad[:, None, None], mu_b[:, None, None] * eye3[None], H)
    g = jnp.where(bad[:, None], -s3 / mu_b[:, None], g)
    return H, g


def _pd_scaling_full(s3, z3, g, h, zt):
    """Primal-dual (two-secant BFGS) scaling for a 3-dim nonsymmetric
    cone block (Dahl & Andersen 2021; the MOSEK/Clarabel exp-cone
    strategy).  Given the dual barrier gradient g = grad F*(z) and
    Hessian h = grad^2 F*(z), and the primal shadow z~ = -grad F(s),
    build H > 0 satisfying BOTH secant equations exactly:

        H z = s      and      H z~ = s~ ,   s~ = -g in int K.

    Construction: with S = [s, s~], Z = [z, z~], M = S'Z (2x2, symmetric
    because s'z~ = s~'z = nu = 3 by logarithmic homogeneity),

        H = S M^{-1} S' + (I - S M^{-1} Z') T (I - Z M^{-1} S'),

    T = mu_blk * h.  Then H Z = S M^{-1} M = S (the second term kills Z),
    and x'Hx >= 0 when M > 0.  det M = s'z s~'z~ - nu^2 >= 0 with
    equality exactly on the central path (s parallel to s~), where the
    block falls back to T -- which is the exact scaling there.

    s3, z3, zt: (N, 3); g: (N, 3); h: (N, 3, 3).  Returns (N, 3, 3)."""
    nu = 3.0
    s_t = -g                                       # s~ in int K
    a11 = jnp.sum(s3 * z3, axis=1)                 # s'z
    mu_loc = a11 / nu
    T = mu_loc[:, None, None] * h
    a22 = jnp.sum(s_t * zt, axis=1)                # s~'z~
    det = a11 * a22 - nu * nu
    # crossover: near the central path (det/(s'z s~'z~) -> 0) the plain
    # dual scaling T is exact AND converges faster in the endgame, so the
    # two-secant form engages only when the block is meaningfully
    # off-center (threshold swept in BENCH.md)
    ok = (det > _PD_THRESH * jnp.maximum(a11 * a22, 1e-30)) \
        & jnp.isfinite(det) & jnp.all(jnp.isfinite(zt), axis=1)
    dsafe = jnp.where(ok, det, 1.0)
    # M^{-1} = [[a22, -nu], [-nu, a11]] / det
    S = jnp.stack([s3, s_t], axis=2)               # (N, 3, 2)
    Z = jnp.stack([z3, zt], axis=2)
    Minv = jnp.stack([
        jnp.stack([a22, -nu * jnp.ones_like(a11)], axis=1),
        jnp.stack([-nu * jnp.ones_like(a11), a11], axis=1)],
        axis=1) / dsafe[:, None, None]             # (N, 2, 2)
    SMi = jnp.einsum('nik,nkl->nil', S, Minv)      # S M^{-1} (N, 3, 2)
    H1 = jnp.einsum('nik,njk->nij', SMi, S)        # S M^{-1} S'
    P = jnp.eye(3, dtype=s3.dtype)[None] \
        - jnp.einsum('nik,njk->nij', SMi, Z)       # I - S M^{-1} Z'
    H2 = jnp.einsum('nik,nkl,njl->nij', P, T, P)   # P T P'
    Hpd = H1 + H2
    Hpd = 0.5 * (Hpd + jnp.swapaxes(Hpd, 1, 2))
    return jnp.where(ok[:, None, None], Hpd, T)


# ---------------------------------------------------------------------------
# svec helpers (PSD blocks)
# ---------------------------------------------------------------------------

def _svec_to_mat(w, s):
    """w (..., k) svec -> symmetric matrix (..., s, s)."""
    r, c, sc = svec_indices(s)
    sc = jnp.asarray(sc, w.dtype)
    vals = w / sc
    X = jnp.zeros(w.shape[:-1] + (s, s), w.dtype)
    X = X.at[..., r, c].set(vals)
    X = X.at[..., c, r].set(vals)
    return X


def _mat_to_svec(X, s):
    r, c, sc = svec_indices(s)
    sc = jnp.asarray(sc, X.dtype)
    return X[..., r, c] * sc


def _psd_basis(s, dtype):
    """Constant (k, s, s) svec basis matrices: mat(e_j)."""
    import numpy as np
    r, c, sc = svec_indices(s)
    k = len(r)
    E = np.zeros((k, s, s))
    for j in range(k):
        E[j, r[j], c[j]] = 1.0 / sc[j]
        E[j, c[j], r[j]] = 1.0 / sc[j]
    return jnp.asarray(E, dtype)


def _mat_sqrt(X, inv=False):
    """Symmetric PSD matrix square root (or inverse square root) by eigh."""
    lam, Q = jnp.linalg.eigh(X)
    lam = jnp.maximum(lam, jnp.finfo(X.dtype).tiny)
    p = -0.5 if inv else 0.5
    return jnp.einsum('...ik,...k,...jk->...ij', Q, lam ** p, Q)


def _psd_nt_scaling(S, Z):
    """NT scaling point W with W Z W = S (matrix geometric mean)."""
    A = _mat_sqrt(S)
    M = jnp.einsum('...ij,...jk,...kl->...il', A, Z, A)
    return jnp.einsum('...ij,...jk,...kl->...il', A, _mat_sqrt(M, inv=True),
                      A)


# ---------------------------------------------------------------------------
# scaling state for the exotic blocks
# ---------------------------------------------------------------------------

class ExoticScaling:
    """Per-iteration scaling data: H blocks (and their inverses on demand),
    dual-barrier gradients for the centering RHS.

    ``strategy``: 'pd' = two-secant primal-dual scaling (_pd_scaling_full,
    the Dahl-Andersen/MOSEK choice -- robust off-center), 'dual' =
    mu * grad^2 F*(z) (ECOS-exp choice -- cheaper, accurate near the
    central path)."""

    def __init__(self, exo: ExoticCones, s_exo, z_exo, mu, strategy='pd'):
        self.exo = exo
        self.dtype = z_exo.dtype
        B = z_exo.shape[0]
        self.B = B
        ne = exo.n_exp
        self.H_exp = None
        self.g_exp = None
        if ne:
            zf = z_exo[:, :3 * ne].reshape(B * ne, 3)
            sf = s_exo[:, :3 * ne].reshape(B * ne, 3)
            g = _exp_grad(zf)
            h = _exp_hess(zf)
            if strategy == 'pd':
                zt = -_exp_pgrad(sf)
                Hf = _pd_scaling_full(sf, zf, g, h, zt)
            else:
                mu_r = jnp.repeat(mu, ne)
                Hf = mu_r[:, None, None] * h
            mu_rep = jnp.repeat(mu, ne)
            Hf, g = _sanitize_blocks(Hf, g, sf, zf, mu_floor=mu_rep)
            self.g_exp = g.reshape(B, ne, 3)
            self.H_exp = Hf.reshape(B, ne, 3, 3)
        self.W_psd = []       # NT point per PSD block (B, s, s)
        off = exo.psd_off
        for s in exo.psd_dims:
            k = s * (s + 1) // 2
            Sm = _svec_to_mat(s_exo[:, off:off + k], s)
            Zm = _svec_to_mat(z_exo[:, off:off + k], s)
            self.W_psd.append(_psd_nt_scaling(Sm, Zm))
            off += k
        self.H_pow = []
        self.g_pow = []
        off = exo.pow_off
        for a in exo.pow_alphas:
            z3 = z_exo[:, off:off + 3]
            s3 = s_exo[:, off:off + 3]
            g, h = _pow_grad_hess(z3, a)
            if strategy == 'pd':
                zt = -jax.vmap(
                    jax.grad(lambda s, aa=a: _pow_primal_barrier(s, aa)))(s3)
                Hp = _pd_scaling_full(s3, z3, g, h, zt)
            else:
                Hp = mu[:, None, None] * h
            Hp, g = _sanitize_blocks(Hp, g, s3, z3, mu_floor=mu)
            self.g_pow.append(g)
            self.H_pow.append(Hp)
            off += 3

    def centering_rhs(self, z_exo):
        """-grad F*(z) stacked over exotic rows (B, dim); PSD blocks use
        +svec(Z^{-1}) (= -grad F*(z) for the -log det barrier) computed
        directly."""
        exo = self.exo
        B = self.B
        parts = []
        if exo.n_exp:
            parts.append(-self.g_exp.reshape(B, 3 * exo.n_exp))
        off = exo.psd_off
        for s in exo.psd_dims:
            k = s * (s + 1) // 2
            Zm = _svec_to_mat(z_exo[:, off:off + k], s)
            Zi = jnp.linalg.inv(Zm)
            Zi = 0.5 * (Zi + jnp.swapaxes(Zi, -1, -2))
            parts.append(_mat_to_svec(Zi, s))
            off += k
        for g in self.g_pow:
            parts.append(-g)
        return jnp.concatenate(parts, axis=1) if parts else \
            jnp.zeros((B, 0), self.dtype)

    # -- H actions -----------------------------------------------------
    def apply(self, v_exo):
        """H v over the exotic rows (B, dim)."""
        exo = self.exo
        B = self.B
        parts = []
        if exo.n_exp:
            vf = v_exo[:, :3 * exo.n_exp].reshape(B, exo.n_exp, 3)
            parts.append(jnp.einsum('bnij,bnj->bni', self.H_exp,
                                    vf).reshape(B, 3 * exo.n_exp))
        off = exo.psd_off
        for (s, W) in zip(exo.psd_dims, self.W_psd):
            k = s * (s + 1) // 2
            M = _svec_to_mat(v_exo[:, off:off + k], s)
            WMW = jnp.einsum('bij,bjk,bkl->bil', W, M, W)
            parts.append(_mat_to_svec(WMW, s))
            off += k
        i = 0
        off = exo.pow_off
        for _ in exo.pow_alphas:
            parts.append(jnp.einsum('bij,bj->bi', self.H_pow[i],
                                    v_exo[:, off:off + 3]))
            i += 1
            off += 3
        return jnp.concatenate(parts, axis=1) if parts else \
            jnp.zeros((B, 0), self.dtype)

    def set_H(self, H, row0, inv=False):
        """Write the exotic diagonal blocks into the dense KKT H matrix
        (B, mc, mc) starting at row/col offset row0."""
        exo = self.exo
        B = self.B
        if exo.n_exp:
            Hs = self.H_exp
            Hs = _inv33(Hs.reshape(B * exo.n_exp, 3, 3)).reshape(
                Hs.shape) if inv else Hs
            for i in range(exo.n_exp):
                o = row0 + 3 * i
                H = H.at[:, o:o + 3, o:o + 3].set(Hs[:, i])
        off = row0 + exo.psd_off
        for (s, W) in zip(exo.psd_dims, self.W_psd):
            k = s * (s + 1) // 2
            Wu = jnp.linalg.inv(W) if inv else W
            E = _psd_basis(s, self.dtype)
            T = jnp.einsum('bpq,kqr,brs->bkps', Wu, E, Wu)
            blk = _mat_to_svec(T, s)          # (B, k_col, k_row)
            blk = jnp.swapaxes(blk, 1, 2)
            H = H.at[:, off:off + k, off:off + k].set(blk)
            off += k
        off = row0 + exo.pow_off
        for Hp in self.H_pow:
            blk = _inv33(Hp) if inv else Hp
            H = H.at[:, off:off + 3, off:off + 3].set(blk)
            off += 3
        return H


def _inv33(A):
    """Closed-form inverse of (..., 3, 3) matrices (adjugate / det)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    adj = jnp.stack([
        jnp.stack([A11, A12, A13], axis=-1),
        jnp.stack([A21, A22, A23], axis=-1),
        jnp.stack([A31, A32, A33], axis=-1),
    ], axis=-2)
    return adj / det[..., None, None]


# ---------------------------------------------------------------------------
# initialization, membership, step length, violation
# ---------------------------------------------------------------------------

# standard strictly-interior unit point of K_exp that also lies strictly
# inside K*_exp (ECOS/Hypatia choice); s' z = 3 so mu starts balanced
_EXP_INIT = (-1.051383945322714, 0.556409619469370, 1.258967884768947)


def exotic_init(B, exo: ExoticCones, dtype):
    """Strictly interior starting point, used for both s and z."""
    parts = []
    if exo.n_exp:
        e = jnp.asarray(_EXP_INIT, dtype)
        parts.append(jnp.tile(e, (B, exo.n_exp)))
    for s in exo.psd_dims:
        r, c, sc = svec_indices(s)
        ident = jnp.asarray([1.0 if rr == cc else 0.0
                             for rr, cc in zip(r, c)], dtype)
        parts.append(jnp.tile(ident, (B, 1)))
    for a in exo.pow_alphas:
        p = jnp.asarray([jnp.sqrt(1.0 + a), jnp.sqrt(2.0 - a), 0.0], dtype)
        parts.append(jnp.tile(p, (B, 1)))
    return (jnp.concatenate(parts, axis=1) if parts
            else jnp.zeros((B, 0), dtype))


def _exp_primal_in(s3):
    """(B, 3) -> strict interior of K_exp."""
    x, y, z = s3[..., 0], s3[..., 1], s3[..., 2]
    ys = jnp.maximum(y, 1e-300)
    zs = jnp.maximum(z, 1e-300)
    return (y > 0) & (z > 0) & (y * jnp.log(zs / ys) - x > 0)


def _exp_dual_in(z3):
    u, v, w = z3[..., 0], z3[..., 1], z3[..., 2]
    um = jnp.maximum(-u, 1e-300)
    wm = jnp.maximum(w, 1e-300)
    return (u < 0) & (w > 0) & (v - u + u * jnp.log(um / wm) > 0)


def _pow_primal_in(s3, a):
    x, y, z = s3[..., 0], s3[..., 1], s3[..., 2]
    xs = jnp.maximum(x, 1e-300)
    ys = jnp.maximum(y, 1e-300)
    phi = 2.0 * (a * jnp.log(xs) + (1.0 - a) * jnp.log(ys))
    return (x > 0) & (y > 0) & (phi > 2.0 * jnp.log(
        jnp.maximum(jnp.abs(z), 1e-300)))


def _pow_dual_in(z3, a):
    return _pow_primal_in(
        jnp.stack([z3[..., 0] / a, z3[..., 1] / (1.0 - a), z3[..., 2]],
                  axis=-1), a)


def _membership(exo: ExoticCones, v, dual):
    """Strict-interior membership of the exotic subvector v (B, dim)."""
    B = v.shape[0]
    ok = jnp.ones((B,), jnp.bool_)
    if exo.n_exp:
        t = v[:, :3 * exo.n_exp].reshape(B, exo.n_exp, 3)
        fn = _exp_dual_in if dual else _exp_primal_in
        ok = ok & jnp.all(fn(t), axis=1)
    off = exo.psd_off
    for s in exo.psd_dims:
        k = s * (s + 1) // 2
        lam = jnp.linalg.eigvalsh(_svec_to_mat(v[:, off:off + k], s))
        ok = ok & (lam[:, 0] > 0)
        off += k
    off = exo.pow_off
    for a in exo.pow_alphas:
        fn = _pow_dual_in if dual else _pow_primal_in
        ok = ok & fn(v[:, off:off + 3], a)
        off += 3
    return ok


def exotic_max_step(exo: ExoticCones, s_exo, ds, z_exo, dz,
                    cap=2.0, iters=40):
    """Largest alpha <= cap with s + alpha ds in int K and z + alpha dz in
    int K* over all exotic blocks; returns _BIG where alpha = cap works.

    PSD blocks use the closed form; exp/pow use batched bisection (the
    feasible alphas form an interval since the cones are convex)."""
    B = s_exo.shape[0]
    alpha = jnp.full((B,), _BIG, s_exo.dtype)

    # closed-form PSD step
    off = exo.psd_off
    for s in exo.psd_dims:
        k = s * (s + 1) // 2
        for (v, dv) in ((s_exo, ds), (z_exo, dz)):
            M = _svec_to_mat(v[:, off:off + k], s)
            dM = _svec_to_mat(dv[:, off:off + k], s)
            Mi = _mat_sqrt(M, inv=True)
            T = jnp.einsum('bij,bjk,bkl->bil', Mi, dM, Mi)
            lmin = jnp.linalg.eigvalsh(T)[:, 0]
            a = jnp.where(lmin < 0, -1.0 / jnp.where(lmin < 0, lmin, -1.0),
                          _BIG)
            alpha = jnp.minimum(alpha, a)
        off += k

    if exo.n_exp or exo.pow_alphas:
        sub = ExoticCones(exo.n_exp, (), exo.pow_alphas)
        ps = exo.psd_off
        pe = exo.pow_off
        sv = jnp.concatenate([s_exo[:, :ps], s_exo[:, pe:]], axis=1)
        dsv = jnp.concatenate([ds[:, :ps], ds[:, pe:]], axis=1)
        zv = jnp.concatenate([z_exo[:, :ps], z_exo[:, pe:]], axis=1)
        dzv = jnp.concatenate([dz[:, :ps], dz[:, pe:]], axis=1)

        def ok_at(a):
            return (_membership(sub, sv + a[:, None] * dsv, dual=False)
                    & _membership(sub, zv + a[:, None] * dzv, dual=True))

        capv = jnp.full((B,), cap, s_exo.dtype)
        feas_cap = ok_at(capv)
        lo = jnp.zeros((B,), s_exo.dtype)
        hi = capv

        def body(_, lohi):
            lo, hi = lohi
            mid = 0.5 * (lo + hi)
            ok = ok_at(mid)
            return (jnp.where(ok, mid, lo), jnp.where(ok, hi, mid))

        lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
        a_bis = jnp.where(feas_cap, _BIG, lo)
        alpha = jnp.minimum(alpha, a_bis)
    return alpha


def exotic_proximity(exo: ExoticCones, s_exo, z_exo, mu):
    """Scaled-norm centrality measure of the nonsymmetric (exp/pow)
    blocks:  eta_i = || s_i + mu grad F*(z_i) ||_{grad^2 F*(z_i)^{-1}} / mu
    (dimensionless; 0 exactly on the central path).  PSD blocks are
    self-scaled (NT) and excluded.  Returns the max over blocks (B,)."""
    B = s_exo.shape[0]
    out = jnp.zeros((B,), s_exo.dtype)

    def block_eta(s3, z3, g, h):
        r = s3 + mu[:, None] * g
        hinv_r = jnp.einsum('bij,bj->bi', _inv33(h), r)
        q = jnp.maximum(jnp.sum(r * hinv_r, axis=1), 0.0)
        eta = jnp.sqrt(q) / mu
        # overflowed barrier Hessians (f32, boundary-hugging iterate)
        # yield NaN; report a large-but-finite eta so the backtracking
        # still accepts candidates that REDUCE proximity (NaN would
        # reject everything and deadlock the instance)
        return jnp.where(jnp.isfinite(eta), eta, 1e6)

    if exo.n_exp:
        ne = exo.n_exp
        zf = z_exo[:, :3 * ne].reshape(B * ne, 3)
        g = _exp_grad(zf).reshape(B, ne, 3)
        h = _exp_hess(zf).reshape(B, ne, 3, 3)
        for i in range(ne):
            out = jnp.maximum(out, block_eta(
                s_exo[:, 3 * i:3 * i + 3], None, g[:, i], h[:, i]))
    off = exo.pow_off
    for a in exo.pow_alphas:
        z3 = z_exo[:, off:off + 3]
        g, h = _pow_grad_hess(z3, a)
        out = jnp.maximum(out, block_eta(s_exo[:, off:off + 3], z3, g, h))
        off += 3
    return out


def exotic_centrality_alpha(exo: ExoticCones, s, ds, z, dz, kdeg, alpha,
                            beta=0.8, shrink=0.7, backtracks=12):
    """Neighborhood-safeguarded step length for nonsymmetric blocks.

    The dual-Hessian scaling H = mu grad^2 F*(z) is only a good model of
    complementarity near the central path; an unrestricted Mehrotra step
    can park (s_i, z_i) deep in a corner of the cone where H explodes and
    all subsequent steps collapse (the ECOS-exp/Skajaa-Ye neighborhood
    rationale).  Shrink alpha until every exp/pow block satisfies
    eta_i(alpha) <= beta (exotic_proximity).  Backtracking preserves
    strict feasibility established by the boundary step length."""
    if not (exo.n_exp or exo.pow_alphas):
        return alpha
    ms = s.shape[1] - exo.dim

    def prox_at(a):
        sa = s + a[:, None] * ds
        za = z + a[:, None] * dz
        mu_a = jnp.maximum(jnp.sum(sa * za, axis=1) / kdeg, 1e-300)
        return exotic_proximity(exo, sa[:, ms:], za[:, ms:], mu_a)

    # relative acceptance: inside the neighborhood, stay inside; outside
    # (a previous step overshot, or the boundary step is too short to
    # re-enter in one move), accept steps that keep proximity within 1%
    # of its current value.  prox(alpha) -> prox0 as alpha -> 0, so any
    # threshold BELOW prox0 deadlocks (every candidate rejected, the
    # fully-backtracked step changes nothing, prox pins just above beta
    # and mu freezes -- measured on the sum-exp family at large p); a
    # slightly-above band keeps real steps flowing while the sigma floor's
    # centering pressure brings proximity back down over a few iterations
    thr = jnp.maximum(beta, 1.01 * prox_at(jnp.zeros_like(alpha)))
    for _ in range(backtracks):
        alpha = jnp.where(prox_at(alpha) <= thr, alpha, alpha * shrink)
    return alpha


def exotic_dual_dist(exo: ExoticCones, v):
    """Per-instance violation of v (B, dim) vs the DUAL exotic cones --
    used by the direction-based primal-infeasibility certificate, where
    the candidate ray dz is not in K* by construction."""
    B = v.shape[0]
    out = jnp.zeros((B,), v.dtype)
    if exo.n_exp:
        t = v[:, :3 * exo.n_exp].reshape(B, exo.n_exp, 3)
        u, vv, w = t[..., 0], t[..., 1], t[..., 2]
        # K* = cl{(u,v,w): u<0, w>0, v - u + u log(-u/w) >= 0};
        # boundary cases: u = 0 requires v >= 0, w >= 0
        um = jnp.maximum(-u, 1e-12)
        wm = jnp.maximum(w, 1e-12)
        main = jnp.where(-u > 1e-12,
                         -(vv - u + u * jnp.log(um / wm)),
                         jnp.maximum(-vv, 0.0))
        viol = jnp.maximum(jnp.maximum(u, -w), jnp.maximum(main, 0.0))
        out = jnp.maximum(out, jnp.max(jnp.maximum(viol, 0.0), axis=1))
    off = exo.psd_off
    for s in exo.psd_dims:
        k = s * (s + 1) // 2
        lam = jnp.linalg.eigvalsh(_svec_to_mat(v[:, off:off + k], s))
        out = jnp.maximum(out, jnp.maximum(-lam[:, 0], 0.0))
        off += k
    off = exo.pow_off
    for a in exo.pow_alphas:
        u, vv, w = v[:, off], v[:, off + 1], v[:, off + 2]
        us = jnp.maximum(u / a, 0.0)
        vs = jnp.maximum(vv / (1.0 - a), 0.0)
        main = jnp.abs(w) - us ** a * vs ** (1.0 - a)
        viol = jnp.maximum(jnp.maximum(-u, -vv), main)
        out = jnp.maximum(out, jnp.maximum(viol, 0.0))
        off += 3
    return out


def exotic_primal_dist(exo: ExoticCones, v):
    """Per-instance violation of v (B, dim) vs the PRIMAL exotic cones
    (recession-cone check for the dual-infeasibility certificate)."""
    B = v.shape[0]
    out = jnp.zeros((B,), v.dtype)
    if exo.n_exp:
        t = v[:, :3 * exo.n_exp].reshape(B, exo.n_exp, 3)
        x, y, z = t[..., 0], t[..., 1], t[..., 2]
        ys = jnp.maximum(y, 1e-12)
        zs = jnp.maximum(z, 1e-12)
        main = jnp.where(y > 1e-12, x - y * jnp.log(zs / ys),
                         jnp.maximum(x, 0.0))
        viol = jnp.maximum(jnp.maximum(-y, -z), jnp.maximum(main, 0.0))
        out = jnp.maximum(out, jnp.max(jnp.maximum(viol, 0.0), axis=1))
    off = exo.psd_off
    for s in exo.psd_dims:
        k = s * (s + 1) // 2
        lam = jnp.linalg.eigvalsh(_svec_to_mat(v[:, off:off + k], s))
        out = jnp.maximum(out, jnp.maximum(-lam[:, 0], 0.0))
        off += k
    off = exo.pow_off
    for a in exo.pow_alphas:
        x, y, z = v[:, off], v[:, off + 1], v[:, off + 2]
        xs = jnp.maximum(x, 0.0)
        ys = jnp.maximum(y, 0.0)
        main = jnp.abs(z) - xs ** a * ys ** (1.0 - a)
        viol = jnp.maximum(jnp.maximum(-x, -y), main)
        out = jnp.maximum(out, jnp.maximum(viol, 0.0))
        off += 3
    return out
