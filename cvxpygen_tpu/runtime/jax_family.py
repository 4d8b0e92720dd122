"""Device-side family: canonicalization as one GEMM + scatters.

TPU-native replacement for the reference's generated ``cpg_canonicalize_*``
CSR loops (reference cvxpygen/utils.py:279-294): all theta-affine maps are
stacked into a single dense matrix so a parameter batch theta (B, p) is
canonicalized with ONE MXU matmul  vals = theta_t @ MAPS^T, then scattered
into dense canonical tensors P (B,n,n), A (B,m,n), q (B,n), b (B,m), d (B,).

Dense canonical tensors are the right TPU layout for this problem scale
(n, m up to a few hundred; thousands of instances batched): batched dense
Cholesky on the MXU beats sparse-direct per-instance factorization that the
reference's embedded C uses (QDLDL).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..canon.canonicalizer import Family


@jax.tree_util.register_pytree_node_class
@dataclass
class JaxFamily:
    """Static structure + device arrays for one problem family."""

    # static
    n: int
    m: int
    p: int
    n_zero: int
    n_nonneg: int
    soc_dims: tuple
    is_maximization: bool

    # device arrays
    maps: Any          # (N_total, p1) stacked map; layout depends on mode
    d_quad: Any = None  # (p1, p1) theta-quadratic objective offset
    P_ij: Any = None    # scatter indices (scatter mode only)
    A_ij: Any = None
    # static
    dense_mode: bool = True
    nP: int = 0
    nA: int = 0
    n_exp: int = 0
    psd_dims: tuple = ()
    pow_alphas: tuple = ()

    def tree_flatten(self):
        leaves = (self.maps, self.d_quad, self.P_ij, self.A_ij)
        aux = (self.n, self.m, self.p, self.n_zero, self.n_nonneg,
               self.soc_dims, self.is_maximization, self.dense_mode,
               self.nP, self.nA, self.n_exp, self.psd_dims,
               self.pow_alphas)
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        maps, d_quad, P_ij, A_ij = leaves
        (n, m, p, nz, nn, soc, ismax, dense, nP, nA, n_exp, psd,
         pows) = aux
        return cls(n, m, p, nz, nn, soc, ismax, maps, d_quad, P_ij, A_ij,
                   dense, nP, nA, n_exp, psd, pows)

    # ------------------------------------------------------------------
    DENSE_LIMIT = 3e7  # max dense-map entries (~120MB f32)

    @classmethod
    def from_family(cls, fam: Family, dtype=None, force_scatter=False):
        dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64
                          else jnp.float32)
        n, m, p1 = fam.n, fam.m, fam.p1
        d_quad = (jnp.asarray(fam.d_quad.toarray(), dtype=dtype)
                  if getattr(fam, 'd_quad', None) is not None
                  else jnp.zeros((fam.p1, fam.p1), dtype=dtype))
        dense_entries = (n * n + m * n + n + m + 1) * p1
        if dense_entries <= cls.DENSE_LIMIT and not force_scatter:
            # scatter-free layout: P and A rows cover EVERY dense entry
            # (row i*n + j) -- canonicalization is one GEMM + reshape (XLA
            # TPU scatters proved a compile/fusion hazard)
            stacked = np.vstack([
                _expand_rows(fam.P_map, fam.P_idx, n * n, n),
                fam.q_map.toarray(),
                fam.d_map.toarray(),
                _expand_rows(fam.A_map, fam.A_idx, m * n, n),
                fam.b_map.toarray(),
            ])
            return cls(
                n=n, m=m, p=fam.p, n_zero=fam.n_zero,
                n_nonneg=fam.n_nonneg, soc_dims=tuple(fam.soc_dims),
                is_maximization=fam.is_maximization,
                maps=jnp.asarray(stacked, dtype=dtype), d_quad=d_quad,
                dense_mode=True, n_exp=getattr(fam, 'n_exp', 0),
                psd_dims=tuple(getattr(fam, 'psd_dims', ()) or ()),
                pow_alphas=tuple(getattr(fam, 'pow_alphas', ()) or ()))
        # scatter layout for large families: map rows only for nonzeros
        stacked = np.vstack([
            fam.P_map.toarray(), fam.q_map.toarray(), fam.d_map.toarray(),
            fam.A_map.toarray(), fam.b_map.toarray()])
        return cls(
            n=n, m=m, p=fam.p, n_zero=fam.n_zero,
            n_nonneg=fam.n_nonneg, soc_dims=tuple(fam.soc_dims),
            is_maximization=fam.is_maximization,
            maps=jnp.asarray(stacked, dtype=dtype), d_quad=d_quad,
            P_ij=jnp.asarray(np.stack(fam.P_idx, 1), jnp.int32),
            A_ij=jnp.asarray(np.stack(fam.A_idx, 1), jnp.int32),
            dense_mode=False, nP=len(fam.P_idx[0]), nA=len(fam.A_idx[0]),
            n_exp=getattr(fam, 'n_exp', 0),
            psd_dims=tuple(getattr(fam, 'psd_dims', ()) or ()),
            pow_alphas=tuple(getattr(fam, 'pow_alphas', ()) or ()))


def _expand_rows(map_csr, idx, total_rows, n):
    """Place map rows at dense positions i*n + j."""
    import scipy.sparse as spa
    rows = idx[0] * n + idx[1]
    nr = len(rows)
    S = spa.coo_matrix((np.ones(nr), (rows, np.arange(nr))),
                       shape=(total_rows, nr))
    return np.asarray((S @ map_csr).todense())


def canon_batch(jf: JaxFamily, theta):
    """theta (B, p) -> dict of batched canonical tensors (one GEMM)."""
    B = theta.shape[0]
    dtype = jf.maps.dtype
    tt = jnp.concatenate(
        [theta.astype(dtype), jnp.ones((B, 1), dtype=dtype)], axis=1)
    vals = tt @ jf.maps.T  # (B, N_total) -- single GEMM
    n, m = jf.n, jf.m
    o = 0
    if jf.dense_mode:
        P = vals[:, o:o + n * n].reshape(B, n, n); o += n * n
        q = vals[:, o:o + n]; o += n
        d = vals[:, o]; o += 1
        A = vals[:, o:o + m * n].reshape(B, m, n); o += m * n
        b = vals[:, o:o + m]
    else:
        pv = vals[:, o:o + jf.nP]; o += jf.nP
        q = vals[:, o:o + n]; o += n
        d = vals[:, o]; o += 1
        av = vals[:, o:o + jf.nA]; o += jf.nA
        b = vals[:, o:o + m]
        P = jnp.zeros((B, n, n), dtype)
        P = P.at[:, jf.P_ij[:, 0], jf.P_ij[:, 1]].add(pv, unique_indices=True)
        A = jnp.zeros((B, m, n), dtype)
        A = A.at[:, jf.A_ij[:, 0], jf.A_ij[:, 1]].add(av, unique_indices=True)
    if jf.d_quad is not None:
        d = d + jnp.einsum('bp,pq,bq->b', tt, jf.d_quad, tt)
    return dict(P=P, q=q, d=d, A=A, b=b)


def canon_batch_shared(jf: JaxFamily, theta):
    """Shared-P/A canonicalization: P (n, n) and A (m, n) from theta ROW 0,
    q/b/d batched over all rows.

    This is the device-side analogue of the reference's parameter-update
    structure (reference cvxpygen/utils.py:348-467 analyze_pus /
    write_update_structure + osqp.py:20-61 9-case update table): when the
    updated parameters touch only vector canonical params, the reference's
    generated C skips re-canonicalizing P/A and the solver keeps its
    factorization.  Here the batched equivalent is canonicalizing P/A once
    for the whole batch -- the caller (CompiledQPSolver.solve_batch) has
    verified all batch rows share the P/A-relevant theta entries."""
    B = theta.shape[0]
    dtype = jf.maps.dtype
    tt = jnp.concatenate(
        [theta.astype(dtype), jnp.ones((B, 1), dtype=dtype)], axis=1)
    n, m = jf.n, jf.m
    mp = jf.maps
    if jf.dense_mode:
        oq = n * n
        od = oq + n
        oA = od + 1
        ob = oA + m * n
        P = (tt[:1] @ mp[:oq].T).reshape(n, n)
        A = (tt[:1] @ mp[oA:ob].T).reshape(m, n)
    else:
        oq = jf.nP
        od = oq + n
        oA = od + 1
        ob = oA + jf.nA
        pv = (tt[:1] @ mp[:oq].T)[0]
        av = (tt[:1] @ mp[oA:ob].T)[0]
        P = jnp.zeros((n, n), dtype).at[jf.P_ij[:, 0], jf.P_ij[:, 1]].add(
            pv, unique_indices=True)
        A = jnp.zeros((m, n), dtype).at[jf.A_ij[:, 0], jf.A_ij[:, 1]].add(
            av, unique_indices=True)
    q = tt @ mp[oq:od].T
    d = (tt @ mp[od:oA].T)[:, 0]
    b = tt @ mp[ob:].T
    if jf.d_quad is not None:
        d = d + jnp.einsum('bp,pq,bq->b', tt, jf.d_quad, tt)
    return dict(P=P, q=q, d=d, A=A, b=b)


def canon_batch_sparse(jf: JaxFamily, theta):
    """theta (B, p) -> dict(pvals, q, d, avals, b): canonical NONZERO
    values only (no dense P/A materialization) -- the input format of the
    block-banded solver (solvers/admm_banded.py).  Requires scatter-mode
    jf (from_family(..., force_scatter=True))."""
    if jf.dense_mode:
        raise ValueError('canon_batch_sparse needs a scatter-mode JaxFamily')
    B = theta.shape[0]
    dtype = jf.maps.dtype
    tt = jnp.concatenate(
        [theta.astype(dtype), jnp.ones((B, 1), dtype=dtype)], axis=1)
    vals = tt @ jf.maps.T
    n, m = jf.n, jf.m
    o = 0
    pvals = vals[:, o:o + jf.nP]; o += jf.nP
    q = vals[:, o:o + n]; o += n
    d = vals[:, o]; o += 1
    avals = vals[:, o:o + jf.nA]; o += jf.nA
    b = vals[:, o:o + m]
    if jf.d_quad is not None:
        d = d + jnp.einsum('bp,pq,bq->b', tt, jf.d_quad, tt)
    return dict(pvals=pvals, q=q, d=d, avals=avals, b=b)


def qp_bounds_batch(jf: JaxFamily, b):
    """OSQP-style box (l, u) from the aff-convention offsets b (B, m):
    zero rows: l = u = -b; nonneg rows: -b <= A x <= +inf."""
    if jf.soc_dims or jf.n_exp or jf.psd_dims or jf.pow_alphas:
        raise ValueError('QP form unavailable: family has cones')
    mz = jf.n_zero
    l = -b
    u = jnp.concatenate(
        [-b[:, :mz], jnp.full_like(b[:, mz:], jnp.inf)], axis=1)
    return l, u
