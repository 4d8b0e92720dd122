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
    maps: Any          # (N_total, p1) stacked dense map [P | q | d | A | b]
    P_ij: Any          # (nP, 2) int32 scatter indices
    A_ij: Any          # (nA, 2)
    # section sizes (static)
    nP: int = 0
    nA: int = 0

    def tree_flatten(self):
        leaves = (self.maps, self.P_ij, self.A_ij)
        aux = (self.n, self.m, self.p, self.n_zero, self.n_nonneg,
               self.soc_dims, self.is_maximization, self.nP, self.nA)
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        maps, P_ij, A_ij = leaves
        n, m, p, nz, nn, soc, ismax, nP, nA = aux
        return cls(n, m, p, nz, nn, soc, ismax, maps, P_ij, A_ij, nP, nA)

    # ------------------------------------------------------------------
    @classmethod
    def from_family(cls, fam: Family, dtype=None):
        dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64
                          else jnp.float32)
        nP = len(fam.P_idx[0])
        nA = len(fam.A_idx[0])
        stacked = np.vstack([
            fam.P_map.toarray(),
            fam.q_map.toarray(),
            fam.d_map.toarray(),
            fam.A_map.toarray(),
            fam.b_map.toarray(),
        ])
        return cls(
            n=fam.n, m=fam.m, p=fam.p, n_zero=fam.n_zero,
            n_nonneg=fam.n_nonneg, soc_dims=tuple(fam.soc_dims),
            is_maximization=fam.is_maximization,
            maps=jnp.asarray(stacked, dtype=dtype),
            P_ij=jnp.asarray(np.stack(fam.P_idx, axis=1), dtype=jnp.int32),
            A_ij=jnp.asarray(np.stack(fam.A_idx, axis=1), dtype=jnp.int32),
            nP=nP, nA=nA)


def canon_batch(jf: JaxFamily, theta):
    """theta (B, p) -> dict of batched canonical tensors."""
    B = theta.shape[0]
    dtype = jf.maps.dtype
    tt = jnp.concatenate(
        [theta.astype(dtype), jnp.ones((B, 1), dtype=dtype)], axis=1)
    vals = tt @ jf.maps.T  # (B, N_total) -- single GEMM
    o = 0
    pv = vals[:, o:o + jf.nP]; o += jf.nP
    q = vals[:, o:o + jf.n]; o += jf.n
    d = vals[:, o]; o += 1
    av = vals[:, o:o + jf.nA]; o += jf.nA
    b = vals[:, o:o + jf.m]

    P = jnp.zeros((B, jf.n, jf.n), dtype=dtype)
    P = P.at[:, jf.P_ij[:, 0], jf.P_ij[:, 1]].add(pv, unique_indices=True)
    A = jnp.zeros((B, jf.m, jf.n), dtype=dtype)
    A = A.at[:, jf.A_ij[:, 0], jf.A_ij[:, 1]].add(av, unique_indices=True)
    return dict(P=P, q=q, d=d, A=A, b=b)


def qp_bounds_batch(jf: JaxFamily, b):
    """OSQP-style box (l, u) from the aff-convention offsets b (B, m):
    zero rows: l = u = -b; nonneg rows: -b <= A x <= +inf."""
    if jf.soc_dims:
        raise ValueError('QP form unavailable: family has SOC cones')
    mz = jf.n_zero
    l = -b
    u = jnp.concatenate(
        [-b[:, :mz], jnp.full_like(b[:, mz:], jnp.inf)], axis=1)
    return l, u
