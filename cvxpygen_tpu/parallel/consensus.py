"""Scenario-consensus ADMM: couple a sharded scenario batch through
shared first-stage decisions.

The reference solves independent instances only (no parallelism of any
kind, SURVEY.md section 2.4); this is new TPU-native architecture for the
classic two-stage stochastic program

    min  sum_b f_b(x_b)   s.t.  x_b in C_b,   x_b[sel] equal for all b

(non-anticipativity: every scenario b shares the same first-stage
decision, e.g. the first control move of a stochastic MPC).  Global-
variable consensus ADMM (Boyd et al. 2011, section 7.2):

    x_b^{k+1} = argmin_b f_b(x_b) + (rho_c/2)||x_b[sel] - zbar^k + u_b^k||^2
    zbar^{k+1} = mean_b(x_b^{k+1}[sel])
    u_b^{k+1}  = u_b^k + x_b^{k+1}[sel] - zbar^{k+1}

The TPU mapping is the point of this module:

- the per-scenario argmin is a QP differing from the family QP only in a
  constant diagonal P shift (+rho_c on the consensus entries, shared by
  every scenario and every outer iteration) and a per-iteration q update
  -- exactly the shared-KKT fast path (solvers/admm_shared.py): ONE
  factorization for the whole solve, all iterations MXU GEMMs, and the
  inner ADMM warm-starts from the previous outer iterate;
- `mean_b` is the ONLY cross-scenario coupling.  With the batch sharded
  over a mesh (parallel/mesh.py) it compiles to a single all-reduce over
  ICI -- the consensus collective rides the interconnect, everything else
  stays embarrassingly parallel.

Requires canonical P/A shared across the batch (scenario uncertainty in
the vector parameters -- demands, prices, initial states), which is the
standard stochastic-program shape; raises otherwise.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..canon.canonicalizer import Family
from ..runtime.jax_family import (JaxFamily, canon_batch_shared,
                                  qp_bounds_batch)
from ..runtime.solver import pa_theta_mask, use_shared_path
from ..solvers.admm import ADMMSettings


def consensus_indices(family: Family, consensus_vars):
    """Canonical-x indices of the consensus variables.

    ``consensus_vars``: iterable of variable names (whole variable) or
    ``(name, local_flat_indices)`` pairs."""
    by_name = {vi.name: vi for vi in family.var_info if vi.is_user}
    idx = []
    for item in consensus_vars:
        if isinstance(item, str):
            name, local = item, None
        else:
            name, local = item
        if name not in by_name:
            raise ValueError(f'unknown variable {name!r}')
        vi = by_name[name]
        loc = np.arange(vi.size) if local is None else np.asarray(local)
        if loc.size and (loc.min() < 0 or loc.max() >= vi.size):
            raise ValueError(f'{name}: consensus indices out of range')
        idx.extend((vi.offset + loc).tolist())
    return np.asarray(sorted(set(idx)), dtype=int)


def consensus_solve(family: Family, thetas, consensus_vars,
                    rho_c=1.0, outer_iters=50, eps_consensus=1e-4,
                    inner_settings: ADMMSettings = None, dtype=None,
                    mesh=None):
    """Solve the scenario-consensus program over a (B, p) theta batch.

    Returns dict(x (B, n), z_consensus (k,), u (B, k), obj (B,),
    outer_iters, consensus_residual, solved).  ``obj`` is each scenario's
    objective at the consensus-feasible point (x with x[sel] = zbar);
    mean(obj) is the sample-average objective.

    With ``mesh`` given, thetas are sharded over the 'batch' axis and the
    consensus mean compiles to an ICI all-reduce."""
    jf = JaxFamily.from_family(family, dtype=dtype)
    sel = consensus_indices(family, consensus_vars)
    if sel.size == 0:
        raise ValueError('no consensus variables given')
    thetas = np.atleast_2d(np.asarray(thetas, dtype=np.float64))
    if not use_shared_path(pa_theta_mask(family), thetas, 'auto'):
        raise ValueError(
            'consensus_solve requires canonical P/A shared across the '
            'scenario batch (vector-parameter uncertainty only)')
    st = inner_settings or ADMMSettings(eps_abs=0.1 * eps_consensus,
                                        eps_rel=0.1 * eps_consensus,
                                        max_iter=2000)
    sel_j = jnp.asarray(sel)
    theta_dev = jnp.asarray(thetas)
    if mesh is not None:
        from .mesh import shard_theta
        theta_dev = shard_theta(theta_dev, mesh)

    out = _consensus_jit(jf, theta_dev, sel_j, float(rho_c),
                         int(outer_iters), float(eps_consensus),
                         settings=st)
    return out


@dataclasses.dataclass(frozen=True)
class _Loop:
    rho_c: float
    outer_iters: int
    eps: float
    settings: ADMMSettings


def _consensus_raw(jf: JaxFamily, theta, sel, rho_c, outer_iters, eps,
                   settings: ADMMSettings):
    from ..solvers.admm_shared import admm_solve_shared
    data = canon_batch_shared(jf, theta)
    P, q, A = data['P'], data['q'], data['A']
    l, u_b = qp_bounds_batch(jf, data['b'])
    B, n = q.shape
    k = sel.shape[0]
    dtype = q.dtype
    # constant consensus-penalty shift: shared by all scenarios and all
    # outer iterations, so the shared-KKT factorization is reused
    P_aug = P.at[sel, sel].add(rho_c)

    def solve_inner(q_mod, x0, y0):
        return admm_solve_shared(P_aug, q_mod, A, l, u_b, jf.n_zero,
                                 settings, x0=x0, y0=y0)

    def body(state):
        x, y, u, zbar, it, rp, rd, done = state
        q_mod = q.at[:, sel].add(rho_c * (u - zbar[None, :]))
        res = solve_inner(q_mod, x, y)
        xs = res['x'][:, sel]
        # the consensus collective: mean over the (sharded) scenario axis
        zbar_new = jnp.mean(xs, axis=0)
        u_new = u + xs - zbar_new[None, :]
        rp_new = jnp.sqrt(jnp.mean(jnp.sum(
            (xs - zbar_new[None, :]) ** 2, axis=1)))
        rd_new = rho_c * jnp.linalg.norm(zbar_new - zbar)
        done_new = (rp_new < eps) & (rd_new < eps)
        return (res['x'], res['y'], u_new, zbar_new, it + 1,
                rp_new, rd_new, done_new)

    def cond(state):
        it, done = state[4], state[7]
        return (~done) & (it < outer_iters)

    x0 = jnp.zeros((B, n), dtype)
    y0 = jnp.zeros((B, A.shape[0]), dtype)
    u0 = jnp.zeros((B, k), dtype)
    z0 = jnp.zeros((k,), dtype)
    state = (x0, y0, u0, z0, jnp.int32(0),
             jnp.asarray(jnp.inf, dtype), jnp.asarray(jnp.inf, dtype),
             jnp.asarray(False))
    x, y, u, zbar, it, rp, rd, done = jax.lax.while_loop(cond, body, state)

    # scenario objectives at the consensus-feasible point
    x_cons = x.at[:, sel].set(zbar[None, :])
    Px = jnp.einsum('ij,bj->bi', P, x_cons)
    obj = 0.5 * jnp.sum(x_cons * Px, axis=1) + jnp.sum(q * x_cons, axis=1) \
        + data['d']
    return dict(x=x_cons, y=y, z_consensus=zbar, u=u, obj=obj,
                outer_iters=it, consensus_residual=rp,
                consensus_dual_residual=rd, solved=done)


_consensus_jit = jax.jit(_consensus_raw,
                         static_argnames=('rho_c', 'outer_iters', 'eps',
                                          'settings'))
