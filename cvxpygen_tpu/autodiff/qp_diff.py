"""Implicit differentiation of the QP solution map (gradient=True parity).

TPU-native replacement for the reference's generated gradient C code
(reference templates/cpg_osqp_grad_compute.c.jinja2:432-531 and
writer.py:354-416): active-set detection from the dual/slack, one reduced
KKT solve with static regularization + 3 iterative-refinement sweeps,
assembly of dP,dq,dA,dl,du, then chain through the canonicalization maps'
transpose back to theta.  Where the reference maintains an LDL factorization
with rank-1 updates per active-set change (cpg_ldl_add/delete), we factor
batched dense KKT systems on the MXU -- cheaper under batching and jit.

Derivation (box QP, rows l <= Ax <= u, active rows A_a x = c_a):
    stationarity  P x + q + A_a' y_a = 0     (y in OSQP sign convention)
    K = [[P, A_a'], [A_a, 0]],  K [rx; ry] = [g; 0]  (g = dL/dx)
    dL/dq = -rx ;  dL/dc_a = ry ;  dL/dP = -(rx x' + x rx')/2
    dL/dA_a = -(y_a rx' + ry x')
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..runtime.jax_family import JaxFamily, canon_batch, qp_bounds_batch
from ..solvers.admm import ADMMSettings, admm_solve

ACT_EPS = 1e-7
REG = 1e-6


def make_diff_solve(jf: JaxFamily, settings: ADMMSettings = None,
                    shared_PA=False):
    """Build a differentiable batched solve: theta (B,p) -> dict(x, y, obj).

    Forward = batched ADMM; backward = implicit KKT differentiation via
    jax.custom_vjp, so jax.grad/vjp work through the solve
    (cvxpylayers-compatible; reference cpg_solver.py.jinja2:176-213).

    ``shared_PA=True``: the caller asserts every batch row shares the
    canonical P/A (only vector parameters vary); the forward pass then
    runs the shared-KKT fast path (solvers/admm_shared.py) -- the way to
    keep the ~6x path under jit, where 'auto' detection cannot inspect
    the traced theta (see runtime/solver.use_shared_path)."""
    settings = settings or ADMMSettings()

    def fwd_raw(theta):
        if shared_PA:
            from ..runtime.jax_family import canon_batch_shared
            from ..solvers.admm_shared import admm_solve_shared
            data = canon_batch_shared(jf, theta)
            l, u = qp_bounds_batch(jf, data['b'])
            res = admm_solve_shared(data['P'], data['q'], data['A'], l, u,
                                    jf.n_zero, settings)
            B = theta.shape[0]
            res.update(
                P=jnp.broadcast_to(data['P'][None], (B,) + data['P'].shape),
                A=jnp.broadcast_to(data['A'][None], (B,) + data['A'].shape),
                q=data['q'], d=data['d'], l=l, u=u)
            return res
        data = canon_batch(jf, theta)
        l, u = qp_bounds_batch(jf, data['b'])
        res = admm_solve(data['P'], data['q'], data['A'], l, u,
                         jf.n_zero, settings)
        res.update(P=data['P'], A=data['A'], q=data['q'], d=data['d'],
                   l=l, u=u)
        return res

    @jax.custom_vjp
    def solve(theta):
        out = fwd_raw(theta)
        return dict(x=out['x'], y=out['y'], obj=out['obj'] + out['d'])

    def solve_fwd(theta):
        out = fwd_raw(theta)
        primal = dict(x=out['x'], y=out['y'], obj=out['obj'] + out['d'])
        resid = (theta, out['x'], out['y'], out['z'], out['P'], out['q'],
                 out['A'], out['l'], out['u'])
        return primal, resid

    def solve_bwd(resid, g):
        theta, x, y, z, P, q, A, l, u = resid
        B, n = x.shape
        m = A.shape[1]
        dtype = x.dtype
        gx = g['x']
        gobj = g['obj']
        # dL/dy upstream is rare (cvxpylayers uses x only); fold in if given
        gy = g.get('y', jnp.zeros_like(y)) if isinstance(g, dict) else 0.0

        # objective term: obj(theta) = 0.5 x'Px + q'x + d with x(theta);
        # indirect part via dobj/dx = Px + q joins gx, explicit parts join
        # dP, dq, dd below.
        Px = jnp.einsum('bij,bj->bi', P, x)
        gx = gx + gobj[:, None] * (Px + q)

        act_low = (y < -ACT_EPS) | (jnp.abs(z - l) < ACT_EPS)
        act_up = (y > ACT_EPS) | (jnp.abs(z - u) < ACT_EPS)
        act = act_low | act_up
        mask = act.astype(dtype)

        Am = A * mask[:, :, None]
        N = n + m
        idx = jnp.arange(m)
        K = jnp.zeros((B, N, N), dtype)
        K = K.at[:, :n, :n].set(P + REG * jnp.eye(n, dtype=dtype))
        K = K.at[:, :n, n:].set(jnp.swapaxes(Am, 1, 2))
        K = K.at[:, n:, :n].set(Am)
        K = K.at[:, n + idx, n + idx].set(
            jnp.where(act, -REG, -1.0 / REG).astype(dtype))

        rhs = jnp.concatenate([gx, gy * mask], axis=1)
        # TPU has no f64 LU lowering; factor in f32 there and let the
        # refinement sweeps below (computed in the working dtype) recover
        # the accuracy (standard mixed-precision iterative refinement)
        fac_dtype = (jnp.float32
                     if (dtype == jnp.float64
                         and jax.default_backend() == 'tpu') else dtype)
        lu, piv = jax.scipy.linalg.lu_factor(K.astype(fac_dtype))

        def kkt_solve(r):
            return jax.scipy.linalg.lu_solve(
                (lu, piv), r.astype(fac_dtype)[..., None])[..., 0].astype(dtype)

        sol = kkt_solve(rhs)
        # refinement against the unregularized KKT (parity: 3 sweeps,
        # reference cpg_osqp_grad_compute.c.jinja2:456-490)
        K_true = K.at[:, jnp.arange(n), jnp.arange(n)].add(-REG)
        K_true = K_true.at[:, n + idx, n + idx].set(
            jnp.where(act, 0.0, -1.0 / REG).astype(dtype))
        for _ in range(3):
            r = rhs - jnp.einsum('bij,bj->bi', K_true, sol)
            sol = sol + kkt_solve(r)
        rx = sol[:, :n]
        ry = sol[:, n:] * mask

        dq = -rx
        dP = -0.5 * (rx[:, :, None] * x[:, None, :]
                     + x[:, :, None] * rx[:, None, :])
        dA = -(y[:, :, None] * rx[:, None, :] + ry[:, :, None] * x[:, None, :])
        dl = jnp.where(act_low & ~act_up, ry, 0.0)
        du = jnp.where(act_up & ~act_low, ry, 0.0)
        deq = jnp.where(act_low & act_up, ry, 0.0)

        dP = dP + gobj[:, None, None] * 0.5 * (x[:, :, None] * x[:, None, :])
        dq = dq + gobj[:, None] * x
        dd = gobj

        db = -(dl + du + deq)   # l = -b (all rows), u = -b (zero rows)
        if jf.dense_mode:
            dPv = dP.reshape(B, n * n)
            dAv = dA.reshape(B, m * n)
        else:
            dPv = dP[:, jf.P_ij[:, 0], jf.P_ij[:, 1]]
            dAv = dA[:, jf.A_ij[:, 0], jf.A_ij[:, 1]]
        dvals = jnp.concatenate([dPv, dq, dd[:, None], dAv, db], axis=1)
        dtt = dvals @ jf.maps          # (B, p1): transpose-map chain
        if jf.d_quad is not None:
            # theta-quadratic objective offset: d += tt' Dq tt
            tt = jnp.concatenate(
                [theta, jnp.ones((theta.shape[0], 1), theta.dtype)], axis=1)
            dtt = dtt + gobj[:, None] * (tt @ (jf.d_quad + jf.d_quad.T))
        return (dtt[:, :-1],)

    solve.defvjp(solve_fwd, solve_bwd)
    return solve
