"""Per-stage timing of the batched MPC-QP solve (perf work tool).

Methodology on stdio-relay TPU transports (see BENCH.md):
- every stage reduces to a device-side scalar before fetching (np.asarray
  of a big array would time a multi-hundred-MB host transfer, not compute);
- all device arrays are explicit jit ARGUMENTS, never closure constants
  (constants get serialized into the executable).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                'tests'))
import numpy as np


def main():
    import jax
    try:
        jax.config.update('jax_compilation_cache_dir',
                          os.environ.get('JAX_CACHE_DIR', '/tmp/jax_cache'))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from problems import MPC_problem, assign_MPC
    from cvxpygen_tpu.canon.canonicalizer import canonicalize
    from cvxpygen_tpu.runtime.jax_family import (
        JaxFamily, canon_batch, qp_bounds_batch)
    from cvxpygen_tpu.solvers import admm as AD

    prob = MPC_problem()
    assign_MPC(prob, seed=0)
    fam = canonicalize(prob)
    thetas = []
    for seed in range(16):
        assign_MPC(prob, seed=seed)
        thetas.append(fam.pack_theta(params=prob.parameters()))
    T16 = np.stack(thetas)
    B = int(os.environ.get('BENCH_BATCH', '2048'))
    jf = JaxFamily.from_family(fam, dtype=jnp.float32)
    theta = jnp.asarray(np.tile(T16, (B // 16 + 1, 1))[:B], jnp.float32)
    st = AD.ADMMSettings()

    def timed(name, fn, *args, reps=3):
        def scalarized(*a):
            with jax.default_matmul_precision('highest'):
                out = fn(*a)
            leaves = jax.tree_util.tree_leaves(out)
            return out, sum(jnp.sum(x) for x in leaves)
        sfn = jax.jit(scalarized)
        out, s = sfn(*args)
        _ = float(s)
        t0 = time.perf_counter()
        for _ in range(reps):
            out, s = sfn(*args)
            _ = float(s)
        dt = (time.perf_counter() - t0) / reps * 1000
        print(f'{name:26s} {dt:8.1f} ms', flush=True)
        return out

    data = timed('canon GEMM', lambda jf_, th: canon_batch(jf_, th),
                 jf, theta)
    P, q, Am, b = data['P'], data['q'], data['A'], data['b']
    l, u = qp_bounds_batch(jf, b)

    sc = timed('ruiz(10)',
               lambda P, q, A, l, u: AD.ruiz_equilibrate(P, q, A, l, u,
                                                         st.scaling),
               P, q, Am, l, u)
    Ps, qs, As, ls, us = sc[0], sc[1], sc[2], sc[3], sc[4]

    m, n = Am.shape[1], Am.shape[2]
    rho_np = np.where(np.arange(m) < jf.n_zero,
                      st.rho * st.rho_eq_scale, st.rho).astype(np.float32)
    rho_vec = jnp.broadcast_to(jnp.asarray(rho_np), (B, m))

    def formM(Ps, As, rho_vec):
        return (Ps + st.sigma * jnp.eye(n, dtype=Ps.dtype)
                + jnp.einsum('bki,bk,bkj->bij', As, rho_vec, As))
    M = timed('form M', formM, Ps, As, rho_vec)

    Minv = timed('NS inverse (30)',
                 lambda M: AD.newton_schulz_inverse(M, st.ns_iters), M)
    timed('NS warm (12)',
          lambda M, X: AD.newton_schulz_warm(M, X, st.ns_adapt_iters),
          M, Minv)

    x0 = jnp.zeros((B, n), jnp.float32)
    z0 = jnp.zeros((B, m), jnp.float32)
    y0 = jnp.zeros((B, m), jnp.float32)

    def loop_xla(Minv, Ps, qs, As, ls, us, rho_vec, x, z, y):
        def one(_, carry):
            xx, zz, yy = carry
            rhs = st.sigma * xx - qs + jnp.einsum('bkj,bk->bj', As,
                                                  rho_vec * zz - yy)
            xt = jnp.einsum('bij,bj->bi', Minv, rhs)
            r = rhs - (jnp.einsum('bij,bj->bi', Ps, xt) + st.sigma * xt
                       + jnp.einsum('bkj,bk->bj', As, rho_vec *
                                    jnp.einsum('bij,bj->bi', As, xt)))
            xt = xt + jnp.einsum('bij,bj->bi', Minv, r)
            zt = jnp.einsum('bij,bj->bi', As, xt)
            x1 = st.alpha * xt + (1 - st.alpha) * xx
            w = st.alpha * zt + (1 - st.alpha) * zz + yy / rho_vec
            z1 = jnp.clip(w, ls, us)
            y1 = rho_vec * (w - z1)
            return x1, z1, y1
        return jax.lax.fori_loop(0, st.check_interval, one, (x, z, y))
    timed('loop XLA (25 it+refine)', loop_xla,
          Minv, Ps, qs, As, ls, us, rho_vec, x0, z0, y0)

    try:
        from cvxpygen_tpu.ops.admm_kernel import admm_iterate_pallas
        blk = AD._pick_block(B, m, n, jnp.float32)

        def loop_pallas(Minv, As, qs, ls, us, rho_vec, x, z, y):
            return admm_iterate_pallas(Minv, As, qs, ls, us, rho_vec,
                                       x, z, y, st.sigma, st.alpha,
                                       st.check_interval, block=blk)
        timed(f'loop Pallas (25, blk={blk})', loop_pallas,
              Minv, As, qs, ls, us, rho_vec, x0, z0, y0)
    except Exception as e:
        print(f'pallas failed: {type(e).__name__}: {e}')

    def checks(Ps, qs, As, x, z, y):
        Ax = jnp.einsum('bij,bj->bi', As, x)
        Px = jnp.einsum('bij,bj->bi', Ps, x)
        Aty = jnp.einsum('bij,bi->bj', As, y)
        return (jnp.max(jnp.abs(Ax - z), axis=1),
                jnp.max(jnp.abs(Px + qs + Aty), axis=1))
    timed('residual check', checks, Ps, qs, As, x0, z0, y0)


if __name__ == '__main__':
    main()
