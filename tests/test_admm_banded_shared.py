"""Shared-KKT banded engine (solvers/admm_banded_shared.py +
ops/banded_shared_kernel.py): equivalence vs the per-instance banded
path and the float64 oracle on a shared-P/A charging-style batch
(reference examples/charging.ipynb varies only price vectors)."""
import numpy as np
import pytest

import cvxpygen_tpu as ct
from cvxpygen_tpu.canon.canonicalizer import canonicalize
from cvxpygen_tpu.solvers.admm import ADMMSettings
from cvxpygen_tpu.solvers.oracle import solve_family_numpy


def _charging_family(T=48):
    u = ct.Variable(T, name='u')
    qv = ct.Variable(T + 1, name='q')
    p = ct.Parameter(T, nonneg=True, name='p')
    Q = 1.0
    prob = ct.Problem(
        ct.Minimize(p @ u + 50.0 * ct.sum_squares(u)),
        [qv[1:] == qv[:-1] + u, -2 * 3 * Q / T <= u, u <= 3 * Q / T,
         ct.Constant(0) <= qv, qv <= Q, qv[0] == 0, qv[T] == Q])
    p.value = np.tile([3.0, 5.0, 1.0], T)[:T].astype(float)
    return prob


def _theta_batch(fam, prob, B, seed=0):
    rng = np.random.default_rng(seed)
    base = fam.pack_theta(params=prob.parameters())
    pi = [x for x in fam.param_info if x.name == 'p'][0]
    theta = np.tile(base, (B, 1))
    theta[:, pi.offset:pi.offset + pi.flat_size] *= rng.uniform(
        0.8, 1.2, (B, pi.flat_size))
    return theta


@pytest.fixture(scope='module')
def shared_setup():
    import jax.numpy as jnp
    from cvxpygen_tpu.ops.banded_grouped import build_grouped_a
    from cvxpygen_tpu.runtime.jax_family import JaxFamily, canon_batch_sparse
    from cvxpygen_tpu.solvers.admm_banded import build_banded_structure

    prob = _charging_family()
    fam = canonicalize(prob)
    st = build_banded_structure(fam.P_idx, fam.A_idx, fam.n, fam.m)
    assert st is not None
    ga = build_grouped_a(st.a_row, st.a_col, fam.m, st.s, st.nb)
    assert ga is not None
    theta = _theta_batch(fam, prob, B=4)
    jf = JaxFamily.from_family(fam, dtype=jnp.float32, force_scatter=True)
    data = canon_batch_sparse(jf, jnp.asarray(theta, jnp.float32))
    mz = jf.n_zero
    b = data['b']
    l = -b
    u = jnp.concatenate([-b[:, :mz], jnp.full_like(b[:, mz:], jnp.inf)],
                        axis=1)
    return dict(prob=prob, fam=fam, st=st, ga=ga, theta=theta, jf=jf,
                data=data, l=l, u=u, mz=mz)


def test_grouped_layout_roundtrip(shared_setup):
    """group_rows/ungroup_rows and scatter_grouped reproduce the sparse
    matvec A x exactly."""
    import jax.numpy as jnp
    from cvxpygen_tpu.ops.banded_grouped import (group_rows, scatter_grouped,
                                                 ungroup_rows)
    s = shared_setup
    st, ga = s['st'], s['ga']
    rng = np.random.default_rng(3)
    v = rng.standard_normal((2, st.m)).astype(np.float32)
    vg = group_rows(ga, jnp.asarray(v), fill=0.0)
    back = ungroup_rows(ga, vg)
    np.testing.assert_allclose(np.asarray(back), v, rtol=0, atol=0)

    avals = np.asarray(s['data']['avals'][0])
    B0, B1 = scatter_grouped(ga, jnp.asarray(avals))
    # dense A (m, n_pad) from the sparse triplets
    import scipy.sparse as spa
    A = spa.coo_matrix((avals, (st.a_row, st.a_col)),
                       shape=(st.m, st.n_pad)).toarray()
    x = rng.standard_normal(st.n_pad).astype(np.float32)
    ref = A @ x
    xb = x.reshape(st.nb, st.s)
    out = np.zeros((st.nb, ga.r_max), np.float32)
    B0n, B1n = np.asarray(B0), np.asarray(B1)
    for g in range(st.nb):
        out[g] += B0n[g] @ xb[g]
        if g + 1 < st.nb:
            out[g] += B1n[g] @ xb[g + 1]
    got = np.asarray(ungroup_rows(ga, jnp.asarray(out)[None]))[0]
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_shared_matches_per_instance(shared_setup):
    """Fused shared kernel (interpret mode) == per-instance banded path
    on a shared-P/A batch."""
    from cvxpygen_tpu.solvers.admm_banded import admm_solve_banded
    from cvxpygen_tpu.solvers.admm_banded_shared import \
        admm_solve_banded_shared
    s = shared_setup
    stg = ADMMSettings(eps_abs=1e-3, eps_rel=1e-3, max_iter=4000,
                       check_interval=25, adaptive_rho=True)
    data, l, u = s['data'], s['l'], s['u']
    ref = admm_solve_banded(s['st'], data['pvals'], data['q'],
                            data['avals'], l, u, s['mz'], stg)
    got = admm_solve_banded_shared(
        s['st'], s['ga'], data['pvals'][0], data['q'], data['avals'][0],
        l, u, s['mz'], stg, interpret=True)
    assert np.all(np.asarray(got['solved']))
    obj_ref = np.asarray(ref['obj'])
    obj_got = np.asarray(got['obj'])
    np.testing.assert_allclose(obj_got, obj_ref, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(got['x']), np.asarray(ref['x']),
                               rtol=0.05, atol=5e-3)


def test_shared_vs_oracle(shared_setup):
    """Shared kernel objective parity vs the float64 oracle per row."""
    from cvxpygen_tpu.solvers.admm_banded_shared import \
        admm_solve_banded_shared
    s = shared_setup
    stg = ADMMSettings(eps_abs=1e-4, eps_rel=1e-4, max_iter=8000,
                       check_interval=25, adaptive_rho=True)
    data = s['data']
    got = admm_solve_banded_shared(
        s['st'], s['ga'], data['pvals'][0], data['q'], data['avals'][0],
        s['l'], s['u'], s['mz'], stg, interpret=True)
    assert np.all(np.asarray(got['solved']))
    for i in range(s['theta'].shape[0]):
        res, _ = solve_family_numpy(s['fam'], s['theta'][i])
        obj = float(np.asarray(got['obj'])[i])
        assert abs(obj - res.obj) / max(1.0, abs(res.obj)) < 1e-2


def test_crk_engine_matches_per_instance(shared_setup):
    """Large-nb engine (_impl_crk: XLA loop + one-launch CR solves,
    interpret mode) == per-instance banded path on a shared batch."""
    import jax
    from cvxpygen_tpu.solvers.admm_banded import admm_solve_banded
    from cvxpygen_tpu.solvers import admm_banded_shared as abs_mod
    s = shared_setup
    stg = ADMMSettings(eps_abs=1e-3, eps_rel=1e-3, max_iter=4000,
                       check_interval=25, adaptive_rho=True)
    data, l, u = s['data'], s['l'], s['u']
    ref = admm_solve_banded(s['st'], data['pvals'], data['q'],
                            data['avals'], l, u, s['mz'], stg)
    with jax.default_matmul_precision('highest'):
        got = abs_mod._impl_crk(
            s['st'], s['ga'], data['pvals'][0], data['q'],
            data['avals'][0], l, u, s['mz'], stg, None, None, True)
    assert np.all(np.asarray(got['solved']))
    np.testing.assert_allclose(np.asarray(got['obj']),
                               np.asarray(ref['obj']),
                               rtol=5e-3, atol=5e-3)


def test_banded_iterate_kernel_equivalence(shared_setup):
    """Experimental fused iterate kernel (banded_iterate, interpret):
    one chunk of iterations matches the plain XLA iteration math on the
    rho-scaled state.  (On TPU the kernel currently only fits the Mosaic
    spill budget for small nb -- see BENCH.md round-4 notes.)"""
    import jax
    import jax.numpy as jnp
    from cvxpygen_tpu.ops.banded_grouped import (group_rows, pack_cr_levels,
                                                 pack_lleft,
                                                 scatter_grouped,
                                                 ungroup_rows)
    from cvxpygen_tpu.ops.banded_shared_kernel import banded_iterate
    from cvxpygen_tpu.ops.block_tridiag import cr_factor, cr_solve
    from cvxpygen_tpu.solvers.admm_banded import assemble_banded_M
    from cvxpygen_tpu.solvers.admm_banded_shared import ruiz_banded_shared
    s = shared_setup
    st, ga = s['st'], s['ga']
    data, l, u = s['data'], s['l'], s['u']
    B = l.shape[0]
    nb, sz, r_max = st.nb, st.s, ga.r_max
    dtype = jnp.float32
    with jax.default_matmul_precision('highest'):
        qp = jnp.concatenate(
            [data['q'][:, st.order],
             jnp.zeros((B, st.n_pad - st.n), dtype)], axis=1)
        pv, av, c, D, E = ruiz_banded_shared(
            st, data['pvals'][0], data['avals'][0],
            jnp.max(jnp.abs(qp), axis=0), 3)
        qp = qp * D[None] * c
        ls = jnp.clip(l, -1e30, 1e30) * E[None]
        us = jnp.clip(u, -1e30, 1e30) * E[None]
        rho = jnp.asarray(
            np.where(np.arange(st.m) < s['mz'], 100.0, 0.1), dtype)
        D_M, L_M = assemble_banded_M(st, pv[None], av[None], rho[None],
                                     1e-6, dtype)
        fac = cr_factor(D_M, L_M)
        packed, meta = pack_cr_levels(fac)
        llp = pack_lleft(fac)
        B0, B1 = scatter_grouped(ga, av)
        rho_g = group_rows(ga, rho[None], 1.0)[0]
        qx = jnp.transpose(qp.reshape(B, nb, sz), (1, 2, 0))
        rg3 = rho_g[:, :, None]
        lg = rg3 * jnp.transpose(group_rows(ga, ls, -1e30), (1, 2, 0))
        ug = rg3 * jnp.transpose(group_rows(ga, us, 1e30), (1, 2, 0))
        xk = jnp.zeros((nb, sz, B), dtype)
        zk = jnp.zeros((nb, r_max, B), dtype)
        yk = jnp.zeros((nb, r_max, B), dtype)
        xk2, zk2, yk2 = banded_iterate(
            packed, llp, meta, B0, B1, D_M[0], L_M[0], rho_g,
            qx, lg, ug, xk, zk, yk, sigma=1e-6, alpha=1.6,
            check_interval=5, kkt_refine=0, interpret=True)
        # XLA reference on flat state (rho-scaled z)
        import scipy.sparse as spa
        A = spa.coo_matrix((np.asarray(av), (st.a_row, st.a_col)),
                           shape=(st.m, st.n_pad)).toarray()
        Aj = jnp.asarray(A, dtype)
        x = jnp.zeros((B, st.n_pad), dtype)
        zt_ = jnp.zeros((B, st.m), dtype)
        y = jnp.zeros((B, st.m), dtype)
        for _ in range(5):
            rhs = 1e-6 * x - qp + (zt_ - y) @ Aj
            xt = cr_solve(jax.tree.map(
                lambda a: jnp.broadcast_to(a, (B,) + a.shape[1:]), fac),
                rhs.reshape(B, nb, sz)).reshape(B, st.n_pad)
            wt = (1.6 * (rho[None] * (xt @ Aj.T))
                  + (1.0 - 1.6) * zt_ + y)
            z1t = jnp.clip(wt, rho[None] * jnp.clip(l, -1e30, 1e30) * E[None],
                           rho[None] * jnp.clip(u, -1e30, 1e30) * E[None])
            y = wt - z1t
            zt_ = z1t
            x = 1.6 * xt + (1.0 - 1.6) * x
        got_x = np.asarray(jnp.transpose(xk2, (2, 0, 1)).reshape(B, -1))
        np.testing.assert_allclose(got_x, np.asarray(x), rtol=2e-4,
                                   atol=2e-4)
        got_y = np.asarray(ungroup_rows(ga, jnp.transpose(yk2, (2, 0, 1))))
        np.testing.assert_allclose(got_y, np.asarray(y), rtol=2e-4,
                                   atol=2e-4)
