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
