"""Scenario-consensus ADMM (parallel/consensus.py) vs a monolithic
coupled problem, plus mesh-sharded == unsharded equivalence.

The anchor is independent of the consensus code: the coupled two-stage
program is built explicitly in the modeling layer (shared first-stage
variable + per-scenario copies) and solved by the float64 oracle.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import cvxpygen_tpu as ct
from cvxpygen_tpu.canon.canonicalizer import canonicalize
from cvxpygen_tpu.parallel.consensus import (consensus_indices,
                                             consensus_solve)
from cvxpygen_tpu.parallel.mesh import make_mesh


def _family(n=6, m=4):
    rng = np.random.default_rng(0)
    G = rng.standard_normal((m, n))
    v = ct.Variable(n, name='v')
    c = ct.Parameter(n, name='c')
    d0 = ct.Parameter(m, name='d0')
    prob = ct.Problem(ct.Minimize(ct.sum_squares(v) + c @ v),
                      [G @ v <= d0])
    return prob, G, c, d0


def _scenarios(B, n=6, m=4, seed=1):
    rng = np.random.default_rng(seed)
    cs = rng.standard_normal((B, n))
    ds = np.abs(rng.standard_normal((B, m))) + 1.0
    return cs, ds


def test_consensus_vs_monolithic():
    B, n, m, k = 4, 6, 4, 2
    prob, G, c, d0 = _family(n, m)
    cs, ds = _scenarios(B, n, m)
    c.value = cs[0]
    d0.value = ds[0]
    fam = canonicalize(prob)
    thetas = np.stack([fam.pack_theta(values={'c': cs[b], 'd0': ds[b]})
                       for b in range(B)])

    out = consensus_solve(fam, thetas, [('v', np.arange(k))],
                          rho_c=2.0, outer_iters=200, eps_consensus=1e-6)
    assert bool(out['solved'])
    zbar = np.asarray(out['z_consensus'])

    # monolithic coupled program: shared first-stage w + scenario copies
    w = ct.Variable(k, name='w')
    objs = []
    cons = []
    vs = []
    for b in range(B):
        vb = ct.Variable(n, name=f'v{b}')
        vs.append(vb)
        pb = ct.Parameter(n, name=f'c{b}')
        pb.value = cs[b]
        objs.append(ct.sum_squares(vb) + pb @ vb)
        cons.append(G @ vb <= ds[b])
        cons.append(vb[:k] == w)
    mono = ct.Problem(ct.Minimize(sum(objs[1:], objs[0])), cons)
    mono_obj = mono.solve()

    np.testing.assert_allclose(zbar, np.asarray(w.value).ravel(),
                               atol=1e-4)
    total = float(np.sum(np.asarray(out['obj'])))
    assert abs(total - mono_obj) < 1e-4 * max(1.0, abs(mono_obj))


def test_consensus_sharded_matches_unsharded():
    if len(jax.devices()) < 8:
        pytest.skip('needs the 8-device virtual mesh')
    B, n, m, k = 16, 6, 4, 2
    prob, G, c, d0 = _family(n, m)
    cs, ds = _scenarios(B, n, m, seed=3)
    c.value = cs[0]
    d0.value = ds[0]
    fam = canonicalize(prob)
    thetas = np.stack([fam.pack_theta(values={'c': cs[b], 'd0': ds[b]})
                       for b in range(B)])
    ref = consensus_solve(fam, thetas, [('v', np.arange(k))],
                          rho_c=2.0, outer_iters=100, eps_consensus=1e-5)
    mesh = make_mesh(8)
    shd = consensus_solve(fam, thetas, [('v', np.arange(k))],
                          rho_c=2.0, outer_iters=100, eps_consensus=1e-5,
                          mesh=mesh)
    np.testing.assert_allclose(np.asarray(ref['z_consensus']),
                               np.asarray(shd['z_consensus']), atol=1e-8)
    np.testing.assert_allclose(np.asarray(ref['x']),
                               np.asarray(shd['x']), atol=1e-8)


def test_consensus_indices_errors():
    prob, G, c, d0 = _family()
    fam = canonicalize(prob)
    with pytest.raises(ValueError):
        consensus_indices(fam, ['nope'])
    with pytest.raises(ValueError):
        consensus_indices(fam, [('v', [99])])
    idx = consensus_indices(fam, ['v'])
    assert idx.size == 6


def test_consensus_requires_shared_PA():
    # family whose P depends on theta: consensus_solve must refuse
    v = ct.Variable(2, name='v')
    w = ct.Parameter(2, name='w', nonneg=True)
    prob = ct.Problem(ct.Minimize(ct.sum_squares(ct.multiply(w, v))
                                  + ct.sum(v)), [v >= -1.0])
    w.value = np.array([1.0, 2.0])
    fam = canonicalize(prob)
    thetas = np.stack([fam.pack_theta(values={'w': np.array([1.0, 2.0])}),
                       fam.pack_theta(values={'w': np.array([2.0, 1.0])})])
    with pytest.raises(ValueError):
        consensus_solve(fam, thetas, ['v'])
