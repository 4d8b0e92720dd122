"""Adaptive rho (OSQP section 5.2): fewer iterations, same answers."""
import numpy as np
import jax.numpy as jnp
import pytest

from cvxpygen_tpu.canon.canonicalizer import canonicalize
from cvxpygen_tpu.runtime.jax_family import (
    JaxFamily, canon_batch, qp_bounds_batch)
from cvxpygen_tpu.solvers.admm import ADMMSettings, admm_solve
from cvxpygen_tpu.solvers.oracle import solve_family_numpy
from problems import ALL


@pytest.mark.parametrize('name', ['actuator', 'MPC', 'portfolio'])
def test_adaptive_converges_faster_and_agrees(name):
    make, assign = ALL[name]
    prob = make()
    assign(prob, seed=0)
    fam = canonicalize(prob)
    theta = fam.pack_theta(params=prob.parameters())
    jf = JaxFamily.from_family(fam)
    d = canon_batch(jf, jnp.asarray(theta[None, :]))
    l, u = qp_bounds_batch(jf, d['b'])

    fixed = admm_solve(d['P'], d['q'], d['A'], l, u, jf.n_zero,
                       ADMMSettings(adaptive_rho=False))
    adapt = admm_solve(d['P'], d['q'], d['A'], l, u, jf.n_zero,
                       ADMMSettings(adaptive_rho=True))
    assert bool(np.asarray(adapt['solved'])[0])
    assert int(np.asarray(adapt['iters'])[0]) <= \
        int(np.asarray(fixed['iters'])[0])

    res, _ = solve_family_numpy(fam, theta)
    obj_ad = float(np.asarray(adapt['obj'])[0])
    assert abs(obj_ad - res.obj) < 2e-2 * max(1.0, abs(res.obj))


def test_adaptive_batch_mixed_conditioning():
    """instances needing very different rho all converge in one batch."""
    make, assign = ALL['actuator']
    prob = make()
    fam = canonicalize(prob)
    thetas = [fam.pack_theta(params=assign(prob, seed=s).parameters())
              for s in range(4)]
    jf = JaxFamily.from_family(fam)
    d = canon_batch(jf, jnp.asarray(np.stack(thetas)))
    l, u = qp_bounds_batch(jf, d['b'])
    out = admm_solve(d['P'], d['q'], d['A'], l, u, jf.n_zero,
                     ADMMSettings(adaptive_rho=True, check_interval=10))
    assert np.all(np.asarray(out['solved']))
    assert int(np.asarray(out['iters']).max()) < 500  # vs ~2500 fixed
