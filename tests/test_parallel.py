"""Multi-device scaling tests on the virtual 8-device CPU mesh (a test
class the reference lacks entirely -- SURVEY.md section 2.4/4)."""
import numpy as np
import pytest

import jax

from cvxpygen_tpu.canon.canonicalizer import canonicalize
from cvxpygen_tpu.parallel.mesh import make_mesh, shard_theta, sharded_solve
from cvxpygen_tpu.runtime.solver import CompiledQPSolver
from problems import ALL


@pytest.fixture(scope='module')
def mpc_setup():
    make, assign = ALL['MPC']
    prob = make()
    fam = canonicalize(prob)
    thetas = []
    for seed in range(8):
        assign(prob, seed=seed)
        thetas.append(fam.pack_theta(params=prob.parameters()))
    return fam, np.stack(thetas)


def test_sharded_solve_matches_single_device(mpc_setup):
    fam, T = mpc_setup
    assert len(jax.devices()) >= 8, 'conftest must provide 8 virtual devices'
    solver = CompiledQPSolver(fam)
    ref = solver.solve_batch(T)
    mesh = make_mesh(8)
    out = sharded_solve(solver, T, mesh)
    np.testing.assert_allclose(np.asarray(out['x']), np.asarray(ref['x']),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(out['obj']), np.asarray(ref['obj']),
                               rtol=1e-8)


def test_sharding_layout(mpc_setup):
    fam, T = mpc_setup
    mesh = make_mesh(4)
    Ts = shard_theta(np.tile(T, (2, 1)), mesh)
    # batch axis actually sharded over 4 devices
    assert len(Ts.sharding.device_set) == 4
    shard_shapes = {s.data.shape for s in Ts.addressable_shards}
    assert shard_shapes == {(4, fam.p)}


def test_termination_collective_under_sharding(mpc_setup):
    """the all-reduce in the while_loop cond crosses shards: instances on
    different devices converge at different iteration counts."""
    fam, T = mpc_setup
    solver = CompiledQPSolver(fam)
    mesh = make_mesh(8)
    out = sharded_solve(solver, T, mesh)
    iters = np.asarray(out['iters'])
    assert np.all(np.asarray(out['solved']))
    assert len(set(iters.tolist())) > 1  # different per-instance stop times


def test_model_axis_sharding(mpc_setup):
    """2D ('batch','model') mesh: canonical tensors sharded within
    instances too; results must match the replicated solve."""
    from cvxpygen_tpu.parallel.mesh import make_sharded_qp_solve
    from cvxpygen_tpu.runtime.jax_family import JaxFamily
    from cvxpygen_tpu.solvers.admm import ADMMSettings
    fam, T = mpc_setup
    solver = CompiledQPSolver(fam)
    ref = solver.solve_batch(T[:4])
    mesh = make_mesh(8, axes=('batch', 'model'), shape=(4, 2))
    run = make_sharded_qp_solve(solver.jf, mesh, ADMMSettings())
    out = run(T[:4])
    np.testing.assert_allclose(np.asarray(out['obj']),
                               np.asarray(ref['obj']), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out['x']), np.asarray(ref['x']),
                               rtol=1e-5, atol=1e-7)


def test_profiling_breakdown(mpc_setup):
    """runtime.profiling per-stage timings: all stages present, positive."""
    from cvxpygen_tpu.runtime.profiling import profile_qp_solve
    from cvxpygen_tpu.runtime.jax_family import JaxFamily
    fam, T = mpc_setup
    jf = JaxFamily.from_family(fam)
    prof = profile_qp_solve(jf, T[:2], reps=1)
    for key in ('canonicalize_ms', 'equilibrate_ms', 'kkt_assemble_ms',
                'factorize_ms', 'iterate_25_ms', 'total_solve_ms',
                'solves_per_s'):
        assert key in prof and prof[key] > 0, (key, prof)
