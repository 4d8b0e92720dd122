"""Multi-chip scaling: scenario-batch sharding over a device mesh.

The reference has no parallelism of any kind (single-threaded embedded C,
SURVEY.md section 2.4); this module is new TPU-native architecture:

- the primary axis is the parameter/scenario batch ('batch'): per-instance
  solves are embarrassingly parallel, so theta (B, p) is sharded over the
  mesh and XLA inserts the only needed collective -- the all-reduce behind
  `jnp.all(done)` in the solvers' while_loop termination (rides ICI);
- an optional 'model' axis shards the canonicalization GEMM and the dense
  KKT operations of very large single instances;
- TP/PP/EP/CP/sequence parallelism have no analogue in a convex-solver
  code generator and are intentionally N/A (SURVEY.md section 2.4).

Multi-host: call jax.distributed.initialize() before make_mesh(); the batch
axis then spans hosts (DCN between hosts, ICI within), and per-host theta
shards are passed via jax.make_array_from_process_local_data.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axes=('batch',), shape=None):
    """Build a Mesh over the first n_devices devices.

    axes=('batch',) gives pure data parallelism; axes=('batch', 'model')
    with shape=(b, m) adds within-instance sharding."""
    devs = jax.devices()[:n_devices] if n_devices else jax.devices()
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axes) - 1)
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, axes)


def shard_theta(theta, mesh):
    """Place a (B, p) theta batch with the batch axis sharded."""
    sharding = NamedSharding(mesh, P('batch', None))
    return jax.device_put(theta, sharding)


def sharded_solve(solver, theta, mesh, settings=None):
    """Run a compiled solver's batched solve with the batch sharded over the
    mesh.  Works for CompiledQPSolver and CompiledConicSolver."""
    theta = jnp.asarray(theta)
    assert theta.shape[0] % mesh.devices.size == 0, \
        'batch must divide the device count'
    theta_sharded = shard_theta(theta, mesh)
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, 'use_mesh') \
            else _null():
        out = solver.solve_batch(theta_sharded, settings=settings)
    return out


def make_sharded_qp_solve(jf, mesh, settings):
    """Batched QP solve with BOTH axes of parallelism:
    - 'batch': theta instances sharded (data parallel, primary axis);
    - 'model': the canonical tensors' row axis sharded within instances,
      so the dense KKT matmuls (Newton-Schulz, iteration matvecs) split
      over chips -- the axis for very large single instances.

    XLA inserts the collectives (reduce-scatter/all-gather on the
    contracted dimension, psum for termination).  The fused Pallas kernel
    assumes replicated operands, so this path pins use_pallas='never'."""
    import dataclasses

    from ..runtime.jax_family import canon_batch, qp_bounds_batch
    from ..solvers.admm import admm_solve

    settings = dataclasses.replace(settings, use_pallas='never')
    ns_bmn = NamedSharding(mesh, P('batch', 'model', None))
    ns_b = NamedSharding(mesh, P('batch', None))

    @jax.jit
    def step(jf, theta):
        data = canon_batch(jf, theta)
        Pm = jax.lax.with_sharding_constraint(data['P'], ns_bmn)
        Am = jax.lax.with_sharding_constraint(data['A'], ns_bmn)
        q = jax.lax.with_sharding_constraint(data['q'], ns_b)
        l, u = qp_bounds_batch(jf, data['b'])
        res = admm_solve(Pm, q, Am, l, u, jf.n_zero, settings)
        res['d'] = data['d']
        return res

    def run(theta):
        theta = shard_theta(jnp.asarray(theta), mesh)
        return step(jf, theta)

    return run


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False
