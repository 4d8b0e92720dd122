"""AOT compilation artifacts: serialize/load jitted solve executables.

Parity role: the reference's generated artifact IS a persisted compilation
(C sources + compiled extension, reference SURVEY.md section 5 'the
generated artifact itself is a persisted compilation').  Here the artifact
is a serialized StableHLO export of the jitted batched solve for a fixed
(family, batch-shape): `jax.export` bytes on disk, reloadable without
re-tracing/re-compiling Python.

Used by generated packages for serving deployments; the interactive path
relies on XLA's in-process jit cache instead.
"""
from __future__ import annotations

import hashlib
import os

import jax
import jax.numpy as jnp
import numpy as np

from .jax_family import JaxFamily, canon_batch, qp_bounds_batch
from ..solvers.admm import ADMMSettings, admm_solve


def family_fingerprint(jf: JaxFamily):
    h = hashlib.sha256()
    h.update(np.asarray(jf.maps).tobytes())
    h.update(str((jf.n, jf.m, jf.p, jf.n_zero, jf.n_nonneg,
                  jf.soc_dims)).encode())
    return h.hexdigest()[:16]


def _qp_step(jf, settings):
    def step(theta):
        data = canon_batch(jf, theta)
        l, u = qp_bounds_batch(jf, data['b'])
        res = admm_solve(data['P'], data['q'], data['A'], l, u,
                         jf.n_zero, settings)
        return (res['x'], -res['y'], res['obj'] + data['d'],
                res['iters'], res['solved'])
    return step


def export_qp_solver(jf: JaxFamily, batch_size: int,
                     settings: ADMMSettings = None, cache_dir=None):
    """Export the batched QP solve for a fixed batch size; returns
    (path, exported).  Writes <cache_dir>/<fingerprint>_B<batch>.jaxexport."""
    from jax import export as jexport
    settings = settings or ADMMSettings()
    dtype = jnp.asarray(jf.maps).dtype
    spec = jax.ShapeDtypeStruct((batch_size, jf.p), dtype)
    exp = jexport.export(jax.jit(_qp_step(jf, settings)))(spec)
    blob = exp.serialize()
    path = None
    if cache_dir is not None:
        os.makedirs(cache_dir, exist_ok=True)
        path = os.path.join(
            cache_dir, f'{family_fingerprint(jf)}_B{batch_size}.jaxexport')
        with open(path, 'wb') as f:
            f.write(blob)
    return path, exp


def load_exported(path):
    """Load a serialized executable; returns a callable(theta) -> tuple."""
    from jax import export as jexport
    with open(path, 'rb') as f:
        blob = f.read()
    exp = jexport.deserialize(blob)
    return exp.call
