"""AOT export/reload round-trip (serving-path parity)."""
import numpy as np

from cvxpygen_tpu.canon.canonicalizer import canonicalize
from cvxpygen_tpu.runtime.aot import export_qp_solver, load_exported
from cvxpygen_tpu.runtime.jax_family import JaxFamily
from problems import ALL


def test_export_reload_roundtrip(tmp_path):
    make, assign = ALL['nonneg_LS']
    prob = make()
    assign(prob, seed=1)
    fam = canonicalize(prob)
    jf = JaxFamily.from_family(fam)
    theta = fam.pack_theta(params=prob.parameters())
    T = np.stack([theta, theta * 0.9])

    path, exp = export_qp_solver(jf, batch_size=2, cache_dir=str(tmp_path))
    assert path is not None

    call = load_exported(path)
    x, y, obj, iters, solved = call(T)
    assert np.all(np.asarray(solved))

    # must equal the live jitted path
    from cvxpygen_tpu.runtime.solver import CompiledQPSolver
    live = CompiledQPSolver(fam)
    out = live.solve_batch(T)
    np.testing.assert_allclose(np.asarray(x), np.asarray(out['x']),
                               rtol=1e-6, atol=1e-9)
