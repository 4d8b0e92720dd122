"""Settings-surface parity (VERDICT r2 item 9) + shared-path tracing
warning (item 8).

Mirrors the reference's settings plumbing semantics
(_interface.py:125-130 unknown/disabled-setting behavior, :197-199
CVXPY-name translation): unknown settings warn and are ignored; disabled
settings (e.g. 'verbose') are gated behind generate_code's
enable_settings; reference-style names (ECOS maxit, Clarabel
tol_gap_abs, SCS max_iters) translate onto engine settings.
"""
import warnings

import numpy as np
import pytest

import cvxpygen_tpu as ct
from cvxpygen_tpu import cpg
from cvxpygen_tpu.canon.canonicalizer import canonicalize
from problems import ALL


def _gen(prob, tmp_path, name, **kw):
    return cpg.generate_code(prob, code_dir=str(tmp_path / name), **kw)


def test_unknown_setting_warns(tmp_path):
    make, assign = ALL['nonneg_LS']
    prob = assign(make(), seed=1)
    _gen(prob, tmp_path, 'a', solver='OSQP', prefix='ss_a')
    with pytest.warns(UserWarning, match='unknown setting'):
        prob.solve(method='CPG', definitely_not_a_setting=3)


def test_disabled_setting_gated(tmp_path):
    """'verbose' is registered but disabled: using it without
    enable_settings warns with the fix named (reference gates any
    disabled setting, _interface.py:125-130)."""
    make, assign = ALL['nonneg_LS']
    prob = assign(make(), seed=1)
    _gen(prob, tmp_path, 'b', solver='OSQP', prefix='ss_b')
    with pytest.warns(UserWarning, match="enable_settings=\\['verbose'\\]"):
        prob.solve(method='CPG', verbose=True)


def test_enable_unknown_setting_warns(tmp_path):
    """enable_settings naming a setting the solver lacks warns at
    generate time (reference configure_settings, _interface.py:125-130)."""
    make, assign = ALL['nonneg_LS']
    prob = assign(make(), seed=1)
    with pytest.warns(UserWarning, match='Cannot enable setting'):
        _gen(prob, tmp_path, 'c', solver='OSQP', prefix='ss_c',
             enable_settings=['polish'])


def test_ipm_alias_translation(tmp_path):
    """ECOS/Clarabel-style names reach the IPM engine settings
    (reference stgs_translation, _interface.py:197-199)."""
    make, assign = ALL['network']
    prob = assign(make(), seed=0)
    mod = _gen(prob, tmp_path, 'd', solver='ECOS', prefix='ss_d')
    rt = mod._runtime
    with warnings.catch_warnings():
        warnings.simplefilter('error')  # aliases must NOT warn
        st = rt._settings({'maxit': 77, 'feastol': 1e-7,
                           'tol_gap_abs': 1e-7,
                           'iterative_refinement_max_iter': 3})
    assert st.max_iter == 77
    assert st.tol_feas == 1e-7
    assert st.tol_gap == 1e-7
    assert st.refine_steps == 3


def test_conic_admm_alias_translation(tmp_path):
    make, assign = ALL['network']
    prob = assign(make(), seed=0)
    mod = _gen(prob, tmp_path, 'e', solver='SCS', prefix='ss_e')
    rt = mod._runtime
    with warnings.catch_warnings():
        warnings.simplefilter('error')
        st = rt._settings({'max_iters': 55, 'warm_start': False})
    assert st.max_iter == 55
    assert st.warm_starting is False


def test_banded_on_cone_family_targeted_error():
    """solver='BANDED' on a cone family raises the cone-mismatch error,
    not 'unknown solver' (ADVICE r2)."""
    from cvxpygen_tpu.runtime.solver import make_compiled_solver
    make, assign = ALL['ADP']
    prob = assign(make())
    fam = canonicalize(prob)
    with pytest.raises(ValueError, match='cones'):
        make_compiled_solver(fam, 'BANDED')


def test_shared_path_traced_theta_warns():
    """shared_PA='auto' with a traced theta falls back to the
    per-instance path WITH a warning naming shared_PA=True
    (VERDICT r2 weak #6)."""
    import jax
    import jax.numpy as jnp

    from cvxpygen_tpu.runtime.solver import CompiledQPSolver
    from cvxpygen_tpu.solvers.admm import ADMMSettings

    make, assign = ALL['nonneg_LS']
    prob = assign(make(), seed=1)
    fam = canonicalize(prob)
    solver = CompiledQPSolver(fam, settings=ADMMSettings(max_iter=200))
    theta = np.tile(fam.pack_theta(params=prob.parameters()), (4, 1))

    with pytest.warns(UserWarning, match='shared_PA=True'):
        @jax.jit
        def run(th):
            return solver.solve_batch(th)['obj']
        run(jnp.asarray(theta))


def test_shared_path_usable_under_jit():
    """A jitted caller passing shared_PA=True keeps the shared-KKT path
    (no warning) and matches the eager per-instance objectives."""
    import jax
    import jax.numpy as jnp

    from cvxpygen_tpu.runtime.solver import CompiledQPSolver
    from cvxpygen_tpu.solvers.admm import ADMMSettings

    make, assign = ALL['MPC']
    prob = make()
    assign(prob, seed=0)
    fam = canonicalize(prob)
    st = ADMMSettings(eps_abs=1e-6, eps_rel=1e-6, max_iter=4000)
    solver = CompiledQPSolver(fam, settings=st)
    base = fam.pack_theta(params=prob.parameters())
    xi = [pi for pi in fam.param_info if pi.name == 'x_init'][0]
    rng = np.random.default_rng(3)
    theta = np.tile(base, (4, 1))
    theta[:, xi.offset:xi.offset + xi.flat_size] = rng.uniform(
        -1, 1, (4, xi.flat_size))

    with warnings.catch_warnings():
        warnings.simplefilter('error')  # shared_PA=True must not warn
        @jax.jit
        def run(th):
            return solver.solve_batch(th, shared_PA=True)['obj']
        obj_shared = np.asarray(run(jnp.asarray(theta)))
    obj_ref = np.asarray(
        solver.solve_batch(theta, shared_PA=False)['obj'])
    np.testing.assert_allclose(obj_shared, obj_ref, rtol=1e-3, atol=1e-4)


def test_jax_layer_shared_pa_gradients_match():
    """JaxLayer(shared_PA=True) produces the same values and gradients as
    the per-instance layer when only vector parameters vary."""
    import jax
    import jax.numpy as jnp

    from cvxpygen_tpu.autodiff.jax_layer import JaxLayer

    rng = np.random.default_rng(0)
    n = 4
    x = ct.Variable(n, name='x')
    q = ct.Parameter(n, name='q')
    A0 = rng.standard_normal((3, n))
    prob = ct.Problem(
        ct.Minimize(ct.sum_squares(x) + q @ x),
        [ct.Constant(A0) @ x <= 1.0, x >= -2.0])
    q.value = rng.standard_normal(n)

    lay = JaxLayer(prob, parameters=[q], variables=[x])
    lay_sh = JaxLayer(prob, parameters=[q], variables=[x], shared_PA=True)
    qb = jnp.asarray(rng.standard_normal((5, n)))

    def loss(layer, qv):
        return jnp.sum(layer(qv)[0] ** 2)

    v1, g1 = jax.value_and_grad(lambda t: loss(lay, t))(qb)
    v2, g2 = jax.value_and_grad(lambda t: loss(lay_sh, t))(qb)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=1e-5)
