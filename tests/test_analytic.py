"""Oracle-independent correctness anchors (VERDICT r1 item 5).

Every other e2e test compares against solvers/oracle.py -- a NumPy IPM
that shares the modeling/canonicalization layer with the code under test.
These tests break that circularity two ways, mirroring how the reference
anchors on independent stock solvers (reference tests/utils_test.py:20-35):

1. families with CLOSED-FORM optima asserted against hand-computed
   values (no solver involved in producing the expected numbers);
2. a 3-way agreement test: JAX ADMM vs JAX IPM vs the native C++ ADMM
   core on shared fixtures -- three independently implemented engines
   agreeing within per-engine tolerances.
"""
import numpy as np
import pytest

import cvxpygen_tpu as ct
from cvxpygen_tpu.canon.canonicalizer import canonicalize
from cvxpygen_tpu.runtime.solver import make_compiled_solver
from cvxpygen_tpu.solvers.admm import ADMMSettings
from cvxpygen_tpu.solvers.ipm import IPMSettings


def _solve(prob, solver, **kw):
    fam = canonicalize(prob)
    s = make_compiled_solver(fam, solver, **kw)
    return s.solve_into_problem(prob)


# ---------------------------------------------------------------------------
# 1. closed-form families
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('solver', ['ADMM', 'IPM'])
def test_box_projection_closed_form(solver):
    """min ||x - a||^2 s.t. l <= x <= u  ->  x* = clip(a, l, u)."""
    n = 7
    a_np = np.array([-3.0, -0.5, 0.0, 0.4, 1.1, 2.5, 9.0])
    lo, hi = -1.0, 2.0
    x = ct.Variable(n, name='x')
    a = ct.Parameter(n, name='a')
    a.value = a_np
    prob = ct.Problem(ct.Minimize(ct.sum_squares(x - a)),
                      [x >= lo, x <= hi])
    kw = dict(settings=ADMMSettings(eps_abs=1e-9, eps_rel=1e-9,
                                    max_iter=20000)) \
        if solver == 'ADMM' else {}
    _solve(prob, solver, **kw)
    x_expected = np.clip(a_np, lo, hi)
    np.testing.assert_allclose(np.asarray(x.value).ravel(), x_expected,
                               atol=1e-5)
    obj_expected = float(np.sum((x_expected - a_np) ** 2))
    assert abs(prob.value - obj_expected) < 1e-5 * max(1, obj_expected)


@pytest.mark.parametrize('solver', ['ADMM', 'IPM'])
def test_equality_qp_closed_form(solver):
    """min ||x||^2 s.t. sum(x) = b  ->  x* = (b/n) 1, obj = b^2/n."""
    n = 5
    b_val = 3.0
    x = ct.Variable(n, name='x')
    b = ct.Parameter(name='b')
    b.value = b_val
    prob = ct.Problem(ct.Minimize(ct.sum_squares(x)), [ct.sum(x) == b])
    kw = dict(settings=ADMMSettings(eps_abs=1e-9, eps_rel=1e-9,
                                    max_iter=20000)) \
        if solver == 'ADMM' else {}
    _solve(prob, solver, **kw)
    np.testing.assert_allclose(np.asarray(x.value).ravel(),
                               np.full(n, b_val / n), atol=1e-5)
    assert abs(prob.value - b_val ** 2 / n) < 1e-5
    # KKT dual: 2x - nu * 1 = 0 -> nu = 2 b / n; the zero-cone dual of
    # sum(x) == b must satisfy |nu| = 2 b / n
    dv = prob.constraints[0].dual_value
    assert abs(abs(float(np.asarray(dv).ravel()[0])) - 2 * b_val / n) < 1e-4


def test_soc_projection_closed_form():
    """min ||(t, x) - (t0, x0)||^2 s.t. ||x|| <= t : projection onto the
    second-order cone, closed form (Boyd & Vandenberghe ex.):
    for ||x0|| > |t0|: scale = (1 + t0/||x0||)/2, proj = scale*(||x0||, x0)
    with the t component = scale*||x0||."""
    x0_np = np.array([3.0, -4.0])     # ||x0|| = 5
    t0 = 1.0
    nx = 5.0
    scale = (1.0 + t0 / nx) / 2.0     # 0.6
    t_exp = scale * nx                # 3.0
    x_exp = scale * x0_np             # (1.8, -2.4)

    t = ct.Variable(name='t')
    xv = ct.Variable(2, name='xv')
    t0p = ct.Parameter(name='t0')
    x0p = ct.Parameter(2, name='x0')
    t0p.value = t0
    x0p.value = x0_np
    prob = ct.Problem(
        ct.Minimize(ct.sum_squares(xv - x0p) + ct.sum_squares(t - t0p)),
        [ct.norm(xv, 2) <= t])
    _solve(prob, 'IPM')
    np.testing.assert_allclose(float(np.asarray(t.value)), t_exp, atol=1e-5)
    np.testing.assert_allclose(np.asarray(xv.value).ravel(), x_exp,
                               atol=1e-5)


@pytest.mark.parametrize('solver', ['ADMM', 'IPM'])
def test_soft_threshold_closed_form(solver):
    """min 0.5 (x - a)^2 + lam |x|  ->  x* = sign(a) max(|a| - lam, 0)."""
    cases = [(2.0, 0.5, 1.5), (-2.0, 0.5, -1.5), (0.3, 0.5, 0.0)]
    for a_val, lam_val, x_exp in cases:
        x = ct.Variable(name='x')
        a = ct.Parameter(name='a')
        lam = ct.Parameter(nonneg=True, name='lam')
        a.value = a_val
        lam.value = lam_val
        prob = ct.Problem(ct.Minimize(
            0.5 * ct.sum_squares(x - a) + lam * ct.abs(x)))
        kw = dict(settings=ADMMSettings(eps_abs=1e-9, eps_rel=1e-9,
                                        max_iter=20000)) \
            if solver == 'ADMM' else {}
        _solve(prob, solver, **kw)
        assert abs(float(np.asarray(x.value)) - x_exp) < 1e-5, \
            (a_val, lam_val, x.value)


def test_explicit_evaluator_closed_form():
    """Explicit (mpQP) solver on the scalar box projection: x* = clip(a)
    -- the region lookup table must reproduce the exact clip."""
    x = ct.Variable(name='x')
    a = ct.Parameter(name='a')
    a.value = 0.3
    prob = ct.Problem(ct.Minimize(ct.sum_squares(x - a)),
                      [x >= -1, x <= 1, a >= -2, a <= 2])
    import tempfile
    from cvxpygen_tpu import cpg
    cpg.generate_code(prob, tempfile.mkdtemp(), solver='explicit')
    for a_val in (-1.7, -0.4, 0.0, 0.8, 1.9):
        a.value = a_val
        prob.solve(method='CPG')
        assert abs(float(np.asarray(x.value)) - np.clip(a_val, -1, 1)) \
            < 1e-5, a_val


# ---------------------------------------------------------------------------
# 2. 3-way engine agreement (independent implementations)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('name', ['nonneg_LS', 'MPC', 'network'])
def test_three_way_engine_agreement(name):
    """JAX ADMM vs JAX IPM vs native C++ ADMM on the same family; expected
    values come from mutual agreement, not from solvers/oracle.py."""
    from problems import ALL
    from cvxpygen_tpu.native import NativeQPSolver
    make, assign = ALL[name]
    prob = assign(make(), seed=0)
    fam = canonicalize(prob)
    theta = fam.pack_theta(params=prob.parameters())
    tt = np.concatenate([theta, [1.0]])
    d = float(np.asarray(fam.d_map @ tt).ravel()[0])
    if fam.d_quad is not None:
        d += float(tt @ (fam.d_quad @ tt))

    admm = make_compiled_solver(fam, 'ADMM', settings=ADMMSettings(
        eps_abs=1e-7, eps_rel=1e-7, max_iter=20000))
    out_admm = {k: np.asarray(v) for k, v in
                admm.solve_batch(theta[None, :]).items()}
    ipm = make_compiled_solver(fam, 'IPM', settings=IPMSettings())
    out_ipm = {k: np.asarray(v) for k, v in
               ipm.solve_batch(theta[None, :]).items()}
    native = NativeQPSolver(fam)
    native.set_settings(eps_abs=1e-7, eps_rel=1e-7, max_iter=20000)
    out_nat = native.solve(theta)

    assert out_admm['solved'][0] and out_ipm['solved'][0] \
        and out_nat['solved']
    # the native engine's obj already includes the constant offset d
    objs = np.array([out_admm['obj'][0] + d, out_ipm['obj'][0] + d,
                     out_nat['obj']])
    scale = max(1.0, abs(objs[1]))
    assert np.ptp(objs) < 1e-4 * scale, objs
    # compare USER variables (epigraph auxiliaries may be non-unique when
    # their constraints are slack, e.g. abs() slacks in the MPC family)
    from cvxpygen_tpu.canon.canonicalizer import retrieve_primal
    for a, b in [(out_admm['x'][0], out_ipm['x'][0]),
                 (out_nat['x'], out_ipm['x'][0])]:
        pa = retrieve_primal(fam, a)
        pb = retrieve_primal(fam, b)
        for va, vb in zip(pa, pb):
            np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                       rtol=1e-3, atol=1e-3)
