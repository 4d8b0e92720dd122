"""HSDE-backed infeasibility statuses for nonsymmetric-cone layouts
(VERDICT r2 item 3).

The homogeneous self-dual embedding (solvers/ipm_hsde.py) classifies
exp/pow-cone instances that the main IPM's neighborhood safeguards keep
from diverging: infeasible/unbounded must surface as statuses -3/-4
('infeasible'/'unbounded', reference status surface utils.py:977-985),
not max_iter.  Symmetric-cone behavior and feasible exotic instances must
be unchanged.
"""
import numpy as np

import cvxpygen_tpu as ct
from cvxpygen_tpu.canon.canonicalizer import canonicalize
from cvxpygen_tpu.runtime.solver import make_compiled_solver
from cvxpygen_tpu.solvers.ipm import IPMSettings


def test_exp_primal_infeasible_status():
    """exp(y) <= q with q = -1 (and y >= 0): primal infeasible.  This is
    exactly the case PARITY.md's round-2 known-gap note named as honestly
    stalling at max_iter; the HSDE pass must now certify it."""
    y = ct.Variable(name='y')
    q = ct.Parameter(name='q')
    prob = ct.Problem(ct.Minimize(y), [ct.exp(y) <= q, y >= 0.0])
    q.value = -1.0
    fam = canonicalize(prob)
    s = make_compiled_solver(fam, 'CLARABEL')
    s.solve_into_problem(prob)
    assert prob.status == 'infeasible'
    assert prob.value == np.inf


def test_exp_primal_infeasible_batch_statuses():
    """Batched: infeasible and feasible instances classified per-instance
    (the feasible ones optimal, never contaminated by the HSDE pass)."""
    y = ct.Variable(name='y')
    q = ct.Parameter(name='q')
    prob = ct.Problem(ct.Minimize(y), [ct.exp(y) <= q, y >= 0.0])
    q.value = 2.0
    fam = canonicalize(prob)
    s = make_compiled_solver(fam, 'CLARABEL')
    qi = [pi for pi in fam.param_info if pi.name == 'q'][0]
    base = fam.pack_theta(params=prob.parameters())
    theta = np.tile(base, (4, 1))
    theta[:, qi.offset] = [2.0, -1.0, 3.0, -0.5]
    out = s.solve_batch(theta)
    st = np.asarray(out['status'])
    assert st[0] == 1 and st[2] == 1
    assert st[1] == -3 and st[3] == -3
    # feasible instances: exp(y) <= q, y >= 0 -> optimum y = 0
    x0 = np.asarray(out['x'])[0]
    assert abs(x0[0]) < 1e-5


def test_pow_primal_infeasible_status():
    """Pow-cone layout: x in PowCone3D needs x >= 0; x == p1 with
    p1 = -1 is primal infeasible."""
    x = ct.Variable(name='x')
    y = ct.Variable(name='y')
    z = ct.Variable(name='z')
    p1 = ct.Parameter(name='p1')
    p2 = ct.Parameter(name='p2')
    prob = ct.Problem(ct.Maximize(z),
                      [ct.PowCone3D(x, y, z, 0.6), x == p1, y == p2,
                       z >= 0.0])
    p1.value = -1.0
    p2.value = 1.0
    fam = canonicalize(prob)
    s = make_compiled_solver(fam, 'CLARABEL')
    s.solve_into_problem(prob)
    assert prob.status == 'infeasible'


def test_exp_unbounded_still_certified():
    """Unbounded exp family keeps status 'unbounded' (regression guard:
    the HSDE pass must not shadow the existing certificates)."""
    n = 5
    rng = np.random.default_rng(7)
    x = ct.Variable(n, name='x')
    c = ct.Parameter(n, name='c')
    prob = ct.Problem(ct.Minimize(ct.sum(ct.exp(x)) - c @ x),
                      [ct.sum(x) <= 1.0])
    c.value = rng.normal(size=n)
    fam = canonicalize(prob)
    s = make_compiled_solver(fam, 'CLARABEL')
    s.solve_into_problem(prob)
    assert prob.status == 'unbounded'


def test_pow_unbounded_status():
    """max z s.t. (p1, p2, z) in PowCone3D is bounded (z <= p1^a p2^(1-a));
    max y s.t. (x, y, z) in Pow with only z pinned is unbounded in y."""
    x = ct.Variable(name='x')
    y = ct.Variable(name='y')
    z = ct.Variable(name='z')
    p1 = ct.Parameter(name='p1')
    prob = ct.Problem(ct.Maximize(x + y),
                      [ct.PowCone3D(x, y, z, 0.4), z == p1])
    p1.value = 1.0
    fam = canonicalize(prob)
    s = make_compiled_solver(fam, 'CLARABEL')
    s.solve_into_problem(prob)
    assert prob.status == 'unbounded'


def test_feasible_entropy_family_unchanged():
    """The HSDE pass never fires on a batch that converges: entropy
    family stays optimal with analytic parity."""
    n = 8
    rng = np.random.default_rng(3)
    x = ct.Variable(n, name='x')
    c = ct.Parameter(n, name='c')
    prob = ct.Problem(ct.Maximize(c @ x + ct.sum(ct.entr(x))),
                      [ct.sum(x) == 1.0])
    cs = rng.normal(size=(6, n))
    c.value = cs[0]
    fam = canonicalize(prob)
    s = make_compiled_solver(fam, 'CLARABEL')
    ci = [pi for pi in fam.param_info if pi.name == 'c'][0]
    base = fam.pack_theta(params=prob.parameters())
    theta = np.tile(base, (6, 1))
    theta[:, ci.offset:ci.offset + ci.flat_size] = cs
    out = s.solve_batch(theta)
    assert np.all(np.asarray(out['status']) == 1)
    obj = -(np.asarray(out['obj']) + np.asarray(out['d']))
    ref = np.log(np.sum(np.exp(cs), axis=1))
    np.testing.assert_allclose(obj, ref, rtol=1e-5, atol=1e-6)


def test_qp_exp_primal_infeasible_status():
    """P != 0 exotic layout (VERDICT r3 item 5): a quadratic objective
    routes the HSDE pass through the epigraph reduction; infeasible
    exp-cone instances must still certify -3."""
    y = ct.Variable(name='y')
    q = ct.Parameter(name='q')
    prob = ct.Problem(ct.Minimize(ct.square(y) + y),
                      [ct.exp(y) <= q, y >= 0.0])
    q.value = -1.0
    fam = canonicalize(prob)
    assert fam.P_map is not None and fam.P_map.nnz > 0   # genuinely P != 0
    s = make_compiled_solver(fam, 'CLARABEL')
    s.solve_into_problem(prob)
    assert prob.status == 'infeasible'
    assert prob.value == np.inf


def test_qp_exp_batch_statuses():
    """Batched P != 0 exotic layout: infeasible instances get -3 while
    feasible ones stay optimal (epigraph HSDE never contaminates)."""
    y = ct.Variable(name='y')
    q = ct.Parameter(name='q')
    prob = ct.Problem(ct.Minimize(0.5 * ct.square(y) + y),
                      [ct.exp(y) <= q, y >= 0.0])
    q.value = 2.0
    fam = canonicalize(prob)
    s = make_compiled_solver(fam, 'CLARABEL')
    qi = [pi for pi in fam.param_info if pi.name == 'q'][0]
    base = fam.pack_theta(params=prob.parameters())
    theta = np.tile(base, (4, 1))
    theta[:, qi.offset] = [2.0, -1.0, 3.0, -0.5]
    out = s.solve_batch(theta)
    st = np.asarray(out['status'])
    assert st[0] == 1 and st[2] == 1
    assert st[1] == -3 and st[3] == -3
    x0 = np.asarray(out['x'])[0]
    assert abs(x0[0]) < 1e-4          # optimum y = 0 for feasible rows


def test_qp_exp_unbounded_status():
    """P != 0 (rank-deficient P) unbounded exotic instance: the epigraph
    W factor must not perturb the null space (eigh, not jittered
    Cholesky), so the -4 certificate survives."""
    n = 4
    x = ct.Variable(n, name='x')
    t = ct.Variable(name='t')
    c = ct.Parameter(name='c')
    # quadratic in x only (P rank-deficient: no curvature on t); the
    # exp row bounds t above but not below, so c*t -> -inf
    prob = ct.Problem(
        ct.Minimize(ct.sum_squares(x) + c * t),
        [ct.exp(t) <= 10.0])
    c.value = 1.0
    fam = canonicalize(prob)
    assert getattr(fam, 'n_exp', 0) > 0
    assert fam.P_map is not None and fam.P_map.nnz > 0
    s = make_compiled_solver(fam, 'CLARABEL')
    s.solve_into_problem(prob)
    assert prob.status == 'unbounded'


def test_symmetric_socp_unchanged():
    """Symmetric-cone (SOC) classification does not route through the
    HSDE pass and keeps working."""
    from problems import ALL
    make, assign = ALL['ADP']
    prob = assign(make())
    fam = canonicalize(prob)
    s = make_compiled_solver(fam, 'ECOS')
    s.solve_into_problem(prob)
    assert prob.status == 'optimal'
