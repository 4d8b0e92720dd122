"""Canonicalization correctness: the assembled parametric canonical form
must agree with direct numeric evaluation of the expression tree.

Pattern mirrors the reference's strategy of checking generated artifacts
against the modeling layer (tests/test_E2E_*.py), applied at the
canonical-form level: for random theta and random x, every affine user
constraint's canonical rows A x + b must equal the constraint expression
value, and objective maps must reproduce objective values for quadratics
over original variables.
"""
import numpy as np
import pytest

import cvxpygen_tpu as ct
from cvxpygen_tpu.canon.canonicalizer import canonicalize
from problems import ALL


def _rand_x(fam, rng):
    return rng.standard_normal(fam.n)


def _fill_values(fam, x, problem):
    for vi in fam.var_info:
        if vi.is_user:
            v = problem.var_dict[[vv for vv in fam.var_info if vv.vid == vi.vid][0].name]
            val = x[vi.offset:vi.offset + vi.size]
            v.value = val.reshape(vi.shape, order='F') if vi.shape else float(val[0])


@pytest.mark.parametrize('name', list(ALL))
def test_affine_constraint_rows(name):
    make, assign = ALL[name]
    prob = make()
    assign(prob)
    fam = canonicalize(prob)
    theta = fam.pack_theta(params=prob.parameters())
    P, q, d, A, b = fam.canon_numpy(theta)

    rng = np.random.default_rng(0)
    x = _rand_x(fam, rng)
    _fill_values(fam, x, prob)

    from cvxpygen_tpu.constraints import Equality, Inequality, SOC
    base_soc = fam.n_zero + fam.n_nonneg
    soc_starts = []
    o = base_soc
    for dd in fam.soc_dims:
        soc_starts.append(o)
        o += dd

    for con, rec in zip(prob.constraints, fam.constr_records):
        if rec['kind'] == 'zero':
            expr = con.expr
            if not expr.is_affine():
                continue
            rows = slice(rec['start'], rec['start'] + rec['size'])
            aff_val = A[rows] @ x + b[rows]
            ev = np.ravel(np.asarray(expr.value), order='F')
            np.testing.assert_allclose(aff_val, ev, atol=1e-10)
        elif rec['kind'] == 'nonneg':
            expr = con.rhs - con.lhs
            if expr.variables() and not expr.is_affine():
                continue
            # skip rows involving aux epigraph variables
            has_atom = any(type(a).__module__.endswith('atoms')
                           for a in _walk(con.lhs)) or any(
                type(a).__module__.endswith('atoms') for a in _walk(con.rhs))
            if has_atom:
                continue
            s0 = fam.n_zero + rec['start']
            rows = slice(s0, s0 + rec['size'])
            aff_val = A[rows] @ x + b[rows]
            ev = np.ravel(np.asarray(expr.value), order='F')
            np.testing.assert_allclose(aff_val, ev, atol=1e-10)
        elif rec['kind'] == 'soc':
            for k in range(rec['n_cones']):
                ci = rec['cone_start'] + k
                r0 = soc_starts[ci]
                dd = fam.soc_dims[ci]
                rows = slice(r0, r0 + dd)
                aff_val = A[rows] @ x + b[rows]
                tv = np.atleast_1d(np.asarray(con.t.value, dtype=float).ravel())
                Xv = np.asarray(con.X.value, dtype=float)
                if Xv.ndim == 1:
                    xv = Xv
                elif con.axis == 0:
                    xv = Xv[:, k]
                else:
                    xv = Xv[k, :]
                np.testing.assert_allclose(aff_val[0], tv[k], atol=1e-10)
                np.testing.assert_allclose(aff_val[1:], xv, atol=1e-10)


def _walk(e):
    yield e
    for a in e.args:
        yield from _walk(a)


def test_objective_quadratic_theta_free_inner():
    """quad over unparametrized inner expr: P,q,d reproduce the objective."""
    n = 4
    x = ct.Variable(n, name='x')
    gamma = ct.Parameter(nonneg=True, name='gamma')
    A = np.arange(12.0).reshape(3, 4) / 10
    b = np.array([1.0, -2.0, 0.5])
    prob = ct.Problem(ct.Minimize(ct.sum_squares(A @ x - b)
                                  + gamma * ct.sum_squares(x)),
                      [x >= -10])
    prob.param_dict['gamma'].value = 0.7
    fam = canonicalize(prob)
    theta = fam.pack_theta(params=prob.parameters())
    P, q, d, _, _ = fam.canon_numpy(theta)
    rng = np.random.default_rng(1)
    for _ in range(3):
        xv = rng.standard_normal(fam.n)
        obj_canon = 0.5 * xv @ P @ xv + q @ xv + d
        xu = xv[:n]
        obj_true = np.sum((A @ xu - b) ** 2) + 0.7 * np.sum(xu ** 2)
        np.testing.assert_allclose(obj_canon, obj_true, atol=1e-10)


def test_objective_parametrized_inner_uses_aux():
    """sum_squares(A(theta) x - b(theta)) introduces aux y == Ax - b and the
    canonical objective equals ||y||^2 (evaluated at consistent y)."""
    prob = ALL['nonneg_LS'][0]()
    ALL['nonneg_LS'][1](prob)
    fam = canonicalize(prob)
    theta = fam.pack_theta(params=prob.parameters())
    P, q, d, A, b = fam.canon_numpy(theta)
    Av = prob.param_dict['A'].value
    bv = prob.param_dict['b'].value
    rng = np.random.default_rng(2)
    xu = rng.standard_normal(2)
    y = Av @ xu - bv
    xfull = np.concatenate([xu, y])
    assert fam.n == 5
    obj_canon = 0.5 * xfull @ P @ xfull + q @ xfull + d
    np.testing.assert_allclose(obj_canon, np.sum(y ** 2), atol=1e-12)
    # and the zero rows enforce y == Ax - b
    rows = slice(0, fam.n_zero)
    resid = A[rows] @ xfull + b[rows]
    np.testing.assert_allclose(resid, 0.0, atol=1e-12)


def test_pack_theta_diag_sparsity():
    prob = ALL['MPC'][0]()
    ALL['MPC'][1](prob)
    fam = canonicalize(prob)
    theta = fam.pack_theta(params=prob.parameters())
    total = sum(pi.flat_size for pi in fam.param_info)
    assert fam.p == total
    # diag parameter contributes n entries
    psqrt = [pi for pi in fam.param_info if pi.name == 'Psqrt'][0]
    assert psqrt.flat_size == 6
    np.testing.assert_allclose(theta[psqrt.offset:psqrt.offset + 6], np.ones(6))
    # sparsity parameter contributes nnz entries
    a_info = [pi for pi in fam.param_info if pi.name == 'A'][0]
    assert a_info.flat_size == 9
