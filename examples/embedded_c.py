"""Embedded C artifact walkthrough: codegen, build, solve, GRADIENT.

Mirrors the reference's standalone-C story (cpg_example.c + the
generated gradient kernel): ``generate_code`` emits a dependency-free C
project under ``<code_dir>/c/`` that builds with ``make`` alone, and --
round 5 -- the artifact itself differentiates: ``cpg_native_gradient``
maps solution-space seeds to user-parameter gradients in pure C.

Two families are shown:
- nonneg_LS (small, dense emission): build + run + objective gradient,
  cross-checked against the ctypes runtime and finite differences;
- charging T=288 (above the dense-emission threshold): SPARSE emission
  (COO maps + codegen-time RCM permutation, banded Cholesky in C).

Run:  python examples/embedded_c.py
"""
import os
import re
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import cvxpygen_tpu as ct
from cvxpygen_tpu import cpg
from cvxpygen_tpu.canon.canonicalizer import canonicalize
from cvxpygen_tpu.native import NativeQPSolver


def nonneg_ls_with_gradient():
    m, n = 6, 4
    rng = np.random.default_rng(0)
    x = ct.Variable(n, name='x')
    A = ct.Parameter((m, n), name='A')
    b = ct.Parameter(m, name='b')
    prob = ct.Problem(ct.Minimize(ct.sum_squares(A @ x - b)), [x >= 0])
    A.value = rng.standard_normal((m, n))
    b.value = rng.standard_normal(m)

    code_dir = tempfile.mkdtemp(prefix='cpg_embedded_')
    cpg.generate_code(prob, code_dir=code_dir, solver='OSQP', wrapper=False)
    cdir = os.path.join(code_dir, 'c')
    subprocess.run(['make'], cwd=cdir, check=True, capture_output=True)
    out = subprocess.run(['./cpg_example'], cwd=cdir, check=True,
                         capture_output=True, text=True).stdout
    print('--- standalone C run (nonneg_LS) ---')
    print(out)

    # the same core through ctypes: objective gradient vs FD
    fam = canonicalize(prob)
    theta = fam.pack_theta(params=prob.parameters())
    ns = NativeQPSolver(fam)
    ns.set_settings(eps_abs=1e-11, eps_rel=1e-11, max_iter=200000)
    ns.solve(theta)
    g = ns.gradient(gobj=1.0)
    h = 1e-6
    tp, tm = theta.copy(), theta.copy()
    tp[0] += h
    tm[0] -= h
    fd = (ns.solve(tp)['obj'] - ns.solve(tm)['obj']) / (2 * h)
    print(f'dobj/dtheta[0]: C gradient {g[0]:+.8f}  central FD {fd:+.8f}')


def charging_sparse_artifact(T=288):
    u = ct.Variable(T, name='u')
    q = ct.Variable(T + 1, name='q')
    p = ct.Parameter(T, nonneg=True, name='p')
    gamma = ct.Parameter(nonneg=True, name='gamma')
    prob = ct.Problem(
        ct.Minimize(p @ u + gamma * ct.sum_squares(u)),
        [q[1:] == q[:-1] + u, ct.Constant(-0.1) <= u,
         u <= ct.Constant(0.05), ct.Constant(0) <= q,
         q <= ct.Constant(1.0), q[0] == 0, q[T] == ct.Constant(1.0)])
    rng = np.random.default_rng(0)
    p.value = 1.0 + 4.0 * rng.random(T)
    gamma.value = 50.0

    code_dir = tempfile.mkdtemp(prefix='cpg_embedded_sparse_')
    cpg.generate_code(prob, code_dir=code_dir, solver='OSQP', wrapper=False)
    cdir = os.path.join(code_dir, 'c')
    src = open(os.path.join(cdir, 'cpg_data.c')).read()
    assert 'cpg_native_set_scatter' in src    # sparse emission engaged
    bw = re.search(r'cpg_native_set_perm\(h, cpg_rcm_perm, (\d+)\)', src)
    subprocess.run(['make'], cwd=cdir, check=True, capture_output=True)
    out = subprocess.run(['./cpg_example'], cwd=cdir, check=True,
                         capture_output=True, text=True).stdout
    print(f'--- standalone C run (charging T={T}, sparse/banded, '
          f'RCM bw={bw.group(1)}) ---')
    print('\n'.join(out.splitlines()[:4]))


if __name__ == '__main__':
    nonneg_ls_with_gradient()
    charging_sparse_artifact()
