"""Exponential-cone and PSD-cone showcase on the conic-ADMM engine.

1. Batched regularized logistic regression (exp cones via the logistic
   atom): one compiled family, a batch of datasets solved in one jitted
   call -- the scenario-batch pattern the reference cannot express
   (its generated C solves one instance per call).
2. Max-eigenvalue minimization (PSD cone): min lambda_max(A(theta)).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax as _jax
if os.environ.get('CT_CPU') == '1':
    _jax.config.update('jax_platforms', 'cpu')
    _jax.config.update('jax_enable_x64', True)

import jax.numpy as jnp
import numpy as np

import cvxpygen_tpu as ct
from cvxpygen_tpu.canon.canonicalizer import canonicalize, retrieve_primal
from cvxpygen_tpu.runtime.solver import make_compiled_solver

if __name__ == '__main__':
    rng = np.random.default_rng(0)

    # --- 1. logistic regression family --------------------------------
    n_samples, n_feat = 20, 4
    w = ct.Variable(n_feat, name='w')
    Z = ct.Parameter((n_samples, n_feat), name='Z')  # rows: -y_i * x_i
    lam = 0.1
    prob = ct.Problem(ct.Minimize(
        ct.sum(ct.logistic(Z @ w)) + lam * ct.sum_squares(w)))

    fam = canonicalize(prob)
    solver = make_compiled_solver(fam, 'SCS')  # exp cones -> conic ADMM

    # a batch of 8 datasets
    thetas = []
    for b in range(8):
        X = rng.normal(size=(n_samples, n_feat))
        w_true = rng.normal(size=n_feat)
        y = np.sign(X @ w_true + 0.3 * rng.normal(size=n_samples))
        Z.value = -y[:, None] * X
        thetas.append(fam.pack_theta(params=prob.parameters()))
    out = solver.solve_batch(jnp.asarray(np.stack(thetas)))
    print('logistic regression batch:')
    print('  solved :', np.asarray(out['solved']).tolist())
    print('  iters  :', np.asarray(out['iters']).tolist())
    for b in range(3):
        wv = retrieve_primal(fam, np.asarray(out['x'])[b])[w.id]
        print(f'  w[{b}]  : {np.round(wv, 3)}')

    # --- 2. smallest t with t I >= A (PSD cone) ------------------------
    s = 5
    t = ct.Variable(name='t')
    A = ct.Parameter((s, s), name='A')
    sdp = ct.Problem(ct.Minimize(t), [ct.multiply(t, np.eye(s)) >> A])
    Asym = rng.normal(size=(s, s))
    Asym = 0.5 * (Asym + Asym.T)
    A.value = Asym
    obj = sdp.solve()
    print('\nmax-eigenvalue SDP:')
    print(f'  solver lambda_max = {obj:.6f}')
    print(f'  numpy  lambda_max = {np.linalg.eigvalsh(Asym).max():.6f}')
