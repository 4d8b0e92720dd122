"""Receding-horizon MPC, warm-started, plus scenario-batch solving
(parity: reference examples/MPC.ipynb; extended with the TPU-native batch
axis the reference lacks)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tests'))

# CT_CPU=1 forces the CPU backend (useful when no TPU is attached)
import jax as _jax
if os.environ.get('CT_CPU') == '1':
    _jax.config.update('jax_platforms', 'cpu')
    _jax.config.update('jax_enable_x64', True)

import numpy as np

from problems import MPC_problem, assign_MPC
from cvxpygen_tpu.canon.canonicalizer import canonicalize, retrieve_primal
from cvxpygen_tpu.runtime.solver import CompiledQPSolver

if __name__ == '__main__':
    prob = MPC_problem()
    assign_MPC(prob, seed=0)
    fam = canonicalize(prob)
    solver = CompiledQPSolver(fam)

    # --- receding horizon with warm starts -----------------------------
    n_steps = 10
    x_state = prob.param_dict['x_init'].value.copy()
    A = prob.param_dict['A'].value
    B = prob.param_dict['B'].value
    warm = dict(x0=None, y0=None)
    U_vi = [v for v in fam.var_info if v.name == 'U'][0]
    for t in range(n_steps):
        prob.param_dict['x_init'].value = x_state
        theta = fam.pack_theta(params=prob.parameters())
        out = solver.solve_batch(theta[None, :], **warm)
        warm = dict(x0=out['x'], y0=out['y'])
        xarr = np.asarray(out['x'])[0]
        u0 = xarr[U_vi.offset:U_vi.offset + 3]  # first control column
        x_state = A @ x_state + B @ u0
        print(f'step {t}: |x| = {np.linalg.norm(x_state):.4f}, '
              f'iters = {int(np.asarray(out["iters"])[0])}')

    # --- scenario batch ------------------------------------------------
    thetas = []
    for seed in range(64):
        assign_MPC(prob, seed=seed)
        thetas.append(fam.pack_theta(params=prob.parameters()))
    T = np.stack(thetas)
    # the seeds vary only x_init, so canonical P/A are batch-shared and
    # solve_batch auto-routes to the shared-KKT fast path (one
    # factorization, full-batch MXU GEMM iterations)
    path = 'shared-KKT' if solver._use_shared(T, 'auto') else 'per-instance'
    t0 = time.time()
    out = solver.solve_batch(T)
    objs = np.asarray(out['obj'] + out['d'])
    dt = time.time() - t0
    print(f'\nbatch of {len(T)} [{path} path]: {dt*1000:.1f} ms '
          f'({len(T)/dt:.0f} solves/s), objs[:4] = {objs[:4].round(3)}')
