"""Hyperparameter tuning by differentiating through the solver
(parity: reference examples/paper_grad/elasticnet.py, using jax.grad through
the implicit-diff solve instead of torch/cvxpylayers).

Elastic-net regression  min ||Gx - h||^2 + la ||x||^2 + om ||x||_1 ;
tune (la, om) by gradient descent on held-out validation error.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# CT_CPU=1 forces the CPU backend
import jax as _jax
if os.environ.get('CT_CPU') == '1':
    _jax.config.update('jax_platforms', 'cpu')
    _jax.config.update('jax_enable_x64', True)

import jax
import jax.numpy as jnp
import numpy as np

import cvxpygen_tpu as ct
from cvxpygen_tpu.autodiff.qp_diff import make_diff_solve
from cvxpygen_tpu.canon.canonicalizer import canonicalize
from cvxpygen_tpu.runtime.jax_family import JaxFamily
from cvxpygen_tpu.solvers.admm import ADMMSettings

if __name__ == '__main__':
    m, n = 40, 8
    rng = np.random.default_rng(0)
    G_all = rng.standard_normal((m, n))
    x_bar = rng.standard_normal(n) * (rng.random(n) > 0.5)
    h_all = G_all @ x_bar + 0.1 * rng.standard_normal(m)
    tr = slice(0, 30)
    va = slice(30, 40)

    x = ct.Variable(n, name='x')
    G = ct.Parameter((30, n), name='G')
    h = ct.Parameter(30, name='h')
    la = ct.Parameter(nonneg=True, name='la')
    om = ct.Parameter(nonneg=True, name='om')
    prob = ct.Problem(ct.Minimize(ct.sum_squares(G @ x - h)
                                  + la * ct.sum_squares(x)
                                  + om * ct.norm(x, 1)))
    G.value, h.value = G_all[tr], h_all[tr]
    la.value, om.value = 2.0, 2.0

    fam = canonicalize(prob)
    jf = JaxFamily.from_family(fam)
    solve = make_diff_solve(jf, ADMMSettings(eps_abs=1e-8, eps_rel=1e-8,
                                             max_iter=20000))
    vi = [v for v in fam.var_info if v.name == 'x'][0]
    la_i = [p for p in fam.param_info if p.name == 'la'][0]
    om_i = [p for p in fam.param_info if p.name == 'om'][0]
    theta0 = fam.pack_theta(params=prob.parameters())
    Gv = jnp.asarray(G_all[va])
    hv = jnp.asarray(h_all[va])

    def val_loss(log_hp):
        th = jnp.asarray(theta0)
        th = th.at[la_i.offset].set(jnp.exp(log_hp[0]))
        th = th.at[om_i.offset].set(jnp.exp(log_hp[1]))
        out = solve(th[None, :])
        xs = out['x'][0, vi.offset:vi.offset + n]
        r = Gv @ xs - hv
        return jnp.sum(r * r)

    log_hp = jnp.log(jnp.asarray([2.0, 2.0]))
    lr = 0.5
    for it in range(15):
        loss, g = jax.value_and_grad(val_loss)(log_hp)
        log_hp = log_hp - lr * g
        if it % 3 == 0:
            print(f'iter {it}: val loss {float(loss):.4f}, '
                  f'la={float(jnp.exp(log_hp[0])):.4f}, '
                  f'om={float(jnp.exp(log_hp[1])):.4f}')
    print(f'final: val loss {float(val_loss(log_hp)):.4f}')
