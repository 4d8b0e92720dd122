"""TorchLayer (autodiff/torch_layer.py) vs oracle + finite differences.

Parity target: reference tests/test_diff.py:15-69 (generated forward/
backward integrated with cvxpylayers.torch, allclose bar).
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import cvxpygen_tpu as ct
from cvxpygen_tpu.autodiff.torch_layer import TorchLayer
from cvxpygen_tpu.canon.canonicalizer import canonicalize, retrieve_primal
from cvxpygen_tpu.solvers.oracle import solve_family_numpy


def _nonneg_ls(m=6, n=4):
    x = ct.Variable(n, name='x', nonneg=True)
    A = ct.Parameter((m, n), name='A')
    b = ct.Parameter(m, name='b')
    prob = ct.Problem(ct.Minimize(ct.sum_squares(A @ x - b)))
    return prob, A, b, x


def test_forward_matches_oracle():
    prob, A, b, x = _nonneg_ls()
    rng = np.random.default_rng(0)
    Av = rng.standard_normal((6, 4))
    bv = rng.standard_normal(6)
    layer = TorchLayer(prob, parameters=[A, b], variables=[x])
    (xt,) = layer(torch.tensor(Av), torch.tensor(bv))
    A.value, b.value = Av, bv
    prob.solve()
    np.testing.assert_allclose(xt.detach().numpy(), x.value, atol=1e-5)


def test_batched_forward_and_grad_vs_fd():
    prob, A, b, x = _nonneg_ls(m=4, n=3)
    fam = canonicalize(prob)
    rng = np.random.default_rng(1)
    B = 3
    Av = rng.standard_normal((B, 4, 3))
    bv = rng.standard_normal((B, 4))
    w = rng.standard_normal(3)

    At = torch.tensor(Av, requires_grad=True)
    bt = torch.tensor(bv, requires_grad=True)
    layer = TorchLayer(prob, parameters=[A, b], variables=[x])
    (xt,) = layer(At, bt)
    loss = (xt * torch.tensor(w)).sum()
    loss.backward()

    # finite differences of w.x*(theta) through the float64 oracle, row 0
    theta0 = fam.pack_theta(values={'A': Av[0], 'b': bv[0]})
    eps = 1e-6
    fd = np.zeros_like(theta0)
    for i in range(len(theta0)):
        tp = theta0.copy(); tp[i] += eps
        tm = theta0.copy(); tm[i] -= eps
        rp, _ = solve_family_numpy(fam, tp)
        rm, _ = solve_family_numpy(fam, tm)
        xp = retrieve_primal(fam, rp.x)[x.id]
        xm = retrieve_primal(fam, rm.x)[x.id]
        fd[i] = (w @ xp - w @ xm) / (2 * eps)
    g = fam.unpack_theta_grad(fd)
    np.testing.assert_allclose(At.grad[0].numpy(), g['A'], atol=1e-3)
    np.testing.assert_allclose(bt.grad[0].numpy(), g['b'], atol=1e-3)


def test_mixed_batched_unbatched_broadcast():
    prob, A, b, x = _nonneg_ls(m=4, n=3)
    rng = np.random.default_rng(2)
    Av = rng.standard_normal((4, 3))          # unbatched
    bv = rng.standard_normal((2, 4))          # batched
    layer = TorchLayer(prob, parameters=[A, b], variables=[x])
    (xt,) = layer(torch.tensor(Av), torch.tensor(bv))
    assert xt.shape == (2, 3)
    # row i == unbatched solve with bv[i]
    (x0,) = layer(torch.tensor(Av), torch.tensor(bv[0]))
    np.testing.assert_allclose(xt[0].detach().numpy(),
                               x0.detach().numpy(), atol=1e-6)


def test_parameter_cover_validation():
    prob, A, b, x = _nonneg_ls()
    with pytest.raises(ValueError):
        TorchLayer(prob, parameters=[A], variables=[x])
