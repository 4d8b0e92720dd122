"""Torch layer over the differentiable batched solve (CVXPYlayers parity).

The reference integrates its generated ``forward``/``backward`` with
cvxpylayers for torch and jax (reference templates/cpg_solver.py.jinja2:
176-213, tests/test_diff.py:15-117).  Our jax path is native
(autodiff/qp_diff.make_diff_solve is a jax.custom_vjp); this module gives
torch users the same surface: a layer object mapping parameter tensors to
variable tensors with autograd support, batched over a leading axis.

The torch<->jax boundary crosses through NumPy on host; the solve itself
runs wherever JAX runs (TPU for the batched families).  Torch is imported
lazily so the package has no hard torch dependency.
"""
from __future__ import annotations

import numpy as np

from ..canon.canonicalizer import canonicalize
from ..runtime.jax_family import JaxFamily
from ..solvers.admm import ADMMSettings
from .qp_diff import make_diff_solve


class TorchLayer:
    """``layer = TorchLayer(problem, parameters=[...], variables=[...])``;
    ``*vals = layer(*param_tensors)`` -- same call contract as
    cvxpylayers.torch.CvxpyLayer.

    Parameter tensors may carry one leading batch dimension (all batched
    tensors must agree; unbatched ones broadcast).  Gradients flow through
    the KKT implicit differentiation of the batched solve.
    """

    def __init__(self, problem, parameters, variables, settings=None):
        import torch  # lazy
        self._torch = torch

        fam = canonicalize(problem)
        self._fam = fam

        prob_pids = [pi.pid for pi in fam.param_info]
        given_pids = [p.id for p in parameters]
        if sorted(prob_pids) != sorted(given_pids):
            raise ValueError('parameters must exactly cover the '
                             'problem\'s parameters')
        by_pid = {pi.pid: pi for pi in fam.param_info}
        self._pinfos = [by_pid[p.id] for p in parameters]

        by_vid = {vi.vid: vi for vi in fam.var_info if vi.is_user}
        self._vinfos = []
        for v in variables:
            if v.id not in by_vid:
                raise ValueError(f'variable {v.name} not in problem')
            self._vinfos.append(by_vid[v.id])

        jf = JaxFamily.from_family(fam)
        # gradient-quality tolerances by default (reference comparison bar
        # is atol 1e-4 vs cvxpylayers, tests/test_diff.py:49,106); f32
        # backends cannot reach 1e-8 residuals
        import jax.numpy as jnp
        tight = 1e-8 if jf.maps.dtype == jnp.float64 else 1e-6
        settings = settings or ADMMSettings(eps_abs=tight, eps_rel=tight,
                                            max_iter=20000)
        # long-horizon banded QP families route to the banded vjp (no
        # dense (B, n+m, n+m) reduced KKT), mirroring JaxLayer
        self._banded = False
        struct = None
        if fam.n + fam.m > 1500:
            from ..solvers.admm_banded import build_banded_structure
            struct = build_banded_structure(
                fam.P_idx, fam.A_idx, fam.n, fam.m)
        if struct is not None:
            from .qp_diff_banded import make_diff_solve_banded
            jf_sc = JaxFamily.from_family(fam, force_scatter=True)
            solve = make_diff_solve_banded(jf_sc, struct, settings)
            self._banded = True
        else:
            solve = make_diff_solve(jf, settings)
        self._solve_x = lambda theta: solve(theta)['x']
        self._p = fam.p

    # -- torch-side packing (differentiable through torch autograd) ------
    def _flatten_param(self, t, pi):
        torch = self._torch
        if pi.coords is None:
            if len(pi.shape) == 2:
                return t.transpose(-1, -2).reshape(*t.shape[:-2], -1)
            return t.reshape(*t.shape[:max(t.dim() - len(pi.shape), 0)], -1)
        r, c = pi.coords
        if len(pi.shape) == 2:
            return t[..., list(r), list(c)]
        return t[..., list(r)]

    def __call__(self, *param_tensors):
        torch = self._torch
        if len(param_tensors) != len(self._pinfos):
            raise ValueError(f'expected {len(self._pinfos)} parameter '
                             f'tensors, got {len(param_tensors)}')
        # batch detection (cvxpylayers semantics)
        batch = None
        for t, pi in zip(param_tensors, self._pinfos):
            extra = t.dim() - len(pi.shape)
            if extra == 1:
                if batch is not None and batch != t.shape[0]:
                    raise ValueError('inconsistent batch sizes')
                batch = t.shape[0]
            elif extra != 0:
                raise ValueError(f'parameter {pi.name}: tensor rank '
                                 f'{t.dim()} does not match shape {pi.shape}')
        squeeze = batch is None
        B = 1 if batch is None else batch

        segs = [None] * len(self._pinfos)
        order = sorted(range(len(self._pinfos)),
                       key=lambda i: self._pinfos[i].offset)
        dtype = param_tensors[0].dtype
        for i, (t, pi) in enumerate(zip(param_tensors, self._pinfos)):
            if t.dim() == len(pi.shape):
                t = t.unsqueeze(0).expand(B, *t.shape)
            flat = self._flatten_param(t, pi).reshape(B, -1)
            if flat.shape[1] != pi.flat_size:
                raise ValueError(f'parameter {pi.name}: got {flat.shape[1]} '
                                 f'entries, expected {pi.flat_size}')
            segs[i] = flat
        theta = torch.cat([segs[i] for i in order], dim=1)

        x = _make_solve_fn(self._torch, self._solve_x).apply(theta)

        outs = []
        for vi in self._vinfos:
            free = x[:, vi.offset:vi.offset + vi.size]
            if vi.expand is not None:
                rows, cols = vi.expand
                full = x.new_zeros((B, int(np.prod(vi.shape))))
                full[:, list(rows)] = free[:, list(cols)]
            else:
                full = free
            if len(vi.shape) == 2:
                r, c = vi.shape
                full = full.reshape(B, c, r).transpose(1, 2)
            elif len(vi.shape) == 1:
                full = full.reshape(B, vi.shape[0])
            else:
                full = full.reshape(B)
            outs.append((full[0] if squeeze else full).to(dtype))
        return tuple(outs)


def _make_solve_fn(torch, solve_x):
    import jax
    import jax.numpy as jnp

    class _SolveFn(torch.autograd.Function):
        @staticmethod
        def forward(ctx, theta):
            theta_j = jnp.asarray(theta.detach().cpu().numpy())
            x, vjp = jax.vjp(solve_x, theta_j)
            ctx._vjp = vjp
            return torch.from_numpy(np.asarray(x).copy()).to(theta.dtype)

        @staticmethod
        def backward(ctx, gx):
            gx_j = jnp.asarray(gx.detach().cpu().numpy())
            (dtheta,) = ctx._vjp(gx_j)
            return torch.from_numpy(np.asarray(dtheta).copy()).to(gx.dtype)

    return _SolveFn
