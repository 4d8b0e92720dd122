"""JAX layer over the differentiable batched solve (CVXPYlayers parity).

The reference integrates its generated ``forward``/``backward`` with
cvxpylayers for torch AND jax (reference templates/cpg_solver.py.jinja2:
176-213; tests/test_diff.py:72-117 exercise the jax interface).  Here the
whole framework is jax, so the layer is a thin, fully traced wrapper: it
packs parameter arrays into the family theta vector (Fortran order /
sparsity coords, matching Family.pack_theta), runs the custom_vjp solve
(autodiff/qp_diff.py for QP families, autodiff/conic_diff.py for conic
ones -- the conic path covers SOC/exp/PSD/pow, exceeding the torch-only
reference coverage), and unpacks the requested variables.

Everything is jittable and vmappable; gradients flow through the KKT /
conic implicit differentiation.

    layer = JaxLayer(problem, parameters=[A, b], variables=[x])
    (xval,) = layer(Aval, bval)              # jnp arrays in, out
    g = jax.grad(lambda b: layer(Aval, b)[0].sum())(bval)

Same call contract as ``cvxpylayers.jax.CvxpyLayer``: parameter arrays
may carry one leading batch dimension (batched arrays must agree;
unbatched ones broadcast).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..canon.canonicalizer import canonicalize
from ..runtime.jax_family import JaxFamily
from ..solvers.admm import ADMMSettings


class JaxLayer:
    """Differentiable problem-family layer: parameter arrays -> variable
    arrays (see module docstring)."""

    def __init__(self, problem, parameters, variables, settings=None,
                 shared_PA=False, banded='auto'):
        fam = canonicalize(problem)
        self._fam = fam

        prob_pids = [pi.pid for pi in fam.param_info]
        given_pids = [p.id for p in parameters]
        if sorted(prob_pids) != sorted(given_pids):
            raise ValueError("parameters must exactly cover the "
                             "problem's parameters")
        by_pid = {pi.pid: pi for pi in fam.param_info}
        self._pinfos = [by_pid[p.id] for p in parameters]

        by_vid = {vi.vid: vi for vi in fam.var_info if vi.is_user}
        self._vinfos = []
        for v in variables:
            if v.id not in by_vid:
                raise ValueError(f'variable {v.name} not in problem')
            self._vinfos.append(by_vid[v.id])

        jf = JaxFamily.from_family(fam)
        conic = bool(jf.soc_dims or jf.n_exp or jf.psd_dims
                     or getattr(jf, 'pow_alphas', ()))
        self._banded = False
        if conic:
            from .conic_diff import make_conic_diff_solve
            solve = make_conic_diff_solve(jf, settings)
        else:
            tight = 1e-8 if jf.maps.dtype == jnp.float64 else 1e-6
            st = settings or ADMMSettings(eps_abs=tight, eps_rel=tight,
                                          max_iter=20000)
            # banded='auto': long-horizon QP families route to the
            # banded forward + banded implicit-diff backward
            # (autodiff/qp_diff_banded.py) -- the dense backward's
            # (B, n+m, n+m) reduced KKT is ~800MB/instance at charging
            # T=1440 scale.  True forces it; False forces dense.
            struct = None
            if banded is True or (banded == 'auto'
                                  and fam.n + fam.m > 1500):
                from ..solvers.admm_banded import build_banded_structure
                struct = build_banded_structure(
                    fam.P_idx, fam.A_idx, fam.n, fam.m)
                if struct is None and banded is True:
                    raise ValueError('banded=True: family KKT pattern is '
                                     'not block-banded')
            self._banded = struct is not None
            if struct is not None:
                from .qp_diff_banded import make_diff_solve_banded
                jf_sc = JaxFamily.from_family(fam, force_scatter=True)
                solve = make_diff_solve_banded(jf_sc, struct, st)
            else:
                from .qp_diff import make_diff_solve
                # shared_PA=True: batch shares canonical P/A (only
                # vector params vary) -> shared-KKT fast path under jit
                solve = make_diff_solve(jf, st, shared_PA=shared_PA)
        self._solve_x = lambda theta: solve(theta)['x']

    # -- traced packing (differentiable) --------------------------------
    def _flatten_param(self, t, pi):
        if pi.coords is None:
            if len(pi.shape) == 2:
                # Fortran flatten (Family.pack_theta convention)
                return jnp.swapaxes(t, -1, -2).reshape(*t.shape[:-2], -1)
            return t.reshape(*t.shape[:max(t.ndim - len(pi.shape), 0)], -1)
        r, c = pi.coords
        if len(pi.shape) == 2:
            return t[..., list(r), list(c)]
        return t[..., list(r)]

    def __call__(self, *param_arrays):
        if len(param_arrays) != len(self._pinfos):
            raise ValueError(f'expected {len(self._pinfos)} parameter '
                             f'arrays, got {len(param_arrays)}')
        arrays = [jnp.asarray(t) for t in param_arrays]
        batch = None
        for t, pi in zip(arrays, self._pinfos):
            extra = t.ndim - len(pi.shape)
            if extra == 1:
                if batch is not None and batch != t.shape[0]:
                    raise ValueError('inconsistent batch sizes')
                batch = t.shape[0]
            elif extra != 0:
                raise ValueError(f'parameter {pi.name}: array rank '
                                 f'{t.ndim} does not match shape {pi.shape}')
        squeeze = batch is None
        B = 1 if batch is None else batch

        segs = [None] * len(self._pinfos)
        order = sorted(range(len(self._pinfos)),
                       key=lambda i: self._pinfos[i].offset)
        for i, (t, pi) in enumerate(zip(arrays, self._pinfos)):
            if t.ndim == len(pi.shape):
                t = jnp.broadcast_to(t[None], (B,) + t.shape)
            flat = self._flatten_param(t, pi).reshape(B, -1)
            if flat.shape[1] != pi.flat_size:
                raise ValueError(f'parameter {pi.name}: got {flat.shape[1]} '
                                 f'entries, expected {pi.flat_size}')
            segs[i] = flat
        theta = jnp.concatenate([segs[i] for i in order], axis=1)

        x = self._solve_x(theta)

        outs = []
        for vi in self._vinfos:
            free = x[:, vi.offset:vi.offset + vi.size]
            if vi.expand is not None:
                rows, cols = vi.expand
                full = jnp.zeros((B, int(np.prod(vi.shape))), x.dtype)
                full = full.at[:, list(rows)].set(free[:, list(cols)])
            else:
                full = free
            if len(vi.shape) == 2:
                r, c = vi.shape
                full = jnp.swapaxes(full.reshape(B, c, r), 1, 2)
            elif len(vi.shape) == 1:
                full = full.reshape(B, vi.shape[0])
            else:
                full = full.reshape(B)
            outs.append(full[0] if squeeze else full)
        return tuple(outs)
