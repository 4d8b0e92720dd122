"""cvxpygen_tpu: TPU-native parametrized convex-solver framework.

Brand-new implementation of the capability set of cvxgrp/cvxpygen
(reference at /root/reference), re-designed TPU-first:

- modeling layer (this package's expressions/atoms/constraints/problem)
  replaces CVXPY as the front end,
- canon/ compiles a DPP-compliant problem family offline into static
  theta-affine maps (the reference's generated C workspace, as arrays),
- solvers/ are batched jitted JAX kernels (ADMM QP, conic IPM, explicit)
  replacing the reference's embedded C solvers (OSQP/SCS/ECOS/Clarabel/
  QOCO/PDAQP),
- cpg.generate_code provides the reference's public API
  (reference cvxpygen/cpg.py:17-30).
"""

from .expressions import Constant, Parameter, Variable
from .problem import Maximize, Minimize, Problem
from .constraints import ExpCone, PSD, PowCone3D, SOC
from .atoms import (
    abs, diff, entr, exp, geo_mean, huber, inv_pos, kl_div, lambda_max,
    lambda_min, log, log_det, log_sum_exp, logistic, maximum, minimum,
    multiply, neg,
    norm, norm1, norm2, norm_inf, pos, power, quad_form, quad_over_lin,
    rel_entr, reshape, sqrt, square, sum, sum_squares, trace, vec,
)

__all__ = [
    'Variable', 'Parameter', 'Constant', 'Problem', 'Minimize', 'Maximize',
    'SOC', 'ExpCone', 'PSD', 'PowCone3D', 'abs', 'diff', 'entr', 'exp',
    'geo_mean',
    'huber', 'inv_pos', 'kl_div', 'lambda_max', 'lambda_min', 'log',
    'log_det', 'log_sum_exp',
    'logistic', 'maximum', 'minimum', 'multiply', 'neg', 'norm', 'norm1',
    'norm2', 'norm_inf', 'pos', 'power', 'quad_form', 'quad_over_lin',
    'rel_entr', 'reshape', 'sqrt', 'square', 'sum', 'sum_squares', 'trace',
    'vec',
]

__version__ = '0.1.0'


def __getattr__(name):
    # lazy: TorchLayer pulls in torch; keep the base import torch-free
    if name == 'TorchLayer':
        from .autodiff.torch_layer import TorchLayer
        return TorchLayer
    if name == 'JaxLayer':
        from .autodiff.jax_layer import JaxLayer
        return JaxLayer
    raise AttributeError(f'module {__name__!r} has no attribute {name!r}')
