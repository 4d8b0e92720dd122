"""Per-solver settings registries (parity: reference settings plumbing).

The reference declares, per solver, a registry of ``Setting(type, default,
enabled, name_cvxpy)`` (reference cvxpygen/mappings.py:140-145; osqp.py:
102-115; clarabel.py:63-119), warns on unknown settings
(_interface.py:125-130) and translates CVXPY-style names
(_interface.py:197-199).  Here each *engine* (ADMM / IPM / EXPLICIT) owns a
registry, and the reference's solver names alias onto engines.
"""
from __future__ import annotations

from dataclasses import dataclass, field, fields
from typing import Any, Dict, Optional

from .admm import ADMMSettings
from .conic_admm import ConicADMMSettings
from .ipm import IPMSettings


@dataclass
class Setting:
    """One tunable solver setting (reference mappings.py:140-145)."""
    type: str
    default: Any
    enabled: bool = True
    name_cvxpy: Optional[str] = None


def _registry_from_dataclass(cls, cvxpy_names=None):
    cvxpy_names = cvxpy_names or {}
    out = {}
    for f in fields(cls):
        out[f.name] = Setting(type=getattr(f.type, '__name__', str(f.type)),
                              default=f.default,
                              name_cvxpy=cvxpy_names.get(f.name))
    return out


ADMM_SETTINGS: Dict[str, Setting] = _registry_from_dataclass(
    ADMMSettings, cvxpy_names={'warm_starting': 'warm_start'})
IPM_SETTINGS: Dict[str, Setting] = _registry_from_dataclass(IPMSettings)
CONIC_ADMM_SETTINGS: Dict[str, Setting] = _registry_from_dataclass(
    ConicADMMSettings, cvxpy_names={'warm_starting': 'warm_start',
                                    'max_iter': 'max_iters'})
EXPLICIT_SETTINGS: Dict[str, Setting] = {
    'max_regions': Setting('int', 500),
    'fp16': Setting('bool', False),
    'dual': Setting('bool', False),
}

# settings gated behind enable_settings (reference: a Setting with
# enabled=False is unusable until listed in generate_code's
# enable_settings, _interface.py:125-130; the canonical example is
# 'verbose', tests/test_E2E_QP.py:226-248)
for _reg in (ADMM_SETTINGS, IPM_SETTINGS, CONIC_ADMM_SETTINGS,
             EXPLICIT_SETTINGS):
    _reg['verbose'] = Setting('bool', False, enabled=False)

# per-engine translation of reference/CVXPY-style setting names to engine
# settings (reference _interface.py:197-199 stgs_translation: each solver
# interface maps CVXPY kwarg names onto its native names).  The reference
# solver surfaces covered: OSQP (osqp.py:102-115), SCS (scs.py), ECOS
# feastol/abstol/reltol/maxit, Clarabel tol_*/equilibrate_*/
# iterative_refinement_* (clarabel.py:63-119).
ADMM_ALIASES: Dict[str, str] = {
    'warm_start': 'warm_starting',
}
CONIC_ADMM_ALIASES: Dict[str, str] = {
    'warm_start': 'warm_starting',
    'max_iters': 'max_iter',
    'eps': 'eps_abs',
}
IPM_ALIASES: Dict[str, str] = {
    # ECOS-style
    'maxit': 'max_iter', 'feastol': 'tol_feas',
    'abstol': 'tol_gap', 'reltol': 'tol_gap',
    # Clarabel-style (clarabel.py:63-119)
    'tol_gap_abs': 'tol_gap', 'tol_gap_rel': 'tol_gap',
    'tol_infeas_abs': 'tol_infeas', 'tol_infeas_rel': 'tol_infeas',
    'tol_feas_abs': 'tol_feas', 'tol_feas_rel': 'tol_feas',
    'equilibrate_max_iter': 'scaling',
    'iterative_refinement_max_iter': 'refine_steps',
    'max_step_fraction': 'frac_to_boundary',
    # QOCO-style
    'abstol_inacc': 'tol_gap', 'reltol_inacc': 'tol_gap',
}
EXPLICIT_ALIASES: Dict[str, str] = {}

_ENGINE_ALIASES = {
    'ADMM': ADMM_ALIASES,
    'CONIC_ADMM': CONIC_ADMM_ALIASES,
    'IPM': IPM_ALIASES,
    'EXPLICIT': EXPLICIT_ALIASES,
}


def engine_aliases(engine: str) -> Dict[str, str]:
    """Reference-name -> engine-setting-name translation for one engine."""
    return _ENGINE_ALIASES.get(engine, {})

# reference solver name -> (engine, registry).  The reference's per-solver
# interfaces (cvxpygen/solvers/{osqp,scs,ecos,clarabel,qoco,pdaqp}.py) each
# wrapped a native solver; here every canonical form maps onto one of the
# two TPU engines (+ the explicit evaluator).
SOLVER_REGISTRY = {
    'ADMM': ('ADMM', ADMM_SETTINGS),
    'OSQP': ('ADMM', ADMM_SETTINGS),
    'IPM': ('IPM', IPM_SETTINGS),
    'CONIC_ADMM': ('CONIC_ADMM', CONIC_ADMM_SETTINGS),
    'SCS': ('CONIC_ADMM', CONIC_ADMM_SETTINGS),
    'ECOS': ('IPM', IPM_SETTINGS),
    'CLARABEL': ('IPM', IPM_SETTINGS),
    'QOCO': ('IPM', IPM_SETTINGS),
    'QOCOGEN': ('IPM', IPM_SETTINGS),
    'EXPLICIT': ('EXPLICIT', EXPLICIT_SETTINGS),
    'PDAQP': ('EXPLICIT', EXPLICIT_SETTINGS),
}


def resolve_solver(name):
    key = (name or 'ADMM').upper()
    if key not in SOLVER_REGISTRY:
        raise ValueError(
            f'unsupported solver {name!r}; choose from {sorted(SOLVER_REGISTRY)}')
    return SOLVER_REGISTRY[key]
