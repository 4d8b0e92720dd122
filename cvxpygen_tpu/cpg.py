"""Public code-generation API (parity: reference cvxpygen/cpg.py:17-30).

``generate_code(problem, code_dir, solver, ...)`` compiles the problem
family offline and emits a self-contained Python package directory whose
``cpg_solver`` module mirrors the reference's generated wrapper
(templates/cpg_solver.py.jinja2): ``cpg_solve``, ``forward``, ``backward``,
``cpg_gradient``; with ``wrapper=True`` it is imported immediately and
``problem.register_solve('CPG', cpg_solve)`` is called (reference
compiler.py:33-40).

Instead of emitting C + CMake + pybind11, the artifact is the pickled
Family (the parametric canonicalization maps -- the reference's
cpg_workspace.c as arrays) and the jitted TPU solve path is built at import
time; XLA compilation replaces the C compiler (SURVEY.md section 7, L6).
"""
from __future__ import annotations

import os
import pickle
import shutil
import sys

from .canon.canonicalizer import canonicalize

_SOLVER_ALIASES = ('ADMM', 'OSQP', 'IPM', 'SCS', 'ECOS', 'CLARABEL', 'QOCO',
                   'QOCOGEN', 'EXPLICIT', 'BANDED', 'ADMM_BANDED')


def generate_code(problem, code_dir='cpg_code', solver=None, solver_opts=None,
                  enable_settings=None, prefix='', gradient=False,
                  wrapper=True, dtype=None):
    """Compile ``problem`` into a solver package at ``code_dir``.

    Arguments mirror the reference (README.md:85-93): ``solver`` accepts the
    reference's solver names as aliases; ``'explicit'`` selects the explicit
    (mpQP lookup) solver; ``gradient=True`` enables implicit
    differentiation; ``prefix`` namespaces the generated module.
    """
    fam = canonicalize(problem)
    if solver is None:
        # default-solver resolution from the CANONICALIZED family's cone
        # content (not a syntactic expression walk): QP-form -> ADMM;
        # SOC-only -> IPM; exp/PSD/pow -> conic ADMM.  Both conic engines
        # now cover the full cone list (the IPM via solvers/ipm_cones.py);
        # the first-order engine stays the default for exotic families
        # because it warm-starts and has the shared-KKT batch fast path --
        # pass solver='CLARABEL' for tight-tolerance IPM solves.
        if getattr(fam, 'n_exp', 0) or getattr(fam, 'psd_dims', ()) \
                or getattr(fam, 'pow_alphas', ()):
            solver = 'SCS'
        elif fam.soc_dims:
            solver = 'IPM'
        else:
            solver = 'ADMM'
    explicit_level = 0
    if isinstance(solver, str) and solver.lower() == 'explicit':
        # parity: 'explicit' -> (PDAQP, 1|2) (reference generator.py:161-173)
        explicit_level = 2 if (solver_opts or {}).get('dual') else 1
        solver = 'EXPLICIT'
    if solver.upper() not in _SOLVER_ALIASES:
        raise ValueError(f'unsupported solver {solver!r}')
    # gradient=True works for both QP-form (implicit KKT diff) and conic
    # families (projection-Jacobian diff, autodiff/conic_diff.py -- the
    # reference needs its two-stage OSQP-form construction for this,
    # canonicalizer.py:54-65)

    os.makedirs(code_dir, exist_ok=True)
    with open(os.path.join(code_dir, 'family.pkl'), 'wb') as f:
        pickle.dump(fam, f)

    opts = dict(solver_opts or {})
    if explicit_level:
        # offline region enumeration happens at generate time (the
        # reference's MPQP(...).solve(); pdaqp.py:201-219) and the resulting
        # lookup table is the persisted artifact
        from .codegen.runtime import ExplicitRuntime
        theta_ref = None
        try:
            theta_ref = fam.pack_theta(params=problem.parameters())
        except ValueError:
            pass
        rt = ExplicitRuntime(fam, explicit=explicit_level, prefix=prefix,
                             gradient=gradient, solver_opts=opts,
                             theta_ref=theta_ref)
        with open(os.path.join(code_dir, 'explicit.pkl'), 'wb') as f:
            pickle.dump(rt.data, f)
        print(f'CVXPYgen-TPU explicit: {rt.data.n_regions} regions '
              f'(max_regions={opts.get("max_regions", 500)}, sampled '
              f'domain coverage {100 * rt.data.coverage:.1f}%)')
        opts.pop('stored_vars', None)  # consumed; not picklable

    cfg = dict(solver=solver.upper(), prefix=prefix, gradient=gradient,
               enable_settings=list(enable_settings or []),
               solver_opts={k: v for k, v in opts.items()
                            if isinstance(v, (int, float, str, bool))},
               explicit=explicit_level)
    _write_solver_module(code_dir, cfg)
    with open(os.path.join(code_dir, '__init__.py'), 'w') as f:
        f.write('')
    # LICENSE in the artifact (parity: reference writer emits one,
    # writer.py:77)
    lic_src = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'LICENSE')
    if os.path.exists(lic_src):
        shutil.copy(lic_src, os.path.join(code_dir, 'LICENSE'))
    # standalone C project (parity: reference cpg_example.c +
    # CMakeLists, buildable without Python): ADMM core for QP/SOC/exp/pow
    # families, lookup-table evaluator for explicit ones; only PSD
    # families have no embedded artifact (the projection needs an
    # eigendecomposition; the reference draws the same line by leaving
    # PSD to vendored Clarabel/LAPACK, scs.py:130-135)
    c_dir = None
    try:
        theta0 = fam.pack_theta(params=problem.parameters())
    except ValueError:
        theta0 = None
    if explicit_level:
        from .codegen.emit_c import write_c_artifact_explicit
        c_dir = write_c_artifact_explicit(code_dir, fam, rt.data,
                                          theta_default=theta0)
    else:
        from .codegen.emit_c import write_c_artifact
        c_dir = write_c_artifact(code_dir, fam, theta_default=theta0)
    _write_readme(code_dir, problem, fam, cfg, c_dir=c_dir)

    print(f'CVXPYgen-TPU: generated solver package at {code_dir} '
          f'(solver={cfg["solver"]}, n={fam.n}, m={fam.m}, p={fam.p})')

    if wrapper:
        mod = _import_generated(code_dir)
        problem.register_solve('CPG', mod.cpg_solve)
        return mod
    return None


def _import_generated(code_dir):
    """Load the generated cpg_solver module directly from its file, under a
    path-unique module name (several generated packages may share a basename,
    e.g. in test suites)."""
    import hashlib
    import importlib.util
    path = os.path.join(os.path.abspath(code_dir), 'cpg_solver.py')
    tag = hashlib.sha1(path.encode()).hexdigest()[:10]
    name = f'cpg_generated_{os.path.basename(os.path.normpath(code_dir))}_{tag}'
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


_SOLVER_TEMPLATE = '''"""Auto-generated by cvxpygen_tpu (parity artifact of the reference's
generated cpg_solver.py, templates/cpg_solver.py.jinja2).  Do not edit."""
import json
import os
import pickle

from cvxpygen_tpu.codegen.runtime import CpgRuntime

_HERE = os.path.dirname(os.path.abspath(__file__))
with open(os.path.join(_HERE, 'family.pkl'), 'rb') as _f:
    family = pickle.load(_f)
_CFG = json.loads(%(cfg)r)

if _CFG.get('explicit'):
    from cvxpygen_tpu.codegen.runtime import ExplicitRuntime
    with open(os.path.join(_HERE, 'explicit.pkl'), 'rb') as _f:
        _data = pickle.load(_f)
    _runtime = ExplicitRuntime.from_saved(
        family, _data, explicit=_CFG['explicit'], prefix=_CFG['prefix'],
        gradient=_CFG['gradient'])
else:
    _runtime = CpgRuntime(family, solver_name=_CFG['solver'],
                          prefix=_CFG['prefix'], gradient=_CFG['gradient'],
                          enable_settings=_CFG['enable_settings'],
                          solver_opts=_CFG.get('solver_opts'))


def cpg_solve(prob, updated_params=None, **kwargs):
    return _runtime.cpg_solve(prob, updated_params=updated_params, **kwargs)


def cpg_gradient(prob):
    return _runtime.cpg_gradient(prob)


def forward(prob, updated_params=None, **kwargs):
    return _runtime.forward(prob, updated_params=updated_params, **kwargs)


def backward(prob, **kwargs):
    return _runtime.backward(prob, **kwargs)
'''


def _write_solver_module(code_dir, cfg):
    import json
    with open(os.path.join(code_dir, 'cpg_solver.py'), 'w') as f:
        f.write(_SOLVER_TEMPLATE % dict(cfg=json.dumps(cfg)))


def _write_readme(code_dir, problem, fam, cfg, c_dir=None):
    """Observability artifact (parity: templates/README.html.jinja2 --
    problem summary tables, FILE TREE and API table; reference
    utils.py:1455-1532)."""
    params_rows = ''.join(
        f'<tr><td>{pi.name}</td><td>{pi.shape}</td><td>{pi.flat_size}</td></tr>'
        for pi in fam.param_info)
    vars_rows = ''.join(
        f'<tr><td>{vi.name}</td><td>{vi.shape}</td><td>{vi.size}</td></tr>'
        for vi in fam.user_vars)

    # file tree of the generated artifact (reference README lists files)
    tree_lines = []
    base = os.path.abspath(code_dir)
    for root, dirs, files in os.walk(base):
        dirs.sort()
        rel = os.path.relpath(root, base)
        depth = 0 if rel == '.' else rel.count(os.sep) + 1
        if rel != '.':
            tree_lines.append('  ' * (depth - 1) + os.path.basename(root) + '/')
        for fn in sorted(files):
            tree_lines.append('  ' * depth + fn)
    tree_lines.append('README.html')
    tree = '\n'.join(tree_lines)

    api_rows = [
        ('cpg_solve(prob, updated_params=None, **settings)',
         "solve via problem.solve(method='CPG'); caches theta, "
         'warm-starts, honors per-solver settings'),
        ('cpg_gradient(prob)',
         'implicit differentiation: var.gradient seeds -> param.gradient'),
        ('forward(prob, ...) / backward(prob)',
         'CVXPYlayers-style differentiable interface'),
        ('_runtime.solver.solve_batch(theta)',
         'batched jitted solve over theta (B, p); shared-KKT fast path '
         'auto-detected when the batch varies only vector params'),
    ]
    if c_dir:
        api_rows.append(('c/ (make && ./cpg_example)',
                         'standalone C project: embedded solver core + '
                         'family data, no Python required'))
    api_table = ''.join(f'<tr><td><code>{a}</code></td><td>{b}</td></tr>'
                        for a, b in api_rows)

    html = f"""<html><head><title>CVXPYgen-TPU generated solver</title></head>
<body>
<h1>CVXPYgen-TPU solver package</h1>
<p>Solver: {cfg['solver']} | gradient: {cfg['gradient']} |
prefix: '{cfg['prefix']}'</p>
<h2>Problem family</h2>
<p>n = {fam.n} variables ({len(fam.user_vars)} user),
m = {fam.m} constraint rows
(zero: {fam.n_zero}, nonneg: {fam.n_nonneg}, SOC: {list(fam.soc_dims)}),
p = {fam.p} parameter entries.</p>
<h2>Parameters</h2>
<table border=1><tr><th>name</th><th>shape</th><th>theta entries</th></tr>
{params_rows}</table>
<h2>Variables</h2>
<table border=1><tr><th>name</th><th>shape</th><th>size</th></tr>
{vars_rows}</table>
<h2>Generated files</h2>
<pre>
{tree}
</pre>
<h2>API</h2>
<table border=1><tr><th>entry point</th><th>role</th></tr>
{api_table}</table>
<h2>Usage</h2>
<pre>
from {os.path.basename(os.path.normpath(code_dir))}.cpg_solver import cpg_solve
problem.register_solve('CPG', cpg_solve)
problem.solve(method='CPG', updated_params=[...], max_iter=4000)
</pre>
</body></html>
"""
    with open(os.path.join(code_dir, 'README.html'), 'w') as f:
        f.write(html)
