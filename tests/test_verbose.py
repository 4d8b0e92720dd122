"""enable_settings=['verbose'] parity (reference tests/test_E2E_QP.py:
226-248 test_OSQP_verbose -- 'optimal objective' appears iff verbose)."""
import io
import sys

import numpy as np

from cvxpygen_tpu import cpg
from problems import ALL


def test_verbose_setting(tmp_path):
    make, assign = ALL['actuator']
    prob = make()
    assign(prob, seed=0)
    cpg.generate_code(prob, code_dir=str(tmp_path / 'v'), solver='OSQP',
                      prefix='act_verbose', enable_settings=['verbose'])

    cap = io.StringIO()
    sys.stdout = cap
    try:
        prob.solve(method='CPG', verbose=False)
        assert 'optimal objective' not in cap.getvalue()
        prob.solve(method='CPG', verbose=True)
        assert 'optimal objective' in cap.getvalue()
    finally:
        sys.stdout = sys.__stdout__

    # without enable_settings, verbose=True stays silent (gating parity)
    make2, assign2 = ALL['actuator']
    prob2 = make2()
    assign2(prob2, seed=0)
    cpg.generate_code(prob2, code_dir=str(tmp_path / 'nv'), solver='OSQP',
                      prefix='act_noverb')
    cap2 = io.StringIO()
    sys.stdout = cap2
    try:
        prob2.solve(method='CPG', verbose=True)
        assert 'optimal objective' not in cap2.getvalue()
    finally:
        sys.stdout = sys.__stdout__
