"""Reference benchmark problem families, rebuilt in the cvxpygen_tpu
modeling layer (mirrors /root/reference/tests/test_E2E_QP.py:16-110,
test_E2E_LP.py:14-62, test_E2E_SOCP.py:14-35, examples/main.py:15-29)."""
import numpy as np

import cvxpygen_tpu as ct


def nonneg_LS_problem(m=3, n=2, sparse=True):
    """examples/main.py:15-29"""
    x = ct.Variable(n, name='x')
    if sparse:
        A = ct.Parameter((m, n), name='A', sparsity=((0, 0, 1), (0, 1, 1)))
    else:
        A = ct.Parameter((m, n), name='A')
    b = ct.Parameter(m, name='b')
    problem = ct.Problem(ct.Minimize(ct.sum_squares(A @ x - b)), [x >= 0])
    return problem


def assign_nonneg_LS(prob, seed=1):
    np.random.seed(seed)
    A = prob.param_dict['A']
    if A.attributes['sparsity'] is not None:
        val = np.zeros((3, 2))
        val[(0, 0, 1), (0, 1, 1)] = np.random.randn(3)
        A.value = val
    else:
        A.value = np.random.randn(*A.shape)
    prob.param_dict['b'].value = np.random.randn(A.shape[0])
    return prob


def actuator_problem():
    """tests/test_E2E_QP.py:16-40 (degenerate dims n=1)."""
    n, m = 1, 3
    u = ct.Variable(n, name='u')
    delta_u = ct.Variable((n, n), name='delta_u')
    A = ct.Parameter((m, n), name='A')
    w = ct.Parameter(m, name='w')
    lamb_sm = ct.Parameter(nonneg=True, name='lamb_sm')
    kappa = ct.Parameter(n, nonneg=True, name='kappa')
    u_prev = ct.Parameter(n, name='u_prev')
    u_min = ct.Parameter(n, name='u_min')
    u_max = ct.Parameter(n, name='u_max')
    objective = ct.Minimize(ct.sum_squares(A @ u - w)
                            + lamb_sm * ct.sum_squares(delta_u)
                            + kappa @ ct.abs(u))
    constraints = [u_min <= u, u <= u_max, delta_u == u - u_prev]
    return ct.Problem(objective, constraints)


def assign_actuator(prob, seed=0):
    np.random.seed(seed)
    prob.param_dict['A'].value = np.array([[1], [1], [1]])
    prob.param_dict['w'].value = np.array([2, 3, 5])
    prob.param_dict['lamb_sm'].value = np.random.rand()
    prob.param_dict['kappa'].value = 0.1 * np.ones(1)
    prob.param_dict['u_prev'].value = 0 * np.ones(1)
    prob.param_dict['u_min'].value = -1 * np.ones(1)
    prob.param_dict['u_max'].value = 1 * np.ones(1)
    return prob


def MPC_problem(H=10, n=6, m=3):
    """tests/test_E2E_QP.py:43-73"""
    U = ct.Variable((m, H), name='U')
    X = ct.Variable((n, H + 1), name='X')
    Psqrt = ct.Parameter((n, n), name='Psqrt', diag=True)
    Qsqrt = ct.Parameter((n, n), name='Qsqrt', diag=True)
    Rsqrt = ct.Parameter((m, m), name='Rsqrt', diag=True)
    nonzeros_A = [(i, i) for i in range(n)] + [(i, 3 + i) for i in range(n // 2)]
    A = ct.Parameter((n, n), name='A', sparsity=tuple(zip(*nonzeros_A)))
    nonzeros_B = [(3 + i, i) for i in range(n // 2)]
    B = ct.Parameter((n, m), name='B', sparsity=tuple(zip(*nonzeros_B)))
    x_init = ct.Parameter(n, name='x_init')
    objective = ct.Minimize(
        ct.sum_squares(Psqrt @ X[:, H - 1]) + ct.sum_squares(Qsqrt @ X[:, :H])
        + ct.sum_squares(Rsqrt @ U) + 1)
    constraints = [X[:, 1:] == A @ X[:, :H] + B @ U,
                   ct.abs(U) <= 1,
                   X[:, 0] == x_init]
    return ct.Problem(objective, constraints)


def assign_MPC(prob, seed=0):
    np.random.seed(seed)
    n = 6
    A_cont = np.concatenate((np.array([[0, 0, 0, 1, 0, 0],
                                       [0, 0, 0, 0, 1, 0],
                                       [0, 0, 0, 0, 0, 1.]]),
                             np.zeros((3, 6))), axis=0)
    B_cont = np.concatenate((np.zeros((3, 3)), np.diag(np.ones(3))), axis=0)
    td = 0.1
    prob.param_dict['A'].value = np.eye(n) + td * A_cont
    prob.param_dict['B'].value = td * B_cont
    prob.param_dict['Psqrt'].value = np.eye(6)
    prob.param_dict['Qsqrt'].value = np.eye(6)
    prob.param_dict['Rsqrt'].value = np.sqrt(0.1) * np.eye(3)
    prob.param_dict['x_init'].value = -2 * np.ones(6) + 4 * np.random.rand(6)
    return prob


def portfolio_problem(n=50, m=10):
    """tests/test_E2E_QP.py:76-110"""
    w = ct.Variable(n, name='w')
    delta_w = ct.Variable(n, name='delta_w')
    f = ct.Variable(m, name='f')
    a = ct.Parameter(n, name='a')
    F = ct.Parameter((n, m), name='F')
    Sig_f_sqrt = ct.Parameter((m, m), name='Sig_f_sqrt')
    d_sqrt = ct.Parameter(n, name='d_sqrt')
    k_tc = ct.Parameter(n, nonneg=True, name='k_tc')
    k_sh = ct.Parameter(n, nonneg=True, name='k_sh')
    w_prev = ct.Parameter(n, name='w_prev')
    L = ct.Parameter(nonneg=True, name='L')
    objective = ct.Maximize(a @ w
                            - ct.sum_squares(Sig_f_sqrt @ f)
                            - ct.sum_squares(ct.multiply(d_sqrt, w))
                            - k_tc @ ct.abs(delta_w)
                            + k_sh @ ct.minimum(0, w))
    constraints = [f == F.T @ w,
                   np.ones(n) @ w == 1,
                   ct.norm(w, 1) <= L,
                   delta_w == w - w_prev]
    return ct.Problem(objective, constraints)


def assign_portfolio(prob, seed=0, n=50, m=10):
    np.random.seed(seed)
    gamma = 1
    prob.param_dict['a'].value = np.random.randn(n) / gamma
    prob.param_dict['F'].value = np.round(np.random.randn(n, m))
    prob.param_dict['Sig_f_sqrt'].value = np.diag(np.random.rand(m))
    prob.param_dict['d_sqrt'].value = np.random.rand(n)
    prob.param_dict['k_tc'].value = 0.01 * np.ones(n) / gamma
    prob.param_dict['k_sh'].value = 0.05 * np.ones(n) / gamma
    prob.param_dict['w_prev'].value = np.zeros(n)
    prob.param_dict['L'].value = 1.6
    return prob


def network_problem(n=50, m=10):
    """tests/test_E2E_LP.py:14-36"""
    f = ct.Variable(n, name='f')
    R = ct.Parameter((m, n), name='R')
    c = ct.Parameter(m, nonneg=True, name='c')
    w = ct.Parameter(n, nonneg=True, name='w')
    f_min = ct.Parameter(n, nonneg=True, name='f_min')
    f_max = ct.Parameter(n, nonneg=True, name='f_max')
    objective = ct.Maximize(w @ f)
    constraints = [R @ f <= c, f_min <= f, f <= f_max]
    return ct.Problem(objective, constraints)


def assign_network(prob, seed=0, n=50, m=10):
    np.random.seed(seed)
    prob.param_dict['R'].value = np.round(np.random.rand(m, n))
    prob.param_dict['c'].value = n * (0.1 + 0.1 * np.random.rand(m))
    prob.param_dict['w'].value = np.random.rand(n)
    prob.param_dict['f_min'].value = np.zeros(n)
    prob.param_dict['f_max'].value = np.ones(n)
    return prob


def resource_problem(n=30, m=10):
    """tests/test_E2E_LP.py:39-62"""
    X = ct.Variable((n, m), name='X')
    W = ct.Parameter((n, m), name='W')
    S = ct.Parameter((n, n), diag=True, name='S')
    X_min = ct.Parameter((n, m), name='X_min')
    X_max = ct.Parameter((n, m), name='X_max')
    r = ct.Parameter(m, name='r')
    objective = ct.Maximize(ct.trace(ct.minimum(X @ W.T, S)) + 26)
    constraints = [X_min <= X, X <= X_max, X.T @ np.ones(n) <= r]
    return ct.Problem(objective, constraints)


def assign_resource(prob, seed=0, n=30, m=10):
    np.random.seed(seed)
    prob.param_dict['S'].value = 100 * np.eye(n)
    prob.param_dict['W'].value = np.ones((n, m)) + 0.1 * np.random.rand(n, m)
    prob.param_dict['X_min'].value = np.random.rand(n, m)
    prob.param_dict['X_max'].value = 10 + np.random.rand(n, m)
    prob.param_dict['r'].value = (prob.param_dict['X_min'].value.T @ np.ones(n)
                                  + 10 * np.random.rand(m))
    return prob


def ADP_problem(use_soc_class=False, n=6, m=3):
    """tests/test_E2E_SOCP.py:14-35"""
    u = ct.Variable((2, m), name='u')
    Rsqrt = ct.Parameter((m, m), name='Rsqrt', diag=True)
    f = ct.Parameter(n, name='f')
    G = ct.Parameter((n, m), name='G')
    objective = ct.Minimize(ct.sum_squares(f + G @ u[0])
                            + ct.sum_squares(Rsqrt @ u[0]))
    if use_soc_class:
        constraints = [ct.SOC(ct.Constant(0.1 * np.ones(2)), u, axis=1)]
    else:
        constraints = [ct.norm(u, 2, axis=1) <= 0.1]
    return ct.Problem(objective, constraints)


def assign_ADP(prob, seed=0):
    np.random.seed(seed)
    state = -2 * np.ones(6) + 4 * np.random.rand(6)
    A_cont = np.array([[0, 0, 0, 1, 0, 0],
                       [0, 0, 0, 0, 1, 0],
                       [0, 0, 0, 0, 0, 1],
                       [0, 0, 0, -state[3], 0, 0],
                       [0, 0, 0, 0, -state[4], 0],
                       [0, 0, 0, 0, 0, -state[5]]])
    B_cont = np.concatenate((np.zeros((3, 3)), np.diag(state[3:])), axis=0)
    td = 0.1
    A, B = np.eye(6) + td * A_cont, td * B_cont
    Psqrt = np.eye(6)
    prob.param_dict['Rsqrt'].value = np.sqrt(0.1) * np.eye(3)
    prob.param_dict['f'].value = Psqrt @ (A @ state)
    prob.param_dict['G'].value = Psqrt @ B
    return prob


ALL = {
    'nonneg_LS': (nonneg_LS_problem, assign_nonneg_LS),
    'actuator': (actuator_problem, assign_actuator),
    'MPC': (MPC_problem, assign_MPC),
    'portfolio': (portfolio_problem, assign_portfolio),
    'network': (network_problem, assign_network),
    'resource': (resource_problem, assign_resource),
    'ADP': (ADP_problem, assign_ADP),
}
