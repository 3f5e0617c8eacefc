"""Reference oracles for solver tests.

The reference test-suite checks against cvxpy+MOSEK (test_solver.py:408-466);
neither is available here, so the oracle is an over-iterated FISTA
(proximal gradient) solver in float64 numpy, plus exact objective
evaluators.  Solutions are validated with the reference's principled
fallback: ours must match the oracle's coefficients, or achieve objective
<= oracle * (1 + tol) ("objective dominance").
"""

import numpy as np


def group_prox(v, thresh, group_starts, group_sizes):
    """prox of thresh_g * ||.||_2 per group."""
    out = np.zeros_like(v)
    for g, (s, q) in enumerate(zip(group_starts, group_sizes)):
        seg = v[s:s + q]
        nrm = np.linalg.norm(seg)
        t = thresh[g]
        if nrm > t:
            out[s:s + q] = (1 - t / nrm) * seg
    return out


def objective_gaussian(X, y, w, beta, b0, lmda, alpha, penalty, groups, group_sizes):
    eta = X @ beta + b0
    loss = np.sum(w * (-y * eta + 0.5 * eta**2))
    reg = 0.0
    for g, (s, q) in enumerate(zip(groups, group_sizes)):
        nrm = np.linalg.norm(beta[s:s + q])
        reg += penalty[g] * (alpha * nrm + 0.5 * (1 - alpha) * nrm**2)
    return loss + lmda * reg


def objective_logistic(X, y, w, beta, b0, lmda, alpha, penalty, groups, group_sizes):
    eta = X @ beta + b0
    loss = np.sum(w * (np.logaddexp(0.0, eta) - y * eta))
    reg = 0.0
    for g, (s, q) in enumerate(zip(groups, group_sizes)):
        nrm = np.linalg.norm(beta[s:s + q])
        reg += penalty[g] * (alpha * nrm + 0.5 * (1 - alpha) * nrm**2)
    return loss + lmda * reg


def fista_group_elnet(
    X, y, w, lmda, alpha, penalty, groups, group_sizes,
    *, loss="gaussian", intercept=True, max_iters=200000, tol=1e-12,
):
    """FISTA for group elastic net; f64; heavily over-iterated.

    loss "gaussian": sum w_i (-y eta + eta^2/2); "logistic": weighted NLL.
    Returns (beta, b0).
    """
    n, p = X.shape
    beta = np.zeros(p)
    b0 = 0.0
    z = beta.copy()
    zb0 = b0
    t = 1.0

    Xw = X * w[:, None]
    if loss == "gaussian":
        L = np.linalg.eigvalsh(X.T @ Xw)[-1] + w.sum()
    else:
        L = 0.25 * (np.linalg.eigvalsh(X.T @ Xw)[-1] + w.sum())
    L = max(L, 1e-10)
    step = 1.0 / L

    l2_diag = lmda * (1 - alpha) * np.repeat(penalty, group_sizes)
    thresh = step * lmda * alpha * penalty

    def grad_fn(beta, b0):
        eta = X @ beta + b0
        if loss == "gaussian":
            r = w * (eta - y)
        else:
            r = w * (1.0 / (1.0 + np.exp(-eta)) - y)
        g = X.T @ r + l2_diag * beta
        g0 = r.sum() if intercept else 0.0
        return g, g0

    obj_fn = objective_gaussian if loss == "gaussian" else objective_logistic

    last_obj = np.inf
    for it in range(max_iters):
        g, g0 = grad_fn(z, zb0)
        beta_new = group_prox(z - step * g, thresh, groups, group_sizes)
        b0_new = zb0 - step * g0 if intercept else 0.0
        t_new = 0.5 * (1 + np.sqrt(1 + 4 * t * t))
        z = beta_new + ((t - 1) / t_new) * (beta_new - beta)
        zb0 = b0_new + ((t - 1) / t_new) * (b0_new - b0)
        dx = np.linalg.norm(beta_new - beta) + abs(b0_new - b0)
        beta, b0, t = beta_new, b0_new, t_new
        if it % 100 == 99:
            cur = obj_fn(X, y, w, beta, b0, lmda, alpha, penalty, groups, group_sizes)
            if abs(last_obj - cur) < tol * max(1.0, abs(cur)) and dx < 1e-10:
                break
            last_obj = cur
    return beta, b0
