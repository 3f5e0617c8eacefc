"""Tests for the standalone solvers: bvls, pinball, css_cov, gaussian_cov,
and the small-QP optimization layer.

Mirrors the reference test strategy (tests/test_solver.py:1053-1252,
tests/test_optimization.py): scipy / brute-force / proximal-gradient oracles
with the objective-dominance fallback.
"""

import numpy as np
import pytest
import scipy.optimize

import adelie_tpu as ad
from adelie_tpu import optimization as opt


# --------------------------------------------------------------------------- #
# bvls                                                                          #
# --------------------------------------------------------------------------- #


@pytest.mark.parametrize("n,p,seed", [(50, 10, 0), (80, 30, 1), (20, 40, 2)])
def test_bvls_vs_scipy(n, p, seed):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, p))
    beta = rng.standard_normal(p)
    y = X @ beta + 0.1 * rng.standard_normal(n)
    lower = -rng.uniform(0.1, 1.0, p)
    upper = rng.uniform(0.1, 1.0, p)

    state = ad.solver.bvls(X, y, lower, upper, tol=1e-12)

    # scipy solves 1/2||Xb - y||^2 (unweighted); ours is weighted by 1/n,
    # identical argmin
    res = scipy.optimize.lsq_linear(X, y, bounds=(lower, upper), tol=1e-12)
    ours_obj = 0.5 * np.sum((y - X @ state.beta) ** 2)
    scipy_obj = 0.5 * np.sum((y - X @ res.x) ** 2)
    assert np.allclose(state.beta, res.x, atol=1e-5) or ours_obj <= scipy_obj * (
        1 + 1e-7
    )
    assert np.all(state.beta >= lower - 1e-12)
    assert np.all(state.beta <= upper + 1e-12)


def test_bvls_weighted():
    rng = np.random.default_rng(3)
    n, p = 60, 15
    X = rng.standard_normal((n, p))
    y = rng.standard_normal(n)
    w = rng.uniform(0.5, 2.0, n)
    lower = np.full(p, -0.3)
    upper = np.full(p, 0.4)
    state = ad.solver.bvls(X, y, lower, upper, weights=w, tol=1e-12)
    sw = np.sqrt(w)
    res = scipy.optimize.lsq_linear(
        X * sw[:, None], y * sw, bounds=(lower, upper), tol=1e-12
    )
    ours = 0.5 * np.sum(w * (y - X @ state.beta) ** 2)
    oracle = 0.5 * np.sum(w * (y - X @ res.x) ** 2)
    assert ours <= oracle * (1 + 1e-7)


# --------------------------------------------------------------------------- #
# pinball                                                                       #
# --------------------------------------------------------------------------- #


def _pinball_objective(A, S, v, pn, pp, beta):
    q = A @ S @ A.T
    return (
        0.5 * beta @ q @ beta
        - (A @ v) @ beta
        + pn @ np.maximum(-beta, 0)
        + pp @ np.maximum(beta, 0)
    )


def _pinball_fista(A, S, v, pn, pp, max_iters=100000, tol=1e-14):
    m = A.shape[0]
    Q = A @ S @ A.T
    lin = A @ v
    L = max(np.linalg.eigvalsh(Q)[-1], 1e-10)
    t = 1.0 / L
    x = np.zeros(m)
    z = x.copy()
    s = 1.0
    for it in range(max_iters):
        g = Q @ z - lin
        u = z - t * g
        x_new = np.where(u > t * pp, u - t * pp, np.where(u < -t * pn, u + t * pn, 0.0))
        s_new = 0.5 * (1 + np.sqrt(1 + 4 * s * s))
        z = x_new + ((s - 1) / s_new) * (x_new - x)
        if np.linalg.norm(x_new - x) < tol:
            x = x_new
            break
        x, s = x_new, s_new
    return x


@pytest.mark.parametrize("m,d,seed", [(10, 5, 0), (30, 8, 1), (6, 12, 2)])
def test_pinball_vs_fista(m, d, seed):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((m, d))
    B = rng.standard_normal((d, 2 * d))
    S = B @ B.T / (2 * d)
    v = rng.standard_normal(d)
    pn = rng.uniform(0.1, 1.0, m)
    pp = rng.uniform(0.1, 1.0, m)

    state = ad.solver.pinball(A, S, v, pn, pp, tol=1e-12)
    oracle = _pinball_fista(A, S, v, pn, pp)

    ours_obj = _pinball_objective(A, S, v, pn, pp, state.beta)
    oracle_obj = _pinball_objective(A, S, v, pn, pp, oracle)
    assert np.allclose(state.beta, oracle, atol=1e-5) or (
        ours_obj <= oracle_obj + 1e-7 * max(1.0, abs(oracle_obj))
    )


# --------------------------------------------------------------------------- #
# css_cov                                                                       #
# --------------------------------------------------------------------------- #


def _css_ls_loss(S, T):
    T = np.asarray(T, int)
    if len(T) == 0:
        return np.trace(S)
    StT = S[:, T]
    return np.trace(S - StT @ np.linalg.pinv(S[np.ix_(T, T)]) @ StT.T)


def _css_sf_loss(S, T):
    T = np.asarray(T, int)
    p = S.shape[0]
    rest = np.setdiff1d(np.arange(p), T)
    sign, logdet = np.linalg.slogdet(S[np.ix_(T, T)])
    R = S[np.ix_(rest, rest)] - S[np.ix_(rest, T)] @ np.linalg.pinv(
        S[np.ix_(T, T)]
    ) @ S[np.ix_(T, rest)]
    return logdet + np.sum(np.log(np.maximum(np.diag(R), 1e-300)))


def _make_psd(p, seed):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((3 * p, p))
    return X.T @ X / (3 * p)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_css_greedy_least_squares_invariant(seed):
    p, k = 8, 3
    S = _make_psd(p, seed)
    state = ad.solver.css_cov(S, k, method="greedy", loss="least_squares")
    assert len(state.subset) == k
    # greedy invariant: each added column is the brute-force best extension
    prefix = []
    for t in range(k):
        losses = np.array([
            _css_ls_loss(S, prefix + [j]) if j not in prefix else np.inf
            for j in range(p)
        ])
        best = losses.min()
        chosen = _css_ls_loss(S, prefix + [int(state.subset[t])])
        assert chosen <= best + 1e-9
        prefix.append(int(state.subset[t]))


@pytest.mark.parametrize("loss,loss_fn", [
    ("least_squares", _css_ls_loss),
    ("subset_factor", _css_sf_loss),
])
@pytest.mark.parametrize("seed", [0, 1])
def test_css_swapping_local_opt(loss, loss_fn, seed):
    p, k = 7, 3
    S = _make_psd(p, seed)
    state = ad.solver.css_cov(S, k, method="swapping", loss=loss)
    T = list(state.subset)
    base = loss_fn(S, T)
    # local optimality: no single swap strictly improves
    for pos in range(k):
        for j in range(p):
            if j in T:
                continue
            T2 = T.copy()
            T2[pos] = j
            assert loss_fn(S, T2) >= base - 1e-8, (T, T2)


def test_css_min_det_greedy():
    p, k = 6, 3
    S = _make_psd(p, 5)
    state = ad.solver.css_cov(S, k, method="greedy", loss="min_det")
    # min_det greedy picks the max-variance residual column each round
    assert len(set(state.subset)) == k


# --------------------------------------------------------------------------- #
# gaussian_cov                                                                  #
# --------------------------------------------------------------------------- #


def test_gaussian_cov_matches_naive_lasso():
    rng = np.random.default_rng(0)
    n, p = 200, 30
    X = rng.standard_normal((n, p))
    beta = np.zeros(p)
    beta[:4] = rng.standard_normal(4)
    y = X @ beta + 0.1 * rng.standard_normal(n)
    yc = y - y.mean()
    Xc = X - X.mean(axis=0)

    A = Xc.T @ Xc / n
    v = Xc.T @ yc / n

    state = ad.solver.gaussian_cov(A, v, tol=1e-10, progress_bar=False)
    assert state.error == "", state.error
    assert len(state.lmdas) > 3

    # compare against the naive solver on the same path (centered problem)
    st_naive = ad.grpnet(
        Xc, ad.glm.gaussian(yc), intercept=False,
        lmda_path=state.lmdas, tol=1e-10, progress_bar=False, early_exit=False,
    )
    assert st_naive.error == "", st_naive.error
    B_cov = np.asarray(state.betas.todense())
    B_nai = np.asarray(st_naive.betas.todense())
    L = min(B_cov.shape[0], B_nai.shape[0])
    assert np.allclose(B_cov[:L], B_nai[:L], atol=1e-5), (
        np.abs(B_cov[:L] - B_nai[:L]).max()
    )


def test_gaussian_cov_groups_lazy():
    rng = np.random.default_rng(1)
    n, p = 150, 24
    X = rng.standard_normal((n, p)).astype(np.float64)
    y = X[:, 0] - 0.5 * X[:, 5] + 0.1 * rng.standard_normal(n)
    Xc = X - X.mean(axis=0)
    yc = y - y.mean()
    v = Xc.T @ yc / n

    A_lazy = ad.matrix.lazy_cov(Xc / np.sqrt(n))
    groups = np.arange(0, p, 3)
    state = ad.solver.gaussian_cov(
        A_lazy, v, groups=groups, tol=1e-10, progress_bar=False
    )
    assert state.error == "", state.error

    A_dense = Xc.T @ Xc / n
    state_d = ad.solver.gaussian_cov(
        A_dense, v, groups=groups, lmda_path=state.lmdas, tol=1e-10,
        progress_bar=False, early_exit=False,
    )
    B1 = np.asarray(state.betas.todense())
    B2 = np.asarray(state_d.betas.todense())
    L = min(B1.shape[0], B2.shape[0])
    assert np.allclose(B1[:L], B2[:L], atol=1e-6)


# --------------------------------------------------------------------------- #
# optimization primitives                                                       #
# --------------------------------------------------------------------------- #


def _fista_generic(Q, lin, prox, max_iters=200000, tol=1e-15):
    d = lin.size
    L = max(np.linalg.eigvalsh(Q)[-1], 1e-10)
    t = 1.0 / L
    x = np.zeros(d)
    z = x.copy()
    s = 1.0
    for _ in range(max_iters):
        g = Q @ z - lin
        x_new = prox(z - t * g, t)
        s_new = 0.5 * (1 + np.sqrt(1 + 4 * s * s))
        z = x_new + ((s - 1) / s_new) * (x_new - x)
        if np.linalg.norm(x_new - x) < tol:
            x = x_new
            break
        x, s = x_new, s_new
    return x


@pytest.mark.parametrize("seed", [0, 1])
def test_pinball_full(seed):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    d = 6
    B = rng.standard_normal((d, 2 * d))
    Q = B @ B.T / d
    v = rng.standard_normal(d)
    pn = rng.uniform(0.05, 0.5, d)
    pp = rng.uniform(0.05, 0.5, d)

    x0 = jnp.zeros(d)
    g0 = jnp.asarray(v)
    x, g, iters = opt.pinball_full(Q, pn, pp, 1.0, x0, g0, tol=1e-16)
    x = np.asarray(x)

    oracle = _fista_generic(
        Q, v,
        lambda u, t: np.where(u > t * pp, u - t * pp,
                              np.where(u < -t * pn, u + t * pn, 0.0)),
    )
    obj = lambda b: 0.5 * b @ Q @ b - v @ b + pn @ np.maximum(-b, 0) + pp @ np.maximum(b, 0)
    assert np.allclose(x, oracle, atol=1e-6) or (
        obj(x) <= obj(oracle) + 1e-8 * max(1.0, abs(obj(oracle)))
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_nnqp_full(seed):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    d = 5
    B = rng.standard_normal((d, 2 * d))
    Q = B @ B.T / d
    v = rng.standard_normal(d)
    x0 = jnp.zeros(d)
    g0 = jnp.asarray(v)
    x, g, iters = opt.nnqp_full(Q, x0, g0, tol=1e-16)
    x = np.asarray(x)
    res = scipy.optimize.nnls((np.linalg.cholesky(Q).T), np.linalg.solve(np.linalg.cholesky(Q), v))
    # nnls solves min ||Rx - R^-T v|| with R'R = Q <=> min 1/2 x'Qx - v'x, x>=0
    oracle = res[0]
    obj = lambda b: 0.5 * b @ Q @ b - v @ b
    assert obj(x) <= obj(oracle) + 1e-8 * max(1.0, abs(obj(oracle)))
    assert np.all(x >= 0)


@pytest.mark.parametrize("seed", [0, 1])
def test_lasso_full(seed):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    d = 6
    B = rng.standard_normal((d, 2 * d))
    Q = B @ B.T / d
    v = rng.standard_normal(d)
    pen = rng.uniform(0.05, 0.4, d)
    x, g, iters = opt.lasso_full(Q, pen, jnp.zeros(d), jnp.asarray(v), tol=1e-16)
    x = np.asarray(x)
    oracle = _fista_generic(
        Q, v, lambda u, t: np.sign(u) * np.maximum(np.abs(u) - t * pen, 0.0)
    )
    obj = lambda b: 0.5 * b @ Q @ b - v @ b + pen @ np.abs(b)
    assert np.allclose(x, oracle, atol=1e-6) or (
        obj(x) <= obj(oracle) + 1e-8 * max(1.0, abs(obj(oracle)))
    )


def test_symmetric_penalty_vs_grid():
    rng = np.random.default_rng(0)
    for trial in range(5):
        K = int(rng.integers(1, 8))
        knots = np.sort(rng.standard_normal(K))
        alpha = float(rng.uniform(0, 1))
        t_star = opt.symmetric_penalty(knots, alpha)

        def f(t):
            return np.mean(
                0.5 * (1 - alpha) * (t - knots) ** 2 + alpha * np.abs(t - knots)
            )

        grid = np.linspace(knots[0] - 1, knots[-1] + 1, 20001)
        f_grid = np.array([f(t) for t in grid]).min()
        assert f(t_star) <= f_grid + 1e-6


def test_search_pivot_matches_bruteforce():
    rng = np.random.default_rng(0)
    n = 30
    x = np.arange(n, dtype=float)
    y = np.where(x < 20, 0.1 * rng.standard_normal(n), (x - 20) * 0.5)
    idx, mses = opt.search_pivot(x, y)

    # brute force the same piecewise-linear regression MSE
    def mse(i):
        t = np.maximum(x[i] - x, 0.0) * (x <= x[i])
        X1 = np.stack([np.ones(n), t], axis=1)
        r = y - X1 @ np.linalg.lstsq(X1, y, rcond=None)[0]
        return r @ r

    brute = np.array([mse(i) for i in range(1, n)])
    assert abs(mse(idx) - brute.min()) <= 1e-8 * max(1.0, brute.min())


def test_linqp_full():
    """Barrier QP vs scipy minimize with constraints."""
    rng = np.random.default_rng(0)
    d, m = 4, 6
    B = rng.standard_normal((d, 2 * d))
    Q = B @ B.T / d + np.eye(d)
    v = rng.standard_normal(d)
    A = rng.standard_normal((m, d))
    lower = np.full(m, 1.0)
    upper = np.full(m, 1.0)

    x, iters = opt.linqp_full(Q, v, A, lower, upper, lmda_min=1e-9,
                              lmda_path_size=30)
    # feasible
    Ax = A @ x
    assert np.all(Ax <= upper + 1e-8) and np.all(Ax >= -lower - 1e-8)

    # oracle via scipy SLSQP
    res = scipy.optimize.minimize(
        lambda z: 0.5 * z @ Q @ z - v @ z, np.zeros(d), jac=lambda z: Q @ z - v,
        constraints=[
            {"type": "ineq", "fun": lambda z: upper - A @ z},
            {"type": "ineq", "fun": lambda z: A @ z + lower},
        ], method="SLSQP", options={"maxiter": 1000, "ftol": 1e-14},
    )
    obj = lambda z: 0.5 * z @ Q @ z - v @ z
    assert obj(x) <= obj(res.x) + 1e-5 * max(1.0, abs(obj(res.x))), (
        obj(x), obj(res.x)
    )
