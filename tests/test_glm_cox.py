"""Cox GLM tests (reference tests/test_glm.py:300-424,664).

Oracles: a direct numpy implementation of the documented partial-likelihood
math (adelie/glm.py:199-330) for the loss, and finite differences of that
loss for gradient/hessian.
"""

import numpy as np
import pytest

import adelie_tpu as ad


def _cox_data(n, seed, n_strata=1, with_ties=True, zero_weights=False):
    rng = np.random.default_rng(seed)
    stop_vals = rng.integers(1, (n // 2) if with_ties else (10 * n), n).astype(float)
    start = stop_vals - rng.integers(1, 5, n).astype(float)
    status = (rng.uniform(size=n) < 0.7).astype(float)
    strata = rng.integers(0, n_strata, n)
    w = rng.uniform(0.5, 2.0, n)
    if zero_weights:
        w[rng.choice(n, n // 5, replace=False)] = 0.0
    w = w / w.sum()
    return start, stop_vals, status, strata, w


def _brute_loss(eta, start, stop, status, strata, w, tie_method):
    """Direct implementation of the documented loss (adelie/glm.py:212-247)."""
    n = len(eta)
    total = 0.0
    for i in range(n):
        if status[i] == 0:
            continue
        m = strata[i]
        same = strata == m
        # H(t_i): event ties with nonzero weight (reference _nnz_event_ties_sum)
        H = same & (stop == stop[i]) & (status == 1) & (w != 0)
        nH = H.sum()
        if w[i] != 0:
            wbar = w[H].sum() / nH
        else:
            wbar = 0.0
        # sigma: Efron rank among nnz ties / |H|
        if tie_method == "efron" and w[i] != 0:
            order = np.nonzero(H)[0]
            k_i = int(np.nonzero(order == i)[0][0])
            sigma = k_i / nH
        else:
            sigma = 0.0
        R = same & (start < stop[i]) & (stop[i] <= stop)
        risk = np.sum(w[R] * np.exp(eta[R]))
        ties = np.sum(w[H] * np.exp(eta[H]))
        A = np.log(risk - sigma * ties)
        total += -w[i] * eta[i] + wbar * A
    return total


@pytest.mark.parametrize("tie_method", ["efron", "breslow"])
@pytest.mark.parametrize("n_strata", [1, 3])
def test_cox_loss_vs_brute(tie_method, n_strata):
    n = 40
    start, stop, status, strata, w = _cox_data(n, 0, n_strata)
    glm = ad.glm.cox(start=start, stop=stop, status=status, strata=strata,
                     weights=w, tie_method=tie_method)
    rng = np.random.default_rng(1)
    eta = rng.standard_normal(n)
    ours = float(glm.loss(eta))
    brute = _brute_loss(eta, start, stop, status, strata, w, tie_method)
    assert np.isclose(ours, brute, atol=1e-9), (ours, brute)


@pytest.mark.parametrize("tie_method", ["efron", "breslow"])
@pytest.mark.parametrize("n_strata", [1, 2])
@pytest.mark.parametrize("zero_weights", [False, True])
def test_cox_gradient_finite_diff(tie_method, n_strata, zero_weights):
    n = 25
    start, stop, status, strata, w = _cox_data(n, 2, n_strata,
                                               zero_weights=zero_weights)
    glm = ad.glm.cox(start=start, stop=stop, status=status, strata=strata,
                     weights=w, tie_method=tie_method)
    rng = np.random.default_rng(3)
    eta = 0.5 * rng.standard_normal(n)
    grad = np.asarray(glm.gradient(eta))

    eps = 1e-6
    fd = np.zeros(n)
    for i in range(n):
        ep = np.zeros(n)
        ep[i] = eps
        fd[i] = (float(glm.loss(eta + ep)) - float(glm.loss(eta - ep))) / (2 * eps)
    # gradient is the NEGATIVE loss gradient
    assert np.allclose(grad, -fd, atol=5e-6), np.abs(grad + fd).max()


@pytest.mark.parametrize("tie_method", ["efron", "breslow"])
def test_cox_hessian_finite_diff(tie_method):
    n = 20
    start, stop, status, strata, w = _cox_data(n, 4, 2)
    glm = ad.glm.cox(start=start, stop=stop, status=status, strata=strata,
                     weights=w, tie_method=tie_method)
    rng = np.random.default_rng(5)
    eta = 0.3 * rng.standard_normal(n)
    grad = glm.gradient(eta)
    hess = np.asarray(glm.hessian(eta, grad))

    eps = 1e-6
    fd = np.zeros(n)
    for i in range(n):
        ep = np.zeros(n)
        ep[i] = eps
        gp = np.asarray(glm.gradient(eta + ep))[i]
        gm = np.asarray(glm.gradient(eta - ep))[i]
        fd[i] = (gp - gm) / (2 * eps)
    # hessian = -d grad / d eta (diagonal)
    assert np.allclose(hess, -fd, atol=5e-5), np.abs(hess + fd).max()


def test_cox_grpnet_path():
    """Cox grpnet end-to-end: deviance increases, KKT holds at solutions."""
    rng = np.random.default_rng(6)
    n, p = 100, 10
    X = rng.standard_normal((n, p))
    beta_true = np.zeros(p)
    beta_true[:3] = [1.0, -1.0, 0.5]
    hazard = X @ beta_true
    stop = rng.exponential(np.exp(-hazard)) + 0.1
    start = np.zeros(n)
    status = (rng.uniform(size=n) < 0.8).astype(float)

    glm = ad.glm.cox(start=start, stop=stop, status=status)
    state = ad.grpnet(X, glm, lmda_path_size=20, intercept=False,
                      progress_bar=False)
    assert state.error == "", state.error
    assert len(state.lmdas) >= 3
    devs = np.asarray(state.devs)
    assert np.all(np.diff(devs) >= -1e-9)

    # KKT at the last solution: active coordinate stationarity
    lmda = state.lmdas[-1]
    beta = np.asarray(state.betas.todense())[-1]
    eta = X @ beta
    grad = np.asarray(glm.gradient(eta))
    g_full = X.T @ grad
    # IRLS converges |sum(dresid * deta)| <= irls_tol=1e-7, which bounds the
    # KKT residual at ~sqrt(irls_tol) absolute scale
    ktol = max(5e-4, 0.05 * lmda)
    for j in range(p):
        if beta[j] != 0:
            assert np.isclose(
                g_full[j], lmda * np.sign(beta[j]), atol=ktol
            ), (j, g_full[j], lmda)
        else:
            assert abs(g_full[j]) <= lmda + ktol


def test_cox_reweight():
    n = 30
    start, stop, status, strata, w = _cox_data(n, 7, 2)
    glm = ad.glm.cox(start=start, stop=stop, status=status, strata=strata,
                     weights=w)
    w2 = np.asarray(w)
    w2 = np.where(np.arange(n) % 3 == 0, 0.0, w2)
    glm2 = glm.reweight(w2)
    eta = np.zeros(n)
    assert np.isfinite(float(glm2.loss(eta)))
    assert float(glm2.loss_full()) <= float(glm2.loss(eta)) + 1e-12


def test_cox_f32_deep_path_completes():
    """f32 cox paths used to die at moderate lambda: the at-risk sums were
    differences of LARGE prefix cumsums, which cancel catastrophically in
    f32 once late risk sets get small (negative risk -> inf gradient ->
    NaN IRLS). The suffix-sum accumulation fixes it; this locks the f32
    path end to end."""
    rng = np.random.default_rng(5)
    n, p = 800, 60
    X = rng.standard_normal((n, p)).astype(np.float32)
    beta = np.zeros(p)
    beta[:5] = rng.standard_normal(5)
    stop = rng.exponential(np.exp(-X @ beta * 0.5)).astype(np.float32)
    start = np.zeros(n, np.float32)
    status = (rng.random(n) < 0.7).astype(np.float32)
    glm32 = ad.glm.cox(start=start, stop=stop, status=status,
                       dtype=np.float32)
    st = ad.grpnet(X, glm32, lmda_path_size=40, min_ratio=0.02,
                   progress_bar=False, early_exit=False)
    assert st.error == "", st.error
    assert len(st.lmdas) == 40
    assert np.isfinite(np.asarray(st.betas.todense())).all()
    # matches the f64 fit at f32-appropriate tolerance
    glm64 = ad.glm.cox(start=start, stop=stop, status=status)
    st64 = ad.grpnet(np.asarray(X, np.float64), glm64, lmda_path_size=40,
                     min_ratio=0.02, progress_bar=False, early_exit=False)
    np.testing.assert_allclose(
        np.asarray(st.betas.todense()), np.asarray(st64.betas.todense()),
        atol=5e-3,
    )


def test_cox_start_none_means_no_truncation():
    """start=None (plain right-censored data) equals start=-inf."""
    rng = np.random.default_rng(5)
    n = 40
    stop = rng.exponential(1, n)
    status = (rng.random(n) < 0.7).astype(float)
    g1 = ad.glm.cox(stop=stop, status=status)
    g2 = ad.glm.cox(start=np.full(n, -np.inf), stop=stop, status=status)
    eta = rng.standard_normal(n)
    np.testing.assert_allclose(float(g1.loss(eta)), float(g2.loss(eta)),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g1.gradient(eta)),
                               np.asarray(g2.gradient(eta)), atol=1e-12)
