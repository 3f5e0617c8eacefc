"""Solver tests: coefficient match vs sklearn / FISTA oracle with the
reference's objective-dominance fallback (reference tests/test_solver.py:
408-466)."""

import numpy as np
import pytest

import adelie_tpu as ad
from oracle import (
    fista_group_elnet,
    objective_gaussian,
    objective_logistic,
)


def _dominance(obj_ours, obj_oracle, tol=1e-8):
    return obj_ours <= obj_oracle + tol * (abs(obj_oracle) + 1.0)


def _check_gaussian_solutions(X, y, state, groups, group_sizes, penalty, alpha,
                              indices, atol=1e-6):
    n = X.shape[0]
    w = np.full(n, 1.0 / n)
    for i in indices:
        lm = state.lmdas[i]
        b = state.betas[i].toarray()[0]
        b0 = state.intercepts[i]
        bo, bo0 = fista_group_elnet(
            X, y, w, lm, alpha, penalty, groups, group_sizes, loss="gaussian"
        )
        if np.abs(b - bo).max() < atol and abs(b0 - bo0) < atol:
            continue
        obj_ours = objective_gaussian(
            X, y, w, b, b0, lm, alpha, penalty, groups, group_sizes
        )
        obj_orac = objective_gaussian(
            X, y, w, bo, bo0, lm, alpha, penalty, groups, group_sizes
        )
        assert _dominance(obj_ours, obj_orac), (
            f"lmda={lm}: coef diff {np.abs(b - bo).max():.2e}, "
            f"obj ours={obj_ours:.12f} oracle={obj_orac:.12f}"
        )


def test_lasso_vs_sklearn():
    from sklearn.linear_model import Lasso

    rng = np.random.default_rng(0)
    n, p = 100, 20
    X = rng.standard_normal((n, p))
    beta = np.zeros(p)
    beta[:3] = [1.0, -2.0, 0.5]
    y = X @ beta + 0.1 * rng.standard_normal(n)

    state = ad.grpnet(X, ad.glm.gaussian(y), lmda_path_size=20)
    assert state.error == ""
    for i in [5, len(state.lmdas) - 1]:
        lm = state.lmdas[i]
        sk = Lasso(alpha=lm, tol=1e-13, max_iter=1_000_000).fit(X, y)
        np.testing.assert_allclose(
            state.betas[i].toarray()[0], sk.coef_, atol=1e-6
        )
        np.testing.assert_allclose(state.intercepts[i], sk.intercept_, atol=1e-6)


@pytest.mark.parametrize("alpha", [1.0, 0.6])
@pytest.mark.parametrize("screen_rule", ["pivot", "strong"])
def test_group_elnet_gaussian(alpha, screen_rule):
    data = ad.data.dense(60, 24, 7, seed=3, sparsity=0.5, snr=3)
    X, glm = data["X"], data["glm"]
    groups, gs, pen = data["groups"], data["group_sizes"], data["penalty"]
    state = ad.grpnet(
        X, glm, groups=groups, penalty=pen, alpha=alpha,
        lmda_path_size=10, min_ratio=0.05, screen_rule=screen_rule,
    )
    assert state.error == ""
    assert len(state.lmdas) >= 5
    _check_gaussian_solutions(
        X, np.asarray(glm.y), state, groups, gs, pen, alpha,
        [2, len(state.lmdas) - 1],
    )


def test_no_intercept():
    data = ad.data.dense(50, 15, 5, seed=7, sparsity=0.4, snr=2)
    X, glm = data["X"], data["glm"]
    groups, gs, pen = data["groups"], data["group_sizes"], data["penalty"]
    y = np.asarray(glm.y)
    state = ad.grpnet(
        X, glm, groups=groups, penalty=pen, intercept=False,
        lmda_path_size=8, min_ratio=0.1,
    )
    assert state.error == ""
    assert np.all(np.asarray(state.intercepts) == 0)
    n = X.shape[0]
    w = np.full(n, 1.0 / n)
    i = len(state.lmdas) - 1
    lm = state.lmdas[i]
    b = state.betas[i].toarray()[0]
    bo, _ = fista_group_elnet(
        X, y, w, lm, 1.0, pen, groups, gs, loss="gaussian", intercept=False
    )
    obj_ours = objective_gaussian(X, y, w, b, 0.0, lm, 1.0, pen, groups, gs)
    obj_orac = objective_gaussian(X, y, w, bo, 0.0, lm, 1.0, pen, groups, gs)
    assert np.abs(b - bo).max() < 1e-5 or _dominance(obj_ours, obj_orac)


def test_unpenalized_groups():
    """Groups with penalty 0 are always active and unpenalized."""
    data = ad.data.dense(70, 18, 6, seed=11, sparsity=0.3, zero_penalty=0.3)
    X, glm = data["X"], data["glm"]
    groups, gs, pen = data["groups"], data["group_sizes"], data["penalty"]
    state = ad.grpnet(X, glm, groups=groups, penalty=pen, lmda_path_size=6,
                      min_ratio=0.1)
    assert state.error == ""
    _check_gaussian_solutions(
        X, np.asarray(glm.y), state, groups, gs, pen, 1.0,
        [0, len(state.lmdas) - 1],
    )


def test_logistic_grpnet():
    data = ad.data.dense(80, 16, 6, glm="binomial", seed=5, sparsity=0.4, snr=5)
    X, glm = data["X"], data["glm"]
    groups, gs, pen = data["groups"], data["group_sizes"], data["penalty"]
    y = np.asarray(glm.y)
    state = ad.grpnet(X, glm, groups=groups, penalty=pen, lmda_path_size=8,
                      min_ratio=0.05)
    assert state.error == ""
    assert len(state.lmdas) >= 4
    n = X.shape[0]
    w = np.full(n, 1.0 / n)
    for i in [1, len(state.lmdas) - 1]:
        lm = state.lmdas[i]
        b = state.betas[i].toarray()[0]
        b0 = state.intercepts[i]
        bo, bo0 = fista_group_elnet(
            X, y, w, lm, 1.0, pen, groups, gs, loss="logistic"
        )
        if np.abs(b - bo).max() < 1e-5:
            continue
        obj_ours = objective_logistic(X, y, w, b, b0, lm, 1.0, pen, groups, gs)
        obj_orac = objective_logistic(X, y, w, bo, bo0, lm, 1.0, pen, groups, gs)
        assert _dominance(obj_ours, obj_orac, tol=1e-6)


def test_poisson_grpnet():
    data = ad.data.dense(60, 12, 5, glm="poisson", seed=9, sparsity=0.5)
    X, glm = data["X"], data["glm"]
    state = ad.grpnet(X, glm, groups=data["groups"], penalty=data["penalty"],
                      lmda_path_size=6, min_ratio=0.1)
    assert state.error == ""
    assert len(state.lmdas) >= 3
    # deviance must increase monotonically down the path
    devs = np.asarray(state.devs)
    assert np.all(np.diff(devs) > -1e-9)


def test_warm_start_continuation():
    data = ad.data.dense(50, 14, 5, seed=13, sparsity=0.4)
    X, glm = data["X"], data["glm"]
    kw = dict(groups=data["groups"], penalty=data["penalty"], min_ratio=0.05)
    full = ad.grpnet(X, glm, lmda_path_size=10, early_exit=False, **kw)
    half = ad.grpnet(X, glm, lmda_path=full.lmdas[:5], **kw)
    cont = ad.grpnet(X, glm, lmda_path=full.lmdas, warm_start=half,
                     early_exit=False, **kw)
    # both runs solve to tol=1e-7 in the convergence measure; coefficient
    # agreement is at the sqrt-of-tol scale
    np.testing.assert_allclose(
        cont.betas[-1].toarray(), full.betas[-1].toarray(), atol=5e-5
    )


def test_standardized_matrix_grpnet():
    """BASELINE.json config 2: grouped + standardization wrapper."""
    data = ad.data.dense(60, 20, 6, seed=17, sparsity=0.5)
    Xraw, glm = data["X"] * 3 + 1, data["glm"]
    groups, gs, pen = data["groups"], data["group_sizes"], data["penalty"]
    Xm = ad.matrix.standardize(Xraw)
    state = ad.grpnet(Xm, glm, groups=groups, penalty=pen, lmda_path_size=8,
                      min_ratio=0.05)
    assert state.error == ""
    c = Xraw.mean(axis=0)
    s = np.sqrt(((Xraw - c) ** 2).mean(axis=0))
    Xstd = (Xraw - c) / s
    _check_gaussian_solutions(
        Xstd, np.asarray(glm.y), state, groups, gs, pen, 1.0,
        [len(state.lmdas) - 1],
    )
