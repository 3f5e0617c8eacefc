"""Multi-response grpnet tests (reference tests/test_solver.py multi
sections): the multigaussian fit must equal the flattened single-response
problem on kron(X, I_K) with per-class unpenalized intercept columns
(reference solver.py:700-763), checked against the FISTA oracle."""

import numpy as np
import pytest

import adelie_tpu as ad
from oracle import fista_group_elnet


def _multi_data(n, p, K, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, p))
    B = np.zeros((p, K))
    B[:3] = rng.standard_normal((3, K))
    Y = X @ B + 0.1 * rng.standard_normal((n, K))
    return X, Y


@pytest.mark.parametrize("intercept", [True, False])
def test_multigaussian_vs_flattened_oracle(intercept):
    n, p, K = 60, 6, 3
    X, Y = _multi_data(n, p, K)
    glm = ad.glm.multigaussian(Y)

    state = ad.grpnet(X, glm, intercept=intercept, lmda_path_size=5,
                      min_ratio=0.3, progress_bar=False, tol=1e-12,
                      early_exit=False)
    assert state.error == "", state.error
    B_ours = np.asarray(state.betas.todense())
    I_ours = np.asarray(state.intercepts)
    assert B_ours.shape[1] == p * K
    assert I_ours.shape == (len(state.lmdas), K)

    # flattened problem: X_aug = [1 (x) I_K | X (x) I_K], weights w/K
    X_aug = np.kron(X, np.eye(K))
    if intercept:
        X_aug = np.concatenate([np.kron(np.ones((n, 1)), np.eye(K)), X_aug],
                               axis=1)
    y_flat = Y.reshape(-1)
    wf = np.full(n * K, 1.0 / (n * K))
    G = p + int(intercept)
    groups = K * np.arange(G)
    group_sizes = np.full(G, K)
    penalty = np.sqrt(group_sizes).astype(float)
    if intercept:
        penalty[0] = 0.0

    for li in [0, len(state.lmdas) - 1]:
        lmda = state.lmdas[li]
        beta_o, _ = fista_group_elnet(
            X_aug, y_flat, wf, lmda, 1.0, penalty, groups, group_sizes,
            loss="gaussian", intercept=False, max_iters=100000, tol=1e-13,
        )
        if intercept:
            np.testing.assert_allclose(I_ours[li], beta_o[:K], atol=2e-5)
            np.testing.assert_allclose(B_ours[li], beta_o[K:], atol=2e-5)
        else:
            np.testing.assert_allclose(B_ours[li], beta_o, atol=2e-5)


def test_multinomial_grpnet():
    rng = np.random.default_rng(1)
    n, p, K = 150, 8, 3
    X = rng.standard_normal((n, p))
    B = np.zeros((p, K))
    B[:2] = 2.0 * rng.standard_normal((2, K))
    logits = X @ B
    prob = np.exp(logits - logits.max(1, keepdims=True))
    prob /= prob.sum(1, keepdims=True)
    labels = np.array([rng.choice(K, p=pi) for pi in prob])
    Y = np.eye(K)[labels]

    glm = ad.glm.multinomial(Y)
    state = ad.grpnet(X, glm, lmda_path_size=15, min_ratio=0.05,
                      progress_bar=False)
    assert state.error == "", state.error
    devs = np.asarray(state.devs)
    assert np.all(np.diff(devs) >= -1e-9)
    assert devs[-1] > 0.1

    # prediction accuracy at the densest solution beats chance
    from adelie_tpu.diagnostic import predict

    etas = predict(X, state.betas, state.intercepts)
    pred = np.argmax(etas[-1], axis=1)
    assert (pred == labels).mean() > 1.5 / K


def test_multigaussian_diagnostics():
    n, p, K = 50, 5, 2
    X, Y = _multi_data(n, p, K, seed=2)
    glm = ad.glm.multigaussian(Y)
    state = ad.grpnet(X, glm, lmda_path_size=6, min_ratio=0.2,
                      progress_bar=False)
    from adelie_tpu.diagnostic import predict

    etas = predict(X, state.betas, state.intercepts)
    assert etas.shape == (len(state.lmdas), n, K)
    # etas reproduce X B + intercept
    B = np.asarray(state.betas.todense())[-1].reshape(p, K)
    expect = X @ B + np.asarray(state.intercepts)[-1][None, :]
    np.testing.assert_allclose(etas[-1], expect, atol=1e-8)
