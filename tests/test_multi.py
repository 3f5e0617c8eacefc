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


def test_multigaussian_constraints_nonbinding():
    """Huge box constraints must reproduce the unconstrained multi fit."""
    n, p, K = 50, 5, 3
    X, Y = _multi_data(n, p, K, seed=7)
    glm = ad.glm.multigaussian(Y)

    st0 = ad.grpnet(X, glm, lmda_path_size=5, min_ratio=0.3, tol=1e-12,
                    progress_bar=False, early_exit=False)
    cons = [ad.constraint.box(np.full(K, -1e8), np.full(K, 1e8))
            for _ in range(p)]
    st1 = ad.grpnet(X, ad.glm.multigaussian(Y), constraints=cons,
                    lmda_path_size=5, min_ratio=0.3, tol=1e-12,
                    progress_bar=False, early_exit=False)
    assert st1.error == "", st1.error
    np.testing.assert_allclose(st0.lmdas, st1.lmdas, rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(st0.betas.todense()), np.asarray(st1.betas.todense()),
        atol=1e-7,
    )
    np.testing.assert_allclose(st0.intercepts, st1.intercepts, atol=1e-7)


def test_multigaussian_constraints_vs_flattened():
    """Binding nonnegativity: multi fit == single-response fit on the
    flattened kron(X, I_K) problem with the same constraints (that path
    is oracle-verified in test_constrained_grpnet.py)."""
    n, p, K = 40, 4, 2
    X, Y = _multi_data(n, p, K, seed=8)
    w = np.full(n, 1.0 / n)

    cons = [ad.constraint.lower(np.zeros(K)) for _ in range(p)]
    st = ad.grpnet(X, ad.glm.multigaussian(Y), constraints=cons,
                   lmda_path_size=5, min_ratio=0.2, tol=1e-12,
                   progress_bar=False, early_exit=False)
    assert st.error == "", st.error
    B = np.asarray(st.betas.todense())
    assert np.all(B >= -1e-9)

    # flattened single-response problem
    X_aug = np.concatenate(
        [np.kron(np.ones((n, 1)), np.eye(K)), np.kron(X, np.eye(K))], axis=1
    )
    y_flat = Y.reshape(-1)
    w_flat = np.repeat(w / K, K)
    groups = np.concatenate([np.arange(K), K + np.arange(p) * K])
    cons_flat = [None] * K + [ad.constraint.lower(np.zeros(K))
                              for _ in range(p)]
    penalty = np.concatenate([np.zeros(K), np.full(p, np.sqrt(K))])
    st2 = ad.grpnet(
        X_aug, ad.glm.gaussian(y_flat, weights=w_flat), groups=groups,
        penalty=penalty, constraints=cons_flat, intercept=False,
        lmda_path=np.asarray(st.lmdas), tol=1e-12, progress_bar=False,
        early_exit=False,
    )
    assert st2.error == "", st2.error
    B2 = np.asarray(st2.betas.todense())
    np.testing.assert_allclose(B, B2[:, K:], atol=1e-7)
    np.testing.assert_allclose(st.intercepts, B2[:, :K], atol=1e-7)


def test_multinomial_constraints():
    """Multinomial + box constraints: feasibility + non-binding equality."""
    rng = np.random.default_rng(9)
    n, p, K = 60, 4, 3
    X = rng.standard_normal((n, p))
    eta = X[:, :2] @ rng.standard_normal((2, K))
    probs = np.exp(eta) / np.exp(eta).sum(1, keepdims=True)
    Y = np.zeros((n, K))
    for i in range(n):
        Y[i, rng.choice(K, p=probs[i])] = 1.0

    st0 = ad.grpnet(X, ad.glm.multinomial(Y), lmda_path_size=4,
                    min_ratio=0.3, tol=1e-11, irls_tol=1e-11,
                    progress_bar=False, early_exit=False)
    cons = [ad.constraint.box(np.full(K, -1e8), np.full(K, 1e8))
            for _ in range(p)]
    st1 = ad.grpnet(X, ad.glm.multinomial(Y), constraints=cons,
                    lmda_path_size=4, min_ratio=0.3, tol=1e-11,
                    irls_tol=1e-11, progress_bar=False, early_exit=False)
    assert st1.error == "", st1.error
    np.testing.assert_allclose(
        np.asarray(st0.betas.todense()), np.asarray(st1.betas.todense()),
        atol=1e-5,
    )

    # binding: cap every coefficient at 0.05
    cap = [ad.constraint.box(np.full(K, -0.05), np.full(K, 0.05))
           for _ in range(p)]
    st2 = ad.grpnet(X, ad.glm.multinomial(Y), constraints=cap,
                    lmda_path_size=4, min_ratio=0.3, progress_bar=False,
                    early_exit=False)
    assert st2.error == "", st2.error
    B2 = np.asarray(st2.betas.todense())
    # the default constraint method is the reference's dual proximal
    # Newton, whose primal feasibility is approximate at tolerance level
    assert np.all(np.abs(B2) <= 0.05 + 1e-5)


def test_multi_constraints_bad_dims():
    n, p, K = 30, 4, 2
    X, Y = _multi_data(n, p, K, seed=10)
    with pytest.raises(ValueError, match="primal dimension"):
        ad.grpnet(X, ad.glm.multigaussian(Y),
                  constraints=[ad.constraint.lower(np.zeros(K + 1))] * p,
                  progress_bar=False)
    with pytest.raises(ValueError, match="length"):
        ad.grpnet(X, ad.glm.multigaussian(Y),
                  constraints=[ad.constraint.lower(np.zeros(K))] * (p + 1),
                  progress_bar=False)
