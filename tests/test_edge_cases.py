"""Edge-case coverage: offsets, observation weights, ridge (alpha=0),
zero-penalty groups, single lambda, tiny problems."""

import numpy as np
import pytest

import adelie_tpu as ad


def test_offsets_gaussian():
    rng = np.random.default_rng(0)
    n, p = 80, 10
    X = rng.standard_normal((n, p))
    offs = rng.standard_normal(n)
    y = X[:, 0] + offs + 0.1 * rng.standard_normal(n)
    st = ad.grpnet(X, ad.glm.gaussian(y), offsets=offs, lmda_path_size=6,
                   min_ratio=0.1, progress_bar=False)
    assert st.error == ""
    # fitting y - offs without offsets must match
    st2 = ad.grpnet(X, ad.glm.gaussian(y - offs), lmda_path_size=6,
                    min_ratio=0.1, progress_bar=False)
    B1 = np.asarray(st.betas.todense())
    B2 = np.asarray(st2.betas.todense())
    L = min(len(B1), len(B2))
    # lambda paths are derived from the same centered residuals
    np.testing.assert_allclose(st.lmdas[:L], st2.lmdas[:L], rtol=1e-10)
    np.testing.assert_allclose(B1[:L], B2[:L], atol=1e-9)


def test_observation_weights():
    rng = np.random.default_rng(1)
    n, p = 60, 8
    X = rng.standard_normal((n, p))
    y = X[:, 1] + 0.1 * rng.standard_normal(n)
    w = rng.uniform(0.5, 2.0, n)
    st = ad.grpnet(X, ad.glm.gaussian(y, weights=w), lmda_path_size=5,
                   min_ratio=0.2, progress_bar=False)
    assert st.error == ""
    # duplicating an observation == doubling its weight
    w2 = np.ones(n)
    w2[0] = 2.0
    Xd = np.concatenate([X, X[:1]], axis=0)
    yd = np.concatenate([y, y[:1]])
    st_w = ad.grpnet(X, ad.glm.gaussian(y, weights=w2), lmda_path_size=5,
                     min_ratio=0.2, progress_bar=False)
    st_d = ad.grpnet(Xd, ad.glm.gaussian(yd), lmda_path_size=5,
                     min_ratio=0.2, progress_bar=False)
    np.testing.assert_allclose(st_w.lmdas, st_d.lmdas, rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(st_w.betas.todense()), np.asarray(st_d.betas.todense()),
        atol=1e-8,
    )


def test_ridge_alpha_zero():
    rng = np.random.default_rng(2)
    n, p = 100, 6
    X = rng.standard_normal((n, p))
    y = X @ rng.standard_normal(p) + 0.1 * rng.standard_normal(n)
    st = ad.grpnet(X, ad.glm.gaussian(y), alpha=0.0, lmda_path_size=5,
                   min_ratio=0.01, intercept=False, progress_bar=False,
                   early_exit=False, tol=1e-12)
    assert st.error == ""
    B = np.asarray(st.betas.todense())
    # closed-form ridge check at the last lambda: (X'WX + lmda I) b = X'Wy
    lm = st.lmdas[-1]
    w = 1.0 / n
    bh = np.linalg.solve(w * X.T @ X + lm * np.eye(p), w * X.T @ y)
    np.testing.assert_allclose(B[-1], bh, atol=1e-6)


def test_zero_penalty_groups():
    rng = np.random.default_rng(3)
    n, p = 80, 9
    X = rng.standard_normal((n, p))
    y = X[:, 0] + 0.1 * rng.standard_normal(n)
    pen = np.ones(p)
    pen[0] = 0.0  # group 0 always unpenalized -> always active
    st = ad.grpnet(X, ad.glm.gaussian(y), penalty=pen, lmda_path_size=5,
                   min_ratio=0.2, progress_bar=False)
    assert st.error == ""
    B = np.asarray(st.betas.todense())
    assert np.all(np.abs(B[:, 0]) > 1e-6)


def test_single_lambda_and_tiny():
    rng = np.random.default_rng(4)
    X = rng.standard_normal((10, 2))
    y = X[:, 0]
    st = ad.grpnet(X, ad.glm.gaussian(y), lmda_path=[0.01],
                   progress_bar=False)
    assert st.error == "" and len(st.lmdas) == 1
    st2 = ad.grpnet(X[:, :1], ad.glm.gaussian(y), lmda_path_size=3,
                    progress_bar=False)
    assert st2.error == ""


def test_exit_cond_and_progress_bar(capsys):
    rng = np.random.default_rng(5)
    X = rng.standard_normal((60, 8))
    y = X[:, 0] + 0.1 * rng.standard_normal(60)

    calls = []

    def exit_after_first(state):
        calls.append(len(state.lmdas))
        return len(state.lmdas) >= 1

    st = ad.grpnet(X, ad.glm.gaussian(y), lmda_path_size=20, min_ratio=0.01,
                   progress_bar=True, exit_cond=exit_after_first,
                   early_exit=False)
    assert st.error == ""
    assert len(calls) >= 1
    # exit_cond stopped the path well short of 20
    assert len(st.lmdas) < 20


def test_chunk_sweep_budget_guard():
    """The cooperative watchdog guard (configs.chunk_sweep_budget) freezes
    fused chunk programs early; the host resumes and the path completes
    with identical solutions (VERDICT r1 #10)."""
    from adelie_tpu.configs import set_configs

    rng = np.random.default_rng(0)
    n, p = 200, 30
    X = rng.standard_normal((n, p))
    y = X[:, :3] @ [1.0, -1.0, 0.5] + 0.1 * rng.standard_normal(n)
    kw = dict(lmda_path_size=10, min_ratio=0.1, progress_bar=False,
              tol=1e-10, early_exit=False)

    ref = ad.grpnet(X, ad.glm.gaussian(y), **kw)
    assert ref.error == ""

    set_configs("chunk_sweep_budget", 3)  # freeze after ~every lambda
    try:
        st = ad.grpnet(X, ad.glm.gaussian(y), **kw)
    finally:
        set_configs("chunk_sweep_budget", None)
    assert st.error == ""
    assert len(st.lmdas) == len(ref.lmdas)
    np.testing.assert_allclose(
        np.asarray(st.betas.todense()), np.asarray(ref.betas.todense()),
        atol=1e-9,
    )
