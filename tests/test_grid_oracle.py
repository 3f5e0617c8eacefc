"""Dimension/seed grid oracle sweep (reference tests/test_solver.py:569-576
pattern): grpnet across (n, p, G) x alpha x intercept combinations, each
checked against the FISTA oracle with objective-dominance fallback."""

import numpy as np
import pytest

import adelie_tpu as ad
from oracle import fista_group_elnet, objective_gaussian


@pytest.mark.parametrize("n,p,G", [(40, 12, 12), (60, 20, 7), (25, 30, 10)])
@pytest.mark.parametrize("alpha", [1.0, 0.6])
@pytest.mark.parametrize("intercept", [True, False])
def test_gaussian_grid(n, p, G, alpha, intercept):
    rng = np.random.default_rng(n * 1000 + p + G)
    X = rng.standard_normal((n, p))
    beta = np.zeros(p)
    beta[rng.choice(p, max(2, p // 5), replace=False)] = rng.standard_normal(
        max(2, p // 5)
    )
    y = X @ beta + 0.2 * rng.standard_normal(n)
    w = np.full(n, 1.0 / n)

    cuts = np.sort(rng.choice(np.arange(1, p), G - 1, replace=False))
    groups = np.concatenate([[0], cuts]).astype(int)
    group_sizes = np.diff(np.concatenate([groups, [p]])).astype(int)
    penalty = np.sqrt(group_sizes).astype(float)

    state = ad.grpnet(
        X, ad.glm.gaussian(y), groups=groups, alpha=alpha,
        intercept=intercept, lmda_path_size=6, min_ratio=0.2, tol=1e-11,
        progress_bar=False, early_exit=False,
    )
    assert state.error == "", state.error
    B = np.asarray(state.betas.todense())

    for li in [2, len(state.lmdas) - 1]:
        lmda = state.lmdas[li]
        beta_o, b0_o = fista_group_elnet(
            X, y, w, lmda, alpha, penalty, groups, group_sizes,
            intercept=intercept, tol=1e-13,
        )
        ours = objective_gaussian(
            X, y, w, B[li], state.intercepts[li], lmda, alpha, penalty,
            groups, group_sizes,
        )
        oracle = objective_gaussian(
            X, y, w, beta_o, b0_o, lmda, alpha, penalty, groups, group_sizes,
        )
        close = np.allclose(B[li], beta_o, atol=2e-5)
        assert close or ours <= oracle + 1e-8 * max(1.0, abs(oracle)), (
            li, ours - oracle
        )
