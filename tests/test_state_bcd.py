"""State factories + BCD solver-variant tests (reference tests/test_state.py
and test_bcd.py solver coverage)."""

import numpy as np
import pytest

import adelie_tpu as ad
from adelie_tpu import bcd, state


def _data(n=80, p=10, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, p))
    y = X[:, 0] - 0.5 * X[:, 3] + 0.1 * rng.standard_normal(n)
    return X, y


def test_state_gaussian_naive():
    X, y = _data()
    st = state.gaussian_naive(X=X, y=y, lmda_path_size=8, min_ratio=0.1)
    result = st.solve()
    assert result.error == ""
    assert len(result.lmdas) >= 3
    # invariant audit passes
    assert state.check_state(result, method="log") == []


def test_state_glm_naive():
    X, y = _data(seed=1)
    ybin = (y > 0).astype(float)
    st = state.glm_naive(X=X, glm=ad.glm.binomial(ybin), lmda_path_size=6,
                         min_ratio=0.1)
    result = st.solve()
    assert result.error == ""
    assert state.check_state(result, method="log") == []


def test_state_gaussian_cov():
    X, y = _data(seed=2)
    Xc = X - X.mean(0)
    yc = y - y.mean()
    n = len(y)
    st = state.gaussian_cov(A=Xc.T @ Xc / n, v=Xc.T @ yc / n,
                            lmda_path_size=6)
    result = st.solve()
    assert result.error == ""


def test_check_state_catches_corruption():
    X, y = _data(seed=3)
    result = state.gaussian_naive(X=X, y=y, lmda_path_size=5,
                                  min_ratio=0.1).solve()
    result.screen_begins = np.asarray(result.screen_begins) + 1
    with pytest.raises(AssertionError):
        state.check_state(result)


@pytest.mark.parametrize("solver", [
    "newton", "newton_abs", "newton_brent", "brent",
    "ista", "fista", "fista_adares",
])
def test_bcd_solver_variants(solver):
    rng = np.random.default_rng(4)
    q = 6
    quad = rng.uniform(0.5, 2.0, q)
    linear = rng.standard_normal(q)
    l1, l2 = 0.3, 0.1
    out = bcd.solve(quad=quad, linear=linear, l1=l1, l2=l2, solver=solver,
                    tol=1e-14, max_iters=100000)
    beta = out["beta"]
    # verify against the objective: compare with the newton reference
    ref = bcd.solve(quad=quad, linear=linear, l1=l1, l2=l2,
                    solver="newton_abs")["beta"]
    obj = lambda b: bcd.objective(b, quad=quad, linear=linear, l1=l1, l2=l2)
    assert np.allclose(beta, ref, atol=1e-5) or obj(beta) <= obj(ref) + 1e-9


def test_bcd_unknown_solver():
    with pytest.raises(ValueError):
        bcd.solve(quad=np.ones(2), linear=np.ones(2), l1=0.1, l2=0.0,
                  solver="bogus")


def test_save_load_warm_start(tmp_path):
    """Checkpoint to disk, resume the path in a 'new process' state."""
    X, y = _data(n=100, p=12, seed=9)
    st = ad.grpnet(X, ad.glm.gaussian(y), lmda_path_size=6, min_ratio=0.2,
                   progress_bar=False, early_exit=False)
    f = str(tmp_path / "ckpt.npz")
    state.save_state(st, f)

    ws = state.load_warm_start(f)
    ext = st.lmdas[-1] * np.array([0.5, 0.25])
    st2 = ad.grpnet(X, ad.glm.gaussian(y), warm_start=ws, lmda_path=ext,
                    progress_bar=False, early_exit=False)
    assert st2.error == ""
    # continuing from scratch down the concatenated path must agree
    full = np.concatenate([st.lmdas, ext])
    st3 = ad.grpnet(X, ad.glm.gaussian(y), lmda_path=full,
                    progress_bar=False, early_exit=False)
    B2 = np.asarray(st2.betas.todense())
    B3 = np.asarray(st3.betas.todense())[-2:]
    np.testing.assert_allclose(B2, B3, atol=1e-8)
