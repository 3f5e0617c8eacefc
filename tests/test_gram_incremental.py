"""Incremental screen-Gram extension (screen_gram_extend).

The BASIL screen set only grows by appending groups; the incremental path
must produce the same Gram/means/eigh as a from-scratch rebuild, and the
solver must produce identical paths with it active (it is always active for
the gaussian drivers — these tests pin exactness and the fallback edges).
"""

import numpy as np
import pytest

import adelie_tpu as ad
from adelie_tpu.solver.pin import screen_gram
from adelie_tpu.solver.state_core import NaiveStateBase


def _mk_state(n=60, p=40, G=13, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, p))
    sizes = rng.integers(1, 5, G)
    while sizes.sum() > p:
        sizes[rng.integers(G)] = 1
    sizes[-1] += p - sizes.sum()
    groups = np.concatenate([[0], np.cumsum(sizes)])[:-1].astype(int)
    st = NaiveStateBase(
        X=ad.matrix.dense(X.astype(dtype)),
        groups=groups,
        group_sizes=sizes.astype(int),
        penalty=np.sqrt(sizes).astype(float),
        dtype=dtype,
        n=n,
        p=p,
    )
    st.weights_dev = None
    return st, X


def _full_gram(cache, w_dev, intercept):
    A_full, means_full = screen_gram(cache.Xs, w_dev, intercept)
    return np.asarray(A_full), np.asarray(means_full)


@pytest.mark.parametrize("intercept", [True, False])
def test_extend_matches_full(intercept):
    import jax.numpy as jnp

    st, X = _mk_state()
    w = np.full(st.n, 1.0 / st.n)
    w_dev = jnp.asarray(w)

    st.screen_set = np.array([0, 3, 7], int)
    st.screen_begins = None
    st.screen_beta = np.zeros(int(st.group_sizes[st.screen_set].sum()))
    st.screen_is_active = np.zeros(3, bool)
    cache = st.ensure_screen_cache()
    cache.rebuild_weighted(w_dev, intercept)
    assert cache._pending_ext is None

    # extend twice; second extension exercises chained increments
    for new in ([1, 9], [2, 5, 11]):
        st.extend_screen_set(np.array(new, int))
        cache = st.ensure_screen_cache()
        assert cache._pending_ext is not None, "extension path not taken"
        cache.rebuild_weighted(w_dev, intercept)
        A_inc, means_inc = np.asarray(cache.A), np.asarray(cache.means_s)
        A_ref, means_ref = _full_gram(cache, w_dev, intercept)
        np.testing.assert_allclose(A_inc, A_ref, atol=1e-12)
        np.testing.assert_allclose(means_inc, means_ref, atol=1e-12)
        # eigh consumed the incremental A: spot-check a diag block
        ev = np.asarray(cache.eigvals)
        assert np.all(ev >= 0)


def test_weight_change_falls_back_to_full():
    import jax.numpy as jnp

    st, X = _mk_state(seed=1)
    w1 = jnp.asarray(np.full(st.n, 1.0 / st.n))
    rng = np.random.default_rng(5)
    w2_np = rng.uniform(0.5, 1.5, st.n)
    w2 = jnp.asarray(w2_np / w2_np.sum())

    st.screen_set = np.array([0, 4], int)
    st.screen_beta = np.zeros(int(st.group_sizes[st.screen_set].sum()))
    st.screen_is_active = np.zeros(2, bool)
    cache = st.ensure_screen_cache()
    cache.rebuild_weighted(w1, True)
    st.extend_screen_set(np.array([8, 2], int))
    cache = st.ensure_screen_cache()
    # different weights object -> full recompute, still correct
    cache.rebuild_weighted(w2, True)
    A_ref, means_ref = _full_gram(cache, w2, True)
    np.testing.assert_allclose(np.asarray(cache.A), A_ref, atol=1e-12)
    np.testing.assert_allclose(np.asarray(cache.means_s), means_ref, atol=1e-12)


def test_extension_without_prior_weighted_build():
    import jax.numpy as jnp

    st, X = _mk_state(seed=2)
    w = jnp.asarray(np.full(st.n, 1.0 / st.n))
    st.screen_set = np.array([1], int)
    st.screen_beta = np.zeros(int(st.group_sizes[1]))
    st.screen_is_active = np.zeros(1, bool)
    st.ensure_screen_cache()  # structure only; no rebuild_weighted
    st.extend_screen_set(np.array([6], int))
    cache = st.ensure_screen_cache()
    cache.rebuild_weighted(w, True)  # no base Gram: must fall back to full
    A_ref, means_ref = _full_gram(cache, w, True)
    np.testing.assert_allclose(np.asarray(cache.A), A_ref, atol=1e-12)


def test_grpnet_path_unchanged_by_increments(monkeypatch):
    """End-to-end A/B: the same pivot-screened lasso path with the
    incremental extension force-disabled must match to f.p. noise, and the
    incremental path must actually fire during the enabled run."""
    from adelie_tpu.configs import set_configs
    from adelie_tpu.solver.state_core import ScreenCache

    rng = np.random.default_rng(3)
    n, p = 500, 600
    X = rng.standard_normal((n, p))
    beta = np.zeros(p)
    idx = rng.choice(p, 40, replace=False)
    beta[idx] = rng.standard_normal(40)
    y = X @ beta + 1.0 * rng.standard_normal(n)

    fired = {"inc": 0}
    orig = ScreenCache.rebuild_weighted

    def spy(self, w, intercept):
        if (
            self._pending_ext is not None
            and self._A_prev is not None
            and w is self._weights_ref
        ):
            fired["inc"] += 1
        return orig(self, w, intercept)

    set_configs("screen_all_max", 0)  # force BASIL screening
    try:
        monkeypatch.setattr(ScreenCache, "rebuild_weighted", spy)
        fit = ad.grpnet(
            X, ad.glm.gaussian(y), lmda_path_size=60,
            progress_bar=False, adev_tol=0.999,
        )
        assert fired["inc"] >= 2, "incremental extension never fired"
        monkeypatch.setattr(
            ScreenCache, "_try_extend_structure", lambda self, state: False
        )
        fit_full = ad.grpnet(
            X, ad.glm.gaussian(y), lmda_path_size=60,
            progress_bar=False, adev_tol=0.999,
        )
    finally:
        set_configs("screen_all_max", None)

    assert len(fit.lmdas) == len(fit_full.lmdas) >= 40
    for i in range(len(fit.lmdas)):
        d = np.abs(np.asarray((fit.betas[i] - fit_full.betas[i]).todense()))
        assert d.max() < 1e-12
