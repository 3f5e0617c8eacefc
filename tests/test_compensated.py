"""Compensated f32 reductions (utils/compensated.py): chunked-Kahan
accumulation must beat plain f32 contractions against an f64 oracle, and the
``configs.compensated_reductions`` flag must thread through the gradient /
screen-Gram paths without changing solutions (reference accuracy bar:
tests/test_solver.py:444-465 solves in f64 at tol=1e-7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import adelie_tpu as ad
from adelie_tpu.configs import configs, set_configs
from adelie_tpu.utils import compensated


@pytest.fixture
def comp_flag():
    set_configs("compensated_reductions", True)
    set_configs("compensated_chunk", 1024)
    yield
    set_configs("compensated_reductions", None)
    set_configs("compensated_chunk", None)


def test_two_sum_exact():
    a = jnp.asarray([1e8, 1.0, -1.0], jnp.float32)
    b = jnp.asarray([1.0, 1e-8, 1e8], jnp.float32)
    s, e = compensated.two_sum(a, b)
    # s + e reproduces the exact sum in f64
    exact = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    np.testing.assert_allclose(
        np.asarray(s, np.float64) + np.asarray(e, np.float64), exact, rtol=0
    )


def test_kahan_sum_beats_plain():
    # adversarial cancellation: huge alternating terms + a tiny signal
    rng = np.random.default_rng(0)
    big = rng.standard_normal(4096).astype(np.float32) * 1e6
    parts = np.stack([big, -big, rng.standard_normal(4096).astype(np.float32)])
    parts = parts.reshape(3, 64, 64).astype(np.float32)
    oracle = parts.astype(np.float64).sum(axis=0)
    plain = np.asarray(jnp.sum(jnp.asarray(parts), axis=0), np.float64)
    comp = np.asarray(compensated.kahan_sum(jnp.asarray(parts)), np.float64)
    err_plain = np.abs(plain - oracle).max()
    err_comp = np.abs(comp - oracle).max()
    assert err_comp <= err_plain
    assert err_comp < 1e-4  # exact up to the f32 representation of inputs


def _cancellation_problem(n=20000, p=24, seed=0):
    """X^T v with heavy accumulation cancellation: v has a large common mode
    that nearly cancels against the tiny signal, so plain f32 accumulation
    loses digits proportional to n."""
    rng = np.random.default_rng(seed)
    X = (1.0 + 0.01 * rng.standard_normal((n, p))).astype(np.float32)
    v = rng.standard_normal(n).astype(np.float32)
    v = (v - v.mean()).astype(np.float32)  # result ~ sum of tiny residuals
    return X, v


def test_mul_tn_accuracy(comp_flag):
    X, v = _cancellation_problem()
    oracle = X.astype(np.float64).T @ v.astype(np.float64)
    plain = np.asarray(
        jnp.einsum("np,n->p", jnp.asarray(X), jnp.asarray(v),
                   precision=jax.lax.Precision.HIGHEST),
        np.float64,
    )
    comp = np.asarray(compensated.mul_tn(jnp.asarray(X), jnp.asarray(v),
                                         chunk=1024), np.float64)
    scale = np.abs(oracle).max()
    err_plain = np.abs(plain - oracle).max() / scale
    err_comp = np.abs(comp - oracle).max() / scale
    assert err_comp <= err_plain * 1.01
    assert err_comp < 5e-6


def test_gram_tn_accuracy():
    rng = np.random.default_rng(1)
    n, S = 30000, 16
    Xs = (1.0 + 0.05 * rng.standard_normal((n, S))).astype(np.float32)
    w = (np.ones(n) / n).astype(np.float32)
    A64 = (Xs.astype(np.float64).T * w.astype(np.float64)) @ Xs.astype(np.float64)
    m64 = Xs.astype(np.float64).T @ w.astype(np.float64)
    A, m = compensated.gram_tn(jnp.asarray(Xs), jnp.asarray(w), chunk=1024)
    np.testing.assert_allclose(np.asarray(A, np.float64), A64, rtol=2e-6)
    np.testing.assert_allclose(np.asarray(m, np.float64), m64, rtol=2e-6)


def test_cross_tn_matches_oracle():
    rng = np.random.default_rng(2)
    n, S, D = 9000, 8, 4
    Xs = rng.standard_normal((n, S)).astype(np.float32)
    Y = rng.standard_normal((n, D)).astype(np.float32)
    w = rng.uniform(0.1, 1.0, n).astype(np.float32)
    oracle = (Xs.astype(np.float64).T * w.astype(np.float64)) @ Y.astype(np.float64)
    out = compensated.cross_tn(jnp.asarray(Xs), jnp.asarray(Y), jnp.asarray(w),
                               chunk=2048)
    np.testing.assert_allclose(np.asarray(out, np.float64), oracle, rtol=2e-5,
                               atol=1e-4)


def test_grpnet_f32_flag_matches_plain(comp_flag):
    """End to end: the flag changes rounding, not solutions."""
    rng = np.random.default_rng(3)
    n, p = 600, 40
    X = rng.standard_normal((n, p)).astype(np.float32)
    beta = np.zeros(p); beta[:5] = rng.standard_normal(5)
    y = (X @ beta + 0.1 * rng.standard_normal(n)).astype(np.float32)

    state_c = ad.grpnet(X, ad.glm.gaussian(y), progress_bar=False,
                        lmda_path_size=30)
    set_configs("compensated_reductions", False)
    state_p = ad.grpnet(X, ad.glm.gaussian(y), progress_bar=False,
                        lmda_path_size=30)
    assert len(state_c.lmdas) == len(state_p.lmdas)
    np.testing.assert_allclose(
        np.asarray(state_c.betas.todense()),
        np.asarray(state_p.betas.todense()), atol=5e-5,
    )


def test_dense_mul_gradient_accuracy(comp_flag):
    """The matrix.dense gradient path (KKT driver) goes through mul_tn."""
    X, v = _cancellation_problem(n=16384, p=8, seed=4)
    w = np.ones(X.shape[0], np.float32)
    m = ad.matrix.dense(X)
    oracle = X.astype(np.float64).T @ v.astype(np.float64)
    comp = np.asarray(m.mul(jnp.asarray(v), jnp.asarray(w)), np.float64)
    set_configs("compensated_reductions", False)
    m2 = ad.matrix.dense(X)
    plain = np.asarray(m2.mul(jnp.asarray(v), jnp.asarray(w)), np.float64)
    scale = np.abs(oracle).max()
    assert np.abs(comp - oracle).max() / scale <= \
        np.abs(plain - oracle).max() / scale * 1.01


def test_screen_gram_dispatch(comp_flag):
    from adelie_tpu.solver.pin import screen_gram

    rng = np.random.default_rng(5)
    Xs = rng.standard_normal((5000, 12)).astype(np.float32)
    w = (np.ones(5000) / 5000).astype(np.float32)
    A_c, m_c = screen_gram(jnp.asarray(Xs), jnp.asarray(w), True)
    set_configs("compensated_reductions", False)
    A_p, m_p = screen_gram(jnp.asarray(Xs), jnp.asarray(w), True)
    np.testing.assert_allclose(np.asarray(A_c), np.asarray(A_p), atol=1e-5)
    np.testing.assert_allclose(np.asarray(m_c), np.asarray(m_p), atol=1e-6)
