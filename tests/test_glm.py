"""GLM gradient/hessian/loss checks vs analytic numpy formulas and finite
differences (reference tests/test_glm.py patterns)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import adelie_tpu as ad


def _fd_gradient(loss_fn, eta, eps=1e-6):
    g = np.zeros_like(eta)
    for i in range(len(eta)):
        ep = eta.copy(); ep[i] += eps
        em = eta.copy(); em[i] -= eps
        g[i] = (loss_fn(ep) - loss_fn(em)) / (2 * eps)
    return g


def _check_gradient(glm, eta):
    """glm.gradient == -d loss / d eta."""
    grad = np.asarray(glm.gradient(jnp.asarray(eta)))
    fd = _fd_gradient(lambda e: float(glm.loss(jnp.asarray(e))), eta)
    np.testing.assert_allclose(grad, -fd, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("seed", [0, 1])
def test_gaussian(seed):
    rng = np.random.default_rng(seed)
    n = 20
    y = rng.standard_normal(n)
    w = np.abs(rng.standard_normal(n)) + 0.1
    glm = ad.glm.gaussian(y, w)
    eta = rng.standard_normal(n)
    wn = w / w.sum()
    np.testing.assert_allclose(
        np.asarray(glm.gradient(jnp.asarray(eta))), wn * (y - eta), atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(glm.hessian(eta, None)), wn, atol=1e-12)
    _check_gradient(glm, eta)
    assert float(glm.loss(jnp.asarray(eta))) >= float(glm.loss_full()) - 1e-12


@pytest.mark.parametrize("link", ["logit", "probit"])
def test_binomial(link):
    rng = np.random.default_rng(2)
    n = 25
    y = rng.binomial(1, 0.4, n).astype(float)
    glm = ad.glm.binomial(y, link=link)
    eta = rng.standard_normal(n) * 0.8
    _check_gradient(glm, eta)
    grad = glm.gradient(jnp.asarray(eta))
    hess = np.asarray(glm.hessian(jnp.asarray(eta), grad))
    # hessian positive where weights positive
    assert np.all(hess > 0)
    if link == "logit":
        mu = 1 / (1 + np.exp(-eta))
        np.testing.assert_allclose(hess, mu * (1 - mu) / n, rtol=1e-6)
    # loss >= saturated loss
    assert float(glm.loss(jnp.asarray(eta))) >= float(glm.loss_full()) - 1e-12


def test_poisson():
    rng = np.random.default_rng(3)
    n = 30
    y = rng.poisson(2.0, n).astype(float)
    glm = ad.glm.poisson(y)
    eta = rng.standard_normal(n) * 0.5
    _check_gradient(glm, eta)
    hess = np.asarray(glm.hessian(jnp.asarray(eta), glm.gradient(jnp.asarray(eta))))
    np.testing.assert_allclose(hess, np.exp(eta) / n, rtol=1e-6)
    assert float(glm.loss(jnp.asarray(eta))) >= float(glm.loss_full()) - 1e-10


def test_weights_normalized():
    y = np.array([1.0, 0.0, 1.0])
    w = np.array([2.0, 4.0, 2.0])
    glm = ad.glm.binomial(y, w)
    np.testing.assert_allclose(np.asarray(glm.weights).sum(), 1.0, atol=1e-14)
