"""Multi-response GLMs (reference glm/glm_multigaussian.ipp,
glm_multinomial.ipp).  ``y``/``eta`` are (n, K); losses carry a 1/K factor."""

import jax
import jax.numpy as jnp
import numpy as np

from . import GlmMultiBase


class GlmMultiGaussian(GlmMultiBase):
    opt = True

    def __init__(self, y, weights=None, dtype=None, opt: bool = True):
        super().__init__("multigaussian", y, weights, dtype)
        self.opt = opt

    def gradient(self, eta):
        K = self.y.shape[1]
        return self.weights[:, None] * (self.y - eta) / K

    def hessian(self, eta, grad):
        K = self.y.shape[1]
        return jnp.broadcast_to(self.weights[:, None] / K, self.y.shape)

    def loss(self, eta):
        K = self.y.shape[1]
        return jnp.sum(self.weights[:, None] * (0.5 * eta**2 - self.y * eta)) / K

    def loss_full(self):
        K = self.y.shape[1]
        return -0.5 * jnp.sum(self.weights[:, None] * self.y**2) / K

    def inv_link(self, eta):
        return eta


class GlmMultinomial(GlmMultiBase):
    def __init__(self, y, weights=None, dtype=None):
        y = np.asarray(y)
        if y.shape[1] <= 1:
            raise ValueError("y must have at least 2 columns (classes).")
        super().__init__("multinomial", y, weights, dtype)

    def gradient(self, eta):
        K = self.y.shape[1]
        P = jax.nn.softmax(eta, axis=1)
        return self.weights[:, None] * (self.y - P) / K

    def hessian(self, eta, grad):
        """Diagonal upper bound 2/K * w * P(1-P) (reference
        glm_multinomial.ipp hessian)."""
        K = self.y.shape[1]
        wP = self.weights[:, None] * self.y / K - grad  # w * P / K
        wsafe = (self.weights + (self.weights <= 0))[:, None]
        return 2.0 * wP * (1.0 - K * wP / wsafe)

    def loss(self, eta):
        K = self.y.shape[1]
        lse = jax.scipy.special.logsumexp(eta, axis=1)
        return jnp.sum(
            self.weights * (lse - jnp.sum(self.y * eta, axis=1))
        ) / K

    def loss_full(self):
        return jnp.zeros((), self.y.dtype)

    def inv_link(self, eta):
        return jax.nn.softmax(eta, axis=1)


class FlattenedMultiGlm:
    """Adapter exposing a multi-response GLM on flattened (n*K,) vectors.

    The multi-response problem is reformulated onto ``X (x) I_K`` with
    flattened responses (reference GlmWrap, solver_multiglm_naive.hpp:19-97);
    this adapter does the (nK,) <-> (n, K) reshaping so the scalar GLM
    driver runs unchanged.
    """

    is_multi = False  # behaves as single-response over the flattened problem

    def __init__(self, mglm):
        self._m = mglm
        self.name = mglm.name
        self.opt = mglm.opt
        self.dtype = mglm.dtype
        self._shape = tuple(np.asarray(mglm.y).shape)
        self.y = jnp.asarray(mglm.y).reshape(-1)
        K = self._shape[1]
        # flattened per-entry weights w_i / K, matching the gaussian-opt
        # reformulation (solver.py:768-775 weights_mscaled repeat)
        self.weights = jnp.repeat(jnp.asarray(mglm.weights) / K, K)

    def _r(self, v):
        return v.reshape(self._shape)

    def gradient(self, eta):
        return self._m.gradient(self._r(eta)).reshape(-1)

    def hessian(self, eta, grad):
        return self._m.hessian(self._r(eta), self._r(grad)).reshape(-1)

    def inv_hessian_gradient(self, eta, grad, hess):
        return self._m.inv_hessian_gradient(
            self._r(eta), self._r(grad), self._r(hess)
        ).reshape(-1)

    def loss(self, eta):
        return self._m.loss(self._r(eta))

    def loss_full(self):
        return self._m.loss_full()

    def inv_link(self, eta):
        return self._m.inv_link(self._r(eta)).reshape(-1)
