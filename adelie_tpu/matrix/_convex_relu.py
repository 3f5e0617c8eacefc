"""Convex (gated) ReLU feature matrices (reference
matrix_naive_convex_relu.{hpp,ipp}, ..._gated_relu.{hpp,ipp}; factory +
math matrix.py:390-470).

Gated:  Y = [D_1 Z, ..., D_m Z]          (n, m*d)
Full:   X = [Y, -Y]                       (n, 2*m*d)

where D_k = diag(mask[:, k]).  All ops ride two MXU matmuls by factoring
through the mask: e.g. ``Y^T u`` column block k is ``Z^T (mask_k * u)``,
computed for ALL k at once as ``einsum('nd,nm,n->md', Z, mask, u)`` —
the TPU analog of the reference's per-block OpenMP loops.
"""

import jax
import jax.numpy as jnp
import numpy as np

from .base import MatrixNaiveBase

_PRECISION = jax.lax.Precision.HIGHEST


class MatrixNaiveConvexGatedRelu(MatrixNaiveBase):
    def __init__(self, mat, mask, *, dtype=None):
        import scipy.sparse as sp

        if sp.issparse(mat):
            mat = np.asarray(mat.todense())
        mat = np.asarray(mat)
        mask = np.asarray(mask).astype(bool)
        if dtype is None:
            dtype = mat.dtype if mat.dtype in (np.float32, np.float64) else np.float64
        self.dtype = np.dtype(dtype)
        n, d = mat.shape
        assert mask.shape[0] == n
        m = mask.shape[1]
        self._rows = n
        self._d = d
        self._m = m
        self._cols = m * d
        self._Z = jnp.asarray(mat, self.dtype)
        self._mask = jnp.asarray(mask, self.dtype)

    def mul(self, v, w):
        f, data = self.mul_spec()
        return f(data, jnp.asarray(v), jnp.asarray(w))

    def mul_spec(self):
        def f(data, v, w):
            u = v * w
            out = jnp.einsum("nd,nm,n->md", data["Z"], data["mask"], u,
                             precision=_PRECISION)
            return out.reshape(-1)

        return f, {"Z": self._Z, "mask": self._mask}

    def gather(self, indices):
        idx = np.asarray(indices, np.int64)
        k = (idx // self._d).astype(np.int32)
        j = (idx % self._d).astype(np.int32)
        Zc = jnp.take(self._Z, jnp.asarray(j), axis=1)
        Mc = jnp.take(self._mask, jnp.asarray(k), axis=1)
        return Zc * Mc

    def tmul(self, beta):
        beta = jnp.asarray(beta, self.dtype)
        B = beta.reshape(self._m, self._d)
        # sum_k mask_k * (Z @ B_k)
        ZB = jnp.einsum("nd,md->nm", self._Z, B, precision=_PRECISION)
        return jnp.einsum("nm,nm->n", ZB, self._mask, precision=_PRECISION)

    def sq_mul(self, w):
        w = jnp.asarray(w)
        out = jnp.einsum("nd,nm,n->md", self._Z**2, self._mask, w,
                         precision=_PRECISION)
        return out.reshape(-1)


class MatrixNaiveConvexRelu(MatrixNaiveConvexGatedRelu):
    """X = [Y, -Y] (reference matrix_naive_convex_relu)."""

    def __init__(self, mat, mask, *, dtype=None):
        super().__init__(mat, mask, dtype=dtype)
        self._half = self._cols
        self._cols = 2 * self._half

    def mul(self, v, w):
        f, data = self.mul_spec()
        return f(data, jnp.asarray(v), jnp.asarray(w))

    def mul_spec(self):
        def f(data, v, w):
            u = v * w
            half = jnp.einsum("nd,nm,n->md", data["Z"], data["mask"], u,
                              precision=_PRECISION).reshape(-1)
            return jnp.concatenate([half, -half])

        return f, {"Z": self._Z, "mask": self._mask}

    def gather(self, indices):
        idx = np.asarray(indices, np.int64)
        sign = np.where(idx < self._half, 1.0, -1.0).astype(self.dtype)
        base = super().gather(idx % self._half)
        return base * jnp.asarray(sign)[None, :]

    def tmul(self, beta):
        beta = jnp.asarray(beta, self.dtype)
        eff = beta[: self._half] - beta[self._half:]
        return super().tmul(eff)

    def sq_mul(self, w):
        half = super().sq_mul(w)
        return jnp.concatenate([half, half])
