"""Sparse matrices (reference matrix_naive_sparse.{hpp,ipp},
matrix_cov_sparse.{hpp,ipp}; factory matrix.py:1301).

TPU design: the matrix lives on device as a JAX BCOO (for the two big
products ``mul``/``tmul`` — XLA lowers them to gather/segment-sum) and on
host as scipy CSC (for screen-block densification, which is a host-side
structural operation anyway).
"""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from jax.experimental import sparse as jsparse

from .base import MatrixCovBase, MatrixNaiveBase

_PRECISION = jax.lax.Precision.HIGHEST


class MatrixNaiveSparse(MatrixNaiveBase):
    def __init__(self, mat, *, dtype=None):
        mat = sp.csc_matrix(mat)
        if dtype is None:
            dtype = mat.dtype if mat.dtype in (np.float32, np.float64) else np.float64
        self.dtype = np.dtype(dtype)
        self._rows, self._cols = mat.shape
        self._csc = mat.astype(self.dtype)
        coo = mat.tocoo()
        idx = np.stack([coo.row, coo.col], axis=1).astype(np.int32)
        self._bcoo = jsparse.BCOO(
            (jnp.asarray(coo.data, self.dtype), jnp.asarray(idx)),
            shape=(self._rows, self._cols),
        )

    def mul(self, v, w):
        f, data = self.mul_spec()
        return f(data, jnp.asarray(v), jnp.asarray(w))

    def mul_spec(self):
        def f(data, v, w):
            return data["mat"].T @ (v * w)

        return f, {"mat": self._bcoo}

    def gather(self, indices):
        idx = np.asarray(indices, np.int64)
        blk = np.asarray(self._csc[:, idx].todense())
        return jnp.asarray(blk, self.dtype)

    def tmul(self, beta):
        return self._bcoo @ jnp.asarray(beta, self.dtype)

    def sq_mul(self, w):
        sq = self._csc.copy()
        sq.data = sq.data**2
        return jnp.asarray(sq.T @ np.asarray(w), self.dtype)


class MatrixCovSparse(MatrixCovBase):
    """Sparse PSD matrix (reference matrix_cov_sparse)."""

    def __init__(self, mat, *, dtype=None):
        mat = sp.csc_matrix(mat)
        if dtype is None:
            dtype = mat.dtype if mat.dtype in (np.float32, np.float64) else np.float64
        self.dtype = np.dtype(dtype)
        assert mat.shape[0] == mat.shape[1]
        self._cols = mat.shape[0]
        self._csc = mat.astype(self.dtype)

    def block(self, rows, cols):
        sub = self._csc[:, np.asarray(cols, np.int64)].tocsr()
        sub = sub[np.asarray(rows, np.int64), :]
        return jnp.asarray(np.asarray(sub.todense()), self.dtype)

    def mul(self, indices, values):
        idx = np.asarray(indices, np.int64)
        out = self._csc[:, idx] @ np.asarray(values, self.dtype)
        return jnp.asarray(np.asarray(out).ravel(), self.dtype)
