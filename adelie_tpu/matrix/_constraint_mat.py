"""Constraint matrices (reference matrix_constraint_{dense,sparse}.{hpp,ipp};
factories matrix.dense/sparse(method="constraint")).

These carry the ``A`` of linear constraints and the pinball solver.  The
functional protocol (MatrixConstraintBase, base.py) defaults everything
through ``dense()``; the sparse variant keeps a scipy CSR on host for
row access plus a dense device copy for the products (constraint matrices
are small: m x group-size).
"""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from .base import MatrixConstraintBase


class MatrixConstraintDense(MatrixConstraintBase):
    def __init__(self, mat, *, dtype=None):
        mat = np.asarray(mat)
        if dtype is None:
            dtype = mat.dtype if mat.dtype in (np.float32, np.float64) else np.float64
        self.dtype = np.dtype(dtype)
        self._rows, self._cols = mat.shape
        self._mat = jnp.asarray(mat, self.dtype)

    def dense(self):
        return self._mat


class MatrixConstraintSparse(MatrixConstraintBase):
    def __init__(self, mat, *, dtype=None):
        mat = sp.csr_matrix(mat)
        if dtype is None:
            dtype = mat.dtype if mat.dtype in (np.float32, np.float64) else np.float64
        self.dtype = np.dtype(dtype)
        self._rows, self._cols = mat.shape
        self._csr = mat.astype(self.dtype)
        self._mat = jnp.asarray(np.asarray(mat.todense()), self.dtype)

    def dense(self):
        return self._mat
