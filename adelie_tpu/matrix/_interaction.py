"""Implicit pairwise-interaction expansion (reference
matrix_naive_interaction.{hpp,ipp}; factory + full math matrix.py:721-920).

Every expanded column is a product of two "terms", each one of
{constant 1, identity Z_f, indicator 1{Z_f == level}}.  The host
precomputes per-column descriptors (feature, kind, level) x 2; all ops are
then vectorized ``where``-selected products — ``gather`` builds any column
subset in one fused expression, and ``mul``/``tmul``/``sq_mul`` stream the
expansion in column chunks so the full matrix never materializes.
"""

import jax
import jax.numpy as jnp
import numpy as np

from .base import MatrixNaiveBase

_PRECISION = jax.lax.Precision.HIGHEST

_KIND_ONE = 0
_KIND_ID = 1
_KIND_IND = 2


def build_pairs(d, intr_map):
    """Normalize the intr_map to unique valid pairs (reference
    matrix.py:877-907)."""
    if len(intr_map) <= 0:
        raise ValueError("intr_map must be non-empty.")
    arange_d = np.arange(d)
    keys = np.sort(list(intr_map.keys()))
    pairs_seen = set()
    pairs = []
    for key in keys:
        value_lst = intr_map[key]
        if value_lst is None:
            value_lst = arange_d
        else:
            value_lst = np.sort(np.unique(value_lst))
        for val in value_lst:
            if ((key, val) in pairs_seen or (val, key) in pairs_seen
                    or key == val):
                continue
            pairs.append((int(key), int(val)))
            pairs_seen.add((int(key), int(val)))
    if len(pairs) <= 0:
        raise ValueError("No valid pairs exist.")
    return np.asarray(pairs, int)


class MatrixNaiveInteractionDense(MatrixNaiveBase):
    def __init__(self, mat, intr_map, levels=None, *, dtype=None):
        mat = np.asarray(mat)
        if dtype is None:
            dtype = mat.dtype if mat.dtype in (np.float32, np.float64) else np.float64
        self.dtype = np.dtype(dtype)
        n, d = mat.shape
        if levels is None:
            levels = np.zeros(d, dtype=int)
        levels = np.asarray(levels, int)
        pairs = build_pairs(d, intr_map)

        f1, k1, l1 = [], [], []
        f2, k2, l2 = [], [], []
        group_starts = []
        pos = 0
        for (i, j) in pairs:
            Li, Lj = levels[i], levels[j]
            group_starts.append(pos)
            if Li <= 0 and Lj <= 0:
                # [Z_i, Z_j, Z_i * Z_j]
                f1 += [i, j, i]
                k1 += [_KIND_ID, _KIND_ID, _KIND_ID]
                l1 += [0, 0, 0]
                f2 += [i, j, j]
                k2 += [_KIND_ONE, _KIND_ONE, _KIND_ID]
                l2 += [0, 0, 0]
                pos += 3
            elif Li <= 0 < Lj:
                # [1, Z_i] star I_{Z_j}: for each level k, cols (1*I, Zi*I)
                for k in range(Lj):
                    for a in range(2):
                        f1.append(i)
                        k1.append(_KIND_ONE if a == 0 else _KIND_ID)
                        l1.append(0)
                        f2.append(j)
                        k2.append(_KIND_IND)
                        l2.append(k)
                pos += 2 * Lj
            elif Lj <= 0 < Li:
                # I_{Z_i} star [1, Z_j]: for each b in (1, Z_j), all levels
                for b in range(2):
                    for k in range(Li):
                        f1.append(i)
                        k1.append(_KIND_IND)
                        l1.append(k)
                        f2.append(j)
                        k2.append(_KIND_ONE if b == 0 else _KIND_ID)
                        l2.append(0)
                pos += 2 * Li
            else:
                # I_{Z_i} star I_{Z_j}
                for kj in range(Lj):
                    for ki in range(Li):
                        f1.append(i)
                        k1.append(_KIND_IND)
                        l1.append(ki)
                        f2.append(j)
                        k2.append(_KIND_IND)
                        l2.append(kj)
                pos += Li * Lj

        self._rows, self._cols = n, pos
        self.pairs = pairs
        self.levels = levels
        self.group_starts = np.asarray(group_starts, int)
        self._Z = jnp.asarray(mat, self.dtype)
        self._f1 = np.asarray(f1, np.int32)
        self._k1 = np.asarray(k1, np.int8)
        self._l1 = np.asarray(l1, np.int32)
        self._f2 = np.asarray(f2, np.int32)
        self._k2 = np.asarray(k2, np.int8)
        self._l2 = np.asarray(l2, np.int32)

    @property
    def groups(self):
        """Natural group starts (one group per pair), reference docs."""
        return self.group_starts

    def _term(self, Z, feats, kinds, lvls):
        Zc = jnp.take(Z, feats, axis=1)
        kinds = jnp.asarray(kinds)
        lvls = jnp.asarray(lvls.astype(self.dtype.type))
        ind = (Zc == lvls[None, :]).astype(self.dtype)
        return jnp.where(
            kinds[None, :] == _KIND_ONE,
            jnp.ones_like(Zc),
            jnp.where(kinds[None, :] == _KIND_ID, Zc, ind),
        )

    def gather(self, indices):
        idx = np.asarray(indices, np.int64)
        t1 = self._term(self._Z, jnp.asarray(self._f1[idx]), self._k1[idx],
                        self._l1[idx])
        t2 = self._term(self._Z, jnp.asarray(self._f2[idx]), self._k2[idx],
                        self._l2[idx])
        return t1 * t2

    def mul(self, v, w):
        f, data = self.mul_spec()
        return f(data, jnp.asarray(v), jnp.asarray(w))

    def mul_spec(self):
        CHUNK = 4096
        p = self._cols
        chunks = [
            (s, np.arange(s, min(s + CHUNK, p), dtype=np.int64))
            for s in range(0, p, CHUNK)
        ]
        metas = [
            (
                jnp.asarray(self._f1[idx]), jnp.asarray(self._k1[idx]),
                jnp.asarray(self._l1[idx].astype(self.dtype.type)),
                jnp.asarray(self._f2[idx]), jnp.asarray(self._k2[idx]),
                jnp.asarray(self._l2[idx].astype(self.dtype.type)),
            )
            for _, idx in chunks
        ]

        def term(Z, feats, kinds, lvls):
            Zc = jnp.take(Z, feats, axis=1)
            ind = (Zc == lvls[None, :]).astype(Zc.dtype)
            return jnp.where(
                kinds[None, :] == _KIND_ONE,
                jnp.ones_like(Zc),
                jnp.where(kinds[None, :] == _KIND_ID, Zc, ind),
            )

        def f(data, v, w):
            u = v * w
            outs = []
            for meta in data["metas"]:
                fa, ka, la, fb, kb, lb = meta
                blk = term(data["Z"], fa, ka, la) * term(data["Z"], fb, kb, lb)
                outs.append(jnp.einsum("nk,n->k", blk, u, precision=_PRECISION))
            return jnp.concatenate(outs)

        return f, {"Z": self._Z, "metas": metas}

    def tmul(self, beta):
        beta = jnp.asarray(beta, self.dtype)
        out = None
        for s, blk in self._chunked_cols():
            seg = beta[s:s + blk.shape[1]]
            term = blk @ seg
            out = term if out is None else out + term
        return out

    def mean(self, w):
        raise NotImplementedError(
            "interaction: mean() not implemented; provide centers to "
            "standardize (reference matrix_naive_interaction.ipp:813)."
        )

    def var(self, centers, w):
        raise NotImplementedError(
            "interaction: var() not implemented; provide scales to "
            "standardize (reference matrix_naive_interaction.ipp:827)."
        )
