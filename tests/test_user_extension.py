"""User-extension parity: custom matrices and GLMs driven end-to-end.

The reference's flagship extensibility story is Python subclasses of the
matrix/GLM bases dispatched through pybind trampolines
(py_matrix.cpp:627-830; its tests/test_matrix.py drives user matrices
everywhere).  Here the contract is "implement the protocol with jittable
callables" (SURVEY.md section 3.5) — these tests subclass
``MatrixNaiveBase``/``GlmBase`` from scratch and push them through
``grpnet``/``cv_grpnet``, checking against dense oracles.  The tracing
constraints a user must obey are documented in docs/extending.md.
"""

import numpy as np
import jax
import jax.numpy as jnp

import adelie_tpu as ad
from adelie_tpu.glm import GlmBase
from adelie_tpu.matrix.base import MatrixNaiveBase


class ScaledDense(MatrixNaiveBase):
    """User matrix: an implicitly column-scaled dense matrix X = M @ diag(s).

    Demonstrates the protocol: payload arrays travel through ``mul_spec``'s
    data pytree (NOT closed over), and every method returns jax arrays.
    """

    def __init__(self, M, scales):
        self._M = jnp.asarray(M)
        self._s = jnp.asarray(scales, self._M.dtype)
        self._rows, self._cols = M.shape
        self.dtype = np.dtype(self._M.dtype)

    def mul_spec(self):
        def f(data, v, w):
            return data["s"] * (data["M"].T @ (v * w))

        return f, {"M": self._M, "s": self._s}

    def gather(self, indices):
        idx = jnp.asarray(np.asarray(indices, np.int32))
        return self._M[:, idx] * self._s[idx][None, :]

    def tmul(self, beta):
        beta = jnp.asarray(beta, self.dtype)
        return self._M @ (self._s * beta)


class GlmLogCosh(GlmBase):
    """User GLM: robust log-cosh regression loss sum_i w_i log cosh(eta-y).

    gradient returns the NEGATIVE loss gradient (the 'residual', reference
    glm_base.hpp:65-92); hessian is the diagonal upper bound w * sech^2.
    """

    def __init__(self, y, weights=None, dtype=None):
        dtype = dtype or np.asarray(y).dtype
        super().__init__("logcosh", y, weights, dtype)

    def gradient(self, eta):
        return -self.weights * jnp.tanh(eta - self.y)

    def hessian(self, eta, grad):
        t = jnp.tanh(eta - self.y)
        return self.weights * (1.0 - t * t)

    def loss(self, eta):
        return jnp.sum(self.weights * jnp.logcosh(eta - self.y)) \
            if hasattr(jnp, "logcosh") else jnp.sum(
                self.weights * (jnp.abs(eta - self.y)
                                + jnp.log1p(jnp.exp(-2 * jnp.abs(eta - self.y)))
                                - jnp.log(2.0)))

    def loss_full(self):
        return jnp.zeros((), self.dtype)

    def inv_link(self, eta):
        return eta


def test_user_matrix_interface_vs_dense():
    """Every protocol method of a user matrix against the dense oracle
    (the reference's test_matrix.py pattern)."""
    rng = np.random.default_rng(0)
    n, p = 60, 17
    M = rng.standard_normal((n, p))
    s = rng.uniform(0.5, 2.0, p)
    X = ScaledDense(M, s)
    D = M * s[None, :]
    v = rng.standard_normal(n)
    w = rng.uniform(0.1, 1.0, n)
    w /= w.sum()
    np.testing.assert_allclose(np.asarray(X.mul(v, w)), D.T @ (w * v),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(X.tmul(np.arange(p) * 0.1)),
                               D @ (np.arange(p) * 0.1), atol=1e-12)
    np.testing.assert_allclose(np.asarray(X.gather(np.asarray([3, 11]))),
                               D[:, [3, 11]], atol=1e-12)
    np.testing.assert_allclose(np.asarray(X.sq_mul(w)), (D * D).T @ w,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(X.cmul(4, v, w)),
                               D[:, 4] @ (w * v), atol=1e-12)
    np.testing.assert_allclose(np.asarray(X.bmul(2, 5, v, w)),
                               D[:, 2:7].T @ (w * v), atol=1e-12)
    np.testing.assert_allclose(np.asarray(X.btmul(2, 5, np.ones(5))),
                               D[:, 2:7] @ np.ones(5), atol=1e-12)
    sw = np.sqrt(w)
    np.testing.assert_allclose(
        np.asarray(X.cov(1, 4, sw)),
        (D[:, 1:5] * w[:, None]).T @ D[:, 1:5], atol=1e-12,
    )
    np.testing.assert_allclose(np.asarray(X.mean(w)), D.T @ w, atol=1e-12)
    import scipy.sparse as sp

    B = sp.random(3, p, density=0.3, random_state=1, format="csr")
    np.testing.assert_allclose(np.asarray(X.sp_tmul(B)),
                               B.toarray() @ D.T, atol=1e-12)


def test_user_matrix_grpnet_end_to_end():
    """grpnet through a user matrix == grpnet on the equivalent ndarray."""
    rng = np.random.default_rng(1)
    n, p = 200, 40
    M = rng.standard_normal((n, p))
    s = rng.uniform(0.5, 2.0, p)
    y = (M * s)[:, :3] @ np.asarray([1.0, -1.0, 0.5]) \
        + 0.2 * rng.standard_normal(n)
    st_u = ad.grpnet(ScaledDense(M, s), ad.glm.gaussian(y),
                     lmda_path_size=15, min_ratio=0.05, progress_bar=False)
    st_d = ad.grpnet(M * s[None, :], ad.glm.gaussian(y),
                     lmda_path_size=15, min_ratio=0.05, progress_bar=False)
    assert st_u.error == "" and st_d.error == ""
    np.testing.assert_allclose(
        np.asarray(st_u.betas.todense()), np.asarray(st_d.betas.todense()),
        atol=1e-9,
    )
    # grouped + elastic net through BASIL screening
    from adelie_tpu.configs import set_configs

    try:
        set_configs("screen_all_max", 0)
        groups = np.arange(0, p, 4)
        s1 = ad.grpnet(ScaledDense(M, s), ad.glm.gaussian(y), groups=groups,
                       alpha=0.6, lmda_path_size=10, progress_bar=False)
        s2 = ad.grpnet(M * s[None, :], ad.glm.gaussian(y), groups=groups,
                       alpha=0.6, lmda_path_size=10, progress_bar=False)
    finally:
        set_configs("screen_all_max", None)
    np.testing.assert_allclose(
        np.asarray(s1.betas.todense()), np.asarray(s2.betas.todense()),
        atol=1e-9,
    )


def test_user_glm_grpnet_end_to_end():
    """grpnet IRLS over a user-defined GLM; KKT certificate in f64 numpy."""
    rng = np.random.default_rng(2)
    n, p = 300, 25
    X = rng.standard_normal((n, p))
    y = X[:, 0] - 0.5 * X[:, 1] + 0.3 * rng.standard_normal(n)
    glm = GlmLogCosh(y)
    st = ad.grpnet(X, glm, lmda_path_size=12, min_ratio=0.1,
                   intercept=False, progress_bar=False)
    assert st.error == ""
    assert len(st.lmdas) > 3
    B = np.asarray(st.betas.todense())
    assert (B[-1] != 0).any()
    # f64 KKT at every solution: |X_j^T w tanh(Xb - y)| <= lmda (inactive),
    # ~= lmda at active coordinates
    w = np.full(n, 1.0 / n)
    worst = 0.0
    for i, lm in enumerate(st.lmdas):
        r = -w * np.tanh(X @ B[i] - y)
        g = X.T @ r
        for j in range(p):
            if B[i, j] != 0:
                worst = max(worst, abs(abs(g[j]) - lm) / lm)
            else:
                worst = max(worst, max(abs(g[j]) - lm, 0.0) / lm)
    assert worst < 5e-4, worst


def test_user_glm_cv():
    """User GLMs run through CV via the serial reweight path."""
    rng = np.random.default_rng(3)
    n, p = 150, 10
    X = rng.standard_normal((n, p))
    y = X[:, 0] + 0.3 * rng.standard_normal(n)
    res = ad.cv_grpnet(X, GlmLogCosh(y), n_folds=3, seed=0,
                       lmda_path_size=6, fold_batch=False, intercept=False)
    assert np.isfinite(res.losses).all()
    assert res.losses.shape == (3, 6)
