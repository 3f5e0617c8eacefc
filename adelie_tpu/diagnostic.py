"""Diagnostics (reference adelie/diagnostic.py).

predict/objective/residuals/gradients/gradient_norms/gradient_scores/
coefficient + plot suite + Diagnostic classes.  All heavy products run on
device through the matrix protocol (``sp_tmul``/``mul``).
"""

from dataclasses import dataclass, field
from typing import Any

import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp

from . import matrix as matrix_mod
from .logger import logger


def _as_matrix(X):
    if isinstance(X, matrix_mod.MatrixNaiveBase):
        return X
    return matrix_mod.dense(np.asarray(X))


def predict(X, betas, intercepts, *, offsets=None, n_threads: int = 1):
    """Linear predictions (reference diagnostic.py:30).

    Returns (L, n) or (L, n, K) etas.
    """
    intercepts = np.atleast_1d(np.asarray(intercepts))
    is_multi = intercepts.ndim == 2
    if is_multi:
        K = intercepts.shape[1]
        Xm = matrix_mod.kronecker_eye(_as_matrix(X), K)
        n = Xm.rows() // K
        y_shape = (n, K)
    else:
        Xm = _as_matrix(X)
        n = Xm.rows()
        y_shape = (n,)

    if isinstance(betas, np.ndarray):
        betas = sp.csr_matrix(np.atleast_2d(betas))
    betas = sp.csr_matrix(betas)
    L = betas.shape[0]

    etas = np.asarray(Xm.sp_tmul(betas))  # (L, nK)
    etas = etas.reshape((L,) + y_shape)
    if is_multi:
        etas = etas + intercepts[:, None, :]
    else:
        etas = etas + intercepts[:, None]
    if offsets is not None:
        etas = etas + np.asarray(offsets)[None]
    return etas


def residuals(glm, etas):
    """-grad loss at each eta row (reference diagnostic.py:279)."""
    return np.stack([np.asarray(glm.gradient(jnp.asarray(e))) for e in etas])


def gradients(X, resids, *, n_threads: int = 1):
    """X^T resid per row (reference diagnostic.py:320)."""
    is_multi = resids.ndim == 3
    if is_multi:
        K = resids.shape[2]
        Xm = matrix_mod.kronecker_eye(_as_matrix(X), K)
        shape = (Xm.cols() // K, K)
    else:
        Xm = _as_matrix(X)
        shape = (Xm.cols(),)
    ones = jnp.ones((int(np.prod(resids.shape[1:])),), Xm.dtype)
    out = [
        np.asarray(Xm.mul(jnp.asarray(r.ravel(), Xm.dtype), ones)).reshape(shape)
        for r in resids
    ]
    return np.stack(out)


def _group_sizes(groups, p):
    return np.diff(np.concatenate([groups, [p]])).astype(int)


def objective(
    X, glm, betas, intercepts, lmdas, *,
    groups=None, alpha: float = 1.0, penalty=None, offsets=None,
    relative: bool = True, add_penalty: bool = True, n_threads: int = 1,
):
    """Group elastic net objective per path entry (reference
    diagnostic.py:124)."""
    etas = predict(X, betas, intercepts, offsets=offsets)
    is_multi = etas.ndim == 3
    Xm = _as_matrix(X)
    p = Xm.cols()
    if groups is None:
        groups = np.arange(p)
    groups = np.asarray(groups, int)
    if is_multi:
        K = etas.shape[2]
        groups_full = groups * K
        gs = _group_sizes(groups_full, p * K)
    else:
        groups_full = groups
        gs = _group_sizes(groups, p)
    if penalty is None:
        penalty = np.sqrt(gs)
    penalty = np.asarray(penalty, float)

    if isinstance(betas, np.ndarray):
        B = np.atleast_2d(betas)
    else:
        B = np.asarray(sp.csr_matrix(betas).todense())

    losses = np.array([float(glm.loss(jnp.asarray(
        e if not is_multi else e
    ))) for e in etas])
    if relative:
        lf = float(glm.loss_full())
        losses = losses - lf

    if not add_penalty:
        return losses

    reg = np.zeros(len(losses))
    for li in range(len(losses)):
        b = B[li]
        for g, (s, q) in enumerate(zip(groups_full, gs)):
            nrm = np.linalg.norm(b[s:s + q])
            reg[li] += penalty[g] * (alpha * nrm + 0.5 * (1 - alpha) * nrm**2)
    return losses + np.asarray(lmdas) * reg


def gradient_norms(grads, betas, duals, lmdas, *, constraints=None,
                   groups=None, alpha: float = 1.0, penalty=None):
    """||grad_g - l2 beta_g - A'mu_g||_2 per group per lambda (reference
    diagnostic.py:389)."""
    is_multi = grads.ndim == 3
    if is_multi:
        L, p, K = grads.shape
        if groups is None:
            groups = np.arange(p)
        groups = np.asarray(groups, int) * K
        gs = _group_sizes(groups, p * K)
    else:
        L, p = grads.shape
        if groups is None:
            groups = np.arange(p)
        groups = np.asarray(groups, int)
        gs = _group_sizes(groups, p)
    if penalty is None:
        penalty = np.sqrt(gs)
    penalty = np.asarray(penalty, float)
    pen_cols = np.repeat(penalty, gs)

    B = np.asarray(sp.csr_matrix(betas).todense()) if not isinstance(
        betas, np.ndarray) else np.atleast_2d(betas)
    G2 = grads.reshape(L, -1) - B * (
        np.asarray(lmdas)[:, None] * (1 - alpha) * pen_cols[None]
    )
    if constraints is not None:
        for li in range(L):
            for g, c in enumerate(constraints):
                if c is None:
                    continue
                s, q = groups[g], gs[g]
                G2[li, s:s + q] -= np.asarray(c.gradient(B[li, s:s + q]))

    out = np.zeros((L, len(groups)))
    for g, (s, q) in enumerate(zip(groups, gs)):
        out[:, g] = np.linalg.norm(G2[:, s:s + q], axis=1)
    return out


def gradient_scores(grad_norms, lmdas, *, alpha: float = 1.0, penalty=None):
    """Gradient scores  ||.|| / (alpha penalty) capped at lmda (reference
    diagnostic.py:523)."""
    penalty = np.asarray(penalty, float)
    with np.errstate(divide="ignore", invalid="ignore"):
        denom = alpha * penalty
        scores = np.where(
            denom[None] > 0, grad_norms / np.where(denom[None] <= 0, 1.0, denom[None]),
            np.asarray(lmdas)[:, None],
        )
    return scores


def coefficient(lmda, betas, intercepts, lmdas):
    """Path interpolation of coefficients at a new lambda (reference
    diagnostic.py:577)."""
    lmdas = np.asarray(lmdas)
    if len(lmdas) == 0:
        raise RuntimeError("lmdas must be non-empty!")
    betas = sp.csr_matrix(betas)
    intercepts = np.asarray(intercepts)
    if len(lmdas) == 1:
        return betas[0], intercepts[0]
    order = np.argsort(lmdas)
    idx = np.searchsorted(lmdas, lmda, sorter=order)
    idx = lmdas.shape[0] - idx
    if idx == 0 or idx == lmdas.shape[0]:
        logger.warning(
            "lmda is not within the range of the saved lambdas. "
            "Returning boundary solution."
        )
        idx = int(np.clip(idx, 0, lmdas.shape[0] - 1))
        return betas[idx], intercepts[idx]
    left, right = betas[idx - 1], betas[idx]
    weight = (lmda - lmdas[idx]) / (lmdas[idx - 1] - lmdas[idx])
    beta = left.multiply(weight) + right.multiply(1 - weight)
    intercept = weight * intercepts[idx - 1] + (1 - weight) * intercepts[idx]
    return sp.csr_matrix(beta), intercept


# --------------------------------------------------------------------------- #
# plots (reference diagnostic.py:649-1126)                                      #
# --------------------------------------------------------------------------- #


def plot_coefficients(betas, lmdas, groups=None, group_sizes=None):
    """Coefficient profile plot (reference diagnostic.py:649)."""
    import matplotlib.pyplot as plt

    B = np.asarray(sp.csr_matrix(betas).todense())
    ts = -np.log(np.asarray(lmdas))
    fig, ax = plt.subplots(figsize=(9, 6), layout="constrained")
    ax.plot(ts, B)
    ax.set_title("Coefficient Profile")
    ax.set_xlabel(r"$-\log(\lambda)$")
    ax.set_ylabel(r"$\beta$")
    return fig, ax


def plot_devs(lmdas, devs):
    """Deviance-explained plot (reference diagnostic.py:717)."""
    import matplotlib.pyplot as plt

    ts = -np.log(np.asarray(lmdas))
    fig, ax = plt.subplots(figsize=(9, 6), layout="constrained")
    ax.plot(ts, devs, linestyle="-", color="r", marker=".")
    ax.set_title("Deviance Profile")
    ax.set_xlabel(r"$-\log(\lambda)$")
    ax.set_ylabel("Deviance Explained (%)")
    return fig, ax


def plot_set_sizes(state):
    """Screen/active set size plot (reference diagnostic.py:745)."""
    import matplotlib.pyplot as plt

    ts = -np.log(np.asarray(state.lmdas))
    fig, ax = plt.subplots(figsize=(9, 6), layout="constrained")
    m = min(len(ts), len(state.screen_sizes), len(state.active_sizes))
    ax.plot(ts[:m], state.screen_sizes[:m], label="screen", marker=".")
    ax.plot(ts[:m], state.active_sizes[:m], label="active", marker=".")
    ax.legend()
    ax.set_title("Set Size Profile")
    ax.set_xlabel(r"$-\log(\lambda)$")
    ax.set_ylabel("Number of Groups")
    return fig, ax


def plot_benchmark(state):
    """Per-phase timing plot (reference diagnostic.py:861)."""
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(9, 6), layout="constrained")
    for phase, times in state.benchmark.items():
        if len(times):
            vals = [t if np.isscalar(t) else float(np.sum(t)) for t in times]
            ax.plot(vals, marker=".", label=phase)
    ax.legend()
    ax.set_title("Benchmark Profile")
    ax.set_xlabel("Iteration")
    ax.set_ylabel("Time (s)")
    return fig, ax


def plot_kkt(lmdas, scores, idx=None):
    """KKT scores vs lambda threshold (reference diagnostic.py:991)."""
    import matplotlib.pyplot as plt

    lmdas = np.asarray(lmdas)
    ts = -np.log(lmdas)
    fig, ax = plt.subplots(figsize=(9, 6), layout="constrained")
    if idx is None:
        relative = scores / lmdas[:, None] - 1
        ax.plot(ts, relative, linestyle="None", marker=".", color="b")
        ax.axhline(0, color="r", linestyle="--")
        ax.set_ylabel(r"$s_g / \lambda - 1$")
    else:
        ax.plot(ts, scores[:, idx], marker=".")
        ax.plot(ts, lmdas, color="r", linestyle="--", label=r"$\lambda$")
        ax.legend()
        ax.set_ylabel("score")
    ax.set_title("KKT Failure Check")
    ax.set_xlabel(r"$-\log(\lambda)$")
    return fig, ax


# --------------------------------------------------------------------------- #
# Diagnostic classes (reference diagnostic.py:1126-1415)                        #
# --------------------------------------------------------------------------- #


@dataclass
class DiagnosticNaive:
    """Diagnostic suite for naive-method states (reference
    diagnostic.py:1248)."""

    state: Any

    def __post_init__(self):
        s = self.state
        self.lmdas = np.asarray(s.lmdas)
        self.betas = s.betas
        self.intercepts = np.asarray(s.intercepts)
        glm = getattr(s, "glm", None)
        self._glm = glm
        self._X = s.X

    def predict(self):
        offs = getattr(self.state, "offsets", None)
        offs = None if offs is None else np.asarray(offs)
        return predict(self._X, self.betas, self.intercepts, offsets=offs)

    def residuals(self, etas=None):
        if self._glm is None:
            raise RuntimeError("state has no GLM (gaussian fast path); "
                               "construct residuals from predict() directly")
        etas = self.predict() if etas is None else etas
        return residuals(self._glm, etas)

    def gradients(self, resids=None):
        if resids is None:
            resids = self.residuals()
        return gradients(self._X, resids)

    def gradient_norms(self, grads=None, **kwargs):
        s = self.state
        if grads is None:
            grads = self.gradients()
        duals = getattr(s, "duals", None)
        return gradient_norms(
            grads, self.betas, duals, self.lmdas,
            groups=s.groups, alpha=s.alpha, penalty=s.penalty, **kwargs,
        )

    def gradient_scores(self, grad_norms=None):
        s = self.state
        if grad_norms is None:
            grad_norms = self.gradient_norms()
        return gradient_scores(grad_norms, self.lmdas, alpha=s.alpha,
                               penalty=s.penalty)

    def plot_coefficients(self):
        return plot_coefficients(self.betas, self.lmdas)

    def plot_devs(self):
        return plot_devs(self.lmdas, np.asarray(self.state.devs))

    def plot_set_sizes(self):
        return plot_set_sizes(self.state)

    def plot_benchmark(self):
        return plot_benchmark(self.state)

    def plot_kkt(self, idx=None):
        return plot_kkt(self.lmdas, self.gradient_scores(), idx=idx)


@dataclass
class DiagnosticCov:
    """Diagnostic suite for covariance-method states (reference
    diagnostic.py:1126)."""

    state: Any

    def __post_init__(self):
        s = self.state
        self.lmdas = np.asarray(s.lmdas)
        self.betas = s.betas

    def gradients(self):
        s = self.state
        B = np.asarray(sp.csr_matrix(self.betas).todense())
        out = np.zeros_like(B)
        cols = np.arange(s.p)
        for li in range(B.shape[0]):
            out[li] = np.asarray(s.v) - np.asarray(s.A.mul(cols, B[li]))
        return out

    def gradient_norms(self, grads=None):
        s = self.state
        if grads is None:
            grads = self.gradients()
        return gradient_norms(grads, self.betas, None, self.lmdas,
                              groups=s.groups, alpha=s.alpha,
                              penalty=s.penalty)

    def gradient_scores(self):
        s = self.state
        return gradient_scores(self.gradient_norms(), self.lmdas,
                               alpha=s.alpha, penalty=s.penalty)

    def plot_coefficients(self):
        return plot_coefficients(self.betas, self.lmdas)

    def plot_devs(self):
        return plot_devs(self.lmdas, np.asarray(self.state.devs))

    def plot_set_sizes(self):
        return plot_set_sizes(self.state)

    def plot_benchmark(self):
        return plot_benchmark(self.state)

    def plot_kkt(self, idx=None):
        return plot_kkt(self.lmdas, self.gradient_scores(), idx=idx)


def diagnostic(state):
    """Dispatcher (reference diagnostic.py:1393)."""
    if hasattr(state, "A") and getattr(state, "X", None) is None:
        return DiagnosticCov(state)
    return DiagnosticNaive(state)
