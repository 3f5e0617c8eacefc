"""Gaussian naive path solver (fast path, no IRLS).

TPU re-design of ``solver_gaussian_naive.hpp`` (fit :215-356, invariance
:377-392) on top of the covariance-form pin solver (see pin.py).  Per lambda:

1. (on screen-set change) gather screened columns, Gram + batched eigh
2. one jitted ``pin_cov_solve`` — the entire CD/active-set refinement
3. residual reconstruction ``resid -= X_s @ dbeta`` (one matmul)
4. invariance ``grad = X^T W resid - resid_sum * X_means`` (one matmul)
"""

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..configs import configs
from ..exceptions import MaxCDsError
from ..utils import Stopwatch, large_lmda
from .state_core import NaiveStateBase, resid_update_kernel
from .pin import pin_cov_solve


@dataclass
class GaussianNaiveState(NaiveStateBase):
    weights: object = None       # device (n,), sum to 1
    X_means: object = None       # device (p,)
    y_mean: float = 0.0
    y_var: float = 1.0
    rsq: float = 0.0
    resid: object = None         # device (n,)
    resid_sum: float = 0.0
    rsqs: list = None

    def __post_init__(self):
        super().__post_init__()
        if self.rsqs is None:
            self.rsqs = []


class GaussianNaiveDriver:
    def __init__(self, state: GaussianNaiveState):
        self.s = state

    def large_lmda(self):
        return large_lmda(self.s.dtype)

    def update_loss_null(self):
        pass  # gaussian loss_null is free (reference update_loss_null_f no-op)

    def _ensure_weighted(self, cache):
        if cache.A is None:
            cache.rebuild_weighted(self.s.weights, self.s.intercept)

    def fit(self, lmda):
        s = self.s
        sw = Stopwatch().start()
        cache = s.ensure_screen_cache()
        self._ensure_weighted(cache)

        dtype = s.dtype
        beta0_dev = cache.pad_screen_values(s.screen_beta, dtype)
        grad_s = jnp.where(
            cache.cols_padded >= 0,
            s.grad[jnp.maximum(cache.cols_padded, 0)],
            jnp.zeros((), dtype),
        )
        active0 = cache.pad_group_bools(s.screen_is_active)

        beta, grad_s_new, active, rsq, iters, done = pin_cov_solve(
            cache.A,
            grad_s,
            beta0_dev,
            cache.slot_begin,
            cache.slot_size,
            cache.eigvals,
            cache.eigvecs,
            cache.penalty_slots,
            active0,
            jnp.asarray(lmda, dtype),
            jnp.asarray(s.alpha, dtype),
            jnp.asarray(s.tol, dtype),
            jnp.asarray(configs.dbeta_tol, dtype),
            jnp.asarray(s.newton_tol, dtype),
            jnp.asarray(s.newton_max_iters, jnp.int32),
            jnp.asarray(s.max_iters, jnp.int32),
            jnp.asarray(s.rsq, dtype),
        )
        if not bool(done):
            raise MaxCDsError()

        dbeta = beta - beta0_dev
        s.resid, resid_sum = resid_update_kernel(s.resid, cache.Xs, dbeta, s.weights)
        s.resid_sum = float(resid_sum)
        s.screen_beta = np.asarray(beta)[: cache.S_val].copy()
        s.screen_is_active = np.asarray(active)[: len(s.screen_set)].copy()
        s.rsq = float(rsq)
        return sw.elapsed()

    def update_invariance(self, lmda):
        s = self.s
        grad = s.X.mul(s.resid, s.weights)
        if s.intercept:
            grad = grad - jnp.asarray(s.resid_sum, s.dtype) * s.X_means
        s.grad = grad
        s.lmda = lmda
        s.update_abs_grad(lmda)

    def update_solutions(self, lmda):
        s = self.s
        cache = s.ensure_screen_cache()
        nz = np.abs(s.screen_beta) > 0
        beta_row = sp.csr_matrix(
            (s.screen_beta[nz], (np.zeros(nz.sum(), int), cache.cols[nz])),
            shape=(1, s.p),
        )
        s.betas.append(beta_row)
        s.intercepts.append(
            float(s.intercept) * (s.y_mean + s.resid_sum) if s.intercept else 0.0
        )
        s.lmdas.append(lmda)
        s.rsqs.append(s.rsq)
        s.devs.append(s.rsq / s.y_var if s.y_var > 0 else 0.0)
