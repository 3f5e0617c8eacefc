"""Gaussian naive path solver (fast path, no IRLS).

TPU re-design of ``solver_gaussian_naive.hpp`` (fit :215-356, invariance
:377-392) on top of the covariance-form pin solver (see pin.py).  Per lambda
the ENTIRE iteration — screen gradient, pin solve, residual reconstruction,
invariance gradient, abs_grad, KKT verdict — is one fused jitted device call
(fused.py) with a single host pull, because the host<->device round trip is
the dominant warm-path cost on a tunneled TPU.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..configs import configs
from ..exceptions import MaxCDsError
from ..utils import Stopwatch, large_lmda
from .fused import get_gaussian_step
from .state_core import NaiveStateBase


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
        self._step = get_gaussian_step(
            state.X, state.intercept, len(state.groups)
        )
        self._X_data = state.X.mul_spec()[1]
        self._is_screen_dev = None
        self._is_screen_version = -1
        self._penalty_groups_dev = jnp.asarray(
            state.penalty.astype(state.dtype)
        )

    def large_lmda(self):
        return large_lmda(self.s.dtype)

    def update_loss_null(self):
        pass  # gaussian loss_null is free (reference update_loss_null_f no-op)

    def _screen_mask(self):
        s = self.s
        if self._is_screen_version != s._screen_version:
            m = np.zeros(len(s.groups), bool)
            m[s.screen_set] = True
            self._is_screen_dev = jnp.asarray(m)
            self._is_screen_version = s._screen_version
        return self._is_screen_dev

    def fit(self, lmda):
        s = self.s
        sw = Stopwatch().start()
        cache = s.ensure_screen_cache()
        if cache.A is None:
            cache.rebuild_weighted(s.weights, s.intercept)

        dtype = s.dtype
        beta0_dev = cache.pad_screen_values(s.screen_beta, dtype)
        active0 = cache.pad_group_bools(s.screen_is_active)

        out = self._step(
            self._X_data,
            cache.A, cache.Xs, cache.means_s, cache.cols_padded,
            cache.slot_begin, cache.slot_size, cache.eigvals, cache.eigvecs,
            cache.penalty_slots,
            beta0_dev, active0,
            s.resid, s.weights, s.X_means,
            s._group_ids, s._penalty_cols, self._penalty_groups_dev,
            self._screen_mask(),
            jnp.asarray(lmda, dtype), jnp.asarray(s.alpha, dtype),
            jnp.asarray(s.tol, dtype), jnp.asarray(configs.dbeta_tol, dtype),
            jnp.asarray(s.newton_tol, dtype),
            jnp.asarray(s.newton_max_iters, jnp.int32),
            jnp.asarray(s.max_iters, jnp.int32),
            jnp.asarray(s.rsq, dtype),
        )
        (beta, active, rsq, resid_new, resid_sum, grad, abs_grad,
         kkt_passed, iters, done) = out

        # ONE host pull for the small outputs; resid/grad stay on device
        beta_h, active_h, rsq_h, rs_h, ag_h, kkt_h, done_h = jax.device_get(
            (beta, active, rsq, resid_sum, abs_grad, kkt_passed, done)
        )
        if not bool(done_h):
            raise MaxCDsError()

        s.resid = resid_new
        s.grad = grad
        s.resid_sum = float(rs_h)
        s.screen_beta = np.asarray(beta_h)[: cache.S_val].copy()
        s.screen_is_active = np.asarray(active_h)[: len(s.screen_set)].copy()
        s.rsq = float(rsq_h)
        s.abs_grad = np.asarray(ag_h)
        self._last_kkt = bool(kkt_h)
        return sw.elapsed()

    def update_invariance(self, lmda):
        # folded into the fused fit step; only record lambda
        self.s.lmda = lmda

    def kkt(self, lmda):
        return self._last_kkt

    def update_solutions(self, lmda):
        s = self.s
        cache = s.ensure_screen_cache()
        nz = np.abs(s.screen_beta) > 0
        beta_row = sp.csr_matrix(
            (s.screen_beta[nz], (np.zeros(int(nz.sum()), int), cache.cols[nz])),
            shape=(1, s.p),
        )
        s.betas.append(beta_row)
        s.intercepts.append(
            float(s.intercept) * (s.y_mean + s.resid_sum) if s.intercept else 0.0
        )
        s.lmdas.append(lmda)
        s.rsqs.append(s.rsq)
        s.devs.append(s.rsq / s.y_var if s.y_var > 0 else 0.0)
