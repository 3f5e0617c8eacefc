"""GLM naive path solver — proximal Newton (IRLS) outer loop.

TPU re-design of ``solver_glm_naive.hpp`` (fit :241-459, update_loss_null
:166-232): per IRLS iteration the working weights change, so the screen
Gram + batched eigendecompositions are recomputed from the *cached gathered
block* (one MXU matmul — the analog of the reference recomputing per-group
``X.cov`` + eigh under new weights, :361-385), then one jitted covariance-
form pin solve advances the screen coefficients.  Exception-safe rollback
(save/load_prev_valid, :315-322) is preserved.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..configs import configs
from ..exceptions import MaxCDsError, SolverError
from ..utils import Stopwatch, large_lmda
from .pin import pin_cov_solve, screen_eigh, screen_gram
from .state_core import NaiveStateBase, resid_update_kernel, screen_grad_kernel

_PRECISION = jax.lax.Precision.HIGHEST


@dataclass
class GlmNaiveState(NaiveStateBase):
    glm: object = None
    offsets: object = None       # device (n_flat,)
    beta0: float = 0.0
    eta: object = None           # device (n_flat,)
    resid: object = None         # device (n_flat,) = glm.gradient(eta)
    loss_null: float = None
    loss_full: float = None
    irls_max_iters: int = int(1e4)
    irls_tol: float = 1e-7
    setup_loss_null: bool = True


def _hessian_floor(hess, dtype):
    hmin = (
        configs.hessian_min
        if np.dtype(dtype) == np.float64
        else configs.hessian_min_f32
    )
    return jnp.maximum(hess, 0.0) + hmin * (hess <= 0)


class GlmNaiveDriver:
    def __init__(self, state: GlmNaiveState):
        self.s = state
        self._is_screen_dev = None
        self._is_screen_version = -1
        self._penalty_groups_dev = jnp.asarray(
            state.penalty.astype(state.dtype)
        )
        self._last_kkt = None
        self._last_loss = None

    def large_lmda(self):
        return large_lmda(self.s.dtype)

    def _screen_mask(self):
        s = self.s
        if self._is_screen_version != s._screen_version:
            m = np.zeros(len(s.groups), bool)
            m[s.screen_set] = True
            self._is_screen_dev = jnp.asarray(m)
            self._is_screen_version = s._screen_version
        return self._is_screen_dev

    # -- intercept-only IRLS for loss_null (reference :166-232) ------------ #
    def update_loss_null(self):
        s = self.s
        if not s.setup_loss_null or s.loss_null is not None:
            return
        glm = s.glm
        if not s.intercept:
            s.loss_null = float(glm.loss(s.offsets))
            return
        beta0 = s.beta0
        eta = s.eta
        resid = s.resid
        for it in range(s.irls_max_iters):
            grad = resid
            hess = _hessian_floor(glm.hessian(eta, grad), s.dtype)
            irls_y_work = glm.inv_hessian_gradient(eta, grad, hess)
            hess_sum = jnp.sum(hess)
            beta0 = float(jnp.sum(hess * (irls_y_work + eta - s.offsets)) / hess_sum)
            eta_prev, resid_prev = eta, resid
            eta = beta0 + s.offsets
            resid = glm.gradient(eta)
            crit = float(jnp.abs(jnp.sum((resid - resid_prev) * (eta - eta_prev))))
            if crit <= s.irls_tol:
                s.loss_null = float(glm.loss(eta))
                return
        raise SolverError("Maximum IRLS iterations reached (loss_null).")

    # -- proximal-Newton fit at one lambda (reference :241-459) ------------ #
    def fit(self, lmda):
        """Fused path: the whole IRLS fit + invariance + KKT is ONE device
        call (glm_fused.py); a single host pull of small outputs."""
        from .glm_fused import get_glm_step

        s = self.s
        glm = s.glm
        dtype = s.dtype
        sw = Stopwatch().start()
        cache = s.ensure_screen_cache()

        saved_beta = s.screen_beta.copy()
        saved_active = s.screen_is_active.copy()

        step = get_glm_step(
            glm, s.X, s.intercept, len(s.groups), cache.qmax, dtype
        )
        X_data = s.X.mul_spec()[1]
        beta0_dev = cache.pad_screen_values(s.screen_beta, dtype)
        active0 = cache.pad_group_bools(s.screen_is_active)
        tol_base = s.tol * (s.loss_null - s.loss_full)

        out = step(
            X_data,
            cache.Xs, cache.cols_padded, cache.slot_begin, cache.slot_size,
            cache.penalty_slots,
            beta0_dev, active0,
            s.eta, s.resid, jnp.asarray(s.beta0, dtype), s.offsets,
            s._group_ids, s._penalty_cols, self._penalty_groups_dev,
            self._screen_mask(),
            jnp.asarray(lmda, dtype), jnp.asarray(s.alpha, dtype),
            jnp.asarray(tol_base, dtype),
            jnp.asarray(s.irls_tol, dtype),
            jnp.asarray(s.irls_max_iters, jnp.int32),
            jnp.asarray(configs.dbeta_tol, dtype),
            jnp.asarray(s.newton_tol, dtype),
            jnp.asarray(s.newton_max_iters, jnp.int32),
            jnp.asarray(s.max_iters, jnp.int32),
        )
        (beta, active, eta, resid, b0, grad, abs_grad, kkt_passed,
         loss, irls_iters, converged, pin_ok) = out

        beta_h, active_h, b0_h, ag_h, kkt_h, loss_h, conv_h, ok_h = (
            jax.device_get((beta, active, b0, abs_grad, kkt_passed, loss,
                            converged, pin_ok))
        )
        if not bool(ok_h):
            s.screen_beta = saved_beta
            s.screen_is_active = saved_active
            raise MaxCDsError()
        if not bool(conv_h):
            s.screen_beta = saved_beta
            s.screen_is_active = saved_active
            raise SolverError("Maximum IRLS iterations reached.")

        s.screen_beta = np.asarray(beta_h)[: cache.S_val].copy()
        s.screen_is_active = np.asarray(active_h)[: len(s.screen_set)].copy()
        s.eta = eta
        s.resid = resid
        s.beta0 = float(b0_h)
        s.grad = grad
        s.abs_grad = np.asarray(ag_h)
        self._last_kkt = bool(kkt_h)
        self._last_loss = float(loss_h)
        return sw.elapsed()

    def _fit_unfused(self, lmda):
        s = self.s
        glm = s.glm
        dtype = s.dtype
        sw = Stopwatch().start()
        cache = s.ensure_screen_cache()

        saved_beta = s.screen_beta.copy()
        saved_active = s.screen_is_active.copy()

        eta = s.eta
        resid = s.resid
        beta0 = s.beta0

        try:
            for irls_it in range(s.irls_max_iters):
                grad_n = resid
                hess = _hessian_floor(glm.hessian(eta, grad_n), dtype)
                irls_resid = glm.inv_hessian_gradient(eta, grad_n, hess)
                hess_sum = jnp.sum(hess)
                irls_weights = hess / hess_sum
                irls_y = irls_resid + eta - s.offsets
                y_mean = jnp.sum(irls_weights * irls_y)
                y_var = jnp.sum(irls_weights * irls_y**2) - (
                    y_mean**2 if s.intercept else 0.0
                )
                if s.intercept:
                    irls_resid = irls_resid + (beta0 - y_mean)
                resid_sum = jnp.sum(irls_weights * irls_resid)
                lmda_adj = lmda / float(hess_sum)

                # recompute weighted Gram + eigh under the new weights
                cache.rebuild_weighted(irls_weights, s.intercept)

                # centered working gradient on the screen block
                grad_s = screen_grad_kernel(
                    cache.Xs,
                    irls_weights * irls_resid,
                    cache.means_s if s.intercept else jnp.zeros_like(cache.means_s),
                    resid_sum,
                )

                beta0_dev = cache.pad_screen_values(s.screen_beta, dtype)
                active0 = cache.pad_group_bools(s.screen_is_active)
                tol_adj = s.tol * (s.loss_null - s.loss_full) / float(hess_sum)

                beta, _, active, _, iters, done = pin_cov_solve(
                    cache.A,
                    grad_s,
                    beta0_dev,
                    cache.slot_begin,
                    cache.slot_size,
                    cache.eigvals,
                    cache.eigvecs,
                    cache.penalty_slots,
                    active0,
                    jnp.asarray(lmda_adj, dtype),
                    jnp.asarray(s.alpha, dtype),
                    jnp.asarray(tol_adj, dtype),
                    jnp.asarray(configs.dbeta_tol, dtype),
                    jnp.asarray(s.newton_tol, dtype),
                    jnp.asarray(s.newton_max_iters, jnp.int32),
                    jnp.asarray(s.max_iters, jnp.int32),
                    jnp.zeros((), dtype),
                )
                if not bool(done):
                    raise MaxCDsError()

                dbeta = beta - beta0_dev
                irls_resid, resid_sum_new = resid_update_kernel(
                    irls_resid, cache.Xs, dbeta, irls_weights
                )
                s.screen_beta = np.asarray(beta)[: cache.S_val].copy()
                s.screen_is_active = np.asarray(active)[: len(s.screen_set)].copy()

                beta0_new = (
                    float(y_mean + resid_sum_new) if s.intercept else 0.0
                )

                eta_prev, resid_prev = eta, resid
                eta = irls_y + s.offsets - irls_resid
                if s.intercept:
                    eta = eta + (beta0_new - y_mean)
                resid = glm.gradient(eta)
                beta0 = beta0_new

                crit = float(jnp.abs(jnp.sum((resid - resid_prev) * (eta - eta_prev))))
                if crit <= s.irls_tol:
                    s.eta = eta
                    s.resid = resid
                    s.beta0 = beta0
                    return sw.elapsed()
            raise SolverError("Maximum IRLS iterations reached.")
        except Exception:
            s.screen_beta = saved_beta
            s.screen_is_active = saved_active
            raise

    def update_invariance(self, lmda):
        # grad/abs_grad are folded into the fused fit step; record lambda
        s = self.s
        s.lmda = lmda
        if self._last_kkt is None:  # unfused path (constrained driver)
            ones = jnp.ones((s.resid.shape[0],), s.dtype)
            s.grad = s.X.mul(s.resid, ones)
            s.update_abs_grad(lmda)

    def kkt(self, lmda):
        if self._last_kkt is not None:
            return self._last_kkt
        return self.s.kkt(lmda)

    def update_solutions(self, lmda):
        s = self.s
        cache = s.ensure_screen_cache()
        nz = np.abs(s.screen_beta) > 0
        beta_row = sp.csr_matrix(
            (s.screen_beta[nz], (np.zeros(nz.sum(), int), cache.cols[nz])),
            shape=(1, s.p),
        )
        s.betas.append(beta_row)
        s.intercepts.append(s.beta0 if s.intercept else 0.0)
        s.lmdas.append(lmda)
        loss = (
            self._last_loss if self._last_loss is not None
            else float(s.glm.loss(s.eta))
        )
        s.devs.append((s.loss_null - loss) / (s.loss_null - s.loss_full))
