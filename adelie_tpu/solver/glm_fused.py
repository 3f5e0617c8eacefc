"""Fused per-lambda GLM (IRLS) device step.

The unfused GLM driver (glm_driver.py) syncs the host several times per
IRLS iteration (hess_sum, convergence criterion, done flag) — hundreds of
tunnel round trips per path on a remote TPU.  This step runs the ENTIRE
proximal-Newton fit at one lambda — IRLS reweighting, screen Gram +
eigendecomposition refresh, covariance-form pin solve, working-residual
update, convergence check — as ONE jitted ``lax.while_loop``, then folds in
the invariance gradient, per-group KKT norms and the KKT verdict (the
gaussian fused step's trick, fused.py) for a single host pull per lambda.

Mirrors reference ``solver_glm_naive.hpp`` fit (:241-459) + invariance
(:495-503).
"""

import jax
import jax.numpy as jnp

from ..configs import configs
from .pin import pin_cov_solve, screen_eigh, screen_gram

_PRECISION = jax.lax.Precision.HIGHEST


def build_glm_step(glm, X, intercept: bool, num_groups: int, qmax: int,
                   dtype):
    """Create the fused IRLS step.

    ``glm`` methods are traced into the computation (closing over the GLM's
    device arrays — y/weights/index machinery become program constants,
    amortized per dataset by the in-process jit cache).
    """
    mul_fn, _ = X.mul_spec()
    hmin = (
        configs.hessian_min
        if jnp.dtype(dtype) == jnp.float64
        else configs.hessian_min_f32
    )

    @jax.jit
    def step(
        X_data,
        Xs, cols_padded, slot_begin, slot_size, penalty_slots,
        beta0, active0,
        eta0, resid0, b0_init, offsets,
        group_ids, penalty_cols, penalty_groups, is_screen_mask,
        lmda, alpha, tol_base,          # tol_base = tol*(loss_null-loss_full)
        irls_tol, irls_max_iters,
        dbeta_tol, newton_tol, newton_max_iters, max_iters,
    ):
        def hessian_floor(h):
            return jnp.maximum(h, 0.0) + hmin * (h <= 0)

        def irls_body(carry):
            (beta, active, eta, resid, b0, _, it, _, pin_ok) = carry
            grad_n = resid
            hess = hessian_floor(glm.hessian(eta, grad_n))
            irls_resid = glm.inv_hessian_gradient(eta, grad_n, hess)
            hess_sum = jnp.sum(hess)
            irls_w = hess / hess_sum
            irls_y = irls_resid + eta - offsets
            y_mean = jnp.vdot(irls_w, irls_y, precision=_PRECISION)
            if intercept:
                irls_resid = irls_resid + (b0 - y_mean)
            resid_sum = jnp.vdot(irls_w, irls_resid, precision=_PRECISION)
            lmda_adj = lmda / hess_sum
            tol_adj = tol_base / hess_sum

            # refresh weighted Gram + eigendecomposition (reference
            # solver_glm_naive.hpp:361-385)
            A, means_s = screen_gram(Xs, irls_w, intercept)
            eigvals, eigvecs = screen_eigh(A, slot_begin, slot_size, qmax)

            wv = irls_w * irls_resid
            grad_s = jnp.einsum("ns,n->s", Xs, wv, precision=_PRECISION)
            if intercept:
                grad_s = grad_s - means_s * resid_sum

            beta_n, _, active_n, _, _, done = pin_cov_solve(
                A, grad_s, beta, slot_begin, slot_size, eigvals, eigvecs,
                penalty_slots, active, lmda_adj, alpha, tol_adj, dbeta_tol,
                newton_tol, newton_max_iters, max_iters, jnp.zeros((), dtype),
            )

            dbeta = beta_n - beta
            irls_resid = irls_resid - jnp.matmul(Xs, dbeta,
                                                 precision=_PRECISION)
            resid_sum_n = jnp.vdot(irls_w, irls_resid, precision=_PRECISION)
            b0_n = jnp.where(intercept, y_mean + resid_sum_n, 0.0)

            eta_n = irls_y + offsets - irls_resid
            if intercept:
                eta_n = eta_n + (b0_n - y_mean)
            resid_n = glm.gradient(eta_n)
            crit = jnp.abs(jnp.vdot(resid_n - resid, eta_n - eta,
                                    precision=_PRECISION))
            return (beta_n, active_n, eta_n, resid_n, b0_n, crit, it + 1,
                    crit <= irls_tol, done)

        def irls_cond(carry):
            _, _, _, _, _, _, it, converged, pin_ok = carry
            return (~converged) & pin_ok & (it < irls_max_iters)

        init = (beta0, active0, eta0, resid0, b0_init,
                jnp.asarray(jnp.inf, dtype), jnp.zeros((), jnp.int32),
                jnp.zeros((), bool), jnp.ones((), bool))
        (beta, active, eta, resid, b0, crit, irls_iters, converged,
         pin_ok) = jax.lax.while_loop(irls_cond, irls_body, init)

        # ---- invariance + KKT (reference :495-503, solver_base :410-433) --- #
        ones = jnp.ones_like(resid)
        grad = mul_fn(X_data, resid, ones)
        ok = cols_padded >= 0
        safe = jnp.where(ok, cols_padded, 0)
        beta_cols = jnp.zeros_like(grad).at[safe].set(
            jnp.where(ok, beta, 0.0), mode="drop"
        )
        l2s = (1.0 - alpha) * jnp.minimum(lmda, 1e30)
        gadj = grad - l2s * (penalty_cols * beta_cols)
        sq = jax.ops.segment_sum(gadj * gadj, group_ids,
                                 num_segments=num_groups)
        abs_grad = jnp.sqrt(jnp.maximum(sq, 0.0))
        viol = abs_grad > lmda * alpha * penalty_groups
        kkt_passed = ~jnp.any(viol & ~is_screen_mask)

        loss = glm.loss(eta)
        return (beta, active, eta, resid, b0, grad, abs_grad, kkt_passed,
                loss, irls_iters, converged, pin_ok)

    return step


_GLM_STEP_CACHE = {}


def get_glm_step(glm, X, intercept: bool, num_groups: int, qmax: int, dtype):
    try:
        key = (id(glm), X.structure_key(), bool(intercept), int(num_groups),
               int(qmax), jnp.dtype(dtype).name)
    except Exception:
        return build_glm_step(glm, X, intercept, num_groups, qmax, dtype)
    hit = _GLM_STEP_CACHE.get(key)
    if hit is None:
        hit = _GLM_STEP_CACHE[key] = build_glm_step(
            glm, X, intercept, num_groups, qmax, dtype
        )
    return hit
