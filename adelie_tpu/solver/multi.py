"""Multi-response grpnet reformulation (reference solver.py:700-763).

Builds the flattened single-response problem on ``X_aug = [1 (x) I_K,
X (x) I_K]`` with per-class intercept columns as unpenalized groups, then
runs the standard gaussian / GLM drivers.
"""

import numpy as np
import jax.numpy as jnp

from .. import matrix as matrix_mod
from ..glm.multi import FlattenedMultiGlm
from .basil import solve_core
from .gaussian import GaussianNaiveDriver, GaussianNaiveState
from .glm_driver import GlmNaiveDriver, GlmNaiveState
from ..logger import logger


class MultiGlmNaiveDriver(GlmNaiveDriver):
    """GLM driver with per-class intercept-only null model
    (reference solver_multiglm_naive.hpp update_loss_null :103-190)."""

    def __init__(self, state, K, multi_intercept):
        super().__init__(state)
        self._K = K
        self._multi_intercept = multi_intercept

    def update_loss_null(self):
        s = self.s
        if s.loss_null is not None:
            return
        glm = s.glm
        if not self._multi_intercept:
            s.loss_null = float(glm.loss(s.offsets))
            return
        from .glm_driver import _hessian_floor

        K = self._K
        eta = s.eta
        resid = s.resid
        for _ in range(s.irls_max_iters):
            hess = _hessian_floor(glm.hessian(eta, resid), s.dtype)
            irls_y = glm.inv_hessian_gradient(eta, resid, hess) + eta - s.offsets
            w2 = (hess / jnp.sum(hess)).reshape(-1, K)
            y2 = irls_y.reshape(-1, K)
            beta0 = jnp.sum(w2 * y2, axis=0) / jnp.sum(w2, axis=0)
            eta_prev, resid_prev = eta, resid
            eta = (s.offsets.reshape(-1, K) + beta0[None, :]).reshape(-1)
            resid = glm.gradient(eta)
            crit = float(jnp.abs(jnp.sum((resid - resid_prev) * (eta - eta_prev))))
            if crit <= s.irls_tol:
                s.loss_null = float(glm.loss(eta))
                return
        from ..exceptions import SolverError

        raise SolverError("Maximum IRLS iterations reached (multi loss_null).")


def build_multi_problem(
    X, glm, groups, alpha, penalty, offsets, lmda_path, intercept,
    is_gaussian_opt, warm_start, solver_kwargs, progress_bar, exit_cond,
    constraints=None,
):
    n, p = X.rows(), X.cols()
    K = np.asarray(glm.y).shape[1]
    dtype = np.dtype(X.dtype)
    G_user = len(groups)

    # flattened grouping (reference solver.py:703-712)
    groups = groups * K
    if intercept:
        groups = np.concatenate([np.arange(K), K + groups]).astype(int)
    group_sizes = np.diff(
        np.concatenate([groups, [(p + int(intercept)) * K]])
    ).astype(int)

    if penalty is None:
        penalty = np.sqrt(group_sizes).astype(float)
        if intercept:
            penalty[:K] = 0
    else:
        penalty = np.asarray(penalty, float)
        if intercept:
            penalty = np.concatenate([np.zeros(K), penalty])

    G = len(groups)
    p_aug = (p + int(intercept)) * K

    # constraints apply per user feature group; each flattened group for
    # feature group g spans all K classes, so the constraint's primal
    # dimension must be group_size_user[g] * K.  Intercept groups are
    # always unconstrained (reference state.py render_constraints:28-45
    # prepends None for the leading K intercept groups).
    if constraints is not None:
        if len(constraints) == G_user and intercept:
            constraints = [None] * K + list(constraints)
        if len(constraints) != G:
            raise ValueError(
                f"constraints must have length {G_user} (one per feature "
                f"group) or {G} (flattened groups incl. intercepts); got "
                f"{len(constraints)}."
            )
        for i, c in enumerate(constraints):
            if c is not None and c.primals() != int(group_sizes[i]):
                raise ValueError(
                    f"constraints[{i}] has primal dimension {c.primals()} "
                    f"but the flattened group spans {int(group_sizes[i])} "
                    f"coefficients (group size x {K} classes)."
                )

    X_aug = matrix_mod.kronecker_eye(X, K)
    if intercept:
        ones_ke = matrix_mod.kronecker_eye(
            np.ones((n, 1), dtype), K
        )
        X_aug = matrix_mod.concatenate([ones_ke, X_aug], axis=1)

    if warm_start is None:
        screen_set = np.arange(G)[(penalty <= 0) | (alpha <= 0)]
        gs = group_sizes[screen_set]
        screen_begins = np.concatenate([[0], np.cumsum(gs)])[:-1].astype(int)
        screen_beta = np.zeros(int(gs.sum()), dtype)
        screen_is_active = np.ones(len(screen_set), bool)
        lmda = np.inf
        lmda_max = None
    else:
        screen_set = np.asarray(warm_start.screen_set)
        screen_begins = np.asarray(warm_start.screen_begins)
        screen_beta = np.asarray(warm_start.screen_beta)
        screen_is_active = np.asarray(warm_start.screen_is_active)
        lmda = warm_start.lmda
        lmda_max = warm_start.lmda_max

    common = dict(
        X=X_aug, groups=groups, group_sizes=group_sizes, alpha=float(alpha),
        penalty=penalty, dtype=dtype, n=n * K, p=p_aug,
        # the multi-reformulation bakes intercepts into X_aug columns:
        # the inner solvers run WITHOUT the implicit intercept
        intercept=False,
        screen_set=screen_set, screen_begins=screen_begins,
        screen_beta=screen_beta, screen_is_active=screen_is_active,
        lmda=lmda, lmda_max=lmda_max, setup_lmda_max=lmda_max is None,
        lmda_path=lmda_path, setup_lmda_path=lmda_path is None,
        **{k: v for k, v in solver_kwargs.items()
           if k not in ("irls_max_iters", "irls_tol")},
    )
    common["max_screen_size"] = common["max_screen_size"] or G
    common["max_active_size"] = common["max_active_size"] or G

    fglm = FlattenedMultiGlm(glm)

    if is_gaussian_opt:
        y2 = jnp.asarray(np.asarray(glm.y), dtype)
        w = jnp.asarray(np.asarray(glm.weights), dtype)
        w_ms = w / K
        offs = jnp.asarray(offsets, dtype)
        if warm_start is None:
            y_off = y2 - offs
            y_var = float(jnp.sum(w_ms[:, None] * y_off**2))
            if intercept:
                ybar = (y_off.T @ w)[None]
                y_off_c = y_off - ybar
                yc_var = float(jnp.sum(w_ms[:, None] * y_off_c**2))
                rsq = yc_var - y_var
                y_var = yc_var
            else:
                rsq = 0.0
            resid = y_off.reshape(-1)
            resid_sum = float(jnp.sum(w_ms[:, None] * y_off))
            weights_flat = jnp.repeat(w_ms, K)
            if getattr(X_aug, "is_streaming", False):
                # one pass over the host-streamed bytes for both full-p
                # setup products (each mul re-streams the whole panel)
                both = X_aug.mul_many(jnp.stack(
                    [weights_flat * resid, weights_flat]
                ))
                grad, X_means = both[:, 0], both[:, 1]
            else:
                grad = X_aug.mul(resid, weights_flat)
                X_means = X_aug.mul(jnp.ones_like(resid), weights_flat)
        else:
            y_var = warm_start.y_var
            rsq = warm_start.rsq
            resid = warm_start.resid
            resid_sum = warm_start.resid_sum
            weights_flat = warm_start.weights
            grad = warm_start.grad
            X_means = warm_start.X_means

        state = GaussianNaiveState(
            weights=weights_flat, X_means=X_means, y_mean=0.0, y_var=y_var,
            rsq=float(rsq), resid=resid, resid_sum=resid_sum, **common,
        )
        state.grad = grad
        state.K = K
        streamed = getattr(X_aug, "is_streaming", False)
        if constraints is not None:
            if streamed:
                from .streamed import StreamedConstrainedGaussianDriver

                driver = StreamedConstrainedGaussianDriver(state, constraints)
            else:
                from .constrained import ConstrainedGaussianDriver

                driver = ConstrainedGaussianDriver(state, constraints)
        elif streamed:
            from .streamed import StreamedGaussianDriver

            driver = StreamedGaussianDriver(state)
        else:
            driver = GaussianNaiveDriver(state)
    else:
        offs = jnp.asarray(offsets.reshape(-1), dtype)
        if warm_start is None:
            eta = offs
            resid = fglm.gradient(eta)
            grad = X_aug.mul(resid, jnp.ones_like(resid))
            loss_null = None
            loss_full = float(fglm.loss_full())
        else:
            eta = warm_start.eta
            resid = warm_start.resid
            grad = warm_start.grad
            loss_null = warm_start.loss_null
            loss_full = warm_start.loss_full

        state = GlmNaiveState(
            glm=fglm, offsets=offs, beta0=0.0, eta=eta, resid=resid,
            loss_null=loss_null, loss_full=loss_full,
            irls_max_iters=int(solver_kwargs.get("irls_max_iters", int(1e4))),
            irls_tol=float(solver_kwargs.get("irls_tol", 1e-7)),
            **common,
        )
        state.grad = grad
        state.K = K
        if getattr(X_aug, "is_streaming", False):
            from .streamed import StreamedGlmDriver

            class _MultiStreamedGlmDriver(MultiGlmNaiveDriver,
                                          StreamedGlmDriver):
                """per-class null model from MultiGlmNaiveDriver; the
                optimistic + streamed-KKT chunk from StreamedGlmDriver."""

            driver = _MultiStreamedGlmDriver(state, K, intercept)
        else:
            driver = MultiGlmNaiveDriver(state, K, intercept)
        if constraints is not None:
            from .constrained import ConstrainedGlmDriver

            driver = ConstrainedGlmDriver(state, constraints, base=driver)

    # attach the (n, K) glm + offsets for diagnostics/CV
    state.glm_multi = glm
    state.offsets_multi = offsets

    try:
        if hasattr(driver, "solve_path"):
            driver.solve_path(progress_bar=progress_bar, exit_cond=exit_cond)
        else:
            solve_core(state, driver, progress_bar=progress_bar,
                       exit_cond=exit_cond)
    except Exception as exc:
        state.error = str(exc)
        logger.error(f"solver: {exc}")

    from . import finalize_state

    state = finalize_state(state)
    state.n_classes = K
    # extract per-class intercepts from the leading K columns
    # (reference solver_multiglm_naive.hpp 'tidy' :218-233)
    L = state.betas.shape[0]
    if intercept and L:
        dense_head = state.betas[:, :K].toarray()
        state.intercepts = dense_head
        state.betas = state.betas[:, K:].tocsr()
    else:
        state.intercepts = np.zeros((L, K))
    return state
