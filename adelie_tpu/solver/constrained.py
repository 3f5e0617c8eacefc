"""Constraint wiring for the path solvers.

Builds the padded per-group constraint buffers consumed by
``pin_cov_solve_constrained`` (solver/pin_constrained.py) and provides
constraint-aware drivers for the gaussian and GLM paths.  Mirrors the
reference's integration points:

* pin solver group update -> ``constraint->solve``
  (solver_gaussian_pin_naive.hpp:420-459),
* ``update_abs_grad`` -> screen groups subtract ``A' mu``, non-screen
  groups use ``solve_zero`` (solver_base.hpp:21-110),
* per-lambda dual export (solver_base.hpp:160-223).
"""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..configs import configs
from ..constraint import ConstraintBase
from ..exceptions import MaxCDsError
from ..utils import Stopwatch
from .pin_constrained import pin_cov_solve_constrained, prep_constraint_buffers
from .state_core import resid_update_kernel, screen_grad_kernel

_PRECISION = jax.lax.Precision.HIGHEST


def check_constraints_supported(constraints):
    for c in constraints:
        if c is not None and not isinstance(c, ConstraintBase):
            raise TypeError(
                "constraints must be adelie_tpu.constraint objects or None; "
                f"got {type(c).__name__}"
            )


class ConstraintPack:
    """Padded device buffers for the screen set's constraints."""

    def __init__(self, constraints, rho=1.0, cons_tol=1e-9,
                 cons_max_iters=10000):
        self.constraints = constraints
        self.rho = float(rho)
        self.cons_tol = float(cons_tol)
        self.cons_max_iters = int(cons_max_iters)
        self.version = -1
        self.mmax = 1
        # persistent dual storage per GROUP index (original numbering)
        self.mu_by_group = {}

    def rebuild(self, state, cache):
        """Build (G_cap, mmax, qmax) A_pad and bound/dual buffers."""
        ss = state.screen_set
        G_cap, qmax = cache.G_cap, cache.qmax
        dtype = state.dtype
        mmax = 1
        for g in ss:
            c = self.constraints[g]
            if c is not None:
                mmax = max(mmax, c.duals())
        # round up mmax a little to bound recompiles
        m_bucket = 1
        while m_bucket < mmax:
            m_bucket *= 2
        mmax = max(m_bucket, 1)
        self.mmax = mmax

        A_pad = np.zeros((G_cap, mmax, qmax), dtype)
        # dtype-safe "unbounded" sentinel (max_solver_value overflows f32)
        mx = min(configs.max_solver_value, float(np.finfo(dtype).max) * 0.5)
        lo_pad = np.full((G_cap, mmax), -mx, dtype)
        hi_pad = np.full((G_cap, mmax), mx, dtype)
        has_cons = np.zeros(G_cap, bool)
        mu0 = np.zeros((G_cap, mmax), dtype)
        for i, g in enumerate(ss):
            c = self.constraints[g]
            if c is None:
                continue
            m, d = c.duals(), c.primals()
            A_pad[i, :m, :d] = np.asarray(c.A_dense(), dtype)
            lo, hi = c.zbounds()
            # clamp f64 sentinels so the f32 pad doesn't overflow to inf
            lo_pad[i, :m] = np.clip(np.asarray(lo, np.float64), -mx, mx)
            hi_pad[i, :m] = np.clip(np.asarray(hi, np.float64), -mx, mx)
            has_cons[i] = True
            prev = self.mu_by_group.get(int(g))
            if prev is not None:
                mu0[i, :m] = prev
        self.A_pad = jnp.asarray(A_pad)
        self.lo_pad = jnp.asarray(lo_pad)
        self.hi_pad = jnp.asarray(hi_pad)
        self.has_cons = jnp.asarray(has_cons)
        self.has_cons_host = has_cons
        self.mu = jnp.asarray(mu0)
        self.version = cache.version

    def prep(self, cache, dtype):
        """(Re)build P/DH/UH for the current eigendecomposition."""
        self.P, self.DH, self.UH = prep_constraint_buffers(
            self.A_pad, cache.eigvecs, cache.eigvals,
            jnp.asarray(self.rho, dtype),
        )

    def store_mu(self, state, mu_dev):
        self.mu = mu_dev
        mu_h = np.asarray(mu_dev)
        for i, g in enumerate(state.screen_set):
            c = self.constraints[g]
            if c is None:
                continue
            m = c.duals()
            c.mu = mu_h[i, :m].astype(c.dtype)
            self.mu_by_group[int(g)] = mu_h[i, :m].copy()


def constrained_abs_grad(state, pack, lmda):
    """update_abs_grad with constraints (reference solver_base.hpp:21-110).

    Starts from the unconstrained kernel result in ``state.abs_grad`` and
    corrects constrained groups on host (they are few and small).
    """
    grad_h = np.asarray(state.grad)
    if state.abs_grad is not None and not state.abs_grad.flags.writeable:
        state.abs_grad = state.abs_grad.copy()
    alpha = state.alpha
    regul = (1.0 - alpha) * min(lmda, 1e30)
    is_screen = np.zeros(len(state.groups), bool)
    is_screen[state.screen_set] = True
    screen_pos = {int(g): i for i, g in enumerate(state.screen_set)}

    for g, c in enumerate(pack.constraints):
        if c is None:
            continue
        k = state.groups[g]
        size = state.group_sizes[g]
        gslice = grad_h[k:k + size]
        if is_screen[g]:
            i = screen_pos[g]
            b = state.screen_begins[i]
            sbeta = state.screen_beta[b:b + size]
            corr = gslice - regul * state.penalty[g] * sbeta - c.gradient(sbeta)
            state.abs_grad[g] = float(np.linalg.norm(corr))
        else:
            state.abs_grad[g] = float(c.solve_zero(gslice))


class ConstrainedGaussianDriver:
    """Gaussian path driver with per-group constraints (used by solve_core).

    Per-lambda fit = one ``pin_cov_solve_constrained`` device call; the
    residual/gradient/invariance updates are the same MXU products as the
    fused unconstrained path.
    """

    def __init__(self, state, constraints):
        self.s = state
        self.pack = ConstraintPack(constraints)

    def large_lmda(self):
        from ..utils import large_lmda

        return large_lmda(self.s.dtype)

    def update_loss_null(self):
        pass

    def _ensure(self):
        s = self.s
        cache = s.ensure_screen_cache()
        if cache.A is None:
            cache.rebuild_weighted(s.weights, s.intercept)
            self.pack.version = -1  # eigvecs changed
        if self.pack.version != cache.version:
            self.pack.rebuild(s, cache)
            self.pack.prep(cache, s.dtype)
        return cache

    def fit(self, lmda):
        s = self.s
        sw = Stopwatch().start()
        cache = self._ensure()
        dtype = s.dtype

        beta0 = cache.pad_screen_values(s.screen_beta, dtype)
        active0 = cache.pad_group_bools(s.screen_is_active)
        wv = s.weights * s.resid
        grad_s = screen_grad_kernel(
            cache.Xs, wv,
            cache.means_s if s.intercept else jnp.zeros_like(cache.means_s),
            jnp.asarray(s.resid_sum, dtype),
        )

        pk = self.pack
        beta, grad_s2, active, rsq, mu, iters, done = pin_cov_solve_constrained(
            cache.A, grad_s, beta0,
            cache.slot_begin, cache.slot_size,
            cache.eigvals, cache.eigvecs, cache.penalty_slots,
            active0,
            pk.has_cons, pk.P, pk.DH, pk.UH, pk.lo_pad, pk.hi_pad, pk.mu,
            jnp.asarray(pk.rho, dtype),
            jnp.asarray(pk.cons_tol, dtype),
            jnp.asarray(pk.cons_max_iters, jnp.int32),
            jnp.asarray(lmda, dtype), jnp.asarray(s.alpha, dtype),
            jnp.asarray(s.tol, dtype),
            jnp.asarray(configs.dbeta_tol, dtype),
            jnp.asarray(s.newton_tol, dtype),
            jnp.asarray(s.newton_max_iters, jnp.int32),
            jnp.asarray(s.max_iters, jnp.int32),
            jnp.asarray(s.rsq, dtype),
        )
        if not bool(done):
            raise MaxCDsError()

        dbeta = beta - beta0
        resid_new, resid_sum = resid_update_kernel(
            s.resid, cache.Xs, dbeta, s.weights
        )
        s.resid = resid_new
        s.resid_sum = float(resid_sum)
        s.screen_beta = np.asarray(beta)[: cache.S_val].copy()
        s.screen_is_active = np.asarray(active)[: len(s.screen_set)].copy()
        s.rsq = float(rsq)
        pk.store_mu(s, mu)
        return sw.elapsed()

    def update_invariance(self, lmda):
        s = self.s
        s.lmda = lmda
        grad = s.X.mul(s.resid, s.weights)
        if s.intercept:
            grad = grad - jnp.asarray(s.resid_sum, s.dtype) * s.X_means
        s.grad = grad
        s.update_abs_grad(lmda)
        constrained_abs_grad(s, self.pack, lmda)

    def kkt(self, lmda):
        return self.s.kkt(lmda)

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
        s.lmdas.append(float(lmda))
        s.rsqs.append(float(s.rsq))
        s.devs.append(float(s.rsq) / s.y_var if s.y_var > 0 else 0.0)
        self._record_duals(s)

    def _record_duals(self, s):
        duals = {}
        for g, c in enumerate(self.pack.constraints):
            if c is None:
                continue
            mu = self.pack.mu_by_group.get(int(g))
            if mu is not None and np.any(mu != 0):
                duals[int(g)] = mu.copy()
        if not hasattr(s, "duals"):
            s.duals = []
        s.duals.append(duals)


class ConstrainedGlmDriver:
    """GLM (IRLS) path driver with constraints."""

    def __init__(self, state, constraints, base=None):
        from .glm_driver import GlmNaiveDriver

        self.s = state
        self.pack = ConstraintPack(constraints)
        # ``base`` supplies update_loss_null/update_invariance/
        # update_solutions; the multi-response path passes its
        # per-class-intercept null-model driver here.
        self._base = base if base is not None else GlmNaiveDriver(state)

    def large_lmda(self):
        return self._base.large_lmda()

    def update_loss_null(self):
        self._base.update_loss_null()

    def fit(self, lmda):
        from .glm_driver import _hessian_floor

        s = self.s
        glm = s.glm
        dtype = s.dtype
        sw = Stopwatch().start()
        cache = s.ensure_screen_cache()
        pk = self.pack

        saved_beta = s.screen_beta.copy()
        saved_active = s.screen_is_active.copy()

        eta = s.eta
        resid = s.resid
        beta0_i = s.beta0

        try:
            for irls_it in range(s.irls_max_iters):
                grad_n = resid
                hess = _hessian_floor(glm.hessian(eta, grad_n), dtype)
                irls_resid = glm.inv_hessian_gradient(eta, grad_n, hess)
                hess_sum = jnp.sum(hess)
                irls_weights = hess / hess_sum
                irls_y = irls_resid + eta - s.offsets
                y_mean = jnp.sum(irls_weights * irls_y)
                if s.intercept:
                    irls_resid = irls_resid + (beta0_i - y_mean)
                resid_sum = jnp.sum(irls_weights * irls_resid)
                lmda_adj = lmda / float(hess_sum)

                cache.rebuild_weighted(irls_weights, s.intercept)
                if pk.version != cache.version:
                    pk.rebuild(s, cache)
                pk.prep(cache, dtype)  # eigvals change per IRLS iteration

                grad_s = screen_grad_kernel(
                    cache.Xs,
                    irls_weights * irls_resid,
                    cache.means_s if s.intercept else jnp.zeros_like(cache.means_s),
                    resid_sum,
                )
                beta0_dev = cache.pad_screen_values(s.screen_beta, dtype)
                active0 = cache.pad_group_bools(s.screen_is_active)
                tol_adj = s.tol * (s.loss_null - s.loss_full) / float(hess_sum)

                out = pin_cov_solve_constrained(
                    cache.A, grad_s, beta0_dev,
                    cache.slot_begin, cache.slot_size,
                    cache.eigvals, cache.eigvecs, cache.penalty_slots,
                    active0,
                    pk.has_cons, pk.P, pk.DH, pk.UH, pk.lo_pad, pk.hi_pad,
                    pk.mu,
                    jnp.asarray(pk.rho, dtype),
                    jnp.asarray(pk.cons_tol, dtype),
                    jnp.asarray(pk.cons_max_iters, jnp.int32),
                    jnp.asarray(lmda_adj, dtype), jnp.asarray(s.alpha, dtype),
                    jnp.asarray(tol_adj, dtype),
                    jnp.asarray(configs.dbeta_tol, dtype),
                    jnp.asarray(s.newton_tol, dtype),
                    jnp.asarray(s.newton_max_iters, jnp.int32),
                    jnp.asarray(s.max_iters, jnp.int32),
                    jnp.zeros((), dtype),
                )
                beta, _, active, _, mu, iters, done = out
                if not bool(done):
                    raise MaxCDsError()

                dbeta = beta - beta0_dev
                irls_resid, resid_sum_new = resid_update_kernel(
                    irls_resid, cache.Xs, dbeta, irls_weights
                )
                s.screen_beta = np.asarray(beta)[: cache.S_val].copy()
                s.screen_is_active = np.asarray(active)[: len(s.screen_set)].copy()
                pk.store_mu(s, mu)

                beta0_new = (
                    float(y_mean + resid_sum_new) if s.intercept else 0.0
                )
                eta_prev, resid_prev = eta, resid
                eta = irls_y + s.offsets - irls_resid
                if s.intercept:
                    eta = eta + (beta0_new - y_mean)
                resid = glm.gradient(eta)
                beta0_i = beta0_new

                crit = float(jnp.abs(jnp.sum((resid - resid_prev) * (eta - eta_prev))))
                if crit <= s.irls_tol:
                    s.eta = eta
                    s.resid = resid
                    s.beta0 = beta0_i
                    return sw.elapsed()
            from ..exceptions import SolverError

            raise SolverError("Maximum IRLS iterations reached.")
        except Exception:
            s.screen_beta = saved_beta
            s.screen_is_active = saved_active
            raise

    def update_invariance(self, lmda):
        self._base.update_invariance(lmda)
        constrained_abs_grad(self.s, self.pack, lmda)

    def kkt(self, lmda):
        return self.s.kkt(lmda)

    def update_solutions(self, lmda):
        self._base.update_solutions(lmda)
        ConstrainedGaussianDriver._record_duals(self, self.s)
