"""Covariance-method gaussian path solver (reference solver.py:39-351,
solver_gaussian_cov.hpp:372, solver_gaussian_pin_cov.hpp).

Solves  min_b  1/2 b'Ab - v'b + lmda sum_g w_g (alpha ||b_g|| +
(1-alpha)/2 ||b_g||^2)  over a lambda path with BASIL screening.

The TPU pin solver already runs in covariance form (pin.py), so this
method IS the pin solver fed with gathered blocks of ``A``: per screen-set
change we materialize ``A[screen, screen]`` (the lazy-cov analog,
matrix_cov_lazy_cov.hpp:31-33 — here one gather per change instead of
per-group caching) and batch-eigendecompose the group diagonal blocks; the
full-gradient invariance is one ``A[:, screen] @ beta`` product per lambda.
"""

from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from .. import matrix as matrix_mod
from ..configs import configs
from ..exceptions import MaxCDsError
from ..utils import Stopwatch, bucket, bucket_pow2, large_lmda
from .basil import solve_core
from .pin import pin_cov_solve, screen_eigh
from .state_core import NaiveStateBase, abs_grad_kernel


class CovScreenCache:
    """Device-resident A[screen, screen] block + eigendecompositions."""

    def __init__(self):
        self.version = -1
        self.cols = None
        self.S_val = 0
        self.S_cap = 0
        self.G_cap = 0
        self.qmax = 1
        self.A_s = None
        self.slot_begin = None
        self.slot_size = None
        self.penalty_slots = None
        self.eigvals = None
        self.eigvecs = None

    def rebuild(self, state):
        ss = state.screen_set
        gs = state.group_sizes[ss]
        begins = np.concatenate([[0], np.cumsum(gs)])[:-1]
        S_val = int(begins[-1] + gs[-1]) if len(ss) else 0
        cols = np.concatenate(
            [np.arange(state.groups[g], state.groups[g] + state.group_sizes[g])
             for g in ss]
        ).astype(np.int64) if len(ss) else np.zeros(0, np.int64)

        qmax = bucket_pow2(int(gs.max())) if len(ss) else 1
        S_cap = bucket(S_val + qmax, configs.screen_cap_min)
        G_cap = bucket(max(len(ss), 1), configs.group_cap_min)

        dtype = state.dtype
        A_s = jnp.zeros((S_cap, S_cap), dtype)
        if S_val:
            blk = state.A.block(cols, cols)
            A_s = A_s.at[:S_val, :S_val].set(jnp.asarray(blk, dtype))

        slot_begin = np.zeros(G_cap, np.int32)
        slot_size = np.zeros(G_cap, np.int32)
        penalty_slots = np.ones(G_cap, dtype)
        slot_begin[: len(ss)] = begins
        slot_size[: len(ss)] = gs
        penalty_slots[: len(ss)] = state.penalty[ss]

        self.cols = cols
        self.S_val, self.S_cap, self.G_cap, self.qmax = S_val, S_cap, G_cap, qmax
        self.A_s = A_s
        self.slot_begin = jnp.asarray(slot_begin)
        self.slot_size = jnp.asarray(slot_size)
        self.penalty_slots = jnp.asarray(penalty_slots)
        self.eigvals, self.eigvecs = screen_eigh(
            A_s, self.slot_begin, self.slot_size, qmax
        )

    def pad_screen_values(self, values, dtype):
        out = np.zeros(self.S_cap, dtype)
        out[: self.S_val] = values
        return jnp.asarray(out)

    def pad_group_bools(self, flags):
        out = np.zeros(self.G_cap, bool)
        out[: len(flags)] = flags
        return jnp.asarray(out)


@dataclass
class GaussianCovState(NaiveStateBase):
    """State for the covariance method (reference state.py:1128)."""

    A: Any = None
    v: np.ndarray = None
    rdev_tol: float = 1e-3
    rsq: float = 0.0
    rsqs: list = None

    def __post_init__(self):
        super().__post_init__()
        if self.rsqs is None:
            self.rsqs = []
        self._cov_cache = CovScreenCache()

    def ensure_screen_cache(self):
        if self._cov_cache.version != self._screen_version:
            self._cov_cache.rebuild(self)
            self._cov_cache.version = self._screen_version
        return self._cov_cache

    def update_abs_grad(self, lmda):
        cache = self.ensure_screen_cache()
        cols_padded = np.full(cache.S_cap, -1, np.int32)
        cols_padded[: cache.S_val] = cache.cols
        beta_padded = cache.pad_screen_values(self.screen_beta, self.dtype)
        ag = abs_grad_kernel(
            self.grad, jnp.asarray(cols_padded), beta_padded,
            self._penalty_cols, self._group_ids,
            jnp.asarray((1.0 - self.alpha) * min(lmda, 1e30), self.dtype),
            len(self.groups),
        )
        self.abs_grad = np.asarray(ag)


def early_exit_cov(state) -> bool:
    """rdev rule (reference solver_gaussian_cov.hpp:186-200)."""
    if not state.early_exit or len(state.devs) < 2:
        return False
    dev_u = state.devs[-1]
    dev_m = state.devs[-2]
    return bool(dev_u - dev_m <= state.rdev_tol * dev_u)


class GaussianCovDriver:
    def __init__(self, state: GaussianCovState):
        self.s = state

    def large_lmda(self):
        return large_lmda(self.s.dtype)

    def update_loss_null(self):
        pass

    def fit(self, lmda):
        s = self.s
        sw = Stopwatch().start()
        cache = s.ensure_screen_cache()
        dtype = s.dtype

        beta0 = cache.pad_screen_values(s.screen_beta, dtype)
        active0 = cache.pad_group_bools(s.screen_is_active)
        # screen gradient at current beta: g_s = v_s - A_s beta_s
        v_s = np.zeros(cache.S_cap, dtype)
        v_s[: cache.S_val] = s.v[cache.cols]
        grad_s = jnp.asarray(v_s) - cache.A_s @ beta0

        beta, grad, active, rsq, iters, done = pin_cov_solve(
            cache.A_s, grad_s, beta0,
            cache.slot_begin, cache.slot_size,
            cache.eigvals, cache.eigvecs, cache.penalty_slots,
            active0,
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
        s.screen_beta = np.asarray(beta)[: cache.S_val].copy()
        s.screen_is_active = np.asarray(active)[: len(s.screen_set)].copy()
        s.rsq = float(rsq)
        return sw.elapsed()

    def update_invariance(self, lmda):
        s = self.s
        cache = s.ensure_screen_cache()
        s.lmda = lmda
        if cache.S_val:
            Ab = s.A.mul(cache.cols, s.screen_beta)
            s.grad = jnp.asarray(s.v, s.dtype) - jnp.asarray(Ab, s.dtype)
        else:
            s.grad = jnp.asarray(s.v, s.dtype)
        s.update_abs_grad(lmda)

    def update_solutions(self, lmda):
        s = self.s
        cache = s.ensure_screen_cache()
        nz = np.abs(s.screen_beta) > 0
        cols = cache.cols
        beta_row = sp.csr_matrix(
            (s.screen_beta[nz], (np.zeros(int(nz.sum()), int), cols[nz])),
            shape=(1, s.p),
        )
        s.betas.append(beta_row)
        s.intercepts.append(0.0)
        s.lmdas.append(float(lmda))
        s.rsqs.append(float(s.rsq))
        s.devs.append(float(s.rsq))


def gaussian_cov(
    A,
    v,
    *,
    constraints=None,
    groups=None,
    alpha: float = 1.0,
    penalty=None,
    lmda_path=None,
    max_iters: int = int(1e5),
    tol: float = 1e-7,
    rdev_tol: float = 1e-3,
    newton_tol: float = 1e-12,
    newton_max_iters: int = 1000,
    n_threads: int = 1,
    early_exit: bool = True,
    screen_rule: str = "pivot",
    min_ratio: float = 1e-2,
    lmda_path_size: int = 100,
    max_screen_size: int = None,
    max_active_size: int = None,
    pivot_subset_ratio: float = 0.1,
    pivot_subset_min: int = 1,
    pivot_slack_ratio: float = 1.25,
    check_state: bool = False,
    progress_bar: bool = False,
    warm_start=None,
    exit_cond=None,
):
    """Covariance-method group elastic net (reference solver.py:39)."""
    from ..logger import logger

    if constraints is not None and any(c is not None for c in constraints):
        from .constrained import check_constraints_supported

        check_constraints_supported(constraints)

    if not isinstance(A, matrix_mod.MatrixCovBase):
        A = matrix_mod.dense(np.asarray(A), method="cov")
    dtype = np.dtype(A.dtype)
    p = A.cols()
    v = np.asarray(v, dtype)

    if lmda_path is not None:
        lmda_path = np.array(np.flip(np.sort(lmda_path)), dtype=float)

    if groups is None:
        groups = np.arange(p, dtype=int)
    groups = np.asarray(groups, int)
    group_sizes = np.diff(np.concatenate([groups, [p]])).astype(int)
    G = len(groups)
    if penalty is None:
        penalty = np.sqrt(group_sizes).astype(float)
    else:
        penalty = np.asarray(penalty, float)

    if warm_start is None:
        if p + int(group_sizes.max()) <= configs.screen_all_max:
            # small-problem fast path (see grpnet): screen everything,
            # zero KKT retries
            screen_set = np.arange(G)
        else:
            screen_set = np.arange(G)[(penalty <= 0) | (alpha <= 0)]
        gs = group_sizes[screen_set]
        screen_begins = np.concatenate([[0], np.cumsum(gs)])[:-1].astype(int)
        screen_beta = np.zeros(int(gs.sum()), dtype)
        screen_is_active = (penalty[screen_set] <= 0) | (alpha <= 0)
        lmda = np.inf
        lmda_max = None
        rsq = 0.0
    else:
        screen_set = np.asarray(warm_start.screen_set)
        screen_begins = np.asarray(warm_start.screen_begins)
        screen_beta = np.asarray(warm_start.screen_beta)
        screen_is_active = np.asarray(warm_start.screen_is_active)
        lmda = warm_start.lmda
        lmda_max = warm_start.lmda_max
        rsq = warm_start.rsq

    state = GaussianCovState(
        A=A, v=v, X=None, groups=groups, group_sizes=group_sizes,
        alpha=float(alpha), penalty=penalty, intercept=False, dtype=dtype,
        n=0, p=p,
        max_iters=int(max_iters), tol=float(tol), rdev_tol=float(rdev_tol),
        newton_tol=float(newton_tol), newton_max_iters=int(newton_max_iters),
        early_exit=bool(early_exit), min_ratio=float(min_ratio),
        lmda_path_size=int(lmda_path_size), max_screen_size=max_screen_size,
        max_active_size=max_active_size,
        pivot_subset_ratio=float(pivot_subset_ratio),
        pivot_subset_min=int(pivot_subset_min),
        pivot_slack_ratio=float(pivot_slack_ratio),
        screen_rule=screen_rule, lmda_path=lmda_path,
        setup_lmda_path=lmda_path is None,
        screen_set=screen_set, screen_begins=screen_begins,
        screen_beta=screen_beta, screen_is_active=screen_is_active,
        lmda=lmda, lmda_max=lmda_max, setup_lmda_max=lmda_max is None,
        rsq=rsq,
    )

    driver = GaussianCovDriver(state)
    driver.update_invariance(min(state.lmda, 1e30) if np.isfinite(state.lmda) else 1e30)

    try:
        solve_core(state, driver, progress_bar=progress_bar,
                   exit_cond=exit_cond, early_exit_fn=early_exit_cov)
    except Exception as exc:
        import traceback

        state.error = str(exc)
        logger.error(f"gaussian_cov: {exc}\n{traceback.format_exc()}")

    from . import finalize_state

    return finalize_state(state)
