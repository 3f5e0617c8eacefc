"""Public state factories (reference adelie/state.py).

The reference exposes one state class per solver, holding all inputs,
configs, and dynamic invariants; states are the unit of warm-start and the
object ``solve()`` runs on.  Here the internal states already live as
host+device dataclasses (solver/state_core.py etc.); these factories mirror
the reference's constructors and return a state bound to its driver with
``.solve()`` and ``.check()`` (invariant audit, reference state.py:92-117).
"""

import numpy as np

from . import glm as glm_mod
from . import matrix as matrix_mod
from .logger import logger

__all__ = [
    "gaussian_naive",
    "glm_naive",
    "gaussian_cov",
    "gaussian_pin_naive",
    "gaussian_pin_cov",
    "multigaussian_naive",
    "multiglm_naive",
    "bvls",
    "pinball",
    "css_cov",
    "check_state",
]


def check_state(state, method: str = "assert"):
    """Audit screen/active-set invariants (reference state.py check()).

    Validates:
    * screen_set entries are unique, valid group indices,
    * screen_begins are the cumulative group sizes,
    * screen_beta has the total screen value size,
    * screen_is_active has one flag per screen group,
    * abs_grad (when present) has one entry per group.
    """
    failures = []

    def ensure(cond, msg):
        if not cond:
            failures.append(msg)

    ss = np.asarray(state.screen_set)
    G = len(state.groups)
    ensure(len(np.unique(ss)) == len(ss), "screen_set must be unique")
    ensure(np.all((ss >= 0) & (ss < G)), "screen_set out of range")
    gs = state.group_sizes[ss] if len(ss) else np.zeros(0, int)
    begins = np.concatenate([[0], np.cumsum(gs)])[:-1] if len(ss) else np.zeros(0, int)
    ensure(np.array_equal(np.asarray(state.screen_begins), begins),
           "screen_begins inconsistent with screen_set")
    ensure(len(state.screen_beta) == int(gs.sum()),
           "screen_beta size inconsistent")
    ensure(len(state.screen_is_active) == len(ss),
           "screen_is_active size inconsistent")
    if state.abs_grad is not None:
        ensure(len(state.abs_grad) == G, "abs_grad must be (G,)")
    n_sols = (
        len(state.betas) if isinstance(state.betas, list)
        else state.betas.shape[0]
    )
    ensure(n_sols == len(state.lmdas), "betas/lmdas length mismatch")

    if failures:
        msg = "state check failed: " + "; ".join(failures)
        if method == "assert":
            raise AssertionError(msg)
        logger.warning(msg)
    return failures


class _BoundState:
    """A state + driver pair exposing the reference's ``solve()``."""

    def __init__(self, state, run):
        self._state = state
        self._run = run

    def __getattr__(self, name):
        return getattr(self._state, name)

    def check(self, method: str = "assert"):
        return check_state(self._state, method)

    def solve(self, progress_bar: bool = False, exit_cond=None):
        return self._run(progress_bar, exit_cond)


def _factory(X, glm, kwargs):
    from .solver import grpnet

    def run(progress_bar=False, exit_cond=None):
        return grpnet(X, glm, progress_bar=progress_bar,
                      exit_cond=exit_cond, **kwargs)

    return run


def gaussian_naive(*, X, y=None, glm=None, weights=None, **kwargs):
    """Gaussian naive solver state (reference state.py:1677)."""
    if glm is None:
        glm = glm_mod.gaussian(np.asarray(y), weights)
    run = _factory(X, glm, kwargs)

    class _S:
        def solve(self, progress_bar=False, exit_cond=None):
            return run(progress_bar, exit_cond)

        @staticmethod
        def check(state, method="assert"):
            return check_state(state, method)

    return _S()


def glm_naive(*, X, glm, **kwargs):
    """GLM naive (IRLS) solver state (reference state.py:2407)."""
    run = _factory(X, glm, kwargs)

    class _S:
        def solve(self, progress_bar=False, exit_cond=None):
            return run(progress_bar, exit_cond)

        @staticmethod
        def check(state, method="assert"):
            return check_state(state, method)

    return _S()


def gaussian_cov(*, A, v, **kwargs):
    """Covariance-method solver state (reference state.py:1128)."""
    from .solver import gaussian_cov as _solve

    class _S:
        def solve(self, progress_bar=False, exit_cond=None):
            return _solve(A, v, progress_bar=progress_bar,
                          exit_cond=exit_cond, **kwargs)

        @staticmethod
        def check(state, method="assert"):
            return check_state(state, method)

    return _S()


def multigaussian_naive(*, X, y, weights=None, **kwargs):
    """Multi-response gaussian state (reference state.py multigaussian)."""
    glm = glm_mod.multigaussian(np.asarray(y), weights)
    run = _factory(X, glm, kwargs)

    class _S:
        def solve(self, progress_bar=False, exit_cond=None):
            return run(progress_bar, exit_cond)

    return _S()


def multiglm_naive(*, X, glm, **kwargs):
    """Multi-response GLM state (reference state.py multiglm)."""
    run = _factory(X, glm, kwargs)

    class _S:
        def solve(self, progress_bar=False, exit_cond=None):
            return run(progress_bar, exit_cond)

    return _S()


def bvls(*, X, y, lower, upper, **kwargs):
    """BVLS solver state (reference state.py bvls)."""
    from .solver._bvls import bvls as _impl

    class _S:
        def solve(self):
            return _impl(X, y, lower, upper, **kwargs)

    return _S()


def pinball(*, A, S, v, penalty_neg, penalty_pos, **kwargs):
    """Pinball solver state (reference state.py pinball)."""
    from .solver._pinball import pinball as _impl

    class _S:
        def solve(self):
            return _impl(A, S, v, penalty_neg, penalty_pos, **kwargs)

    return _S()


def css_cov(*, S, subset_size=None, **kwargs):
    """CSS solver state (reference state.py css_cov)."""
    from .solver._css import css_cov as _impl

    class _S:
        def solve(self):
            return _impl(S, subset_size, **kwargs)

    return _S()


def gaussian_pin_naive(*, X, y_or_resid=None, groups=None, lmda_path=None,
                       **kwargs):
    """Pin solver over a FIXED screen set (reference state.py
    gaussian_pin_naive): fit the given lambdas with screening disabled
    (screen set = all given groups)."""
    import numpy as np

    from . import glm as glm_mod
    from .solver import grpnet

    def run(progress_bar=False, exit_cond=None):
        glm = glm_mod.gaussian(np.asarray(y_or_resid))
        return grpnet(
            X, glm, groups=groups, lmda_path=lmda_path,
            screen_rule="strong", max_screen_size=None,
            progress_bar=progress_bar, exit_cond=exit_cond, **kwargs,
        )

    class _S:
        def solve(self, progress_bar=False, exit_cond=None):
            return run(progress_bar, exit_cond)

    return _S()


def gaussian_pin_cov(*, A, v, groups=None, lmda_path=None, **kwargs):
    """Covariance-form pin solver state (reference state.py
    gaussian_pin_cov)."""
    from .solver import gaussian_cov as _impl

    class _S:
        def solve(self, progress_bar=False, exit_cond=None):
            return _impl(A=A, v=v, groups=groups, lmda_path=lmda_path,
                         progress_bar=progress_bar, exit_cond=exit_cond,
                         **kwargs)

    return _S()


# --------------------------------------------------------------------------- #
# checkpointing (beyond the reference: it keeps states in-memory only,        #
# SURVEY.md section 5 'Checkpoint / resume')                                   #
# --------------------------------------------------------------------------- #

_WS_FIELDS = [
    "screen_set", "screen_begins", "screen_beta", "screen_is_active",
    "lmda", "lmda_max", "abs_grad",
]
_WS_GAUSSIAN = ["y_mean", "y_var", "rsq", "resid_sum"]
_WS_ARRAYS = ["resid", "grad", "X_means", "weights", "eta"]


def save_state(state, path):
    """Serialize the warm-start-relevant fields of a solved state to .npz.

    ``grpnet(..., warm_start=load_warm_start(path))`` resumes the path
    (the state object itself is the checkpoint, reference
    solver.py:856-884; this adds the missing disk round trip).
    """
    out = {}
    for f in _WS_FIELDS + _WS_GAUSSIAN + _WS_ARRAYS + [
        "beta0", "loss_null", "loss_full",
    ]:
        v = getattr(state, f, None)
        if v is None:
            continue
        out[f] = np.asarray(v)
    np.savez(path, **out)
    return path


class _WarmStart:
    pass


def load_warm_start(path):
    """Load a saved state as a warm-start object for grpnet/gaussian_cov."""
    data = np.load(path if str(path).endswith(".npz") else str(path) + ".npz",
                   allow_pickle=False)
    ws = _WarmStart()
    for k in data.files:
        v = data[k]
        setattr(ws, k, float(v) if v.ndim == 0 else v)
    import jax.numpy as jnp

    for f in _WS_ARRAYS:
        if hasattr(ws, f):
            setattr(ws, f, jnp.asarray(getattr(ws, f)))
    return ws
