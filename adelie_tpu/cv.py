"""K-fold cross-validation (reference adelie/cv.py).

Folds are validated **by zero-weighting** (cv.py:247-252): the training fit
runs with validation weights set to 0 and renormalized; the validation loss
is recovered as (full-data loss - train-weight-sum * train loss) /
validation-weight-sum (cv.py:305-314).  A common lambda path from the
full-data lambda_max is used across folds, with per-fold augmentation
(cv.py:254-264) and path interpolation onto the common grid.
"""

import logging
from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp
import scipy.sparse

from . import matrix as matrix_mod
from .diagnostic import coefficient, predict
from .logger import logger
from .solver import grpnet


@dataclass
class CVGrpnetResult:
    """Result of K-fold CV (reference cv.py:25)."""

    lmdas: np.ndarray
    losses: np.ndarray
    avg_losses: np.ndarray
    best_idx: int

    def plot_loss(self):
        """Mean CV loss with 1-sd error bars (reference cv.py:47)."""
        import matplotlib.pyplot as plt

        ts = -np.log(self.lmdas)
        avg_losses = np.mean(self.losses, axis=0)
        std_losses = np.std(self.losses, axis=0, ddof=0)
        fig, ax = plt.subplots(figsize=(9, 6), layout="constrained")
        ax.errorbar(
            x=ts, y=avg_losses, yerr=std_losses, linestyle="None",
            marker=".", ecolor="grey", elinewidth=0.5, color="red", capsize=2,
        )
        ax.set_title("K-Fold CV Mean Loss")
        ax.set_xlabel(r"$-\log(\lambda)$")
        ax.set_ylabel("Mean Loss")
        return fig, ax

    def fit(self, X, glm, **grpnet_params):
        """Refit on the full data down to the best lambda (reference
        cv.py:76-127).

        CV-only arguments (``n_folds``, ``seed``) and arguments this
        refit pins itself (``early_exit``, ``lmda_path``) are dropped so
        the same kwargs dict used for ``cv_grpnet`` can be forwarded
        here (the sklearn wrapper does exactly that).
        """
        for k in ("n_folds", "seed", "early_exit", "lmda_path"):
            grpnet_params.pop(k, None)
        level = logger.level
        logger.setLevel(logging.ERROR)
        state = grpnet(X=X, glm=glm, lmda_path_size=0, progress_bar=False)
        logger.setLevel(level)

        lmda_path_size = grpnet_params.pop("lmda_path_size", 100)
        lmda_star = self.lmdas[self.best_idx]
        full_lmdas = state.lmda_max * np.logspace(
            0, np.log10(lmda_star / state.lmda_max), lmda_path_size
        )
        return grpnet(
            X=X, glm=glm, lmda_path=full_lmdas, early_exit=False,
            **grpnet_params,
        )


def cv_grpnet(
    X,
    glm,
    *,
    n_threads: int = 1,
    early_exit: bool = False,
    min_ratio: float = 1e-1,
    lmda_path_size: int = 100,
    n_folds: int = 5,
    seed: int = None,
    **grpnet_params,
):
    """K-fold CV group elastic net (reference cv.py:130)."""
    n = _rows(X)
    # progress bars are meaningless across folds; ddev_tol is internally
    # forced to 0 (reference cv.py docstring)
    grpnet_params = dict(grpnet_params)
    grpnet_params.pop("progress_bar", None)
    grpnet_params.pop("ddev_tol", None)

    rng = np.random.RandomState(seed) if seed is not None else np.random
    order = rng.choice(n, n, replace=False)

    fold_size = n // n_folds
    remaining = n % n_folds

    level = logger.level
    logger.setLevel(logging.ERROR)
    try:
        state = grpnet(
            X=X, glm=glm, n_threads=n_threads, lmda_path_size=0,
            progress_bar=False,
        )
        full_lmdas = state.lmda_max * np.logspace(
            0, np.log10(min_ratio), lmda_path_size
        )

        base_weights = np.asarray(glm.weights)
        cv_losses = np.empty((n_folds, full_lmdas.shape[0]))

        for fold in range(n_folds):
            begin = (
                (fold_size + 1) * min(fold, remaining)
                + max(fold - remaining, 0) * fold_size
            )
            curr_fold_size = fold_size + (fold < remaining)
            val_idx = order[begin:begin + curr_fold_size]

            weights = base_weights.copy()
            weights[val_idx] = 0
            weights_sum = float(np.sum(weights))
            weights = weights / weights_sum
            glm_c = glm.reweight(weights)

            st0 = grpnet(
                X=X, glm=glm_c, n_threads=n_threads, lmda_path_size=0,
                progress_bar=False,
            )
            curr_lmdas = st0.lmda_max * np.logspace(
                0, np.log10(min_ratio), lmda_path_size
            )
            curr_lmdas = curr_lmdas[curr_lmdas > full_lmdas[0]]
            aug_lmdas = np.sort(np.concatenate([full_lmdas, curr_lmdas]))[::-1]

            state = grpnet(
                X=X, glm=glm_c, ddev_tol=0, n_threads=n_threads,
                early_exit=early_exit, lmda_path=aug_lmdas,
                progress_bar=False, **grpnet_params,
            )

            weights_sum_val = float(np.sum(base_weights[val_idx]))

            beta_ints = [
                coefficient(
                    lmda=lmda, betas=state.betas,
                    intercepts=state.intercepts, lmdas=state.lmdas,
                )
                for lmda in full_lmdas
            ]
            full_betas = scipy.sparse.vstack([x[0] for x in beta_ints])
            full_intercepts = np.array([x[1] for x in beta_ints])

            etas = predict(
                X=X, betas=full_betas, intercepts=full_intercepts,
                offsets=getattr(state, "offsets", None)
                if np.any(np.asarray(getattr(state, "offsets", 0))) else None,
            )

            full_data_losses = np.array(
                [float(glm.loss(jnp.asarray(e))) for e in etas]
            )
            train_losses = weights_sum * np.array(
                [float(glm_c.loss(jnp.asarray(e))) for e in etas]
            )
            cv_losses[fold] = (
                (full_data_losses - train_losses) / weights_sum_val
                if weights_sum_val > 0 else 0
            )
    finally:
        logger.setLevel(level)

    avg_losses = np.mean(cv_losses, axis=0)
    best_idx = int(np.argmin(avg_losses))

    return CVGrpnetResult(
        lmdas=full_lmdas, losses=cv_losses, avg_losses=avg_losses,
        best_idx=best_idx,
    )


def _rows(X):
    if isinstance(X, matrix_mod.MatrixNaiveBase):
        return X.rows()
    return np.asarray(X).shape[0]
