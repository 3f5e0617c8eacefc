"""scikit-learn compatible estimators (reference adelie/sklearn.py,
py_sklearn.cpp).

``GroupElasticNet`` wraps grpnet/cv_grpnet; ``CSSModelSelection`` runs the
finite-sample guaranteed subset-size selection test over swapping CSS fits
with the subset-factor loss (reference sklearn.py:253-424,
py_sklearn.cpp:16-140).
"""

from typing import Any, Dict, Union

import numpy as np
from scipy.special import expit, softmax
from sklearn.base import BaseEstimator, RegressorMixin

from .cv import CVGrpnetResult, cv_grpnet
from .diagnostic import predict
from .glm import binomial, gaussian, multigaussian, multinomial, poisson
from .solver import css_cov, grpnet
from .solver._css import _resid_given


class GroupElasticNet(BaseEstimator, RegressorMixin):
    """Group elastic net estimator (reference sklearn.py:43)."""

    def __init__(self, solver: str = "grpnet", family: str = "gaussian"):
        self.solver = solver
        self.family = family

    def fit(self, X, y, **kwargs: Dict[str, Any]):
        self._validate_params()
        glm_dict = {
            "gaussian": gaussian,
            "binomial": binomial,
            "poisson": poisson,
            "multigaussian": multigaussian,
            "multinomial": multinomial,
        }
        self.glm_ = glm_dict[self.family](y)
        solver_func = {"grpnet": grpnet, "cv_grpnet": cv_grpnet}[self.solver]
        self.state_ = solver_func(X=X, glm=self.glm_, **kwargs)

        if isinstance(self.state_, CVGrpnetResult):
            self.state_ = self.state_.fit(X=X, glm=self.glm_, **kwargs)
            self.coef_ = self.state_.betas[-1]
            self.intercept_ = np.array([self.state_.intercepts[-1]])
            self.lambda_ = np.array([self.state_.lmdas[-1]])
        else:
            self.coef_ = self.state_.betas
            self.intercept_ = np.asarray(self.state_.intercepts)
            self.lambda_ = np.asarray(self.state_.lmdas)
        return self

    def predict_proba(self, X):
        if not hasattr(self, "state_"):
            raise RuntimeError("The model has not been fitted yet. Call fit() first.")
        if self.family not in ("binomial", "multinomial"):
            raise ValueError(
                'predict_proba is only available for "binomial" and '
                '"multinomial" families.'
            )
        linear_pred = predict(X, self.coef_, self.intercept_)
        if self.family == "binomial":
            proba = expit(linear_pred)
            return np.stack((1 - proba, proba), axis=-1).squeeze()
        return softmax(linear_pred, axis=-1).squeeze()

    def predict(self, X):
        if not hasattr(self, "state_"):
            raise RuntimeError("The model has not been fitted yet. Call fit() first.")
        if self.family in ("binomial", "multinomial"):
            proba = self.predict_proba(X)
            return np.argmax(proba, axis=-1).squeeze()
        return predict(X, self.coef_, self.intercept_).squeeze()

    def score(self, X, y):
        yhat = self.predict(X)
        ybar = np.mean(y)
        ss_res = np.sum((y - yhat) ** 2)
        ss_tot = np.sum((y - ybar) ** 2)
        return float(np.clip(1 - ss_res / ss_tot, 0, 1))

    def _validate_params(self):
        if self.solver not in ("grpnet", "cv_grpnet"):
            raise ValueError(f"Unknown solver: {self.solver}")
        if self.family not in (
            "gaussian", "binomial", "multigaussian", "multinomial", "poisson",
        ):
            raise ValueError(f"Unknown family: {self.family}")


def _subset_factor_T(S, subset, S_logdet):
    """Test statistic log|S_T| + sum log resid diag - log|S|
    (reference py_sklearn.cpp:105-118)."""
    p = S.shape[0]
    subset = np.asarray(subset, int)
    S_resid, ok = _resid_given(S, subset)
    if not ok:
        return -np.inf
    T = np.linalg.slogdet(S[np.ix_(subset, subset)])[1] - S_logdet
    rest = np.setdiff1d(np.arange(p), subset)
    diag = np.diag(S_resid)[rest]
    if np.any(diag <= 0):
        return -np.inf
    return float(T + np.sum(np.log(diag)))


class CSSModelSelection(BaseEstimator, RegressorMixin):
    """Finite-sample guaranteed CSS subset-size selection
    (reference sklearn.py:253)."""

    def __init__(self, alpha: float, n_inits: int = 1, n_sims: int = int(1e4),
                 n_threads: int = 1, seed: int = None):
        self.alpha = alpha
        self.n_inits = n_inits
        self.n_sims = n_sims
        self.n_threads = n_threads
        self.seed = seed

    def fit(self, X, y=None):
        n = X.shape[0]
        S = X.T @ X / n
        return self.fit_cov(S, n)

    def fit_cov(self, S, n):
        alpha = self.alpha
        p = S.shape[1]
        assert p > 0 and n >= p
        S = np.asarray(S, np.float64)
        S_logdet = np.linalg.slogdet(S)[1]

        rng = np.random.RandomState(self.seed)
        order = np.arange(1, p)
        chi2_1 = rng.chisquare(order, (self.n_sims, order.size))
        chi2_2 = rng.chisquare(n - p - 1 + order[::-1], (self.n_sims, order.size))

        best_subset = np.arange(max(p - 1, 0))
        for k in range(0, p):
            if k == p - 1:
                best_subset = np.arange(p - 1)
                break
            numer = chi2_1[:, : (p - k - 1)]
            denom = chi2_2[:, (k + 1 - p):]
            samples = np.sum(np.log(1 + numer / denom), axis=-1)
            cutoff = np.quantile(samples, 1 - alpha)

            if k == 0:
                T = float(np.sum(np.log(np.diag(S))) - S_logdet)
                reject = T > cutoff
                best_subset = np.empty(0, dtype=int)
            else:
                n_inits = 1 if k == 1 else self.n_inits
                best_T = np.inf
                reject = True
                for _ in range(n_inits):
                    init = rng.choice(p, k, replace=False)
                    try:
                        st = css_cov(S, method="swapping", subset=init,
                                     loss="subset_factor")
                        T = _subset_factor_T(S, st.subset, S_logdet)
                    except Exception:
                        T = -np.inf
                        st = None
                    if T < best_T:
                        best_T = T
                        if st is not None:
                            best_subset = np.asarray(st.subset, int)
                        else:
                            best_subset = init
                    if T <= cutoff:
                        reject = False
                        break
            if not reject:
                break

        self.subset_ = np.asarray(best_subset, int)
        return self

    def score(self, X, y=None, sample_weight=None):
        """Negative subset factor loss at the fitted subset
        (reference sklearn.py:426)."""
        import warnings

        n, p = X.shape
        subset = self.subset_
        subset_c = np.setdiff1d(np.arange(p), subset)
        S = X.T @ X / n
        S_T = S[np.ix_(subset, subset)]
        S_resid, ok = _resid_given(S, subset)
        if not ok:
            return np.inf
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            loss = np.linalg.slogdet(S_T)[1] + np.sum(
                np.log(np.diag(S_resid)[subset_c])
            )
        if np.isnan(loss):
            loss = -np.inf
        return -float(loss)
