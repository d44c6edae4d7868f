"""Pluggable estimators (OLS / Lasso / RLM) behind one tiny interface.

Parity anchor: yatsm/regression/packaged.py::find_packaged_regressor [M] —
the reference ships sklearn-API estimators as versioned pickles
(``OLS``, ``sklearn_Lasso20`` alpha=20, ``rlm_maxiter10``); we use a plain
registry keyed by name instead (SURVEY.md §2.9). Determinism notes
SURVEY.md §7.5.2: inputs are float64 and arrive in a deterministic order,
so sklearn's coordinate descent (and trivially OLS) are reproducible.
"""

from __future__ import annotations

import numpy as np

from yatsm_spark.kernel.robust import rlm_fit


class OLS:
    """Least squares via lstsq. coef_ covers ALL design columns (no separate
    intercept — the design matrix carries its own intercept column)."""

    name = "OLS"

    def __init__(self) -> None:
        self.coef_: np.ndarray | None = None

    def fit(self, X: np.ndarray, y: np.ndarray) -> "OLS":
        self.coef_, *_ = np.linalg.lstsq(
            np.asarray(X, dtype=np.float64), np.asarray(y, dtype=np.float64), rcond=None
        )
        return self

    def predict(self, X: np.ndarray) -> np.ndarray:
        return np.asarray(X, dtype=np.float64) @ self.coef_


class Lasso:
    """L1-penalized least squares. Uses sklearn when available (reference
    used sklearn/glmnet Lasso with alpha=20 on reflectance scale); falls
    back to coordinate descent in numpy so the engine has no hard sklearn
    dependency. Intercept column (all-ones first design column) is NOT
    penalized, matching glmnet/sklearn fit_intercept semantics."""

    name = "Lasso"

    def __init__(self, alpha: float = 20.0, max_iter: int = 1000, tol: float = 1e-6):
        self.alpha = alpha
        self.max_iter = max_iter
        self.tol = tol
        self.coef_: np.ndarray | None = None

    def fit(self, X: np.ndarray, y: np.ndarray) -> "Lasso":
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        n, k = X.shape
        beta = np.zeros(k)
        # Precompute column norms; coordinate descent on standardized problem.
        col_ss = (X ** 2).sum(axis=0)
        col_ss[col_ss == 0] = 1.0
        resid = y - X @ beta
        # sklearn's objective: 1/(2n)||y-Xb||^2 + alpha*||b||_1
        # → soft-threshold at n*alpha per coordinate step.
        thr = self.alpha * n
        unpenalized = np.all(X == 1.0, axis=0)  # intercept-like columns
        for _ in range(self.max_iter):
            max_delta = 0.0
            for j in range(k):
                old = beta[j]
                rho = X[:, j] @ resid + old * col_ss[j]
                if unpenalized[j]:
                    new = rho / col_ss[j]
                else:
                    new = np.sign(rho) * max(abs(rho) - thr, 0.0) / col_ss[j]
                if new != old:
                    resid += X[:, j] * (old - new)
                    beta[j] = new
                    max_delta = max(max_delta, abs(new - old))
            if max_delta < self.tol:
                break
        self.coef_ = beta
        return self

    def predict(self, X: np.ndarray) -> np.ndarray:
        return np.asarray(X, dtype=np.float64) @ self.coef_


class GlmnetLasso:
    """glmnet-semantics Lasso: predictors are standardized to unit variance
    (1/n denominator, glmnet's convention) BEFORE the L1 penalty applies,
    then coefficients are back-transformed to the original scale.

    Parity anchor: yatsm/regression/packaged.py ships BOTH
    ``sklearn_Lasso20`` and ``glmnet_Lasso20`` pickles [M] — the two differ
    exactly here: sklearn penalizes raw-scale coefficients, glmnet
    penalizes standardized ones, so with a mixed-scale design (trend in
    epoch-days vs unit-amplitude harmonics) the shrinkage pattern differs.
    Implemented as coordinate descent on the standardized problem (reuses
    the same soft-threshold loop shape as Lasso); no glmnet/Fortran dep."""

    name = "GlmnetLasso"

    def __init__(self, alpha: float = 20.0, max_iter: int = 1000, tol: float = 1e-8):
        self.alpha = alpha
        self.max_iter = max_iter
        self.tol = tol
        self.coef_: np.ndarray | None = None

    def fit(self, X: np.ndarray, y: np.ndarray) -> "GlmnetLasso":
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        n, k = X.shape
        unpenalized = np.all(X == 1.0, axis=0)  # intercept-like columns
        mean = X.mean(axis=0)
        sd = X.std(axis=0)  # 1/n, glmnet convention
        sd[(sd == 0) | unpenalized] = 1.0
        mean[unpenalized] = 0.0
        Xs = (X - mean) / sd
        Xs[:, unpenalized] = 1.0

        beta = np.zeros(k)
        col_ss = (Xs ** 2).sum(axis=0)
        col_ss[col_ss == 0] = 1.0
        resid = y - Xs @ beta
        thr = self.alpha * n  # objective 1/(2n)||y-Xs b||^2 + alpha ||b||_1
        for _ in range(self.max_iter):
            max_delta = 0.0
            for j in range(k):
                old = beta[j]
                rho = Xs[:, j] @ resid + old * col_ss[j]
                if unpenalized[j]:
                    new = rho / col_ss[j]
                else:
                    new = np.sign(rho) * max(abs(rho) - thr, 0.0) / col_ss[j]
                if new != old:
                    resid += Xs[:, j] * (old - new)
                    beta[j] = new
                    max_delta = max(max_delta, abs(new - old))
            if max_delta < self.tol:
                break
        # back-transform: b_j = bs_j / sd_j; fold centering into intercepts.
        coef = beta / sd
        coef[unpenalized] = beta[unpenalized]
        shift = float((beta[~unpenalized] * mean[~unpenalized]
                       / sd[~unpenalized]).sum()) if (~unpenalized).any() else 0.0
        n_int = int(unpenalized.sum())
        if n_int:
            coef[unpenalized] -= shift / n_int
        self.coef_ = coef
        return self

    def predict(self, X: np.ndarray) -> np.ndarray:
        return np.asarray(X, dtype=np.float64) @ self.coef_


class RLM:
    """Robust M-estimator wrapper over kernel.robust.rlm_fit.

    Parity anchor: yatsm/regression/robust_fit.py::RLM [H]; packaged default
    is maxiter=10 (``rlm_maxiter10``)."""

    name = "RLM"

    def __init__(self, maxiter: int = 10):
        self.maxiter = maxiter
        self.coef_: np.ndarray | None = None

    def fit(self, X: np.ndarray, y: np.ndarray) -> "RLM":
        self.coef_ = rlm_fit(X, y, maxiter=self.maxiter).coef
        return self

    def predict(self, X: np.ndarray) -> np.ndarray:
        return np.asarray(X, dtype=np.float64) @ self.coef_


#: Estimator registry (reference: pickles/pickles.json names [M]).
ESTIMATORS = {
    "OLS": OLS,
    "Lasso20": lambda: Lasso(alpha=20.0),
    "sklearn_Lasso20": lambda: Lasso(alpha=20.0),   # reference pickle name
    "glmnet_Lasso20": lambda: GlmnetLasso(alpha=20.0),
    "rlm_maxiter10": lambda: RLM(maxiter=10),
}


def make_estimator(name: str):
    try:
        return ESTIMATORS[name]()
    except KeyError:
        raise KeyError(f"unknown estimator {name!r}; known: {sorted(ESTIMATORS)}")
