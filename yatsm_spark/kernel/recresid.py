"""Recursive residuals (standardized one-step-ahead forecast errors).

Parity anchor: yatsm/regression/recresid.py::recresid [H] — itself a port of
R strucchange's ``recresid`` (SURVEY.md §2.8). Feeds the OLS-CUSUM omission
test (yatsm/algorithms/postprocess.py::omission_test [M]).

Definition (Brown, Durbin & Evans 1975): with beta_{r-1} the OLS fit on the
first r-1 rows,

    w_r = (y_r - x_r' beta_{r-1}) / sqrt(1 + x_r' (X_{r-1}' X_{r-1})^-1 x_r)

for r = k+1 .. n (k = number of regressors). Implemented with rank-1
Sherman-Morrison updates of (X'X)^-1; cross-checked against brute-force
per-step OLS in tests/test_recresid.py.
"""

from __future__ import annotations

import numpy as np


def recresid(X: np.ndarray, y: np.ndarray, span: int | None = None) -> np.ndarray:
    """Return the (n - span) recursive residuals.

    span defaults to k = X.shape[1] (minimum identifiable window).
    """
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n, k = X.shape
    if span is None:
        span = k
    if span < k:
        raise ValueError(f"span={span} < n_features={k}")
    if n <= span:
        return np.empty(0, dtype=np.float64)

    X0, y0 = X[:span], y[:span]
    # Maintain the normal equations incrementally and solve per step —
    # O(n·k^3) with tiny k, numerically stable over long series (rank-1
    # inverse updates drift after a few hundred steps).
    XtX = X0.T @ X0
    Xty = X0.T @ y0
    beta = np.linalg.lstsq(X0, y0, rcond=None)[0]

    out = np.empty(n - span, dtype=np.float64)
    for i, r in enumerate(range(span, n)):
        x_r = X[r]
        try:
            d = np.linalg.solve(XtX, x_r)
        except np.linalg.LinAlgError:
            d = np.linalg.pinv(XtX) @ x_r
        fr = 1.0 + x_r @ d
        resid = y[r] - x_r @ beta
        out[i] = resid / np.sqrt(max(fr, 1.0))
        XtX += np.outer(x_r, x_r)
        Xty += x_r * y[r]
        try:
            beta = np.linalg.solve(XtX, Xty)
        except np.linalg.LinAlgError:
            beta = np.linalg.pinv(XtX) @ Xty
    return out


def cusum_efp(w: np.ndarray) -> np.ndarray:
    """Empirical fluctuation process: cumulative sum of standardized recresids.

    Parity anchor: strucchange efp(type="Rec-CUSUM") semantics as used by
    yatsm/algorithms/postprocess.py::omission_test [M].
    """
    w = np.asarray(w, dtype=np.float64)
    if len(w) == 0:
        return w
    sigma = np.std(w, ddof=1) if len(w) > 1 else 1.0
    if sigma == 0:
        sigma = 1.0
    return np.cumsum(w) / (sigma * np.sqrt(len(w)))


def omission_test_stat(X: np.ndarray, y: np.ndarray) -> float:
    """Max |Rec-CUSUM| statistic for a fitted segment (higher = likelier
    missed break). Compared against the crit value by the caller."""
    w = recresid(X, y)
    if len(w) == 0:
        return 0.0
    return float(np.max(np.abs(cusum_efp(w))))
