"""Harmonic + trend design matrices.

Reference parity: ``yatsm/regression/transforms.py::harm`` [H] builds the
patsy-transform harmonic pair ``[cos(2*pi*n*x/P), sin(2*pi*n*x/P)]`` used in
design strings like ``"1 + x + harm(x, 1)"`` (SURVEY.md §2.9). Column order
here reproduces patsy's expansion of that formula — intercept, trend, then
cos/sin pairs per harmonic order — which is load-bearing for coefficient
fixtures (SURVEY.md §7.5.3).
"""

from __future__ import annotations

import numpy as np

#: Default period: one year in days, matching yatsm's Landsat ordinal-day axis.
DEFAULT_PERIOD = 365.25


def harm(x: np.ndarray, n: int, period: float = DEFAULT_PERIOD) -> np.ndarray:
    """The ``harm`` patsy transform: shape (len(x), 2) = [cos, sin] columns.

    Parity anchor: yatsm/regression/transforms.py::harm [H].
    """
    x = np.asarray(x, dtype=np.float64)
    w = 2.0 * np.pi * n / period
    return np.column_stack([np.cos(w * x), np.sin(w * x)])


def harmonic_design(
    t: np.ndarray,
    order: int = 1,
    period: float = DEFAULT_PERIOD,
    trend: bool = True,
    intercept: bool = True,
) -> np.ndarray:
    """Design matrix for ``"1 + x + harm(x,1) + harm(x,2) + ..."``.

    Columns (patsy-compatible order): [1, t, cos1, sin1, cos2, sin2, ...].

    Parity anchor: patsy.dmatrix(design) as built in yatsm/cli/line.py /
    yatsm/algorithms/yatsm.py::setup [M] (SURVEY.md §1.1).
    """
    t = np.asarray(t, dtype=np.float64)
    cols = []
    if intercept:
        cols.append(np.ones_like(t))
    if trend:
        cols.append(t)
    for n in range(1, order + 1):
        h = harm(t, n, period)
        cols.append(h[:, 0])
        cols.append(h[:, 1])
    return np.column_stack(cols)


def n_coef(order: int = 1, trend: bool = True, intercept: bool = True) -> int:
    """Number of design-matrix columns for a given configuration."""
    return int(intercept) + int(trend) + 2 * order
