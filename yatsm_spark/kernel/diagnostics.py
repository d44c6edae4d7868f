"""Model diagnostics.

Parity anchor: yatsm/regression/diagnostics.py::rmse [H] (SURVEY.md §2.4 A1).
"""

from __future__ import annotations

import numpy as np


def rmse(y: np.ndarray, yhat: np.ndarray) -> float:
    """sqrt(mean((y - yhat)^2)) — training RMSE, no dof correction.

    Parity anchor: yatsm/regression/diagnostics.py::rmse [H].
    """
    y = np.asarray(y, dtype=np.float64)
    yhat = np.asarray(yhat, dtype=np.float64)
    return float(np.sqrt(np.mean((y - yhat) ** 2)))
