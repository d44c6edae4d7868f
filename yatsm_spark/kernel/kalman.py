"""Scalar local-level Kalman filter + RTS smoother — pure numpy, zero
Spark imports (the kernel/ discipline), zero BLAS reductions (scalar
recursions only, so summation order is fixed and the same bytes come out
on every host — see tools/make_goldens.py header).

Model (Harvey 1989 local level / random-walk-plus-noise):

    x_t = x_{t-1} + w_t,   w_t ~ N(0, q)
    y_t = x_t    + v_t,    v_t ~ N(0, r)

NaN observations are missing: the filter runs its predict step and skips
the update, which is exactly how gap slots should be treated when the
caller chooses NOT to read gap-filled zeros as real observations.

Emitted levels are snapped to the 1e-6 grid (floor(x*1e6+0.5)/1e6, the
engine-wide float policy) AFTER the recursion, so the recursion dynamics
are untouched but persisted goldens compare exactly.
"""

from __future__ import annotations

import numpy as np


def _snap6(a: np.ndarray) -> np.ndarray:
    return np.floor(a * 1e6 + 0.5) / 1e6


def kalman_local_level(y: np.ndarray, q: float = 1.0, r: float = 4.0,
                       p0: float = 1e6):
    """Filter + RTS-smooth one series.

    Parameters: y float array (NaN = missing), process variance q,
    observation variance r, diffuse initial variance p0 (the first
    observation essentially initializes the level).

    Returns (level, level_var, smoothed): the filtered mean/variance and
    the RTS-smoothed mean, all float64 arrays of len(y), micro-snapped.
    All-NaN input returns NaN arrays.
    """
    y = np.asarray(y, dtype=np.float64)
    n = y.size
    if n == 0:
        z = np.empty(0, dtype=np.float64)
        return z, z.copy(), z.copy()
    if np.all(np.isnan(y)):
        z = np.full(n, np.nan)
        return z, z.copy(), z.copy()

    m_pred = np.empty(n)
    p_pred = np.empty(n)
    m_filt = np.empty(n)
    p_filt = np.empty(n)

    first = int(np.flatnonzero(~np.isnan(y))[0])
    m, p = (y[first] if not np.isnan(y[first]) else 0.0), p0
    # use the first observation as the prior mean: a diffuse but
    # deterministic start (no data-dependent branching afterwards)
    for t in range(n):
        if t > 0:
            p = p + q
        m_pred[t] = m
        p_pred[t] = p
        if not np.isnan(y[t]):
            k = p / (p + r)
            m = m + k * (y[t] - m)
            p = (1.0 - k) * p
        m_filt[t] = m
        p_filt[t] = p

    ms = np.empty(n)
    ms[n - 1] = m_filt[n - 1]
    for t in range(n - 2, -1, -1):
        c = p_filt[t] / p_pred[t + 1]
        ms[t] = m_filt[t] + c * (ms[t + 1] - m_pred[t + 1])

    return _snap6(m_filt), _snap6(p_filt), _snap6(ms)
