"""LTTB (Largest-Triangle-Three-Buckets) downsampling kernel —
Steinarsson 2013, the standard visualization downsample in time-series
engines (TimescaleDB ``lttb()``, Grafana). Pure numpy, no Spark imports:
shared verbatim between the Spark operator (operators/downsample.py)
and the golden twin (tools/make_goldens.py), so the driver differential
covers exactly the Spark plumbing.

Selection is index-based: the floats (bucket means, triangle areas) only
PICK rows; emitted values are the original integers, so the output is
integer-exact and the cross-engine float policy is trivially satisfied.
Ties in triangle area resolve to the lowest index (np.argmax first
occurrence) — deterministic by construction.
"""

from __future__ import annotations

import numpy as np


def lttb_indices(t: np.ndarray, v: np.ndarray, n_out: int) -> np.ndarray:
    """Indices of the n_out LTTB-selected points of the series (t, v),
    which must be sorted ascending by t. First and last points are
    always kept; each interior bucket keeps the point forming the
    largest triangle with the previously selected point and the next
    bucket's mean.
    """
    n = len(t)
    if len(v) != n:
        raise ValueError("t and v must have equal length")
    if n_out < 3:
        raise ValueError("n_out must be >= 3")
    if n_out >= n:
        return np.arange(n, dtype=np.int64)
    t = np.asarray(t, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    idx = np.empty(n_out, dtype=np.int64)
    idx[0] = 0
    idx[-1] = n - 1
    every = (n - 2) / (n_out - 2)
    a = 0
    for i in range(n_out - 2):
        start = int(np.floor(i * every)) + 1
        end = int(np.floor((i + 1) * every)) + 1
        nstart = end
        nend = min(int(np.floor((i + 2) * every)) + 1, n)
        if nend > nstart:
            avg_t = t[nstart:nend].mean()
            avg_v = v[nstart:nend].mean()
        else:  # final virtual bucket = the fixed last point
            avg_t, avg_v = t[n - 1], v[n - 1]
        tt = t[start:end]
        vv = v[start:end]
        area = np.abs((t[a] - avg_t) * (vv - v[a]) - (t[a] - tt) * (avg_v - v[a]))
        a = start + int(np.argmax(area))
        idx[i + 1] = a
    return idx


def lttb_frame(ts_ns: np.ndarray, values: np.ndarray, n_out: int):
    """(row_indices, positions): LTTB over int64-nanosecond timestamps —
    the exact call both the Spark operator and the golden twin make, so
    the float path (ns -> seconds double) is shared too."""
    t = np.asarray(ts_ns, dtype=np.int64).astype(np.float64) / 1e9
    sel = lttb_indices(t, np.asarray(values, dtype=np.float64), n_out)
    return sel, np.arange(len(sel), dtype=np.int32)
