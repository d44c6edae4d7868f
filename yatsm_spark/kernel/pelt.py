"""PELT optimal changepoint detection (Killick, Fearnhead & Eckley,
JASA 2012) with the L2 / mean-shift cost — the OFFLINE, globally
optimal complement to the online CCDC-style monitor (kernel/ccdc.py
finds breaks greedily in arrival order; PELT minimizes a global
penalized cost and may place breaks the online pass cannot see).

Cost of a segment [s, t): sum of squared deviations from the segment
mean, computed from exact int64 cumulative moments as

    C(s, t) = (n*Q - S^2) / n,   n = t-s, S = sum x, Q = sum x^2

— ONE float division of exact integers per evaluation; the dynamic
program then accumulates F sequentially (deterministic order, no
parallel reductions). The PELT pruning step keeps the candidate set
sorted ascending, and argmin takes the FIRST minimum, so ties resolve
to the smallest split point — deterministic output.

Default penalty: 2 * Var(x) * ln(n) (a BIC-style rate with the
series' own population variance as the scale), computed from the same
exact integer moments.
"""

from __future__ import annotations

import math

import numpy as np


def pelt_core(x: np.ndarray, penalty: float | None = None,
              min_size: int = 2) -> np.ndarray:
    """Return the sorted interior changepoint indices of ``x`` — each
    index b marks the START of a new segment (0 < b < n). Empty array
    when the series is unsegmented (or too short)."""
    x = np.asarray(x, dtype=np.int64)
    n = x.size
    if min_size < 1:
        raise ValueError("pelt: min_size must be >= 1")
    if n < 2 * min_size:
        return np.empty(0, dtype=np.int64)
    amax = int(np.abs(x).max()) if n else 0
    if amax > 0 and n * amax * amax >= 2 ** 62:
        raise ValueError("pelt: values too large for exact int64 "
                         "moments; rescale the measure first")
    c1 = np.concatenate(([0], np.cumsum(x, dtype=np.int64)))
    c2 = np.concatenate(([0], np.cumsum(x * x, dtype=np.int64)))

    if penalty is None:
        s_tot, q_tot = int(c1[n]), int(c2[n])
        pvar = (n * q_tot - s_tot * s_tot) / (n * n)
        penalty = 2.0 * pvar * math.log(n)
    penalty = float(penalty)

    # F[t] = optimal cost of x[:t]; prev[t] = argmin split
    F = np.empty(n + 1, dtype=np.float64)
    F[0] = -penalty
    prev = np.zeros(n + 1, dtype=np.int64)
    cand = np.array([0], dtype=np.int64)        # candidate splits, asc
    # Pruning with a min_size twist: the theorem that lets PELT drop a
    # candidate s once F[s] + C(s,t) > F[t] proves s is dominated by a
    # split AT t — which is itself infeasible for targets closer than
    # t + min_size. So a failed candidate EXPIRES at t + min_size
    # instead of vanishing at t; dropping it immediately loses the true
    # optimum near segment boundaries (caught by the brute-force
    # optimality test).
    expiry = np.full(n + 2 * min_size + 2, np.iinfo(np.int64).max,
                     dtype=np.int64)
    for t in range(min_size, n + 1):
        cand = cand[expiry[cand] > t]
        s = cand[t - cand >= min_size]
        if s.size == 0:
            s = np.array([0], dtype=np.int64)
        seg_n = (t - s).astype(np.float64)
        S = (c1[t] - c1[s]).astype(np.float64)
        Q = (c2[t] - c2[s]).astype(np.float64)
        costs = F[s] + ((t - s) * Q - S * S) / seg_n + penalty
        k = int(np.argmin(costs))               # first min: smallest s
        F[t] = costs[k]
        prev[t] = s[k]
        dead = s[F[s] + _seg_cost(c1, c2, s, t) > F[t]]
        expiry[dead] = np.minimum(expiry[dead], t + min_size)
        if t <= n - min_size:
            cand = np.concatenate((cand, [t]))
    cps = []
    t = n
    while t > 0:
        b = int(prev[t])
        if b == 0:
            break
        cps.append(b)
        t = b
    return np.array(sorted(cps), dtype=np.int64)


def _seg_cost(c1, c2, s, t):
    seg_n = (t - s).astype(np.float64)
    S = (c1[t] - c1[s]).astype(np.float64)
    Q = (c2[t] - c2[s]).astype(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        c = ((t - s) * Q - S * S) / seg_n
    return np.where(seg_n > 0, c, 0.0)
