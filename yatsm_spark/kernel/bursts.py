"""Kleinberg burst detection (Kleinberg, KDD 2002), two-state
automaton, over one conversation's raw turn arrival times — finds the
intervals where the turn rate jumps to a multiple of the conv's own
base rate. Complements the tier-based detectors (rolling_anomaly's
per-slot z-test, PELT's mean-shift segmentation) with the classic
EVENT-GAP formulation: no tier, no binning, microsecond arrivals in,
burst intervals out.

Model: inter-arrival gaps are exponential; state 0 has the base rate
lambda0 = (n-1)/span, state 1 has lambda1 = s * lambda0. Viterbi
minimizes sum of -ln(lambda e^{-lambda g}) plus gamma * ln(n) per
0->1 transition (re-entering costs again; leaving is free — the
original paper's asymmetric transition cost).

Determinism: float math throughout (ln is unavoidable in the model),
but the kernel is the SAME code on both sides of the golden-twin
differential, the DP accumulates sequentially, and ties prefer state 0
(documented), so output is reproducible at any parallelism.
"""

from __future__ import annotations

import math

import numpy as np


def kleinberg_bursts(t_us: np.ndarray, s: float = 3.0,
                     gamma: float = 1.0) -> list[tuple[int, int, int]]:
    """Burst intervals of one series of event times (int64 epoch
    microseconds, any order): list of (start_us, end_us, n_events),
    ordered by start. Empty for fewer than 3 events, a zero span, or
    s <= 1."""
    if s <= 1.0:
        raise ValueError("bursts: rate scaling s must be > 1")
    t = np.sort(np.asarray(t_us, dtype=np.int64))
    n = t.size
    if n < 3:
        return []
    span_s = float(t[-1] - t[0]) / 1e6
    if span_s <= 0.0:
        return []
    gaps = (t[1:] - t[:-1]).astype(np.float64) / 1e6  # seconds
    m = gaps.size
    lam0 = m / span_s
    lam1 = s * lam0
    ln0, ln1 = math.log(lam0), math.log(lam1)
    trans = gamma * math.log(n)

    # Viterbi over states {0, 1}; ties prefer state 0
    c0, c1 = 0.0, trans
    from0 = np.empty(m, dtype=np.bool_)   # best predecessor of state 0
    from0_1 = np.empty(m, dtype=np.bool_)  # ...of state 1
    for i in range(m):
        g = float(gaps[i])
        e0 = -ln0 + lam0 * g
        e1 = -ln1 + lam1 * g
        # into state 0: from 0 (free) or from 1 (free)
        n0 = (c0, True) if c0 <= c1 else (c1, False)
        # into state 1: from 1 (free) or from 0 (pay trans)
        n1 = (c0 + trans, True) if c0 + trans < c1 else (c1, False)
        from0[i], from0_1[i] = n0[1], n1[1]
        c0, c1 = n0[0] + e0, n1[0] + e1
    # backtrack
    state = 0 if c0 <= c1 else 1
    states = np.empty(m, dtype=np.int8)
    for i in range(m - 1, -1, -1):
        states[i] = state
        came_from_0 = from0[i] if state == 0 else from0_1[i]
        state = 0 if came_from_0 else 1
    out = []
    i = 0
    while i < m:
        if states[i] == 1:
            j = i
            while j + 1 < m and states[j + 1] == 1:
                j += 1
            out.append((int(t[i]), int(t[j + 1]), j - i + 2))
            i = j + 1
        i += 1
    return out
