"""Dynamic Time Warping distance for integer-valued series — the exact
elastic re-ranker behind the SAX-word candidate buckets (the same
bucket-then-exact shape as LSH -> exact cosine in
operators/similarity.py, applied to series).

EXACT BY CONSTRUCTION: the local cost is |a_i - b_j| on the raw
integers and the DP is min/add over Python ints — no floats anywhere,
so the distance is bit-identical on any engine, host, or parallelism
with zero snapping machinery.

Optional Sakoe-Chiba band around the SCALED diagonal (j ~ i*m/n, so
unequal lengths stay feasible): cells with |j - i*m/n| > radius are
never expanded, turning O(n*m) into O(n*radius). The banded distance
is a documented variant (an upper bound on the unbanded distance),
pinned by tests against full DTW.
"""

from __future__ import annotations


def dtw_core(a, b, radius: int | None = None) -> int:
    """DTW distance between integer sequences ``a`` and ``b`` with
    |x - y| local cost; full DP when ``radius`` is None."""
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        raise ValueError("dtw: empty series")
    if radius is not None:
        if radius < 1:
            raise ValueError("dtw: radius must be >= 1")
        # feasibility floor: the scaled diagonal steps ~m/n columns per
        # row, so a narrower band than that can strand the corner cell
        # (bands of adjacent rows must overlap and row n must reach m).
        # The requested radius is a MINIMUM; it widens to the length
        # ratio when the pair needs it.
        radius = max(radius, (max(n, m) + min(n, m) - 1) // min(n, m))
    INF = float("inf")
    dp = [INF] * (m + 1)
    dp[0] = 0
    for i in range(1, n + 1):
        if radius is None:
            lo, hi = 1, m
        else:
            mid = ((i - 1) * m) // n + 1
            lo, hi = max(1, mid - radius), min(m, mid + radius)
        new = [INF] * (m + 1)
        ai = a[i - 1]
        row_prev = INF
        for j in range(lo, hi + 1):
            best = dp[j]
            if dp[j - 1] < best:
                best = dp[j - 1]
            if row_prev < best:
                best = row_prev
            d = ai - b[j - 1]
            row_prev = (d if d >= 0 else -d) + best
            new[j] = row_prev
        dp = new
    out = dp[m]
    if out == INF:
        raise ValueError("dtw: band too narrow — no feasible path "
                         "(increase radius)")
    return int(out)
