"""DTW kernel: known distances, identity/symmetry, band semantics, and
the distributed pairs-join operator."""

import datetime as dt

import numpy as np
import pytest

from yatsm_spark.kernel.dtw import dtw_core

T0 = dt.datetime(2026, 1, 1)


def _brute_dtw(a, b):
    """Independent reference: plain dict DP, no banding, no rolling
    arrays."""
    import itertools

    n, m = len(a), len(b)
    D = {(0, 0): 0}
    for i, j in itertools.product(range(1, n + 1), range(1, m + 1)):
        best = min(D.get((i - 1, j), float("inf")),
                   D.get((i, j - 1), float("inf")),
                   D.get((i - 1, j - 1), float("inf")))
        D[(i, j)] = abs(a[i - 1] - b[j - 1]) + best
    return D[(n, m)]


def test_dtw_known_values():
    assert dtw_core([1, 2, 3], [1, 2, 3]) == 0
    assert dtw_core([1, 1, 1], [2, 2, 2]) == 3
    # classic elastic match: a stretched copy costs nothing
    assert dtw_core([1, 5, 9], [1, 1, 5, 5, 9, 9]) == 0
    assert dtw_core([0], [7]) == 7


def test_dtw_matches_bruteforce_and_symmetry():
    rng = np.random.default_rng(8)
    for _ in range(20):
        a = rng.integers(0, 30, size=int(rng.integers(1, 12))).tolist()
        b = rng.integers(0, 30, size=int(rng.integers(1, 12))).tolist()
        d = dtw_core(a, b)
        assert d == _brute_dtw(a, b)
        assert d == dtw_core(b, a)          # symmetric cost


def test_dtw_band_semantics():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 20, size=40).tolist()
    b = rng.integers(0, 20, size=40).tolist()
    full = dtw_core(a, b)
    # a generous band reproduces full DTW; a narrow band upper-bounds it
    assert dtw_core(a, b, radius=40) == full
    assert dtw_core(a, b, radius=2) >= full
    # unequal lengths stay feasible via the scaled diagonal
    assert dtw_core(a, b[:13], radius=3) >= dtw_core(a, b[:13])


def test_dtw_guards():
    with pytest.raises(ValueError, match="empty"):
        dtw_core([], [1])
    with pytest.raises(ValueError, match="radius"):
        dtw_core([1, 2], [1, 2], radius=0)


def test_dtw_rerank_operator(spark):
    from yatsm_spark.operators.dtw import dtw_rerank

    rng = np.random.default_rng(5)
    rows, series = [], {}
    for c in ("c1", "c2", "c3"):
        xs = rng.integers(0, 25, size=20).tolist()
        series[c] = xs
        rows += [(c, T0 + dt.timedelta(hours=i), int(v))
                 for i, v in enumerate(xs)]
    tier = spark.createDataFrame(
        rows, "conv_id string, window_start timestamp, turn_count long")
    pairs = spark.createDataFrame(
        [("c1", "c2"), ("c1", "c3")], "conv_a string, conv_b string")
    got = {(r["conv_a"], r["conv_b"]): r
           for r in dtw_rerank(tier, pairs).collect()}
    assert set(got) == {("c1", "c2"), ("c1", "c3")}
    for (ca, cb), r in got.items():
        assert r["dtw"] == dtw_core(series[ca], series[cb])
        assert r["len_a"] == r["len_b"] == 20
    # over-long series raise instead of silently downsampling
    with pytest.raises(Exception, match="max_n"):
        dtw_rerank(tier, pairs, max_n=5).collect()


def test_dtw_rerank_nonstring_keys(spark):
    """Key dtypes come from the pairs frame, not hardcoded string."""
    from yatsm_spark.operators.dtw import dtw_rerank

    rows = [(c, T0 + dt.timedelta(hours=i), v)
            for c in (1, 2) for i, v in enumerate([3, 1, 4, 1, 5])]
    tier = spark.createDataFrame(
        rows, "conv_id long, window_start timestamp, turn_count long")
    pairs = spark.createDataFrame([(1, 2)], "conv_a long, conv_b long")
    out = dtw_rerank(tier, pairs).collect()
    assert len(out) == 1 and out[0]["dtw"] == 0
    assert dict(dtw_rerank(tier, pairs).dtypes)["conv_a"] == "bigint"
