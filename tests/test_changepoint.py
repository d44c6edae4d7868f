"""PELT changepoints: global optimality vs exhaustive enumeration,
planted-shift recovery, penalty extremes, and the Spark operator's
plumbing."""

import datetime as dt
import itertools

import numpy as np
import pytest

from yatsm_spark.kernel.pelt import pelt_core

T0 = dt.datetime(2026, 1, 1)


def _seg_cost(x, s, t):
    seg = x[s:t].astype(float)
    return float(((seg - seg.mean()) ** 2).sum())


def _brute_optimum(x, penalty, min_size):
    """Exhaustive minimum over ALL valid segmentations — the ground
    truth PELT's pruning must never beat or miss."""
    n = len(x)
    best = None
    positions = list(range(min_size, n - min_size + 1))
    for r in range(len(positions) + 1):
        for bps in itertools.combinations(positions, r):
            bounds = [0] + list(bps) + [n]
            if any(b - a < min_size for a, b in zip(bounds, bounds[1:])):
                continue
            c = sum(_seg_cost(x, a, b)
                    for a, b in zip(bounds, bounds[1:])) \
                + penalty * len(bps)
            if best is None or c < best - 1e-9:
                best = c
    return best


def test_pelt_is_globally_optimal():
    rng = np.random.default_rng(11)
    for trial in range(40):
        n = int(rng.integers(6, 14))
        ms = int(rng.choice([1, 2, 3]))
        if n < 2 * ms:
            continue
        x = rng.integers(0, 25, size=n)
        pen = float(rng.choice([0.5, 5.0, 20.0, 80.0, 300.0]))
        got = list(pelt_core(x, pen, ms))
        bounds = [0] + got + [n]
        gc = sum(_seg_cost(x, a, b)
                 for a, b in zip(bounds, bounds[1:])) + pen * len(got)
        assert gc == pytest.approx(_brute_optimum(x, pen, ms),
                                   abs=1e-6), (trial, x, pen, ms)


def test_pelt_planted_shifts_and_extremes():
    x = np.array([5] * 20 + [50] * 20 + [5] * 20)
    assert list(pelt_core(x, 100.0)) == [20, 40]
    assert list(pelt_core(x, 1e12)) == []          # huge penalty: none
    rng = np.random.default_rng(2)
    noisy = rng.integers(0, 50, size=30)
    assert len(pelt_core(noisy, 0.5)) > 5          # tiny penalty: many
    # default per-series penalty still finds the hard shift
    assert list(pelt_core(x, None)) == [20, 40]


def test_pelt_guards_and_short_series():
    assert pelt_core(np.array([1, 2, 3]), 10.0).size == 0
    with pytest.raises(ValueError, match="min_size"):
        pelt_core(np.arange(10), 1.0, min_size=0)
    with pytest.raises(ValueError, match="too large"):
        pelt_core(np.array([2 ** 40] * 8), 1.0)


def test_spark_operator_matches_kernel(spark):
    from yatsm_spark.operators.changepoint import pelt_changepoints

    rng = np.random.default_rng(4)
    rows, series = [], {}
    for c in ("c1", "c2"):
        xs = np.concatenate([rng.integers(0, 6, 25),
                             rng.integers(40, 46, 25)])
        series[c] = xs
        rows += [(c, T0 + dt.timedelta(hours=int(i)), int(v))
                 for i, v in enumerate(xs)]
    # a flat conv that emits nothing
    rows += [("c3", T0 + dt.timedelta(hours=i), 7) for i in range(30)]
    df = spark.createDataFrame(
        rows, "conv_id string, window_start timestamp, turn_count long")
    got = pelt_changepoints(df, "turn_count").toPandas() \
        .sort_values(["conv_id", "cp_ord"])
    assert set(got.conv_id) == {"c1", "c2"}
    for c, xs in series.items():
        want = list(pelt_core(xs))
        g = got[got.conv_id == c]
        assert list(g["idx"]) == want
        assert list(g["cp_ord"]) == list(range(1, len(want) + 1))
        assert (g["n_changepoints"] == len(want)).all()
        # the slot column is the idx-th slot
        assert list(g["window_start"]) == \
            [T0 + dt.timedelta(hours=int(i)) for i in want]


def test_kleinberg_planted_burst():
    from yatsm_spark.kernel.bursts import kleinberg_bursts

    t, cur = [], 0
    for _ in range(40):
        t.append(cur)
        cur += 60_000_000
    for _ in range(30):
        t.append(cur)
        cur += 2_000_000
    for _ in range(40):
        t.append(cur)
        cur += 60_000_000
    bursts = kleinberg_bursts(np.array(t), s=3.0, gamma=1.0)
    assert len(bursts) == 1
    b0, b1, ne = bursts[0]
    assert (b0, b1, ne) == (2_400_000_000, 2_460_000_000, 31)
    # homogeneous stream: no bursts
    rng = np.random.default_rng(0)
    t2 = (np.cumsum(rng.exponential(60, 100)) * 1e6).astype(np.int64)
    assert kleinberg_bursts(t2, s=3.0, gamma=1.0) == []
    # guards / degenerate inputs
    assert kleinberg_bursts(np.array([0, 10])) == []
    assert kleinberg_bursts(np.array([5, 5, 5])) == []   # zero span
    with pytest.raises(ValueError, match="s must be"):
        kleinberg_bursts(np.array([0, 1, 2]), s=1.0)


def test_burst_operator_matches_kernel(spark):
    from yatsm_spark.kernel.bursts import kleinberg_bursts
    from yatsm_spark.operators.changepoint import burst_intervals

    t, cur = [], 0
    for _ in range(20):
        t.append(cur)
        cur += 60_000_000
    for _ in range(15):
        t.append(cur)
        cur += 1_000_000
    for _ in range(20):
        t.append(cur)
        cur += 60_000_000
    rows = [("c1", i, "user", dt.datetime(2026, 1, 1)
             + dt.timedelta(microseconds=int(us)))
            for i, us in enumerate(t)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts timestamp")
    got = burst_intervals(df, s=3.0, gamma=1.0).collect()
    base = int(dt.datetime(2026, 1, 1)
               .replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
    want = kleinberg_bursts(np.array(t) + base, 3.0, 1.0)
    # compare interval geometry (absolute epoch depends on session tz)
    assert [(r["end_us"] - r["start_us"], r["n_events"]) for r in got] \
        == [(e - s0, ne) for s0, e, ne in want]
    assert all(r["burst_end"] > r["burst_start"] for r in got)
