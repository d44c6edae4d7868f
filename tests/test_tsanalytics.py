"""Edge semantics of the series-shape analytics operators
(operators/tsanalytics.py): candlestick, state durations, uptime
intervals, ACF, seasonal decomposition. The driver rows (tx_ohlc,
tx_state_durations, tx_uptime, tx_acf, tx_seasonal) pin cross-engine
exactness at sf0.01; these tests pin the boundary behavior those rows
can't isolate."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from yatsm_spark.operators.tsanalytics import (
    acf, ohlc, seasonal_decompose, state_durations, uptime_intervals)

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _tier(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "window_start",
                                    "turn_count"]))


def test_ohlc_single_slot_bucket(spark):
    t = _tier(spark, [("c1", T0, 7)])
    r = ohlc(t, "turn_count", 3600).collect()[0]
    assert (r["open"], r["high"], r["low"], r["close"], r["n_slots"]) \
        == (7, 7, 7, 7, 1)


def test_ohlc_open_close_by_time_not_value(spark):
    rows = [("c1", T0 + dt.timedelta(minutes=m), v)
            for m, v in [(0, 5), (10, 99), (20, 1), (59, 3)]]
    r = ohlc(_tier(spark, rows), "turn_count", 3600).collect()[0]
    assert (r["open"], r["high"], r["low"], r["close"]) == (5, 99, 1, 3)


def _turns(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "ts"]))


def test_state_durations_last_event_holds_zero(spark):
    rows = [("c1", 0, "user", T0),
            ("c1", 1, "assistant", T0 + dt.timedelta(seconds=10)),
            ("c1", 2, "user", T0 + dt.timedelta(seconds=25))]
    out = {r["state"]: r for r in state_durations(_turns(spark, rows))
           .collect()}
    assert out["user"]["total_us"] == 10_000_000  # final turn holds 0
    assert out["assistant"]["total_us"] == 15_000_000
    assert out["user"]["n_runs"] == 2 and out["assistant"]["n_runs"] == 1


def test_state_durations_run_merging(spark):
    rows = [("c1", i, "user", T0 + dt.timedelta(seconds=i))
            for i in range(5)]
    r = state_durations(_turns(spark, rows)).collect()[0]
    assert r["n_events"] == 5 and r["n_runs"] == 1
    assert r["total_us"] == 4_000_000


def test_uptime_gap_exactly_tolerance_is_live(spark):
    rows = [("c1", 0, "user", T0),
            ("c1", 1, "user", T0 + dt.timedelta(seconds=300))]
    r = uptime_intervals(_turns(spark, rows), 300).collect()[0]
    assert r["n_intervals"] == 1 and r["uptime_us"] == 300_000_000


def test_uptime_tied_beats_single_island(spark):
    # two events at the same microsecond must never split an island,
    # whichever way the sort breaks the tie (the RANGE-frame contract)
    rows = [("c1", 0, "user", T0), ("c1", 1, "assistant", T0),
            ("c1", 2, "user", T0 + dt.timedelta(seconds=60))]
    r = uptime_intervals(_turns(spark, rows), 300).collect()[0]
    assert r["n_intervals"] == 1
    assert r["uptime_us"] == 60_000_000 == r["span_us"]


def test_uptime_splits_past_tolerance(spark):
    rows = [("c1", 0, "user", T0),
            ("c1", 1, "user", T0 + dt.timedelta(seconds=301))]
    r = uptime_intervals(_turns(spark, rows), 300).collect()[0]
    assert r["n_intervals"] == 2 and r["uptime_us"] == 0
    assert r["span_us"] == 301_000_000


def test_acf_constant_series_is_null(spark):
    rows = [("c1", T0 + dt.timedelta(minutes=i), 5) for i in range(20)]
    out = acf(_tier(spark, rows), "turn_count", 3).collect()
    assert len(out) == 3 and all(r["acf"] is None for r in out)


def test_acf_matches_numpy_reference(spark):
    rng = np.random.default_rng(7)
    xs = rng.integers(0, 50, size=64)
    rows = [("c1", T0 + dt.timedelta(minutes=i), int(v))
            for i, v in enumerate(xs)]
    got = {r["lag"]: r["acf"] for r in
           acf(_tier(spark, rows), "turn_count", 4).collect()}
    m = xs.mean()
    c0 = ((xs - m) ** 2).sum()
    for lag in range(1, 5):
        ref = (((xs[lag:] - m) * (xs[:-lag] - m)).sum()) / c0
        assert got[lag] == pytest.approx(ref, abs=2e-6)


def test_seasonal_reconstructs_and_edges_null(spark):
    rng = np.random.default_rng(11)
    n, p = 96, 24
    base = 10 + 5 * np.sin(2 * np.pi * np.arange(n) / p)
    xs = np.maximum(0, (base + rng.integers(0, 3, size=n))).astype(int)
    rows = [("c1", T0 + dt.timedelta(hours=i), int(v))
            for i, v in enumerate(xs)]
    out = (seasonal_decompose(_tier(spark, rows), "turn_count", p, 3600)
           .orderBy("window_start").collect())
    assert len(out) == n
    # edges: first/last half-period rows have no complete MA window
    for r in out[: p // 2] + out[-p // 2:]:
        assert r["trend"] is None and r["resid"] is None
    # interior: x ~= trend + seasonal + resid within snapping slack
    for r in out[p // 2: -p // 2]:
        rec = r["trend"] + r["seasonal"] + r["resid"]
        assert rec == pytest.approx(r["turn_count"], abs=3e-6)
        assert 0 <= r["phase"] < p


def test_seasonal_requires_even_period(spark):
    with pytest.raises(ValueError):
        seasonal_decompose(_tier(spark, [("c1", T0, 1)]), period=23)


def test_acf_requires_positive_lag(spark):
    with pytest.raises(ValueError):
        acf(_tier(spark, [("c1", T0, 1)]), max_lag=0)
