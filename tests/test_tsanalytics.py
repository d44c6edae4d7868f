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


def test_acf_pairless_lag_is_null_not_zero(spark):
    """A lag with zero pairs (series length <= lag) must emit NULL,
    not 0.0 — 0.0 is a meaningful correlation value (ADVICE r4)."""
    rows = [("c1", T0 + dt.timedelta(minutes=i), v)
            for i, v in enumerate([3, 9, 1])]
    out = {r["lag"]: r["acf"]
           for r in acf(_tier(spark, rows), "turn_count", 5).collect()}
    assert out[1] is not None and out[2] is not None
    assert out[3] is None and out[4] is None and out[5] is None


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


def _tier2(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "window_start",
                                    "turn_count", "tool_call_count"]))


def test_ccf_matches_numpy_reference(spark):
    from yatsm_spark.operators.tsanalytics import ccf

    rng = np.random.default_rng(13)
    xs = rng.integers(0, 50, size=64)
    ys = np.roll(xs, 2) + rng.integers(0, 5, size=64)  # y lags x by 2
    rows = [("c1", T0 + dt.timedelta(hours=i), int(x), int(y))
            for i, (x, y) in enumerate(zip(xs, ys))]
    got = {r["lag"]: r["ccf"] for r in
           ccf(_tier2(spark, rows), "turn_count", "tool_call_count", 3)
           .collect()}
    assert sorted(got) == list(range(-3, 4))
    n, mx, my = len(xs), xs.mean(), ys.mean()
    den = n * xs.std() * ys.std()
    for lag in range(-3, 4):
        if lag > 0:
            num = ((xs[lag:] - mx) * (ys[:-lag] - my)).sum()
        elif lag < 0:
            num = ((xs[:lag] - mx) * (ys[-lag:] - my)).sum()
        else:
            num = ((xs - mx) * (ys - my)).sum()
        assert got[lag] == pytest.approx(num / den, abs=2e-6)
    # y = x shifted by +2 -> the peak must sit at lag -2 (x leads y)
    assert max(got, key=lambda k: got[k]) == -2


def test_ccf_lag0_equals_pearson_scaled(spark):
    from yatsm_spark.operators.tsanalytics import ccf
    from yatsm_spark.operators.tsfuncs import pearson_corr

    rng = np.random.default_rng(5)
    rows = [("c1", T0 + dt.timedelta(hours=i), int(a), int(b))
            for i, (a, b) in enumerate(
                zip(rng.integers(0, 9, 32), rng.integers(0, 9, 32)))]
    t = _tier2(spark, rows)
    c0 = {r["lag"]: r["ccf"] for r in
          ccf(t, "turn_count", "tool_call_count", 1).collect()}[0]
    pr = pearson_corr(t, "turn_count", "tool_call_count").collect()[0]
    assert c0 == pytest.approx(pr["corr"], abs=2e-6)


def test_ccf_constant_series_null(spark):
    from yatsm_spark.operators.tsanalytics import ccf

    rows = [("c1", T0 + dt.timedelta(hours=i), 5, i % 3)
            for i in range(16)]
    out = ccf(_tier2(spark, rows), "turn_count", "tool_call_count", 2) \
        .collect()
    assert len(out) == 5 and all(r["ccf"] is None for r in out)


def test_sax_letters_match_reference(spark):
    from yatsm_spark.operators.tsanalytics import sax_paa

    # 32 slots, w=4 -> 8-slot segments with means 0, 10, 20, 30
    rows = [("c1", T0 + dt.timedelta(minutes=i), (i // 8) * 10)
            for i in range(32)]
    out = (sax_paa(_tier(spark, rows), "turn_count", w=4, alphabet=4)
           .orderBy("seg").collect())
    assert [r["seg"] for r in out] == [0, 1, 2, 3]
    assert [r["n_in_seg"] for r in out] == [8, 8, 8, 8]
    assert [r["paa"] for r in out] == [0.0, 10.0, 20.0, 30.0]
    # z = (paa-15)/std(xs); std = sqrt(125) -> z = +-1.3416, +-0.4472
    assert [r["letter"] for r in out] == ["a", "b", "c", "d"]


def test_sax_zero_variance_null_letters(spark):
    from yatsm_spark.operators.tsanalytics import sax_paa, sax_words

    rows = [("c1", T0 + dt.timedelta(minutes=i), 7) for i in range(16)]
    out = sax_paa(_tier(spark, rows), "turn_count", w=4).collect()
    assert all(r["letter"] is None for r in out)
    w = sax_words(_tier(spark, rows), "turn_count", w=4).collect()[0]
    assert w["sax_word"] is None and w["n_segments"] == 4


def test_sax_word_concatenates_in_segment_order(spark):
    from yatsm_spark.operators.tsanalytics import sax_words

    rows = [("c1", T0 + dt.timedelta(minutes=i), (i // 8) * 10)
            for i in range(32)]
    w = sax_words(_tier(spark, rows), "turn_count", w=4).collect()[0]
    assert w["sax_word"] == "abcd" and w["n_segments"] == 4


def test_sax_uneven_segments_and_bad_alphabet(spark):
    from yatsm_spark.operators.tsanalytics import sax_paa

    # n=10, w=4: floor(i*4/10) -> sizes 3,2,3,2
    rows = [("c1", T0 + dt.timedelta(minutes=i), i) for i in range(10)]
    out = (sax_paa(_tier(spark, rows), "turn_count", w=4)
           .orderBy("seg").collect())
    assert [r["n_in_seg"] for r in out] == [3, 2, 3, 2]
    with pytest.raises(ValueError):
        sax_paa(_tier(spark, rows), "turn_count", alphabet=26)


def test_dist_shift_identical_halves_zero(spark):
    from yatsm_spark.operators.tsanalytics import distribution_shift

    # same multiset in both halves -> chi2 == 0 exactly
    vals = [1, 2, 3, 4, 1, 2, 3, 4]
    rows = [("c1", T0 + dt.timedelta(minutes=i), v)
            for i, v in enumerate(vals)]
    r = distribution_shift(_tier(spark, rows)).collect()[0]
    assert r["chi2"] == 0.0 and r["dof"] == 3 and r["n_points"] == 8


def test_dist_shift_detects_regime_change(spark):
    from yatsm_spark.operators.tsanalytics import distribution_shift

    calm = [("c1", T0 + dt.timedelta(minutes=i), 1 + i % 2)
            for i in range(30)]
    burst = [("c1", T0 + dt.timedelta(minutes=30 + i), 20 + i % 3)
             for i in range(30)]
    same = [("c2", T0 + dt.timedelta(minutes=i), 1 + i % 2)
            for i in range(60)]
    out = {r["conv_id"]: r for r in
           distribution_shift(_tier(spark, calm + burst + same)).collect()}
    # disjoint supports: every row sits in a bucket the other half
    # never touches -> chi2 = sum over buckets of N1*N2... = n exactly? no:
    # each term (o*N2)^2/(N1*N2*o) = o*N2/N1 (first-half buckets) etc.
    assert out["c1"]["chi2"] == pytest.approx(60.0, abs=1e-5)
    assert out["c2"]["chi2"] == 0.0
    assert out["c1"]["chi2"] > 10 * out["c2"]["chi2"] + 1


def test_dist_shift_short_series_null(spark):
    from yatsm_spark.operators.tsanalytics import distribution_shift

    r = distribution_shift(_tier(spark, [("c", T0, 5)])).collect()[0]
    assert r["n_points"] == 1 and r["dof"] is None and r["chi2"] is None


def test_dist_shift_cap_buckets(spark):
    from yatsm_spark.operators.tsanalytics import distribution_shift

    # values far beyond the cap collapse into one bucket
    rows = [("c", T0 + dt.timedelta(minutes=i), 1000 + i)
            for i in range(10)]
    r = distribution_shift(_tier(spark, rows), cap=64).collect()[0]
    assert r["dof"] == 0 and r["chi2"] == 0.0


def test_sax_candidate_pairs_hot_bucket_cap(spark):
    from yatsm_spark.operators.tsanalytics import sax_candidate_pairs

    rows = [(f"c{i:03d}", "abca") for i in range(10)] \
        + [("x1", "dcba"), ("x2", "dcba"), ("n1", None)]
    w = spark.createDataFrame(rows, "conv_id string, sax_word string")
    # cap below the hot bucket: only the cold pair survives
    out = sax_candidate_pairs(w, max_bucket=5).collect()
    assert [(r["conv_a"], r["conv_b"]) for r in out] == [("x1", "x2")]
    # cap above it: the hot bucket pairs too (10 choose 2 + 1)
    assert sax_candidate_pairs(w, max_bucket=64).count() == 46


# ---------------------------------------------------------------------------
# periodogram (harmonic power scan)


def _pg_tier(spark, values):
    import datetime as dt
    rows = [("c1", T0 + dt.timedelta(minutes=i), int(v))
            for i, v in enumerate(values)]
    return _tier(spark, rows)


def test_periodogram_finds_planted_period(spark):
    from yatsm_spark.operators.tsanalytics import periodogram

    # 6 full cycles of a period-30 square-ish wave, integer-valued
    vals = [10 if (i % 30) < 15 else 2 for i in range(180)]
    out = {r["period"]: r for r in
           periodogram(_pg_tier(spark, vals), periods=(15, 30, 60)).collect()}
    assert out[30]["dominant"] is True
    assert out[30]["power"] > out[15]["power"]
    assert out[30]["power"] > out[60]["power"]
    # a strong single-frequency signal explains most of the variance
    assert out[30]["power"] > 0.5


def test_periodogram_constant_series_is_null(spark):
    from yatsm_spark.operators.tsanalytics import periodogram

    out = periodogram(_pg_tier(spark, [5] * 120), periods=(30,)).collect()
    assert len(out) == 1
    assert out[0]["power"] is None
    assert out[0]["dominant"] is False


def test_periodogram_too_few_cycles_is_null(spark):
    from yatsm_spark.operators.tsanalytics import periodogram

    # 50 slots < 2 full cycles of period 30 -> gated NULL
    vals = [10 if (i % 30) < 15 else 2 for i in range(50)]
    out = periodogram(_pg_tier(spark, vals), periods=(30,)).collect()
    assert out[0]["power"] is None


def test_periodogram_phase_invariant(spark):
    from yatsm_spark.operators.tsanalytics import periodogram

    # shifting the series start (absolute slot offset) must not change
    # power: |FFT coefficient| is phase-free
    vals = [10 if (i % 20) < 10 else 2 for i in range(200)]
    import datetime as dt
    a = periodogram(_pg_tier(spark, vals), periods=(20,)).collect()[0]
    rows = [("c1", T0 + dt.timedelta(minutes=7 + i), int(v))
            for i, v in enumerate(vals)]
    b = periodogram(_tier(spark, rows), periods=(20,)).collect()[0]
    assert a["power"] == b["power"]


def test_response_latency_selection_ranks(spark):
    import datetime as dt

    import pandas as pd

    from yatsm_spark.operators.sessionize import response_latency

    def turn(conv, idx, role, secs):
        return (conv, idx, role, "hi", None,
                T0 + dt.timedelta(seconds=secs))

    rows = [
        # c1: three user->assistant pairs with latencies 10s, 20s, 40s
        turn("c1", 0, "user", 0), turn("c1", 1, "assistant", 10),
        turn("c1", 2, "user", 100), turn("c1", 3, "assistant", 120),
        turn("c1", 4, "user", 200), turn("c1", 5, "assistant", 240),
        # trailing user turn with no assistant after it -> dropped
        turn("c1", 6, "user", 300),
        # c2: assistant-only conv -> no rows at all
        turn("c2", 0, "assistant", 0), turn("c2", 1, "assistant", 5),
    ]
    tx = spark.createDataFrame(pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]))
    out = {r["conv_id"]: r for r in response_latency(tx).collect()}

    assert "c2" not in out
    r = out["c1"]
    assert r["n_pairs"] == 3
    # lower median of [10s, 20s, 40s] = 20s; p90 rank ceil(2.7)=3 -> 40s
    assert r["lat_median_us"] == 20_000_000
    assert r["lat_p90_us"] == 40_000_000
    assert r["lat_max_us"] == 40_000_000


def test_response_latency_nearest_not_lead(spark):
    import datetime as dt

    import pandas as pd

    from yatsm_spark.operators.sessionize import response_latency

    # user at t=0, then ANOTHER user turn, then assistant: the pairing
    # must skip the intervening user turn (nearest following assistant)
    rows = [
        ("c1", 0, "user", "a", None, T0),
        ("c1", 1, "user", "b", None, T0 + dt.timedelta(seconds=5)),
        ("c1", 2, "assistant", "c", None, T0 + dt.timedelta(seconds=8)),
    ]
    tx = spark.createDataFrame(pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]))
    r = response_latency(tx).collect()[0]
    assert r["n_pairs"] == 2
    # latencies: 8s (turn 0) and 3s (turn 1); median = lower of sorted
    assert r["lat_median_us"] == 3_000_000
    assert r["lat_max_us"] == 8_000_000


def test_tool_transitions_counts_and_terminal(spark):
    import pandas as pd

    from yatsm_spark.operators.sessionize import tool_transitions

    rows = [
        # c1 tools: search -> read -> search ; c2: search -> write
        ("c1", 0, "user", "q", None),
        ("c1", 1, "assistant", "a", "search"),
        ("c1", 2, "assistant", "a", "read"),
        ("c1", 3, "user", "q", None),
        ("c1", 4, "assistant", "a", "search"),
        ("c2", 0, "assistant", "a", "search"),
        ("c2", 1, "assistant", "a", "write"),
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role",
                                      "text", "tool"])
    out = {(r["tool"], r["next_tool"]): r for r in
           tool_transitions(spark.createDataFrame(pdf)).collect()}

    assert out[("search", "read")]["n_transitions"] == 1
    assert out[("search", "write")]["n_transitions"] == 1
    assert out[("read", "search")]["n_transitions"] == 1
    # terminals: c1 ends on search, c2 on write
    assert out[("search", None)]["n_transitions"] == 1
    assert out[("write", None)]["n_transitions"] == 1
    # outgoing rows per tool sum to 1.0 and p is the exact fraction
    assert out[("search", "read")]["p_next"] == round(1 / 3, 6)
    assert out[("search", None)]["p_next"] == round(1 / 3, 6)

    # without terminals the NULL rows disappear
    no_t = {(r["tool"], r["next_tool"]) for r in
            tool_transitions(spark.createDataFrame(pdf),
                             include_terminal=False).collect()}
    assert ("write", None) not in no_t
