"""Gap-fill value policies (LOCF / linear interpolation), reset-aware
counter increase, and time-weighted averages — closed-form fixtures."""

from datetime import datetime

import pytest

from pyspark.sql import functions as F

from yatsm_spark.operators.tsfuncs import (
    counter_increase,
    interp_linear,
    locf,
    time_weighted_avg,
    total_increase,
)


def _ts(minute):
    return datetime(2025, 1, 1, 0, minute, 0)


def _filled(spark):
    # one conv, slots 0..4; real at 0, 3, 4; gaps (null v) at 1, 2
    rows = [("c1", _ts(0), 100, False), ("c1", _ts(1), None, True),
            ("c1", _ts(2), None, True), ("c1", _ts(3), 400, False),
            ("c1", _ts(4), 50, False)]
    return spark.createDataFrame(
        rows, "conv_id string, window_start timestamp, v long, gap_filled boolean")


def test_locf_carries_last_real_value(spark):
    out = locf(_filled(spark), ["v"]).orderBy("window_start").collect()
    assert [r.v for r in out] == [100, 100, 100, 400, 50]
    assert dict(locf(_filled(spark), ["v"]).dtypes)["v"] == "bigint"


def test_interp_linear_midpoints(spark):
    out = interp_linear(_filled(spark), ["v"]).orderBy("window_start").collect()
    # 100 -> 400 over 3 minutes: 1/3 and 2/3 of the way
    assert [r.v for r in out] == [100.0, 200.0, 300.0, 400.0, 50.0]


def test_interp_real_rows_exact(spark):
    out = interp_linear(_filled(spark), ["v"]).filter("not gap_filled")
    assert [r.v for r in out.orderBy("window_start").collect()] \
        == [100.0, 400.0, 50.0]


def test_counter_increase_handles_resets(spark):
    rows = [("c1", _ts(i), v) for i, v in enumerate([10, 17, 3, 9])]
    df = spark.createDataFrame(
        rows, "conv_id string, window_start timestamp, v long")
    out = counter_increase(df, "v").orderBy("window_start").collect()
    # first=0; 17-10=7; reset -> counter climbed to 3 from 0; 9-3=6
    assert [r.increase for r in out] == [0, 7, 3, 6]
    tot = total_increase(df, "v").collect()[0]
    assert (tot.total_increase, tot.n_points) == (16, 4)


def test_time_weighted_avg_locf_weighting(spark):
    # v=100 holds 60s, v=400 holds 120s, v=50 carries no weight
    rows = [("c1", _ts(0), 100), ("c1", _ts(1), 400), ("c1", _ts(3), 50)]
    df = spark.createDataFrame(
        rows, "conv_id string, window_start timestamp, v long")
    r = time_weighted_avg(df, "v").collect()[0]
    assert r.span_secs == 180
    assert abs(r.twa - (100 * 60 + 400 * 120) / 180) < 1e-6


def test_time_weighted_avg_single_point_is_null(spark):
    df = spark.createDataFrame(
        [("c1", _ts(0), 7)], "conv_id string, window_start timestamp, v long")
    r = time_weighted_avg(df, "v").collect()[0]
    assert r.twa is None and r.span_secs is None


def test_multi_conv_independence(spark):
    a = _filled(spark)
    b = a.withColumn("conv_id", F.lit("c2"))
    both = a.unionByName(b)
    out = locf(both, ["v"]).groupBy("conv_id").agg(F.sum("v").alias("s"))
    assert {r.s for r in out.collect()} == {100 + 100 + 100 + 400 + 50}


def test_ewma_recurrence_exact(spark):
    from yatsm_spark.operators.tsfuncs import ewma

    rows = [("c1", _ts(i), v) for i, v in enumerate([8, 0, 16, 4])]
    df = spark.createDataFrame(
        rows, "conv_id string, window_start timestamp, v long")
    got = [r.ewma for r in
           ewma(df, "v", 0.25).orderBy("window_start").collect()]
    want = [8.0]
    for x in (0, 16, 4):
        want.append(0.25 * x + 0.75 * want[-1])
    assert got == want


def test_ewma_single_and_empty(spark):
    from yatsm_spark.operators.tsfuncs import ewma

    one = spark.createDataFrame([("c", _ts(0), 9)],
                                "conv_id string, window_start timestamp, v long")
    assert ewma(one, "v").collect()[0].ewma == 9.0
    empty = spark.createDataFrame([], "conv_id string, window_start timestamp, v long")
    assert ewma(empty, "v").count() == 0


def test_holt_recurrence_exact(spark):
    from yatsm_spark.operators.tsfuncs import holt

    rows = [("c1", _ts(i), v) for i, v in enumerate([8, 0, 16, 4])]
    df = spark.createDataFrame(
        rows, "conv_id string, window_start timestamp, v long")
    got = holt(df, "v").orderBy("window_start").collect()
    lv, tr = [8.0], [0.0]
    for x in (0, 16, 4):
        s = 0.5 * x + 0.5 * (lv[-1] + tr[-1])
        tr.append(0.25 * (s - lv[-1]) + 0.75 * tr[-1])
        lv.append(s)
    assert [r.level for r in got] == lv
    assert [r.trend for r in got] == tr
    # single point: level = x, trend = 0 (documented zero-trend init)
    one = spark.createDataFrame(
        [("c", _ts(0), 9)], "conv_id string, window_start timestamp, v long")
    r = holt(one, "v").collect()[0]
    assert (r.level, r.trend) == (9.0, 0.0)


def test_rate_per_sec(spark):
    from yatsm_spark.operators.tsfuncs import rate_per_sec

    # counter 10,17,3,9 over 3 minutes: increase 16 over 180 s
    rows = [("c1", _ts(i), v) for i, v in enumerate([10, 17, 3, 9])]
    df = spark.createDataFrame(
        rows, "conv_id string, window_start timestamp, v long")
    r = rate_per_sec(df, "v").collect()[0]
    assert (r.total_increase, r.span_secs) == (16, 180)
    assert r.rate == round(16 / 180, 6) or abs(r.rate - 16 / 180) < 1e-6
    # single point: span 0 -> NULL rate (PromQL convention)
    one = spark.createDataFrame(
        [("c", _ts(0), 5)], "conv_id string, window_start timestamp, v long")
    assert rate_per_sec(one, "v").collect()[0].rate is None


def test_deriv_recovers_known_slope(spark):
    from yatsm_spark.operators.tsfuncs import deriv

    # v = 7 + 2*t_minutes -> slope = 2/60 per second
    rows = [("c1", _ts(i), 7 + 2 * i) for i in range(5)]
    df = spark.createDataFrame(
        rows, "conv_id string, window_start timestamp, v long")
    r = deriv(df, "v").collect()[0]
    assert r.n_points == 5
    assert abs(r.slope - 2 / 60) < 1e-6
    # constant series: zero slope (den > 0, num = 0)
    const = spark.createDataFrame(
        [("c", _ts(i), 4) for i in range(3)],
        "conv_id string, window_start timestamp, v long")
    assert deriv(const, "v").collect()[0].slope == 0.0
    # single point: den = 0 -> NULL
    one = spark.createDataFrame(
        [("c", _ts(0), 4)], "conv_id string, window_start timestamp, v long")
    assert deriv(one, "v").collect()[0].slope is None


def test_pearson_corr_known_values(spark):
    from yatsm_spark.operators.tsfuncs import pearson_corr

    # y = 3x exactly -> r = 1; anti-linear -> r = -1
    rows = ([("up", x, 3 * x) for x in (1, 2, 5, 9)]
            + [("dn", x, 20 - 2 * x) for x in (1, 2, 5, 9)]
            + [("flat", x, 7) for x in (1, 2, 5)])
    df = spark.createDataFrame(rows, "conv_id string, x long, y long")
    out = {r.conv_id: r for r in pearson_corr(df, "x", "y").collect()}
    assert out["up"].corr == 1.0
    assert out["dn"].corr == -1.0
    assert out["flat"].corr is None  # zero variance on y


def test_rolling_anomaly_integer_flag(spark):
    from yatsm_spark.operators.tsfuncs import rolling_anomaly

    # 10 calm points then a spike; min_n=4, k=8, sigma=3
    vals = [10, 11, 10, 9, 10, 11, 10, 9, 10, 11, 60]
    rows = [("c1", _ts(i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "conv_id string, window_start timestamp, v long")
    out = rolling_anomaly(df, "v", k=8, sigma=3, min_n=4) \
        .orderBy("window_start").collect()
    # warm-up: first 4 rows have < 4 preceding -> NULL
    assert all(r.is_anomaly is None for r in out[:4])
    assert all(r.is_anomaly is False for r in out[4:10])
    assert out[10].is_anomaly is True
    assert out[10].zscore > 3.0


def test_rolling_anomaly_zero_variance_window(spark):
    from yatsm_spark.operators.tsfuncs import rolling_anomaly

    vals = [5, 5, 5, 5, 5, 9]  # constant window, then any deviation
    rows = [("c1", _ts(i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "conv_id string, window_start timestamp, v long")
    out = rolling_anomaly(df, "v", k=8, sigma=3, min_n=4) \
        .orderBy("window_start").collect()
    assert out[4].is_anomaly is False   # 5 vs all-5 window
    assert out[5].is_anomaly is True    # 9 vs zero-variance window
    assert out[5].zscore is None        # var = 0 -> no z


def test_hdr_quantiles_from_merged_hist_bit_equal(spark):
    from yatsm_spark.operators.sketches import (hdr_histogram,
                                                hdr_quantiles,
                                                hdr_quantiles_from_hist)

    rows = [("g1", "a" if i % 3 else "b", i * i % 97) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, sub string, v long")
    direct = hdr_quantiles(df, ["g"], "v").orderBy("q_label").collect()
    fine = hdr_histogram(df, ["g", "sub"], "v")
    merged = fine.groupBy("g", "bucket").agg(F.sum("cnt").alias("cnt"))
    via = hdr_quantiles_from_hist(merged, ["g"]).orderBy("q_label").collect()
    assert [tuple(r) for r in direct] == [tuple(r) for r in via]


def test_holt_winters_recurrence_exact(spark):
    from yatsm_spark.operators.tsfuncs import holt_winters

    xs = [8, 0, 16, 4, 12, 2, 14, 6, 9, 1]
    rows = [("c1", _ts(i), v) for i, v in enumerate(xs)]
    df = spark.createDataFrame(
        rows, "conv_id string, window_start timestamp, v long")
    got = holt_winters(df, "v", period=4).orderBy("window_start").collect()
    lv, tr, se = [8.0], [0.0], [0.0]
    for i, x in enumerate(xs[1:], start=1):
        sp = se[i - 4] if i >= 4 else 0.0
        l_ = 0.5 * (x - sp) + 0.5 * (lv[-1] + tr[-1])
        tr.append(0.25 * (l_ - lv[-1]) + 0.75 * tr[-1])
        se.append(0.25 * (x - l_) + 0.75 * sp)
        lv.append(l_)
    assert [r.level for r in got] == lv       # bit-exact, no approx
    assert [r.trend for r in got] == tr
    assert [r.seasonal for r in got] == se


def test_holt_winters_first_period_matches_holt(spark):
    from yatsm_spark.operators.tsfuncs import holt, holt_winters

    # while i < period, s_prev = 0 and the level/trend recurrences
    # degenerate to plain Holt
    xs = [8, 0, 16, 4]
    rows = [("c1", _ts(i), v) for i, v in enumerate(xs)]
    df = spark.createDataFrame(
        rows, "conv_id string, window_start timestamp, v long")
    hw = holt_winters(df, "v", period=10).orderBy("window_start").collect()
    h = holt(df, "v").orderBy("window_start").collect()
    assert [r.level for r in hw] == [r.level for r in h]
    assert [r.trend for r in hw] == [r.trend for r in h]


def test_holt_winters_bad_period(spark):
    from yatsm_spark.operators.tsfuncs import holt_winters

    df = spark.createDataFrame(
        [("c", _ts(0), 1)], "conv_id string, window_start timestamp, v long")
    with pytest.raises(ValueError):
        holt_winters(df, "v", period=0)


def _flags_df(spark, rows):
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "window_start",
                                    "turn_count", "is_anomaly", "zscore"]))


def test_alert_episodes_islands_and_peaks(spark):
    from yatsm_spark.operators.tsfuncs import alert_episodes

    t0 = datetime(2026, 1, 1)

    def m(i):
        return t0.replace(minute=i)

    rows = [
        # episode 1: slots 1-3, peak z at slot 2
        ("c1", m(0), 5, False, None),
        ("c1", m(1), 9, True, 2.5),
        ("c1", m(2), 20, True, 7.25),
        ("c1", m(3), 8, True, 3.0),
        ("c1", m(4), 5, None, None),       # NULL flag breaks the run
        # episode 2: single slot, zero-variance anomaly (NULL z)
        ("c1", m(5), 99, True, None),
        ("c2", m(0), 4, False, None),      # conv with no episodes
    ]
    out = (alert_episodes(_flags_df(spark, rows))
           .orderBy("conv_id", "episode_start").collect())
    assert len(out) == 2
    e1, e2 = out
    assert (e1["episode_start"], e1["episode_end"], e1["n_slots"]) \
        == (m(1), m(3), 3)
    assert e1["peak_zscore"] == 7.25 and e1["peak_value"] == 20
    assert (e2["n_slots"], e2["peak_zscore"], e2["peak_value"]) \
        == (1, None, 99)


def test_alert_episodes_peak_tiebreak_latest_slot(spark):
    from yatsm_spark.operators.tsfuncs import alert_episodes

    t0 = datetime(2026, 1, 1)
    rows = [("c1", t0.replace(minute=i), v, True, z)
            for i, (v, z) in enumerate([(10, 4.0), (11, 4.0), (3, 1.0)])]
    r = alert_episodes(_flags_df(spark, rows)).collect()[0]
    # equal peak z on the first two slots -> the LATER slot's value wins
    assert r["peak_zscore"] == 4.0 and r["peak_value"] == 11


def test_theil_sen_exact_line_and_outlier_robustness(spark):
    from yatsm_spark.operators.tsfuncs import theil_sen

    t0 = datetime(2026, 1, 1)
    # exact line x = 100 + 2*t_hours -> slope 2/3600 per second
    clean = [("c1", t0 + __import__("datetime").timedelta(hours=h),
              100 + 2 * h) for h in range(20)]
    # same line with 4 wild outliers (20% contamination)
    noisy = [("c2", ws, 9999 if i in (3, 7, 11, 15) else v)
             for i, (_, ws, v) in enumerate(clean)]
    df = spark.createDataFrame(
        clean + noisy, "conv_id string, window_start timestamp, "
                       "turn_count long")
    out = {r["conv_id"]: r for r in theil_sen(df).collect()}
    want_slope = round(2 / 3600, 6)
    assert out["c1"]["slope"] == pytest.approx(want_slope, abs=2e-6)
    # intercept drift bound: 1e-6 slope snap x max t (68400 s) ~= 0.035
    assert out["c1"]["intercept"] == pytest.approx(100.0, abs=0.05)
    # the contaminated series still recovers the clean trend
    assert out["c2"]["slope"] == pytest.approx(want_slope, abs=2e-6)
    assert out["c2"]["intercept"] == pytest.approx(100.0, abs=0.05)


def test_theil_sen_single_point_nulls_and_cap(spark):
    from yatsm_spark.operators.tsfuncs import theil_sen

    one = spark.createDataFrame(
        [("c", datetime(2026, 1, 1), 5)],
        "conv_id string, window_start timestamp, turn_count long")
    r = theil_sen(one).collect()[0]
    assert r["n_points"] == 1 and r["slope"] is None \
        and r["intercept"] is None
    import datetime as dt
    many = spark.createDataFrame(
        [("c", datetime(2026, 1, 1) + dt.timedelta(minutes=i), i)
         for i in range(10)],
        "conv_id string, window_start timestamp, turn_count long")
    with pytest.raises(Exception, match="max_n"):
        theil_sen(many, max_n=5).collect()


def test_hw_backtest_hand_computed(spark):
    from yatsm_spark.operators.tsfuncs import holt_winters_backtest

    xs = [8, 0, 16, 4, 12, 2]
    rows = [("c1", _ts(i), v) for i, v in enumerate(xs)]
    df = spark.createDataFrame(
        rows, "conv_id string, window_start timestamp, v long")
    r = holt_winters_backtest(df, "v", period=3).collect()[0]
    # replay the recurrence by hand and derive the expected metrics
    import math
    lv, tr, se = [8.0], [0.0], [0.0]
    errs, terms = [], []
    for i, x in enumerate(xs[1:], start=1):
        sp = se[i - 3] if i >= 3 else 0.0
        f = (lv[-1] + tr[-1]) + sp
        e = x - f
        errs.append(math.floor(e * 1e6 + 0.5))
        den = abs(x) + abs(f)
        t = 0.0 if den == 0 else 2.0 * abs(e) / den
        terms.append(math.floor(t * 1e6 + 0.5))
        l_ = 0.5 * (x - sp) + 0.5 * (lv[-1] + tr[-1])
        tr.append(0.25 * (l_ - lv[-1]) + 0.75 * tr[-1])
        se.append(0.25 * (x - l_) + 0.75 * sp)
        lv.append(l_)
    ne = 5
    want_mae = math.floor(sum(abs(v) for v in errs) / (ne * 1e6)
                          * 1e6 + 0.5) / 1e6
    want_rmse = math.floor(
        math.sqrt(sum(v * v for v in errs) / (ne * 1e12)) * 1e6 + 0.5) / 1e6
    naive = [abs(xs[i] - xs[i - 3]) for i in range(3, 6)]
    want_mase = math.floor(
        sum(abs(v) for v in errs) * len(naive)
        / (ne * sum(naive) * 1e6) * 1e6 + 0.5) / 1e6
    assert r["n_eval"] == 5
    assert r["mae"] == want_mae and r["rmse"] == want_rmse
    assert r["smape"] == math.floor(sum(terms) / (ne * 1e6)
                                    * 1e6 + 0.5) / 1e6
    assert r["mase"] == want_mase


def test_hw_backtest_edge_series(spark):
    from yatsm_spark.operators.tsfuncs import holt_winters_backtest

    # constant series: every one-step forecast is exact -> zero errors;
    # the seasonal-naive error is 0 -> mase NULL
    const = spark.createDataFrame(
        [("c", _ts(i), 7) for i in range(10)],
        "conv_id string, window_start timestamp, v long")
    r = holt_winters_backtest(const, "v", period=3).collect()[0]
    assert (r["mae"], r["rmse"], r["mase"]) == (0.0, 0.0, None)
    # all-zero series: smape's 0/0 convention -> term 0, smape 0
    zero = spark.createDataFrame(
        [("c", _ts(i), 0) for i in range(6)],
        "conv_id string, window_start timestamp, v long")
    r = holt_winters_backtest(zero, "v", period=3).collect()[0]
    assert r["smape"] == 0.0
    # single point: nothing to evaluate
    one = spark.createDataFrame(
        [("c", _ts(0), 5)],
        "conv_id string, window_start timestamp, v long")
    r = holt_winters_backtest(one, "v").collect()[0]
    assert r["n_eval"] == 0 and r["mae"] is None and r["mase"] is None


def test_topk_slots_rank_and_ties(spark):
    from yatsm_spark.operators.tsfuncs import topk_slots

    rows = [("c1", _ts(0), 5), ("c1", _ts(1), 9), ("c1", _ts(2), 9),
            ("c1", _ts(3), 1), ("c2", _ts(0), 2)]
    df = spark.createDataFrame(
        rows, "conv_id string, window_start timestamp, turn_count long")
    out = topk_slots(df, "turn_count", k=2).orderBy("conv_id", "rank") \
        .collect()
    # tie at 9: the EARLIER slot takes rank 1
    assert [(r["conv_id"], r["rank"], r["window_start"], r["turn_count"])
            for r in out] == [
        ("c1", 1, _ts(1), 9), ("c1", 2, _ts(2), 9), ("c2", 1, _ts(0), 2)]
