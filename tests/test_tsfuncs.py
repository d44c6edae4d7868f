"""Gap-fill value policies (LOCF / linear interpolation), reset-aware
counter increase, and time-weighted averages — closed-form fixtures."""

from datetime import datetime

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
