"""LTTB downsampling: kernel properties + Spark operator parity with the
shared kernel."""

from datetime import datetime, timedelta

import numpy as np
import pytest
from pyspark.sql import functions as F

from yatsm_spark.kernel.downsample import lttb_frame, lttb_indices


def test_endpoints_always_kept():
    t = np.arange(100, dtype=float)
    v = np.sin(t)
    idx = lttb_indices(t, v, 10)
    assert idx[0] == 0 and idx[-1] == 99 and len(idx) == 10
    assert (np.diff(idx) > 0).all()  # strictly increasing -> time order


def test_short_series_pass_through():
    t = np.arange(5, dtype=float)
    assert lttb_indices(t, t, 64).tolist() == [0, 1, 2, 3, 4]


def test_spike_is_kept():
    # flat series with one spike: the spike forms the largest triangle
    t = np.arange(9, dtype=float)
    v = np.zeros(9)
    v[4] = 100.0
    idx = lttb_indices(t, v, 3)
    assert 4 in idx.tolist()


def test_validation():
    t = np.arange(10, dtype=float)
    with pytest.raises(ValueError):
        lttb_indices(t, t, 2)
    with pytest.raises(ValueError):
        lttb_indices(t, t[:5], 3)


def test_operator_matches_kernel(spark):
    from yatsm_spark.operators.downsample import lttb

    base = datetime(2025, 1, 1)
    rng = np.random.default_rng(7)
    vals = rng.integers(1, 100, size=200)
    rows = [("c1", base + timedelta(minutes=i), int(vals[i]))
            for i in range(200)]
    df = spark.createDataFrame(
        rows, "conv_id string, window_start timestamp, turn_count long")
    got = (lttb(df, "turn_count", 16).orderBy("pos")
           .select("window_start", "turn_count", "pos").collect())

    ts_ns = np.array([int((base + timedelta(minutes=i)
                           - datetime(1970, 1, 1)).total_seconds() * 1e9)
                      for i in range(200)], dtype=np.int64)
    sel, pos = lttb_frame(ts_ns, vals.astype(np.float64), 16)
    assert [r.pos for r in got] == pos.tolist()
    assert [r.turn_count for r in got] == [int(vals[i]) for i in sel]
    assert len(got) == 16


def test_operator_groups_independently(spark):
    from yatsm_spark.operators.downsample import lttb

    base = datetime(2025, 1, 1)
    rows = [(c, base + timedelta(minutes=i), i + 1)
            for c in ("a", "b") for i in range(50)]
    df = spark.createDataFrame(
        rows, "conv_id string, window_start timestamp, turn_count long")
    out = lttb(df, "turn_count", 8)
    counts = {r.conv_id: r.n for r in
              out.groupBy("conv_id").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 8, "b": 8}


def test_m4_flags_and_bounds(spark):
    from datetime import datetime, timedelta

    from yatsm_spark.operators.downsample import m4_downsample

    base = datetime(2025, 1, 1)
    # one conv, 120 one-minute slots spanning two 1h buckets
    vals = [(i * 7) % 50 for i in range(120)]
    rows = [("c1", base + timedelta(minutes=i), vals[i]) for i in range(120)]
    df = spark.createDataFrame(
        rows, "conv_id string, window_start timestamp, turn_count long")
    out = m4_downsample(df, "turn_count", 3600).collect()
    assert len(out) <= 8  # <= 4 rows per bucket
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r)
    assert len(by_bucket) == 2
    first_bucket = min(by_bucket)
    for bucket, rs in by_bucket.items():
        lo = vals[:60] if bucket == first_bucket else vals[60:]
        assert any(r.is_min and r.turn_count == min(lo) for r in rs)
        assert any(r.is_max and r.turn_count == max(lo) for r in rs)
        assert any(r.is_first for r in rs) and any(r.is_last for r in rs)


def test_m4_tie_breaks_earliest(spark):
    from datetime import datetime, timedelta

    from yatsm_spark.operators.downsample import m4_downsample

    base = datetime(2025, 1, 1)
    rows = [("c1", base + timedelta(minutes=i), 5) for i in range(4)]
    df = spark.createDataFrame(
        rows, "conv_id string, window_start timestamp, turn_count long")
    out = {r.window_start.minute: r for r in
           m4_downsample(df, "turn_count", 3600).collect()}
    assert out[0].is_min and out[0].is_max and out[0].is_first
    assert out[3].is_last and not out[3].is_min


def test_swing_compress_bound_and_shapes():
    import numpy as np
    import pytest

    from yatsm_spark.kernel.swing import swing_check_bound, swing_compress

    t = np.arange(50, dtype=np.int64) * 60_000_000
    # perfect ramp: two archive points, zero loss
    ramp = np.arange(50, dtype=np.int64) * 3
    k = swing_compress(t, ramp, 2)
    assert k.tolist() == [0, 49]
    assert swing_check_bound(t, ramp, k, 0)     # exact on a line
    # random walk: classical 2E reconstruction bound, exact rationals
    rng = np.random.default_rng(7)
    for e in (0, 1, 5):
        x = np.cumsum(rng.integers(-4, 5, size=200)).astype(np.int64)
        tt = np.arange(200, dtype=np.int64) * 60_000_000
        kk = swing_compress(tt, x, e)
        assert kk[0] == 0 and kk[-1] == 199
        assert swing_check_bound(tt, x, kk, 2 * e)
        # E=0 must reproduce the series exactly on reconstruction
        if e == 0:
            assert swing_check_bound(tt, x, kk, 0)
    with pytest.raises(ValueError, match="increasing"):
        swing_compress(np.array([0, 0]), np.array([1, 2]), 1)
    with pytest.raises(ValueError, match="e must be"):
        swing_compress(t, ramp, -1)


def test_swing_door_operator(spark):
    import datetime as dt

    import numpy as np

    from yatsm_spark.kernel.swing import swing_compress

    from yatsm_spark.operators.downsample import swing_door

    t0 = dt.datetime(2026, 1, 1)
    rng = np.random.default_rng(3)
    xs = np.cumsum(rng.integers(-3, 4, size=60)).astype(np.int64) + 50
    rows = [("c1", t0 + dt.timedelta(minutes=i), int(v))
            for i, v in enumerate(xs)]
    df = spark.createDataFrame(
        rows, "conv_id string, window_start timestamp, turn_count long")
    got = swing_door(df, "turn_count", e=2).orderBy("pos").collect()
    t_us = (np.arange(60, dtype=np.int64) * 60_000_000
            + int(t0.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6))
    keep = swing_compress(np.arange(60, dtype=np.int64) * 60_000_000,
                          xs, 2)
    assert [r["turn_count"] for r in got] == [int(xs[i]) for i in keep]
    assert [r["pos"] for r in got] == list(range(len(keep)))
    assert all(r["n_in"] == 60 for r in got)
