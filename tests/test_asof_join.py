"""asof_join (pandas merge_asof / DuckDB ASOF JOIN semantics) —
closed-form fixtures for all three directions, exact-match inclusion,
tolerance nulling, and no-candidate rows. Cross-engine parity at corpus
scale is pinned by the tx_asof_tool / tx_asof_next driver oracles
(DuckDB's native ASOF JOIN — an independent implementation)."""

from datetime import datetime

from yatsm_spark.operators.joins import asof_join


def _ts(minute, second=0):
    return datetime(2025, 1, 1, 0, minute, second)


def _fixture(spark):
    left = spark.createDataFrame(
        [("c1", _ts(0), 1), ("c1", _ts(5), 2), ("c1", _ts(10), 3),
         ("c2", _ts(2), 4)],
        "conv_id string, ts timestamp, lid long")
    right = spark.createDataFrame(
        [("c1", _ts(1), 10), ("c1", _ts(5), 20), ("c1", _ts(12), 30)],
        "conv_id string, rts timestamp, v long")
    return left, right


def test_backward_with_exact_match(spark):
    left, right = _fixture(spark)
    out = {r.lid: r for r in
           asof_join(left, right, "conv_id", "ts", "rts", ["v"]).collect()}
    assert out[1].v is None              # nothing at or before 00:00
    assert out[2].v == 20                # exact match at 00:05 counts
    assert out[3].v == 20                # latest <= 00:10 is 00:05
    assert out[4].v is None              # c2 has no right rows at all
    assert out[3].matched_ts == _ts(5)


def test_forward_with_exact_match(spark):
    left, right = _fixture(spark)
    out = {r.lid: r for r in
           asof_join(left, right, "conv_id", "ts", "rts", ["v"],
                     direction="forward").collect()}
    assert out[1].v == 10                # next at-or-after 00:00 is 00:01
    assert out[2].v == 20                # exact match at 00:05 counts
    assert out[3].v == 30                # next after 00:10 is 00:12
    assert out[4].v is None


def test_nearest_prefers_closer_ties_backward(spark):
    left, right = _fixture(spark)
    out = {r.lid: r for r in
           asof_join(left, right, "conv_id", "ts", "rts", ["v"],
                     direction="nearest").collect()}
    assert out[1].v == 10                # only forward candidate
    assert out[2].v == 20                # exact
    assert out[3].v == 30                # 00:12 (2 min) beats 00:05 (5 min)
    # equidistant: left at 00:03 sits 2 min from 00:01 and 00:05 -> backward
    eq = spark.createDataFrame([("c1", _ts(3), 9)],
                               "conv_id string, ts timestamp, lid long")
    _, right = _fixture(spark)
    tie = asof_join(eq, right, "conv_id", "ts", "rts", ["v"],
                    direction="nearest").collect()[0]
    assert tie.v == 10 and tie.matched_ts == _ts(1)


def test_tolerance_nulls_far_matches_keeps_rows(spark):
    left, right = _fixture(spark)
    out = {r.lid: r for r in
           asof_join(left, right, "conv_id", "ts", "rts", ["v"],
                     tolerance_secs=120).collect()}
    assert len(out) == 4                 # LEFT semantics: every row kept
    assert out[3].v is None              # 00:05 is 300s away > 120s
    assert out[2].v == 20                # 0s away


def test_left_columns_survive_untouched(spark):
    left, right = _fixture(spark)
    got = asof_join(left, right, "conv_id", "ts", "rts", ["v"])
    assert got.columns == ["conv_id", "ts", "lid", "matched_ts", "v"]
    assert got.count() == left.count()


def test_reserved_and_value_col_collisions_raise(spark):
    import pytest

    left, right = _fixture(spark)
    with pytest.raises(ValueError, match="collide"):
        asof_join(left.withColumn("_t", left["lid"]), right,
                  "conv_id", "ts", "rts", ["v"])
    with pytest.raises(ValueError, match="collide"):
        asof_join(left.withColumn("matched_ts", left["ts"]), right,
                  "conv_id", "ts", "rts", ["v"])
    # value_col name already present on the left
    with pytest.raises(ValueError, match="collide"):
        asof_join(left.withColumn("v", left["lid"]), right,
                  "conv_id", "ts", "rts", ["v"])
