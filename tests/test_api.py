"""Engine facade (SURVEY.md §3 CLI-surface analogues)."""

import pytest
from pyspark.sql import functions as F

from yatsm_spark.api import Engine
from yatsm_spark.synth import generate_transcripts


@pytest.fixture(scope="module")
def engine(spark):
    tx = generate_transcripts(spark, 30, seed=5, max_turns=2000).cache()
    tx.count()
    return Engine(spark, tx)


def test_explain_conv_pushes_down_and_returns_series(engine):
    out = engine.explain_conv("conv00000006")
    series = out["series"]
    assert series.select("conv_id").distinct().count() == 1
    assert "token_len_avg" in series.columns
    # predicate reaches the scan: single-conv plan must not aggregate others
    plan = series._jdf.queryExecution().executedPlan().toString()
    assert "conv00000006" in plan
    segs = out["segments"]
    assert segs.filter(F.col("conv_id") != "conv00000006").count() == 0


def test_snapshot_at_picks_latest_started_segment(engine):
    segs = engine.segments().cache()
    if segs.count() == 0:
        pytest.skip("no segments at this scale")
    at = segs.agg(F.max("start_ts")).collect()[0][0]
    snap = engine.snapshot_at(segs, at)
    assert snap.groupBy("conv_id").count().filter("count > 1").count() == 0


def test_changemap_counts_breaks(engine):
    segs = engine.segments()
    cm = engine.changemap(segs)
    n_breaks = segs.filter(F.col("break_ts").isNotNull()).count()
    assert cm.agg(F.sum("num_changes")).collect()[0][0] == (n_breaks or None)
