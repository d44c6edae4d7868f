"""Streaming rollup == batch rollup for finalized windows, and the online
monitor fires on a regime shift (SURVEY.md §2.11)."""

import numpy as np
import pandas as pd
import pytest

from yatsm_spark.ingest import with_measures
from yatsm_spark.operators.rollup import MEASURES, rollup_from_turns
from yatsm_spark.streaming.stream_rollup import online_monitor, stream_rollup_1m
from yatsm_spark.synth import TRANSCRIPT_SCHEMA, generate_transcripts


def test_stream_rollup_equals_batch(spark, tmp_path):
    tx = generate_transcripts(spark, 25, seed=11, max_turns=800)
    src = str(tmp_path / "src")
    tx.write.parquet(src)

    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src)
    q = (
        stream_rollup_1m(stream, watermark="0 seconds")
        .writeStream.format("memory").queryName("s_rollup")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)

    got = spark.sql("SELECT * FROM s_rollup")
    want = rollup_from_turns(with_measures(spark.read.parquet(src)), "1m").drop("gap_filled")
    cols = ["conv_id", "window_start", *MEASURES]
    # append mode withholds windows not yet past the watermark — the final
    # (max-ts) windows per conv may be missing; everything emitted must
    # match batch exactly, and coverage must be near-total.
    emitted = got.select(*cols)
    batch = want.select(*cols)
    assert emitted.exceptAll(batch).count() == 0
    missing = batch.exceptAll(emitted).count()
    assert missing <= 25  # at most the last open window per conv


def test_online_monitor_fires_on_shift(spark, tmp_path):
    # per-minute rollup rows: 60 slots of ~2/min, then 60 slots of 15/min
    rows = []
    base = pd.Timestamp("2025-01-01")
    rng = np.random.RandomState(0)
    for m in range(120):
        rate = 2 + int(rng.randint(0, 2)) if m < 60 else 15 + int(rng.randint(0, 3))
        rows.append({"conv_id": "c1", "window_start": base + pd.Timedelta(minutes=m),
                     "turn_count": rate})
    pdf = pd.DataFrame(rows)
    src = str(tmp_path / "rollup_src")
    spark.createDataFrame(pdf).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(
        "conv_id string, window_start timestamp, turn_count long"
    ).parquet(src)
    q = (
        online_monitor(stream, threshold=3.0, consecutive=5, min_train=16)
        .writeStream.format("memory").queryName("alerts")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    alerts = spark.sql("SELECT * FROM alerts").toPandas()
    assert len(alerts) >= 1
    first = alerts.sort_values("alert_ts").iloc[0]
    shift_ts = base + pd.Timedelta(minutes=60)
    assert abs((first["alert_ts"] - shift_ts).total_seconds()) <= 10 * 60
    assert first["baseline_rate"] < 4
