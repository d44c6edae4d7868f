"""Streaming throughput/state bench (round-5 task) -> BENCH/STREAMING.md.

Measures the two headline streaming twins at bench volume:

- ``stream_rollup_1m``: watermarked tumbling aggregation (the streaming
  tier builder) — rows/s, per-micro-batch duration, state rows/bytes,
  watermark progression, rows dropped as late.
- ``online_monitor``: applyInPandasWithState per-conv break monitor over
  the 1m tier — rows/s and the O(1)-per-conv state bound.
- ``stream_anomaly``: the O(k)-ring-buffer twin, state growth vs k.

Protocol: the sf transcript table is re-chunked into STREAM_CHUNKS
time-ordered parquet files (chunk i = rows in the i-th ts range), so the
file source with maxFilesPerTrigger=1 delivers K sequential micro-batches
in event-time order — the arrival pattern a production topic would have,
and the one that lets the watermark advance and evict state. Queries run
Trigger.AvailableNow against a fresh checkpoint; metrics come from
StreamingQueryProgress (the same numbers a cluster's streaming UI shows).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), STREAM_CHUNKS (default 16),
     STREAM_OUT (optional json artifact path).
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CHUNKS = int(os.environ.get("STREAM_CHUNKS", "16"))
WORK = os.environ.get("BENCH_WORK_DIR", os.path.join(REPO, "bench_work"))


def chunked_source(spark, df, ts_col: str, path: str, chunks: int) -> int:
    """Re-write df as `chunks` single-file parquets in ts order (one
    micro-batch each under maxFilesPerTrigger=1). Cached across runs."""
    marker = os.path.join(path, "_CHUNKED_OK")
    if os.path.exists(marker):
        return sum(1 for f in os.listdir(path) if f.startswith("chunk_"))
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    # chunk boundaries: ts quantiles over epoch seconds
    from pyspark.sql import functions as F

    eps = df.select(F.unix_timestamp(ts_col).cast("double").alias("e"))
    bounds = eps.approxQuantile("e", [i / chunks for i in range(1, chunks)], 0.001)
    bounds = [float("-inf")] + bounds + [float("inf")]
    tmp = os.path.join(path, "_build")
    for i in range(chunks):
        lo, hi = bounds[i], bounds[i + 1]
        part = df.where(
            (F.unix_timestamp(ts_col).cast("double") > lo)
            & (F.unix_timestamp(ts_col).cast("double") <= hi)
            if i else (F.unix_timestamp(ts_col).cast("double") <= hi))
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        os.replace(os.path.join(tmp, src),
                   os.path.join(path, f"chunk_{i:04d}.parquet"))
        # distinct mtimes keep the file source's oldest-first order == event-time order
        t = time.time() - (chunks - i) * 2
        os.utime(os.path.join(path, f"chunk_{i:04d}.parquet"), (t, t))
    shutil.rmtree(tmp, ignore_errors=True)
    open(marker, "w").write("ok")
    return chunks


def run_stream(spark, make_query, schema, src_path, label):
    """Run one AvailableNow streaming query over the chunked source and
    distill its progress history."""
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{label}_")
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src_path))
    t0 = time.time()
    q = (make_query(stream)
         .writeStream.format("noop")
         .option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    wall = time.time() - t0
    prog = [json.loads(p.json) for p in q.recentProgress]
    shutil.rmtree(ckpt, ignore_errors=True)

    rows = sum(p["sources"][0]["numInputRows"] for p in prog)
    durs = sorted(p["batchDuration"] for p in prog)
    state = [p["stateOperators"][0] for p in prog if p.get("stateOperators")]
    out = {
        "wall_s": round(wall, 2),
        "input_rows": rows,
        "rows_per_sec": round(rows / wall, 1),
        "micro_batches": len(prog),
        "batch_ms_p50": durs[len(durs) // 2] if durs else None,
        "batch_ms_max": durs[-1] if durs else None,
    }
    if state:
        last = state[-1]
        out.update({
            "state_rows_final": last.get("numRowsTotal"),
            "state_rows_peak": max(so.get("numRowsTotal", 0) for so in state),
            "state_mem_bytes_final": last.get("memoryUsedBytes"),
            "state_mem_bytes_peak": max(so.get("memoryUsedBytes", 0) for so in state),
            "rows_dropped_late": sum(so.get("numRowsDroppedByWatermark", 0)
                                     for so in state),
            "state_rows_removed": sum(so.get("numRowsRemoved", 0) for so in state),
        })
    wmarks = [p.get("eventTime", {}).get("watermark") for p in prog]
    out["watermark_first_last"] = [next((w for w in wmarks if w), None),
                                   next((w for w in reversed(wmarks) if w), None)]
    return out


def main():
    from pyspark.sql import functions as F

    from yatsm_spark.conf import get_spark
    from yatsm_spark.ingest import with_measures
    from yatsm_spark.operators.rollup import rollup_from_turns
    from yatsm_spark.streaming.stream_rollup import (
        stream_kalman,
        online_monitor,
        stream_anomaly,
        stream_rollup_1m,
    )
    from yatsm_spark.synth import TRANSCRIPT_SCHEMA, transcripts_for_sf

    spark = get_spark(app_name="yatsm-spark-stream-bench",
                      master=f"local[{CPUS}]")
    tx = transcripts_for_sf(spark, SF_DIR, data_root=os.path.join(REPO, "data"))
    n_turns = tx.count()
    n_convs = tx.select("conv_id").distinct().count()

    base = os.path.basename(SF_DIR.rstrip("/"))
    src_turns = os.path.join(WORK, f"stream_src_turns_{base}")
    chunked_source(spark, tx, "ts", src_turns, CHUNKS)

    # the 1m tier as a streamed input for the stateful per-conv twins
    tier = rollup_from_turns(with_measures(tx), "1m").drop("gap_filled")
    src_tier = os.path.join(WORK, f"stream_src_tier_{base}")
    chunked_source(spark, tier, "window_start", src_tier, CHUNKS)
    n_tier_rows = spark.read.parquet(src_tier).count()
    tier_schema = spark.read.parquet(src_tier).schema

    results = {
        "sf": SF_DIR, "cpus": CPUS, "chunks": CHUNKS,
        "n_turns": n_turns, "n_convs": n_convs, "n_tier_rows": n_tier_rows,
    }

    results["stream_rollup_1m"] = run_stream(
        spark, lambda s: stream_rollup_1m(s, watermark="10 minutes"),
        TRANSCRIPT_SCHEMA, src_turns, "rollup")

    results["online_monitor"] = run_stream(
        spark, lambda s: online_monitor(s.select(
            "conv_id", "window_start", "turn_count")),
        tier_schema, src_tier, "monitor")
    results["online_monitor"]["state_bytes_per_conv"] = round(
        results["online_monitor"]["state_mem_bytes_final"] / n_convs, 1)

    results["stream_anomaly"] = run_stream(
        spark, lambda s: stream_anomaly(s.select(
            "conv_id", "window_start", "turn_count"), k=30),
        tier_schema, src_tier, "anomaly")
    results["stream_anomaly"]["state_bytes_per_conv"] = round(
        results["stream_anomaly"]["state_mem_bytes_final"] / n_convs, 1)

    results["stream_kalman"] = run_stream(
        spark, lambda s: stream_kalman(s.select(
            "conv_id", "window_start", "turn_count")),
        tier_schema, src_tier, "kalman")
    results["stream_kalman"]["state_bytes_per_conv"] = round(
        results["stream_kalman"]["state_mem_bytes_final"] / n_convs, 1)

    out = os.environ.get("STREAM_OUT")
    if out:
        with open(out, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
