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


def _monitor_reference(rates, state, threshold, consecutive, min_train):
    """Scalar per-row replay of the monitor semantics — the ground truth
    monitor_scan must reproduce exactly (it was the shipped round-1 loop)."""
    n, s, ss, consec = state
    alerts = []
    for i, rate in enumerate(float(r) for r in rates):
        if n >= min_train:
            mean = s / n
            var = max(ss / n - mean * mean, 1e-9)
            z = abs(rate - mean) / (var ** 0.5)
            if z > threshold:
                consec += 1
                if consec >= consecutive:
                    alerts.append((i, z, mean))
                    n, s, ss, consec = 0, 0.0, 0.0, 0
                    continue
                continue
            consec = 0
        n += 1
        s += rate
        ss += rate * rate
    return alerts, (n, s, ss, consec)


def test_monitor_scan_matches_scalar_reference():
    import numpy as np

    from yatsm_spark.streaming.stream_rollup import monitor_scan

    rng = np.random.default_rng(7)
    for trial in range(30):
        # regime-switching Poisson rates: quiet -> burst -> quiet, random cuts
        parts = []
        for _ in range(rng.integers(1, 5)):
            lam = float(rng.choice([1.0, 2.0, 20.0, 50.0]))
            parts.append(rng.poisson(lam, size=int(rng.integers(5, 200))))
        rates = np.concatenate(parts).astype(float)
        # split into batches to exercise state carry-over
        cuts = sorted(rng.integers(0, len(rates), size=int(rng.integers(0, 3))))
        state_a = state_b = (0, 0.0, 0.0, 0)
        got_all, want_all = [], []
        lo = 0
        for hi in list(cuts) + [len(rates)]:
            batch = rates[lo:hi]
            got, state_a = monitor_scan(batch, state_a, 3.55, 5, 16)
            want, state_b = _monitor_reference(batch, state_b, 3.55, 5, 16)
            got_all.extend((lo + j, z, m) for j, z, m in got)
            want_all.extend((lo + j, z, m) for j, z, m in want)
            lo = hi
        assert [(j, round(z, 9), round(m, 9)) for j, z, m in got_all] == \
               [(j, round(z, 9), round(m, 9)) for j, z, m in want_all], trial
        assert state_a[0] == state_b[0] and state_a[3] == state_b[3]
        assert abs(state_a[1] - state_b[1]) < 1e-6 and abs(state_a[2] - state_b[2]) < 1e-3


def test_stream_tiers_reconcile_with_batch(spark, tmp_path):
    """Round-2 VERDICT task 8: the STREAM-built 1m rollup, fed through the
    same gapfill -> cascade(1h) -> cascade(1d) -> retention machinery, must
    reproduce the batch pipeline's tiers bit-for-bit — not just the 1m rows.

    A sentinel 'flush' turn per conv two minutes past the conv's max ts
    pushes the event-time watermark past every real window so append mode
    emits them all; sentinel windows are filtered from both sides."""
    from pyspark.sql import functions as F

    from yatsm_spark.operators.cascade import cascade
    from yatsm_spark.operators.retention import evict
    from yatsm_spark.operators.rollup import gapfill

    tx = generate_transcripts(spark, 20, seed=23, max_turns=600)
    flush = (
        tx.groupBy("conv_id").agg(F.max("ts").alias("mts"), F.max("turn_idx").alias("mti"))
        .select("conv_id", (F.col("mti") + 1).alias("turn_idx"),
                F.lit("system").alias("role"), F.lit("flush").alias("text"),
                F.lit(None).cast("string").alias("tool"),
                (F.col("mts") + F.expr("INTERVAL 2 MINUTES")).alias("ts"))
    )
    src = str(tmp_path / "src_tiers")
    tx.select(flush.columns).unionByName(flush).write.parquet(src)

    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src)
    q = (
        stream_rollup_1m(stream, watermark="0 seconds")
        .writeStream.format("memory").queryName("s_tiers")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)

    # sentinel windows (the per-conv max window) are the stream's flush rows
    sent = flush.select("conv_id", F.date_trunc("minute", "ts").alias("window_start"))
    # round-trip through pandas to strip the event-time watermark metadata
    # the memory sink leaves on window_start (it breaks batch-side joins)
    emitted = spark.createDataFrame(spark.sql("SELECT * FROM s_tiers").toPandas())
    got_sparse = (emitted
                  .join(sent, ["conv_id", "window_start"], "left_anti")
                  .withColumn("gap_filled", F.lit(False)))
    want_sparse = (rollup_from_turns(with_measures(spark.read.parquet(src)), "1m")
                   .join(sent, ["conv_id", "window_start"], "left_anti"))

    def tiers(sparse):
        m1 = gapfill(sparse, "1m")
        h1 = cascade(m1, "1m", "1h")
        d1 = cascade(h1, "1h", "1d")
        kept = evict(m1, "1m", "1h", ttl_seconds=2 * 86400)
        return {"1m": m1, "1h": h1, "1d": d1, "retained": kept}

    got_t, want_t = tiers(got_sparse), tiers(want_sparse)
    for name in got_t:
        g, w = got_t[name], want_t[name]
        assert g.exceptAll(w).count() == 0, f"tier {name}: stream-only rows"
        assert w.exceptAll(g).count() == 0, f"tier {name}: batch-only rows"


def test_watermark_drops_late_data_across_microbatches(spark, tmp_path):
    # Three files processed as SEQUENTIAL micro-batches (maxFilesPerTrigger=1,
    # mtime-ordered). Spark's watermark is a state-retention bound, not an
    # input filter: a late row is only GUARANTEED dropped once its window's
    # state has been evicted (emitted). Batch 0 loads minutes 0..30; batch 1
    # (an on-time row) runs with the advanced watermark and evicts+emits all
    # windows below it; batch 2 replays an event into minute 5 — its window
    # is gone, so the row must be dropped (numRowsDroppedByWatermark) and
    # the already-emitted minute-5 point must stay final (count 1, emitted
    # exactly once). This is the streaming half of the tier-finality
    # contract: a finalized rollup point never changes after emission.
    import glob
    import os
    import shutil
    import time as _time

    import pandas as pd

    base = pd.Timestamp("2025-01-01 00:00:00")
    turns = [{"conv_id": "c1", "turn_idx": i, "role": "user", "text": "x",
              "tool": None, "ts": base + pd.Timedelta(minutes=i)}
             for i in range(31)]                       # minutes 0..30, 1/min
    ontime = [{"conv_id": "c1", "turn_idx": 50, "role": "user", "text": "y",
               "tool": None, "ts": base + pd.Timedelta(minutes=30, seconds=30)}]
    late = [{"conv_id": "c1", "turn_idx": 99, "role": "user", "text": "late",
             "tool": None, "ts": base + pd.Timedelta(minutes=5)}]

    src = str(tmp_path / "late_src")
    os.makedirs(src)

    def _write(rows, path):
        # write via Spark so the parquet physical types match the stream's
        # read schema exactly (pandas writes ns-INT64 ts / typeless nulls)
        tmp = path + ".d"
        spark.createDataFrame(pd.DataFrame(rows), TRANSCRIPT_SCHEMA) \
            .coalesce(1).write.mode("overwrite").parquet(tmp)
        shutil.move(glob.glob(os.path.join(tmp, "part-*.parquet"))[0], path)
        shutil.rmtree(tmp)

    now = _time.time()
    for k, rows in enumerate((turns, ontime, late)):
        p = os.path.join(src, f"f{k}.parquet")
        _write(rows, p)
        os.utime(p, (now - 60 + 30 * k, now - 60 + 30 * k))  # strict mtime order

    stream = (spark.readStream.schema(TRANSCRIPT_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (
        stream_rollup_1m(stream, watermark="2 minutes")
        .writeStream.format("memory").queryName("s_late")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)

    dropped = sum(p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
                  for p in q.recentProgress)
    assert dropped == 1        # exactly the replayed minute-5 event

    got = spark.sql(
        "SELECT window_start, turn_count FROM s_late ORDER BY window_start"
    ).toPandas()
    m5 = got[got.window_start == base + pd.Timedelta(minutes=5)]
    assert len(m5) == 1                        # emitted exactly once
    assert int(m5.turn_count.iloc[0]) == 1     # late replay never re-counted
    assert got.window_start.is_unique          # no append-mode re-emit anywhere


def test_online_monitor_vs_batch_segmenter_differential():
    # Round-3 VERDICT next #4: replay one series through BOTH the streaming
    # monitor state machine (monitor_scan — the exact kernel
    # applyInPandasWithState executes) and the batch CCDC segmenter, and
    # pin their relationship precisely.
    #
    # Same-event contract: for a step shift at slot S (after both are
    # warmed up), batch CCDC reports break_day AT slot S (the first
    # post-break observation), while the online monitor alerts at slot
    # S + consecutive - 1 (the row that CONFIRMS the run) — the monitor is
    # causal and cannot alert before seeing the full consecutive run, so
    # the fixed offset IS the expected divergence, not a bug.
    #
    # Warm-up divergence: a shift inside the monitor's min_train window is
    # absorbed into its baseline (no alert, by design); batch CCDC slides
    # its training window past the unstable span and fits one clean
    # segment (no break either) — both quiet, for different reasons.
    import numpy as np
    from dataclasses import asdict

    from yatsm_spark.kernel.ccdc import CCDCParams, ccdc_fit
    from yatsm_spark.operators.changescore import CONV_PARAMS
    from yatsm_spark.streaming.stream_rollup import monitor_scan

    p = CCDCParams(**asdict(CONV_PARAMS))
    n, shift_at, consecutive = 1500, 900, 5
    epochs = np.arange(n) * 60 + 1_700_000_000
    t = epochs / 86400.0
    noise = (1.5 * np.sin(2 * np.pi * np.arange(n) / 7)
             + 1.0 * np.sin(2 * np.pi * np.arange(n) / 11))

    def slots(res):
        return [round((s.break_day * 86400 - 1_700_000_000) / 60)
                for s in res.segments if s.break_day]

    # 1) shift after warm-up: one event, fixed offset between the surfaces
    rates = 10.0 + noise
    rates[shift_at:] += 25.0
    alerts, _ = monitor_scan(rates, (0, 0.0, 0.0, 0), threshold=p.threshold,
                             consecutive=consecutive, min_train=60)
    assert [a[0] for a in alerts] == [shift_at + consecutive - 1]
    assert slots(ccdc_fit(t, rates, p)) == [shift_at]

    # 2) shift inside monitor warm-up: both surfaces stay quiet
    early = 10.0 + noise
    early[30:] += 25.0
    alerts_w, _ = monitor_scan(early, (0, 0.0, 0.0, 0), threshold=p.threshold,
                               consecutive=consecutive, min_train=60)
    assert alerts_w == []
    assert slots(ccdc_fit(t, early, p)) == []

    # 3) stable series: no alert, no break
    stable = 10.0 + noise
    alerts_s, _ = monitor_scan(stable, (0, 0.0, 0.0, 0), threshold=p.threshold,
                               consecutive=consecutive, min_train=60)
    assert alerts_s == []
    assert slots(ccdc_fit(t, stable, p)) == []


def test_stream_sessionize_matches_batch(spark, tmp_path):
    # synthetic per-user event stream: bursts split by >30min gaps; gaps
    # are never EXACTLY the timeout (the documented half-open boundary
    # divergence between session_window and the batch strict-> rule).
    import numpy as np
    import pandas as pd

    from yatsm_spark.operators.sessionize import session_stats
    from yatsm_spark.streaming.stream_rollup import stream_sessionize

    rng = np.random.RandomState(3)
    rows, base = [], pd.Timestamp("2025-03-01")
    eid = 0
    for user in range(12):
        t = base + pd.Timedelta(minutes=int(rng.randint(0, 60)))
        for _burst in range(int(rng.randint(1, 5))):
            for _ in range(int(rng.randint(1, 8))):
                rows.append({"event_id": eid, "ts": t, "user_id": user,
                             "event_type": ["view", "click", "tool"][eid % 3]})
                eid += 1
                t += pd.Timedelta(seconds=int(rng.randint(1, 600)))
            t += pd.Timedelta(seconds=1801 + int(rng.randint(0, 4000)))  # close session
    src = str(tmp_path / "sess_src")
    spark.createDataFrame(pd.DataFrame(rows)).coalesce(2).write.parquet(src)

    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string").parquet(src)
    q = (stream_sessionize(stream, watermark="0 seconds")
         .writeStream.format("memory").queryName("s_sessions")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = spark.sql("SELECT user_id, session_start, session_end, n_events, "
                    "n_event_types, duration_s FROM s_sessions")
    want = session_stats(spark.read.parquet(src)).select(
        "user_id", "session_start", "session_end", "n_events",
        "n_event_types", "duration_s")
    # append mode may withhold each user's final (unclosed) session
    assert got.exceptAll(want).count() == 0
    missing = want.exceptAll(got).count()
    assert missing <= 12
    assert got.count() >= want.count() - 12 and want.count() > 20


def test_stream_hll_equals_batch(spark, tmp_path):
    """The stream-maintained register table, fed through the stateless
    estimator, equals batch hll_distinct for every finalized window."""
    from pyspark.sql import functions as F

    from yatsm_spark.operators.sketches import hll_distinct, hll_estimate
    from yatsm_spark.streaming.stream_rollup import stream_hll_registers

    tx = generate_transcripts(spark, 10, seed=5, max_turns=400)
    src = str(tmp_path / "hll_src")
    tx.write.parquet(src)

    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src)
    q = (stream_hll_registers(stream, [], "text", window="1 hour",
                              watermark="0 seconds")
         .writeStream.format("memory").queryName("s_hll")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    est_stream = hll_estimate(spark.sql("SELECT * FROM s_hll"),
                              ["window_start"])
    batch = spark.read.parquet(src).select(
        F.window("ts", "1 hour").start.alias("window_start"), "text")
    est_batch = hll_distinct(batch, ["window_start"], "text")

    emitted = est_stream.collect()
    assert len(emitted) > 0
    want = {r.window_start: (r.n_buckets_used, r.v_zero, r.est_distinct)
            for r in est_batch.collect()}
    for r in emitted:  # every emitted window matches batch EXACTLY
        assert (r.n_buckets_used, r.v_zero, r.est_distinct) \
            == want[r.window_start], r.window_start
    # append mode may withhold only the final open window
    assert len(want) - len(emitted) <= 1


def test_stream_cms_equals_batch(spark, tmp_path):
    """The stream-maintained CMS counter table equals batch cms_table for
    every finalized window — SUM-merge is order/parallelism-free, so the
    incremental counters are EXACT, not approximately merged."""
    from pyspark.sql import functions as F

    from yatsm_spark.operators.sketches import cms_table
    from yatsm_spark.streaming.stream_rollup import stream_cms_counters

    tx = generate_transcripts(spark, 8, seed=9, max_turns=300)
    src = str(tmp_path / "cms_src")
    tx.write.parquet(src)

    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src)
    q = (stream_cms_counters(stream, ["role"], "conv_id", window="1 hour",
                             watermark="0 seconds")
         .writeStream.format("memory").queryName("s_cms")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    emitted = spark.sql("SELECT * FROM s_cms").collect()
    assert len(emitted) > 0
    batch = spark.read.parquet(src).select(
        F.window("ts", "1 hour").start.alias("window_start"),
        "role", "conv_id")
    want = {(r.window_start, r.role, r.r, r.c): r.cnt
            for r in cms_table(batch, ["window_start", "role"],
                               "conv_id").collect()}
    seen_windows = set()
    for r in emitted:
        assert want[(r.window_start, r.role, r.r, r.c)] == r.cnt
        seen_windows.add(r.window_start)
    # append mode may withhold only the final open window
    all_windows = {k[0] for k in want}
    assert len(all_windows) - len(seen_windows) <= 1


def test_stream_anomaly_equals_batch(spark, tmp_path):
    """stream_anomaly's flags are BIT-equal to the batch rolling_anomaly
    on the same rows — the ring-buffer state IS the batch window frame,
    persisted across micro-batches (two files, maxFilesPerTrigger=1, so
    the buffer must survive a state round-trip mid-series)."""
    import glob
    import os
    import shutil
    import time as _time

    from yatsm_spark.operators.tsfuncs import rolling_anomaly
    from yatsm_spark.streaming.stream_rollup import stream_anomaly

    base = pd.Timestamp("2025-01-01")
    rng = np.random.RandomState(7)
    rows = []
    for c in ("c1", "c2"):
        for m in range(40):
            v = int(rng.randint(8, 13))
            if c == "c1" and m in (25, 26):
                v = 90                      # spikes mid-second-batch
            rows.append({"conv_id": c,
                         "window_start": base + pd.Timedelta(minutes=m),
                         "turn_count": v})
    pdf = pd.DataFrame(rows)
    src = str(tmp_path / "anom_src")
    os.makedirs(src)

    def _write(sub, path):
        tmp = str(tmp_path / "w")
        spark.createDataFrame(sub).coalesce(1) \
            .write.mode("overwrite").parquet(tmp)
        shutil.move(glob.glob(os.path.join(tmp, "part-*.parquet"))[0], path)
        shutil.rmtree(tmp)

    now = _time.time()
    first = pdf[pdf.window_start < base + pd.Timedelta(minutes=20)]
    second = pdf[pdf.window_start >= base + pd.Timedelta(minutes=20)]
    for k, sub in enumerate((first, second)):
        p = os.path.join(src, f"f{k}.parquet")
        _write(sub, p)
        os.utime(p, (now - 60 + 30 * k, now - 60 + 30 * k))

    stream = (spark.readStream
              .schema("conv_id string, window_start timestamp, turn_count long")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream_anomaly(stream, k=8, sigma=3, min_n=4)
         .writeStream.format("memory").queryName("s_anom")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {(r.conv_id, r.window_start): r.is_anomaly
           for r in spark.sql("SELECT * FROM s_anom").collect()}
    batch = rolling_anomaly(spark.createDataFrame(pdf), "turn_count",
                            k=8, sigma=3, min_n=4)
    want = {(r.conv_id, r.window_start): r.is_anomaly
            for r in batch.collect()}
    assert len(got) == len(want) == len(pdf)
    assert got == want
    # sanity: the injected spikes actually flag
    assert got[("c1", base + pd.Timedelta(minutes=25))] is True


def test_stream_ewma_equals_batch_bit_exact(spark, tmp_path):
    """stream_ewma emits the batch ewma column BIT-for-BIT, including
    across a micro-batch boundary (the state round-trip must hand back
    the exact double, not a rounded one)."""
    import glob
    import os
    import shutil
    import time as _time

    from yatsm_spark.operators.tsfuncs import ewma
    from yatsm_spark.streaming.stream_rollup import stream_ewma

    base = pd.Timestamp("2025-01-01")
    rng = np.random.RandomState(3)
    rows = [{"conv_id": c,
             "window_start": base + pd.Timedelta(minutes=m),
             "turn_count": int(rng.randint(1, 50))}
            for c in ("c1", "c2") for m in range(30)]
    pdf = pd.DataFrame(rows)
    src = str(tmp_path / "ewma_src")
    os.makedirs(src)

    def _write(sub, path):
        tmp = str(tmp_path / "w")
        spark.createDataFrame(sub).coalesce(1) \
            .write.mode("overwrite").parquet(tmp)
        shutil.move(glob.glob(os.path.join(tmp, "part-*.parquet"))[0], path)
        shutil.rmtree(tmp)

    now = _time.time()
    cut = base + pd.Timedelta(minutes=17)
    for k, sub in enumerate((pdf[pdf.window_start < cut],
                             pdf[pdf.window_start >= cut])):
        p = os.path.join(src, f"f{k}.parquet")
        _write(sub, p)
        os.utime(p, (now - 60 + 30 * k, now - 60 + 30 * k))

    stream = (spark.readStream
              .schema("conv_id string, window_start timestamp, turn_count long")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream_ewma(stream, 0.25)
         .writeStream.format("memory").queryName("s_ewma")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {(r.conv_id, r.window_start): r.ewma
           for r in spark.sql("SELECT * FROM s_ewma").collect()}
    want = {(r.conv_id, r.window_start): r.ewma
            for r in ewma(spark.createDataFrame(pdf),
                          "turn_count", 0.25).collect()}
    assert len(got) == len(want) == len(pdf)
    assert got == want          # == on floats: bit-equality demanded


def test_stream_holtwinters_equals_batch_bit_exact(spark, tmp_path):
    """stream_holtwinters emits the batch level/trend/seasonal columns
    BIT-for-BIT, including across a micro-batch boundary that lands
    mid-seasonal-cycle (the array-typed ring state round-trip must hand
    back exact doubles)."""
    import glob
    import os
    import shutil
    import time as _time

    from yatsm_spark.operators.tsfuncs import holt_winters
    from yatsm_spark.streaming.stream_rollup import stream_holtwinters

    base = pd.Timestamp("2025-01-01")
    rng = np.random.RandomState(7)
    rows = [{"conv_id": c,
             "window_start": base + pd.Timedelta(hours=h),
             "turn_count": int(rng.randint(1, 50))}
            for c in ("c1", "c2") for h in range(20)]
    pdf = pd.DataFrame(rows)
    src = str(tmp_path / "hw_src")
    os.makedirs(src)

    def _write(sub, path):
        tmp = str(tmp_path / "w")
        spark.createDataFrame(sub).coalesce(1) \
            .write.mode("overwrite").parquet(tmp)
        shutil.move(glob.glob(os.path.join(tmp, "part-*.parquet"))[0], path)
        shutil.rmtree(tmp)

    now = _time.time()
    # period=6 -> the cut at h=9 lands mid-cycle, so the restored ring
    # must carry live (non-zero) seasonals across the boundary
    cut = base + pd.Timedelta(hours=9)
    for k, sub in enumerate((pdf[pdf.window_start < cut],
                             pdf[pdf.window_start >= cut])):
        p = os.path.join(src, f"f{k}.parquet")
        _write(sub, p)
        os.utime(p, (now - 60 + 30 * k, now - 60 + 30 * k))

    stream = (spark.readStream
              .schema("conv_id string, window_start timestamp, turn_count long")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream_holtwinters(stream, period=6)
         .writeStream.format("memory").queryName("s_hw")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {(r.conv_id, r.window_start): (r.level, r.trend, r.seasonal)
           for r in spark.sql("SELECT * FROM s_hw").collect()}
    want = {(r.conv_id, r.window_start): (r.level, r.trend, r.seasonal)
            for r in holt_winters(
                spark.createDataFrame(pdf), "turn_count", period=6)
            .collect()}
    assert len(got) == len(want) == len(pdf)
    assert got == want          # == on floats: bit-equality demanded


def test_stream_alert_episodes_matches_batch(spark, tmp_path):
    """stream_alert_episodes over the batch flag rows emits exactly the
    batch alert_episodes, including an episode whose run straddles a
    micro-batch boundary (the open-episode state must carry bounds,
    count, and running peak across the restart)."""
    import glob
    import os
    import shutil
    import time as _time

    from yatsm_spark.operators.tsfuncs import alert_episodes
    from yatsm_spark.streaming.stream_rollup import stream_alert_episodes

    base = pd.Timestamp("2025-01-01")
    # handcrafted flag rows: episode 1 (slots 22-26) straddles the file
    # cut at 25; a tie peak (equal z at 23/24 -> later slot wins); a
    # NULL-z zero-variance anomaly episode (33-34); NULL flags break runs
    def _flag_rows(c):
        rows = []
        for m in range(40):
            flag, z, v = False, None, 5
            if 22 <= m <= 26:
                flag = True
                z = {22: 3.5, 23: 7.25, 24: 7.25, 25: 4.0, 26: 3.1}[m]
                v = 50 + m
            elif m in (33, 34):
                flag, z, v = True, None, 99
            elif m == 30:
                flag = None
            rows.append({"conv_id": c,
                         "window_start": base + pd.Timedelta(minutes=m),
                         "turn_count": v, "is_anomaly": flag,
                         "zscore": z})
        return rows

    fpdf = pd.DataFrame(_flag_rows("c1") + _flag_rows("c2"))
    flags = spark.createDataFrame(
        fpdf, "conv_id string, window_start timestamp, turn_count long, "
              "is_anomaly boolean, zscore double")

    src = str(tmp_path / "ep_src")
    os.makedirs(src)

    def _write(sub, path):
        tmp = str(tmp_path / "w")
        spark.createDataFrame(sub).coalesce(1) \
            .write.mode("overwrite").parquet(tmp)
        shutil.move(glob.glob(os.path.join(tmp, "part-*.parquet"))[0], path)
        shutil.rmtree(tmp)

    now = _time.time()
    cut = base + pd.Timedelta(minutes=25)
    for k, sub in enumerate((fpdf[fpdf.window_start < cut],
                             fpdf[fpdf.window_start >= cut])):
        p = os.path.join(src, f"f{k}.parquet")
        _write(sub, p)
        os.utime(p, (now - 60 + 30 * k, now - 60 + 30 * k))

    stream = (spark.readStream
              .schema("conv_id string, window_start timestamp, "
                      "turn_count long, is_anomaly boolean, zscore double")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream_alert_episodes(stream)
         .writeStream.format("memory").queryName("s_episodes")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {tuple(r) for r in
           spark.sql("SELECT * FROM s_episodes").collect()}
    want_all = alert_episodes(flags).collect()
    # both bursts are followed by calm rows, so every batch episode is
    # CLOSED in the stream too -> exact set equality
    want = {tuple(r) for r in want_all}
    assert len(want) >= 4          # two bursts x two convs
    assert got == want


def test_stream_swing_matches_batch_keepset(spark, tmp_path):
    """stream_swing emits EXACTLY the batch swing_door archive points
    minus the series-final one (unobservable before end-of-stream),
    across a micro-batch boundary landing mid-corridor."""
    import glob
    import os
    import shutil
    import time as _time

    from yatsm_spark.operators.downsample import swing_door
    from yatsm_spark.streaming.stream_rollup import stream_swing

    base = pd.Timestamp("2025-01-01")
    rng = np.random.RandomState(9)
    rows = []
    for c in ("c1", "c2"):
        xs = (np.cumsum(rng.randint(-3, 4, size=50)) + 40).tolist()
        rows += [{"conv_id": c,
                  "window_start": base + pd.Timedelta(minutes=m),
                  "turn_count": int(v)} for m, v in enumerate(xs)]
    pdf = pd.DataFrame(rows)
    src = str(tmp_path / "sw_src")
    os.makedirs(src)

    def _write(sub, path):
        tmp = str(tmp_path / "w")
        spark.createDataFrame(sub).coalesce(1) \
            .write.mode("overwrite").parquet(tmp)
        shutil.move(glob.glob(os.path.join(tmp, "part-*.parquet"))[0],
                    path)
        shutil.rmtree(tmp)

    now = _time.time()
    cut = base + pd.Timedelta(minutes=23)
    for k, sub in enumerate((pdf[pdf.window_start < cut],
                             pdf[pdf.window_start >= cut])):
        p = os.path.join(src, f"f{k}.parquet")
        _write(sub, p)
        os.utime(p, (now - 60 + 30 * k, now - 60 + 30 * k))

    stream = (spark.readStream
              .schema("conv_id string, window_start timestamp, "
                      "turn_count long")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream_swing(stream, e=2)
         .writeStream.format("memory").queryName("s_swing")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {(r.conv_id, r.window_start, r.turn_count)
           for r in spark.sql("SELECT * FROM s_swing").collect()}
    batch = swing_door(spark.createDataFrame(pdf), "turn_count", e=2) \
        .collect()
    # drop each conv's final archive point (max pos)
    last = {}
    for r in batch:
        last[r["conv_id"]] = max(last.get(r["conv_id"], -1), r["pos"])
    want = {(r["conv_id"], r["window_start"], r["turn_count"])
            for r in batch if r["pos"] != last[r["conv_id"]]}
    assert len(want) >= 4       # random walks at e=2 archive plenty
    assert got == want


def test_stream_left_profile_bit_equals_batch(spark, tmp_path):
    """stream_left_profile emits EVERY batch left-profile row with
    bit-identical scores — a left profile never changes once its
    window closes, so there is no withheld tail; the ring state must
    hand the kernel the exact candidate horizon across micro-batches."""
    import glob
    import os
    import shutil
    import time as _time

    from yatsm_spark.operators.matrixprofile import left_matrix_profile
    from yatsm_spark.streaming.stream_rollup import stream_left_profile

    base = pd.Timestamp("2025-01-01")
    rng = np.random.RandomState(13)
    rows = []
    for c in ("c1", "c2"):
        xs = rng.randint(0, 30, size=60).tolist()
        rows += [{"conv_id": c,
                  "window_start": base + pd.Timedelta(hours=h),
                  "turn_count": int(v)} for h, v in enumerate(xs)]
    pdf = pd.DataFrame(rows)
    src = str(tmp_path / "lp_src")
    os.makedirs(src)

    def _write(sub, path):
        tmp = str(tmp_path / "w")
        spark.createDataFrame(sub).coalesce(1) \
            .write.mode("overwrite").parquet(tmp)
        shutil.move(glob.glob(os.path.join(tmp, "part-*.parquet"))[0],
                    path)
        shutil.rmtree(tmp)

    now = _time.time()
    cut = base + pd.Timedelta(hours=31)   # boundary mid-history
    for k, sub in enumerate((pdf[pdf.window_start < cut],
                             pdf[pdf.window_start >= cut])):
        p = os.path.join(src, f"f{k}.parquet")
        _write(sub, p)
        os.utime(p, (now - 60 + 30 * k, now - 60 + 30 * k))

    stream = (spark.readStream
              .schema("conv_id string, window_start timestamp, "
                      "turn_count long")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream_left_profile(stream, m=8, w_hist=16)
         .writeStream.format("memory").queryName("s_lp")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {(r.conv_id, r.idx): (r.window_start, r.lp, r.lp_idx)
           for r in spark.sql("SELECT * FROM s_lp").collect()}
    want = {(r["conv_id"], r["idx"]):
            (r["window_start"], r["lp"], r["lp_idx"])
            for r in left_matrix_profile(
                spark.createDataFrame(pdf), m=8, w_hist=16).collect()}
    assert len(got) == len(want) == 2 * (60 - 8 + 1)
    assert got == want          # == on floats: bit equality demanded


def test_stream_kalman_equals_batch_bit_exact(spark, tmp_path):
    """stream_kalman emits the batch kalman_level / kalman_var columns
    BIT-for-BIT across a micro-batch boundary: the state round-trips the
    UNSNAPPED posterior doubles; snapping happens only on emit."""
    import glob
    import os
    import shutil
    import time as _time

    from yatsm_spark.operators.kalman import kalman_smooth
    from yatsm_spark.streaming.stream_rollup import stream_kalman

    base = pd.Timestamp("2025-01-01")
    rng = np.random.RandomState(11)
    rows = [{"conv_id": c,
             "window_start": base + pd.Timedelta(hours=h),
             "turn_count": int(rng.randint(0, 40))}
            for c in ("c1", "c2") for h in range(24)]
    pdf = pd.DataFrame(rows)
    src = str(tmp_path / "kal_src")
    os.makedirs(src)

    def _write(sub, path):
        tmp = str(tmp_path / "w")
        spark.createDataFrame(sub).coalesce(1) \
            .write.mode("overwrite").parquet(tmp)
        shutil.move(glob.glob(os.path.join(tmp, "part-*.parquet"))[0], path)
        shutil.rmtree(tmp)

    now = _time.time()
    cut = base + pd.Timedelta(hours=13)
    for k, sub in enumerate((pdf[pdf.window_start < cut],
                             pdf[pdf.window_start >= cut])):
        p = os.path.join(src, f"f{k}.parquet")
        _write(sub, p)
        os.utime(p, (now - 60 + 30 * k, now - 60 + 30 * k))

    stream = (spark.readStream
              .schema("conv_id string, window_start timestamp, turn_count long")
              .option("maxFilesPerTrigger", 1).parquet(src))
    qy = (stream_kalman(stream)
          .writeStream.format("memory").queryName("s_kal")
          .outputMode("append").trigger(availableNow=True).start())
    qy.awaitTermination(120)

    got = {(r.conv_id, r.window_start): (r.kalman_level, r.kalman_var)
           for r in spark.sql("SELECT * FROM s_kal").collect()}
    want = {(r.conv_id, r.window_start): (r.kalman_level, r.kalman_var)
            for r in kalman_smooth(spark.createDataFrame(pdf),
                                   "turn_count").collect()}
    assert len(got) == len(want) == len(pdf)
    assert got == want          # == on floats: bit-equality demanded
