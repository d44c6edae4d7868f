"""Structured Streaming ingest into the 1m tier + online break monitor.

SURVEY.md §2.11: the reference is batch-only (dates pre-sorted, late data
unsupported); the graft's streaming path is the v2 addition:

- ``stream_rollup_1m``: readStream -> watermarked tumbling 1m aggregation,
  append mode. The aggregate list is EXACTLY the batch one (integral
  moments), so a finalized streaming window equals the batch rollup row for
  the same slot — tested in tests/test_streaming.py by diffing a
  Trigger.AvailableNow run against the batch operator.
- ``online_monitor``: applyInPandasWithState per conv — the streaming
  analogue of the CCDC monitor loop (state = baseline moments + consecutive
  over-threshold counter). Emits break alerts online; exact batch parity is
  NOT claimed (the batch kernel refits retrospectively; the online monitor
  is a z-score approximation), matching the engine's batch-is-exact /
  stream-is-operational split.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_measures(stream: DataFrame) -> DataFrame:
    """Same projection as ingest.with_measures, streaming-safe."""
    return stream.select(
        "conv_id", "turn_idx", "ts",
        F.length("text").cast("long").alias("token_len"),
        F.col("tool").isNotNull().cast("int").alias("is_tool_call"),
        "role",
    )


def stream_rollup_1m(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Watermarked 1m tumbling rollup. Append-mode ready: rows emit once
    the watermark passes the window end — the streaming high-watermark that
    feeds the same cascade/eviction machinery as batch."""
    m = stream_measures(stream).withWatermark("ts", watermark)
    return (
        m.groupBy("conv_id", F.window("ts", "1 minute").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("turn_count"),
            F.sum("token_len").alias("token_len_sum"),
            F.min("token_len").alias("token_len_min"),
            F.max("token_len").alias("token_len_max"),
            F.sum(F.col("token_len") * F.col("token_len")).alias("token_len_sumsq"),
            F.sum("is_tool_call").cast("long").alias("tool_call_count"),
            F.sum((F.col("role") == "user").cast("long")).alias("role_user_count"),
            F.sum((F.col("role") == "assistant").cast("long")).alias("role_assistant_count"),
            F.sum((~F.col("role").isin("user", "assistant")).cast("long")).alias("role_other_count"),
        )
        .select(F.col("conv_id"), F.col("w.start").alias("window_start"),
                "turn_count", "token_len_sum", "token_len_min", "token_len_max",
                "token_len_sumsq", "tool_call_count", "role_user_count",
                "role_assistant_count", "role_other_count")
    )


ALERT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("alert_ts", T.TimestampType(), False),
    T.StructField("score", T.DoubleType(), False),
    T.StructField("baseline_rate", T.DoubleType(), False),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType(), False),
    T.StructField("s", T.DoubleType(), False),      # sum of rates
    T.StructField("ss", T.DoubleType(), False),     # sum of squared rates
    T.StructField("consec", T.IntegerType(), False),
])


def _monitor_fn(threshold: float, consecutive: int, min_train: int):
    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        import numpy as np

        if state.exists:
            n, s, ss, consec = state.get
        else:
            n, s, ss, consec = 0, 0.0, 0.0, 0
        alerts = []
        for pdf in pdfs:
            pdf = pdf.sort_values("window_start", kind="stable")
            for _, row in pdf.iterrows():
                rate = float(row["turn_count"])
                if n >= min_train:
                    mean = s / n
                    var = max(ss / n - mean * mean, 1e-9)
                    z = abs(rate - mean) / (var ** 0.5)
                    if z > threshold:
                        consec += 1
                        if consec >= consecutive:
                            alerts.append((key[0], row["window_start"], z, mean))
                            # reset baseline after a confirmed break (new segment)
                            n, s, ss, consec = 0, 0.0, 0.0, 0
                            continue
                        # candidate break: do NOT absorb into baseline
                        continue
                    consec = 0
                n += 1
                s += rate
                ss += rate * rate
        state.update((n, s, ss, consec))
        if alerts:
            yield pd.DataFrame(alerts, columns=["conv_id", "alert_ts", "score", "baseline_rate"])

    return fn


def online_monitor(
    rollup_stream: DataFrame,
    threshold: float = 3.55,
    consecutive: int = 5,
    min_train: int = 16,
) -> DataFrame:
    """Stateful per-conv break monitor over a streaming 1m rollup.
    State = baseline (n, Σ, Σ²) + consecutive counter — the same moment
    discipline as the tiers, O(1) state per conv."""
    return rollup_stream.groupBy("conv_id").applyInPandasWithState(
        _monitor_fn(threshold, consecutive, min_train),
        outputStructType=ALERT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
