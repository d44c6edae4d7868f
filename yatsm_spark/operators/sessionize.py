"""Sessionization: gaps-and-islands session assignment + per-session stats.

Training-data-pipeline addition: user/agent event streams get grouped into
sessions (gap > timeout starts a new one) — the standard preprocessing step
for behavioral training data and the batch twin of Structured Streaming's
`session_window`.

Spark-first shape: ONE shuffle on the session key. The lag/cumsum window
pass partitions by key; the per-session aggregation clusters on
(key, session_idx), and HashPartitioning(key) already satisfies that
ClusteredDistribution (subset rule), so Catalyst inserts NO second
exchange — window and agg share the same physical partitioning. Hot keys
behave like any windowed workload (bounded by the busiest single key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(events: DataFrame, key_col: str = "user_id", ts_col: str = "ts",
               order_col: str = "event_id", timeout_s: int = 1800) -> DataFrame:
    """Append session_idx (0-based per key): a new session starts when the
    gap since the previous event exceeds timeout_s STRICTLY (gap ==
    timeout stays in-session). Ordering ties on (ts, order_col) for
    determinism under duplicate timestamps."""
    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    gap_us = F.unix_micros(F.col(ts_col).cast("timestamp")) - F.unix_micros(F.lag(F.col(ts_col).cast("timestamp")).over(w))
    brk = F.when(gap_us.isNull() | (gap_us > timeout_s * 1_000_000), 1).otherwise(0)
    idx = F.sum(brk).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1
    return events.withColumn("session_idx", idx.cast("long"))


def session_stats(events: DataFrame, key_col: str = "user_id",
                  ts_col: str = "ts", order_col: str = "event_id",
                  type_col: str = "event_type", timeout_s: int = 1800) -> DataFrame:
    """Per-session rollup: bounds, event count, distinct event types,
    duration. All exact (timestamps/longs) — no order-dependent float
    accumulation, so any engine reproduces it bit-for-bit."""
    s = sessionize(events, key_col, ts_col, order_col, timeout_s)
    dur = (F.unix_micros(F.max(ts_col).cast("timestamp")) - F.unix_micros(F.min(ts_col).cast("timestamp"))) / 1e6
    return (
        s.groupBy(key_col, "session_idx")
        .agg(F.min(ts_col).alias("session_start"),
             F.max(ts_col).alias("session_end"),
             F.count(F.lit(1)).alias("n_events"),
             F.countDistinct(type_col).alias("n_event_types"),
             dur.alias("duration_s"))
    )
