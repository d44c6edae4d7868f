"""Tumbling rollups (A6) and gap-fill (W8) — pure DataFrame ops.

Parity anchors:
- A6 graft rollups (SURVEY.md §2.4): per (conv, window) turn_count,
  token-length sum/min/max (+ sumsq moment), tool_call_count, role counts.
  Spark: ``groupBy(conv_id, window(ts, tier))`` — hash aggregate with
  automatic partial (map-side) + final phases; the only shuffle is on the
  group key.
- W8 gap-fill (SURVEY.md §2.5): a row for every tier slot in each conv's
  active span; counts zero-filled, stats null. Spark: per-conv min/max via
  window functions + ``sequence()`` + ``explode`` + left join — no Python.
  (Chosen over applyInPandas reindex: stays entirely JVM-side.)

Exactness-at-any-parallelism design (SURVEY.md §7.5.1): every stored moment
is integral (LONG) — counts, sums, min/max, and the sum-of-squares moment
(token_len <= 32k => square <= 2^30; a conv-day group stays far below int64
range) — so aggregation order can never change a bit. Derived float stats
(avg, stddev, rates) are computed at read time from the integral moments.

Retention-tier layout: TIERS maps tier name -> slot seconds. The 1m tier is
the graft's line cache (S5): materializing it IS the memoization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TIERS = {"1m": 60, "1h": 3600, "1d": 86400}

#: Additive (decomposable) measure columns — the cascade contract (A7).
MEASURES = [
    "turn_count",
    "token_len_sum",
    "token_len_min",
    "token_len_max",
    "token_len_sumsq",
    "tool_call_count",
    "role_user_count",
    "role_assistant_count",
    "role_other_count",
]

_SUM_COLS = [c for c in MEASURES if c not in ("token_len_min", "token_len_max")]


def _slot(col, seconds: int):
    """Tumbling-window start: epoch-truncated timestamp. Equivalent to
    F.window(ts, ...).start but joinable/sequenceable as a plain column."""
    return F.timestamp_seconds(
        (F.unix_timestamp(col).cast("long") / seconds).cast("long") * seconds
    )


def rollup_from_turns(measures: DataFrame, tier: str = "1m") -> DataFrame:
    """A6: raw per-turn measures -> one row per (conv_id, slot).

    Input: output of ingest.with_measures. One shuffle (hash agg on
    composite key); partial aggregation halves shuffle volume for free.
    """
    sec = TIERS[tier]
    return (
        measures
        .groupBy("conv_id", _slot(F.col("ts"), sec).alias("window_start"))
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
        .withColumn("gap_filled", F.lit(False))
    )


def gapfill(rollup: DataFrame, tier: str = "1m") -> DataFrame:
    """W8: densify each conv's [min_slot, max_slot] span.

    The span comes from a window min/max over the conv partition (reuses the
    rollup's existing conv-hash distribution — no extra join against a spans
    table), then sequence+explode emits the grid and a left join attaches
    the sparse rows. Gap rows: counts 0, stats null, gap_filled true.

    Skew note: explode of a mega-conv's span produces (span/tier) rows in
    one partition's tasks; the grid side is then joined on the composite
    (conv_id, window_start) key, which re-shuffles fine-grained — AQE skew
    handling splits any residual hot partition.
    """
    sec = TIERS[tier]
    # Spans via groupBy (partial-agg, tiny output), NOT a window function —
    # a window would sort the whole tier inside each conv partition; the
    # hash agg streams it. The grid explode then happens on the small spans
    # relation and re-shuffles only grid rows.
    spans = rollup.groupBy("conv_id").agg(
        F.min("window_start").alias("span_min"),
        F.max("window_start").alias("span_max"),
    )
    grid = spans.select(
        "conv_id",
        F.explode(
            F.sequence("span_min", "span_max", F.expr(f"INTERVAL {sec} SECONDS"))
        ).alias("window_start"),
    )
    joined = grid.join(rollup, on=["conv_id", "window_start"], how="left")
    fill = [F.coalesce(c, F.lit(0)).alias(c) for c in
            ("turn_count", "tool_call_count", "role_user_count",
             "role_assistant_count", "role_other_count")]
    keep_null = ["token_len_sum", "token_len_min", "token_len_max", "token_len_sumsq"]
    return joined.select(
        "conv_id", "window_start", *fill, *keep_null,
        F.coalesce("gap_filled", F.lit(True)).alias("gap_filled"),
    ).select("conv_id", "window_start", *MEASURES, "gap_filled")


def rollup_gapfilled(measures: DataFrame, tier: str = "1m") -> DataFrame:
    return gapfill(rollup_from_turns(measures, tier), tier)


def with_derived_stats(rollup: DataFrame) -> DataFrame:
    """Read-time float stats from integral moments (never stored —
    FIXTURES.md §2.1): avg, tool_rate, stddev (population, via
    n*sumsq - sum^2)."""
    n = F.col("turn_count")
    s = F.col("token_len_sum")
    ss = F.col("token_len_sumsq")
    return (
        rollup
        .withColumn("token_len_avg", F.when(n > 0, s.cast("double") / n))
        .withColumn("tool_call_rate", F.when(n > 0, F.col("tool_call_count").cast("double") / n))
        .withColumn(
            "token_len_std",
            F.when(n > 1, F.sqrt(F.greatest((ss * n - s * s).cast("double"), F.lit(0.0)) / (n * n))),
        )
    )
