"""Series-shape analytics over rollup tiers and raw transcripts:
candlestick (OHLC) reduction, state-duration accounting, heartbeat
uptime intervals, autocorrelation, and classical seasonal decomposition.

These are the TimescaleDB-toolkit-style aggregates (candlestick_agg,
state_agg, heartbeat_agg) plus the two series diagnostics every
monitoring stack grows (ACF, trend/seasonal/residual split), recast as
pure Catalyst plans over the engine's tiers.

Scale shape: every operator here is ONE hash-partition by the series
key (plus, for the seasonal split, one further window keyed by
(series, phase)). No UDFs, no collect, no joins against unbounded
sides; inputs are tiers (already aggregated) or raw turns pruned to
the 2-4 columns each operator reads. All emitted numerics are either
exact integers or single snapped divisions of exact decimal moments,
so the DuckDB oracles agree bit-for-bit (SURVEY.md §7.5.1 float
policy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _snap6(col):
    # non-negative OR signed-safe round-half-up: floor(x*1e6 + 0.5)/1e6.
    # For negative x this is round-half-toward-positive — the SAME
    # convention as the DuckDB oracles, which replay the identical
    # expression, so the direction of the half-tie never diverges.
    return F.floor(col * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def ohlc(tier: DataFrame, value_col: str = "turn_count",
         bucket_secs: int = 3600, by: str = "conv_id",
         order_col: str = "window_start") -> DataFrame:
    """Candlestick reduction (TimescaleDB candlestick_agg): per
    (series, bucket) the open/high/low/close of ``value_col`` plus the
    slot count. Open/close are picked by min_by/max_by on the slot
    timestamp — unique within a series, so no tie policy is needed.
    Exact integer relation; one groupBy shuffle with map-side partial
    aggregation."""
    b = F.to_timestamp(
        F.floor(F.unix_timestamp(F.col("_t")) / bucket_secs)
        .cast("bigint") * bucket_secs)
    v = F.col(value_col)
    return (tier.select(by, F.col(order_col).alias("_t"),
                        v.alias("_v"))
                .groupBy(F.col(by), b.alias("bucket_start"))
                .agg(F.min_by("_v", "_t").alias("open"),
                     F.max("_v").alias("high"),
                     F.min("_v").alias("low"),
                     F.max_by("_v", "_t").alias("close"),
                     F.count(F.lit(1)).alias("n_slots")))


def state_durations(tx: DataFrame, state_col: str = "role",
                    by: str = "conv_id", ts_col: str = "ts",
                    order_col: str = "turn_idx") -> DataFrame:
    """State accounting (TimescaleDB state_agg): total wall seconds a
    series spent in each state, where each event holds its state until
    the next event (the last event holds for 0s — the series has no
    knowledge past its final timestamp). Also counts events and runs
    (maximal same-state stretches).

    Pure window + groupBy: LEAD(ts) and LAG(state) over the series
    order, then one hash aggregation on (series, state). Durations are
    exact integer MICROSECONDS (unix_micros diffs — second-granularity
    epochs would force a truncate-vs-round choice that differs between
    engines)."""
    w = Window.partitionBy(by).orderBy(ts_col, order_col)
    e = F.unix_micros(F.col(ts_col))
    stepped = tx.select(
        by, F.col(state_col).alias("state"),
        (F.coalesce(F.lead(e).over(w), e) - e).alias("_dur"),
        F.when(F.lag(state_col).over(w).isNull()
               | (F.lag(state_col).over(w) != F.col(state_col)), 1)
         .otherwise(0).alias("_run_start"))
    return (stepped.groupBy(by, "state")
                   .agg(F.sum("_dur").cast("long").alias("total_us"),
                        F.count(F.lit(1)).alias("n_events"),
                        F.sum("_run_start").cast("long").alias("n_runs")))


def uptime_intervals(tx: DataFrame, tolerance_secs: int = 300,
                     by: str = "conv_id", ts_col: str = "ts") -> DataFrame:
    """Heartbeat/uptime accounting (TimescaleDB heartbeat_agg): treat
    each event timestamp as a liveness beat; merge beats closer than
    ``tolerance_secs`` into live intervals (gaps-and-islands), then
    report per series the interval count, total live seconds (sum of
    interval extents), and the covered span.

    A new island starts where ts - prev_ts > tolerance (strict — a gap
    of exactly the tolerance still counts as live). island id = running
    count of starts over a RANGE frame — tied beats (two events at the
    same microsecond) all see the same running sum, so the island
    assignment is deterministic no matter how a sort breaks the tie
    (a ROWS frame here would be order-ambiguous). All times are exact
    integer MICROSECONDS (unix_micros); one partition-by-series window
    pass plus one groupBy."""
    w = Window.partitionBy(by).orderBy("_e")
    beats = tx.select(by, F.unix_micros(F.col(ts_col)).alias("_e"))
    gap = F.col("_e") - F.lag("_e").over(w)
    tol_us = int(tolerance_secs) * 1_000_000
    beats = beats.withColumn(
        "_start", F.when(gap.isNull() | (gap > tol_us), 1)
                   .otherwise(0))
    isl = beats.withColumn(
        "_isl", F.sum("_start").over(
            w.rangeBetween(Window.unboundedPreceding, Window.currentRow)))
    per_isl = (isl.groupBy(by, "_isl")
                  .agg(F.min("_e").alias("_i0"), F.max("_e").alias("_i1")))
    return (per_isl.groupBy(by)
                   .agg(F.count(F.lit(1)).alias("n_intervals"),
                        F.sum(F.col("_i1") - F.col("_i0")).cast("long")
                         .alias("uptime_us"),
                        (F.max("_i1") - F.min("_i0")).cast("long")
                         .alias("span_us")))


def acf(tier: DataFrame, value_col: str = "turn_count", max_lag: int = 5,
        by: str = "conv_id", order_col: str = "window_start") -> DataFrame:
    """Autocorrelation function at lags 1..max_lag per series, the
    standard biased estimator with the FULL-series mean:

        r_l = sum_{t>l} (x_t - m)(x_{t-l} - m) / sum_t (x_t - m)^2

    computed entirely from exact integer moments. Expanding with
    m = Sx/n and clearing denominators by n^2:

        A_l = n^2 * P_l - n * Sx * (H_l + T_l) + m_l * Sx^2
        A_0 = n^2 * Sxx - n * Sx^2
        r_l = A_l / A_0

    where P_l = sum x_t*x_{t-l}, H_l/T_l = the tail/head partial sums
    over pairs, m_l = pair count. Every A is a decimal(38,0) integer
    (order-independent, bit-identical at any parallelism); the single
    division is snapped. Meaningful on the DENSE (gap-filled) tier —
    on a sparse tier the lag is "slots back", not wall time.

    Plan: one window pass materializing max_lag LAG columns, one
    groupBy(series) computing 2 + 4*max_lag moments, then a stack to
    long form — one shuffle total."""
    if max_lag < 1:
        raise ValueError("max_lag must be >= 1")
    w = Window.partitionBy(by).orderBy(order_col)
    x = F.col(value_col).cast("decimal(38,0)")
    src = tier.select(by, F.col(order_col).alias("_t"), x.alias("_x"))
    for lag in range(1, max_lag + 1):
        src = src.withColumn(f"_g{lag}",
                             F.lag("_x", lag).over(
                                 Window.partitionBy(by).orderBy("_t")))
    aggs = [F.count(F.lit(1)).cast("decimal(38,0)").alias("_n"),
            F.sum("_x").alias("_sx"),
            F.sum(F.col("_x") * F.col("_x")).alias("_sxx")]
    for lag in range(1, max_lag + 1):
        g = F.col(f"_g{lag}")
        has = g.isNotNull()
        aggs += [
            F.sum(F.col("_x") * g).alias(f"_p{lag}"),
            F.sum(F.when(has, F.col("_x"))).alias(f"_h{lag}"),
            F.sum(g).alias(f"_t{lag}"),
            F.count(g).cast("decimal(38,0)").alias(f"_m{lag}"),
        ]
    m = src.groupBy(by).agg(*aggs)
    n, sx, sxx = F.col("_n"), F.col("_sx"), F.col("_sxx")
    a0 = (n * n * sxx - n * sx * sx).cast("decimal(38,0)")
    rows = []
    for lag in range(1, max_lag + 1):
        al = (n * n * F.coalesce(F.col(f"_p{lag}"), F.lit(0))
              - n * sx * (F.coalesce(F.col(f"_h{lag}"), F.lit(0))
                          + F.coalesce(F.col(f"_t{lag}"), F.lit(0)))
              + F.col(f"_m{lag}") * sx * sx).cast("decimal(38,0)")
        rows.append(F.struct(
            F.lit(lag).alias("lag"),
            F.when(a0 > 0, _snap6(al.cast("double") / a0.cast("double")))
             .alias("acf")))
    return (m.select(F.col(by), n.cast("long").alias("n_points"),
                     F.explode(F.array(*rows)).alias("_r"))
             .select(by, "n_points", F.col("_r.lag").alias("lag"),
                     F.col("_r.acf").alias("acf")))


def seasonal_decompose(tier: DataFrame, value_col: str = "turn_count",
                       period: int = 24, slot_secs: int = 3600,
                       by: str = "conv_id",
                       order_col: str = "window_start") -> DataFrame:
    """Classical additive decomposition x = trend + seasonal + resid
    over a DENSE (gap-filled) tier with an EVEN period:

    - trend: the 2xMA centered moving average
      (0.5*x_{t-p/2} + x_{t-p/2+1..t+p/2-1} + 0.5*x_{t+p/2}) / p,
      NULL at the series edges (window incomplete);
    - seasonal: per (series, phase) mean of the detrended values,
      phase = (epoch/slot_secs) mod period (uncentered variant — no
      cross-phase re-centering, which keeps every emitted number ONE
      snapped division of exact integers);
    - resid = x - trend - seasonal, with the shared denominator
      (2p * C_p) cleared so the numerator is one exact integer.

    The density requirement is what makes ROW offsets equal TIME
    offsets — run it on ``rollup_gapfilled`` output only.

    Exactness: trend*2p = two complete row-window integer sums
    (decimal); detr2p = 2p*x - trend2p; S_p = sum of detr2p per phase
    (decimal); then trend = snap6(trend2p/2p), seasonal =
    snap6(S_p/(2p*C_p)), resid = snap6((detr2p*C_p - S_p)/(2p*C_p)).
    Plan: two row windows on the series partition + one window on
    (series, phase) — two shuffles, no joins, no UDFs."""
    if period % 2 != 0:
        raise ValueError("period must be even (2xMA centered trend)")
    half = period // 2
    two_p = 2 * period
    wk = Window.partitionBy(by).orderBy(order_col)
    x = F.col(value_col).cast("decimal(38,0)")
    s1w = wk.rowsBetween(-half, half - 1)
    s2w = wk.rowsBetween(-half + 1, half)
    src = tier.select(
        by, order_col, F.col(value_col),
        x.alias("_x"),
        (F.floor(F.unix_timestamp(F.col(order_col)) / slot_secs)
         % period).cast("int").alias("phase"))
    t = (src.withColumn("_s1", F.sum("_x").over(s1w))
            .withColumn("_c1", F.count("_x").over(s1w))
            .withColumn("_s2", F.sum("_x").over(s2w))
            .withColumn("_c2", F.count("_x").over(s2w)))
    full = (F.col("_c1") == period) & (F.col("_c2") == period)
    t = t.withColumn(
        "_tr2p", F.when(full, (F.col("_s1") + F.col("_s2"))
                        .cast("decimal(38,0)")))
    t = t.withColumn("_d2p",
                     (F.lit(two_p) * F.col("_x") - F.col("_tr2p"))
                     .cast("decimal(38,0)"))
    pw = Window.partitionBy(by, "phase")
    t = (t.withColumn("_sp", F.sum("_d2p").over(pw))
          .withColumn("_cp", F.count("_d2p").over(pw)
                             .cast("decimal(38,0)")))
    den_t = F.lit(float(two_p))
    den_s = (F.lit(two_p) * F.col("_cp")).cast("double")
    return t.select(
        by, order_col, value_col, "phase",
        _snap6(F.col("_tr2p").cast("double") / den_t).alias("trend"),
        F.when(F.col("_cp") > 0,
               _snap6(F.col("_sp").cast("double") / den_s))
         .alias("seasonal"),
        F.when(F.col("_d2p").isNotNull() & (F.col("_cp") > 0),
               _snap6((F.col("_d2p") * F.col("_cp") - F.col("_sp"))
                      .cast("decimal(38,0)").cast("double") / den_s))
         .alias("resid"))
