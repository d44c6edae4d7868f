"""Time-series toolkit over rollup tiers: gap-fill value policies (LOCF,
linear interpolation), reset-aware counter increase, and time-weighted
averages — the TimescaleDB `locf()/interpolate()/time_weight()` and
PromQL `increase()` surface, re-expressed as Catalyst window/agg plans.

All four are pure JVM window functions — no Python, no extra exchange
beyond the per-conv window shuffle (and consumers downstream of
``gapfill`` reuse that partitioning: same subset rule as sessionize).

Cross-engine float discipline (SURVEY.md §7.5.1): every input is an
exact integer (counts, unix seconds); the single double division in
interpolation / TWA is computed from integer-exact operands through an
identical expression tree in the DuckDB oracle and snapped to the 1e-6
grid on both sides.

yatsm anchor: gap handling in yatsm is implicit (ordinal dates with
missing observations simply absent); an engine serving dashboards needs
explicit fill policies — the gap rows carry ``gap_filled = true`` so
every policy here is a deterministic function of the dense tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _snap6(col):
    # values here are non-negative; floor(x*1e6 + 0.5) is round-half-up
    return F.floor(col * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def locf(filled: DataFrame, value_cols: list[str], by: str = "conv_id",
         order_col: str = "window_start") -> DataFrame:
    """Last-observation-carried-forward over NULL-on-gap measure columns
    of a gap-filled tier. Types are preserved (long stays long — no
    arithmetic happens). Gap-fill spans start at a real slot, so every
    gap row has a predecessor and the result has no remaining nulls.
    """
    w = (Window.partitionBy(by).orderBy(order_col)
               .rowsBetween(Window.unboundedPreceding, 0))
    out = filled
    for c in value_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def interp_linear(filled: DataFrame, value_cols: list[str],
                  by: str = "conv_id",
                  order_col: str = "window_start") -> DataFrame:
    """Linear interpolation across gap runs: each NULL-on-gap value
    becomes prev + (next - prev) * elapsed-fraction, where prev/next are
    the nearest REAL observations (gap-fill guarantees both exist —
    span endpoints are real slots by construction).

    The columns become double: exact integer-valued on real rows,
    1e-6-snapped interpolations on gap rows. Two window frames
    (preceding / following) over the same partitioning — one shuffle.
    """
    secs = F.unix_timestamp(F.col(order_col))
    wp = (Window.partitionBy(by).orderBy(order_col)
                .rowsBetween(Window.unboundedPreceding, 0))
    wn = (Window.partitionBy(by).orderBy(order_col)
                .rowsBetween(0, Window.unboundedFollowing))
    out = filled
    for c in value_cols:
        v = F.col(c)
        at = F.when(v.isNotNull(), secs)
        pv = F.last(v, ignorenulls=True).over(wp).cast("double")
        ps = F.last(at, ignorenulls=True).over(wp)
        nv = F.first(v, ignorenulls=True).over(wn).cast("double")
        ns = F.first(at, ignorenulls=True).over(wn)
        frac = (secs - ps).cast("double") / (ns - ps).cast("double")
        interp = _snap6(pv + (nv - pv) * frac)
        out = out.withColumn(
            c, F.when(v.isNotNull(), v.cast("double")).otherwise(interp))
    return out


def counter_increase(df: DataFrame, counter_col: str,
                     by: str = "conv_id",
                     order_col: str = "window_start") -> DataFrame:
    """PromQL-style reset-aware per-row increase of a monotonic counter:
    value - prev when the counter advanced, value itself after a reset
    (the counter restarted from 0 and climbed to `value`), 0 on the
    first observation. Pure integer math.
    """
    w = Window.partitionBy(by).orderBy(order_col)
    v = F.col(counter_col)
    prev = F.lag(v).over(w)
    inc = (F.when(prev.isNull(), F.lit(0))
            .when(v >= prev, v - prev)
            .otherwise(v))
    return df.withColumn("increase", inc.cast("long"))


def total_increase(df: DataFrame, counter_col: str, by: str = "conv_id",
                   order_col: str = "window_start") -> DataFrame:
    """(by, total_increase, n_points): the PromQL increase() aggregate —
    sum of reset-aware deltas per series. Integer-exact end to end."""
    return (counter_increase(df, counter_col, by, order_col)
            .groupBy(by)
            .agg(F.sum("increase").alias("total_increase"),
                 F.count(F.lit(1)).alias("n_points")))


def ewma(df: DataFrame, value_col: str, alpha: float = 0.25,
         by: str = "conv_id", order_col: str = "window_start") -> DataFrame:
    """Exponentially-weighted moving average per series:
    s_0 = x_0, s_i = alpha*x_i + (1-alpha)*s_{i-1} (the adjust=False /
    online-monitoring recurrence). One applyInPandas pass per series.

    Cross-engine bit-exactness without snapping: pick an ``alpha`` whose
    value AND complement are exact binary fractions (0.25/0.75, 0.5/0.5,
    0.125/0.875 ...) — then both engines multiply by identical doubles
    in identical order and the accumulated stream agrees to the last
    bit (the DuckDB oracle replays the recurrence with a recursive CTE).
    The default 0.25 satisfies this; other alphas work but drift by
    ulps between engines and would need grid-snapping.
    """
    import numpy as np

    beta = 1.0 - alpha
    src = df.select(by, order_col, value_col)

    def fit(pdf):
        pdf = (pdf.sort_values(order_col, kind="mergesort")
                  .reset_index(drop=True))
        x = pdf[value_col].to_numpy(dtype=np.float64)
        s = np.empty(len(x), dtype=np.float64)
        if len(x):
            s[0] = x[0]
            for i in range(1, len(x)):
                s[i] = alpha * x[i] + beta * s[i - 1]
        pdf = pdf.copy()
        pdf["ewma"] = s
        return pdf

    schema = (f"{by} {dict(src.dtypes)[by]}, "
              f"{order_col} {dict(src.dtypes)[order_col]}, "
              f"{value_col} {dict(src.dtypes)[value_col]}, ewma double")
    return src.groupBy(by).applyInPandas(fit, schema)


def time_weighted_avg(df: DataFrame, value_col: str, by: str = "conv_id",
                      order_col: str = "window_start") -> DataFrame:
    """(by, twa, span_secs): LOCF-weighted time average over an
    irregular (sparse) tier — each observation holds until the next
    one; the last observation of a series carries no weight (its
    holding interval is unknown), the TimescaleDB ``time_weight
    ('locf')`` convention. Series with a single point yield NULL.

    Numerator/denominator accumulate as decimal(38,0) (exact,
    order-independent — same discipline as the PCA moments); the one
    double division is snapped to the 1e-6 grid.
    """
    w = Window.partitionBy(by).orderBy(order_col)
    secs = F.unix_timestamp(F.col(order_col))
    dur = (F.lead(secs).over(w) - secs)  # null on the last row
    weighted = (F.col(value_col) * dur).cast("decimal(38,0)")
    return (df.withColumn("_dur", dur)
              .withColumn("_wv", weighted)
              .groupBy(by)
              .agg(_snap6(F.sum("_wv").cast("double")
                          / F.sum(F.col("_dur").cast("decimal(38,0)"))
                              .cast("double")).alias("twa"),
                   F.sum("_dur").cast("long").alias("span_secs")))
