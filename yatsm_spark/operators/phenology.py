"""A3 (relational form): long-term-mean diurnal statistics per conv.

Parity anchor: `yatsm/phenology/longtermmean.py::LongTermMeanPhenology.fit`
[M] (SURVEY.md §2.4 A3). kernel/phenology.py carries the per-SEGMENT graft
(spline-smoothed profile, appended to the segments table inside the CCDC
grouped-map); THIS module is the per-conv long-term-mean profile expressed
entirely in Catalyst — no smoothing, raw hour-of-day means — so the whole
operator has an exact DuckDB oracle twin (driver query `tx_phenology`).

Exactness discipline (SURVEY.md §7.5.1): per-hour moments (count, Σy, Σy²)
are int64 — exact under any aggregation order — and every double is
derived from them by the same IEEE expression in both engines; the only
order-sensitive float sums are the 24-term correlation moments, rounded
to 6 decimals.

Scale shape: groupBy(conv, hour) with map-side partial agg (24 rows out
per conv regardless of slot count), then a 24-row-per-conv window +
final agg — the profile stage is the only full-data shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def diurnal_profile(filled: DataFrame, measure: str = "turn_count") -> DataFrame:
    """(conv_id, hour, c, s, ss, p): per hour-of-day integral moments and
    the long-term mean rate p = s/c (exact int64 division result)."""
    y = F.col(measure).cast("long")
    return (
        filled.select("conv_id", F.hour("window_start").alias("hour"), y.alias("y"))
        .groupBy("conv_id", "hour")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum("y").alias("s"),
            F.sum(F.col("y") * F.col("y")).alias("ss"),
        )
        .withColumn("p", F.col("s").cast("double") / F.col("c").cast("double"))
    )


def diurnal_stats(filled: DataFrame, measure: str = "turn_count") -> DataFrame:
    """Per-conv phenology summary of the diurnal profile:

    peak_hour   smallest hour attaining the profile maximum
    peak_rate / trough_rate   profile max / min (rounded 6)
    rise_hour / fall_hour     first / last hour at/above half-max
    pheno_cor   Pearson r between slot values and their hour's profile
                mean, from integral moments (rounded 6)
    pheno_nobs  slot count
    """
    prof = diurnal_profile(filled, measure)
    w = Window.partitionBy("conv_id")
    h = (
        prof.withColumn("maxp", F.max("p").over(w))
        .withColumn("minp", F.min("p").over(w))
        .withColumn("half", (F.col("maxp") + F.col("minp")) / F.lit(2.0))
    )
    d = lambda c: F.col(c).cast("double")
    agg = h.groupBy("conv_id").agg(
        F.min(F.when(F.col("p") == F.col("maxp"), F.col("hour"))).alias("peak_hour"),
        F.round(F.max("p"), 6).alias("peak_rate"),
        F.round(F.min("p"), 6).alias("trough_rate"),
        F.min(F.when(F.col("p") >= F.col("half"), F.col("hour"))).alias("rise_hour"),
        F.max(F.when(F.col("p") >= F.col("half"), F.col("hour"))).alias("fall_hour"),
        F.sum("c").alias("n"),
        F.sum("s").alias("sy"),
        F.sum("ss").alias("syy"),
        F.sum(d("c") * F.col("p")).alias("sp"),
        F.sum(d("c") * F.col("p") * F.col("p")).alias("spp"),
        F.sum(F.col("p") * d("s")).alias("syp"),
    )
    n, sy, syy = d("n"), d("sy"), d("syy")
    cov = n * F.col("syp") - sy * F.col("sp")
    vary = n * syy - sy * sy
    varp = n * F.col("spp") - F.col("sp") * F.col("sp")
    cor = F.when((vary > 0) & (varp > 0),
                 F.round(cov / F.sqrt(vary * varp), 6)).otherwise(F.lit(0.0))
    return agg.select(
        "conv_id", "peak_hour", "peak_rate", "trough_rate",
        "rise_hour", "fall_hour", cor.alias("pheno_cor"),
        F.col("n").alias("pheno_nobs"),
    )
