"""DTW re-ranking of series-pair candidates (kernel/dtw.py through a
distributed pairs-join): the exact elastic-distance stage behind cheap
candidate generators like the SAX-word buckets (tx_sax_neardups) —
the bucket-then-exact pipeline shape the embedding near-dup path uses
(LSH buckets -> exact cosine), applied to time series.

Scale shape: the per-series array table is ONE groupBy over the tier
(order-safe array_sort(collect_list(struct))), each array bounded by
``max_n`` (longer series raise — downsample first); the pairs frame is
joined against it twice (broadcast when small, hash otherwise) and the
integer DP runs per pair in one Arrow batch pass (mapInPandas). No
floats anywhere — the distance is bit-identical at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def series_arrays(tier: DataFrame, value_col: str = "turn_count",
                  by: str = "conv_id",
                  order_col: str = "window_start") -> DataFrame:
    """(key, series array ordered by slot) — struct-sort, so the order
    is deterministic without a global sort."""
    arr = F.transform(
        F.array_sort(F.collect_list(F.struct(order_col, value_col))),
        lambda s: s[value_col])
    return tier.groupBy(by).agg(arr.alias("series"))


def dtw_rerank(tier: DataFrame, pairs: DataFrame,
               value_col: str = "turn_count", radius: int | None = None,
               by: str = "conv_id", order_col: str = "window_start",
               max_n: int = 2048,
               a_col: str = "conv_a", b_col: str = "conv_b") -> DataFrame:
    """Exact (banded) DTW distance for every candidate pair: returns
    (conv_a, conv_b, len_a, len_b, dtw)."""
    from yatsm_spark.kernel.dtw import dtw_core

    arrs = series_arrays(tier, value_col, by, order_col)
    j = (pairs.select(a_col, b_col)
         .join(arrs.select(F.col(by).alias(a_col),
                           F.col("series").alias("_sa")), a_col)
         .join(arrs.select(F.col(by).alias(b_col),
                           F.col("series").alias("_sb")), b_col)
         .select(a_col, b_col, "_sa", "_sb"))

    def compute(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for ca, cb, sa, sb in zip(pdf[a_col], pdf[b_col],
                                      pdf["_sa"], pdf["_sb"]):
                if len(sa) > max_n or len(sb) > max_n:
                    raise ValueError(
                        f"dtw_rerank: series of {max(len(sa), len(sb))} "
                        f"rows exceeds max_n={max_n}; downsample "
                        "(lttb/m4/cascade) first")
                d = dtw_core([int(v) for v in sa],
                             [int(v) for v in sb], radius)
                rows.append((ca, cb, len(sa), len(sb), d))
            yield pd.DataFrame(rows, columns=[a_col, b_col, "len_a",
                                              "len_b", "dtw"])

    ptypes = dict(pairs.dtypes)
    schema = (f"{a_col} {ptypes[a_col]}, {b_col} {ptypes[b_col]}, "
              "len_a long, len_b long, dtw long")
    return j.mapInPandas(compute, schema)
