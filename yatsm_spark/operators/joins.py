"""Join operators: as-of (J3), interval/range (J1/J2), changemap (W7/J5).

Parity anchors (SURVEY.md §2.3, §2.5):
- J3 as-of: yatsm/cli/map.py::find_result_attributes — scatter the segment
  record active at a query date [M]. Spark: filter start<=d + ROW_NUMBER
  pick-latest (no join at all — a window over the records table).
- J1 interval join: postprocess.refit_record obs-in-segment slices [M].
  Spark: range-predicate join; Catalyst plans a broadcast-range or SMJ and
  AQE fixes skew.
- J2 labels join: cli/train.py::get_training_inputs [M]. Spark: broadcast
  hash join (dimension side is tiny by construction).
- W7 changemap first/last/num: cli/changemap.py [M]. Window functions.
- J5 consecutive-segment pairing: LEAD over the per-key segment order —
  a window, not a self-join (SURVEY.md J5 row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_latest(records: DataFrame, key: str, order_col: str, at,
                tie_break: list[str] | None = None) -> DataFrame:
    """The record per key with the greatest order_col <= at (as-of pick).

    tie_break: extra columns sorted DESC after order_col to make the pick
    deterministic when rows tie on order_col (e.g. ["turn_idx"]). Without
    it, ties are broken by whatever order the shuffle produced — fine only
    when order_col is unique per key."""
    order = [F.col(order_col).desc()] + [F.col(c).desc() for c in (tie_break or [])]
    w = Window.partitionBy(key).orderBy(*order)
    return (
        records.filter(F.col(order_col) <= F.lit(at))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    fact_key: str,
    int_key: str,
    fact_ts: str,
    int_start: str,
    int_end: str,
    how: str = "inner",
) -> DataFrame:
    """obs.ts BETWEEN interval.start AND interval.end, equi on key.
    The equi key keeps this a hash/SMJ join with a residual range filter —
    never a cartesian product."""
    cond = (
        (facts[fact_key] == intervals[int_key])
        & (facts[fact_ts] >= intervals[int_start])
        & (facts[fact_ts] <= intervals[int_end])
    )
    return facts.join(intervals, cond, how)


def broadcast_dim_join(fact: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """J2: explicit broadcast of the dimension side (labels/ROI analogue)."""
    return fact.join(F.broadcast(dim), on, how)


def changemap(records: DataFrame, key: str, order_col: str) -> DataFrame:
    """W7: first/last/num summary per key over an ordered record set —
    the graft of `yatsm changemap first|last|num`."""
    return records.groupBy(key).agg(
        F.min(order_col).alias("first_change"),
        F.max(order_col).alias("last_change"),
        F.count(F.lit(1)).alias("num_changes"),
    )


def pair_consecutive(records: DataFrame, key: str, order_col: str, cols: list[str]) -> DataFrame:
    """J5: each record joined to its successor via LEAD (break of seg_i ↔
    start of seg_{i+1}). One shuffle on key; no self-join."""
    w = Window.partitionBy(key).orderBy(order_col)
    out = records
    for c in cols:
        out = out.withColumn(f"next_{c}", F.lead(c).over(w))
    return out
