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


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str, right_ts: str, value_cols: list[str],
              direction: str = "backward",
              tolerance_secs: int | None = None) -> DataFrame:
    """General as-of join (the pandas ``merge_asof`` / DuckDB ``ASOF
    JOIN`` semantics): for every left row, attach the right row with the
    greatest ``right_ts <= left_ts`` (backward) or the smallest
    ``right_ts >= left_ts`` (forward); ``nearest`` takes whichever is
    closer (ties -> backward). Exact timestamp matches count in both
    directions. ``tolerance_secs`` nulls out matches farther than the
    bound (the row itself is kept — LEFT join semantics throughout).

    Scale shape: NO join at all — both inputs are tagged and unioned,
    then ONE window pass per direction over (key, ts) ordering picks the
    last/first right payload (the classic union-stream formulation, the
    same one-shuffle shape as gaps-and-islands). At 100 TB this is one
    hash exchange of (key, ts, pruned payload) — no build side, no skew
    amplification beyond the key distribution itself, and AQE handles a
    hot key the same way it does for the rollup shuffles.

    Output: every left column, plus ``matched_ts`` and the requested
    right ``value_cols``. Right rows must be unique per (key, right_ts)
    for a deterministic pick — pre-aggregate duplicates first (the same
    contract DuckDB's ASOF JOIN has).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, "
                         f"got {direction!r}")
    # The union-stream pass stages internal columns on the left schema and
    # appends matched_ts + value_cols to it; a collision would silently
    # produce wrong or duplicate columns, so refuse up front.
    reserved = {"_t", "_is_left", "_rp", "_m", "_mb", "_mf", "matched_ts"}
    clash = (reserved | set(value_cols)) & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join: left columns {sorted(clash)} collide with "
            "internal/output names; rename them (value_cols and "
            f"{sorted(reserved)} must not appear in left)")
    payload = F.struct(F.col(right_ts).alias("_rts"),
                       *[F.col(c) for c in value_cols])
    l_tag = (left.withColumn("_t", F.col(left_ts))
                 .withColumn("_is_left", F.lit(1))
                 .withColumn("_rp", F.lit(None).cast(
                     right.select(payload.alias("_rp")).schema["_rp"].dataType)))
    r_tag = (right.select(F.col(key), F.col(right_ts).alias("_t"),
                          F.lit(0).alias("_is_left"),
                          payload.alias("_rp")))
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)

    out_cols = [F.col(c) for c in left.columns]

    def pick(matched):
        # microsecond-exact distance: unix_micros, never unix_timestamp
        # (which truncates to seconds and breaks sub-second ordering)
        m = matched
        if tolerance_secs is not None:
            dt = F.abs(F.unix_micros(F.col(left_ts))
                       - F.unix_micros(m["_rts"]))
            m = F.when(dt <= F.lit(int(tolerance_secs) * 1_000_000), m)
        return m

    # backward: right rows sort BEFORE a left row with the same ts
    # (tag 0 < 1), so an exact match is inside the preceding frame.
    # Order on the native timestamp — full microsecond precision.
    wb = (Window.partitionBy(key).orderBy(F.col("_t"), F.col("_is_left"))
                .rowsBetween(Window.unboundedPreceding, 0))
    # forward: right rows sort AFTER the left row at the same ts
    # (rank 2 > 1), so an exact match is inside the following frame.
    fwd_rank = F.when(F.col("_is_left") == 0, F.lit(2)).otherwise(F.lit(1))
    wf = (Window.partitionBy(key).orderBy(F.col("_t"), fwd_rank)
                .rowsBetween(0, Window.unboundedFollowing))

    if direction == "backward":
        u = u.withColumn("_m", F.last("_rp", ignorenulls=True).over(wb))
        m = pick(F.col("_m"))
    elif direction == "forward":
        u = u.withColumn("_m", F.first("_rp", ignorenulls=True).over(wf))
        m = pick(F.col("_m"))
    else:  # nearest
        u = (u.withColumn("_mb", F.last("_rp", ignorenulls=True).over(wb))
              .withColumn("_mf", F.first("_rp", ignorenulls=True).over(wf)))
        mb, mf = pick(F.col("_mb")), pick(F.col("_mf"))
        lus = F.unix_micros(F.col(left_ts))
        db = lus - F.unix_micros(mb["_rts"])
        df_ = F.unix_micros(mf["_rts"]) - lus
        m = (F.when(mb.isNull(), mf)
              .when(mf.isNull(), mb)
              .when(df_ < db, mf)          # strict: ties go backward
              .otherwise(mb))
    return (u.filter(F.col("_is_left") == 1)
             .select(*out_cols, m["_rts"].alias("matched_ts"),
                     *[m[c].alias(c) for c in value_cols]))


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
