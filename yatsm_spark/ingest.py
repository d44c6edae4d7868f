"""Transcript ingest: source read, text-equality fingerprint, measures.

Parity anchors:
- S1 image-list scan yatsm/utils.py::csvfile_to_dataframe [H] → table read
  with per-conv ordering (ORDER BY inside groups, never a global sort —
  SURVEY.md §2.6 O1).
- The text-equality invariant (BASELINE.json::input_hint): per-turn text
  equality under stable (conv_id, turn_idx) ordering, verified with a
  distributed order-respecting fingerprint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: Measures derived per turn (the graft's "bands", SURVEY.md §0.2 table).
def with_measures(transcripts: DataFrame) -> DataFrame:
    """Project per-turn measures. Pure Catalyst expressions — stays inside
    WholeStageCodegen; column pruning keeps `text` out of downstream
    shuffles (only token_len survives)."""
    return transcripts.select(
        "conv_id",
        "turn_idx",
        "ts",
        F.length("text").cast("long").alias("token_len"),
        F.col("tool").isNotNull().cast("int").alias("is_tool_call"),
        "role",
    )


def text_fingerprint(transcripts: DataFrame) -> str:
    """Order-stable fingerprint of all turn text.

    Global concat is impossible at 10^12 turns; instead:
      conv_hash = sha256(concat_ws of sha256(text) ordered by turn_idx)
      fingerprint = sha256(concat of conv_hash ordered by conv_id)
    Layer 1 is distributed (one group per conv — sort_array over collected
    (turn_idx, hash) structs gives deterministic intra-conv order without a
    global sort). Layer 2 reduces one short row per conv.
    The same construction is reproduced by the duckdb/pandas twin in
    tests/test_rollup_spark.py, so source-vs-ingested equality is checkable on
    both sides.
    """
    per_conv = (
        transcripts
        .select("conv_id", F.struct("turn_idx", F.sha2("text", 256).alias("h")).alias("th"))
        .groupBy("conv_id")
        .agg(
            F.sha2(
                F.concat_ws("", F.transform(F.array_sort(F.collect_list("th")), lambda s: s["h"])),
                256,
            ).alias("conv_hash")
        )
    )
    # Tree step: 4096 buckets keyed by conv_id keep every collect_list group
    # bounded (~n_convs/4096 rows) — at 10^12-turn scale the conv list itself
    # is too large for a single reduce group.
    per_bucket = (
        per_conv
        .groupBy(F.pmod(F.xxhash64("conv_id"), F.lit(4096)).alias("bucket"))
        .agg(
            F.sha2(
                F.concat_ws("", F.transform(
                    F.array_sort(F.collect_list(F.struct("conv_id", "conv_hash"))),
                    lambda s: s["conv_hash"],
                )),
                256,
            ).alias("bucket_hash")
        )
    )
    rows = (
        per_bucket.agg(
            F.sha2(
                F.concat_ws("", F.transform(
                    F.array_sort(F.collect_list(F.struct("bucket", "bucket_hash"))),
                    lambda s: s["bucket_hash"],
                )),
                256,
            ).alias("fp")
        ).collect()
    )
    return rows[0]["fp"]
