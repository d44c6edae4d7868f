"""Compressed chunk encode/decode — Arrow UDF wrappers over kernel.gorilla.

The reference stores raw .npz (no compression — SURVEY.md §4); the graft
requires Gorilla XOR values + delta-of-delta timestamps (BASELINE.json
north_star, VLDB'20 compressed-TS lineage in PAPERS.md). Chunk row schema
per FIXTURES.md §2.3:

    (conv_id, tier, chunk_start, n_points, ts_codec binary, val_codec binary)

val_codec layout: for each measure in rollup.MEASURES order, a 4-byte
big-endian length followed by that measure's self-describing stream:
integer/boolean series use the nullable-int64 block codec (exact over the
FULL int64 range — the float path is exact only below 2^53, round-1
ADVICE), float series use the Gorilla XOR stream (nulls as NaN).
gap_filled is packed as a 0/1 int series appended last.

Bounded chunks (default 4096 points ≈ 2.8 days of 1m) keep a mega-conv from
producing one giant row; groups stream through applyInPandas per conv.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from yatsm_spark.kernel import gorilla as g_scalar
from yatsm_spark.kernel import gorilla_vec as g_vec
from yatsm_spark.operators.rollup import MEASURES

# Default: the vectorized block codecs (kernel/gorilla_vec.py) — the
# "vectorized Arrow UDF" hot path. Streams are self-describing: block
# streams start with a version byte in 0xF2..0xF4; the scalar per-point
# Gorilla format starts with the high byte of a 32-bit count, which its
# encoder asserts < 0xF0, so first-byte dispatch cannot misfire.


def encode_floats(v):
    return g_vec.encode_floats_block(v)


def encode_timestamps(ts):
    return g_vec.encode_timestamps_block(ts)


def encode_ints(v, null_mask=None):
    return g_vec.encode_ints_block(v, null_mask)


def decode_floats(data: bytes):
    if data and data[0] in (g_vec.FLOAT_BLOCK_VER, g_vec.LEGACY_BLOCK_VER):
        return g_vec.decode_floats_block(data)
    return g_scalar.decode_floats(data)


def decode_timestamps(data: bytes):
    if data and data[0] in (g_vec.TS_BLOCK_VER, g_vec.LEGACY_BLOCK_VER):
        return g_vec.decode_timestamps_block(data)
    return g_scalar.decode_timestamps(data)


def decode_series(data: bytes):
    """-> (values ndarray, null_mask ndarray) for any value stream."""
    if data and data[0] == g_vec.INT_BLOCK_VER:
        return g_vec.decode_ints_block(data)
    v = decode_floats(data)
    return v, np.isnan(v)

_SERIES = MEASURES + ["gap_filled"]

#: Bumped whenever the persisted chunk byte layout changes; folded into the
#: pipeline's per-bucket checkpoint fingerprint so a resumed workdir written
#: by a different format re-encodes instead of mixing stream versions
#: (round-2 ADVICE — legacy 0x02 streams also still decode, see gorilla_vec).
CHUNK_FORMAT_VERSION = 3

CHUNK_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("tier", T.StringType(), False),
    T.StructField("chunk_start", T.TimestampType(), False),
    T.StructField("n_points", T.IntegerType(), False),
    T.StructField("ts_codec", T.BinaryType(), False),
    T.StructField("val_codec", T.BinaryType(), False),
])

ROLLUP_SCHEMA = T.StructType(
    [T.StructField("conv_id", T.StringType(), False),
     T.StructField("window_start", T.TimestampType(), False)]
    + [T.StructField(m, T.LongType(), True) for m in MEASURES]
    + [T.StructField("gap_filled", T.BooleanType(), False)]
)


def _decode_values(buf: bytes, n: int) -> dict[str, tuple[np.ndarray, np.ndarray]]:
    out = {}
    pos = 0
    for m in _SERIES:
        (ln,) = struct.unpack_from(">I", buf, pos)
        pos += 4
        out[m] = decode_series(buf[pos : pos + ln])
        pos += ln
        assert len(out[m][0]) == n
    return out


def encode_chunks(rollup: DataFrame, tier: str, chunk_points: int = 4096,
                  densify: bool = False) -> DataFrame:
    """Rollup tier -> compressed chunk rows (one shuffle on conv_id).

    densify=True accepts the SPARSE tier and reindexes each conv onto the
    dense slot grid in the kernel (counts 0, stats null, gap_filled true)
    before encoding — gap slots then cost ~1 bit each in the codec instead
    of a shuffled row each. Output chunks are identical to encoding the
    gap-filled tier (tested)."""
    from yatsm_spark.operators.rollup import TIERS

    step = TIERS[tier]
    count_cols = [m for m in MEASURES if m.endswith("_count")]
    stat_cols = [m for m in MEASURES if not m.endswith("_count")]

    # Null stat slots are split into (coalesced long, notnull flag) BEFORE
    # the Arrow boundary: Arrow->pandas turns a long column CONTAINING nulls
    # into float64, which rounds values above 2^53 before the kernel ever
    # sees them (round-2 ADVICE). With no nulls present the transfer stays
    # int64 end to end; a non-integer measure now fails loudly at the cast
    # in Catalyst instead of being truncated silently.
    sel = [F.col("conv_id"), F.col("window_start"), F.col("gap_filled")]
    for m in count_cols:
        sel.append(F.coalesce(F.col(m), F.lit(0)).cast("long").alias(m))
    for m in stat_cols:
        sel.append(F.coalesce(F.col(m), F.lit(0)).cast("long").alias(m))
        sel.append(F.col(m).isNotNull().alias(f"_nn_{m}"))
    # NO extra-wide repartition here (r6, measured): unlike the CCDC stage,
    # the encode kernel is cheap (~0.7us/pt) and the grouped-map boundary's
    # per-partition fixed costs dominate — 32/64/128-partition A/B from the
    # cached tier read 14.5 / 15.7 / 17.0s, so the session shuffle width
    # (data-sized, AQE-coalesced) is kept. The wide setting stays where the
    # kernel is compute-heavy and group skew is the binding constraint
    # (changescore.py).
    rollup = rollup.select(*sel)

    def enc(pdf: pd.DataFrame) -> pd.DataFrame:
        """Whole-conv numpy encode: every series is converted to
        (int64 values, null mask) ONCE per conv — int64-exact end to end,
        no float round-trip — then the chunk loop slices numpy arrays.
        (Per-chunk pandas ops were ~2x the actual codec cost.)"""
        n = len(pdf)
        if n == 0:
            return pd.DataFrame(columns=[f.name for f in CHUNK_SCHEMA.fields])
        epochs = pdf["window_start"].to_numpy().astype("datetime64[s]").astype(np.int64)
        order = np.argsort(epochs, kind="stable")
        epochs = epochs[order]
        vals: dict[str, np.ndarray] = {}
        nulls: dict[str, np.ndarray | None] = {}
        for c in count_cols:
            vals[c] = pdf[c].to_numpy(dtype=np.int64)[order]
            nulls[c] = None
        for c in stat_cols:
            vals[c] = pdf[c].to_numpy(dtype=np.int64)[order]
            nulls[c] = (~pdf[f"_nn_{c}"].to_numpy(dtype=bool))[order]
        gap = pdf["gap_filled"].to_numpy(dtype=np.int64)[order]
        if densify:
            from yatsm_spark.kernel.gapfill import gapfill_slots

            grid_in = {c: vals[c] for c in count_cols}
            # stats travel as int64 + a notnull flag column: gap slots get
            # notnull=0 (int fill is 0), i.e. null — no float64 detour, so
            # values above 2^53 stay exact through densification too.
            for c in stat_cols:
                grid_in[c] = vals[c]
                grid_in[f"_nn_{c}"] = (~nulls[c]).astype(np.int64)
            dense = gapfill_slots(epochs, grid_in, step=step)
            epochs = dense["slot_epoch"]
            gap = dense["gap_filled"].astype(np.int64)
            for c in count_cols:
                vals[c] = dense[c]
                nulls[c] = None
            for c in stat_cols:
                vals[c] = dense[c]
                nulls[c] = dense[f"_nn_{c}"] == 0
        conv_id = pdf["conv_id"].iloc[0]
        rows = []
        for lo in range(0, len(epochs), chunk_points):
            hi = min(lo + chunk_points, len(epochs))
            parts = []
            for m in _SERIES:
                if m == "gap_filled":
                    stream = encode_ints(gap[lo:hi], None)
                else:
                    nm = nulls[m]
                    stream = encode_ints(vals[m][lo:hi],
                                         None if nm is None else nm[lo:hi])
                parts.append(struct.pack(">I", len(stream)))
                parts.append(stream)
            rows.append({
                "conv_id": conv_id,
                "tier": tier,
                "chunk_start": pd.Timestamp(int(epochs[lo]), unit="s"),
                "n_points": hi - lo,
                "ts_codec": encode_timestamps(epochs[lo:hi]),
                "val_codec": b"".join(parts),
            })
        return pd.DataFrame(rows)

    return rollup.groupBy("conv_id").applyInPandas(enc, CHUNK_SCHEMA)


def decode_chunks(chunks: DataFrame) -> DataFrame:
    """Compressed chunks -> rollup rows (decode-path reader for parity
    checks and tier-serving). mapInPandas: no shuffle at all."""

    def dec(batches):
        for pdf in batches:
            frames = []
            for _, r in pdf.iterrows():
                n = int(r["n_points"])
                ts = decode_timestamps(bytes(r["ts_codec"]))
                vals = _decode_values(bytes(r["val_codec"]), n)
                d = {"conv_id": r["conv_id"],
                     "window_start": ts.astype("datetime64[s]").astype("datetime64[us]")}
                for m in MEASURES:
                    v, null = vals[m]
                    # int streams carry 0 at null slots; float streams carry
                    # NaN — zero them before the int cast either way.
                    arr = pd.array(np.where(null, 0, v).astype(np.int64), dtype="Int64")
                    arr[null] = None
                    d[m] = arr
                gv, _ = vals["gap_filled"]
                d["gap_filled"] = gv > 0
                frames.append(pd.DataFrame(d))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return chunks.mapInPandas(dec, ROLLUP_SCHEMA)


def compact_chunks(chunks: DataFrame, chunk_points: int = 4096) -> DataFrame:
    """Chunk-table compaction (the TimescaleDB ``compress_chunk``
    maintenance analog): per (conv, tier), decode every chunk, stitch the
    point streams back together in chunk_start order, and re-encode at
    the target ``chunk_points`` — many small chunks (written by frequent
    incremental eviction runs) become few large ones, shrinking both the
    chunk-row count the serve path scans and the per-chunk codec framing
    overhead.

    Invariant (tested): ``decode_chunks(compact_chunks(x))`` is
    bit-identical to ``decode_chunks(x)`` — same slots, same values, same
    null mask, same gap flags — because the codec round-trip is exact and
    compaction only re-frames chunk boundaries. One groupBy shuffle on
    (conv_id, tier); per-group memory is the conv's decoded history,
    which the retention driver already bounds (chunks only cover the
    evicted window, rollup.py TTL contract)."""

    def compact(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(columns=[f.name for f in CHUNK_SCHEMA.fields])
        pdf = pdf.sort_values("chunk_start", kind="mergesort")
        epochs_parts, val_parts, null_parts, gap_parts = [], [], [], []
        for _, r in pdf.iterrows():
            n = int(r["n_points"])
            epochs_parts.append(decode_timestamps(bytes(r["ts_codec"])))
            vals = _decode_values(bytes(r["val_codec"]), n)
            val_parts.append(vals)
        epochs = np.concatenate(epochs_parts)
        conv_id = pdf["conv_id"].iloc[0]
        tier = pdf["tier"].iloc[0]
        merged = {
            m: (np.concatenate([vp[m][0] for vp in val_parts]),
                np.concatenate([vp[m][1] for vp in val_parts]))
            for m in _SERIES
        }

        rows = []
        for lo in range(0, len(epochs), chunk_points):
            hi = min(lo + chunk_points, len(epochs))
            parts = []
            for m in _SERIES:
                v, nm = merged[m]
                body = np.where(nm, 0, v).astype(np.int64)[lo:hi]
                if m == "gap_filled" or m.endswith("_count"):
                    stream = encode_ints(body, None)
                else:
                    stream = encode_ints(body, nm[lo:hi])
                parts.append(struct.pack(">I", len(stream)))
                parts.append(stream)
            rows.append({
                "conv_id": conv_id,
                "tier": tier,
                "chunk_start": pd.Timestamp(int(epochs[lo]), unit="s"),
                "n_points": hi - lo,
                "ts_codec": encode_timestamps(epochs[lo:hi]),
                "val_codec": b"".join(parts),
            })
        return pd.DataFrame(rows)

    return chunks.groupBy("conv_id", "tier").applyInPandas(
        compact, CHUNK_SCHEMA)
