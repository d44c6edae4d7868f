"""Compressed chunk encode/decode — Arrow UDF wrappers over kernel.gorilla.

The reference stores raw .npz (no compression — SURVEY.md §4); the graft
requires Gorilla XOR values + delta-of-delta timestamps (BASELINE.json
north_star, VLDB'20 compressed-TS lineage in PAPERS.md). Chunk row schema
per FIXTURES.md §2.3:

    (conv_id, tier, chunk_start, n_points, ts_codec binary, val_codec binary)

val_codec layout: for each measure in rollup.MEASURES order, a 4-byte
big-endian length followed by the Gorilla stream of that measure as float64
(nulls encoded as NaN — bit-exact round-trip, so decode restores nulls).
gap_filled is packed as a 0/1 float series appended last.

Bounded chunks (default 4096 points ≈ 2.8 days of 1m) keep a mega-conv from
producing one giant row; groups stream through applyInPandas per conv.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from yatsm_spark.kernel import gorilla as g_scalar
from yatsm_spark.kernel import gorilla_vec as g_vec
from yatsm_spark.operators.rollup import MEASURES

# Default: the vectorized block codecs (kernel/gorilla_vec.py) — the
# "vectorized Arrow UDF" hot path. Streams are self-describing: block
# streams start with version byte 0x02; the scalar per-point Gorilla
# format starts with the high byte of a 32-bit count, which is always 0
# for chunk-sized inputs, so decode dispatches on the first byte.


def encode_floats(v):
    return g_vec.encode_floats_block(v)


def encode_timestamps(ts):
    return g_vec.encode_timestamps_block(ts)


def decode_floats(data: bytes):
    if data and data[0] == g_vec.FLOAT_BLOCK_VER:
        return g_vec.decode_floats_block(data)
    return g_scalar.decode_floats(data)


def decode_timestamps(data: bytes):
    if data and data[0] == g_vec.TS_BLOCK_VER:
        return g_vec.decode_timestamps_block(data)
    return g_scalar.decode_timestamps(data)

_SERIES = MEASURES + ["gap_filled"]

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


def _encode_values(pdf: pd.DataFrame) -> bytes:
    parts = []
    for m in _SERIES:
        if m == "gap_filled":
            arr = pdf[m].to_numpy(dtype=np.float64)
        else:
            arr = pdf[m].to_numpy(dtype=np.float64, na_value=np.nan)
        enc = encode_floats(arr)
        parts.append(struct.pack(">I", len(enc)))
        parts.append(enc)
    return b"".join(parts)


def _decode_values(buf: bytes, n: int) -> dict[str, np.ndarray]:
    out = {}
    pos = 0
    for m in _SERIES:
        (ln,) = struct.unpack_from(">I", buf, pos)
        pos += 4
        out[m] = decode_floats(buf[pos : pos + ln])
        pos += ln
        assert len(out[m]) == n
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

    def _densify(pdf: pd.DataFrame) -> pd.DataFrame:
        from yatsm_spark.kernel.gapfill import gapfill_slots

        epochs = pdf["window_start"].to_numpy().astype("datetime64[s]").astype(np.int64)
        vals = {c: pdf[c].to_numpy(dtype=np.int64) for c in count_cols}
        vals.update({c: pdf[c].to_numpy(dtype=np.float64, na_value=np.nan) for c in stat_cols})
        dense = gapfill_slots(epochs, vals, step=step)
        out = pd.DataFrame({
            "conv_id": pdf["conv_id"].iloc[0],
            "window_start": dense["slot_epoch"].astype("datetime64[s]").astype("datetime64[us]"),
            "gap_filled": dense["gap_filled"],
        })
        for c in count_cols:
            out[c] = dense[c]
        for c in stat_cols:
            out[c] = dense[c]
        return out

    def enc(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("window_start", kind="stable")
        if densify and len(pdf):
            pdf = _densify(pdf)
        rows = []
        for lo in range(0, len(pdf), chunk_points):
            c = pdf.iloc[lo : lo + chunk_points]
            ts = c["window_start"].to_numpy().astype("datetime64[s]").astype(np.int64)
            rows.append({
                "conv_id": c["conv_id"].iloc[0],
                "tier": tier,
                "chunk_start": c["window_start"].iloc[0],
                "n_points": len(c),
                "ts_codec": encode_timestamps(ts),
                "val_codec": _encode_values(c),
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
                    v = vals[m]
                    d[m] = pd.array(
                        np.where(np.isnan(v), None, v), dtype="Int64"
                    )
                d["gap_filled"] = vals["gap_filled"] > 0.5
                frames.append(pd.DataFrame(d))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return chunks.mapInPandas(dec, ROLLUP_SCHEMA)
