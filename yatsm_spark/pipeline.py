"""End-to-end batch pipeline: ingest → rollup tiers → segments → chunks.

Parity anchor: ``yatsm line CONFIG JOB_NUMBER TOTAL_JOBS`` (SURVEY.md §3.1)
— the reference's batch engine distributes image ROWS across independent
jobs with file-existence resume. The graft distributes CONV BUCKETS
(bucket = pmod(xxhash64(conv_id), B)) across sequential Spark jobs, each
internally parallel across the cluster, each committing an atomic bucket
partition + checkpoint manifest. Kill the process after k buckets and rerun:
completed buckets are skipped and the final tables are bit-identical to an
uninterrupted run (tests/test_pipeline.py; BASELINE.md resumability row).

Why a bucket loop at all (vs one giant job): it bounds the blast radius of
failure at 10^12 turns, gives natural per-partition lineage/metrics, and
mirrors the reference's operational model. B is small (16 locally,
hundreds on a cluster); each bucket job still fans out to every executor.

Stage graph per bucket (all conv-local, so everything after staging
shuffles only within the bucket):

    staging(bucket) → 1m rollup → gapfill → 1h → 1d
                                    ↘ segments (applyInPandas kernel)
                                    ↘ chunks 1m/1h/1d (Gorilla)
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from yatsm_spark.checkpoint import CheckpointManager
from yatsm_spark.ingest import with_measures
from yatsm_spark.operators import rollup as R
from yatsm_spark.operators.cascade import cascade
from yatsm_spark.operators.changescore import change_scores, CONV_PARAMS
from yatsm_spark.operators.codec import encode_chunks
from yatsm_spark.sources.storage import ParquetStorage, with_bucket


@dataclass
class PipelineConfig:
    workdir: str
    n_buckets: int = 16
    tiers: tuple[str, ...] = ("1m", "1h", "1d")
    compress: bool = True
    segments: bool = True
    phenology: bool = False   # A3: append diurnal fields to segments
    chunk_points: int = 4096
    #: rollup skew strategy: "none" (single-phase hash agg; map-side
    #: partials already absorb ordinary zipf skew), "always" (two-phase
    #: salt on every key), "adaptive" (sample-detected hot keys salted,
    #: cold keys single-phase — see BENCH/SKEW.md). Values are
    #: bit-identical across all three (tested).
    salting: str = "none"


@dataclass
class PipelineMetrics:
    staged_turns: int = 0
    buckets: list = field(default_factory=list)
    wall_s: float = 0.0


def _input_fingerprint(df: DataFrame) -> str:
    """Cheap order-insensitive input fingerprint per bucket: count + sums of
    stable hashes — the graft's analogue of the cache image-ID check
    (yatsm/cache.py::update_cache_file [H])."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(conv_id, turn_idx))").alias("h1"),
        F.expr("bit_xor(xxhash64(conv_id, turn_idx, ts))").alias("h2"),
    ).collect()[0]
    return f"{row['n']}:{row['h1']}:{row['h2']}"


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    cfg: PipelineConfig,
    resume: bool = True,
    fail_after_bucket: int | None = None,
) -> PipelineMetrics:
    """Run (or resume) the full pipeline. fail_after_bucket injects a crash
    for resumability tests."""
    t0 = time.time()
    store = ParquetStorage(cfg.workdir, cfg.n_buckets)
    ckpt = CheckpointManager(cfg.workdir)
    metrics = PipelineMetrics()
    # The bucket loop sets a DATA-SIZED shuffle width per bucket; that is a
    # session-global conf, so remember the caller's value and restore it on
    # every exit path — otherwise the last bucket's width leaks into
    # whatever the caller runs next on this SparkSession (round-3 ADVICE).
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions", None)

    # --- stage 0: bucketed staging of per-turn measures ---------------------
    # One full-input pass; partitionBy(bucket) so each bucket job reads only
    # its own files afterwards (partition pruning on the parquet layout).
    # The staging manifest is fingerprinted from the RAW transcripts: on
    # resume with a changed input dataset, staging re-runs and the stale
    # staged parquet is overwritten — without this the per-bucket
    # fingerprints would be computed from stale staged files, match the old
    # manifests, and silently skip every bucket (round-1 ADVICE, medium).
    staging = "staging_measures"
    stage_fp = _input_fingerprint(transcripts)
    if not (resume and store.exists(staging) and ckpt.is_done("staging", -1, stage_fp)):
        measures = with_bucket(with_measures(transcripts), cfg.n_buckets)
        t = time.time()
        store.write(measures, staging, partition_by=("bucket",))
        n = spark.read.parquet(store.path(staging)).count()
        ckpt.commit("staging", -1, stage_fp, n, (time.time() - t) * 1000)
    metrics.staged_turns = spark.read.parquet(store.path(staging)).count()

    try:
        # --- per-bucket stage graph ---------------------------------------------
        for b in range(cfg.n_buckets):
            bdir = os.path.join(store.path(staging), f"bucket={b}")
            if not os.path.exists(bdir):
                ckpt.commit(f"bucket", b, "empty", 0, 0.0)
                continue
            bm = spark.read.parquet(bdir)
            # Data-sized shuffle width per bucket (conf.shuffle_partitions_for_bytes):
            # a fixed width spills at 10x data and over-fragments at 0.1x.
            from yatsm_spark.conf import shuffle_partitions_for_bytes
            b_bytes = sum(os.path.getsize(os.path.join(bdir, f))
                          for f in os.listdir(bdir) if f.endswith(".parquet"))
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(shuffle_partitions_for_bytes(
                    b_bytes, spark.sparkContext.defaultParallelism)))
            fp = _input_fingerprint(bm)
            if cfg.compress:
                # Format bump -> fingerprint mismatch -> bucket re-encodes on
                # resume instead of leaving mixed-version chunk tables behind
                # (legacy streams still decode; this keeps tables homogeneous).
                from yatsm_spark.operators.codec import CHUNK_FORMAT_VERSION
                fp = f"{fp}:cfv{CHUNK_FORMAT_VERSION}"
            if resume and ckpt.is_done("bucket", b, fp):
                continue
            t = time.time()
            # Sparse-first dataflow: every shuffle moves only REAL slots; the
            # dense (gap-filled) tiers are generated post-shuffle on the write
            # path, and the kernels densify per conv in numpy. At bench skew
            # the dense tier is ~8x the sparse one — none of it is exchanged.
            rollup_1m = {
                "always": lambda df: R.rollup_from_turns_salted(df, "1m"),
                "adaptive": lambda df: R.rollup_from_turns_adaptive(df, "1m"),
            }.get(cfg.salting, lambda df: R.rollup_from_turns(df, "1m"))
            sparse = rollup_1m(bm).cache()
            rows = {"rollup_1m_sparse": sparse.count()}
            store.write_bucket(R.gapfill(sparse, "1m"), "tier_1m", b)
            rows["rollup_1m"] = spark.read.parquet(
                os.path.join(store.path("tier_1m"), f"bucket={b}")).count()

            prev = sparse
            for tier_from, tier_to in (("1m", "1h"), ("1h", "1d")):
                if tier_to not in cfg.tiers:
                    continue
                nxt = cascade(prev, tier_from, tier_to).cache()
                rows[f"rollup_{tier_to}"] = nxt.count()
                store.write_bucket(R.gapfill(nxt, tier_to), f"tier_{tier_to}", b)
                prev = nxt

            if cfg.segments:
                segs = change_scores(sparse, "turn_count", CONV_PARAMS, densify=True,
                                     phenology=cfg.phenology)
                store.write_bucket(segs, "segments", b)
                rows["segments"] = spark.read.parquet(
                    os.path.join(store.path("segments"), f"bucket={b}")).count()

            if cfg.compress:
                chunks = encode_chunks(sparse, "1m", cfg.chunk_points, densify=True)
                store.write_bucket(chunks, "chunks_1m", b)
                rows["chunks_1m"] = spark.read.parquet(
                    os.path.join(store.path("chunks_1m"), f"bucket={b}")).count()

            sparse.unpersist()
            m = ckpt.commit("bucket", b, fp, rows.get("rollup_1m", 0),
                            (time.time() - t) * 1000, **rows)
            metrics.buckets.append(m)
            if fail_after_bucket is not None and b >= fail_after_bucket:
                raise RuntimeError(f"injected failure after bucket {b}")
    finally:
        # Restore the caller's shuffle width on every exit path
        # (including the injected-failure raise used by resume tests).
        if prev_shuffle is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)

    metrics.wall_s = time.time() - t0
    return metrics
