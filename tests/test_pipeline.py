"""Checkpoint/resume invariants (FIXTURES.md §3; BASELINE.md resumability
row): kill after k buckets, resume, outputs identical to an uninterrupted
run — the graft's hardened version of `yatsm line --resume`."""

import os

import pytest

from yatsm_spark.pipeline import PipelineConfig, PipelineMetrics, run_pipeline
from yatsm_spark.sources.storage import ParquetStorage
from yatsm_spark.synth import generate_transcripts


@pytest.fixture(scope="module")
def tx(spark):
    df = generate_transcripts(spark, 30, seed=3, max_turns=1500).cache()
    df.count()
    return df


def _table(spark, workdir, name):
    return (
        spark.read.option("basePath", os.path.join(workdir, name))
        .parquet(os.path.join(workdir, name))
        .drop("bucket")
    )


def test_kill_and_resume_is_bit_identical(spark, tx, tmp_path_factory):
    w_full = str(tmp_path_factory.mktemp("full"))
    w_res = str(tmp_path_factory.mktemp("resumed"))
    cfg_full = PipelineConfig(workdir=w_full, n_buckets=4, compress=True, segments=True)
    cfg_res = PipelineConfig(workdir=w_res, n_buckets=4, compress=True, segments=True)

    m1 = run_pipeline(spark, tx, cfg_full, resume=False)
    assert m1.staged_turns == tx.count()

    with pytest.raises(RuntimeError, match="injected failure"):
        run_pipeline(spark, tx, cfg_res, resume=True, fail_after_bucket=1)
    m2 = run_pipeline(spark, tx, cfg_res, resume=True)
    # resumed run must only have processed the remaining buckets
    assert len(m2.buckets) < 4

    for t in ("tier_1m", "tier_1h", "tier_1d", "segments", "chunks_1m"):
        a = _table(spark, w_full, t)
        b = _table(spark, w_res, t)
        assert a.exceptAll(b).count() == 0, t
        assert b.exceptAll(a).count() == 0, t


def test_manifests_record_lineage_and_metrics(spark, tx, tmp_path_factory):
    w = str(tmp_path_factory.mktemp("mani"))
    cfg = PipelineConfig(workdir=w, n_buckets=2, compress=False, segments=False)
    run_pipeline(spark, tx, cfg, resume=False)
    from yatsm_spark.checkpoint import CheckpointManager

    ms = CheckpointManager(w).manifests("bucket")
    assert len(ms) == 2
    for m in ms:
        assert m["complete"] is True
        assert ":" in m["input_fingerprint"]
        assert m["wall_ms"] > 0
        assert m["rollup_1m"] > 0


def test_changed_input_invalidates_bucket(spark, tx, tmp_path_factory):
    """Resume with a CHANGED input and no manual cache clearing: the staging
    fingerprint (computed from the raw transcripts) must differ, forcing
    re-staging, and the per-bucket fingerprints then differ too, forcing
    bucket recompute. Round-1 ADVICE (medium): a constant staging
    fingerprint silently skipped every bucket on changed input."""
    w = str(tmp_path_factory.mktemp("inval"))
    cfg = PipelineConfig(workdir=w, n_buckets=2, compress=False, segments=False)
    run_pipeline(spark, tx, cfg, resume=False)
    # New input (one conv more) -> fingerprints differ -> buckets recompute,
    # WITHOUT any manual staging/manifest invalidation.
    tx2 = generate_transcripts(spark, 31, seed=3, max_turns=1500)
    m = run_pipeline(spark, tx2, cfg, resume=True)
    assert len(m.buckets) >= 1
    total = _table(spark, w, "tier_1m").select("conv_id").distinct().count()
    assert total == 31


def test_unchanged_input_resume_skips_everything(spark, tx, tmp_path_factory):
    """Resume with IDENTICAL input must skip all buckets (fingerprints
    match) — the flip side of invalidation."""
    w = str(tmp_path_factory.mktemp("skip"))
    cfg = PipelineConfig(workdir=w, n_buckets=2, compress=False, segments=False)
    run_pipeline(spark, tx, cfg, resume=False)
    m = run_pipeline(spark, tx, cfg, resume=True)
    assert len(m.buckets) == 0


def test_adaptive_salting_pipeline_tiers_identical(spark, tx, tmp_path_factory):
    # The salting knob changes only the physical agg plan; every tier a
    # pipeline writes must be bit-identical across strategies.
    w_none = str(tmp_path_factory.mktemp("p_salt_none"))
    w_adpt = str(tmp_path_factory.mktemp("p_salt_adaptive"))
    run_pipeline(spark, tx, PipelineConfig(workdir=w_none, n_buckets=2,
                                           compress=False, segments=False),
                 resume=False)
    run_pipeline(spark, tx, PipelineConfig(workdir=w_adpt, n_buckets=2,
                                           compress=False, segments=False,
                                           salting="adaptive"),
                 resume=False)
    for tier in ("tier_1m", "tier_1h", "tier_1d"):
        a = _table(spark, w_none, tier)
        b = _table(spark, w_adpt, tier)
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, tier
