"""High-level engine facade.

Maps the reference CLI surface (yatsm/cli/main.py click group [H],
SURVEY.md §3) onto engine methods:

    yatsm line      -> Engine.run()            (pipeline.run_pipeline)
    yatsm pixel     -> Engine.explain_conv()   (single-series debug, §3.2)
                       + Engine.plot_conv()    (SVG series/segment plot)
    yatsm map       -> Engine.snapshot_at()    (as-of J3 over segments)
    yatsm map pheno -> Engine.segments(phenology=True) + snapshot_at (A3)
    yatsm changemap -> Engine.changemap()      (W7 over segments)
    yatsm cache     -> the 1m tier itself      (S5: tier IS the cache)
    yatsm train     -> Engine.train_classifier() (P4, cli/train.py)
    yatsm classify  -> Engine.classify()       (P4, cli/classify.py)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from yatsm_spark.ingest import with_measures
from yatsm_spark.operators.changescore import CONV_PARAMS, change_scores
from yatsm_spark.operators.joins import asof_latest, changemap
from yatsm_spark.operators.rollup import rollup_gapfilled, with_derived_stats
from yatsm_spark.pipeline import PipelineConfig, run_pipeline


@dataclass
class Engine:
    spark: SparkSession
    transcripts: DataFrame

    def run(self, workdir: str, **kw):
        return run_pipeline(self.spark, self.transcripts,
                            PipelineConfig(workdir=workdir, **kw))

    def rollup(self, tier: str = "1m") -> DataFrame:
        return rollup_gapfilled(with_measures(self.transcripts), tier)

    def segments(self, params=CONV_PARAMS, phenology: bool = False) -> DataFrame:
        return change_scores(self.rollup("1m"), params=params, phenology=phenology)

    def segments_multi(self, measures: list[str], params=CONV_PARAMS,
                       test_indices: list[int] | None = None) -> DataFrame:
        """Multi-band fit (reference CCDCesque multi-band semantics)."""
        from yatsm_spark.operators.changescore import change_scores_multi

        return change_scores_multi(self.rollup("1m"), measures, params=params,
                                   test_indices=test_indices)

    def phenology(self) -> DataFrame:
        """A3 relational form: per-conv diurnal long-term-mean stats."""
        from yatsm_spark.operators.phenology import diurnal_stats

        return diurnal_stats(self.rollup("1m"))

    def train_classifier(self, segments: DataFrame, labels: DataFrame, **kw):
        """P4 `yatsm train`: broadcast-join labels, fit the numpy forest."""
        from yatsm_spark.operators.classify import (
            segment_features,
            train_segment_classifier,
        )

        return train_segment_classifier(segment_features(segments), labels, **kw)

    def classify(self, segments: DataFrame, model) -> DataFrame:
        """P4 `yatsm classify`: append class/class_proba per segment."""
        from yatsm_spark.operators.classify import classify_segments

        return classify_segments(segments, model)

    def explain_conv(self, conv_id: str):
        """`yatsm pixel` analogue (SURVEY.md §3.2): the gap-filled series,
        derived stats, and fitted segments for ONE conversation — predicate
        pushes down to the source scan (S4)."""
        one = self.transcripts.where(F.col("conv_id") == conv_id)
        filled = rollup_gapfilled(with_measures(one), "1m")
        return {
            "series": with_derived_stats(filled),
            "segments": change_scores(filled),
        }

    def plot_conv(self, conv_id: str, path: str | None = None,
                  measure: str = "turn_count") -> str:
        """`yatsm pixel --plot` analogue (SURVEY.md §3.2): render one
        conversation's series + fitted segments + breaks as an SVG string
        (dependency-free; see plot.py). Collect is bounded to one conv —
        the conv_id predicate pushes down to the scan (S4)."""
        from yatsm_spark.plot import render_conv_svg

        parts = self.explain_conv(conv_id)
        svg = render_conv_svg(parts["series"].toPandas(),
                              parts["segments"].toPandas(), measure=measure)
        if path:
            with open(path, "w") as f:
                f.write(svg)
        return svg

    def snapshot_at(self, segments: DataFrame, at) -> DataFrame:
        """`yatsm map` analogue (J3): the segment active per conv at `at`."""
        return asof_latest(segments, "conv_id", "start_ts", at,
                           tie_break=["segment_id"])

    def map_predict(self, segments: DataFrame, at) -> DataFrame:
        """`yatsm map predict DATE` (§3.3): active segment per conv at `at`
        with ŷ = X(at)·coef appended (JVM-side fold, no UDF)."""
        from yatsm_spark.operators.changescore import predict_at

        return predict_at(self.snapshot_at(segments, at), at)

    def changemap(self, segments: DataFrame) -> DataFrame:
        """`yatsm changemap` analogue (W7): first/last/num breaks per conv."""
        breaks = segments.filter(F.col("break_ts").isNotNull())
        return changemap(breaks, "conv_id", "break_ts")

    # ---- monitoring / series-analytics toolkit (beyond the reference
    # CLI surface; same tier lineage as the methods above) ----

    def anomalies(self, tier: str = "1m", **kw) -> DataFrame:
        """Rolling integer-exact z-test flags over the dense tier."""
        from yatsm_spark.operators.tsfuncs import rolling_anomaly

        t = self.rollup(tier).select("conv_id", "window_start",
                                     "turn_count")
        return rolling_anomaly(t, "turn_count", **kw)

    def alert_episodes(self, tier: str = "1m", **kw) -> DataFrame:
        """Anomaly flags collapsed into alert episodes."""
        from yatsm_spark.operators.tsfuncs import alert_episodes

        return alert_episodes(self.anomalies(tier, **kw))

    def changepoints(self, tier: str = "1h", **kw) -> DataFrame:
        """PELT globally-optimal mean-shift changepoints per conv."""
        from yatsm_spark.operators.changepoint import pelt_changepoints

        t = self.rollup(tier).select("conv_id", "window_start",
                                     "turn_count")
        return pelt_changepoints(t, "turn_count", **kw)

    def bursts(self, **kw) -> DataFrame:
        """Kleinberg burst intervals over raw turn arrivals."""
        from yatsm_spark.operators.changepoint import burst_intervals

        return burst_intervals(self.transcripts, **kw)

    def profile(self, tier: str = "1h", m: int = 12, **kw) -> DataFrame:
        """Matrix profile (motif/discord) of each conv's dense tier."""
        from yatsm_spark.operators.matrixprofile import matrix_profile

        t = self.rollup(tier).select("conv_id", "window_start",
                                     "turn_count")
        return matrix_profile(t, "turn_count", m=m, **kw)

    def serve_range(self, qs, qe, tiers: dict[str, DataFrame] | None = None,
                    watermark=None, chunks: DataFrame | None = None) -> DataFrame:
        """Tier-routed range aggregate (the serve-side of the cascade):
        per-conv measure totals over [qs, qe) answered from the coarsest
        tiers that cover it, with raw-turn fallback for the fresh tail
        past ``watermark``. Pass materialized tier DataFrames in
        ``tiers`` ({"1m":…, "1h":…, "1d":…}) for the production path;
        without them the tiers are built inline from the transcripts
        (correct, but the coarse-scan byte savings only materialize
        against stored tier tables). Bit-identical to aggregating the
        raw turns over the same range (operators/routing.py)."""
        from yatsm_spark.operators.cascade import cascade
        from yatsm_spark.operators.routing import route_range
        from yatsm_spark.operators.rollup import rollup_from_turns

        m = with_measures(self.transcripts)
        if tiers is None:
            src = m.where(F.col("ts") < F.lit(watermark)) if watermark else m
            t1m = rollup_from_turns(src, "1m")
            tiers = {"1m": t1m, "1h": cascade(t1m, "1m", "1h"),
                     "1d": cascade(t1m, "1m", "1d")}
        return route_range(tiers, qs, qe, fresh_measures=m,
                           watermark=watermark, chunks=chunks)
