"""High-level engine facade.

Maps the reference CLI surface (yatsm/cli/main.py click group [H],
SURVEY.md §3) onto engine methods:

    yatsm line      -> Engine.run()            (pipeline.run_pipeline)
    yatsm pixel     -> Engine.explain_conv()   (single-series debug, §3.2)
    yatsm map       -> Engine.snapshot_at()    (as-of J3 over segments)
    yatsm changemap -> Engine.changemap()      (W7 over segments)
    yatsm cache     -> the 1m tier itself      (S5: tier IS the cache)
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

    def segments(self, params=CONV_PARAMS) -> DataFrame:
        return change_scores(self.rollup("1m"), params=params)

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

    def snapshot_at(self, segments: DataFrame, at) -> DataFrame:
        """`yatsm map` analogue (J3): the segment active per conv at `at`."""
        return asof_latest(segments, "conv_id", "start_ts", at)

    def changemap(self, segments: DataFrame) -> DataFrame:
        """`yatsm changemap` analogue (W7): first/last/num breaks per conv."""
        breaks = segments.filter(F.col("break_ts").isNotNull())
        return changemap(breaks, "conv_id", "break_ts")
