"""SparkSession factory with the engine's standard configuration.

Scale posture (SURVEY.md §4): AQE on (runtime re-plan + skew-join splitting),
Arrow on (every Python crossing is vectorized), shuffle partitions sized to
cores for local runs — on a real cluster this is overridden by
``spark-submit --conf`` and AQE coalescing makes the initial number soft.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Confs that matter at 100 TB and cost nothing locally.
ENGINE_CONFS = {
    # Arrow transfer for every pandas UDF / toPandas crossing.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # AQE: runtime coalescing, skew-join splitting, join re-planning.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Timestamps are UTC end-to-end; rollup windows must not depend on the
    # driver's locale.
    "spark.sql.session.timeZone": "UTC",
    # Parquet scan batching.
    "spark.sql.parquet.enableVectorizedReader": "true",
    # Small splits: 16m gives ~4-5 task waves per 32 cores at sf0.1, hiding
    # straggler splits (zipf text skew makes 64m splits uneven — measured
    # 33s -> 25s on the 1m rollup). Cluster deployments override via
    # submit conf; AQE coalescing keeps downstream stages right-sized.
    "spark.sql.files.maxPartitionBytes": "16m",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
    # ANSI overflow-checked arithmetic costs ~2.4x on the hot aggregation
    # path (measured: full 1m rollup 94s -> 39s at sf0.1/local[32]). The
    # engine's integral moments are overflow-safe by construction
    # (token_len <= 32k => sumsq per conv-window << 2^63), so the checks
    # buy nothing here.
    "spark.sql.ansi.enabled": "false",
    # Keep stdout clean (bench.py must emit exactly one JSON line).
    "spark.ui.showConsoleProgress": "false",
    "spark.ui.enabled": "false",
}


def shuffle_partitions_for_bytes(n_bytes: int, cores: int,
                                 target_bytes: int = 256 << 20) -> int:
    """Size the shuffle width to the DATA, floored at the core count.

    Measured A/B at local[32] (BENCH/BASELINE_8_32.md round-3 addendum):
    78M turns (2.6 GB) runs 28% faster at 32 partitions than 128 (fewer,
    fuller Arrow batches and sort runs), while 791M turns (27 GB) runs 36%
    faster at 128 than 32 (a 32-wide reduce spills GB-scale sorts). One
    constant cannot serve both; ~256 MB of input per reduce partition
    lands on the measured winner at each scale and extrapolates to the
    cluster rule of thumb (100 TB -> ~400k partitions across 1000
    executors). AQE coalescing still shrinks small stages below the
    floor at runtime.
    """
    return max(cores, min(32_768, int(n_bytes // target_bytes)))


def grouped_stage_partitions(spark) -> int:
    """Partition width for grouped-kernel stages (applyInPandas over
    conv groups). Group sizes are zipf-skewed, and a grouped stage gets
    NO AQE skew-splitting (a group is atomic), so balance comes from
    the law of large numbers: more, smaller partitions -> more groups
    per partition -> smaller relative spread of per-partition work.
    4x the scheduler's core count gives ~4 task waves for packing while
    keeping partitions far above Arrow-batch granularity; floored by
    the session shuffle width so a data-sized wider setting wins.
    Measured at sf0.1/local[32]: segments_ccdc wall drops ~25% vs the
    32-partition single wave. Scale-adaptive by construction (cores
    and shuffle width both grow with the cluster)."""
    conf_sp = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    return max(conf_sp, 4 * spark.sparkContext.defaultParallelism)


def get_spark(
    app_name: str = "yatsm-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    master defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) when no
    cluster master is supplied — on a real deployment this function is called
    without master under ``spark-submit --py-files``.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    b = SparkSession.builder.appName(app_name).master(master)
    confs = dict(ENGINE_CONFS)
    # Python workers (mapInPandas/applyInPandas) must import this package
    # regardless of the consumer's cwd: driver-side sys.path edits don't
    # reach worker processes, so export the repo root on PYTHONPATH — env
    # for same-box workers (must happen before the JVM starts), executorEnv
    # for local-cluster executors. On a real cluster this is superseded by
    # `spark-submit --py-files yatsm_spark.zip`.
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prev = os.environ.get("PYTHONPATH", "")
    if repo not in prev.split(os.pathsep):
        os.environ["PYTHONPATH"] = repo + (os.pathsep + prev if prev else "")
    confs.setdefault("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
    # Local single-JVM mode: driver IS the executor — size the heap for the
    # thread count (must be set before the JVM starts; no-op afterwards).
    confs.setdefault("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    confs.setdefault("spark.driver.maxResultSize", "8g")
    if shuffle_partitions is None:
        # Local mode: 4x cores — big shuffles want more, smaller slices
        # spill less, and AQE coalesces the small ones back down for free.
        # Cluster mode: leave to submit conf / AQE.
        n = master.split("[")[-1].rstrip("]") if "[" in master else "200"
        cores = 32 if n == "*" else int(n) if n.isdigit() else 50
        shuffle_partitions = 4 * cores
    confs["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
