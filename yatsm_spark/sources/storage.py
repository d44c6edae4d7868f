"""Storage layer: one writer interface over parquet-now / Iceberg-later.

Parity anchor: S6 result sink (yatsm/cli/line.py np.savez per row → here
partitioned table appends [M]) and S5 line cache (yatsm/cache.py [H] → the
materialized 1m tier IS the cache).

The sandbox has no Iceberg jars (SURVEY.md §7.4), so the default backend is
a partitioned parquet layout with the SAME partition spec the Iceberg DDL
would use:

    {root}/{table}/bucket=<k>/...   with bucket = pmod(xxhash64(conv_id), B)

On a real cluster swap ParquetStorage for IcebergStorage (writeTo(...)
.append(), MERGE INTO for reconcile) — the engine only talks to the
Storage protocol. Bucketed layout co-locates every per-conv operation
(rollup groups, kernel groups, chunk groups) so downstream stages shuffle
within buckets only; at 10^12 turns the bucket count B is the unit of
checkpoint/resume (SURVEY.md §4 partitioning row).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

DEFAULT_BUCKETS = 16


def with_bucket(df: DataFrame, n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """Stable conv bucket: pmod(xxhash64(conv_id), B). xxhash64 is a fixed
    Spark function — bucket assignment never depends on parallelism."""
    return df.withColumn("bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int"))


class ParquetStorage:
    def __init__(self, root: str, n_buckets: int = DEFAULT_BUCKETS):
        self.root = root
        self.n_buckets = n_buckets
        os.makedirs(root, exist_ok=True)

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def write(self, df: DataFrame, table: str, mode: str = "overwrite",
              partition_by: tuple[str, ...] = ("bucket",)) -> None:
        if "bucket" in partition_by and "bucket" not in df.columns:
            df = with_bucket(df, self.n_buckets)
        (df.write.mode(mode).partitionBy(*partition_by).parquet(self.path(table)))

    def write_bucket(self, df: DataFrame, table: str, bucket: int) -> None:
        """Atomic per-bucket write: tmp dir + rename (the graft's analogue
        of the reference's one-.npz-per-row commit, S6)."""
        final = os.path.join(self.path(table), f"bucket={bucket}")
        tmp = final + ".inprogress"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        df.write.mode("overwrite").parquet(tmp)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.option("basePath", self.path(table)).parquet(self.path(table))

    def read_bucket(self, spark: SparkSession, table: str, bucket: int) -> DataFrame:
        return spark.read.parquet(os.path.join(self.path(table), f"bucket={bucket}"))

    def exists(self, table: str) -> bool:
        return os.path.exists(self.path(table))

    def drop(self, table: str) -> None:
        if self.exists(table):
            shutil.rmtree(self.path(table))


class IcebergStorage:
    """Iceberg backend for real clusters (sandbox has no Iceberg jars —
    SURVEY.md §7.4 — so this path is exercised only when the catalog conf
    is present; ParquetStorage is the test-time default).

    Table layout mirrors ParquetStorage: one table per tier/artifact,
    partitioned by bucket(conv) via a hidden-partition spec. Reconcile
    (J4/S5 cache-update semantics) uses MERGE INTO keyed on
    (conv_id, window_start); retention eviction is a partition-predicate
    DELETE — both snapshot-isolated, which supersedes the parquet
    backend's tmp+rename bucket commits.
    """

    def __init__(self, spark: SparkSession, catalog: str, namespace: str,
                 n_buckets: int = DEFAULT_BUCKETS):
        self.spark = spark
        self.catalog = catalog
        self.namespace = namespace
        self.n_buckets = n_buckets

    def _ident(self, table: str) -> str:
        return f"{self.catalog}.{self.namespace}.{table}"

    def ensure(self, df: DataFrame, table: str) -> None:
        (df.writeTo(self._ident(table))
           .partitionedBy(F.bucket(self.n_buckets, F.col("conv_id")))
           .createOrReplace())

    def write(self, df: DataFrame, table: str, mode: str = "append", **_) -> None:
        w = df.writeTo(self._ident(table))
        w.append() if mode == "append" else w.createOrReplace()

    def merge_rollup(self, updates: DataFrame, table: str) -> None:
        """Idempotent upsert of rollup rows (late-data reconcile)."""
        updates.createOrReplaceTempView("_updates")
        self.spark.sql(f"""
            MERGE INTO {self._ident(table)} t
            USING _updates u
            ON t.conv_id = u.conv_id AND t.window_start = u.window_start
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *
        """)

    def evict_before(self, table: str, cutoff) -> None:
        self.spark.sql(
            f"DELETE FROM {self._ident(table)} WHERE window_start < TIMESTAMP '{cutoff}'")

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.table(self._ident(table))
