"""IcebergStorage SQL contract (round-1 verdict item 7).

The sandbox has no Iceberg jars, so the production reconcile/evict path
(J4's MERGE INTO, retention's partition DELETE) cannot run end-to-end
here. These tests pin the EMITTED SQL instead: a fake SparkSession records
every spark.sql() call, and the assertions fail if the statement shape
regresses (wrong keys, missing UPDATE/INSERT arms, unqualified table,
unfiltered DELETE)."""

import re


class _FakeDF:
    def __init__(self, log):
        self._log = log

    def createOrReplaceTempView(self, name):
        self._log.append(("view", name))


class _FakeSpark:
    def __init__(self):
        self.log = []

    def sql(self, q):
        self.log.append(("sql", q))


def _norm(q: str) -> str:
    return re.sub(r"\s+", " ", q).strip()


def test_merge_rollup_emits_keyed_upsert():
    from yatsm_spark.sources.storage import IcebergStorage

    spark = _FakeSpark()
    store = IcebergStorage(spark, catalog="ice", namespace="tiers", n_buckets=8)
    store.merge_rollup(_FakeDF(spark.log), "tier_1m")

    views = [n for k, n in spark.log if k == "view"]
    assert views == ["_updates"], "updates must be registered as a temp view"
    (sql,) = [q for k, q in spark.log if k == "sql"]
    s = _norm(sql)
    assert "MERGE INTO ice.tiers.tier_1m t" in s
    assert "USING _updates u" in s
    # reconcile key is the rollup primary key — BOTH columns, equi-joined
    assert "ON t.conv_id = u.conv_id AND t.window_start = u.window_start" in s
    assert "WHEN MATCHED THEN UPDATE SET *" in s
    assert "WHEN NOT MATCHED THEN INSERT *" in s


def test_evict_before_emits_bounded_delete():
    from yatsm_spark.sources.storage import IcebergStorage

    spark = _FakeSpark()
    store = IcebergStorage(spark, catalog="ice", namespace="tiers")
    store.evict_before("tier_1m", "2025-01-08 00:00:00")

    (sql,) = [q for k, q in spark.log if k == "sql"]
    s = _norm(sql)
    assert s.startswith("DELETE FROM ice.tiers.tier_1m")
    # an unfiltered DELETE would truncate the tier — the WHERE is the test
    assert "WHERE window_start < TIMESTAMP '2025-01-08 00:00:00'" in s
