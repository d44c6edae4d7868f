"""Z-order clustering: key math vs a python twin, the data-skipping win
the layout exists for, balanced range partitioning, and hostile edges.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from yatsm_spark.operators.zorder import (
    cluster_by_zorder,
    skipping_ratio,
    zorder_key,
)


def _py_z(g0, g1, bits=16):
    z = 0
    for b in range(bits):
        z |= ((g0 >> b) & 1) << (b * 2)
        z |= ((g1 >> b) & 1) << (b * 2 + 1)
    return z


def test_key_matches_python_twin(spark):
    rng = np.random.RandomState(3)
    xs = rng.uniform(-5, 5, 200)
    ys = rng.uniform(0, 100, 200)
    df = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in enumerate(zip(xs, ys))],
        "id long, x double, y double")
    got = {r.id: r.z for r in zorder_key(df, ["x", "y"]).collect()}
    lo0, hi0 = float(xs.min()), float(xs.max())
    lo1, hi1 = float(ys.min()), float(ys.max())
    cells = 65535.0
    for i, (x, y) in enumerate(zip(xs, ys)):
        g0 = min(max(int(np.floor((x - lo0) * cells / (hi0 - lo0))), 0), 65535)
        g1 = min(max(int(np.floor((y - lo1) * cells / (hi1 - lo1))), 0), 65535)
        assert got[i] == _py_z(g0, g1)


def test_zorder_improves_box_query_skipping(spark, tmp_path):
    # 64x64 grid of points; a small box predicate; per-file min/max stats
    # computed the way a parquet reader would use them.
    n = 4096
    rng = np.random.RandomState(7)
    xs = rng.permutation(n) % 64
    ys = rng.permutation(n) // 64
    df = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in enumerate(zip(xs, ys))],
        "id long, x double, y double")
    n_files = 16

    def file_stats(frame):
        parts = frame.withColumn("p", F.spark_partition_id()) \
                     .groupBy("p").agg(F.min("x"), F.max("x"),
                                       F.min("y"), F.max("y")).collect()
        return [{"x": (r["min(x)"], r["max(x)"]),
                 "y": (r["min(y)"], r["max(y)"])} for r in parts]

    lo, hi = {"x": 10.0, "y": 10.0}, {"x": 17.0, "y": 17.0}
    plain = df.repartition(n_files)  # hash layout: every file spans all
    clustered = cluster_by_zorder(df, ["x", "y"], n_files)
    r_plain = skipping_ratio(file_stats(plain), lo, hi)
    r_z = skipping_ratio(file_stats(clustered), lo, hi)
    assert r_z >= 0.5          # the box touches a corner of z-space
    assert r_z > r_plain + 0.4  # and hash layout skips ~nothing
    # clustering preserved every row
    assert clustered.count() == n


def test_range_partitioning_is_balanced_under_skew(spark):
    # 90% of rows share one x value; range partitioning on z still
    # spreads rows (y bits differ), no single giant partition
    rows = [(i, 1.0 if i % 10 else 2.0, float(i % 997)) for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    sizes = [r.cnt for r in
             cluster_by_zorder(df, ["x", "y"], 8)
             .withColumn("p", F.spark_partition_id())
             .groupBy("p").agg(F.count("*").alias("cnt")).collect()]
    assert max(sizes) < 0.5 * 5000


def test_string_column_and_fixed_stats(spark):
    df = spark.createDataFrame(
        [(i, f"doc{i}", float(i)) for i in range(50)],
        "id long, s string, v double")
    out = zorder_key(df, ["s", "v"], bits=8)
    assert out.filter(F.col("z") < 0).count() == 0
    # externally pinned stats keep keys comparable across writes
    a = zorder_key(df, ["v"], bits=8, stats={"v": (0.0, 100.0)}) \
        .orderBy("id").select("z").collect()
    b = zorder_key(df.limit(10), ["v"], bits=8, stats={"v": (0.0, 100.0)}) \
        .orderBy("id").select("z").collect()
    assert [r.z for r in a[:10]] == [r.z for r in b]


def test_hostile_edges(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 5.0)], "id long, v double")
    # constant column -> cell 0, no divide-by-zero
    assert [r.z for r in zorder_key(df, ["v"]).collect()] == [0, 0]
    with pytest.raises(ValueError, match="63-bit"):
        zorder_key(df, ["v", "id", "v", "id"], bits=16)
    with pytest.raises(ValueError, match="at least one"):
        zorder_key(df, [])
