"""HLL distinct-count and HDR-histogram quantile sketches.

Layers: hand-computed register/bucket math (against a pure-Python
reference of the same md5/bit pipeline), estimator accuracy bounds on
synthetic cardinalities (both the raw-HLL and linear-counting branches),
quantile correctness vs numpy on the bucket's error bound, and the
order-independence the docstrings promise (repartition invariance).
"""

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from yatsm_spark.operators.sketches import (
    HLL_M,
    hdr_histogram,
    hdr_quantiles,
    hll_distinct,
    hll_registers,
)


def _py_register_table(values):
    """Pure-Python twin of hll_registers for string values."""
    regs = {}
    for v in values:
        h = hashlib.md5(str(v).encode()).hexdigest()
        bucket = int(h[0:3], 16)
        w = int(h[3:18], 16)
        rho = 61 if w == 0 else 61 - w.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def _py_bucket(x):
    if x <= 3:
        return x
    bl = x.bit_length()
    return (bl - 2) * 4 + ((x >> (bl - 3)) & 3)


def test_hll_registers_match_python_twin(spark):
    vals = [f"doc-{i}" for i in range(500)]
    df = spark.createDataFrame([(v, "g") for v in vals], "v string, g string")
    got = {r.bucket: r.register
           for r in hll_registers(df, ["g"], "v").collect()}
    assert got == _py_register_table(vals)


def test_hll_estimate_linear_counting_branch(spark):
    # 300 distinct << 2.5 * m -> linear counting; error ~ sqrt(m)/n small
    df = spark.range(0, 300).select(
        F.concat(F.lit("x"), F.col("id")).alias("v"), F.lit("g").alias("g"))
    row = hll_distinct(df, ["g"], "v").collect()[0]
    assert row.v_zero > 0
    assert abs(row.est_distinct - 300) / 300 < 0.05
    # duplicates do not move the estimate (it is a distinct sketch)
    dup = df.union(df).union(df)
    row2 = hll_distinct(dup, ["g"], "v").collect()[0]
    assert row2.est_distinct == row.est_distinct


def test_hll_estimate_raw_branch_accuracy(spark):
    # 50k distinct > 2.5 * m -> raw HLL path; rel err ~ 1.04/sqrt(4096) ~ 1.6%
    df = spark.range(0, 50_000).select(
        F.concat(F.lit("y"), F.col("id")).alias("v"), F.lit("g").alias("g"))
    row = hll_distinct(df, ["g"], "v").collect()[0]
    assert abs(row.est_distinct - 50_000) / 50_000 < 0.05


def test_hll_partitioning_invariance(spark):
    df = spark.range(0, 2000).select(
        F.concat(F.lit("z"), F.col("id")).alias("v"),
        (F.col("id") % 3).cast("string").alias("g"))
    a = sorted((r.g, r.n_buckets_used, r.v_zero, r.est_distinct)
               for r in hll_distinct(df, ["g"], "v").collect())
    b = sorted((r.g, r.n_buckets_used, r.v_zero, r.est_distinct)
               for r in hll_distinct(df.repartition(17), ["g"], "v").collect())
    assert a == b


def test_hdr_bucket_math(spark):
    xs = [0, 1, 2, 3, 4, 5, 7, 8, 9, 13, 14, 15, 16, 100, 1000, 123456]
    df = spark.createDataFrame([(x, "g") for x in xs], "x long, g string")
    got = {r.bucket: r.cnt for r in hdr_histogram(df, ["g"], "x").collect()}
    want = {}
    for x in xs:
        b = _py_bucket(x)
        want[b] = want.get(b, 0) + 1
    assert got == want
    # bucket lower bound <= x for every x (representative is conservative)
    for x in xs[4:]:
        b = _py_bucket(x)
        lower = (4 + b % 4) << (b // 4 - 1)
        upper = (4 + b % 4 + 1) << (b // 4 - 1)
        assert lower <= x < upper


def test_hdr_quantiles_within_bucket_error(spark):
    rng = np.random.RandomState(7)
    vals = rng.lognormal(4.0, 1.0, size=5000).astype(np.int64) + 1
    df = spark.createDataFrame([(int(v), "g") for v in vals],
                               "x long, g string")
    rows = {r.q_label: r for r in hdr_quantiles(df, ["g"], "x").collect()}
    for label, q in [("p50", 0.5), ("p90", 0.9), ("p99", 0.99)]:
        rank = math.ceil(q * len(vals))
        true = int(np.sort(vals)[rank - 1])
        est = rows[label].est_value
        # est is the lower bound of the bucket containing the true
        # rank-th value: est <= true < est * (1 + 1/4) * 2 conservative
        assert est <= true
        assert true <= 2 * est + 3  # one octave sub-bucket bound
        assert rows[label].n == len(vals)


def test_hdr_quantiles_exact_on_tiny_group(spark):
    # all values < 4 are bucketed by identity -> quantiles exact
    df = spark.createDataFrame(
        [(v, "g") for v in [1, 1, 2, 2, 2, 3, 3, 3, 3, 3]], "x long, g string")
    rows = {r.q_label: r.est_value
            for r in hdr_quantiles(df, ["g"], "x").collect()}
    assert rows["p50"] == 2 and rows["p90"] == 3 and rows["p99"] == 3


def test_hdr_partitioning_invariance(spark):
    df = spark.range(0, 3000).select(
        (F.col("id") % 997 + 1).alias("x"),
        (F.col("id") % 4).cast("string").alias("g"))
    a = sorted(tuple(r) for r in hdr_quantiles(df, ["g"], "x").collect())
    b = sorted(tuple(r) for r in
               hdr_quantiles(df.repartition(23), ["g"], "x").collect())
    assert a == b


# ---------------------------------------------------------------- CMS

def _py_cms_col(value, r):
    h = hashlib.md5(f"cms{r}|{value}".encode()).hexdigest()
    return int(h[0:15], 16) % 2048


def test_cms_table_matches_python_twin(spark):
    from yatsm_spark.operators.sketches import CMS_DEPTH, cms_table
    vals = [f"v{i % 40}" for i in range(400)]
    df = spark.createDataFrame([(v, "g") for v in vals], "v string, g string")
    got = {(r.r, r.c): r.cnt for r in cms_table(df, ["g"], "v").collect()}
    want = {}
    for v in vals:
        for r in range(CMS_DEPTH):
            k = (r, _py_cms_col(v, r))
            want[k] = want.get(k, 0) + 1
    assert got == want


def test_cms_estimate_never_underestimates(spark):
    from yatsm_spark.operators.sketches import cms_estimate
    rng = np.random.RandomState(3)
    vals = [f"w{int(x)}" for x in rng.zipf(1.5, size=4000) % 500]
    true = {}
    for v in vals:
        true[v] = true.get(v, 0) + 1
    df = spark.createDataFrame([(v, "g") for v in vals], "v string, g string")
    items = spark.createDataFrame([("g", v) for v in true],
                                  "g string, v string")
    est = {r.v: r.est_count
           for r in cms_estimate(df, ["g"], "v", items).collect()}
    n = len(vals)
    for v, t in true.items():
        assert est[v] >= t  # one-sided by construction
        assert est[v] <= t + 0.02 * n  # eps = e/w ~ 0.13%, loose 2% bound


def test_cms_estimate_missing_item_is_bounded(spark):
    from yatsm_spark.operators.sketches import cms_estimate
    df = spark.createDataFrame([(f"a{i}", "g") for i in range(1000)],
                               "v string, g string")
    items = spark.createDataFrame([("g", "never-seen")], "g string, v string")
    est = cms_estimate(df, ["g"], "v", items).collect()[0].est_count
    assert 0 <= est <= 20  # collisions only


def test_heavy_hitters_exact_vs_bruteforce(spark):
    from yatsm_spark.operators.sketches import heavy_hitters
    rng = np.random.RandomState(11)
    vals = ([f"hot{i % 3}" for i in range(900)]
            + [f"cold{int(x)}" for x in rng.randint(0, 800, size=2100)])
    df = spark.createDataFrame([(v, str(i % 2)) for i, v in enumerate(vals)],
                               "v string, g string")
    got = sorted((r.g, r.v, r.cnt)
                 for r in heavy_hitters(df, ["g"], "v", 100).collect())
    want = sorted((r.g, r.v, r.cnt) for r in
                  df.groupBy("g", "v").count()
                    .withColumnRenamed("count", "cnt")
                    .filter(F.col("cnt") >= 100).collect())
    assert got == want and len(got) > 0


def test_heavy_hitters_partitioning_invariance(spark):
    from yatsm_spark.operators.sketches import heavy_hitters
    df = spark.range(0, 3000).select(
        F.concat(F.lit("k"), (F.col("id") % 7)).alias("v"),
        (F.col("id") % 2).cast("string").alias("g"))
    a = sorted(tuple(r) for r in heavy_hitters(df, ["g"], "v", 150).collect())
    b = sorted(tuple(r) for r in
               heavy_hitters(df.repartition(19), ["g"], "v", 150).collect())
    assert a == b and len(a) == 14


def test_heavy_hitters_prefilter_paths_identical(spark):
    # r6: the prefilter decision ("auto"/"always"/"never") picks a physical
    # plan only — all three must return the identical exact result, on a
    # mix of heavy and light values.
    from yatsm_spark.operators.sketches import heavy_hitters
    vals = [f"h{i % 3}" for i in range(900)] + [f"u{i}" for i in range(400)]
    df = spark.createDataFrame([(v, str(i % 2)) for i, v in enumerate(vals)],
                               "v string, g string")
    outs = [sorted(tuple(r) for r in
                   heavy_hitters(df, ["g"], "v", 100, prefilter=p).collect())
            for p in ("auto", "always", "never")]
    assert outs[0] == outs[1] == outs[2] and len(outs[0]) == 6


def test_sum128_matches_decimal_sums(spark):
    # r6: hi/lo split sums must equal a decimal(38,0)-operand sum exactly,
    # including negatives, zero, and near-int64-boundary terms.
    from yatsm_spark.operators.tsfuncs import sum128

    rows = [(1, 9_223_372_036_854_775_000), (1, -9_223_372_036_854_775_000),
            (1, 123_456_789_012_345_678), (1, -1), (1, 0), (1, 7),
            (2, 2**62), (2, 2**62 - 1), (2, -(2**61)), (2, 3)]
    df = spark.createDataFrame(rows, "g int, x long")
    aggs, rebuild = sum128({"_s": F.col("x")})
    got = {r.g: r._s for r in
           df.groupBy("g").agg(*aggs).select("g", *rebuild).collect()}
    want = {r.g: r.s for r in
            df.groupBy("g")
              .agg(F.sum(F.col("x").cast("decimal(38,0)")).alias("s"))
              .collect()}
    assert got == want
