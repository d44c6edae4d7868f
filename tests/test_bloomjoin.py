"""Bloom-filter semi-join pruning: exactness (no false negatives — the
pruned join equals the plain join) and effectiveness (false positives
actually bounded, so the filter prunes)."""

import pytest
from pyspark.sql import functions as F

from yatsm_spark.operators.bloomjoin import (
    bloom_bitmap,
    bloom_join,
    bloom_prune,
)


def _tables(spark):
    # fact: 20k rows keyed 0..1999; dim: 40 selective keys (2% match)
    fact = spark.range(20_000).select(
        (F.col("id") % 2000).alias("k"), F.col("id").alias("row_id"))
    dim = spark.range(40).select(
        (F.col("id") * 50).alias("dk"), F.lit("d").alias("tag"))
    return fact, dim


def test_bloom_join_equals_plain_join(spark):
    fact, dim = _tables(spark)
    got = (bloom_join(fact, dim, "k", "dk", n_bits=1 << 14)
           .select("row_id", "dk").orderBy("row_id").collect())
    want = (fact.join(dim, fact.k == dim.dk)
                .select("row_id", "dk").orderBy("row_id").collect())
    assert got == want
    assert len(got) == 40 * 10  # each dim key matches 10 fact rows


def test_prune_keeps_all_matches_and_drops_most_nonmatches(spark):
    fact, dim = _tables(spark)
    bm = bloom_bitmap(dim, "dk", n_bits=1 << 14)
    kept = bloom_prune(fact, bm, "k", n_bits=1 << 14)
    kept_keys = {r.k for r in kept.select("k").distinct().collect()}
    true_keys = {r.dk for r in dim.collect()}
    assert true_keys <= kept_keys  # one-sided: every real match survives
    # 40 true keys of 2000; fp rate at 14 bits / 200 positions is tiny —
    # allow generous slack while still proving the filter filters.
    assert len(kept_keys) < 100
    assert kept.count() < fact.count() // 10


def test_prune_output_schema_unchanged(spark):
    fact, dim = _tables(spark)
    bm = bloom_bitmap(dim, "dk", n_bits=1 << 14)
    assert bloom_prune(fact, bm, "k", n_bits=1 << 14).columns == fact.columns


def test_empty_dim_prunes_everything(spark):
    fact, dim = _tables(spark)
    bm = bloom_bitmap(dim.filter(F.lit(False)), "dk", n_bits=1 << 14)
    assert bloom_prune(fact, bm, "k", n_bits=1 << 14).count() == 0


def test_null_fact_keys_are_pruned(spark):
    _, dim = _tables(spark)
    fact = spark.createDataFrame(
        [(None, 1), (0, 2)], "k long, row_id long")
    bm = bloom_bitmap(dim, "dk", n_bits=1 << 14)
    rows = bloom_prune(fact, bm, "k", n_bits=1 << 14).collect()
    assert [r.row_id for r in rows] == [2]


def test_string_keys_work(spark):
    fact = spark.createDataFrame(
        [(f"c{i % 50}", i) for i in range(500)], "k string, row_id long")
    dim = spark.createDataFrame(
        [(f"c{i}",) for i in range(5)], "dk string")
    got = (bloom_join(fact, dim, "k", "dk", n_bits=1 << 12)
           .count())
    assert got == fact.join(dim, fact.k == dim.dk).count() == 50


def test_bitmap_is_bounded_and_parallelism_invariant(spark):
    _, dim = _tables(spark)
    n_bits = 1 << 12
    a = bloom_bitmap(dim, "dk", n_bits).orderBy("word").collect()
    b = (bloom_bitmap(dim.repartition(13), "dk", n_bits)
         .orderBy("word").collect())
    assert a == b  # BIT_OR merge is order/partitioning-independent
    assert len(a) <= n_bits // 64


def test_validation(spark):
    _, dim = _tables(spark)
    with pytest.raises(ValueError):
        bloom_bitmap(dim, "dk", n_bits=100)  # not a power of two
    with pytest.raises(ValueError):
        bloom_bitmap(dim, "dk", n_bits=1 << 12, n_hashes=0)
