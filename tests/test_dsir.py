"""DSIR importance resampling (operators/dsir.py): weight direction,
degenerate docs, and the deterministic rank-cut selection. Cross-engine
exactness at sf0.01 is pinned by the driver rows dsir_weights /
dsir_select; these pin semantics the corpus can't isolate."""

import pandas as pd
import pytest

from pyspark.sql import functions as F

from yatsm_spark.operators.dsir import dsir_select, dsir_weights


def _docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"]))


def test_weights_favor_target_vocabulary(spark):
    # target docs speak 'alpha', source-only docs speak 'beta'
    rows = (
        [(i, "alpha alpha common words here", "en") for i in range(4)]
        + [(10 + i, "beta beta common words here", "xx") for i in range(4)]
        + [(20, "alpha alpha common words here", "xx")]  # target-like raw doc
    )
    w = {r["doc_id"]: r for r in
         dsir_weights(_docs(spark, rows), target=F.col("lang") == "en")
         .collect()}
    # a raw doc with target vocabulary outranks one with source-only vocab
    assert w[20]["logw_micro"] > w[10]["logw_micro"]
    # identical text => identical weight regardless of its own label
    assert w[20]["logw_micro"] == w[0]["logw_micro"]


def test_weights_empty_doc_is_zero(spark):
    rows = [(0, "alpha beta", "en"), (1, "", "xx"), (2, " \t\n ", "xx")]
    w = {r["doc_id"]: r for r in
         dsir_weights(_docs(spark, rows), target=F.col("lang") == "en")
         .collect()}
    for d in (1, 2):
        assert w[d]["n_feats"] == 0
        assert w[d]["logw_micro"] == 0
        assert w[d]["logw_per_feat"] is None


def test_select_rank_cut_and_parallelism_invariance(spark):
    rows = ([(i, "alpha alpha good text", "en") for i in range(3)]
            + [(10 + i, "beta beta junk text", "xx") for i in range(5)])
    w = dsir_weights(_docs(spark, rows), target=F.col("lang") == "en")
    sel = {r["doc_id"]: r for r in dsir_select(w, k=3).collect()}

    expected = sorted(((-r["logw_micro"], r["doc_id"]) for r in w.collect()))
    for rank, (_, doc_id) in enumerate(expected, start=1):
        assert sel[doc_id]["dsir_rank"] == rank
        assert sel[doc_id]["kept"] == (rank <= 3)

    # rank assignment is independent of the range-partition count
    sel5 = {r["doc_id"]: r["dsir_rank"]
            for r in dsir_select(w, k=3, n_parts=5).collect()}
    assert sel5 == {d: r["dsir_rank"] for d, r in sel.items()}
