"""End-to-end curation decision table: one corpus exercising every
stage (holdout split, quality, exact dup, near dup, contamination), each
doc's flags hand-derived."""

import pytest
from pyspark.sql import functions as F

from yatsm_spark.operators.curate import curate_corpus
from yatsm_spark.operators.sampling import _KNUTH, _MOD

RATE = 0.5


def _in_bench(i: int) -> bool:
    return (i * _KNUTH) % _MOD < int(RATE * _MOD)


@pytest.fixture(scope="module")
def corpus(spark):
    ids = list(range(50))
    bench_ids = [i for i in ids if _in_bench(i)]
    train_ids = [i for i in ids if not _in_bench(i)]
    assert len(bench_ids) >= 1 and len(train_ids) >= 6
    b0, t = bench_ids[0], sorted(train_ids)[:6]
    rows = [
        (b0, "sacred eval phrase alpha beta gamma delta", "s0"),
        (t[0], "totally fine document with many plain words here", "s0"),
        (t[1], "x y", "s0"),                                  # quality drop
        (t[2], "duplicated text body with sufficient words inside", "s0"),
        (t[3], "duplicated text body with sufficient words inside", "s0"),
        (t[4], "totally fine document with many plain words here extra", "s0"),
        (t[5], "contains sacred eval phrase alpha plus harmless words", "s0"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    return b0, t, df


def test_curate_stage_flags(corpus):
    b0, t, df = corpus
    got = {r.doc_id: r for r in
           curate_corpus(df, bench_rate=RATE).collect()}
    assert set(got) == {b0, *t}

    # bench doc: out of train entirely
    r = got[b0]
    assert not r.in_train and not r.quality_keep and not r.kept

    # clean doc survives everything
    r = got[t[0]]
    assert r.in_train and r.quality_keep and r.exact_kept \
        and r.neardup_kept and r.n_contaminated_ngrams == 0 and r.kept

    # two-word doc dies at quality
    r = got[t[1]]
    assert r.in_train and not r.quality_keep and not r.exact_kept \
        and not r.kept

    # exact dups: lower id kept, higher dropped at stage 3
    assert got[t[2]].exact_kept and got[t[2]].kept
    r = got[t[3]]
    assert r.quality_keep and not r.exact_kept and not r.neardup_kept \
        and not r.kept

    # near-dup of t[0]: unique text (exact_kept) but loses the
    # component-min race
    r = got[t[4]]
    assert r.exact_kept and not r.neardup_kept and not r.kept

    # contaminated: survives dedup, shares "sacred eval phrase" +
    # "eval phrase alpha" with the bench doc
    r = got[t[5]]
    assert r.neardup_kept and r.n_contaminated_ngrams == 2 and not r.kept


def test_curate_kept_set_is_consistent(corpus):
    _, t, df = corpus
    out = curate_corpus(df, bench_rate=RATE)
    kept = {r.doc_id for r in out.filter("kept").collect()}
    assert kept == {t[0], t[2]}
    # flags are cumulative: kept => neardup => exact => quality => train
    bad = out.filter(
        (F.col("kept") & ~F.col("neardup_kept"))
        | (F.col("neardup_kept") & ~F.col("exact_kept"))
        | (F.col("exact_kept") & ~F.col("quality_keep"))
        | (F.col("quality_keep") & ~F.col("in_train"))).count()
    assert bad == 0


def test_datamix_report_hand_computed(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from yatsm_spark.operators.curate import datamix_report

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "the cat and the dog have played with that ball",  # clean
            "the cat and the dog have played with that ball",  # exact dup
            "x",                                               # junk
            "another clean document with the usual words in it",
        ],
        "lang": ["en"] * 4,
        "source": ["a", "a", "a", "b"],
        "n_chars": [0] * 4,
    })
    out = {r["source"]: r for r in
           datamix_report(spark.createDataFrame(docs)).collect()}

    a, b = out["a"], out["b"]
    assert a["n_docs"] == 3 and b["n_docs"] == 1
    # docs 0 and 1 are byte-identical -> both flagged dup
    assert a["dup_rate"] == round(2 / 3, 6)
    assert b["dup_rate"] == 0.0
    # 'x' fails the quality battery; the two clean docs pass
    assert a["quality_rate"] == round(2 / 3, 6)
    assert a["n_tokens"] == 10 + 10 + 1
    # lm average is a real negative logprob over a's tokens
    assert a["lm_avg_logprob"] < 0
