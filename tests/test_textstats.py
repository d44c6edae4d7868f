"""Cross-engine whitespace-class regression (round-3 ADVICE): Java's \\s
includes U+000B while RE2's does not, so every textstats/dedup pattern
spells the class out. These tests run the REAL driver oracle SQL strings
(DuckDB/RE2) against the REAL operators (Spark/Java regex) on hostile
text — vertical tabs, multi-space runs, contractions, unicode — and
require exact agreement, which the old \\s patterns could not deliver.
"""

import os
import sys

import duckdb
import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HOSTILE_DOCS = pd.DataFrame({
    "doc_id": list(range(6)),
    "text": [
        "plain words here",
        "vertical\x0btab\x0b separated",          # the Java-vs-RE2 \s gap
        "multi   space    runs",                   # GPT-2 lookahead caveat
        "it's we're I'll don't",                   # contraction branch
        "naïve café 42 αβγ ١٢٣",                  # unicode letters/digits
        " \t\n\x0b\f\r mixed\x0bws ",              # every class member
    ],
})


def _oracle(name: str) -> str:
    import __spark_entry__ as e

    return e.oracle_sql()[name]


@pytest.fixture(scope="module")
def hostile(spark):
    sdf = spark.createDataFrame(HOSTILE_DOCS)
    con = duckdb.connect()
    con.register("documents", HOSTILE_DOCS)
    return sdf, con


def _assert_engines_agree(spark_df, con, sql, key="doc_id"):
    got = spark_df.toPandas().sort_values(key).reset_index(drop=True)
    want = con.execute(sql).df().sort_values(key).reset_index(drop=True)
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(
        got.astype({c: "float64" for c in got.columns if c != "text"},
                   errors="ignore"),
        want.astype({c: "float64" for c in want.columns if c != "text"},
                    errors="ignore"),
        check_dtype=False, check_exact=False, rtol=0, atol=1e-12)


def test_token_counts_match_oracle_on_vertical_tab(hostile):
    from yatsm_spark.operators.textstats import token_counts

    sdf, con = hostile
    _assert_engines_agree(token_counts(sdf), con, _oracle("token_counts"))


def test_quality_scores_match_oracle_on_vertical_tab(hostile):
    from yatsm_spark.operators.textstats import quality_scores

    sdf, con = hostile
    _assert_engines_agree(quality_scores(sdf), con, _oracle("quality"))


def test_simhash_matches_oracle_on_vertical_tab(hostile):
    # simhash normalizes via the shared explicit-class _NORM before word
    # splitting — \x0B must collapse identically in both engines.
    from yatsm_spark.operators.dedup import simhash16

    sdf, con = hostile
    _assert_engines_agree(simhash16(sdf), con, _oracle("simhash"))


def test_lm_unigram_score_hand_computed(spark):
    """counts: a=2 b=2 c=1 over total 5 -> doc0 avg = ln(0.4) exactly,
    doc1 = mean(ln 0.4, ln 0.2); empty doc -> 0 tokens, NULL score."""
    import math

    from yatsm_spark.operators.textstats import lm_unigram_score

    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "b c"), (2, "")], "doc_id long, text string")
    got = {r.doc_id: r for r in lm_unigram_score(docs).collect()}
    assert got[0].n_tokens == 3 and got[1].n_tokens == 2
    assert got[0].avg_logprob == pytest.approx(math.log(0.4), abs=2e-6)
    assert got[1].avg_logprob == pytest.approx(
        (math.log(0.4) + math.log(0.2)) / 2, abs=2e-6)
    assert got[2].n_tokens == 0 and got[2].avg_logprob is None


def test_lm_unigram_score_rare_vocab_scores_lower(spark):
    from yatsm_spark.operators.textstats import lm_unigram_score

    docs = spark.createDataFrame(
        [(i, "the common words appear everywhere") for i in range(9)]
        + [(9, "zxqv jkwp mmzt unique gibberish")],
        "doc_id long, text string")
    got = {r.doc_id: r.avg_logprob for r in lm_unigram_score(docs).collect()}
    assert got[9] < got[0]  # rare vocabulary -> more negative score
