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

from pyspark.sql import functions as F

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


GOPHER_DOCS = pd.DataFrame({
    "doc_id": list(range(7)),
    "text": [
        # passes every rule (>=5 words, sane shape, stop words present)
        "the cat and the dog have played with that ball of yarn",
        # bullet-heavy: every line starts with a bullet marker
        "- first item\n* second item\n  • third item",
        # ellipsis-heavy lines (both ASCII and typographic)
        "trailing off...\nagain…\nand more...",
        # symbol soup: '#' dominates the word count
        "## ### # tags # everywhere #",
        # numeric words: fails the >=80% alphabetic-word rule
        "1 2 3 4 5 6 7 8 9 10",
        # empty text: zero words, one line, no stops
        "",
        # too few words for min_words=5
        "tiny doc here",
    ],
})


def test_gopher_rules_hand_computed(spark):
    from yatsm_spark.operators.textstats import gopher_rules

    sdf = spark.createDataFrame(GOPHER_DOCS)
    got = {r["doc_id"]: r.asDict()
           for r in gopher_rules(sdf, min_words=5).collect()}

    assert got[0]["gopher_keep"] is True
    assert got[0]["g_n_stopwords"] >= 2

    # bullets: 3/3 lines start with a bullet -> fraction 1.0 > 0.9 -> drop
    assert got[1]["g_bullet_frac"] == 1.0
    assert got[1]["gopher_keep"] is False

    # ellipses: 3/3 lines end with one (incl. '…') -> 1.0 > 0.3 -> drop
    assert got[2]["g_ellipsis_frac"] == 1.0
    assert got[2]["gopher_keep"] is False

    # '#' count / n_words = 6/7 > 0.1 -> drop
    assert got[3]["g_symbol_ratio"] > 0.1
    assert got[3]["gopher_keep"] is False

    # 0/10 words contain a letter -> alpha fraction 0.0 < 0.8 -> drop
    assert got[4]["g_alpha_word_frac"] == 0.0
    assert got[4]["gopher_keep"] is False

    # empty text: 0 words, 1 line, no crash, drop
    assert got[5]["g_n_words"] == 0
    assert got[5]["gopher_keep"] is False

    # 3 words < min_words=5 -> drop even though otherwise clean
    assert got[6]["g_n_words"] == 3
    assert got[6]["gopher_keep"] is False


def test_gopher_rules_match_oracle_on_hostile_and_shaped_text(spark):
    docs = pd.concat([HOSTILE_DOCS, GOPHER_DOCS.assign(doc_id=GOPHER_DOCS.doc_id + 100)],
                     ignore_index=True)
    from yatsm_spark.operators.textstats import gopher_rules

    sdf = spark.createDataFrame(docs)
    con = duckdb.connect()
    con.register("documents", docs)
    _assert_engines_agree(gopher_rules(sdf, min_words=5, min_stops=1),
                          con, _oracle("gopher_rules"))


def test_c4_clean_line_rules_hand_computed(spark):
    from yatsm_spark.operators.textstats import c4_clean

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [
            # 3 kept lines -> page kept
            "This is a proper sentence one.\n"
            "Here is another full sentence!\n"
            "And a third one with enough words?\n"
            "too short.\n"
            "no terminal punctuation on this line\n"
            "This line talks about JavaScript libraries today.",
            # lorem ipsum page flag vetoes an otherwise-clean page
            "Lorem ipsum dolor sit amet sentence.\n"
            "Another perfectly fine long sentence here.\n"
            "And one more good sentence to pass!",
            # curly brace page flag (code)
            "A clean sentence with many words inside.\n"
            "function f() { return 1; }\n"
            "Another clean long sentence right here.\n"
            "Third clean long sentence goes here too.",
        ],
    })
    out = {r["doc_id"]: r for r in
           c4_clean(spark.createDataFrame(docs)).collect()}

    r = out[0]
    assert r["n_lines"] == 6 and r["n_kept_lines"] == 3
    assert r["c4_keep"] is True
    assert r["clean_text"] == (
        "This is a proper sentence one.\n"
        "Here is another full sentence!\n"
        "And a third one with enough words?")

    assert out[1]["has_lorem_ipsum"] is True
    assert out[1]["c4_keep"] is False
    assert out[1]["n_kept_lines"] == 3  # line rules alone would keep it

    assert out[2]["has_curly_brace"] is True
    assert out[2]["c4_keep"] is False


def test_c4_clean_trailing_spaces_and_quote_terminal(spark):
    from yatsm_spark.operators.textstats import c4_clean

    docs = pd.DataFrame({
        "doc_id": [0],
        "text": ['He said "this is a quote."  \n'
                 'A sentence with trailing spaces after the period.   \n'
                 'Exactly five words right here.'],
    })
    r = c4_clean(spark.createDataFrame(docs)).collect()[0]
    # rtrim before the terminal check; closing quote is a terminal
    assert r["n_kept_lines"] == 3


def test_c4_clean_match_oracle_on_hostile_text(spark):
    from yatsm_spark.operators.textstats import c4_clean

    docs = pd.concat([HOSTILE_DOCS, GOPHER_DOCS.assign(doc_id=GOPHER_DOCS.doc_id + 100)],
                     ignore_index=True)
    sdf = spark.createDataFrame(docs)
    con = duckdb.connect()
    con.register("documents", docs)
    # the driver oracle wraps the composed-input CTE; replay it verbatim
    _assert_engines_agree(
        c4_clean(sdf.select(
            "doc_id",
            F.concat(F.col("text"), F.lit(".\n"),
                     F.substring(F.col("text"), 1, 20), F.lit(".\n"),
                     F.lit("Short line\n"
                           "This line mentions javascript and is dropped.\n"),
                     F.col("text"), F.lit("!")).alias("text"))),
        con, _oracle("c4_clean"))


def test_c4_clean_is_idempotent_on_clean_text(spark):
    """Kept lines individually satisfy every line rule, so re-cleaning
    the cleaned text keeps all of them byte-for-byte."""
    from yatsm_spark.operators.textstats import c4_clean

    docs = pd.DataFrame({
        "doc_id": [0, 1],
        "text": [
            "Good long sentence number one right here.\n"
            "tiny\n"
            "Another good long sentence lives here too!\n"
            "unterminated line with plenty of words inside",
            "One proper sentence with enough words inside.\n"
            "Second proper sentence with enough words also?",
        ],
    })
    once = c4_clean(spark.createDataFrame(docs)).collect()
    again = {r["doc_id"]: r for r in c4_clean(spark.createDataFrame(
        pd.DataFrame({"doc_id": [r["doc_id"] for r in once],
                      "text": [r["clean_text"] for r in once]}))).collect()}
    for r in once:
        assert again[r["doc_id"]]["clean_text"] == r["clean_text"]
        assert again[r["doc_id"]]["n_kept_lines"] == r["n_kept_lines"]
