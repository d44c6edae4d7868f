"""Merge-table BPE: kernel goldens + properties, operator parity on Spark.

The driver oracle (bpe_merges / bpe_token_counts) re-derives training in a
DuckDB recursive CTE; here the kernel is pinned against a NAIVE
reimplementation (full pair-count recompute per merge) so the incremental
bookkeeping in train_bpe can never drift, plus the classic invariants."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from yatsm_spark.kernel.bpe import _merge_word, apply_bpe, ranks_of, train_bpe


def naive_train(word_counts, n_merges, min_count=2):
    """Reference trainer: recompute every pair count from scratch each
    merge. O(n_merges x corpus) — test-only."""
    words = {w: tuple(w) for w in word_counts if w}
    merges = []
    while len(merges) < n_merges:
        pc = {}
        for w, sym in words.items():
            c = word_counts[w]
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pc[p] = pc.get(p, 0) + c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pc[best] < min_count:
            break
        merges.append(best)
        words = {w: _merge_word(s, *best) for w, s in words.items()}
    return merges


def test_golden_tiny_corpus():
    corpus = {"low": 5, "lower": 2, "newest": 6, "widest": 3,
              "low west": 2, "aaa": 4}
    merges = train_bpe(corpus, n_merges=10)
    assert merges == [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"),
                      ("a", "a"), ("w", "est"), ("e", "west"),
                      ("n", "ewest"), ("aa", "a"), ("d", "est")]
    ranks = ranks_of(merges)
    assert apply_bpe("lower", ranks) == ["low", "e", "r"]
    assert apply_bpe("aaa", ranks) == ["aaa"]
    assert apply_bpe("low west", ranks) == ["low", " ", "west"]
    # OOV word: only applicable merges fire
    assert apply_bpe("lowest", ranks) == ["low", "est"]


def test_overlap_counts_and_merge():
    # 'aaaa': pair (a,a) counts 3 positions; one merge pass gives (aa, aa)
    merges = train_bpe({"aaaa": 1, "b": 9}, n_merges=1, min_count=2)
    assert merges == [("a", "a")]
    assert _merge_word(tuple("aaaa"), "a", "a") == ("aa", "aa")
    assert _merge_word(tuple("aaa"), "a", "a") == ("aa", "a")


def test_min_count_stops_training():
    # every pair unique -> nothing reaches min_count=2
    assert train_bpe({"abc": 1, "def": 1}, n_merges=5) == []


@st.composite
def corpora(draw):
    n = draw(st.integers(1, 12))
    words = draw(st.lists(
        st.text(alphabet="abcde f", min_size=1, max_size=8),
        min_size=n, max_size=n, unique=True))
    counts = draw(st.lists(st.integers(1, 9), min_size=n, max_size=n))
    return dict(zip(words, counts))


@settings(max_examples=150, deadline=None)
@given(corpora(), st.integers(0, 20))
def test_incremental_matches_naive(corpus, n_merges):
    assert train_bpe(corpus, n_merges) == naive_train(corpus, n_merges)


@settings(max_examples=150, deadline=None)
@given(corpora(), st.integers(0, 20))
def test_apply_roundtrip_and_training_consistency(corpus, n_merges):
    merges = train_bpe(corpus, n_merges)
    ranks = ranks_of(merges)
    vocab = set("".join(corpus)) | {l + r for l, r in merges}
    for w in corpus:
        toks = apply_bpe(w, ranks)
        assert "".join(toks) == w                      # lossless
        assert all(t in vocab for t in toks)           # closed vocabulary
    # apply in rank order per word == training-time segmentation
    seg = {w: tuple(w) for w in corpus}
    for l, r in merges:
        seg = {w: _merge_word(s, l, r) for w, s in seg.items()}
    for w in corpus:
        assert tuple(apply_bpe(w, ranks)) == seg[w]


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "the cat ate the rat"),
        (2, "a cat and a rat and a mat"),
        (3, "the the the cat cat"),
        (4, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_spark_merges_match_kernel(docs, spark):
    from yatsm_spark.operators.bpe import bpe_merges, bpe_train, word_counts

    wc = {r["word"]: r["cnt"] for r in word_counts(docs).collect()}
    expect = train_bpe(wc, n_merges=16)
    got = [(r["left"], r["right"]) for r in
           bpe_merges(docs, n_merges=16).orderBy("rank").collect()]
    assert got == expect


def test_spark_token_counts_match_local(docs, spark):
    import re

    from yatsm_spark.operators.bpe import bpe_token_counts, bpe_train
    from yatsm_spark.operators.textstats import BPE_REGEX

    merges = bpe_train(docs, n_merges=16)
    ranks = ranks_of(merges)
    # local replay with python regex (dialect note: BPE_REGEX uses \p{L}
    # via regex-module-free classes? it uses \p{L} — java/RE2 syntax; for
    # this ascii corpus, a simple ascii equivalent suffices)
    pat = re.compile(r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+"
                     r"| ?[^ \t\n\x0b\f\rA-Za-z0-9]+|[ \t\n\x0b\f\r]+")
    got = {r["doc_id"]: (r["n_pretokens"], r["n_bpe_real"])
           for r in bpe_token_counts(docs, n_merges=16).collect()}
    for doc_id, text in docs.collect():
        words = pat.findall(text)
        if not words:
            assert doc_id not in got  # no pretokens -> no row (explode)
            continue
        n_bpe = sum(len(apply_bpe(w, ranks)) for w in words)
        assert got[doc_id] == (len(words), n_bpe)


def test_train_cap_raises(docs):
    from yatsm_spark.operators.bpe import bpe_train

    with pytest.raises(RuntimeError, match="max_words"):
        bpe_train(docs, max_words=2)


def test_tokenize_positions(docs, spark):
    from yatsm_spark.operators.bpe import bpe_tokenize, bpe_train

    merges = bpe_train(docs, n_merges=16)
    out = bpe_tokenize(docs, merges)
    rows = out.where("doc_id = 0").orderBy("pos").collect()
    # reassembling tokens in pretoken order reproduces the document
    assert "".join("".join(r["tokens"]) for r in rows) == \
        "the cat sat on the mat"
