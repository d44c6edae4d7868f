"""Dedup / ANN operator invariants that the driver oracles can't see:
degenerate-bucket caps (the 100 TB quadratic-blowup guard) and Jaccard
cap-consistency (sizes and intersections on the same shingle universe)."""

import pytest
from pyspark.sql import Row, functions as F

from yatsm_spark.operators.dedup import (
    minhash_candidates,
    ngram_jaccard_pairs,
    word_shingles,
)
from yatsm_spark.operators.similarity import lsh_candidate_pairs


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def test_minhash_degenerate_band_is_capped(spark):
    # 40 byte-identical docs share every band -> one degenerate band bucket.
    # With the cap below the bucket size, NO pair among them is emitted;
    # a small distinct near-dup pair elsewhere still pairs normally.
    boiler = [(i, "the same boilerplate footer text repeated everywhere") for i in range(40)]
    pair = [(100, "alpha beta gamma delta epsilon zeta eta theta"),
            (101, "alpha beta gamma delta epsilon zeta eta iota")]
    docs = _docs(spark, boiler + pair)
    capped = minhash_candidates(docs, max_band_size=10).collect()
    ids = {(r.doc_a, r.doc_b) for r in capped}
    assert all(a >= 100 and b >= 100 for a, b in ids), ids
    # sanity: uncapped, the boilerplate group alone yields C(40,2)=780 pairs
    uncapped = minhash_candidates(docs, max_band_size=10_000).count()
    assert uncapped >= 780


def test_lsh_degenerate_bucket_is_capped(spark):
    # 30 identical embeddings land in one bucket; cap 10 drops it entirely.
    same = [Row(vec_id=i, embedding=[1.0, 2.0, 3.0, 4.0]) for i in range(30)]
    other = [Row(vec_id=100, embedding=[-1.0, 5.0, -3.0, 2.0]),
             Row(vec_id=101, embedding=[-1.0, 5.1, -3.0, 2.0])]
    emb = spark.createDataFrame(same + other)
    capped = lsh_candidate_pairs(emb, n_planes=8, max_bucket_size=10).collect()
    assert all(r.id_a >= 100 and r.id_b >= 100 for r in capped), capped
    uncapped = lsh_candidate_pairs(emb, n_planes=8, max_bucket_size=10_000).count()
    assert uncapped >= 30 * 29 // 2


def test_jaccard_sizes_use_capped_universe(spark):
    # One stop-shingle ("x y z") appears in every doc and is dropped by the
    # cap; J must be the exact Jaccard of the CAPPED shingle sets, which is
    # recomputed here from word_shingles + the same cap.
    rows = [
        (0, "x y z a b c d e"),
        (1, "x y z a b c d f"),
        (2, "x y z q r s t u"),
        (3, "x y z q r s t v"),
    ]
    docs = _docs(spark, rows)
    cap = 3  # "x y z" has df=4 > 3 -> dropped
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.0,
                                     max_shingle_freq=cap).collect()
    }
    # expected: exact Jaccard over capped sets, computed independently
    sh = word_shingles(docs).collect()
    sets = {}
    for r in sh:
        sets.setdefault(r.doc_id, set()).add(r.shingle)
    df = {}
    for s in sets.values():
        for g in s:
            df[g] = df.get(g, 0) + 1
    capped = {d: {g for g in s if df[g] <= cap} for d, s in sets.items()}
    for (a, b), j in got.items():
        inter = len(capped[a] & capped[b])
        union = len(capped[a] | capped[b])
        assert j == pytest.approx(inter / union, abs=1e-6), (a, b)
    # the pairs sharing only the stop-shingle must NOT appear at all
    assert (0, 2) not in got and (1, 3) not in got
