"""Product quantization: training convergence, encode determinism, ADC
retrieval quality vs exact search, and the contract edges.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from yatsm_spark.kernel.pq_core import (
    pq_adc_core,
    pq_encode_core,
    pq_lut,
    pq_train_core,
)
from yatsm_spark.operators.pq import pq_adc_topk, pq_encode, pq_train


def _clustered_vectors(n=400, d=16, n_clusters=8, noise=0.05, seed=3):
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, d) * 2.0
    labels = rng.randint(0, n_clusters, n)
    return centers[labels] + noise * rng.randn(n, d)


def _df(spark, V):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(V)],
        "vec_id long, embedding array<float>")


def test_training_reduces_quantization_error():
    V = _clustered_vectors()
    def err(books):
        codes = pq_encode_core(V, books)
        m, ksub, dsub = books.shape
        tot = 0.0
        for s in range(m):
            diff = V[:, s * dsub:(s + 1) * dsub] - books[s][codes[:, s]]
            tot += float((diff ** 2).sum())
        return tot
    e1 = err(pq_train_core(V, m=4, ksub=8, n_iters=1))
    e5 = err(pq_train_core(V, m=4, ksub=8, n_iters=5))
    assert e5 <= e1
    assert e5 < 0.5 * float(((V - V.mean(axis=0)) ** 2).sum())


def test_spark_encode_matches_kernel_and_is_partition_invariant(spark):
    V = _clustered_vectors(n=300)
    df = _df(spark, V)
    books = pq_train(df, m=4, ksub=8, n_iters=3)
    got = {r.vec_id: tuple(r.code)
           for r in pq_encode(df, books).collect()}
    # what Spark stored as float32 is what the kernel must see
    back = np.stack([np.asarray(r.embedding, dtype=np.float64)
                     for r in df.orderBy("vec_id").collect()])
    want = pq_encode_core(back, books)
    assert got == {i: tuple(int(c) for c in want[i]) for i in range(len(V))}
    got2 = {r.vec_id: tuple(r.code)
            for r in pq_encode(df.repartition(13), books).collect()}
    assert got == got2


def test_adc_recall_against_exact_search(spark):
    # clustered data: ADC top-10 should recover most of the exact top-10
    V = _clustered_vectors(n=500, d=16, seed=11)
    df = _df(spark, V)
    books = pq_train(df, m=8, ksub=16, n_iters=5)
    back = np.stack([np.asarray(r.embedding, dtype=np.float64)
                     for r in df.orderBy("vec_id").collect()])
    got = pq_adc_topk(df, books, query_ids=[0, 1, 2], k=10).collect()
    recalls = []
    for q in [0, 1, 2]:
        d2 = ((back - back[q]) ** 2).sum(axis=1)
        d2[q] = np.inf
        exact = set(np.argsort(d2, kind="stable")[:10].tolist())
        adc = {r.neighbor_id for r in got if r.query_id == q}
        recalls.append(len(exact & adc) / 10)
    assert np.mean(recalls) >= 0.5  # compressed-domain, clustered data


def test_adc_reuses_stored_codes_identically(spark):
    V = _clustered_vectors(n=200)
    df = _df(spark, V)
    books = pq_train(df, m=4, ksub=8, n_iters=2)
    codes = pq_encode(df, books)
    a = sorted(tuple(r) for r in
               pq_adc_topk(df, books, [0, 5], k=4).collect())
    b = sorted(tuple(r) for r in
               pq_adc_topk(df, books, [0, 5], k=4, codes=codes).collect())
    assert a == b


def test_contract_edges(spark):
    V = _clustered_vectors(n=50, d=15)
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(_df(spark, V), m=4, ksub=8)
    small = _clustered_vectors(n=5, d=16)
    with pytest.raises(ValueError, match="< ksub"):
        pq_train(_df(spark, small), m=4, ksub=8)
    ok = _clustered_vectors(n=60, d=16)
    with pytest.raises(ValueError, match="no query vectors"):
        pq_adc_topk(_df(spark, ok), pq_train(_df(spark, ok), m=4, ksub=8),
                    query_ids=[99999])


def test_ivfpq_full_probe_equals_bruteforce_adc(spark):
    """nprobe = n_centroids means every list is scanned: IVF-PQ must
    return exactly pq_adc_topk's answer on the same PQ books."""
    from yatsm_spark.operators.pq import ivfpq_index, ivfpq_topk

    V = _clustered_vectors(n=300, d=16, seed=21)
    df = _df(spark, V)
    coarse, books = ivfpq_index(df, n_centroids=4, m=4, ksub=8, n_iters=3)
    full = sorted(tuple(r) for r in
                  ivfpq_topk(df, coarse, books, [0, 1, 2], nprobe=4,
                             k=5).collect())
    brute = sorted(tuple(r) for r in
                   pq_adc_topk(df, books, [0, 1, 2], k=5).collect())
    assert full == brute


def test_ivfpq_partition_invariance_and_encoded_reuse(spark):
    from yatsm_spark.operators.pq import ivfpq_encode, ivfpq_index, ivfpq_topk

    V = _clustered_vectors(n=250, d=16, seed=22)
    df = _df(spark, V)
    coarse, books = ivfpq_index(df, n_centroids=4, m=4, ksub=8, n_iters=2)
    a = sorted(tuple(r) for r in
               ivfpq_topk(df, coarse, books, [0, 7], nprobe=2, k=4).collect())
    b = sorted(tuple(r) for r in
               ivfpq_topk(df.repartition(11), coarse, books, [0, 7],
                          nprobe=2, k=4).collect())
    enc = ivfpq_encode(df, coarse, books)
    c = sorted(tuple(r) for r in
               ivfpq_topk(df, coarse, books, [0, 7], nprobe=2, k=4,
                          encoded=enc).collect())
    assert a == b == c


def test_ivfpq_probe_restriction_only_drops_recall(spark):
    """nprobe=1 answers are a subset-ranking of the probed list: every
    returned neighbor must live in one of the query's probed clusters."""
    import numpy as np

    from yatsm_spark.kernel.vecmath import seq_sqdist
    from yatsm_spark.operators.pq import ivfpq_encode, ivfpq_index, ivfpq_topk

    V = _clustered_vectors(n=300, d=16, seed=23)
    df = _df(spark, V)
    coarse, books = ivfpq_index(df, n_centroids=4, m=4, ksub=8, n_iters=3)
    enc = {r.vec_id: r.cluster
           for r in ivfpq_encode(df, coarse, books).collect()}
    back = np.stack([np.asarray(r.embedding, dtype=np.float64)
                     for r in df.orderBy("vec_id").collect()])
    got = ivfpq_topk(df, coarse, books, [0, 1], nprobe=1, k=5,
                     encoded=None).collect()
    for r in got:
        qprobe = int(np.argmin(seq_sqdist(back[r.query_id][None, :],
                                          coarse)[0]))
        assert enc[r.neighbor_id] == qprobe
