"""Product quantization (PQ) — the memory side of large-scale ANN
(Jégou, Douze & Schmid, TPAMI 2011): compress each vector into m
one-byte codes so a 100 TB embedding corpus fits executor memory as a
codes table, then answer queries by asymmetric distance (ADC) — table
lookups instead of float dot products per candidate.

Scale shape (audited in BENCH/PLANS.md):

- **Training** is sample-bounded BY DESIGN (the FAISS discipline —
  codebooks are trained on ~10^5 vectors regardless of corpus size):
  a deterministic ``vec_id % sample_mod`` sample is collected
  (hard-capped, raises on overflow like ``crossval_report``) and
  Lloyd's runs per subspace on the driver.
- **Encoding** is a zero-shuffle ``mapInPandas`` over a broadcast
  codebook (m × ksub × dsub doubles — 64 kB at the 8×16×8 default,
  1 MB at a production 16×256×48), one vectorized pass per Arrow batch.
- **ADC top-k** broadcasts the per-query lookup tables (nq × m × ksub
  doubles) and scans the CODES (m ints/vector, not d floats); the only
  exchange is the per-query ranking window over candidate rows.

Exactness: the numeric core (kernel/pq_core.py — seq-fold distances,
id-ordered member means, lowest-index argmin ties) is shared verbatim
with the Spark-free twin (tools/make_goldens.py::pq_twin), so the
driver rows are bit-exact and the differential covers exactly the Spark
plumbing: the bounded sample collect, broadcast round-trips, Arrow
batching, and the ranking window.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from yatsm_spark.kernel.pq_core import (
    pq_adc_core,
    pq_encode_core,
    pq_lut,
    pq_train_core,
)

#: training-sample hard cap — raising, not truncating, is the contract
MAX_TRAIN_SAMPLE = 1 << 17


def pq_train(df: DataFrame, m: int = 8, ksub: int = 16, n_iters: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             sample_mod: int = 1) -> np.ndarray:
    """(m, ksub, dsub) codebooks from a deterministic bounded sample in
    id order (kernel conventions: first-ksub init, id-ordered member
    means, empty clusters keep their centroid)."""
    if m < 1 or ksub < 2 or n_iters < 1:
        raise ValueError("need m >= 1, ksub >= 2, n_iters >= 1")
    rows = (df.filter(F.col(vec_col).isNotNull()
                      & (F.col(id_col) % sample_mod == 0))
              .select(id_col, vec_col).orderBy(id_col).collect())
    if len(rows) > MAX_TRAIN_SAMPLE:
        raise ValueError(
            f"PQ training sample {len(rows)} exceeds {MAX_TRAIN_SAMPLE}; "
            "raise sample_mod — training is sample-bounded by design")
    if not rows:
        raise ValueError("PQ training sample is empty")
    V = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    return pq_train_core(V, m, ksub, n_iters)


def pq_encode(df: DataFrame, codebooks: np.ndarray,
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """(id, code array<int> of length m): per-subspace argmin against the
    broadcast codebooks — zero shuffle, one Arrow pass per batch. Null /
    length-mismatched vectors are dropped (same contract as PCA)."""
    m, ksub, dsub = codebooks.shape
    d = m * dsub
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(codebooks.tolist())
    src = df.filter(F.col(vec_col).isNotNull()
                    & (F.size(F.col(vec_col)) == d)) \
            .select(id_col, vec_col)
    schema = f"{id_col} " + dict(df.dtypes)[id_col] + ", code array<int>"

    def gen(batches):
        import pandas as pd

        B = np.asarray(bc.value, dtype=np.float64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack([np.asarray(v, dtype=np.float64)
                          for v in pdf[vec_col]])
            codes = pq_encode_core(V, B)
            yield pd.DataFrame({id_col: pdf[id_col],
                                "code": [row.tolist() for row in codes]})

    return src.mapInPandas(gen, schema)


def pq_adc_topk(df: DataFrame, codebooks: np.ndarray, query_ids: list[int],
                k: int = 5, id_col: str = "vec_id",
                vec_col: str = "embedding", codes: DataFrame | None = None,
                round6: bool = True) -> DataFrame:
    """(query_id, neighbor_id, adist, rank): asymmetric-distance top-k.

    Per-query LUTs are built driver-side from the broadcast-small query
    set and shipped once; the scan reads the codes table. ``codes`` (a
    ``pq_encode`` result) can be passed to reuse a stored codes table —
    the production shape, where encode happens once at ingest.
    Deterministic ranking: grid-snapped adist ASC, neighbor id ASC
    (floor(x*1e6+0.5) — adist >= 0, identical closed form in the twin)."""
    m, ksub, dsub = codebooks.shape
    q_rows = (df.filter(F.col(id_col).isin([int(q) for q in query_ids]))
                .select(id_col, vec_col).orderBy(id_col).collect())
    if not q_rows:
        raise ValueError("no query vectors found for the given ids")
    qids = [int(r[id_col]) for r in q_rows]
    Q = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in q_rows])
    lut = pq_lut(Q, codebooks)

    if codes is None:
        codes = pq_encode(df, codebooks, id_col, vec_col)
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((qids, lut.tolist()))

    def gen(batches):
        import pandas as pd

        qids_b, lut_l = bc.value
        L = np.asarray(lut_l, dtype=np.float64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.stack([np.asarray(c, dtype=np.int64)
                          for c in pdf["code"]])
            n = len(pdf)
            out_q, out_n, out_d = [], [], []
            for qi, qid in enumerate(qids_b):
                acc = pq_adc_core(C, L[qi])
                out_q += [qid] * n
                out_n += list(pdf[id_col])
                out_d += list(acc)
            yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n,
                                "adist": out_d})

    pairs = (codes.mapInPandas(gen, "query_id long, neighbor_id long, "
                                    "adist double")
                  .filter(F.col("neighbor_id") != F.col("query_id")))
    adist = (F.floor(F.col("adist") * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
             if round6 else F.col("adist"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("neighbor_id").asc())
    return (pairs.select("query_id", "neighbor_id", adist.alias("adist"))
                 .withColumn("rank", F.row_number().over(w))
                 .filter(F.col("rank") <= k))


# --------------------------------------------------------------- IVF-PQ

def ivfpq_index(df: DataFrame, n_centroids: int = 8, m: int = 8,
                ksub: int = 16, n_iters: int = 5, id_col: str = "vec_id",
                vec_col: str = "embedding", sample_mod: int = 1):
    """(coarse, books): the two codebooks of an IVF-PQ index, trained on
    one deterministic bounded sample. The coarse quantizer IS Lloyd's on
    full vectors — pq_train_core with a single subspace of ksub =
    n_centroids — so both trainings share the same kernel conventions.
    PQ encodes RAW vectors (not residuals) — documented simplification;
    the routing/compression architecture is the FAISS shape either way."""
    rows = (df.filter(F.col(vec_col).isNotNull()
                      & (F.col(id_col) % sample_mod == 0))
              .select(id_col, vec_col).orderBy(id_col).collect())
    if len(rows) > MAX_TRAIN_SAMPLE:
        raise ValueError(
            f"IVF-PQ training sample {len(rows)} exceeds {MAX_TRAIN_SAMPLE};"
            " raise sample_mod")
    if not rows:
        raise ValueError("IVF-PQ training sample is empty")
    V = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    coarse = pq_train_core(V, 1, n_centroids, n_iters)[0]
    books = pq_train_core(V, m, ksub, n_iters)
    return coarse, books


def ivfpq_encode(df: DataFrame, coarse: np.ndarray, books: np.ndarray,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """(id, cluster, code): coarse assignment + PQ codes in ONE
    zero-shuffle Arrow pass — the ingest-time index build. Ties take the
    lowest cluster id (argmin first occurrence)."""
    from yatsm_spark.kernel.vecmath import seq_sqdist

    m, ksub, dsub = books.shape
    d = m * dsub
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((coarse.tolist(), books.tolist()))
    src = df.filter(F.col(vec_col).isNotNull()
                    & (F.size(F.col(vec_col)) == d)) \
            .select(id_col, vec_col)
    schema = (f"{id_col} " + dict(df.dtypes)[id_col]
              + ", cluster int, code array<int>")

    def gen(batches):
        import pandas as pd

        Cm, B = (np.asarray(a, dtype=np.float64) for a in bc.value)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack([np.asarray(v, dtype=np.float64)
                          for v in pdf[vec_col]])
            cl = np.argmin(seq_sqdist(V, Cm), axis=1).astype(np.int32)
            codes = pq_encode_core(V, B)
            yield pd.DataFrame({id_col: pdf[id_col], "cluster": cl,
                                "code": [row.tolist() for row in codes]})

    return src.mapInPandas(gen, schema)


def ivfpq_topk(df: DataFrame, coarse: np.ndarray, books: np.ndarray,
               query_ids: list[int], nprobe: int = 2, k: int = 5,
               id_col: str = "vec_id", vec_col: str = "embedding",
               encoded: DataFrame | None = None) -> DataFrame:
    """(query_id, neighbor_id, adist, rank): the full IVF-PQ serve path —
    coarse-route each query to its nprobe nearest inverted lists, then
    ADC-score ONLY those lists' codes.

    Scale shape: the (query_id, cluster) probe pairs are a broadcast of
    nq x nprobe rows joined against the encoded table — at 100 TB the
    scan touches ~nprobe/n_centroids of the codes (m ints per vector),
    and the only exchange is the final per-query ranking. With nprobe =
    n_centroids the result equals brute-force pq_adc_topk on the same
    codebooks (pytest-pinned)."""
    from yatsm_spark.kernel.vecmath import seq_sqdist

    q_rows = (df.filter(F.col(id_col).isin([int(q) for q in query_ids]))
                .select(id_col, vec_col).orderBy(id_col).collect())
    if not q_rows:
        raise ValueError("no query vectors found for the given ids")
    qids = [int(r[id_col]) for r in q_rows]
    Q = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in q_rows])
    nprobe = min(nprobe, coarse.shape[0])
    cdist = seq_sqdist(Q, coarse)
    # probe order: distance, then lowest cluster id (lexsort is stable)
    probes = [np.lexsort((np.arange(coarse.shape[0]), cdist[i]))[:nprobe]
              for i in range(len(qids))]
    lut = pq_lut(Q, books)

    if encoded is None:
        encoded = ivfpq_encode(df, coarse, books, id_col, vec_col)
    spark = df.sparkSession
    probe_pairs = spark.createDataFrame(
        [(qid, int(c)) for qid, pr in zip(qids, probes) for c in pr],
        "query_id long, cluster int")
    cand = encoded.join(F.broadcast(probe_pairs), "cluster") \
                  .filter(F.col(id_col) != F.col("query_id"))
    bc = spark.sparkContext.broadcast((qids, lut.tolist()))

    def gen(batches):
        import pandas as pd

        qids_b, lut_l = bc.value
        L = np.asarray(lut_l, dtype=np.float64)
        pos = {q: i for i, q in enumerate(qids_b)}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.stack([np.asarray(c, dtype=np.int64)
                          for c in pdf["code"]])
            qcol = pdf["query_id"].to_numpy()
            adist = np.empty(len(pdf), dtype=np.float64)
            for q in np.unique(qcol):
                sel = qcol == q
                adist[sel] = pq_adc_core(C[sel], L[pos[int(q)]])
            yield pd.DataFrame({"query_id": qcol,
                                "neighbor_id": pdf[id_col],
                                "adist": adist})

    pairs = cand.select("query_id", id_col, "code") \
                .mapInPandas(gen, "query_id long, neighbor_id long, "
                                  "adist double")
    snapped = F.floor(F.col("adist") * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("neighbor_id").asc())
    return (pairs.select("query_id", "neighbor_id", snapped.alias("adist"))
                 .withColumn("rank", F.row_number().over(w))
                 .filter(F.col("rank") <= k))
