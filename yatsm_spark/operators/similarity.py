"""Similarity search over embedding columns (array<float>).

Training-data-pipeline addition (task brief): brute-force cosine top-k as
the correctness baseline; LSH (random-hyperplane) bucketing as the scale
path. Dot products run JVM-side via zip_with + aggregate (fold order =
array order, so doubles are bit-deterministic and match an ordered-fold
oracle); no Python in either operator.

Scale shape: brute force is queries × corpus — fine when queries is a
small broadcast side (the re-ranking stage); the LSH variant buckets the
corpus once (linear scan, one shuffle) and only joins within buckets,
the standard recall/cost trade for ANN at 10^9+ vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: queries (small, broadcast) × corpus.
    Deterministic ranking: ORDER BY rounded sim DESC, neighbor id ASC."""
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = embeddings.select(F.col(id_col), vec_d.alias("v"), _norm(vec_d).alias("nrm"))
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    joined = base.join(F.broadcast(q), F.col(id_col) != F.col("query_id"))
    sim = F.round(_dot(F.col("v"), F.col("qv")) / (F.col("nrm") * F.col("qn")), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        joined.select("query_id", F.col(id_col).alias("neighbor_id"), sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_buckets(
    embeddings: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector.

    Plane weights are a fixed deterministic function w(j,d) = cos(j*1009+d)
    — reproducible in ANY engine (no RNG state to ship), adequate spread
    for sign-LSH. bucket = Σ_j sign_j · 2^j."""
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    proj = [
        F.aggregate(
            F.zip_with(
                vec_d,
                F.transform(F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1),
                            lambda d: F.cos(d + F.lit(float(j * 1009)))),
                lambda x, wgt: x * wgt,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        for j in range(n_planes)
    ]
    bucket = sum(
        (F.when(p > 0, F.lit(1 << j)).otherwise(F.lit(0)) for j, p in enumerate(proj)),
        start=F.lit(0),
    )
    return embeddings.select(F.col(id_col), bucket.cast("long").alias("bucket"))


def ivf_index(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """IVF coarse quantizer: assign every vector to its nearest centroid.

    Returns ``(assigned, centroids)`` where ``assigned`` adds a ``cluster``
    column and ``centroids`` is the collected codebook
    ``[(cid, vec, norm), ...]`` (≤ ``n_centroids`` rows — bounded driver
    collect, the FAISS shape: the coarse quantizer is tiny metadata shipped
    to every task, NOT a join side). Assignment is a pure per-row argmax of
    rounded cosine similarity against the literal codebook — zero shuffle
    over the corpus, whole-stage-codegen JVM expressions only.

    Centroid choice is deterministic (the ``n_centroids`` lowest ids): in
    production the codebook comes from offline k-means on a sample exactly
    as FAISS trains; codebook quality is orthogonal to the operator's
    partition/probe structure, and a deterministic seed set keeps the
    operator oracle-checkable. Ties in the argmax break to the lowest
    centroid id (first max position).
    """
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cents = (
        embeddings.filter(F.col(id_col) < n_centroids)
        .select(F.col(id_col).cast("int").alias("cid"), vec_d.alias("cv"),
                _norm(vec_d).alias("cn"))
        .collect()
    )
    centroids = sorted((r.cid, list(r.cv), float(r.cn)) for r in cents)
    base = embeddings.select(
        F.col(id_col), F.col(vec_col), vec_d.alias("v"), _norm(vec_d).alias("nrm"))
    csims = F.array(*[
        F.round(_dot(F.col("v"), F.array(*[F.lit(float(x)) for x in cv]))
                / (F.col("nrm") * F.lit(cn)), 6)
        for cid, cv, cn in centroids
    ])
    cid_arr = F.array(*[F.lit(cid) for cid, _, _ in centroids])
    assigned = base.withColumn("csims", csims).withColumn(
        "cluster",
        F.element_at(cid_arr, F.array_position(F.col("csims"),
                                               F.array_max("csims")).cast("int")))
    return assigned, centroids


def ivf_assign(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster) inverted-file assignment — the table you'd partition /
    bucket the corpus by so each probe reads only its clusters' files."""
    assigned, _ = ivf_index(embeddings, n_centroids, id_col, vec_col)
    return assigned.select(id_col, "cluster")


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: probe each query's ``nprobe`` nearest
    centroid lists and brute-force cosine only within them.

    Scale shape: candidates are ``~nprobe/n_centroids`` of the corpus; the
    probe table (queries × nprobe rows) is broadcast, so the corpus-side
    scan stays shuffle-free and the only shuffle is the per-query top-k
    window over candidates. With ``nprobe == n_centroids`` every list is
    probed and the result is bit-identical to :func:`cosine_topk`
    (pinned by ``tests/test_dedup_similarity.py``).
    """
    assigned, centroids = ivf_index(embeddings, n_centroids, id_col, vec_col)
    cid_arr = F.array(*[F.lit(cid) for cid, _, _ in centroids])
    probes = (
        assigned.filter(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("query_id"), F.col("v").alias("qv"),
                F.col("nrm").alias("qn"), F.posexplode("csims").alias("pos", "csim"))
        .withColumn("cid", F.element_at(cid_arr, (F.col("pos") + 1).cast("int")))
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("csim").desc(), F.col("cid").asc())
    probes = probes.withColumn("prn", F.row_number().over(w_probe)) \
                   .filter(F.col("prn") <= nprobe)
    cand = assigned.join(
        F.broadcast(probes),
        (F.col("cluster") == F.col("cid")) & (F.col(id_col) != F.col("query_id")))
    sim = F.round(_dot(F.col("v"), F.col("qv")) / (F.col("nrm") * F.col("qn")), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        cand.select("query_id", F.col(id_col).alias("neighbor_id"), sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.5,
    n_planes: int = 8,
    max_bucket_size: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (task-brief dedup family):
    LSH candidate generation + EXACT cosine verification + threshold.

    Scale shape: candidates come from the capped within-bucket join (never
    the corpus self-join), then two id-equi-joins hydrate the vectors and
    the cosine runs JVM-side per pair. Sign-LSH misses some true pairs by
    design (the recall/cost trade); every EMITTED pair carries its exact
    cosine, so precision at the threshold is 1.0.
    """
    pairs = lsh_candidate_pairs(embeddings, n_planes, id_col, vec_col,
                                max_bucket_size).select("id_a", "id_b")
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = embeddings.select(F.col(id_col), vec_d.alias("v"), _norm(vec_d).alias("nrm"))
    a = base.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"),
                    F.col("nrm").alias("na"))
    b = base.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"),
                    F.col("nrm").alias("nb"))
    sim = F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6)
    return (
        pairs.join(a, "id_a").join(b, "id_b")
        .select("id_a", "id_b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def lsh_candidate_pairs(embeddings: DataFrame, n_planes: int = 8,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        max_bucket_size: int = 1000) -> DataFrame:
    """ANN candidate pairs: same hyperplane bucket, a < b. Join is within
    buckets only — the corpus never self-joins at full width.

    max_bucket_size drops buckets whose membership exceeds the cap before
    the self-join: an m-member bucket emits m(m-1)/2 pairs, so one
    degenerate bucket (e.g. the all-zeros region of the embedding space)
    would go quadratic at 10^9 vectors. The standard fix is more planes /
    multi-probe for those regions; the cap bounds the damage meanwhile."""
    b = hyperplane_buckets(embeddings, n_planes, id_col, vec_col)
    # Anti-join out the (small) over-cap bucket set instead of broadcasting
    # the keep-set, which grows with n_planes (round-2 ADVICE).
    bucket_hot = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("bsz")).filter(
        F.col("bsz") > max_bucket_size
    )
    b = b.join(F.broadcast(bucket_hot.select("bucket")), "bucket", "left_anti")
    l, r = b.alias("l"), b.alias("r")
    return (
        l.join(r, (F.col("l.bucket") == F.col("r.bucket"))
               & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"),
                F.col("l.bucket").alias("bucket"))
    )
