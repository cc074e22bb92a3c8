"""Similarity search over embedding columns (SURVEY.md §2C):
brute-force cosine top-k as the exact baseline, and an LSH-bucketed
(random hyperplane / SimHash-for-vectors) variant as the scale path.

Brute force is O(|Q| × |C|) — correct at any scale when |Q| is small
(the query side is broadcast); the LSH variant trades recall for a
bucket-join at corpus×corpus scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ome_arrow_spark.functions.vectors import cosine


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    query_id: str = "qid",
    corpus_id: str = "cid",
    vec: str = "embedding",
    digits: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors per query. The query side is
    broadcast (small), so the corpus is scanned exactly once with no
    shuffle; ranking shuffles only |Q|×|C| scored rows on qid.
    Similarity is rounded to ``digits`` and ties break on corpus id —
    fully deterministic."""
    q = queries.select(F.col(query_id), F.col(vec).alias("__qv"))
    c = corpus.select(F.col(corpus_id), F.col(vec).alias("__cv"))
    scored = F.broadcast(q).crossJoin(c).select(
        query_id,
        corpus_id,
        F.round(cosine(F.col("__qv"), F.col("__cv")), digits).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos_sim").desc(), F.col(corpus_id))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def _hyperplane_sign(vec: Column, plane: int, seed_mode: str = "xxhash") -> Column:
    """Deterministic pseudo-random hyperplane dot-product sign: the
    plane's i-th component is ±1 from a hash of (plane, i) — no RNG
    state, reproducible on any executor. ``seed_mode="xxhash"`` is the
    production default (fast, JVM-side); ``"md5"`` derives the sign
    from md5 hex parity, which DuckDB recomputes bit-identically — the
    engine-portable mode the oracle-checked query uses.

    NOT a linear mix like ``(a*plane + b*i) % 2``: with odd a, b that
    collapses to (plane+i) parity, making every plane the same
    hyperplane or its mirror — an n-bit signature that is really 1 bit
    (caught by the recall calibration: recall was flat in n_planes)."""
    if seed_mode == "md5":
        def sgn(i):
            h = F.md5(F.concat_ws(":", F.lit(str(plane)), i.cast("string")))
            return 2 * F.pmod(F.ascii(F.substring(h, 1, 1)), F.lit(2)).cast("int") - 1
    else:
        def sgn(i):
            return 2 * F.pmod(F.xxhash64(F.lit(plane), i), F.lit(2)).cast("int") - 1

    return (
        F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda x, i: x.cast("double") * sgn(i),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        > 0
    ).cast("int")


def lsh_signature(
    vec: Column, n_planes: int = 8, table: int = 0, seed_mode: str = "xxhash"
) -> Column:
    """n-bit random-hyperplane signature as an int bucket key; ``table``
    offsets the plane seeds so each LSH table draws independent planes."""
    sig = None
    for p in range(n_planes):
        bit = _hyperplane_sign(vec, table * 1000 + p, seed_mode) * (2**p)
        sig = bit if sig is None else sig + bit
    return sig.cast("int")


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    query_id: str = "qid",
    corpus_id: str = "cid",
    vec: str = "embedding",
    n_planes: int = 4,
    n_tables: int = 8,
    digits: int = 6,
    seed_mode: str = "xxhash",
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors sharing a bucket
    with the query in ANY of ``n_tables`` independent hyperplane tables
    (multi-table OR — recall ≈ 1-(1-p^planes)^tables), then exact
    cosine within the candidate set.

    Scale: all tables come from ONE pass over each side (explode of the
    per-table signature array — not a per-table rescan); the bucket
    join replaces the full cross product, shrinking the scored set by
    ~2^n_planes / n_tables. Tune (n_planes ↓ recall-per-table ↑ bucket
    size ↑) × (n_tables ↑ recall ↑ cost ↑); see the calibration table
    in README."""
    def sigs(v):
        return F.array(
            *[
                F.struct(
                    F.lit(t).alias("t"),
                    lsh_signature(v, n_planes, table=t, seed_mode=seed_mode).alias("s"),
                )
                for t in range(n_tables)
            ]
        )

    q = queries.select(
        F.col(query_id), F.col(vec).alias("__qv"), F.explode(sigs(F.col(vec))).alias("__b")
    ).select(query_id, "__qv", F.col("__b.t").alias("__t"), F.col("__b.s").alias("__sig"))
    c = corpus.select(
        F.col(corpus_id), F.col(vec).alias("__cv"), F.explode(sigs(F.col(vec))).alias("__b")
    ).select(corpus_id, "__cv", F.col("__b.t").alias("__t"), F.col("__b.s").alias("__sig"))
    candidates = (
        F.broadcast(q)
        .join(c, ["__t", "__sig"])
        .select(query_id, corpus_id, "__qv", "__cv")
        .dropDuplicates([query_id, corpus_id])
    )
    scored = candidates.select(
        query_id,
        corpus_id,
        F.round(cosine(F.col("__qv"), F.col("__cv")), digits).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos_sim").desc(), F.col(corpus_id))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    n_centroids: int = 8,
    n_probe: int = 2,
    query_id: str = "qid",
    corpus_id: str = "cid",
    vec: str = "embedding",
    digits: int = 6,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: k-means coarse quantizer
    assigns every corpus vector to its nearest centroid (the inverted
    lists); each query probes only its ``n_probe`` nearest centroids
    and searches those lists exactly.

    Scale: the corpus is scanned once for assignment (materialize the
    listed corpus as a bucketed/partitioned table in production); per
    query, work shrinks from |corpus| to ~n_probe/n_centroids of it.
    Recall rises with n_probe; n_probe = n_centroids degenerates to
    brute force."""
    from pyspark.sql.window import Window

    from ome_arrow_spark.operators.clustering import (
        _sq_l2,
        cluster_means,
        kmeans,
        pack_centroids,
    )

    # coarse quantizer trained on the corpus (deterministic init/iters)
    assign = kmeans(
        corpus.select(F.col(corpus_id).alias("vec_id"), F.col(vec).alias("embedding")),
        k=n_centroids,
        iterations=3,
    ).withColumnsRenamed({"vec_id": corpus_id})
    c_listed = corpus.select(F.col(corpus_id), F.col(vec).alias("__cv")).join(
        assign, corpus_id
    )

    # centroids recomputed as cluster means — vector-native (O(1) agg
    # expressions regardless of dim), packed into one broadcast row
    # instead of plan literals
    packed = pack_centroids(
        cluster_means(c_listed, vec_col="__cv")
    ).localCheckpoint(eager=True)

    # per query: n_probe nearest centroids (query side is small — the
    # explode + window ranks k centroid candidates per query)
    q = queries.select(F.col(query_id), F.col(vec).alias("__qv"))
    probes = (
        q.crossJoin(F.broadcast(packed))
        .select(query_id, "__qv", F.explode("__cents").alias("cs"))
        .select(
            query_id,
            "__qv",
            F.col("cs.cluster").alias("cluster"),
            _sq_l2("__qv", F.col("cs.ctr")).alias("d2"),
        )
    )
    wq = Window.partitionBy(query_id).orderBy(F.col("d2"), F.col("cluster"))
    probed = (
        probes.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= n_probe)
        .select(query_id, "__qv", "cluster")
    )

    scored = F.broadcast(probed).join(c_listed, "cluster").select(
        query_id,
        corpus_id,
        F.round(cosine(F.col("__qv"), F.col("__cv")), digits).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos_sim").desc(), F.col(corpus_id))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
