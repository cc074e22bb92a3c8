"""Iterative distributed algorithms (SURVEY.md §2C "iterative
algorithms" class): connected components over near-dup pairs (the
final step of corpus dedup — groups of transitively-similar docs) and
a minimal k-means over embeddings.

Both are driver-coordinated loops over DataFrame ops — the Spark
pattern for iteration: small state (labels frontier / centroids) flows
through joins or broadcasts; the big relation is never collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    small_graph_threshold: int = 2_000_000,
) -> DataFrame:
    """Every node ends with the MIN node id of its component —
    deterministic, so a recursive-CTE oracle can re-derive it.
    Returns (node, component).

    Hybrid execution: the duplicate-pair graph is orders of magnitude
    smaller than the corpus (it holds only verified near-dup pairs), so
    when the deduplicated edge count fits comfortably on the driver
    (≤ ``small_graph_threshold``) we collect it and run union-find —
    one job instead of ~2 per label-propagation round. Past the
    threshold the distributed path takes over: each round is one
    groupBy(min) over the edge list, no driver-side graph, rounds =
    graph diameter (near-dup clusters are tiny, 2-3 rounds),
    ``max_iter`` bounds pathological chains."""
    # localCheckpoint (not cache) each round: iterative self-derived
    # plans grow multiplicatively in lineage depth — without truncation
    # a 12-round chain OOMs the OPTIMIZER, not the data.
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .unionByName(pairs.select(F.col(id_b).alias("u"), F.col(id_a).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if edges.count() <= small_graph_threshold:
        return _components_driver_union_find(edges)
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for it in range(max_iter):
        # candidate: min over neighbors' labels and own
        neigh = (
            edges.join(labels, edges.v == labels.node)
            .select(F.col("u").alias("node"), "component")
        )
        new_labels = (
            labels.select("node", "component")
            .unionByName(neigh)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        old_labels = labels
        labels = new_labels
        # round 0 always changes labels when any edge exists — skip the
        # convergence-count job there (one fewer action per call)
        if it == 0:
            continue
        changed = (
            new_labels.alias("n")
            .join(old_labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        if changed == 0:
            break
    return labels


def _components_driver_union_find(edges: DataFrame) -> DataFrame:
    """Min-label union-find over a collected edge list (small-graph fast
    path of :func:`connected_components`). Always attaching the larger
    root under the smaller keeps every root = the component's min id."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for row in edges.collect():
        u, v = row[0], row[1]
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo

    node_type = edges.schema.fields[0].dataType
    schema = T.StructType(
        [
            T.StructField("node", node_type),
            T.StructField("component", node_type),
        ]
    )
    rows = [(n, find(n)) for n in parent]
    return edges.sparkSession.createDataFrame(rows, schema)


def kmeans(
    vectors: DataFrame,
    k: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iterations: int = 5,
) -> DataFrame:
    """Deterministic mini k-means: centroids init from the k smallest
    ids, fixed iteration count, squared-L2 assignment with id
    tiebreak. Returns (vec_id, cluster).

    Scale: centroids (k×dim doubles) broadcast each round; assignment
    is a scan; the update is a groupBy over k groups with array-wise
    decimal-free double sums (cluster means are internal state, not
    published values)."""
    dim_row = vectors.select(F.size(vec_col).alias("d")).first()
    dim = dim_row["d"]
    cent = [
        (i, [float(x) for x in r[vec_col]])
        for i, r in enumerate(
            vectors.orderBy(id_col).limit(k).collect()
        )
    ]
    v = vectors.select(F.col(id_col), F.col(vec_col).alias("__v"))
    assigned = None
    for _ in range(iterations):
        cent_arr = F.array(
            *[
                F.struct(
                    F.lit(ci).alias("c"),
                    F.array(*[F.lit(x) for x in vec]).alias("ctr"),
                )
                for ci, vec in cent
            ]
        )
        dist = lambda ctr: F.aggregate(  # noqa: E731
            F.zip_with(F.col("__v"), ctr, lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        scored = v.select(
            id_col,
            "__v",
            F.explode(cent_arr).alias("cs"),
        ).select(
            id_col,
            "__v",
            F.col("cs.c").alias("c"),
            dist(F.col("cs.ctr")).alias("d2"),
        )
        from pyspark.sql.window import Window

        w = Window.partitionBy(id_col).orderBy(F.col("d2"), F.col("c"))
        assigned = (
            scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select(id_col, "__v", F.col("c").alias("cluster"))
        )
        sums = assigned.groupBy("cluster").agg(
            *[
                F.sum(F.element_at("__v", i + 1).cast("double")).alias(f"s{i}")
                for i in range(dim)
            ],
            F.count("*").alias("n"),
        )
        rows = sums.collect()
        new_cent = []
        for r in sorted(rows, key=lambda r: r["cluster"]):
            new_cent.append(
                (r["cluster"], [r[f"s{i}"] / r["n"] for i in range(dim)])
            )
        cent = new_cent
    return assigned.select(id_col, "cluster")
