"""Behavioral / temporal analytics queries (SURVEY.md §2C breadth):
sessionization, cohort retention, SCD2 temporal tables, rolling
anomaly detection, interval concurrency (sweep-line), co-occurrence
graph triangles, LATERAL correlated subqueries, bitwise aggregates,
exact multi-quantiles, and a Python UDTF.

These are the query shapes a warehouse team layers on top of the
relational core — each one distributed-by-construction (window
functions partition by entity; sweep-lines aggregate per day before
the cumulative pass; the triangle join is an equi-join cascade
Catalyst can reorder, not a driver loop).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ome_arrow_spark.suite import _events, _t, register

# ---------------------------------------------------------------------------
# Sessionization (batch): a session extends while consecutive events of
# a user are ≤ 30 min apart. lag-over-(ts,event_id) marks session
# starts; a running sum assigns session ids — the standard two-window
# formulation, one shuffle on user_id reused by both windows and the
# final aggregate.
# ---------------------------------------------------------------------------
@register(
    "sessionize_events",
    """
    WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events),
    g AS (SELECT user_id, event_id, ts,
            CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                 THEN 1 ELSE 0 END AS new_s
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (SELECT user_id, event_id, ts,
            CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
              AS session_idx
          FROM g)
    SELECT user_id, session_idx,
           COUNT(*) AS n_events,
           MIN(ts) AS t_start, MAX(ts) AS t_end,
           (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS duration_s
    FROM s GROUP BY user_id, session_idx
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir).select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    g = e.withColumn(
        "new_s",
        F.when(
            F.lag("ts").over(w).isNull()
            | (us - F.lag(us).over(w) > 1_800_000_000),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    s = g.withColumn(
        "session_idx",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return s.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("t_start"),
        F.max("ts").alias("t_end"),
        (
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
            / F.lit(1_000_000)
        )
        .cast("bigint")
        .alias("duration_s"),
    )


# ---------------------------------------------------------------------------
# Cohort retention: users grouped by first-activity week; for each
# (cohort_week, week_offset) the distinct users active then. Two
# aggregations over the same user_id partitioning + one broadcast-size
# join (cohorts table is |users| rows but 2 columns).
# ---------------------------------------------------------------------------
@register(
    "retention_cohorts",
    """
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    cohort AS (SELECT user_id,
                      CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
               FROM e GROUP BY user_id),
    act AS (SELECT DISTINCT user_id,
                   CAST(date_trunc('week', ts) AS TIMESTAMP) AS act_week
            FROM e)
    SELECT c.cohort_week,
           CAST(date_diff('day', CAST(c.cohort_week AS DATE),
                          CAST(a.act_week AS DATE)) // 7 AS INT) AS week_offset,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM act a JOIN cohort c USING (user_id)
    GROUP BY 1, 2
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir).select("user_id", "ts")
    cohort = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    act = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("act_week")
    ).distinct()
    return (
        act.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(F.to_date("act_week"), F.to_date("cohort_week"))
                / F.lit(7)
            )
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


# ---------------------------------------------------------------------------
# SCD2 temporal table build: per customer, each order's status becomes a
# validity interval [valid_from, valid_to) closed by the next change;
# the open interval is the current row. One lead window per customer.
# ---------------------------------------------------------------------------
@register(
    "scd2_orders",
    """
    WITH o AS (SELECT o_custkey, o_orderkey, o_orderstatus,
                      CAST(o_orderdate AS DATE) AS od
               FROM orders WHERE o_custkey % 100 = 0)
    SELECT o_custkey, o_orderkey, o_orderstatus,
           od AS valid_from,
           lead(od) OVER w AS valid_to,
           lead(od) OVER w IS NULL AS is_current
    FROM o WINDOW w AS (PARTITION BY o_custkey ORDER BY od, o_orderkey)
    """,
)
def scd2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 100 == 0)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_orderstatus",
            F.to_date("o_orderdate").alias("od"),
        )
    )
    w = Window.partitionBy("o_custkey").orderBy("od", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderstatus",
        F.col("od").alias("valid_from"),
        F.lead("od").over(w).alias("valid_to"),
        F.lead("od").over(w).isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# Rolling anomaly detection: z-score of each event value against the
# trailing 20 events of the same user (exclusive). Moments from exact
# decimal sums → identical doubles on any engine/partitioning.
# ---------------------------------------------------------------------------
@register(
    "window_anomaly",
    """
    WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
               FROM events),
    m AS (SELECT user_id, event_id, ts, value,
            COUNT(value) OVER w AS n,
            CAST(SUM(CAST(value AS DECIMAL(30,6))) OVER w AS DOUBLE) AS s,
            CAST(SUM(CAST(value * value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS ss
          FROM e
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
    SELECT user_id, event_id, ts,
           ROUND(value, 6) AS value,
           CAST(n AS BIGINT) AS n,
           ROUND((value - s / n) / SQRT((ss - s * s / n) / (n - 1)), 6) AS z
    FROM m
    WHERE n >= 5
      AND ABS((value - s / n) / SQRT((ss - s * s / n) / (n - 1))) > 2.5
    """,
)
def window_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir).select("user_id", "event_id", "ts", "value")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    v = F.col("value")
    m = e.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.count("value").over(w).alias("n"),
        F.sum(v.cast("decimal(30,6)")).over(w).cast("double").alias("s"),
        F.sum((v * v).cast("decimal(38,6)")).over(w).cast("double").alias("ss"),
    )
    n, s, ss = F.col("n"), F.col("s"), F.col("ss")
    z = (v - s / n) / F.sqrt((ss - s * s / n) / (n - 1))
    return m.filter((n >= 5) & (F.abs(z) > 2.5)).select(
        "user_id",
        "event_id",
        "ts",
        F.round(v, 6).alias("value"),
        n.cast("bigint").alias("n"),
        F.round(z, 6).alias("z"),
    )


# ---------------------------------------------------------------------------
# Interval concurrency by sweep-line: orders are "active" for 30 days;
# +1/-1 deltas aggregated per day FIRST (so the cumulative window sees
# |days| rows, not |orders|), then a running sum gives the active count
# and a monthly max compacts the output. The per-day pre-aggregation is
# what keeps the unavoidable single-partition cumulative pass trivial
# at any scale.
# ---------------------------------------------------------------------------
@register(
    "interval_concurrency",
    """
    WITH o AS (SELECT CAST(o_orderdate AS DATE) AS d0
               FROM orders WHERE o_custkey % 10 = 0),
    deltas AS (
      SELECT d0 AS d, 1 AS delta FROM o
      UNION ALL
      SELECT d0 + INTERVAL 30 DAY, -1 FROM o),
    daily AS (SELECT CAST(d AS DATE) AS d, CAST(SUM(delta) AS BIGINT) AS net
              FROM deltas GROUP BY 1),
    run AS (SELECT d, CAST(SUM(net) OVER (ORDER BY d
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS active
            FROM daily)
    SELECT CAST(date_trunc('month', d) AS TIMESTAMP) AS month,
           MAX(active) AS max_active
    FROM run GROUP BY 1
    """,
)
def interval_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 10 == 0)
        .select(F.to_date("o_orderdate").alias("d0"))
    )
    deltas = o.select(F.col("d0").alias("d"), F.lit(1).alias("delta")).unionByName(
        o.select(F.date_add("d0", 30).alias("d"), F.lit(-1).alias("delta"))
    )
    daily = deltas.groupBy("d").agg(F.sum("delta").alias("net"))
    run = daily.withColumn(
        "active",
        F.sum("net").over(
            Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return run.groupBy(F.date_trunc("month", F.col("d")).alias("month")).agg(
        F.max("active").alias("max_active")
    )


# ---------------------------------------------------------------------------
# Co-occurrence graph triangles: parts are nodes, an edge joins two
# parts co-occurring in an order, triangles counted by the canonical
# a<b<c three-way self-join. Pure equi-join cascade — Catalyst picks
# the join order; the edge list is the only shuffled relation.
# ---------------------------------------------------------------------------
@register(
    "triangle_count",
    """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey
                FROM lineitem WHERE l_partkey % 5 = 0),
    edges AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
    SELECT (SELECT COUNT(*) FROM edges) AS n_edges,
           COUNT(*) AS n_triangles
    FROM edges e1
    JOIN edges e2 ON e2.u = e1.v
    JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    """,
)
def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Edge build (r14): per-order sorted part set + in-array i<j
    # combination explode — ONE groupBy shuffle on l_orderkey instead of
    # the distinct + self-join + distinct cascade (3 exchanges of the
    # same rows). Per-order part lists are small and bounded (TPC-H ≤7
    # lineitems/order; the same bucket-bounded-explode shape as
    # operators/dedup.lsh_candidates), so the explode is skew-safe at
    # any corpus size. Same distinct (u<v) edge set, oracle-reproven.
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") % 5 == 0)
        .select("l_orderkey", "l_partkey")
    )
    grp = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("ps"),
            lambda x, i: F.transform(
                F.slice(F.col("ps"), i + 2, F.size(F.col("ps"))),
                lambda y: F.struct(x.alias("u"), y.alias("v")),
            ),
        )
    )
    edges = (
        grp.select(F.explode(pair_arr).alias("p"))
        .select(F.col("p.u"), F.col("p.v"))
        .distinct()
        # the edge list feeds FOUR plan branches (three triangle roles +
        # the edge count); materialize once instead of rescanning
        # lineitem per branch (AQE exchange reuse only catches some).
        .localCheckpoint(eager=True)
    )
    # The checkpointed RDD has no size statistics, so Catalyst falls
    # back to SortMergeJoin — which comparison-sorts the (big) wedge
    # stream. The query must count the edges anyway, so use that number
    # to pick the strategy the optimizer can't see (guide §3.1): edge
    # relations up to ~32 MB broadcast (removes both exchanges AND both
    # sorts — measured 0.44 s → 0.25 s at sf0.1), bigger ones take a
    # shuffled-hash hint (hash-builds the edge side per partition,
    # streams the wedges unsorted — scale-safe at any edge count).
    n_edges = edges.count()
    e1 = edges.alias("e1")
    if n_edges <= 2_000_000:
        e2, e3 = F.broadcast(edges.alias("e2")), F.broadcast(edges.alias("e3"))
    else:
        e2 = edges.alias("e2").hint("shuffle_hash")
        e3 = edges.alias("e3").hint("shuffle_hash")
    tri = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .agg(F.count("*").alias("n_triangles"))
    )
    ne = edges.agg(F.count("*").alias("n_edges"))
    return ne.crossJoin(F.broadcast(tri))


# ---------------------------------------------------------------------------
# LATERAL correlated subquery: top-2 customers by balance per nation,
# written as SQL LATERAL on the Spark side too (the engine's lateral
# join support is itself the operator under test; Catalyst rewrites it
# to a ranked window).
# ---------------------------------------------------------------------------
@register(
    "join_lateral",
    """
    SELECT n.n_name, t.c_name, t.c_acctbal
    FROM nation n, LATERAL (
      SELECT c_name, c_acctbal FROM customer
      WHERE c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_name LIMIT 2) t
    """,
)
def join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "nation").createOrReplaceTempView("__lat_nation")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("__lat_customer")
    return spark.sql(
        """
        SELECT n.n_name, t.c_name, t.c_acctbal
        FROM __lat_nation n, LATERAL (
          SELECT c_name, c_acctbal FROM __lat_customer
          WHERE c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name LIMIT 2) t
        """
    )


# ---------------------------------------------------------------------------
# Bitwise aggregates — bit_and/bit_or/bit_xor fold over group members.
# ---------------------------------------------------------------------------
@register(
    "agg_bitwise",
    """
    SELECT o_orderpriority,
           CAST(bit_and(o_orderkey) AS BIGINT) AS and_key,
           CAST(bit_or(o_orderkey) AS BIGINT) AS or_key,
           CAST(bit_xor(o_orderkey) AS BIGINT) AS xor_key,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.bit_and("o_orderkey").alias("and_key"),
            F.bit_or("o_orderkey").alias("or_key"),
            F.bit_xor("o_orderkey").alias("xor_key"),
            F.count("*").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# Exact multi-quantile: percentile() materializes the sorted group —
# interactive-scale tool; percentile_approx is the 100 TB switch (same
# call shape, mergeable sketch). Interpolation arithmetic is identical
# across engines (verified bit-equal vs quantile_cont).
# ---------------------------------------------------------------------------
@register(
    "percentile_multi",
    """
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.25) AS p25,
           quantile_cont(l_extendedprice, 0.50) AS p50,
           quantile_cont(l_extendedprice, 0.75) AS p75,
           quantile_cont(l_extendedprice, 0.95) AS p95
    FROM lineitem GROUP BY l_returnflag
    """,
)
def percentile_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = F.col("l_extendedprice")
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile(e, F.lit(0.25)).alias("p25"),
            F.percentile(e, F.lit(0.50)).alias("p50"),
            F.percentile(e, F.lit(0.75)).alias("p75"),
            F.percentile(e, F.lit(0.95)).alias("p95"),
        )
    )


# ---------------------------------------------------------------------------
# Python UDTF (user-defined TABLE function, Spark 4): sentence
# expansion with positions, correlated through LATERAL. The UDTF is
# the extension point for row-exploding Python logic (parsers,
# chunkers) that SQL generators can't express — here it intentionally
# mirrors a SQL-expressible split so DuckDB can oracle-check the
# machinery end-to-end.
# ---------------------------------------------------------------------------
@register(
    "udtf_sentences",
    """
    WITH t AS (SELECT doc_id, string_split(text, '. ') AS parts
               FROM documents WHERE doc_id % 23 = 0),
    u AS (SELECT doc_id, parts, unnest(range(len(parts))) AS i FROM t)
    SELECT doc_id, CAST(i + 1 AS INT) AS sent_idx, parts[i + 1] AS sentence,
           CAST(length(parts[i + 1]) AS INT) AS n_chars
    FROM u
    """,
)
def udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx int, sentence string, n_chars int")
    class Sentences:
        def eval(self, text: str):
            if text is None:
                return
            for i, s in enumerate(text.split(". ")):
                yield (i + 1, s, len(s))

    spark.udtf.register("__sentences", Sentences)
    _t(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 23 == 0
    ).createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.sentence, s.n_chars
        FROM __udtf_docs d, LATERAL __sentences(d.text) s
        """
    )


# ---------------------------------------------------------------------------
# Stratified sampling: per-stratum keep-rates applied via a
# deterministic multiplicative hash of the key — reproducible across
# engines and runs (TABLESAMPLE/rand() are not), shuffle-free (the
# filter composes with the scan), and exactly the mechanism of
# `dataset_split` generalized to non-uniform rates per stratum.
# ---------------------------------------------------------------------------
@register(
    "stratified_sample",
    """
    WITH b AS (
      SELECT o_orderpriority, o_totalprice,
             ((o_orderkey * 2654435761) % 4294967296) % 100 AS bucket
      FROM orders)
    SELECT o_orderpriority,
           COUNT(*) AS n_sampled,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS VARCHAR(64)) AS DOUBLE)
             AS sum_price
    FROM b
    WHERE bucket < CASE o_orderpriority
                     WHEN '1-URGENT' THEN 50
                     WHEN '2-HIGH' THEN 20
                     ELSE 5 END
    GROUP BY o_orderpriority
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    bucket = (F.col("o_orderkey") * F.lit(2654435761)) % F.lit(4294967296) % 100
    rate = (
        F.when(F.col("o_orderpriority") == "1-URGENT", 50)
        .when(F.col("o_orderpriority") == "2-HIGH", 20)
        .otherwise(5)
    )
    return (
        o.filter(bucket < rate)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum(F.col("o_totalprice").cast("decimal(30,6)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


# ---------------------------------------------------------------------------
# Equi-width histogram binning — the group key is an arithmetic
# expression, so the aggregation stays a single hash-agg pass with
# partial (map-side) combine; no sort, no window.
# ---------------------------------------------------------------------------
@register(
    "histogram_totalprice",
    """
    SELECT CAST(TRUNC(o_totalprice / 20000) AS INT) AS bin,
           COUNT(*) AS n,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM orders GROUP BY 1
    """,
)
def histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / 20000).cast("int").alias("bin")
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


# ---------------------------------------------------------------------------
# Bucketed co-located join: both fact tables written bucketed+sorted on
# the join key, so the join needs NO exchange on either side — the
# physical pattern for repeated joins at 100 TB (pay the bucketing
# shuffle once at ingest, never again). The query re-buckets its inputs
# each run (self-contained), then joins; test_plans asserts the
# exchange-free property for this layout.
# ---------------------------------------------------------------------------
@register(
    "bucketed_join",
    """
    SELECT COUNT(*) AS n_lines,
           COUNT(DISTINCT o.o_orderkey) AS n_orders,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(30,6))) AS VARCHAR(64)) AS DOUBLE)
             AS sum_price
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_custkey % 50 = 0
    """,
)
def bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    from urllib.parse import urlparse

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    ot, lt = f"bk_orders_{tag}", f"bk_lineitem_{tag}"
    # a fresh session's in-memory catalog does not know tables written
    # by a previous process, but their warehouse directories persist —
    # drop both the catalog entry AND the location before rewriting.
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")).path
    for t in (ot, lt):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 50 == 0)
        .select("o_orderkey")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable(ot)
    )
    (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_extendedprice")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable(lt)
    )
    o, li = spark.table(ot), spark.table(lt)
    return o.join(li, o.o_orderkey == li.l_orderkey).agg(
        F.count("*").alias("n_lines"),
        F.countDistinct("o_orderkey").alias("n_orders"),
        F.sum(F.col("l_extendedprice").cast("decimal(30,6)"))
        .cast("double")
        .alias("sum_price"),
    )


# ---------------------------------------------------------------------------
# Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys match
# each other — still hash-partitionable (NULL is one bucket), unlike
# general theta predicates.
# ---------------------------------------------------------------------------
@register(
    "join_null_safe",
    """
    WITH c AS (SELECT NULLIF(c_nationkey % 5, 4) AS k FROM customer),
    s AS (SELECT NULLIF(s_nationkey % 5, 4) AS k FROM supplier)
    SELECT c.k, COUNT(*) AS n_pairs
    FROM c JOIN s ON c.k IS NOT DISTINCT FROM s.k
    GROUP BY c.k
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(
        F.nullif(F.col("c_nationkey") % 5, F.lit(4)).alias("k")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.nullif(F.col("s_nationkey") % 5, F.lit(4)).alias("ks")
    )
    return (
        c.join(s, c.k.eqNullSafe(s.ks))
        .groupBy("k")
        .agg(F.count("*").alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# Explicit null ordering: NULLS FIRST/LAST contracts on a top-k —
# ordering is total (null bucket → price desc → key) so the LIMIT is
# deterministic.
# ---------------------------------------------------------------------------
@register(
    "sort_nulls_order",
    """
    SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS st, o_totalprice
    FROM orders
    ORDER BY st NULLS FIRST, o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
)
def sort_nulls_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.nullif("o_orderstatus", F.lit("O")).alias("st"),
        "o_totalprice",
    )
    return o.orderBy(
        F.col("st").asc_nulls_first(),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey"),
    ).limit(50)


# ---------------------------------------------------------------------------
# LOCF gap-fill (last observation carried forward): IGNORE NULLS over
# an unbounded-preceding frame — the sparse-to-dense fill for sensor /
# status streams, one window, no self-join.
# ---------------------------------------------------------------------------
@register(
    "window_locf",
    """
    SELECT o_custkey, o_orderkey,
           CASE WHEN o_orderstatus = 'F' THEN o_totalprice END AS f_price,
           last_value(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END
                      IGNORE NULLS)
             OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS UNBOUNDED PRECEDING) AS locf_price
    FROM orders WHERE o_custkey % 200 = 0
    """,
)
def window_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") % 200 == 0)
    fp = F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        fp.alias("f_price"),
        F.last(fp, ignorenulls=True).over(w).alias("locf_price"),
    )


# ---------------------------------------------------------------------------
# Skew-mitigated join: hot keys (a handful of orderkeys carrying a
# large share of lineitem at 100 TB) are split across salt_buckets
# sub-keys, so no single reducer receives a whole hot key. Semantics
# are identical to the plain equi-join — the oracle IS the plain join;
# the salted plan trades ×buckets replication of the small side for
# bounded per-task input (plans/tuning.py:95 documents the cost model;
# AQE skew-join covers sort-merge, salting also covers hash shuffles).
# ---------------------------------------------------------------------------
@register(
    "join_salted_skew",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_lines,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS VARCHAR(64)) AS DOUBLE) AS sum_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ome_arrow_spark.plans.tuning import salted_join

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    j = salted_join(li, o, "o_orderkey", salt_buckets=8)
    return j.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.col("l_quantity").cast("decimal(30,6)")).cast("double").alias("sum_qty"),
    )


# ---------------------------------------------------------------------------
# Time-interval RANGE frame: per-user trailing-1-hour event stats — the
# sliding aggregate SQL expresses as RANGE INTERVAL, distinct from both
# row-count frames (window_range_frame) and tumbling windows. Spark has
# no INTERVAL frame literal; ordering by epoch micros with a
# ±3.6e9-micro range is the exact equivalent (RANGE includes ts peers
# identically). One shuffle on user_id.
# ---------------------------------------------------------------------------
@register(
    "window_time_range",
    """
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_1h,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) OVER w AS DOUBLE) AS sum_value_1h
    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
          FROM events WHERE user_id % 50 = 0)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir).filter(F.col("user_id") % 50 == 0)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_1h"),
        F.sum(F.col("value").cast("decimal(30,6)")).over(w).cast("double").alias(
            "sum_value_1h"
        ),
    )


# ---------------------------------------------------------------------------
# PageRank over the trade graph (customer-nation → supplier-nation
# edges from realized lineitems): the canonical iterative graph
# algorithm beyond connected components / k-means. Three damped
# iterations (d = 0.85, simplified dangling handling) from a uniform
# start; the oracle unrolls the same three steps as CTEs. Scale shape:
# edge extraction is the q7-style join; each iteration is one
# contributions aggregation with the (nodes-sized, here 25-row) rank
# table BROADCAST — rank state never shuffles the edge list twice.
# ---------------------------------------------------------------------------
_PR_EDGES_SQL = """
    e AS (
      SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey),
    od AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
    nn AS (SELECT COUNT(*) AS cnt FROM nation)
"""


def _pr_iter_sql(prev: str, cur: str) -> str:
    return f"""
    {cur} AS (
      SELECT n.n_nationkey AS id,
             0.15 / nn.cnt + 0.85 * COALESCE(SUM({prev}.r / od.deg), 0) AS r
      FROM nation n
      CROSS JOIN nn
      LEFT JOIN e ON e.dst = n.n_nationkey
      LEFT JOIN od ON od.src = e.src
      LEFT JOIN {prev} ON {prev}.id = e.src
      GROUP BY n.n_nationkey, nn.cnt)
    """


@register(
    "pagerank_nations",
    "WITH " + _PR_EDGES_SQL + ","
    + "r0 AS (SELECT n_nationkey AS id, 1.0 / cnt AS r FROM nation, nn),"
    + _pr_iter_sql("r0", "r1") + ","
    + _pr_iter_sql("r1", "r2") + ","
    + _pr_iter_sql("r2", "r3")
    + """
    SELECT n.n_name AS nation, ROUND(r3.r, 9) AS pagerank
    FROM r3 JOIN nation n ON n.n_nationkey = r3.id
    """,
)
def pagerank_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supplier = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    edges = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(supplier), lineitem["l_suppkey"] == supplier["s_suppkey"])
        .select(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .distinct()
        .localCheckpoint()  # 3 iterations reuse the edge list; cut lineage
    )
    out_deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    n_nodes = nation.count()
    ranks = nation.select(
        F.col("n_nationkey").alias("id"), F.lit(1.0 / n_nodes).alias("r")
    )
    for _ in range(3):
        contribs = (
            edges.join(F.broadcast(out_deg), "src")
            .join(F.broadcast(ranks), edges["src"] == F.col("id"))
            .groupBy("dst")
            .agg(F.sum(F.col("r") / F.col("deg")).alias("contrib"))
        )
        ranks = (
            nation.join(
                contribs, nation["n_nationkey"] == contribs["dst"], "left"
            )
            .select(
                F.col("n_nationkey").alias("id"),
                (
                    F.lit(0.15 / n_nodes)
                    + F.lit(0.85) * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("r"),
            )
        )
    return ranks.join(
        nation, ranks["id"] == nation["n_nationkey"]
    ).select(F.col("n_name").alias("nation"), F.round("r", 9).alias("pagerank"))


# ---------------------------------------------------------------------------
# Exponentially-weighted moving average per user (α = 0.3): the
# recursive smoother s_t = αx_t + (1-α)s_{t-1} evaluated through its
# closed form Σ α(1-α)^(n-rn) x_rn (+ the (1-α)^(n-1) seed term), so
# both engines compute identical POWER/SUM arithmetic instead of a
# sequential fold — recursion made window-function-parallel, the same
# trick that makes time-decay features feasible at 100 TB (one shuffle
# on user_id, no per-row state).
# ---------------------------------------------------------------------------
@register(
    "ewma_user_value",
    """
    WITH r AS (
      SELECT user_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM events WHERE user_id % 20 = 0)
    SELECT user_id,
           CAST(MAX(n) AS BIGINT) AS n_events,
           ROUND(SUM(CASE WHEN rn = 1 THEN POWER(0.7, n - 1) * value
                          ELSE 0.3 * POWER(0.7, n - rn) * value END), 6) AS ewma
    FROM r GROUP BY user_id
    """,
)
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).filter(F.col("user_id") % 20 == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wc = Window.partitionBy("user_id")
    r = ev.select(
        "user_id", "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("n"),
    )
    term = F.when(
        F.col("rn") == 1, F.pow(F.lit(0.7), F.col("n") - 1) * F.col("value")
    ).otherwise(
        F.lit(0.3) * F.pow(F.lit(0.7), F.col("n") - F.col("rn")) * F.col("value")
    )
    return r.groupBy("user_id").agg(
        F.max("n").cast("bigint").alias("n_events"),
        F.round(F.sum(term), 6).alias("ewma"),
    )


# ---------------------------------------------------------------------------
# BFS shortest paths over a data-derived sparse graph: each nation's
# single top-revenue trade partner (DECIMAL-exact revenue, so the
# argmax tiebreak is deterministic in both engines) forms a functional
# graph; Spark runs frontier-iteration BFS from nation 0 (bounded by
# the node count, lineage cut per level), the oracle replays it as a
# recursive CTE with MIN-distance aggregation.  Completes the graph
# family (PageRank / triangles / components) with reachability.
# ---------------------------------------------------------------------------
@register(
    "graph_bfs_trade",
    """
    WITH RECURSIVE rev AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(30,6))) AS r
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
      GROUP BY 1, 2),
    edges AS (
      SELECT src, dst FROM (
        SELECT src, dst,
               ROW_NUMBER() OVER (PARTITION BY src
                                  ORDER BY r DESC, dst) AS rn
        FROM rev) WHERE rn = 1),
    bfs(id, d) AS (
      SELECT CAST(0 AS BIGINT), 0
      UNION ALL
      SELECT e.dst, b.d + 1
      FROM bfs b JOIN edges e ON e.src = b.id
      WHERE b.d < 30)
    SELECT CAST(id AS BIGINT) AS nationkey, CAST(MIN(d) AS INT) AS dist
    FROM bfs GROUP BY id
    """,
)
def graph_bfs_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    lineitem = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supplier = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    rev = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(supplier), lineitem["l_suppkey"] == supplier["s_suppkey"])
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .cast("decimal(30,6)")
            ).alias("r")
        )
    )
    w = Window.partitionBy("src").orderBy(F.col("r").desc(), F.col("dst"))
    edges = (
        rev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("src", "dst")
        .localCheckpoint()  # every BFS level reuses the edge list
    )
    dist = spark.createDataFrame([(0, 0)], "nationkey long, dist int")
    frontier = dist.select(F.col("nationkey").alias("id"))
    for level in range(1, 30):
        nxt = (
            frontier.join(edges, frontier["id"] == edges["src"])
            .select(F.col("dst").alias("nationkey"))
            .distinct()
            .join(dist, "nationkey", "left_anti")
            .withColumn("dist", F.lit(level))
        )
        nxt = nxt.localCheckpoint()  # cut per-level lineage growth
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt)
        frontier = nxt.select(F.col("nationkey").alias("id"))
    return dist.select("nationkey", "dist")


# ---------------------------------------------------------------------------
# Ordered funnel (view → click → purchase): how many users reach each
# stage with STRICTLY-increasing timestamps. Spark computes it in ONE
# shuffle: per-user sorted event array, then a single Catalyst fold
# that advances a (stage, last_ts) state machine — greedy
# earliest-feasible matching, which is optimal for funnel stage
# counting, so the oracle's min-after join chain computes the same
# stages by a different algorithm.
# ---------------------------------------------------------------------------
@register(
    "funnel_steps",
    """
    WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
          JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
          WHERE e.event_type = 'click' GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
          JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
          WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT 1 AS step, 'view' AS event_type, COUNT(*) AS users FROM v
    UNION ALL SELECT 2, 'click', COUNT(*) FROM c
    UNION ALL SELECT 3, 'purchase', COUNT(*) FROM p
    """,
)
def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    steps = ["view", "click", "purchase"]
    ev = _events(spark, sf_dir).select("user_id", "ts", "event_type")
    per_user = (
        ev.filter(F.col("event_type").isin(steps))
        .groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_type"))
            ).alias("seq")
        )
    )
    steps_arr = F.array(*[F.lit(s) for s in steps])
    # fold: advance when the event matches the next step AND its ts is
    # strictly after the previous stage's ts (equal-ts chains rejected,
    # matching the oracle's strict >)
    stage = F.aggregate(
        "seq",
        F.struct(
            F.lit(0).alias("stage"),
            F.lit(None).cast("timestamp").alias("last"),
        ),
        lambda acc, e: F.when(
            (acc["stage"] < F.lit(len(steps)))
            & (e["event_type"] == F.element_at(steps_arr, acc["stage"] + 1))
            & (acc["last"].isNull() | (e["ts"] > acc["last"])),
            F.struct(
                (acc["stage"] + 1).alias("stage"), e["ts"].alias("last")
            ),
        ).otherwise(acc),
    )["stage"]
    reached = per_user.select(stage.alias("stage")).filter(F.col("stage") > 0)
    step_df = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], "step int, event_type string"
    )
    return (
        F.broadcast(step_df)
        .join(reached, step_df["step"] <= reached["stage"])
        .groupBy("step", "event_type")
        .agg(F.count("*").alias("users"))
    )


# ---------------------------------------------------------------------------
# Bounded-hop cheapest paths (truncated Bellman-Ford): edge weight =
# MIN shipping delay in days between each nation pair (exact integer,
# so relaxation arithmetic is deterministic); 4 relaxation rounds give
# the cheapest ≤4-hop cost from nation 0 — multi-hop routes genuinely
# beat direct edges on this metric (which can be NEGATIVE in the
# synthetic fixtures — the bounded-hop contract handles it exactly,
# where unbounded shortest-path would not). The oracle enumerates all ≤4-hop
# paths with a recursive CTE and takes the MIN — exponential-path
# enumeration vs iterative relaxation, same answer.
# ---------------------------------------------------------------------------
@register(
    "graph_cheapest_route",
    """
    WITH RECURSIVE w AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             MIN(datediff('day', CAST(o.o_orderdate AS DATE),
                          CAST(l.l_shipdate AS DATE))) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
      GROUP BY 1, 2),
    sp(id, cost, hops) AS (
      SELECT CAST(0 AS BIGINT), 0, 0
      UNION ALL
      SELECT e.dst, p.cost + e.w, p.hops + 1
      FROM sp p JOIN w e ON e.src = p.id
      WHERE p.hops < 4)
    SELECT CAST(id AS BIGINT) AS nationkey,
           CAST(MIN(cost) AS BIGINT) AS min_cost
    FROM sp GROUP BY id
    """,
)
def graph_cheapest_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    customer = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supplier = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(supplier), lineitem["l_suppkey"] == supplier["s_suppkey"])
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(
            F.min(
                F.datediff(
                    F.col("l_shipdate").cast("date"),
                    F.col("o_orderdate").cast("date"),
                )
            ).alias("w")
        )
        .localCheckpoint()  # 4 relaxation rounds reuse the edge list
    )
    dist = spark.createDataFrame([(0, 0)], "nationkey long, min_cost long")
    for _ in range(4):
        relaxed = (
            dist.join(edges, dist["nationkey"] == edges["src"])
            .select(
                F.col("dst").alias("nationkey"),
                (F.col("min_cost") + F.col("w")).alias("min_cost"),
            )
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("nationkey")
            .agg(F.min("min_cost").alias("min_cost"))
            .localCheckpoint()  # cut the per-round lineage
        )
    return dist


# ---------------------------------------------------------------------------
# As-of join with a match tolerance (pandas merge_asof semantics): the
# latest order at-or-before each event counts only when it is within
# 8640 days (the synthetic orders live in the TPC-H 1990s while events
# are recent, so this threshold splits the population at both fixture
# scales) — stale matches go NULL. The oracle computes the same
# windowed-latest with a correlated lateral and applies the tolerance
# as a filter-to-NULL.
# ---------------------------------------------------------------------------
@register(
    "asof_tolerance",
    """
    WITH ev AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ets, event_id
      FROM events WHERE event_type = 'purchase' AND user_id % 25 = 0),
    mo AS (
      SELECT ev.event_id, ev.user_id, ev.ets,
             (SELECT MAX(CAST(o.o_orderdate AS TIMESTAMP))
              FROM orders o
              WHERE o.o_custkey = ev.user_id
                AND CAST(o.o_orderdate AS TIMESTAMP) <= ev.ets) AS mts
      FROM ev)
    SELECT event_id, user_id,
           CASE WHEN mts IS NOT NULL
                 AND (epoch(ets) - epoch(mts)) <= 8640*24*3600
                THEN CAST(mts AS DATE) END AS last_order_date
    FROM mo
    """,
)
def asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ome_arrow_spark.operators.asof import asof_join

    ev = (
        _events(spark, sf_dir)
        .filter(
            (F.col("event_type") == "purchase") & (F.col("user_id") % 25 == 0)
        )
        .select("event_id", "user_id", "ts")
    )
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey"),
        F.col("o_orderdate").cast("timestamp").alias("o_ts"),
    )
    joined = asof_join(
        ev,
        orders,
        left_on="user_id",
        right_on="o_custkey",
        left_time="ts",
        right_time="o_ts",
        right_values=["o_ts"],
        value_aliases=["last_order_ts"],
        keep=["event_id", "user_id"],
        direction="backward",
        tolerance_seconds=8640 * 24 * 3600,
    )
    return joined.select(
        "event_id", "user_id",
        F.col("last_order_ts").cast("date").alias("last_order_date"),
    )


# ---------------------------------------------------------------------------
# Time-weighted average (the TimescaleDB `time_weight('LOCF')` shape):
# irregular samples weighted by how long each value HELD, not how
# often it was sampled — dt_i = micros to the next event (exact
# bigint via unix_micros/epoch_us), last observation carries no
# weight. Numerator value_i*dt_i rounds to 9 and sums as
# DECIMAL(38,9) (order-independent); the final division runs in
# double on identical inputs. One shuffle on user_id.
# ---------------------------------------------------------------------------
@register(
    "time_weighted_avg",
    """
    WITH r AS (
      SELECT user_id, value,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             LEAD(epoch_us(CAST(ts AS TIMESTAMP)))
               OVER (PARTITION BY user_id
                     ORDER BY CAST(ts AS TIMESTAMP), event_id) AS next_us
      FROM events WHERE user_id % 20 = 5),
    d AS (SELECT user_id,
                 ROUND(value * (next_us - us), 9)::DECIMAL(38,9) AS num,
                 (next_us - us) AS dt
          FROM r WHERE next_us IS NOT NULL)
    SELECT user_id,
           COUNT(*) + 1 AS n_events,
           ROUND(CAST(CAST(SUM(num) AS VARCHAR(64)) AS DOUBLE) / CAST(CAST(SUM(dt) AS VARCHAR(64)) AS DOUBLE), 6)
             AS twa
    FROM d GROUP BY user_id HAVING COUNT(*) >= 1
    """,
)
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).filter(F.col("user_id") % 20 == 5)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    r = ev.select(
        "user_id",
        "value",
        us.alias("us"),
        F.lead(us).over(w).alias("next_us"),
    ).filter(F.col("next_us").isNotNull())
    num = F.round(F.col("value") * (F.col("next_us") - F.col("us")), 9).cast(
        "decimal(38,9)"
    )
    return (
        r.select("user_id", num.alias("num"),
                 (F.col("next_us") - F.col("us")).alias("dt"))
        .groupBy("user_id")
        .agg(
            (F.count("*") + 1).alias("n_events"),
            F.round(
                F.sum("num").cast("double") / F.sum("dt").cast("double"), 6
            ).alias("twa"),
        )
        .filter(F.col("n_events") >= 2)
    )


# ---------------------------------------------------------------------------
# OHLC downsampling (candlesticks): per (user cohort, day) the first/
# highest/lowest/last value with (ts, event_id) as the deterministic
# open/close tiebreak — the time-series compaction shape every
# metrics store needs. Both engines take open/close from row_number
# windows (no arg_min ambiguity), high/low/volume from plain
# aggregation; one shuffle.
# ---------------------------------------------------------------------------
@register(
    "ohlc_downsample",
    """
    WITH e AS (
      SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, value,
             ROW_NUMBER() OVER (PARTITION BY user_id,
                                CAST(CAST(ts AS TIMESTAMP) AS DATE)
                                ORDER BY CAST(ts AS TIMESTAMP), event_id)
               AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY user_id,
                                CAST(CAST(ts AS TIMESTAMP) AS DATE)
                                ORDER BY CAST(ts AS TIMESTAMP) DESC,
                                         event_id DESC) AS rn_d
      FROM events WHERE user_id % 50 = 7)
    SELECT user_id, day,
           ROUND(MIN(CASE WHEN rn_a = 1 THEN value END), 6) AS open,
           ROUND(MAX(value), 6) AS high,
           ROUND(MIN(value), 6) AS low,
           ROUND(MIN(CASE WHEN rn_d = 1 THEN value END), 6) AS close,
           COUNT(*) AS volume
    FROM e GROUP BY user_id, day
    """,
)
def ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).filter(F.col("user_id") % 50 == 7)
    day = F.col("ts").cast("date").alias("day")
    base = ev.select("user_id", day, "value", "ts", "event_id")
    wa = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    wd = Window.partitionBy("user_id", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    r = base.select(
        "user_id",
        "day",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return r.groupBy("user_id", "day").agg(
        F.round(F.min(F.when(F.col("rn_a") == 1, F.col("value"))), 6).alias(
            "open"
        ),
        F.round(F.max("value"), 6).alias("high"),
        F.round(F.min("value"), 6).alias("low"),
        F.round(F.min(F.when(F.col("rn_d") == 1, F.col("value"))), 6).alias(
            "close"
        ),
        F.count("*").alias("volume"),
    )


# ---------------------------------------------------------------------------
# Declarative data-quality expectations (the Deequ / dbt-tests shape):
# a constraint battery evaluated in ONE aggregation pass per table —
# completeness (null fraction), uniqueness (count vs distinct),
# range conformance, set membership — plus one anti-join for
# referential integrity. Output is the standard expectations report:
# (check, target, metric value, passed). Scale: single-pass
# aggregates; the FK check is an anti-join count that AQE broadcasts
# when the dimension is small.
# ---------------------------------------------------------------------------
@register(
    "data_expectations",
    """
    WITH o AS (
      SELECT COUNT(*) AS n,
             COUNT(o_orderkey) AS nn_key,
             COUNT(DISTINCT o_orderkey) AS nd_key,
             SUM(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END) AS n_pos,
             SUM(CASE WHEN o_orderstatus IN ('O','F','P')
                 THEN 1 ELSE 0 END) AS n_status
      FROM orders),
    fk AS (SELECT COUNT(*) AS n_orphans FROM orders
           ANTI JOIN customer ON o_custkey = c_custkey)
    SELECT 'completeness' AS check_name, 'o_orderkey' AS target,
           ROUND(CAST(nn_key AS DOUBLE) / n, 6) AS metric,
           nn_key = n AS passed
    FROM o
    UNION ALL
    SELECT 'uniqueness', 'o_orderkey',
           ROUND(CAST(nd_key AS DOUBLE) / n, 6), nd_key = n FROM o
    UNION ALL
    SELECT 'range_positive', 'o_totalprice',
           ROUND(CAST(n_pos AS DOUBLE) / n, 6), n_pos = n FROM o
    UNION ALL
    SELECT 'set_membership', 'o_orderstatus',
           ROUND(CAST(n_status AS DOUBLE) / n, 6), n_status = n FROM o
    UNION ALL
    SELECT 'referential_integrity', 'o_custkey -> c_custkey',
           CAST(fk.n_orphans AS DOUBLE), fk.n_orphans = 0
    FROM fk
    """,
)
def data_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    agg = o.agg(
        F.count("*").alias("n"),
        F.count("o_orderkey").alias("nn_key"),
        F.countDistinct("o_orderkey").alias("nd_key"),
        F.sum(
            F.when(F.col("o_totalprice") > 0, 1).otherwise(0)
        ).alias("n_pos"),
        F.sum(
            F.when(F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
        ).alias("n_status"),
    )
    orphans = (
        o.join(c, o["o_custkey"] == c["c_custkey"], "left_anti")
        .agg(F.count("*").alias("n_orphans"))
    )
    a = agg.crossJoin(F.broadcast(orphans))
    rows = [
        ("completeness", "o_orderkey",
         F.round(F.col("nn_key").cast("double") / F.col("n"), 6),
         F.col("nn_key") == F.col("n")),
        ("uniqueness", "o_orderkey",
         F.round(F.col("nd_key").cast("double") / F.col("n"), 6),
         F.col("nd_key") == F.col("n")),
        ("range_positive", "o_totalprice",
         F.round(F.col("n_pos").cast("double") / F.col("n"), 6),
         F.col("n_pos") == F.col("n")),
        ("set_membership", "o_orderstatus",
         F.round(F.col("n_status").cast("double") / F.col("n"), 6),
         F.col("n_status") == F.col("n")),
        ("referential_integrity", "o_custkey -> c_custkey",
         F.col("n_orphans").cast("double"),
         F.col("n_orphans") == 0),
    ]
    parts = [
        a.select(
            F.lit(name).alias("check_name"),
            F.lit(target).alias("target"),
            metric.alias("metric"),
            passed.alias("passed"),
        )
        for name, target, metric, passed in rows
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# k-anonymity audit (privacy tooling's core check): group by the
# quasi-identifier tuple and report equivalence classes smaller than
# k — each is a re-identification risk. One shuffle on the QI tuple;
# the anonymity level of the whole table is the min class size.
# ---------------------------------------------------------------------------
@register(
    "k_anonymity",
    """
    WITH qi AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS class_size
      FROM customer GROUP BY c_nationkey, c_mktsegment)
    SELECT c_nationkey, c_mktsegment, class_size,
           class_size < 5 AS below_k
    FROM qi WHERE class_size < 5
    UNION ALL
    SELECT CAST(-1 AS BIGINT), 'TABLE_MIN',
           MIN(class_size), MIN(class_size) < 5
    FROM qi
    """,
)
def k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    qi = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("class_size")
    )
    small = qi.filter(F.col("class_size") < 5).select(
        "c_nationkey",
        "c_mktsegment",
        "class_size",
        (F.col("class_size") < 5).alias("below_k"),
    )
    summary = qi.agg(
        F.lit(-1).cast("bigint").alias("c_nationkey"),
        F.lit("TABLE_MIN").alias("c_mktsegment"),
        F.min("class_size").alias("class_size"),
        (F.min("class_size") < 5).alias("below_k"),
    )
    return small.unionByName(summary)


# ---------------------------------------------------------------------------
# Band join (|t_a - t_b| <= delta) as a BUCKETED EQUI-JOIN — the scale
# formulation of numeric-proximity joins: a theta/range condition
# alone forces a nested-loop/cartesian plan, but on a delta-wide
# bucket grid two in-band rows are always in the same or adjacent
# buckets, so exploding one side to {b-1, b, b+1} turns the join into
# a plain hash equi-join + exact residual filter. Each qualifying
# pair meets exactly once (the probe row keeps its single bucket).
# The oracle is the naive theta join — value equality proves the
# rewrite; tests/test_plans.py proves no nested-loop survives.
# ---------------------------------------------------------------------------
@register(
    "band_join_bucketed",
    """
    WITH e AS (SELECT event_id, event_type,
                      epoch_us(CAST(ts AS TIMESTAMP)) AS us
               FROM events WHERE user_id % 20 = 3),
    a AS (SELECT event_id AS click_id, us AS a_us FROM e
          WHERE event_type = 'click'),
    b AS (SELECT event_id AS purchase_id, us AS b_us FROM e
          WHERE event_type = 'purchase')
    SELECT click_id, purchase_id, b_us - a_us AS dt_us
    FROM a JOIN b ON ABS(b_us - a_us) <= 3600000000
    """,
)
def band_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    W = 3_600_000_000  # one-hour band, microseconds
    ev = _events(spark, sf_dir).filter(F.col("user_id") % 20 == 3).select(
        "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    a = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("us").alias("a_us"),
        F.explode(
            F.array(
                F.floor(F.col("us") / W) - 1,
                F.floor(F.col("us") / W),
                F.floor(F.col("us") / W) + 1,
            )
        ).alias("bucket"),
    )
    b = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("us").alias("b_us"),
        F.floor(F.col("us") / W).alias("bucket"),
    )
    return (
        a.join(b, "bucket")
        .filter(F.abs(F.col("b_us") - F.col("a_us")) <= W)
        .select(
            "click_id",
            "purchase_id",
            (F.col("b_us") - F.col("a_us")).alias("dt_us"),
        )
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint detection over daily event counts: the classic
# level-shift locator — cumulative sum of (count - series mean) peaks
# in magnitude at the day the regime changes. All arithmetic is exact:
# integer counts, DECIMAL mean, DECIMAL running sums (a window
# cumulative sum of decimals is order-fixed AND exact), so both
# engines agree bit-for-bit; |CUSUM| argmax ties break on day. One
# shuffle (per-type repartition) after the daily pre-aggregation.
# ---------------------------------------------------------------------------
@register(
    "cusum_changepoint",
    """
    WITH d AS (
      SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    m AS (SELECT event_type,
                 CAST(SUM(n) AS DECIMAL(28,9)) / COUNT(*) AS mu,
                 COUNT(*) AS n_days
          FROM d GROUP BY event_type),
    c AS (SELECT d.event_type, d.day, m.n_days,
                 SUM(CAST(d.n AS DECIMAL(28,9)) - m.mu)
                   OVER (PARTITION BY d.event_type ORDER BY d.day)
                   AS cusum
          FROM d JOIN m USING (event_type)),
    r AS (SELECT event_type, day, n_days, cusum,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY ABS(cusum) DESC, day) AS rk
          FROM c)
    SELECT event_type, day AS changepoint_day,
           ROUND(CAST(ABS(cusum) AS DOUBLE), 6) AS max_cusum, n_days
    FROM r WHERE rk = 1
    """,
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").alias("n"))
    m = d.groupBy("event_type").agg(
        (
            F.sum("n").cast("decimal(28,9)") / F.count("*")
        ).alias("mu"),
        F.count("*").alias("n_days"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    c = (
        d.join(m, "event_type")
        .withColumn(
            "cusum",
            F.sum(F.col("n").cast("decimal(28,9)") - F.col("mu")).over(w),
        )
    )
    rw = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum")).desc(), "day"
    )
    return (
        c.withColumn("rk", F.row_number().over(rw))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("day").alias("changepoint_day"),
            F.round(F.abs(F.col("cusum")).cast("double"), 6).alias(
                "max_cusum"
            ),
            "n_days",
        )
    )


# ---------------------------------------------------------------------------
# Equi-DEPTH histogram (quantile-bucketed, the optimizer-statistics
# shape): ntile(8) over order totals — every bucket holds the same row
# count (±1) and the bucket edges ARE the octile boundaries, unlike
# the fixed-width histogram_totalprice. ntile with a (value, key)
# tiebreak is fully deterministic. Scale note: a global ntile window
# single-partitions the sort — fine for the gate fixture and the
# oracle contract, but the 100 TB formulation computes the 8 octile
# edges once (approx_percentile or the KMV sample) and buckets rows
# with a broadcast range lookup: one scan, no global sort, same
# output within sketch error.
# ---------------------------------------------------------------------------
@register(
    "histogram_equidepth",
    """
    WITH t AS (
      SELECT o_totalprice,
             NTILE(8) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
      FROM orders)
    SELECT CAST(bucket AS INTEGER) AS bucket, COUNT(*) AS n,
           MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
    FROM t GROUP BY bucket
    """,
)
def histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.select("o_totalprice", F.ntile(8).over(w).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


# ---------------------------------------------------------------------------
# 2D SKYLINE (Pareto frontier): maximize l_extendedprice, minimize
# l_discount. The Spark side is the one-pass window formulation —
# group by price, take each group's min discount, running strict min
# over higher-price groups decides survival (O(n log n), one sort) —
# while the oracle is the O(n²) NOT-EXISTS *definition* of dominance:
# value equality proves the window algorithm implements the
# definition. Ties: equal (price, discount) points co-survive (no
# strict dominance), equal-price-worse-discount points die.
# ---------------------------------------------------------------------------
@register(
    "skyline_pareto",
    """
    WITH pts AS (
      SELECT l_orderkey, l_linenumber, l_extendedprice AS x, l_discount AS y
      FROM lineitem WHERE l_orderkey % 997 = 1),
    sky AS (
      SELECT p.* FROM pts p
      WHERE NOT EXISTS (
        SELECT 1 FROM pts q
        WHERE q.x >= p.x AND q.y <= p.y AND (q.x > p.x OR q.y < p.y)))
    SELECT l_orderkey, l_linenumber, x AS price, y AS discount FROM sky
    """,
)
def skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 997 == 1
    )
    pts = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").alias("x"),
        F.col("l_discount").alias("y"),
    )
    g = pts.groupBy("x").agg(F.min("y").alias("my"))
    w = Window.orderBy(F.col("x").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    sky_x = g.withColumn("prev_min", F.min("my").over(w)).filter(
        F.col("prev_min").isNull() | (F.col("my") < F.col("prev_min"))
    )
    return (
        pts.join(sky_x.select("x", "my"), "x")
        .filter(F.col("y") == F.col("my"))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("x").alias("price"),
            F.col("y").alias("discount"),
        )
    )


# ---------------------------------------------------------------------------
# Markov transition matrix over per-user event sequences — the
# behavior-model estimate P(next_type | type): one lead() window per
# user (ordered by ts with the event_id tiebreak), count transitions,
# divide by the source state's total (exact ints, one identical
# double division). One shuffle on user_id + one on the pair.
# ---------------------------------------------------------------------------
@register(
    "markov_transitions",
    """
    WITH s AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP), event_id) AS next_type
      FROM events),
    t AS (SELECT event_type, next_type, COUNT(*) AS n
          FROM s WHERE next_type IS NOT NULL
          GROUP BY event_type, next_type),
    tot AS (SELECT event_type, SUM(n) AS n_from FROM t GROUP BY event_type)
    SELECT t.event_type, t.next_type, t.n,
           ROUND(CAST(t.n AS DOUBLE) / tot.n_from, 6) AS p
    FROM t JOIN tot USING (event_type)
    """,
)
def markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    t = s.groupBy("event_type", "next_type").agg(F.count("*").alias("n"))
    tot = t.groupBy("event_type").agg(F.sum("n").alias("n_from"))
    return t.join(tot, "event_type").select(
        "event_type",
        "next_type",
        "n",
        F.round(F.col("n").cast("double") / F.col("n_from"), 6).alias("p"),
    )


# ---------------------------------------------------------------------------
# WOE / IV feature binning (the credit-scoring staple): bin customers
# by account-balance quartile (deterministic ntile), label them
# high/low spenders against the exact DECIMAL mean of per-customer
# order totals, and report each bin's Weight of Evidence
# ln((good_i/G)/(bad_i/B)) plus the feature's total Information
# Value as a round-9 DECIMAL sum (order-independent). Every division
# runs on identical integers/doubles in both engines. The good/bad
# counts are CAST(... AS BIGINT) in the oracle because DuckDB's SUM
# over integers yields HUGEINT (int128), which the driver's Arrow
# hash path renders differently from Spark's bigint even when the
# values are equal (the r8 hash-mismatch root cause).
# ---------------------------------------------------------------------------
@register(
    "woe_binning",
    """
    WITH spend AS (
      SELECT c_custkey, c_acctbal,
             COALESCE(SUM(CAST(o_totalprice AS DECIMAL(30,6))), 0) AS sp
      FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      GROUP BY c_custkey, c_acctbal),
    m AS (SELECT CAST(SUM(sp) AS DECIMAL(38,6)) / COUNT(*) AS mu FROM spend),
    lab AS (SELECT c_custkey, c_acctbal,
                   CASE WHEN sp > m.mu THEN 1 ELSE 0 END AS good
            FROM spend, m),
    b AS (SELECT *, NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS bin
          FROM lab),
    agg AS (SELECT bin, SUM(good) AS g, SUM(1 - good) AS bad FROM b
            GROUP BY bin),
    tot AS (SELECT SUM(g) AS gt, SUM(bad) AS bt FROM agg),
    woe AS (SELECT bin, g, bad,
              ROUND(LN((CAST(g AS DOUBLE) / gt) / (CAST(bad AS DOUBLE) / bt)),
                    6) AS woe,
              ROUND((CAST(g AS DOUBLE) / gt - CAST(bad AS DOUBLE) / bt)
                    * LN((CAST(g AS DOUBLE) / gt)
                         / (CAST(bad AS DOUBLE) / bt)), 9)::DECIMAL(20,9)
                AS iv_term
            FROM agg, tot)
    SELECT CAST(bin AS INT) AS bin, CAST(g AS BIGINT) AS n_good,
           CAST(bad AS BIGINT) AS n_bad, woe,
           (SELECT ROUND(CAST(CAST(SUM(iv_term) AS VARCHAR(64)) AS DOUBLE), 6) FROM woe) AS iv
    FROM woe
    """,
)
def woe_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    spend = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg(
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(30,6)")),
                F.lit(0).cast("decimal(30,6)"),
            ).alias("sp")
        )
    )
    m = spend.agg(
        (F.sum("sp").cast("decimal(38,6)") / F.count("*")).alias("mu")
    )
    lab = spend.crossJoin(F.broadcast(m)).select(
        "c_custkey",
        "c_acctbal",
        F.when(F.col("sp") > F.col("mu"), 1).otherwise(0).alias("good"),
    )
    b = lab.withColumn(
        "bin", F.ntile(4).over(Window.orderBy("c_acctbal", "c_custkey"))
    )
    agg = b.groupBy("bin").agg(
        F.sum("good").alias("g"), F.sum(1 - F.col("good")).alias("bad")
    )
    tot = agg.agg(F.sum("g").alias("gt"), F.sum("bad").alias("bt"))
    gshare = F.col("g").cast("double") / F.col("gt")
    bshare = F.col("bad").cast("double") / F.col("bt")
    woe = agg.crossJoin(F.broadcast(tot)).select(
        "bin",
        "g",
        "bad",
        F.round(F.log(gshare / bshare), 6).alias("woe"),
        F.round((gshare - bshare) * F.log(gshare / bshare), 9)
        .cast("decimal(20,9)")
        .alias("iv_term"),
    )
    iv = woe.agg(
        F.round(F.sum("iv_term").cast("double"), 6).alias("iv")
    )
    return woe.crossJoin(F.broadcast(iv)).select(
        F.col("bin").cast("int").alias("bin"),
        F.col("g").alias("n_good"),
        F.col("bad").alias("n_bad"),
        "woe",
        "iv",
    )


# ---------------------------------------------------------------------------
# Frequent itemset mining (market-basket 2-itemsets with lift): which
# part brands co-occur in an order beyond chance. Baskets are DISTINCT
# brands per order; pair candidates come from the within-basket
# self-join (bounded by basket size, never an all-pairs over orders);
# support and lift are exact integer counts + identical double
# divisions. The apriori property is explicit: pair supports are
# computed only for pairs whose BOTH members pass the item minsup.
# ---------------------------------------------------------------------------
@register(
    "frequent_itemsets",
    """
    WITH basket AS (
      SELECT DISTINCT l_orderkey, p_brand
      FROM lineitem JOIN part ON l_partkey = p_partkey),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM basket),
    item AS (SELECT p_brand, COUNT(*) AS sup FROM basket GROUP BY p_brand
             HAVING COUNT(*) >= 50),
    pair AS (
      SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, COUNT(*) AS sup_ab
      FROM basket a JOIN basket b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      JOIN item ia ON ia.p_brand = a.p_brand
      JOIN item ib ON ib.p_brand = b.p_brand
      GROUP BY 1, 2 HAVING COUNT(*) >= 20)
    SELECT brand_a, brand_b, sup_ab,
           ROUND(CAST(sup_ab AS DOUBLE) * n.n_orders
                 / (ia.sup * ib.sup), 6) AS lift
    FROM pair
    JOIN item ia ON ia.p_brand = brand_a
    JOIN item ib ON ib.p_brand = brand_b, n
    """,
)
def frequent_itemsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    basket = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    n = basket.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    item = (
        basket.groupBy("p_brand")
        .agg(F.count("*").alias("sup"))
        .filter(F.col("sup") >= 50)
    )
    a = basket.select(
        F.col("l_orderkey"), F.col("p_brand").alias("brand_a")
    ).join(item.select(F.col("p_brand").alias("brand_a")), "brand_a")
    b = basket.select(
        F.col("l_orderkey"), F.col("p_brand").alias("brand_b")
    ).join(item.select(F.col("p_brand").alias("brand_b")), "brand_b")
    pair = (
        a.join(b, "l_orderkey")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("sup_ab"))
        .filter(F.col("sup_ab") >= 20)
    )
    return (
        pair.join(
            item.select(
                F.col("p_brand").alias("brand_a"), F.col("sup").alias("sa")
            ),
            "brand_a",
        )
        .join(
            item.select(
                F.col("p_brand").alias("brand_b"), F.col("sup").alias("sb")
            ),
            "brand_b",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            "sup_ab",
            F.round(
                F.col("sup_ab").cast("double")
                * F.col("n_orders")
                / (F.col("sa") * F.col("sb")),
                6,
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# Per-segment OLS trend over daily revenue: closed-form slope/intercept
# from exact sufficient statistics. Day totals sum round(value,9)
# decimals (order-independent, exact); Sx/Sxx are exact bigints; the
# final slope/intercept arithmetic runs in doubles with an identical
# expression tree on both engines, rounded after. One shuffle to the
# daily grain, one to the per-type stats — no window, no sort.
# ---------------------------------------------------------------------------
@register(
    "ols_trend",
    """
    WITH d AS (
      SELECT event_type,
             DATE_DIFF('day', DATE '2024-01-01',
                       CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS x,
             SUM(CAST(ROUND(value, 9) AS DECIMAL(20,9))) AS y
      FROM events GROUP BY 1, 2),
    s AS (
      SELECT event_type,
             COUNT(*) AS n_days,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(CAST(SUM(y) AS VARCHAR(64)) AS DOUBLE) AS sy,
             CAST(CAST(SUM(CAST(x AS DECIMAL(10,0)) * y) AS VARCHAR(64)) AS DOUBLE) AS sxy
      FROM d GROUP BY event_type)
    SELECT event_type, n_days,
           ROUND((n_days * sxy - sx * sy)
                 / (n_days * sxx - CAST(sx AS DOUBLE) * sx), 6) AS slope,
           ROUND((sy - (n_days * sxy - sx * sy)
                       / (n_days * sxx - CAST(sx AS DOUBLE) * sx) * sx)
                 / n_days, 6) AS intercept
    FROM s ORDER BY event_type
    """,
)
def ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    d = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01")).alias("x"),
    ).agg(F.sum(F.round("value", 9).cast("decimal(20,9)")).alias("y"))
    s = d.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x").cast("decimal(10,0)") * F.col("y"))
        .cast("double")
        .alias("sxy"),
    )
    n, sx = F.col("n_days"), F.col("sx")
    sxx, sy, sxy = F.col("sxx"), F.col("sy"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx.cast("double") * sx)
    return s.select(
        "event_type",
        "n_days",
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Autocorrelation (ACF lags 1-3) of the daily event-count series per
# type — the seasonality probe run before picking a forecast window.
# Deviations from the mean are exact decimals (the proven cusum
# recipe); each lag product is one deterministic double multiply,
# rounded and summed as decimals so the aggregation order can't leak
# in. One daily-grain shuffle + one window per series; the three lags
# reuse the SAME lead window (consecutive LEADs, no extra shuffle).
# ---------------------------------------------------------------------------
@register(
    "acf_daily",
    """
    WITH d AS (
      SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    m AS (SELECT event_type,
                 CAST(SUM(n) AS DECIMAL(28,9)) / COUNT(*) AS mu
          FROM d GROUP BY event_type),
    dv AS (SELECT d.event_type, d.day,
                  CAST(CAST(d.n AS DECIMAL(28,9)) - m.mu AS DOUBLE) AS dy
           FROM d JOIN m USING (event_type)),
    ld AS (SELECT event_type, day, dy,
                  LEAD(dy, 1) OVER w AS dy1,
                  LEAD(dy, 2) OVER w AS dy2,
                  LEAD(dy, 3) OVER w AS dy3
           FROM dv WINDOW w AS (PARTITION BY event_type ORDER BY day)),
    s AS (SELECT event_type,
                 COUNT(*) AS n_days,
                 SUM(CAST(ROUND(dy * dy, 9) AS DECIMAL(20,9))) AS den,
                 SUM(CAST(ROUND(dy * dy1, 9) AS DECIMAL(20,9))) AS num1,
                 SUM(CAST(ROUND(dy * dy2, 9) AS DECIMAL(20,9))) AS num2,
                 SUM(CAST(ROUND(dy * dy3, 9) AS DECIMAL(20,9))) AS num3
          FROM ld GROUP BY event_type)
    SELECT event_type, lag,
           ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS acf,
           CAST(n_days AS BIGINT) AS n_days
    FROM (
      SELECT event_type, 1 AS lag, num1 AS num, den, n_days FROM s
      UNION ALL
      SELECT event_type, 2, num2, den, n_days FROM s
      UNION ALL
      SELECT event_type, 3, num3, den, n_days FROM s)
    ORDER BY event_type, lag
    """,
)
def acf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").alias("n"))
    m = d.groupBy("event_type").agg(
        (F.sum("n").cast("decimal(28,9)") / F.count("*")).alias("mu")
    )
    dv = d.join(m, "event_type").select(
        "event_type",
        "day",
        (F.col("n").cast("decimal(28,9)") - F.col("mu"))
        .cast("double")
        .alias("dy"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    ld = dv.select(
        "event_type",
        "dy",
        *[F.lead("dy", k).over(w).alias(f"dy{k}") for k in (1, 2, 3)],
    )

    def dec_sum(prod):
        return F.sum(F.round(prod, 9).cast("decimal(20,9)"))

    s = ld.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        dec_sum(F.col("dy") * F.col("dy")).alias("den"),
        *[
            dec_sum(F.col("dy") * F.col(f"dy{k}")).alias(f"num{k}")
            for k in (1, 2, 3)
        ],
    )
    lags = None
    for k in (1, 2, 3):
        part = s.select(
            "event_type",
            F.lit(k).alias("lag"),
            F.round(
                F.col(f"num{k}").cast("double") / F.col("den").cast("double"),
                6,
            ).alias("acf"),
            F.col("n_days").cast("bigint").alias("n_days"),
        )
        lags = part if lags is None else lags.unionByName(part)
    return lags.orderBy("event_type", "lag")


# ---------------------------------------------------------------------------
# Two-proportion z-test (A/B experiment readout): variant by user-id
# parity, conversion = user ever purchased. Everything derives from
# four exact integers (per-variant users and converters); the z
# arithmetic is one double expression tree shared verbatim by both
# engines. Two shuffles total (user collapse, variant rollup) and a
# single-row output — the shape that runs unchanged on 10^10 users.
# ---------------------------------------------------------------------------
@register(
    "ab_test_proportions",
    """
    WITH u AS (
      SELECT user_id % 2 AS variant,
             MAX(CASE WHEN event_type = 'purchase' AND value >= 200
                      THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id),
    v AS (SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(conv) AS BIGINT) AS c
          FROM u GROUP BY variant),
    w AS (SELECT
            MAX(CASE WHEN variant = 0 THEN n END) AS n_a,
            MAX(CASE WHEN variant = 0 THEN c END) AS conv_a,
            MAX(CASE WHEN variant = 1 THEN n END) AS n_b,
            MAX(CASE WHEN variant = 1 THEN c END) AS conv_b
          FROM v)
    SELECT n_a, conv_a, n_b, conv_b,
           ROUND(CAST(conv_a AS DOUBLE) / n_a, 6) AS p_a,
           ROUND(CAST(conv_b AS DOUBLE) / n_b, 6) AS p_b,
           ROUND((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
                 / SQRT((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                        * (1 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)), 6) AS z_score
    FROM w
    """,
)
def ab_test_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    u = (
        ev.groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") >= 200),
                    1,
                ).otherwise(0)
            ).alias("conv"),
        )
        .select((F.col("user_id") % 2).alias("variant"), "conv")
    )
    v = u.groupBy("variant").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("conv").cast("bigint").alias("c"),
    )
    w = v.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("variant") == 0, F.col("c"))).alias("conv_a"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("variant") == 1, F.col("c"))).alias("conv_b"),
    )
    n_a, c_a = F.col("n_a"), F.col("conv_a")
    n_b, c_b = F.col("n_b"), F.col("conv_b")
    pool = (c_a + c_b).cast("double") / (n_a + n_b)
    z = (c_a.cast("double") / n_a - c_b.cast("double") / n_b) / F.sqrt(
        pool * (1 - pool) * (F.lit(1.0) / n_a + F.lit(1.0) / n_b)
    )
    return w.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.round(c_a.cast("double") / n_a, 6).alias("p_a"),
        F.round(c_b.cast("double") / n_b, 6).alias("p_b"),
        F.round(z, 6).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# RFM segmentation: per-customer recency/frequency/monetary quartiles
# (ntile(4) with full (metric, custkey) tiebreaks — deterministic in
# both engines), rolled up to segment counts. Monetary sums are exact
# DECIMAL(18,2). Scale note: the three global ntile windows each
# single-partition their sort at gate scale; the 100 TB formulation
# computes the three quartile edges once (approx_percentile / KMV
# sample) and buckets with a broadcast lookup — same segments, one
# scan, no global sort (the histogram_equidepth note applies).
# ---------------------------------------------------------------------------
@register(
    "rfm_segments",
    """
    WITH mx AS (SELECT MAX(CAST(o_orderdate AS TIMESTAMP)) AS mx FROM orders),
    base AS (
      SELECT o_custkey,
             DATE_DIFF('day',
                       CAST(MAX(CAST(o_orderdate AS TIMESTAMP)) AS DATE),
                       CAST((SELECT mx FROM mx) AS DATE)) AS r_days,
             CAST(COUNT(*) AS BIGINT) AS freq,
             SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2))) AS monetary
      FROM orders GROUP BY o_custkey),
    q AS (SELECT o_custkey, r_days, freq, monetary,
                 NTILE(4) OVER (ORDER BY r_days, o_custkey) AS r_q,
                 NTILE(4) OVER (ORDER BY freq DESC, o_custkey) AS f_q,
                 NTILE(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_q
          FROM base)
    SELECT CAST(r_q AS INT) AS r_q, CAST(f_q AS INT) AS f_q,
           CAST(m_q AS INT) AS m_q,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(CAST(SUM(monetary) AS VARCHAR(64)) AS DOUBLE) / COUNT(*) AS avg_monetary
    FROM q GROUP BY r_q, f_q, m_q
    ORDER BY r_q, f_q, m_q
    """,
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    mx = o.agg(F.max(F.col("o_orderdate")).alias("mx"))
    base = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").cast("bigint").alias("freq"),
            F.sum(F.round("o_totalprice", 2).cast("decimal(18,2)")).alias(
                "monetary"
            ),
        )
        .crossJoin(F.broadcast(mx))
        .select(
            "o_custkey",
            F.datediff(
                F.col("mx").cast("date"), F.col("last_order").cast("date")
            ).alias("r_days"),
            "freq",
            "monetary",
        )
    )
    q = base.select(
        "o_custkey",
        F.ntile(4)
        .over(Window.orderBy("r_days", "o_custkey"))
        .alias("r_q"),
        F.ntile(4)
        .over(Window.orderBy(F.desc("freq"), "o_custkey"))
        .alias("f_q"),
        F.ntile(4)
        .over(Window.orderBy(F.desc("monetary"), "o_custkey"))
        .alias("m_q"),
        "monetary",
    )
    return (
        q.groupBy(
            F.col("r_q").cast("int").alias("r_q"),
            F.col("f_q").cast("int").alias("f_q"),
            F.col("m_q").cast("int").alias("m_q"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            (F.sum("monetary").cast("double") / F.count("*")).alias(
                "avg_monetary"
            ),
        )
        .orderBy("r_q", "f_q", "m_q")
    )


# ---------------------------------------------------------------------------
# Top user paths: each user's FIRST three event types in time order,
# joined into a path string, ranked by frequency — the product-
# analytics "common journeys" readout (distinct from markov_transitions,
# which is the memoryless pairwise matrix). One shuffle to the per-user
# ordered fold (sort_array of (ts, event_id, type) structs — unique
# tiebreak, engine-portable), one to the path count; top-10 via
# orderBy+limit (TakeOrdered, no global row_number).
# ---------------------------------------------------------------------------
@register(
    "top_paths",
    """
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
                      event_type FROM events),
    p AS (
      SELECT user_id,
             array_to_string(
               list_slice(list(event_type ORDER BY ts, event_id), 1, 3),
               '>') AS path
      FROM e GROUP BY user_id)
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM p GROUP BY path
    ORDER BY n_users DESC, path LIMIT 10
    """,
)
def top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    p = (
        ev.groupBy("user_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("seq")
        )
        .select(
            F.array_join(
                F.transform(
                    F.slice("seq", 1, 3), lambda s: s["event_type"]
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        p.groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n_users"))
        .orderBy(F.desc("n_users"), "path")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Key-distribution Gini coefficient — the skew diagnostic behind the
# salting decision, as one number per join key: G = 2·Σ(i·x_i)/(n·Σx)
# − (n+1)/n over ascending per-key counts. Σ(i·x_i) and Σx are exact
# bigints (row_number with a (count, key) tiebreak), the final formula
# one shared double tree. Two keys profiled: orders per customer and
# lineitems per part. The rank window partitions by key_col — two
# serial sorts at gate scale; at 100 TB the same statistic comes from
# a quantile sketch of the count distribution (edges, not ranks).
# ---------------------------------------------------------------------------
@register(
    "key_gini",
    """
    WITH ks AS (
      SELECT 'orders_per_customer' AS key_col,
             CAST(o_custkey AS BIGINT) AS key_val, COUNT(*) AS x
      FROM orders GROUP BY o_custkey
      UNION ALL
      SELECT 'lineitems_per_part', CAST(l_partkey AS BIGINT), COUNT(*)
      FROM lineitem GROUP BY l_partkey),
    r AS (SELECT key_col, x,
                 ROW_NUMBER() OVER (PARTITION BY key_col
                                    ORDER BY x, key_val) AS i
          FROM ks),
    s AS (SELECT key_col,
                 CAST(COUNT(*) AS BIGINT) AS n_keys,
                 CAST(SUM(x) AS BIGINT) AS total,
                 CAST(MAX(x) AS BIGINT) AS max_count,
                 CAST(SUM(i * x) AS BIGINT) AS wsum
          FROM r GROUP BY key_col)
    SELECT key_col, n_keys, total, max_count,
           ROUND(2.0 * wsum / (CAST(n_keys AS DOUBLE) * total)
                 - (n_keys + 1.0) / n_keys, 6) AS gini
    FROM s ORDER BY key_col
    """,
)
def key_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    ks = (
        o.groupBy(F.col("o_custkey").cast("long").alias("key_val"))
        .agg(F.count("*").alias("x"))
        .select(F.lit("orders_per_customer").alias("key_col"), "key_val", "x")
        .unionByName(
            li.groupBy(F.col("l_partkey").cast("long").alias("key_val"))
            .agg(F.count("*").alias("x"))
            .select(
                F.lit("lineitems_per_part").alias("key_col"), "key_val", "x"
            )
        )
    )
    w = Window.partitionBy("key_col").orderBy("x", "key_val")
    r = ks.withColumn("i", F.row_number().over(w))
    s = r.groupBy("key_col").agg(
        F.count("*").cast("bigint").alias("n_keys"),
        F.sum("x").cast("bigint").alias("total"),
        F.max("x").cast("bigint").alias("max_count"),
        F.sum(F.col("i") * F.col("x")).cast("bigint").alias("wsum"),
    )
    return s.select(
        "key_col",
        "n_keys",
        "total",
        "max_count",
        F.round(
            F.lit(2.0) * F.col("wsum")
            / (F.col("n_keys").cast("double") * F.col("total"))
            - (F.col("n_keys") + F.lit(1.0)) / F.col("n_keys"),
            6,
        ).alias("gini"),
    ).orderBy("key_col")


# ---------------------------------------------------------------------------
# l-diversity audit — k_anonymity's sibling: a class can be large (k
# safe) yet expose its members if the SENSITIVE attribute is uniform
# inside it. Per quasi-identifier class, the count of distinct
# sensitive values (acctbal band); classes with l < 3 plus the table
# minimum. One aggregation over the same QI grouping k_anonymity uses.
# ---------------------------------------------------------------------------
@register(
    "l_diversity",
    """
    WITH b AS (
      SELECT c_nationkey, c_mktsegment,
             CASE WHEN c_acctbal < 0 THEN 'debt'
                  WHEN c_acctbal < 3000 THEN 'low'
                  WHEN c_acctbal < 7000 THEN 'mid'
                  ELSE 'high' END AS sens
      FROM customer),
    qi AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(COUNT(*) AS BIGINT) AS class_size,
             CAST(COUNT(DISTINCT sens) AS BIGINT) AS l
      FROM b GROUP BY c_nationkey, c_mktsegment)
    SELECT c_nationkey, c_mktsegment, class_size, l, l < 3 AS below_l
    FROM qi WHERE l < 3
    UNION ALL
    SELECT CAST(-1 AS INT), 'TABLE_MIN', MIN(class_size), MIN(l),
           MIN(l) < 3
    FROM qi
    """,
)
def l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    sens = (
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
    )
    qi = (
        c.select("c_nationkey", "c_mktsegment", sens.alias("sens"))
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count("*").cast("bigint").alias("class_size"),
            F.countDistinct("sens").cast("bigint").alias("l"),
        )
    )
    small = qi.filter(F.col("l") < 3).select(
        "c_nationkey", "c_mktsegment", "class_size", "l",
        (F.col("l") < 3).alias("below_l"),
    )
    summary = qi.agg(
        F.lit(-1).cast("int").alias("c_nationkey"),
        F.lit("TABLE_MIN").alias("c_mktsegment"),
        F.min("class_size").alias("class_size"),
        F.min("l").alias("l"),
        (F.min("l") < 3).alias("below_l"),
    )
    return small.unionByName(summary)


# ---------------------------------------------------------------------------
# Benford leading-digit audit — the classic fraud/synthetic-data probe:
# observed first-digit shares of order totals vs log10(1 + 1/d), with
# per-digit chi-square contributions. Digit extraction uses floor/
# log10 on positive doubles (identical across engines); counts exact;
# the share/expected/chi2 arithmetic one shared double tree. One
# aggregation, nine-row output.
# ---------------------------------------------------------------------------
@register(
    "benford_digits",
    """
    WITH d AS (
      SELECT CAST(FLOOR(o_totalprice
                        / POWER(10, FLOOR(LOG10(o_totalprice)))) AS INT)
               AS digit
      FROM orders WHERE o_totalprice > 0),
    c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
    SELECT digit, n,
           ROUND(CAST(n AS DOUBLE) / t.total, 6) AS share,
           ROUND(LOG10(1.0 + 1.0 / digit), 6) AS benford_p,
           ROUND(POWER(CAST(n AS DOUBLE) / t.total
                       - LOG10(1.0 + 1.0 / digit), 2)
                 / LOG10(1.0 + 1.0 / digit) * t.total, 6) AS chi2_term
    FROM c, t ORDER BY digit
    """,
)
def benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    d = o.select(
        F.floor(
            F.col("o_totalprice")
            / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
        )
        .cast("int")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count("*").cast("bigint").alias("n"))
    t = c.agg(F.sum("n").cast("bigint").alias("total"))
    share = F.col("n").cast("double") / F.col("total")
    bp = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "digit",
            "n",
            F.round(share, 6).alias("share"),
            F.round(bp, 6).alias("benford_p"),
            F.round(
                F.pow(share - bp, F.lit(2)) / bp * F.col("total"), 6
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


# ---------------------------------------------------------------------------
# SCALE TWINS of the two ntile queries (VERDICT r9 "Next round" #4).
# Same outputs, same oracles — but computed via
# operators/quantiles.equidepth_bucket: per-value hash counts, a
# cumulative window over the DISTINCT-value relation only, boundary
# tuples broadcast as ≤ k-1 literals, map-side bucket assignment. The
# fact table is never globally sorted (no single-partition window
# exchange — pinned by tests/test_quantiles.py and the PLANS.md row).
# Registering them against the NTILE oracles is the exactness proof:
# the driver hashes the no-sort formulation against the sort-defined
# semantics cross-engine.
# ---------------------------------------------------------------------------
@register(
    "histogram_equidepth_scale",
    """
    WITH t AS (
      SELECT o_totalprice,
             NTILE(8) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
      FROM orders)
    SELECT CAST(bucket AS INTEGER) AS bucket, COUNT(*) AS n,
           MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
    FROM t GROUP BY bucket
    """,
)
def histogram_equidepth_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ome_arrow_spark.operators.quantiles import equidepth_bucket

    o = _t(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    b = equidepth_bucket(o, "o_totalprice", "o_orderkey", 8)
    return b.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )


@register(
    "rfm_segments_scale",
    """
    WITH mx AS (SELECT MAX(CAST(o_orderdate AS TIMESTAMP)) AS mx FROM orders),
    base AS (
      SELECT o_custkey,
             DATE_DIFF('day',
                       CAST(MAX(CAST(o_orderdate AS TIMESTAMP)) AS DATE),
                       CAST((SELECT mx FROM mx) AS DATE)) AS r_days,
             CAST(COUNT(*) AS BIGINT) AS freq,
             SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2))) AS monetary
      FROM orders GROUP BY o_custkey),
    q AS (SELECT o_custkey, r_days, freq, monetary,
                 NTILE(4) OVER (ORDER BY r_days, o_custkey) AS r_q,
                 NTILE(4) OVER (ORDER BY freq DESC, o_custkey) AS f_q,
                 NTILE(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_q
          FROM base)
    SELECT CAST(r_q AS INT) AS r_q, CAST(f_q AS INT) AS f_q,
           CAST(m_q AS INT) AS m_q,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(CAST(SUM(monetary) AS VARCHAR(64)) AS DOUBLE) / COUNT(*) AS avg_monetary
    FROM q GROUP BY r_q, f_q, m_q
    ORDER BY r_q, f_q, m_q
    """,
)
def rfm_segments_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ome_arrow_spark.operators.quantiles import equidepth_bucket

    o = _t(spark, sf_dir, "orders")
    mx = o.agg(F.max(F.col("o_orderdate")).alias("mx"))
    base = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").cast("bigint").alias("freq"),
            F.sum(F.round("o_totalprice", 2).cast("decimal(18,2)")).alias(
                "monetary"
            ),
        )
        .crossJoin(F.broadcast(mx))
        .select(
            "o_custkey",
            F.datediff(
                F.col("mx").cast("date"), F.col("last_order").cast("date")
            ).alias("r_days"),
            "freq",
            "monetary",
        )
    )
    base = equidepth_bucket(base, "r_days", "o_custkey", 4, out="r_q")
    base = equidepth_bucket(
        base, "freq", "o_custkey", 4, out="f_q", descending=True
    )
    base = equidepth_bucket(
        base, "monetary", "o_custkey", 4, out="m_q", descending=True
    )
    return (
        base.groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            (F.sum("monetary").cast("double") / F.count("*")).alias(
                "avg_monetary"
            ),
        )
        .orderBy("r_q", "f_q", "m_q")
    )


# ---------------------------------------------------------------------------
# Robust outlier detection (median/MAD, r10): per event type, median
# and median-absolute-deviation of `value` via exact interpolated
# percentiles (Spark `percentile` ≡ DuckDB `quantile_cont`, the
# median_qty-proven pair), then the |x-med| > 3·MAD count. Three
# hash-aggregate passes over events with the tiny per-type medians
# broadcast back — no global sort, no window. The z-score-free outlier
# posture that survives heavy-tailed value distributions.
# ---------------------------------------------------------------------------
@register(
    "mad_outliers",
    """
    WITH e AS (SELECT event_type, value FROM events),
    med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
            FROM e GROUP BY event_type),
    dev AS (SELECT e.event_type, e.value, med.med,
                   ABS(e.value - med.med) AS adev
            FROM e JOIN med USING (event_type)),
    mad AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad
            FROM dev GROUP BY event_type)
    SELECT d.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(ANY_VALUE(d.med), 6) AS med,
           ROUND(ANY_VALUE(mad.mad), 6) AS mad,
           CAST(SUM(CASE WHEN d.adev > 3 * mad.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev d JOIN mad USING (event_type)
    GROUP BY d.event_type
    ORDER BY d.event_type
    """,
)
def mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.first("med"), 6).alias("med"),
            F.round(F.first("mad"), 6).alias("mad"),
            F.sum(
                F.when(F.col("adev") > 3 * F.col("mad"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Inter-rater agreement (Cohen's kappa, r10): two deterministic
# curation "raters" over documents — char-length vs token-count
# thresholds — scored for chance-corrected agreement. The eval shape
# for comparing heuristic labelers before committing one to a
# pipeline. Pure bigint confusion counts, one hash aggregate; the
# kappa formula is shared double arithmetic on identical inputs.
# ---------------------------------------------------------------------------
@register(
    "cohens_kappa",
    """
    WITH r AS (
      SELECT CASE WHEN n_chars > 150 THEN 1 ELSE 0 END AS a,
             CASE WHEN len(string_split(text, ' ')) > 30 THEN 1 ELSE 0 END AS b
      FROM documents),
    c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(a * b) AS BIGINT) AS n11,
                 CAST(SUM(a * (1 - b)) AS BIGINT) AS n10,
                 CAST(SUM((1 - a) * b) AS BIGINT) AS n01,
                 CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n00
          FROM r)
    SELECT n, n11, n10, n01, n00,
           ROUND(CAST(n11 + n00 AS DOUBLE) / n, 6) AS po,
           ROUND((CAST(n11 + n10 AS DOUBLE) / n) * (CAST(n11 + n01 AS DOUBLE) / n)
                 + (CAST(n01 + n00 AS DOUBLE) / n) * (CAST(n10 + n00 AS DOUBLE) / n),
                 6) AS pe,
           ROUND((CAST(n11 + n00 AS DOUBLE) / n
                  - ((CAST(n11 + n10 AS DOUBLE) / n) * (CAST(n11 + n01 AS DOUBLE) / n)
                     + (CAST(n01 + n00 AS DOUBLE) / n) * (CAST(n10 + n00 AS DOUBLE) / n)))
                 / (1 - ((CAST(n11 + n10 AS DOUBLE) / n) * (CAST(n11 + n01 AS DOUBLE) / n)
                         + (CAST(n01 + n00 AS DOUBLE) / n) * (CAST(n10 + n00 AS DOUBLE) / n))),
                 6) AS kappa
    FROM c
    """,
)
def cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    r = d.select(
        F.when(F.col("n_chars") > 150, 1).otherwise(0).alias("a"),
        F.when(F.size(F.split("text", " ")) > 30, 1).otherwise(0).alias("b"),
    )
    c = r.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("a") * F.col("b")).cast("bigint").alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("bigint").alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).cast("bigint").alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).cast("bigint").alias("n00"),
    )
    n = F.col("n").cast("double")
    po = (F.col("n11") + F.col("n00")) / n
    pa1 = (F.col("n11") + F.col("n10")) / n
    pb1 = (F.col("n11") + F.col("n01")) / n
    pa0 = (F.col("n01") + F.col("n00")) / n
    pb0 = (F.col("n10") + F.col("n00")) / n
    pe = pa1 * pb1 + pa0 * pb0
    return c.select(
        "n", "n11", "n10", "n01", "n00",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round((po - pe) / (1 - pe), 6).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# Winsorized statistics (r10): mean/std of l_extendedprice with the
# tails clamped at the exact interpolated P5/P95 (the
# percentile ≡ quantile_cont pair). Clamped values round to 9 digits
# and accumulate as exact decimals (sum and sum-of-squares), so the
# moments are aggregation-order-free; the final mean/std is shared
# double arithmetic. The robust-scaling pass a feature pipeline runs
# before normalizing a heavy-tailed column.
# ---------------------------------------------------------------------------
@register(
    "winsorized_stats",
    """
    WITH x AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem),
    q AS (SELECT quantile_cont(v, 0.05) AS lo, quantile_cont(v, 0.95) AS hi
          FROM x),
    w AS (SELECT CASE WHEN v < lo THEN lo WHEN v > hi THEN hi ELSE v END AS wv
          FROM x, q),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(ROUND(wv, 9) AS DECIMAL(38,9))) AS sw,
                 SUM(CAST(ROUND(wv * wv, 9) AS DECIMAL(38,9))) AS sww
          FROM w)
    SELECT n,
           ROUND((SELECT lo FROM q), 6) AS lo,
           ROUND((SELECT hi FROM q), 6) AS hi,
           CAST(sw AS DOUBLE) / n AS wmean,
           ROUND(sqrt((CAST(sww AS DOUBLE) - CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) / n)
                      / (n - 1)), 6) AS wstd
    FROM s
    """,
)
def winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    x = _t(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").cast("double").alias("v")
    )
    q = x.agg(
        F.expr("percentile(v, 0.05)").alias("lo"),
        F.expr("percentile(v, 0.95)").alias("hi"),
    )
    w = x.crossJoin(F.broadcast(q)).select(
        F.when(F.col("v") < F.col("lo"), F.col("lo"))
        .when(F.col("v") > F.col("hi"), F.col("hi"))
        .otherwise(F.col("v"))
        .alias("wv"),
        "lo",
        "hi",
    )
    s = w.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.round("wv", 9).cast("decimal(38,9)")).alias("sw"),
        F.sum(F.round(F.col("wv") * F.col("wv"), 9).cast("decimal(38,9)")).alias(
            "sww"
        ),
        F.round(F.first("lo"), 6).alias("lo"),
        F.round(F.first("hi"), 6).alias("hi"),
    )
    n = F.col("n").cast("double")
    sw = F.col("sw").cast("double")
    sww = F.col("sww").cast("double")
    return s.select(
        "n",
        "lo",
        "hi",
        (sw / n).alias("wmean"),
        F.round(F.sqrt((sww - sw * sw / n) / (n - F.lit(1))), 6).alias("wstd"),
    )


# ---------------------------------------------------------------------------
# Calibration + Brier decomposition (r10): a model-free priority
# predictor — per value-decile URGENT rate learned on the even-key
# half of orders, evaluated on the odd-key half. Deciles come from the
# r10 no-global-sort equidepth machinery (operators/quantiles), while
# the oracle uses NTILE — so the driver row ALSO re-proves the
# scale-twin equivalence on every run. Outputs per-decile predicted
# vs actual rates and the decile's Brier contribution (constant p̂
# within a decile ⇒ Brier folds to count arithmetic; the n_d-weighted
# sum of brier_term over deciles / N IS the test Brier score).
# ---------------------------------------------------------------------------
@register(
    "brier_calibration",
    """
    WITH d AS (
      SELECT o_orderkey,
             CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END AS y,
             o_orderkey % 2 AS split,
             NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      FROM orders),
    tr AS (SELECT decile,
                  CAST(CAST(SUM(y) AS VARCHAR(64)) AS DOUBLE) / COUNT(*) AS p_hat
           FROM d WHERE split = 0 GROUP BY decile),
    te AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_test,
                  CAST(SUM(y) AS BIGINT) AS pos_test
           FROM d WHERE split = 1 GROUP BY decile)
    SELECT CAST(te.decile AS INT) AS decile, te.n_test,
           ROUND(tr.p_hat, 6) AS p_hat,
           ROUND(CAST(te.pos_test AS DOUBLE) / te.n_test, 6) AS actual_rate,
           ROUND((tr.p_hat * tr.p_hat * te.n_test
                  - 2 * tr.p_hat * te.pos_test + te.pos_test) / te.n_test,
                 6) AS brier_term
    FROM te JOIN tr USING (decile)
    ORDER BY decile
    """,
)
def brier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ome_arrow_spark.operators.quantiles import equidepth_bucket

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.when(F.col("o_orderpriority").startswith("1"), 1)
        .otherwise(0)
        .alias("y"),
        (F.col("o_orderkey") % 2).alias("split"),
    )
    d = equidepth_bucket(o, "o_totalprice", "o_orderkey", 10, out="decile")
    tr = (
        d.filter(F.col("split") == 0)
        .groupBy("decile")
        .agg((F.sum("y").cast("double") / F.count("*")).alias("p_hat"))
    )
    te = (
        d.filter(F.col("split") == 1)
        .groupBy("decile")
        .agg(
            F.count("*").cast("bigint").alias("n_test"),
            F.sum("y").cast("bigint").alias("pos_test"),
        )
    )
    ph = F.col("p_hat")
    nt = F.col("n_test").cast("double")
    pos = F.col("pos_test").cast("double")
    return (
        te.join(F.broadcast(tr), "decile")
        .select(
            F.col("decile").cast("int").alias("decile"),
            "n_test",
            F.round(ph, 6).alias("p_hat"),
            F.round(pos / nt, 6).alias("actual_rate"),
            F.round((ph * ph * nt - 2 * ph * pos + pos) / nt, 6).alias(
                "brier_term"
            ),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# Population Stability Index drift monitor (r10): the ML-monitoring
# readout — reference-period decile edges (first half of January,
# from the no-sort equidepth machinery; the oracle derives the same
# edges as per-NTILE-tile maxima) bucket BOTH periods by value, and
# each bucket contributes (p-q)·ln(p/q) with +1 Laplace smoothing.
# Edges are ≤9 driver-collected scalars broadcast into a map-side
# CASE fold — the big relation is scanned once, never sorted. The
# sum of psi_term over the 10 rows IS the PSI statistic.
# ---------------------------------------------------------------------------
@register(
    "psi_drift",
    """
    WITH e AS (SELECT event_id, value, CAST(ts AS TIMESTAMP) AS ts FROM events),
    ref AS (SELECT event_id, value FROM e WHERE ts < TIMESTAMP '2024-01-16'),
    cur AS (SELECT event_id, value FROM e WHERE ts >= TIMESTAMP '2024-01-16'),
    t AS (SELECT value, NTILE(10) OVER (ORDER BY value, event_id) AS b FROM ref),
    edges AS (SELECT b, MAX(value) AS e FROM t WHERE b < 10 GROUP BY b),
    br AS (SELECT 1 + (SELECT COUNT(*) FROM edges WHERE e < r.value) AS bucket
           FROM ref r),
    bc AS (SELECT 1 + (SELECT COUNT(*) FROM edges WHERE e < c.value) AS bucket
           FROM cur c),
    cr AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_ref FROM br GROUP BY bucket),
    cc AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_cur FROM bc GROUP BY bucket),
    tot AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ref) AS nr,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM cur) AS nc)
    SELECT CAST(b.bucket AS INT) AS bucket,
           COALESCE(cr.n_ref, 0) AS n_ref, COALESCE(cc.n_cur, 0) AS n_cur,
           ROUND((COALESCE(cr.n_ref, 0) + 1.0) / (tot.nr + 10), 6) AS p_ref,
           ROUND((COALESCE(cc.n_cur, 0) + 1.0) / (tot.nc + 10), 6) AS p_cur,
           ROUND(((COALESCE(cr.n_ref, 0) + 1.0) / (tot.nr + 10)
                  - (COALESCE(cc.n_cur, 0) + 1.0) / (tot.nc + 10))
                 * LN(((COALESCE(cr.n_ref, 0) + 1.0) / (tot.nr + 10))
                      / ((COALESCE(cc.n_cur, 0) + 1.0) / (tot.nc + 10))),
                 6) AS psi_term
    FROM (SELECT unnest(range(1, 11)) AS bucket) b
    LEFT JOIN cr ON cr.bucket = b.bucket
    LEFT JOIN cc ON cc.bucket = b.bucket
    CROSS JOIN tot
    ORDER BY bucket
    """,
)
def psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ome_arrow_spark.operators.quantiles import equidepth_edges

    e = _events(spark, sf_dir).select(
        "event_id", "value", F.col("ts").alias("ts")
    )
    split = F.lit("2024-01-16").cast("timestamp")
    ref = e.filter(F.col("ts") < split).select("event_id", "value")
    cur = e.filter(F.col("ts") >= split).select("event_id", "value")
    edges = equidepth_edges(ref, "value", "event_id", 10)

    def bucket(col):
        b = F.lit(1)
        for ev in edges:
            b = b + (F.lit(ev) < col).cast("int")
        return b

    cr = (
        ref.select(bucket(F.col("value")).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").cast("bigint").alias("n_ref"))
    )
    cc = (
        cur.select(bucket(F.col("value")).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").cast("bigint").alias("n_cur"))
    )
    tot = ref.agg(F.count("*").cast("bigint").alias("nr")).crossJoin(
        cur.agg(F.count("*").cast("bigint").alias("nc"))
    )
    buckets = spark.range(1, 11).select(F.col("id").cast("int").alias("bucket"))
    j = (
        buckets.join(cr, "bucket", "left")
        .join(cc, "bucket", "left")
        .crossJoin(F.broadcast(tot))
    )
    nr1 = (F.coalesce(F.col("n_ref"), F.lit(0)) + 1.0) / (F.col("nr") + 10)
    nc1 = (F.coalesce(F.col("n_cur"), F.lit(0)) + 1.0) / (F.col("nc") + 10)
    return j.select(
        "bucket",
        F.coalesce(F.col("n_ref"), F.lit(0)).cast("bigint").alias("n_ref"),
        F.coalesce(F.col("n_cur"), F.lit(0)).cast("bigint").alias("n_cur"),
        F.round(nr1, 6).alias("p_ref"),
        F.round(nc1, 6).alias("p_cur"),
        F.round((nr1 - nc1) * F.log(nr1 / nc1), 6).alias("psi_term"),
    ).orderBy("bucket")


# ---------------------------------------------------------------------------
# Kaplan-Meier survival estimator (r10): time-to-next-event survival
# over per-user inter-event gaps (hours) — every consecutive gap is an
# observed event, each user's final gap (last event → observation
# horizon) enters CENSORED, which is exactly the estimand behind
# "how long until a user comes back". The product-limit estimator
# folds as exp(Σ ln(1 − d/n)): each log term is a deterministic
# double, rounded to 9 digits and accumulated by a duration-ordered
# cumulative DECIMAL window (the proven cusum recipe), so the running
# product is aggregation-order-free. At-risk counts come from one
# cumulative window over per-duration aggregates (≤ a few hundred
# rows — tiny); the per-user ordering is the one partitioned window
# every sessionization already pays. Output: survival at each gap
# length with d_i > 0 (capped at 48h for a stable curve head).
# ---------------------------------------------------------------------------
@register(
    "kaplan_meier",
    """
    WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    mx AS (SELECT MAX(ts) AS m FROM e),
    g AS (SELECT user_id, ts,
                 LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
          FROM e),
    obs AS (
      SELECT CAST(FLOOR((FLOOR(epoch(nxt)) - FLOOR(epoch(ts))) / 3600.0) AS BIGINT)
               AS dur, 1 AS ev
      FROM g WHERE nxt IS NOT NULL
      UNION ALL
      SELECT CAST(FLOOR((FLOOR(epoch((SELECT m FROM mx))) - FLOOR(epoch(ts))) / 3600.0)
                  AS BIGINT) AS dur, 0 AS ev
      FROM g WHERE nxt IS NULL),
    d AS (SELECT dur, CAST(SUM(ev) AS BIGINT) AS d_i,
                 CAST(COUNT(*) AS BIGINT) AS all_i
          FROM obs GROUP BY dur),
    o AS (SELECT dur, d_i,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM obs)
                 - COALESCE(SUM(all_i) OVER (ORDER BY dur
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS n_risk
          FROM d),
    f AS (SELECT dur, d_i, n_risk FROM o
          WHERE d_i > 0 AND d_i < n_risk AND dur <= 48),
    s AS (SELECT dur, d_i, n_risk,
                 SUM(CAST(ROUND(LN(1.0 - CAST(d_i AS DOUBLE) / n_risk), 9)
                          AS DECIMAL(20,9)))
                   OVER (ORDER BY dur) AS lsum
          FROM f)
    SELECT CAST(dur AS INT) AS dur, CAST(n_risk AS BIGINT) AS n_risk, d_i,
           ROUND(EXP(CAST(lsum AS DOUBLE)), 6) AS survival
    FROM s ORDER BY dur
    """,
)
def kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("user_id", "event_id", "ts")
    mx = ev.agg(F.max("ts").alias("m"))
    wg = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.withColumn("nxt", F.lead("ts").over(wg)).crossJoin(F.broadcast(mx))
    sec = lambda c: F.unix_timestamp(F.col(c))  # noqa: E731
    obs = g.filter(F.col("nxt").isNotNull()).select(
        F.floor((sec("nxt") - sec("ts")) / 3600.0).cast("bigint").alias("dur"),
        F.lit(1).alias("ev"),
    ).unionAll(
        g.filter(F.col("nxt").isNull()).select(
            F.floor((sec("m") - sec("ts")) / 3600.0)
            .cast("bigint")
            .alias("dur"),
            F.lit(0).alias("ev"),
        )
    )
    d = obs.groupBy("dur").agg(
        F.sum("ev").cast("bigint").alias("d_i"),
        F.count("*").cast("bigint").alias("all_i"),
    )
    total = obs.agg(F.count("*").cast("bigint").alias("n_total"))
    w = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    o = d.crossJoin(F.broadcast(total)).select(
        "dur",
        "d_i",
        (
            F.col("n_total")
            - F.coalesce(F.sum("all_i").over(w), F.lit(0))
        ).alias("n_risk"),
    )
    f = o.filter(
        (F.col("d_i") > 0) & (F.col("d_i") < F.col("n_risk")) & (F.col("dur") <= 48)
    )
    ws = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    s = f.withColumn(
        "lsum",
        F.sum(
            F.round(
                F.log(1.0 - F.col("d_i").cast("double") / F.col("n_risk")), 9
            ).cast("decimal(20,9)")
        ).over(ws),
    )
    return s.select(
        F.col("dur").cast("int").alias("dur"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        "d_i",
        F.round(F.exp(F.col("lsum").cast("double")), 6).alias("survival"),
    ).orderBy("dur")


# ---------------------------------------------------------------------------
# Chi-square independence test (r10): customer nation × order
# priority — the contingency-table readout behind "does segment X
# behave differently". Observed counts are exact bigints from one
# broadcast-dim join + hash aggregate; expected counts and chi-square
# terms are margin products in shared double arithmetic. Σ chi2_term
# over the rows is the test statistic (df = (r-1)(c-1)).
# ---------------------------------------------------------------------------
@register(
    "chi2_independence",
    """
    WITH j AS (
      SELECT n.n_name AS nation, o.o_orderpriority AS priority
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey),
    obs AS (SELECT nation, priority, CAST(COUNT(*) AS BIGINT) AS obs
            FROM j GROUP BY nation, priority),
    rm AS (SELECT nation, CAST(SUM(obs) AS BIGINT) AS row_tot FROM obs GROUP BY nation),
    cm AS (SELECT priority, CAST(SUM(obs) AS BIGINT) AS col_tot FROM obs GROUP BY priority),
    n AS (SELECT CAST(SUM(obs) AS BIGINT) AS total FROM obs)
    SELECT o.nation, o.priority, o.obs,
           ROUND(CAST(rm.row_tot AS DOUBLE) * cm.col_tot / n.total, 6) AS expected,
           ROUND(POW(o.obs - CAST(rm.row_tot AS DOUBLE) * cm.col_tot / n.total, 2)
                 / (CAST(rm.row_tot AS DOUBLE) * cm.col_tot / n.total), 6) AS chi2_term
    FROM obs o JOIN rm USING (nation) JOIN cm USING (priority) CROSS JOIN n
    ORDER BY nation, priority
    """,
)
def chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    j = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nat), c.c_nationkey == nat.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("o_orderpriority").alias("priority"),
        )
    )
    obs = j.groupBy("nation", "priority").agg(
        F.count("*").cast("bigint").alias("obs")
    )
    rm = obs.groupBy("nation").agg(F.sum("obs").cast("bigint").alias("row_tot"))
    cm = obs.groupBy("priority").agg(
        F.sum("obs").cast("bigint").alias("col_tot")
    )
    n = obs.agg(F.sum("obs").cast("bigint").alias("total"))
    exp_ = F.col("row_tot").cast("double") * F.col("col_tot") / F.col("total")
    return (
        obs.join(F.broadcast(rm), "nation")
        .join(F.broadcast(cm), "priority")
        .crossJoin(F.broadcast(n))
        .select(
            "nation",
            "priority",
            "obs",
            F.round(exp_, 6).alias("expected"),
            F.round(F.pow(F.col("obs") - exp_, F.lit(2)) / exp_, 6).alias(
                "chi2_term"
            ),
        )
        .orderBy("nation", "priority")
    )


# ---------------------------------------------------------------------------
# Seasonal-naive forecast evaluation / MASE (r10): the forecasting
# baseline audit — per event type, predict each of the last 7 days'
# counts with the value 7 days earlier (true calendar join, not a
# row lag, so gap days drop out identically in both engines), scale
# by the train-period naive-1 MAE, report MASE. All error sums are
# exact bigints; the three ratios are shared double divisions. The
# go/no-go gate before any fancier forecaster ships.
# ---------------------------------------------------------------------------
@register(
    "forecast_mase",
    """
    WITH d AS (SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                      CAST(COUNT(*) AS BIGINT) AS y
               FROM events GROUP BY 1, 2),
    mx AS (SELECT MAX(day) AS md FROM d),
    te AS (SELECT a.event_type, a.day, a.y, b.y AS y7
           FROM d a JOIN d b
             ON a.event_type = b.event_type AND b.day = a.day - 7
           WHERE a.day > (SELECT md FROM mx) - 7),
    tr AS (SELECT a.event_type, ABS(a.y - b.y) AS e1
           FROM d a JOIN d b
             ON a.event_type = b.event_type AND b.day = a.day - 1
           WHERE a.day <= (SELECT md FROM mx) - 7),
    m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_test,
                 CAST(SUM(ABS(y - y7)) AS BIGINT) AS ae7
          FROM te GROUP BY event_type),
    s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_train,
                 CAST(SUM(e1) AS BIGINT) AS ae1
          FROM tr GROUP BY event_type)
    SELECT m.event_type, m.n_test,
           ROUND(CAST(m.ae7 AS DOUBLE) / m.n_test, 6) AS mae7,
           ROUND(CAST(s.ae1 AS DOUBLE) / s.n_train, 6) AS scale,
           ROUND((CAST(m.ae7 AS DOUBLE) / m.n_test)
                 / (CAST(s.ae1 AS DOUBLE) / s.n_train), 6) AS mase
    FROM m JOIN s USING (event_type)
    ORDER BY m.event_type
    """,
)
def forecast_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").cast("bigint").alias("y"))
    mx = d.agg(F.max("day").alias("md"))
    a = d.crossJoin(F.broadcast(mx))
    b7 = d.select(
        F.col("event_type").alias("et2"),
        F.col("day").alias("day2"),
        F.col("y").alias("y7"),
    )
    te = a.filter(F.col("day") > F.date_sub("md", 7)).join(
        b7,
        (F.col("event_type") == F.col("et2"))
        & (F.col("day2") == F.date_sub("day", 7)),
    )
    b1 = d.select(
        F.col("event_type").alias("et2"),
        F.col("day").alias("day2"),
        F.col("y").alias("y1"),
    )
    tr = a.filter(F.col("day") <= F.date_sub("md", 7)).join(
        b1,
        (F.col("event_type") == F.col("et2"))
        & (F.col("day2") == F.date_sub("day", 1)),
    )
    m = te.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_test"),
        F.sum(F.abs(F.col("y") - F.col("y7"))).cast("bigint").alias("ae7"),
    )
    s = tr.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_train"),
        F.sum(F.abs(F.col("y") - F.col("y1"))).cast("bigint").alias("ae1"),
    )
    mae7 = F.col("ae7").cast("double") / F.col("n_test")
    scale = F.col("ae1").cast("double") / F.col("n_train")
    return (
        m.join(s, "event_type")
        .select(
            "event_type",
            "n_test",
            F.round(mae7, 6).alias("mae7"),
            F.round(scale, 6).alias("scale"),
            F.round(mae7 / scale, 6).alias("mase"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Last-touch attribution (r10): every purchase is attributed to the
# user's LATEST touchpoint (click/view/signup) within the preceding
# 24 hours — the marketing-attribution readout. The Spark side is the
# repo's one-shuffle as-of join with tolerance (operators/asof.py, the
# pandas merge_asof contract: ties at equal timestamps resolve to the
# max carried value); the oracle re-derives the same pick with a
# per-purchase rank over epoch-bounded candidates. Unattributed
# purchases surface as touch_type 'none', so the shares sum to 1.
# ---------------------------------------------------------------------------
@register(
    "attribution_last_touch",
    """
    WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
                      event_type FROM events),
    p AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'purchase'),
    t AS (SELECT user_id, ts, event_type FROM e
          WHERE event_type IN ('click', 'view', 'signup')),
    cand AS (SELECT p.event_id AS pid, t.event_type,
                    ROW_NUMBER() OVER (PARTITION BY p.event_id
                        ORDER BY t.ts DESC, t.event_type DESC) AS rk
             FROM p JOIN t ON p.user_id = t.user_id
               AND t.ts <= p.ts
               AND epoch(p.ts) - epoch(t.ts) <= 86400),
    a AS (SELECT p.event_id, COALESCE(c.event_type, 'none') AS touch_type
          FROM p LEFT JOIN (SELECT pid, event_type FROM cand WHERE rk = 1) c
            ON c.pid = p.event_id),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM p)
    SELECT touch_type, CAST(COUNT(*) AS BIGINT) AS n_conversions,
           ROUND(CAST(COUNT(*) AS DOUBLE) / n.total, 6) AS share
    FROM a CROSS JOIN n
    GROUP BY touch_type, n.total ORDER BY touch_type
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ome_arrow_spark.operators.asof import asof_join

    e = _events(spark, sf_dir).select("event_id", "user_id", "ts", "event_type")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    t = e.filter(F.col("event_type").isin("click", "view", "signup")).select(
        "user_id", F.col("ts").alias("tts"), F.col("event_type").alias("tt")
    )
    j = asof_join(
        p,
        t,
        left_on="user_id",
        right_on="user_id",
        left_time="ts",
        right_time="tts",
        right_values=["tt"],
        value_aliases=["touch_type"],
        keep=["event_id"],
        direction="backward",
        tolerance_seconds=86400.0,
    )
    n = p.agg(F.count("*").cast("bigint").alias("total"))
    return (
        j.select(F.coalesce(F.col("touch_type"), F.lit("none")).alias("touch_type"))
        .groupBy("touch_type")
        .agg(F.count("*").cast("bigint").alias("n_conversions"))
        .crossJoin(F.broadcast(n))
        .select(
            "touch_type",
            "n_conversions",
            F.round(
                F.col("n_conversions").cast("double") / F.col("total"), 6
            ).alias("share"),
        )
        .orderBy("touch_type")
    )


# ---------------------------------------------------------------------------
# Theil-Sen robust trend (r10): median of all pairwise slopes of the
# per-type DAILY count series — the outlier-immune alternative to
# ols_trend on the same grain. The pairwise stage is bounded by the
# daily aggregate (≤ ~30 rows per type → ≤435 pairs), never raw
# events, so the quadratic never sees the fact table; the median is
# the exact interpolated percentile pair both engines share. Slopes
# are integer-count differences over integer day gaps — identical
# doubles — and the output rounds once at the end.
# ---------------------------------------------------------------------------
@register(
    "theil_sen_trend",
    """
    WITH d AS (SELECT event_type,
                      DATE_DIFF('day', DATE '2024-01-01',
                                CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS x,
                      CAST(COUNT(*) AS BIGINT) AS y
               FROM events GROUP BY 1, 2),
    p AS (SELECT a.event_type,
                 CAST(b.y - a.y AS DOUBLE) / (b.x - a.x) AS slope
          FROM d a JOIN d b
            ON a.event_type = b.event_type AND a.x < b.x)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(quantile_cont(slope, 0.5), 6) AS ts_slope
    FROM p GROUP BY event_type ORDER BY event_type
    """,
)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    d = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01")).alias("x"),
    ).agg(F.count("*").cast("bigint").alias("y"))
    a = d.select("event_type", F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = d.select(
        F.col("event_type").alias("et2"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
    )
    p = a.join(
        b, (F.col("event_type") == F.col("et2")) & (F.col("xa") < F.col("xb"))
    ).select(
        "event_type",
        (
            (F.col("yb") - F.col("ya")).cast("double")
            / (F.col("xb") - F.col("xa"))
        ).alias("slope"),
    )
    return (
        p.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.round(F.expr("percentile(slope, 0.5)"), 6).alias("ts_slope"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Data-contract validation (r10): the expectations pass a pipeline
# runs before publishing a table — each declared rule (non-null,
# range, enum membership, referential) scans once and reports exact
# violation counts with the rule verdict. One pass over orders + one
# broadcast anti-join for the FK rule; no row explodes, no sort. The
# shape generalizes: a rule is (name, predicate), the query is the
# fold of their violation counts.
# ---------------------------------------------------------------------------
@register(
    "data_contract_check",
    """
    WITH o AS (SELECT * FROM orders),
    fk AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM o
           WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)),
    r AS (
      SELECT 'o_totalprice_positive' AS rule,
             CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS violations,
             CAST(COUNT(*) AS BIGINT) AS n_rows FROM o
      UNION ALL
      SELECT 'o_orderdate_in_range',
             CAST(SUM(CASE WHEN CAST(o_orderdate AS DATE) < DATE '1992-01-01'
                            OR CAST(o_orderdate AS DATE) > DATE '1998-12-31'
                           THEN 1 ELSE 0 END) AS BIGINT),
             CAST(COUNT(*) AS BIGINT) FROM o
      UNION ALL
      SELECT 'o_orderpriority_enum',
             CAST(SUM(CASE WHEN o_orderpriority NOT IN
                  ('1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')
                           THEN 1 ELSE 0 END) AS BIGINT),
             CAST(COUNT(*) AS BIGINT) FROM o
      UNION ALL
      SELECT 'o_orderkey_not_null',
             CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(COUNT(*) AS BIGINT) FROM o
      UNION ALL
      SELECT 'o_custkey_fk_customer', (SELECT v FROM fk),
             CAST(COUNT(*) AS BIGINT) FROM o)
    SELECT rule, violations, n_rows,
           CASE WHEN violations = 0 THEN 'pass' ELSE 'fail' END AS verdict
    FROM r ORDER BY rule
    """,
)
def data_contract_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    n_rows = o.count()

    def rule(name, viol_col):
        return o.agg(
            F.lit(name).alias("rule"),
            F.sum(viol_col).cast("bigint").alias("violations"),
            F.count("*").cast("bigint").alias("n_rows"),
        )

    enum_vals = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    rules = rule(
        "o_totalprice_positive",
        F.when(F.col("o_totalprice") <= 0, 1).otherwise(0),
    ).unionAll(
        rule(
            "o_orderdate_in_range",
            F.when(
                (F.col("o_orderdate").cast("date") < F.lit("1992-01-01").cast("date"))
                | (F.col("o_orderdate").cast("date") > F.lit("1998-12-31").cast("date")),
                1,
            ).otherwise(0),
        )
    ).unionAll(
        rule(
            "o_orderpriority_enum",
            F.when(~F.col("o_orderpriority").isin(enum_vals), 1).otherwise(0),
        )
    ).unionAll(
        rule(
            "o_orderkey_not_null",
            F.when(F.col("o_orderkey").isNull(), 1).otherwise(0),
        )
    )
    fk = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count("*").cast("bigint").alias("violations"))
        .select(
            F.lit("o_custkey_fk_customer").alias("rule"),
            "violations",
            F.lit(n_rows).cast("bigint").alias("n_rows"),
        )
    )
    return (
        rules.unionAll(fk)
        .select(
            "rule",
            "violations",
            "n_rows",
            F.when(F.col("violations") == 0, "pass")
            .otherwise("fail")
            .alias("verdict"),
        )
        .orderBy("rule")
    )


# ---------------------------------------------------------------------------
# Mutual-information feature ranking (r10): MI between the "urgent
# order" label and each candidate categorical feature (customer
# market segment, customer nation) — the feature-selection readout
# before training a classifier. Each feature is one contingency
# aggregate (exact bigint cells) and MI folds as Σ p ln(p/(px·py))
# with round-9 decimal term sums, so the ranking can't drift with
# aggregation order. Features rank by rounded MI descending.
# ---------------------------------------------------------------------------
@register(
    "mutual_info_rank",
    """
    WITH j AS (
      SELECT CASE WHEN o.o_orderpriority LIKE '1%' THEN 1 ELSE 0 END AS y,
             c.c_mktsegment AS segment, n.n_name AS nation
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM j),
    mi AS (
      SELECT 'c_mktsegment' AS feature,
             SUM(CAST(ROUND((CAST(cxy AS DOUBLE) / total)
                 * LN(CAST(cxy AS DOUBLE) * total
                      / (CAST(cx AS DOUBLE) * cy)), 9) AS DECIMAL(20,9))) AS mi
      FROM (SELECT segment, y, CAST(COUNT(*) AS BIGINT) AS cxy FROM j GROUP BY 1, 2) a
      JOIN (SELECT segment, CAST(COUNT(*) AS BIGINT) AS cx FROM j GROUP BY 1) b USING (segment)
      JOIN (SELECT y, CAST(COUNT(*) AS BIGINT) AS cy FROM j GROUP BY 1) c USING (y)
      CROSS JOIN n
      UNION ALL
      SELECT 'nation',
             SUM(CAST(ROUND((CAST(cxy AS DOUBLE) / total)
                 * LN(CAST(cxy AS DOUBLE) * total
                      / (CAST(cx AS DOUBLE) * cy)), 9) AS DECIMAL(20,9)))
      FROM (SELECT nation, y, CAST(COUNT(*) AS BIGINT) AS cxy FROM j GROUP BY 1, 2) a
      JOIN (SELECT nation, CAST(COUNT(*) AS BIGINT) AS cx FROM j GROUP BY 1) b USING (nation)
      JOIN (SELECT y, CAST(COUNT(*) AS BIGINT) AS cy FROM j GROUP BY 1) c USING (y)
      CROSS JOIN n)
    SELECT feature, ROUND(CAST(mi AS DOUBLE), 6) AS mi,
           CAST(ROW_NUMBER() OVER (ORDER BY ROUND(CAST(mi AS DOUBLE), 6) DESC,
                                   feature) AS INT) AS rank
    FROM mi ORDER BY rank
    """,
)
def mutual_info_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    j = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nat), c.c_nationkey == nat.n_nationkey)
        .select(
            F.when(F.col("o_orderpriority").startswith("1"), 1)
            .otherwise(0)
            .alias("y"),
            F.col("c_mktsegment").alias("segment"),
            F.col("n_name").alias("nation"),
        )
    )
    total = j.count()

    def mi(feature_col, name):
        cxy = j.groupBy(feature_col, "y").agg(
            F.count("*").cast("bigint").alias("cxy")
        )
        cx = j.groupBy(feature_col).agg(
            F.count("*").cast("bigint").alias("cx")
        )
        cy = j.groupBy("y").agg(F.count("*").cast("bigint").alias("cy"))
        t = F.lit(total).cast("double")
        term = (F.col("cxy").cast("double") / t) * F.log(
            F.col("cxy").cast("double") * t
            / (F.col("cx").cast("double") * F.col("cy"))
        )
        return (
            cxy.join(F.broadcast(cx), feature_col)
            .join(F.broadcast(cy), "y")
            .agg(
                F.lit(name).alias("feature"),
                F.sum(F.round(term, 9).cast("decimal(20,9)")).alias("mi"),
            )
        )

    both = mi("segment", "c_mktsegment").unionAll(mi("nation", "nation"))
    w = Window.orderBy(
        F.round(F.col("mi").cast("double"), 6).desc(), F.col("feature")
    )
    return both.select(
        "feature",
        F.round(F.col("mi").cast("double"), 6).alias("mi"),
        F.row_number().over(w).cast("int").alias("rank"),
    ).orderBy("rank")


# ---------------------------------------------------------------------------
# Recommender evaluation: hit-rate + NDCG@3 (r10) — the offline eval
# every co-occurrence recommender ships with. Train split: part-pair
# co-purchase counts (pairs bounded by items-per-order, never the
# part catalog); top-3 recs per part via a per-part rank window.
# Test split: every (order, seed part) with ≥2 parts scores its recs
# against the order's OTHER parts: DCG uses 1/log2(rank+1) on matched
# rec ranks, IDCG the ideal prefix, and per-seed NDCG values
# accumulate as round-9 decimals so the corpus mean is
# aggregation-order-free. Seeds whose part never co-occurred in train
# score 0 (the honest denominator).
# ---------------------------------------------------------------------------
@register(
    "ndcg_recommender",
    """
    WITH tr AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem
                WHERE l_orderkey % 4 <> 0),
    te AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
           WHERE l_orderkey % 4 = 0),
    pairs AS (SELECT a.p AS p1, b.p AS p2, CAST(COUNT(*) AS BIGINT) AS c
              FROM (SELECT DISTINCT o, p FROM tr) a
              JOIN (SELECT DISTINCT o, p FROM tr) b
                ON a.o = b.o AND a.p <> b.p
              GROUP BY 1, 2),
    recs AS (SELECT p1, p2, rn FROM (
               SELECT p1, p2,
                      ROW_NUMBER() OVER (PARTITION BY p1
                          ORDER BY c DESC, p2) AS rn
               FROM pairs) WHERE rn <= 3),
    seeds AS (SELECT t.o, t.p,
                     CAST(COUNT(*) OVER (PARTITION BY t.o) AS BIGINT) AS o_size
              FROM te t),
    s2 AS (SELECT o, p, o_size - 1 AS n_rel FROM seeds WHERE o_size >= 2),
    hits AS (SELECT s.o, s.p, r.rn
             FROM s2 s JOIN recs r ON r.p1 = s.p
             JOIN te t2 ON t2.o = s.o AND t2.p = r.p2),
    dcg AS (SELECT s.o, s.p, s.n_rel,
                   COALESCE(SUM(1.0 / LOG2(h.rn + 1.0)), 0.0) AS dcg,
                   CAST(COUNT(h.rn) AS BIGINT) AS n_hits
            FROM s2 s LEFT JOIN hits h ON h.o = s.o AND h.p = s.p
            GROUP BY s.o, s.p, s.n_rel),
    nd AS (SELECT o, p, n_hits,
                  dcg / (CASE WHEN n_rel >= 3
                              THEN 1.0 / LOG2(2.0) + 1.0 / LOG2(3.0) + 1.0 / LOG2(4.0)
                              WHEN n_rel = 2
                              THEN 1.0 / LOG2(2.0) + 1.0 / LOG2(3.0)
                              ELSE 1.0 / LOG2(2.0) END) AS ndcg
           FROM dcg)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_seeds,
           ROUND(CAST(CAST(SUM(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS VARCHAR(64)) AS DOUBLE)
                 / COUNT(*), 6) AS hit_rate,
           ROUND(CAST(CAST(SUM(CAST(ROUND(ndcg, 9) AS DECIMAL(20,9))) AS VARCHAR(64)) AS DOUBLE)
                 / COUNT(*), 6) AS mean_ndcg
    FROM nd
    """,
)
def ndcg_recommender(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    )
    tr = li.filter(F.col("o") % 4 != 0).distinct()
    te = li.filter(F.col("o") % 4 == 0).distinct()
    a = tr.select("o", F.col("p").alias("p1"))
    b = tr.select(F.col("o").alias("o2"), F.col("p").alias("p2"))
    pairs = (
        a.join(b, (F.col("o") == F.col("o2")) & (F.col("p1") != F.col("p2")))
        .groupBy("p1", "p2")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    wr = Window.partitionBy("p1").orderBy(F.desc("c"), "p2")
    recs = pairs.withColumn("rn", F.row_number().over(wr)).filter(
        F.col("rn") <= 3
    )
    wo = Window.partitionBy("o")
    seeds = te.withColumn("o_size", F.count("*").over(wo).cast("bigint"))
    s2 = seeds.filter(F.col("o_size") >= 2).select(
        "o", "p", (F.col("o_size") - 1).alias("n_rel")
    )
    t2 = te.select(F.col("o").alias("ho"), F.col("p").alias("hp"))
    hits = (
        s2.join(recs, s2.p == recs.p1)
        .join(t2, (F.col("ho") == F.col("o")) & (F.col("hp") == F.col("p2")))
        .select("o", "p", "rn")
    )
    dcg = (
        s2.join(hits.withColumnsRenamed({"o": "o3", "p": "p3"}),
                (F.col("o") == F.col("o3")) & (F.col("p") == F.col("p3")),
                "left")
        .groupBy("o", "p", "n_rel")
        .agg(
            F.coalesce(
                F.sum(1.0 / F.log2(F.col("rn") + 1.0)), F.lit(0.0)
            ).alias("dcg"),
            F.count("rn").cast("bigint").alias("n_hits"),
        )
    )
    import math

    i1 = 1.0 / math.log2(2.0)
    i2 = i1 + 1.0 / math.log2(3.0)
    i3 = i2 + 1.0 / math.log2(4.0)
    idcg = (
        F.when(F.col("n_rel") >= 3, F.lit(i3))
        .when(F.col("n_rel") == 2, F.lit(i2))
        .otherwise(F.lit(i1))
    )
    nd = dcg.select(
        "n_hits", (F.col("dcg") / idcg).alias("ndcg")
    )
    return nd.agg(
        F.count("*").cast("bigint").alias("n_seeds"),
        F.round(
            F.sum(F.when(F.col("n_hits") > 0, 1).otherwise(0)).cast("double")
            / F.count("*"),
            6,
        ).alias("hit_rate"),
        F.round(
            F.sum(F.round("ndcg", 9).cast("decimal(20,9)")).cast("double")
            / F.count("*"),
            6,
        ).alias("mean_ndcg"),
    )


# ---------------------------------------------------------------------------
# Differentially-private count release (r10): per-nation order counts
# with Laplace(1/ε) noise — the privacy lane's RELEASE step (the
# audits k_anonymity/l_diversity decide WHAT needs noise; this emits
# it). The noise is RNG-free: the md5-of-key 13-hex-digit uniform
# (the proven 2^52 parse) feeds the Laplace inverse CDF, so both
# engines derive the identical perturbation and the gate pins the
# mechanism's arithmetic (scale b = 1/ε = 1 for a count query of
# sensitivity 1). True DP would use a secret seed; the gate fixes it
# to the key to stay verifiable — the plumbing is the contract.
# ---------------------------------------------------------------------------
@register(
    "dp_count_release",
    """
    WITH c AS (
      SELECT n.n_name AS nation, CAST(COUNT(*) AS BIGINT) AS true_count
      FROM orders o JOIN customer cu ON o.o_custkey = cu.c_custkey
      JOIN nation n ON cu.c_nationkey = n.n_nationkey
      GROUP BY n.n_name),
    u AS (SELECT nation, true_count,
                 CAST(('0x' || substr(md5(nation), 1, 13))::BIGINT AS DOUBLE)
                   / 4503599627370496.0 AS uni
          FROM c)
    SELECT nation, true_count,
           ROUND(CASE WHEN uni < 0.5 THEN LN(2.0 * uni)
                      ELSE -LN(2.0 * (1.0 - uni)) END, 6) AS noise,
           CAST(ROUND(true_count
                + (CASE WHEN uni < 0.5 THEN LN(2.0 * uni)
                        ELSE -LN(2.0 * (1.0 - uni)) END), 0) AS BIGINT)
             AS released_count
    FROM u ORDER BY nation
    """,
)
def dp_count_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    c = (
        o.join(cu, o.o_custkey == cu.c_custkey)
        .join(F.broadcast(n), cu.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count("*").cast("bigint").alias("true_count"))
    )
    uni = (
        F.conv(F.substring(F.md5(F.col("nation")), 1, 13), 16, 10)
        .cast("bigint")
        .cast("double")
        / F.lit(4503599627370496.0)
    )
    noise = F.when(uni < 0.5, F.log(2.0 * uni)).otherwise(
        -F.log(2.0 * (1.0 - uni))
    )
    return c.select(
        "nation",
        "true_count",
        F.round(noise, 6).alias("noise"),
        F.round(F.col("true_count") + noise, 0)
        .cast("bigint")
        .alias("released_count"),
    ).orderBy("nation")


# ---------------------------------------------------------------------------
# Feature-hashing collision audit (r10): the hashing-trick featurizer
# maps tokens to a fixed 64-bucket space (md5 % 64 — engine-portable);
# before shipping hashed features, a pipeline audits how much signal
# collisions destroy. Per bucket: distinct tokens landing there, total
# occurrences, and the share held by the bucket's dominant token
# (purity) — one explode + two hash aggregates, the whole vocabulary
# never leaves the executors.
# ---------------------------------------------------------------------------
@register(
    "feature_hash_collisions",
    """
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),
    tc AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM tok
           WHERE t <> '' GROUP BY t),
    b AS (SELECT CAST(('0x' || substr(md5(t), 1, 13))::BIGINT % 64 AS INT)
                   AS bucket, t, c
          FROM tc)
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(c) AS BIGINT) AS occurrences,
           ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS top_token_share
    FROM b GROUP BY bucket ORDER BY bucket
    """,
)
def feature_hash_collisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split("text", " ")).alias("t")).filter(
        F.col("t") != ""
    )
    tc = tok.groupBy("t").agg(F.count("*").cast("bigint").alias("c"))
    b = tc.select(
        (
            F.conv(F.substring(F.md5("t"), 1, 13), 16, 10).cast("bigint")
            % 64
        )
        .cast("int")
        .alias("bucket"),
        "c",
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum("c").cast("bigint").alias("occurrences"),
            F.round(F.max("c").cast("double") / F.sum("c"), 6).alias(
                "top_token_share"
            ),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Cross-validation fold balance audit (r10): deterministic 5-fold
# assignment (md5 % 5 of the row key — the split every reproducible
# training pipeline uses) audited for label balance: per-fold size,
# positive rate, and the fold's deviation from the global rate. One
# hash aggregate; the audit that catches a skewed fold before it
# poisons a CV estimate.
# ---------------------------------------------------------------------------
@register(
    "cv_fold_balance",
    """
    WITH f AS (
      SELECT CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 13))
                  ::BIGINT % 5 AS INT) AS fold,
             CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END AS y
      FROM orders),
    g AS (SELECT CAST(CAST(SUM(y) AS VARCHAR(64)) AS DOUBLE) / COUNT(*) AS grate FROM f)
    SELECT fold, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(y) AS BIGINT) AS n_pos,
           ROUND(CAST(CAST(SUM(y) AS VARCHAR(64)) AS DOUBLE) / COUNT(*), 6) AS pos_rate,
           ROUND(CAST(CAST(SUM(y) AS VARCHAR(64)) AS DOUBLE) / COUNT(*) - g.grate, 6) AS dev
    FROM f CROSS JOIN g GROUP BY fold, g.grate ORDER BY fold
    """,
)
def cv_fold_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    f = o.select(
        (
            F.conv(
                F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 13),
                16,
                10,
            ).cast("bigint")
            % 5
        )
        .cast("int")
        .alias("fold"),
        F.when(F.col("o_orderpriority").startswith("1"), 1)
        .otherwise(0)
        .alias("y"),
    )
    g = f.agg((F.sum("y").cast("double") / F.count("*")).alias("grate"))
    return (
        f.groupBy("fold")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("n_pos"),
            F.round(F.sum("y").cast("double") / F.count("*"), 6).alias(
                "pos_rate"
            ),
            (F.sum("y").cast("double") / F.count("*")).alias("__r"),
        )
        .crossJoin(F.broadcast(g))
        .select(
            "fold",
            "n",
            "n_pos",
            "pos_rate",
            F.round(F.col("__r") - F.col("grate"), 6).alias("dev"),
        )
        .orderBy("fold")
    )


# ---------------------------------------------------------------------------
# Cumulative gains / lift table (r10): rank orders by the value score
# (deciles from the no-sort equidepth machinery, richest first),
# report each decile's cumulative capture of URGENT orders vs the
# random baseline — the marketing "lift chart" behind every targeting
# decision. The cumulative window runs over 10 aggregate rows.
# ---------------------------------------------------------------------------
@register(
    "cumulative_gains",
    """
    WITH d AS (
      SELECT CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END AS y,
             NTILE(10) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS decile
      FROM orders),
    a AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(y) AS BIGINT) AS pos
          FROM d GROUP BY decile),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS tn, CAST(SUM(pos) AS BIGINT) AS tp
          FROM a),
    c AS (SELECT decile, n, pos,
                 CAST(SUM(n) OVER (ORDER BY decile) AS BIGINT) AS cum_n,
                 CAST(SUM(pos) OVER (ORDER BY decile) AS BIGINT) AS cum_pos
          FROM a)
    SELECT CAST(c.decile AS INT) AS decile, c.n, c.pos,
           ROUND(CAST(c.cum_pos AS DOUBLE) / t.tp, 6) AS cum_capture,
           ROUND((CAST(c.cum_pos AS DOUBLE) / t.tp)
                 / (CAST(c.cum_n AS DOUBLE) / t.tn), 6) AS lift
    FROM c CROSS JOIN t ORDER BY decile
    """,
)
def cumulative_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ome_arrow_spark.operators.quantiles import equidepth_bucket

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.when(F.col("o_orderpriority").startswith("1"), 1)
        .otherwise(0)
        .alias("y"),
    )
    d = equidepth_bucket(
        o, "o_totalprice", "o_orderkey", 10, out="decile", descending=True
    )
    a = d.groupBy("decile").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    t = a.agg(
        F.sum("n").cast("bigint").alias("tn"),
        F.sum("pos").cast("bigint").alias("tp"),
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    c = a.select(
        "decile",
        "n",
        "pos",
        F.sum("n").over(w).cast("bigint").alias("cum_n"),
        F.sum("pos").over(w).cast("bigint").alias("cum_pos"),
    )
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            F.col("decile").cast("int").alias("decile"),
            "n",
            "pos",
            F.round(F.col("cum_pos").cast("double") / F.col("tp"), 6).alias(
                "cum_capture"
            ),
            F.round(
                (F.col("cum_pos").cast("double") / F.col("tp"))
                / (F.col("cum_n").cast("double") / F.col("tn")),
                6,
            ).alias("lift"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov distance (r10): D = max |F1 − F2|
# between the two January halves of the event-value distribution —
# psi_drift's nonparametric sibling (no binning choice). Values
# discretize to one decimal FIRST (both engines identically), so the
# ECDF support is a bounded grid (~10³ points) and the cumulative
# windows run over the per-value count relation, never the events —
# the statistic is EXACT for the discretized variable. The final max
# is one TakeOrdered row.
# ---------------------------------------------------------------------------
@register(
    "ks_two_sample",
    """
    WITH e AS (SELECT ROUND(value, 1) AS v,
                      CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16'
                           THEN 0 ELSE 1 END AS grp
               FROM events),
    n AS (SELECT CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                 CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2
          FROM e),
    c AS (SELECT v,
                 CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                 CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c2
          FROM e GROUP BY v),
    f AS (SELECT v,
                 CAST(SUM(c1) OVER (ORDER BY v) AS BIGINT) AS cum1,
                 CAST(SUM(c2) OVER (ORDER BY v) AS BIGINT) AS cum2
          FROM c)
    SELECT f.v AS at_value,
           ROUND(ABS(CAST(cum1 AS DOUBLE) / n.n1
                     - CAST(cum2 AS DOUBLE) / n.n2), 6) AS ks_d,
           n.n1, n.n2
    FROM f CROSS JOIN n
    ORDER BY ks_d DESC, at_value LIMIT 1
    """,
)
def ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir).select(
        F.round("value", 1).alias("v"),
        F.when(
            F.col("ts") < F.lit("2024-01-16").cast("timestamp"), 0
        )
        .otherwise(1)
        .alias("grp"),
    )
    n = e.agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n2"),
    )
    c = e.groupBy("v").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("c1"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("c2"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    f = c.select(
        "v",
        F.sum("c1").over(w).cast("bigint").alias("cum1"),
        F.sum("c2").over(w).cast("bigint").alias("cum2"),
    )
    return (
        f.crossJoin(F.broadcast(n))
        .select(
            F.col("v").alias("at_value"),
            F.round(
                F.abs(
                    F.col("cum1").cast("double") / F.col("n1")
                    - F.col("cum2").cast("double") / F.col("n2")
                ),
                6,
            ).alias("ks_d"),
            "n1",
            "n2",
        )
        .orderBy(F.desc("ks_d"), "at_value")
        .limit(1)
    )


# ---------------------------------------------------------------------------
# Poisson-bootstrap confidence interval (r10): the canonical DISTRIBUTED
# bootstrap (Chamandy et al., "Estimating Uncertainty for Massive Data
# Streams"; also scikit-style big-data resampling). A classical
# resample needs a global draw of n indices; the Poisson bootstrap
# instead gives every row an independent Poisson(1) weight per
# replicate, so the whole procedure is one pass: explode B replicate
# ids per row (inside whole-stage codegen, pre-combine), weight each
# row by the Poisson(1) inverse CDF of the md5-uniform of
# (orderkey, replicate), and map-side combine reduces the shuffle to
# B rows per partition. The replicate means land on the driver-sized
# B=200 relation; the CI is exact order statistics (ranks 5 and 195 =
# 2.5%/97.5%, no interpolation — cross-engine safe). Weights are
# RNG-free (the proven 13-hex md5 2^52 parse), so DuckDB derives the
# identical resample and the gate pins the mechanism's arithmetic.
# ---------------------------------------------------------------------------
@register(
    "poisson_bootstrap_ci",
    """
    WITH b AS (SELECT r FROM range(200) t(r)),
    t AS (SELECT o_orderkey AS k,
                 CAST(ROUND(o_totalprice, 9) AS DECIMAL(20,9)) AS price
          FROM orders),
    u AS (SELECT t.price, b.r,
                 CAST(('0x' || substr(md5(CAST(t.k AS VARCHAR) || ':'
                       || CAST(b.r AS VARCHAR)), 1, 13))::BIGINT AS DOUBLE)
                   / 4503599627370496.0 AS uni
          FROM t CROSS JOIN b),
    w AS (SELECT r, price,
                 CASE WHEN uni < 0.36787944117144233 THEN 0
                      WHEN uni < 0.7357588823428847  THEN 1
                      WHEN uni < 0.9196986029286058  THEN 2
                      WHEN uni < 0.9810118431238462  THEN 3
                      WHEN uni < 0.9963401531726563  THEN 4
                      WHEN uni < 0.9994058151824183  THEN 5
                      ELSE 6 END AS wt
          FROM u),
    est AS (SELECT r, CAST(CAST(SUM(price * wt) AS VARCHAR(64)) AS DOUBLE)
                      / CAST(CAST(SUM(wt) AS VARCHAR(64)) AS DOUBLE) AS mean_r
            FROM w GROUP BY r),
    rk AS (SELECT r, mean_r,
                  ROW_NUMBER() OVER (ORDER BY mean_r, r) AS rn
           FROM est),
    ci AS (SELECT ROUND(MAX(CASE WHEN rn = 5 THEN mean_r END), 6) AS ci_lo,
                  ROUND(MAX(CASE WHEN rn = 195 THEN mean_r END), 6) AS ci_hi
           FROM rk),
    pt AS (SELECT CAST(CAST(SUM(price) AS VARCHAR(64)) AS DOUBLE) / COUNT(*) AS mean_all FROM t)
    SELECT CAST(200 AS BIGINT) AS b_replicates,
           ROUND(pt.mean_all, 6) AS point_est, ci.ci_lo, ci.ci_hi
    FROM ci CROSS JOIN pt
    """,
)
def poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    B = 200
    t = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round("o_totalprice", 9).cast("decimal(20,9)").alias("price"),
    )
    b = spark.range(B).select(F.col("id").cast("int").alias("r"))
    u = t.crossJoin(F.broadcast(b))
    uni = (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.col("k"), F.col("r"))), 1, 13),
            16,
            10,
        )
        .cast("bigint")
        .cast("double")
        / F.lit(4503599627370496.0)
    )
    wt = (
        F.when(uni < 0.36787944117144233, 0)
        .when(uni < 0.7357588823428847, 1)
        .when(uni < 0.9196986029286058, 2)
        .when(uni < 0.9810118431238462, 3)
        .when(uni < 0.9963401531726563, 4)
        .when(uni < 0.9994058151824183, 5)
        .otherwise(6)
    )
    est = (
        u.select("r", "price", wt.alias("wt"))
        .groupBy("r")
        .agg(
            (
                F.sum(F.col("price") * F.col("wt")).cast("double")
                / F.sum("wt").cast("double")
            ).alias("mean_r")
        )
    )
    rk = est.select(
        "r",
        "mean_r",
        F.row_number().over(Window.orderBy("mean_r", "r")).alias("rn"),
    )
    ci = rk.agg(
        F.round(F.max(F.when(F.col("rn") == 5, F.col("mean_r"))), 6).alias(
            "ci_lo"
        ),
        F.round(F.max(F.when(F.col("rn") == 195, F.col("mean_r"))), 6).alias(
            "ci_hi"
        ),
    )
    pt = t.agg(
        (F.sum("price").cast("double") / F.count("*")).alias("mean_all")
    )
    return ci.crossJoin(F.broadcast(pt)).select(
        F.lit(B).cast("bigint").alias("b_replicates"),
        F.round(F.col("mean_all"), 6).alias("point_est"),
        "ci_lo",
        "ci_hi",
    )


# ---------------------------------------------------------------------------
# Classical seasonal decomposition (r10): additive
# trend/seasonal/residual split of the daily order-count series —
# trend is the centered 7-day moving average (full windows only),
# the seasonal index is the mean detrended value per day-of-week,
# residuals are what remains. The raw table aggregates to ONE row per
# calendar day before any window runs, so the windowed series is
# bounded by the calendar (~2.4k rows over seven years) regardless of
# raw data size — at 100 TB the heavy lifting is the first groupBy
# (map-side combinable) and everything after is driver-scale.
# Day-of-week is anchored arithmetically (days since 1995-01-01 mod
# 7), avoiding engine-specific DOW numbering.
# ---------------------------------------------------------------------------
@register(
    "seasonal_decomposition",
    """
    WITH d AS (SELECT CAST(o_orderdate AS DATE) AS d,
                      CAST(COUNT(*) AS BIGINT) AS cnt
               FROM orders GROUP BY 1),
    m AS (SELECT d, cnt,
                 SUM(cnt) OVER (ORDER BY d
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s7,
                 COUNT(*) OVER (ORDER BY d
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS c7
          FROM d),
    det AS (SELECT d, CAST(cnt AS DOUBLE) - CAST(s7 AS DOUBLE) / 7.0 AS detr
            FROM m WHERE c7 = 7),
    s AS (SELECT CAST(((d - DATE '1995-01-01') % 7 + 7) % 7 AS INT) AS dow,
                 CAST(COUNT(*) AS BIGINT) AS n_days,
                 CAST(CAST(SUM(CAST(ROUND(detr, 9) AS DECIMAL(20,9))) AS VARCHAR(64)) AS DOUBLE)
                   / COUNT(*) AS seasonal
          FROM det GROUP BY 1),
    r AS (SELECT s.dow, s.n_days, s.seasonal,
                 CAST(CAST(SUM(CAST(ROUND(ABS(det.detr - s.seasonal), 9)
                      AS DECIMAL(20,9))) AS VARCHAR(64)) AS DOUBLE) / COUNT(*) AS mar
          FROM det JOIN s
            ON CAST(((det.d - DATE '1995-01-01') % 7 + 7) % 7 AS INT) = s.dow
          GROUP BY 1, 2, 3)
    SELECT dow, n_days, ROUND(seasonal, 6) AS seasonal_idx,
           ROUND(mar, 6) AS mean_abs_resid
    FROM r ORDER BY dow
    """,
)
def seasonal_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    m = daily.select(
        "d",
        "cnt",
        F.sum("cnt").over(w7).alias("s7"),
        F.count("*").over(w7).alias("c7"),
    )
    det = m.filter(F.col("c7") == 7).select(
        "d",
        (
            F.col("cnt").cast("double") - F.col("s7").cast("double") / 7.0
        ).alias("detr"),
    )
    # pmod, not %: dates BEFORE the anchor must still land in 0..6
    # (ADVICE r10 — plain % yields negative remainders in both engines)
    anchor = F.lit("1995-01-01").cast("date")
    dow = F.pmod(F.datediff(F.col("d"), anchor), F.lit(7)).cast("int")
    s = det.groupBy(dow.alias("dow")).agg(
        F.count("*").cast("bigint").alias("n_days"),
        (
            F.sum(F.round("detr", 9).cast("decimal(20,9)")).cast("double")
            / F.count("*")
        ).alias("seasonal"),
    )
    r = (
        det.withColumn("dow", dow)
        .join(F.broadcast(s), "dow")
        .groupBy("dow", "n_days", "seasonal")
        .agg(
            (
                F.sum(
                    F.round(
                        F.abs(F.col("detr") - F.col("seasonal")), 9
                    ).cast("decimal(20,9)")
                ).cast("double")
                / F.count("*")
            ).alias("mar")
        )
    )
    return r.select(
        "dow",
        "n_days",
        F.round("seasonal", 6).alias("seasonal_idx"),
        F.round("mar", 6).alias("mean_abs_resid"),
    ).orderBy("dow")


# ===========================================================================
# Round-11 additions: eval metrics, multiple testing, drift, market
# structure, and feature-engineering operators — each one written
# Spark-first with an explicit 100 TB posture note, and each one gated
# by a DuckDB oracle that recomputes the identical arithmetic.
# ===========================================================================


# ---------------------------------------------------------------------------
# Exact equi-depth deciles over a CONTINUOUS double metric (r11): the
# direct gate for the hierarchical boundary resolution that closed
# VERDICT r10's one scale-killer. events.value has ~n distinct values,
# so the OLD formulation's unpartitioned cumulative window over the
# distinct-value relation was a single-partition sort of ~n rows; the
# hierarchical path (approx seed edges -> exact per-range counts ->
# range-PARTITIONED cumulative window over only the boundary ranges)
# keeps every exchange hash-partitioned. The oracle is plain NTILE, so
# this row re-proves bit-equality of the scale twin on every run.
# ---------------------------------------------------------------------------
@register(
    "equidepth_continuous",
    """
    WITH t AS (SELECT value, event_id,
                      NTILE(10) OVER (ORDER BY value, event_id) AS decile
               FROM events)
    SELECT CAST(decile AS INT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(value) AS min_v,
           MAX(value) AS max_v,
           CAST(CAST(SUM(CAST(ROUND(value, 9) AS DECIMAL(20,9))) AS VARCHAR(64)) AS DOUBLE)
             / COUNT(*) AS avg_v
    FROM t GROUP BY decile ORDER BY decile
    """,
)
def equidepth_continuous(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ome_arrow_spark.operators.quantiles import equidepth_bucket

    e = _events(spark, sf_dir).select("event_id", "value")
    d = equidepth_bucket(e, "value", "event_id", 10, out="decile")
    return (
        d.groupBy(F.col("decile").cast("int").alias("decile"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
            (
                F.sum(F.round("value", 9).cast("decimal(20,9)")).cast("double")
                / F.count("*")
            ).alias("avg_v"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# Exact distributed ROC AUC (r11): the Mann-Whitney pair count without
# a global rank. The classic formulation needs ROW_NUMBER() over ALL
# scores (single-partition sort); here scores are pre-bucketed by the
# exact no-sort equidepth machinery into 64 tiles, so the pair count
# decomposes into (a) cross-bucket pairs — per-bucket pos/neg counts,
# one cumulative window over the 64-row census (bounded by k, not by
# data) — and (b) within-bucket pairs — a cumulative negative count
# windowed PER BUCKET (64-way parallel, each partition ~n/64). Scores
# get a key*1e-9 dither so they are unique (no tie handling needed;
# granularity-safe through sf1 where key*1e-9 < the 0.01 price step),
# making the pair count an exact BIGINT that the oracle reproduces
# with its naive global-rank formula.
# ---------------------------------------------------------------------------
@register(
    "auc_roc",
    """
    WITH d AS (
      SELECT CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END AS y,
             CAST(o_totalprice AS DOUBLE) + o_orderkey * 1e-9 AS s
      FROM orders),
    r AS (SELECT y, CAST(ROW_NUMBER() OVER (ORDER BY s) AS BIGINT) AS rk
          FROM d),
    a AS (SELECT CAST(SUM(y) AS BIGINT) AS n_pos,
                 CAST(COUNT(*) - SUM(y) AS BIGINT) AS n_neg,
                 CAST(SUM(CASE WHEN y = 1 THEN rk ELSE 0 END) AS BIGINT)
                   AS rank_sum
          FROM r)
    SELECT n_pos, n_neg,
           CAST(rank_sum - (n_pos * (n_pos + 1)) // 2 AS BIGINT)
             AS pairs_above,
           ROUND(CAST(rank_sum - (n_pos * (n_pos + 1)) // 2 AS DOUBLE)
                 / (n_pos * n_neg), 6) AS auc
    FROM a
    """,
)
def auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ome_arrow_spark.operators.quantiles import equidepth_bucket

    o = _t(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderpriority").startswith("1"), 1)
        .otherwise(0)
        .alias("y"),
        (
            F.col("o_totalprice").cast("double")
            + F.col("o_orderkey") * F.lit(1e-9)
        ).alias("s"),
        "o_orderkey",
    )
    d = equidepth_bucket(o, "s", "o_orderkey", 64, out="b")
    # (b) within-bucket: negatives strictly below each positive —
    # windowed PER BUCKET (64-way parallel), scores unique by dither
    wb = (
        Window.partitionBy("b")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = (
        d.select(
            "y",
            F.coalesce(
                F.sum(F.lit(1) - F.col("y")).over(wb), F.lit(0)
            ).alias("nb"),
        )
        .filter(F.col("y") == 1)
        .agg(F.sum("nb").cast("bigint").alias("w_pairs"))
    )
    # (a) cross-bucket: census window over the 64-row per-bucket
    # aggregate — bounded by the tile count, never by the data
    per_b = d.groupBy("b").agg(
        F.sum("y").alias("pos_b"),
        (F.count("*") - F.sum("y")).alias("neg_b"),
    )
    wc = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    cross = per_b.select(
        (
            F.col("pos_b")
            * F.coalesce(F.sum("neg_b").over(wc), F.lit(0))
        ).alias("cp")
    ).agg(F.sum("cp").cast("bigint").alias("c_pairs"))
    tot = d.agg(
        F.sum("y").cast("bigint").alias("n_pos"),
        (F.count("*") - F.sum("y")).cast("bigint").alias("n_neg"),
    )
    pairs = F.col("w_pairs") + F.col("c_pairs")
    return (
        tot.crossJoin(F.broadcast(within))
        .crossJoin(F.broadcast(cross))
        .select(
            "n_pos",
            "n_neg",
            pairs.cast("bigint").alias("pairs_above"),
            F.round(
                pairs.cast("double") / (F.col("n_pos") * F.col("n_neg")), 6
            ).alias("auc"),
        )
    )


# ---------------------------------------------------------------------------
# Benjamini-Hochberg FDR control (r11): m per-nation hypotheses, each
# a one-sample KS uniformity test of the nation's customer md5-uniform
# draws (D from one PARTITIONED window per nation; p = the asymptotic
# 2·exp(-2nD²), capped at 1 — exp-only, so cross-engine IEEE-exact
# without any CDF special function). The BH step (sort p ascending,
# k* = max{i: p_(i) <= i·q/m}, reject ranks <= k*) runs on the m-row
# relation — bounded by the hypothesis count, never by the data.
# Doubles are emitted UNROUNDED: both engines build the identical
# expression tree over identical inputs, so the bits match.
# ---------------------------------------------------------------------------
@register(
    "benjamini_hochberg",
    """
    WITH u AS (
      SELECT n.n_name AS nation,
             CAST(('0x' || substr(md5('bh:' || CAST(c.c_custkey AS VARCHAR)),
                                  1, 13))::BIGINT AS DOUBLE)
               / 4503599627370496.0 AS uni
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey),
    r AS (SELECT nation, uni,
                 CAST(ROW_NUMBER() OVER (PARTITION BY nation ORDER BY uni)
                      AS BIGINT) AS i,
                 CAST(COUNT(*) OVER (PARTITION BY nation) AS BIGINT) AS n
          FROM u),
    d AS (SELECT nation, MAX(n) AS n_cust,
                 MAX(GREATEST(CAST(i AS DOUBLE) / n - uni,
                              uni - CAST(i - 1 AS DOUBLE) / n)) AS ks_d
          FROM r GROUP BY nation),
    p AS (SELECT nation, n_cust, ks_d,
                 ROUND(LEAST(1.0, 2.0 * EXP(-2.0 * n_cust * ks_d * ks_d)), 9)
                   AS p_value
          FROM d),
    rk AS (SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY p_value, nation)
                          AS INT) AS rk
           FROM p),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM p),
    ks AS (SELECT MAX(CASE WHEN p_value <= rk * 0.25 / m.m
                           THEN rk END) AS kstar
           FROM rk CROSS JOIN m)
    SELECT nation, n_cust, ks_d, p_value, rk,
           CAST(CASE WHEN ks.kstar IS NOT NULL AND rk <= ks.kstar
                     THEN 1 ELSE 0 END AS INT) AS rejected
    FROM rk CROSS JOIN ks
    ORDER BY rk
    """,
)
def benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    uni = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("bh:"), F.col("c_custkey").cast("string"))),
                1,
                13,
            ),
            16,
            10,
        )
        .cast("bigint")
        .cast("double")
        / F.lit(4503599627370496.0)
    )
    u = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        F.col("n_name").alias("nation"), uni.alias("uni")
    )
    wn = Window.partitionBy("nation")
    wo = wn.orderBy("uni")
    r = u.select(
        "nation",
        "uni",
        F.row_number().over(wo).cast("bigint").alias("i"),
        F.count("*").over(wn).cast("bigint").alias("n"),
    )
    d = r.groupBy("nation").agg(
        F.max("n").alias("n_cust"),
        F.max(
            F.greatest(
                F.col("i").cast("double") / F.col("n") - F.col("uni"),
                F.col("uni") - (F.col("i") - 1).cast("double") / F.col("n"),
            )
        ).alias("ks_d"),
    )
    p = d.select(
        "nation",
        "n_cust",
        "ks_d",
        # exp is libm-dependent at the last ulp (JVM Math.exp vs C
        # exp) — round to 9 digits BEFORE ranking/thresholding so the
        # BH step sees identical values in both engines
        F.round(
            F.least(
                F.lit(1.0),
                2.0
                * F.exp(
                    -2.0 * F.col("n_cust") * F.col("ks_d") * F.col("ks_d")
                ),
            ),
            9,
        ).alias("p_value"),
    )
    # BH on the m-row hypothesis relation (m = #nations, bounded)
    rk = p.withColumn(
        "rk", F.row_number().over(Window.orderBy("p_value", "nation")).cast("int")
    )
    m = p.agg(F.count("*").cast("bigint").alias("m"))
    ks = (
        rk.crossJoin(F.broadcast(m))
        .agg(
            F.max(
                F.when(
                    F.col("p_value") <= F.col("rk") * 0.25 / F.col("m"),
                    F.col("rk"),
                )
            ).alias("kstar")
        )
    )
    return (
        rk.crossJoin(F.broadcast(ks))
        .select(
            "nation",
            "n_cust",
            "ks_d",
            "p_value",
            "rk",
            F.when(
                F.col("kstar").isNotNull() & (F.col("rk") <= F.col("kstar")),
                1,
            )
            .otherwise(0)
            .cast("int")
            .alias("rejected"),
        )
        .orderBy("rk")
    )


# ---------------------------------------------------------------------------
# Jensen-Shannon drift monitor (r11): the symmetric, bounded companion
# to psi_drift — same reference-period decile edges (hierarchical
# no-sort equidepth), same Laplace-smoothed bucket shares, but the
# per-bucket statistic is 0.5·p·ln(p/m̄) + 0.5·q·ln(q/m̄) with
# m̄ = (p+q)/2, whose sum is the JS divergence (0 ≤ JS ≤ ln 2). Edges
# are ≤9 broadcast literals; both periods are scanned once each.
# ---------------------------------------------------------------------------
@register(
    "js_divergence_drift",
    """
    WITH e AS (SELECT event_id, value, CAST(ts AS TIMESTAMP) AS ts FROM events),
    ref AS (SELECT event_id, value FROM e WHERE ts < TIMESTAMP '2024-01-16'),
    cur AS (SELECT event_id, value FROM e WHERE ts >= TIMESTAMP '2024-01-16'),
    t AS (SELECT value, NTILE(10) OVER (ORDER BY value, event_id) AS b FROM ref),
    edges AS (SELECT b, MAX(value) AS e FROM t WHERE b < 10 GROUP BY b),
    br AS (SELECT 1 + (SELECT COUNT(*) FROM edges WHERE e < r.value) AS bucket
           FROM ref r),
    bc AS (SELECT 1 + (SELECT COUNT(*) FROM edges WHERE e < c.value) AS bucket
           FROM cur c),
    cr AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_ref FROM br GROUP BY bucket),
    cc AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_cur FROM bc GROUP BY bucket),
    tot AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ref) AS nr,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM cur) AS nc)
    SELECT CAST(b.bucket AS INT) AS bucket,
           COALESCE(cr.n_ref, 0) AS n_ref, COALESCE(cc.n_cur, 0) AS n_cur,
           ROUND((COALESCE(cr.n_ref, 0) + 1.0) / (tot.nr + 10), 6) AS p_ref,
           ROUND((COALESCE(cc.n_cur, 0) + 1.0) / (tot.nc + 10), 6) AS p_cur,
           ROUND(0.5 * ((COALESCE(cr.n_ref, 0) + 1.0) / (tot.nr + 10))
                 * LN(((COALESCE(cr.n_ref, 0) + 1.0) / (tot.nr + 10))
                      / ((((COALESCE(cr.n_ref, 0) + 1.0) / (tot.nr + 10))
                          + ((COALESCE(cc.n_cur, 0) + 1.0) / (tot.nc + 10))) / 2))
                 + 0.5 * ((COALESCE(cc.n_cur, 0) + 1.0) / (tot.nc + 10))
                 * LN(((COALESCE(cc.n_cur, 0) + 1.0) / (tot.nc + 10))
                      / ((((COALESCE(cr.n_ref, 0) + 1.0) / (tot.nr + 10))
                          + ((COALESCE(cc.n_cur, 0) + 1.0) / (tot.nc + 10))) / 2)),
                 6) AS js_term
    FROM (SELECT unnest(range(1, 11)) AS bucket) b
    LEFT JOIN cr ON cr.bucket = b.bucket
    LEFT JOIN cc ON cc.bucket = b.bucket
    CROSS JOIN tot
    ORDER BY bucket
    """,
)
def js_divergence_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ome_arrow_spark.operators.quantiles import equidepth_edges

    e = _events(spark, sf_dir).select("event_id", "value", "ts")
    split = F.lit("2024-01-16").cast("timestamp")
    ref = e.filter(F.col("ts") < split).select("event_id", "value")
    cur = e.filter(F.col("ts") >= split).select("event_id", "value")
    edges = equidepth_edges(ref, "value", "event_id", 10)

    def bucket(col):
        b = F.lit(1)
        for ev in edges:
            b = b + (F.lit(ev) < col).cast("int")
        return b

    cr = (
        ref.select(bucket(F.col("value")).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").cast("bigint").alias("n_ref"))
    )
    cc = (
        cur.select(bucket(F.col("value")).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").cast("bigint").alias("n_cur"))
    )
    tot = ref.agg(F.count("*").cast("bigint").alias("nr")).crossJoin(
        cur.agg(F.count("*").cast("bigint").alias("nc"))
    )
    buckets = spark.range(1, 11).select(F.col("id").cast("int").alias("bucket"))
    j = (
        buckets.join(cr, "bucket", "left")
        .join(cc, "bucket", "left")
        .crossJoin(F.broadcast(tot))
    )
    pr = (F.coalesce(F.col("n_ref"), F.lit(0)) + 1.0) / (F.col("nr") + 10)
    pc = (F.coalesce(F.col("n_cur"), F.lit(0)) + 1.0) / (F.col("nc") + 10)
    mid = (pr + pc) / 2
    return j.select(
        "bucket",
        F.coalesce(F.col("n_ref"), F.lit(0)).cast("bigint").alias("n_ref"),
        F.coalesce(F.col("n_cur"), F.lit(0)).cast("bigint").alias("n_cur"),
        F.round(pr, 6).alias("p_ref"),
        F.round(pc, 6).alias("p_cur"),
        F.round(
            0.5 * pr * F.log(pr / mid) + 0.5 * pc * F.log(pc / mid), 6
        ).alias("js_term"),
    ).orderBy("bucket")


# ---------------------------------------------------------------------------
# Association rules (r11): the market-basket step AFTER
# frequent_itemsets — pairwise rules a→b over per-order brand baskets
# with support / confidence / lift. The basket self-join is keyed on
# the order and bounded by the per-basket item count (≤7 lines in
# TPC-H shape), so candidate pairs are LINEAR in orders, never
# quadratic in items; counts are exact bigints, ratios exact-int
# divisions, and the top-20 cut is orderBy+limit (TakeOrdered) with a
# full unique tiebreak.
# ---------------------------------------------------------------------------
@register(
    "association_rules",
    """
    WITH b AS (SELECT DISTINCT l_orderkey AS ok, p_brand AS brand
               FROM lineitem JOIN part ON l_partkey = p_partkey),
    n AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_baskets FROM b),
    ic AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS cnt FROM b GROUP BY brand),
    pc AS (SELECT x.brand AS a, y.brand AS bb, CAST(COUNT(*) AS BIGINT) AS ab
           FROM b x JOIN b y ON x.ok = y.ok AND x.brand < y.brand
           GROUP BY 1, 2),
    r AS (SELECT a AS antecedent, bb AS consequent, ab FROM pc
          UNION ALL SELECT bb, a, ab FROM pc),
    s AS (SELECT r.antecedent, r.consequent, r.ab AS support_cnt,
                 CAST(r.ab AS DOUBLE) / ia.cnt AS confidence,
                 CAST(r.ab AS DOUBLE) / ia.cnt * n.n_baskets / ico.cnt AS lift
          FROM r JOIN ic ia ON ia.brand = r.antecedent
                 JOIN ic ico ON ico.brand = r.consequent
                 CROSS JOIN n
          WHERE r.ab >= 20)
    SELECT antecedent, consequent, support_cnt,
           ROUND(confidence, 6) AS confidence, ROUND(lift, 6) AS lift
    FROM s
    ORDER BY lift DESC, confidence DESC, antecedent, consequent
    LIMIT 20
    """,
)
def association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    pt = _t(spark, sf_dir, "part")
    b = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    n = b.agg(F.countDistinct("ok").cast("bigint").alias("n_baskets"))
    ic = b.groupBy("brand").agg(F.count("*").cast("bigint").alias("cnt"))
    x, y = b.alias("x"), b.alias("y")
    pc = (
        x.join(y, (F.col("x.ok") == F.col("y.ok")) & (F.col("x.brand") < F.col("y.brand")))
        .groupBy(F.col("x.brand").alias("a"), F.col("y.brand").alias("bb"))
        .agg(F.count("*").cast("bigint").alias("ab"))
    )
    r = pc.select(
        F.col("a").alias("antecedent"), F.col("bb").alias("consequent"), "ab"
    ).unionAll(
        pc.select(
            F.col("bb").alias("antecedent"), F.col("a").alias("consequent"), "ab"
        )
    )
    ia = ic.select(F.col("brand").alias("antecedent"), F.col("cnt").alias("a_cnt"))
    ico = ic.select(F.col("brand").alias("consequent"), F.col("cnt").alias("c_cnt"))
    conf = F.col("ab").cast("double") / F.col("a_cnt")
    s = (
        r.filter(F.col("ab") >= 20)
        .join(F.broadcast(ia), "antecedent")
        .join(F.broadcast(ico), "consequent")
        .crossJoin(F.broadcast(n))
        .select(
            "antecedent",
            "consequent",
            F.col("ab").alias("support_cnt"),
            F.round(conf, 6).alias("confidence"),
            F.round(conf * F.col("n_baskets") / F.col("c_cnt"), 6).alias("lift"),
            (conf * F.col("n_baskets") / F.col("c_cnt")).alias("__lift_raw"),
            conf.alias("__conf_raw"),
        )
    )
    return (
        s.orderBy(
            F.col("__lift_raw").desc(),
            F.col("__conf_raw").desc(),
            "antecedent",
            "consequent",
        )
        .limit(20)
        .select("antecedent", "consequent", "support_cnt", "confidence", "lift")
    )


# ---------------------------------------------------------------------------
# Confusion matrix + Matthews correlation (r11): binary eval metrics
# from one hash aggregate — tp/fp/fn/tn as exact conditional-count
# bigints, precision/recall/F1/MCC as identical-tree double arithmetic
# over them (the MCC denominator multiplies as doubles to dodge bigint
# overflow at n² scale). ONE scan, map-side partials, a 1-row result.
# ---------------------------------------------------------------------------
@register(
    "mcc_confusion",
    """
    WITH d AS (
      SELECT CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END AS y,
             CASE WHEN o_totalprice < 100000 THEN 1 ELSE 0 END AS yhat
      FROM orders),
    c AS (SELECT CAST(SUM(y * yhat) AS BIGINT) AS tp,
                 CAST(SUM((1 - y) * yhat) AS BIGINT) AS fp,
                 CAST(SUM(y * (1 - yhat)) AS BIGINT) AS fn,
                 CAST(SUM((1 - y) * (1 - yhat)) AS BIGINT) AS tn
          FROM d)
    SELECT tp, fp, fn, tn,
           ROUND(CAST(tp AS DOUBLE) / (tp + fp), 6) AS prec,
           ROUND(CAST(tp AS DOUBLE) / (tp + fn), 6) AS recall,
           ROUND(2.0 * tp / (2.0 * tp + fp + fn), 6) AS f1,
           ROUND((CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)
                 / SQRT(CAST(tp + fp AS DOUBLE) * (tp + fn)
                        * (tn + fp) * (tn + fn)), 6) AS mcc
    FROM c
    """,
)
def mcc_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderpriority").startswith("1"), 1)
        .otherwise(0)
        .alias("y"),
        F.when(F.col("o_totalprice") < 100000, 1).otherwise(0).alias("yhat"),
    )
    c = o.agg(
        F.sum(F.col("y") * F.col("yhat")).cast("bigint").alias("tp"),
        F.sum((1 - F.col("y")) * F.col("yhat")).cast("bigint").alias("fp"),
        F.sum(F.col("y") * (1 - F.col("yhat"))).cast("bigint").alias("fn"),
        F.sum((1 - F.col("y")) * (1 - F.col("yhat"))).cast("bigint").alias("tn"),
    )
    tp, fp, fn, tn = (F.col(c_) for c_ in ("tp", "fp", "fn", "tn"))
    return c.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(tp.cast("double") / (tp + fp), 6).alias("prec"),
        F.round(tp.cast("double") / (tp + fn), 6).alias("recall"),
        F.round(2.0 * tp / (2.0 * tp + fp + fn), 6).alias("f1"),
        F.round(
            (tp.cast("double") * tn - fp.cast("double") * fn)
            / F.sqrt(
                (tp + fp).cast("double") * (tp + fn) * (tn + fp) * (tn + fn)
            ),
            6,
        ).alias("mcc"),
    )


# ---------------------------------------------------------------------------
# Herfindahl-Hirschman market concentration (r11): per-region supplier
# revenue shares from exact decimal sums; HHI = Σ share²·10⁴ folded
# through the proven round-9-decimal accumulator so the share-square
# sum is aggregation-order-free. Revenue rollup shuffles on
# (region, supplier) once; region totals broadcast back (5 rows).
# ---------------------------------------------------------------------------
@register(
    "hhi_concentration",
    """
    WITH rev AS (SELECT r_name AS region, s_suppkey,
                        SUM(CAST(l_extendedprice * (1 - l_discount)
                                 AS DECIMAL(30,6))) AS sr
                 FROM lineitem
                 JOIN supplier ON l_suppkey = s_suppkey
                 JOIN nation ON s_nationkey = n_nationkey
                 JOIN region ON n_regionkey = r_regionkey
                 GROUP BY 1, 2),
    t AS (SELECT region, SUM(sr) AS tot,
                 CAST(COUNT(*) AS BIGINT) AS n_suppliers
          FROM rev GROUP BY region),
    h AS (SELECT rev.region,
                 CAST(rev.sr AS DOUBLE) / CAST(t.tot AS DOUBLE) AS share
          FROM rev JOIN t USING (region))
    SELECT h.region, t.n_suppliers,
           CAST(CAST(SUM(CAST(ROUND(h.share * h.share * 10000, 9)
                         AS DECIMAL(20,9))) AS VARCHAR(64)) AS DOUBLE) AS hhi,
           MAX(h.share) AS top_share
    FROM h JOIN t ON h.region = t.region
    GROUP BY 1, 2 ORDER BY h.region
    """,
)
def hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    su = _t(spark, sf_dir, "supplier")
    na = _t(spark, sf_dir, "nation")
    re = _t(spark, sf_dir, "region")
    dp = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rev = (
        li.join(su, li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), "s_suppkey")
        .agg(F.sum(dp.cast("decimal(30,6)")).alias("sr"))
    )
    t = rev.groupBy("region").agg(
        F.sum("sr").alias("tot"),
        F.count("*").cast("bigint").alias("n_suppliers"),
    )
    h = rev.join(F.broadcast(t), "region").select(
        "region",
        "n_suppliers",
        (F.col("sr").cast("double") / F.col("tot").cast("double")).alias(
            "share"
        ),
    )
    return (
        h.groupBy("region", "n_suppliers")
        .agg(
            F.sum(
                F.round(F.col("share") * F.col("share") * 10000, 9).cast(
                    "decimal(20,9)"
                )
            )
            .cast("double")
            .alias("hhi"),
            F.max("share").alias("top_share"),
        )
        .orderBy("region")
    )


# ---------------------------------------------------------------------------
# Leave-one-out target encoding (r11): the feature-engineering step
# that replaces a categorical with its smoothed out-of-fold target
# rate — enc_i = (Σ_c y − y_i + m·prior) / (n_c − 1 + m), m=10. Per-
# category sums are one hash aggregate broadcast back onto the rows
# (LOO needs no self-join); the per-row doubles fold through the
# round-9-decimal accumulator so the reported per-category mean
# encoding is aggregation-order-free. One scan + one broadcast join.
# ---------------------------------------------------------------------------
@register(
    "target_encoding",
    """
    WITH d AS (SELECT o_orderpriority AS priority,
                      CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS y
               FROM orders),
    g AS (SELECT CAST(CAST(SUM(y) AS VARCHAR(64)) AS DOUBLE) / COUNT(*) AS prior FROM d),
    c AS (SELECT priority, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(y) AS BIGINT) AS pos
          FROM d GROUP BY priority),
    e AS (SELECT d.priority,
                 (c.pos - d.y + 10 * g.prior) / (c.n - 1 + 10) AS enc
          FROM d JOIN c USING (priority) CROSS JOIN g)
    SELECT c.priority, c.n, c.pos,
           CAST(c.pos AS DOUBLE) / c.n AS raw_rate,
           CAST(CAST(SUM(CAST(ROUND(e.enc, 9) AS DECIMAL(20,9))) AS VARCHAR(64)) AS DOUBLE)
             / COUNT(*) AS avg_loo_enc
    FROM e JOIN c USING (priority)
    GROUP BY c.priority, c.n, c.pos ORDER BY c.priority
    """,
)
def target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.when(F.col("o_totalprice") > 150000, 1)
        .otherwise(0)
        .alias("y"),
    )
    g = li.agg(
        (F.sum("y").cast("double") / F.count("*")).alias("prior")
    )
    c = li.groupBy("priority").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    e = (
        li.join(F.broadcast(c), "priority")
        .crossJoin(F.broadcast(g))
        .select(
            "priority",
            "n",
            "pos",
            (
                (F.col("pos") - F.col("y") + 10 * F.col("prior"))
                / (F.col("n") - 1 + 10)
            ).alias("enc"),
        )
    )
    return (
        e.groupBy("priority", "n", "pos")
        .agg(
            (
                F.sum(F.round("enc", 9).cast("decimal(20,9)")).cast("double")
                / F.count("*")
            ).alias("avg_loo_enc")
        )
        .select(
            "priority",
            "n",
            "pos",
            (F.col("pos").cast("double") / F.col("n")).alias("raw_rate"),
            "avg_loo_enc",
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# Rank correlations (r11 late batch): Spearman rho and Kendall tau-b
# between daily order volume and daily spend. Both run on the
# calendar-bounded daily aggregate (~2.4k rows — the
# seasonal_decomposition precedent: global windows / quadratic pair
# joins are driver-scale BY CONSTRUCTION after the groupBy, never on
# the raw fact table). Ranks are carried as 2·avg_rank = 2·min_rank +
# tie_count − 1 (exact BIGINT — correlation is affine-invariant, so
# doubling changes nothing), every moment sum is an exact integer
# aggregate, and the only doubles are the final closed-form ratios —
# bit-equal cross-engine because sqrt is IEEE-correctly-rounded.
# ---------------------------------------------------------------------------
@register(
    "spearman_daily",
    """
    WITH d AS (SELECT o_orderdate AS d,
                      CAST(COUNT(*) AS BIGINT) AS n_orders,
                      SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS spend
               FROM orders GROUP BY 1),
    r AS (SELECT
            2 * RANK() OVER (ORDER BY n_orders)
              + COUNT(*) OVER (PARTITION BY n_orders) - 1 AS rx,
            2 * RANK() OVER (ORDER BY spend)
              + COUNT(*) OVER (PARTITION BY spend) - 1 AS ry
          FROM d),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(rx) AS BIGINT) AS sx,
                 CAST(SUM(ry) AS BIGINT) AS sy,
                 CAST(SUM(rx * rx) AS BIGINT) AS sxx,
                 CAST(SUM(ry * ry) AS BIGINT) AS syy,
                 CAST(SUM(rx * ry) AS BIGINT) AS sxy
          FROM r)
    SELECT n AS n_days,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                * SQRT(CAST(n * syy - sy * sy AS DOUBLE))) AS rho
    FROM s
    """,
)
def spearman_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(30,6)")).alias("spend"),
        )
    )
    r = d.select(
        (
            2 * F.rank().over(W.orderBy("n_orders"))
            + F.count("*").over(W.partitionBy("n_orders"))
            - 1
        ).alias("rx"),
        (
            2 * F.rank().over(W.orderBy("spend"))
            + F.count("*").over(W.partitionBy("spend"))
            - 1
        ).alias("ry"),
    )
    s = r.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("rx").cast("bigint").alias("sx"),
        F.sum("ry").cast("bigint").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).cast("bigint").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("bigint").alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).cast("bigint").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    return s.select(
        n.alias("n_days"),
        (
            (n * F.col("sxy") - sx * sy).cast("double")
            / (
                F.sqrt((n * F.col("sxx") - sx * sx).cast("double"))
                * F.sqrt((n * F.col("syy") - sy * sy).cast("double"))
            )
        ).alias("rho"),
    )


@register(
    "kendall_tau_daily",
    """
    WITH d AS (SELECT o_orderdate AS d,
                      CAST(COUNT(*) AS BIGINT) AS n_orders,
                      SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS spend
               FROM orders GROUP BY 1),
    p AS (SELECT a.n_orders AS x1, b.n_orders AS x2,
                 a.spend AS y1, b.spend AS y2
          FROM d a JOIN d b ON a.d < b.d),
    s AS (SELECT
            CAST(SUM(CASE WHEN (x1 < x2 AND y1 < y2)
                            OR (x1 > x2 AND y1 > y2) THEN 1 ELSE 0 END)
                 AS BIGINT) AS conc,
            CAST(SUM(CASE WHEN (x1 < x2 AND y1 > y2)
                            OR (x1 > x2 AND y1 < y2) THEN 1 ELSE 0 END)
                 AS BIGINT) AS disc,
            CAST(SUM(CASE WHEN x1 = x2 AND y1 <> y2 THEN 1 ELSE 0 END)
                 AS BIGINT) AS ties_x,
            CAST(SUM(CASE WHEN y1 = y2 AND x1 <> x2 THEN 1 ELSE 0 END)
                 AS BIGINT) AS ties_y,
            CAST(SUM(CASE WHEN x1 = x2 AND y1 = y2 THEN 1 ELSE 0 END)
                 AS BIGINT) AS ties_both,
            CAST(COUNT(*) AS BIGINT) AS n0
          FROM p)
    SELECT n0 AS n_pairs, conc, disc, ties_x, ties_y, ties_both,
           CAST(conc - disc AS DOUBLE)
             / (SQRT(CAST(n0 - ties_x - ties_both AS DOUBLE))
                * SQRT(CAST(n0 - ties_y - ties_both AS DOUBLE))) AS tau_b
    FROM s
    """,
)
def kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(30,6)")).alias("spend"),
        )
    )
    a = d.alias("a")
    b = d.alias("b")
    x1, x2 = F.col("a.n_orders"), F.col("b.n_orders")
    y1, y2 = F.col("a.spend"), F.col("b.spend")
    p = a.join(b, F.col("a.d") < F.col("b.d"))
    one = F.lit(1)
    zero = F.lit(0)
    s = p.agg(
        F.sum(
            F.when(((x1 < x2) & (y1 < y2)) | ((x1 > x2) & (y1 > y2)), one)
            .otherwise(zero)
        ).cast("bigint").alias("conc"),
        F.sum(
            F.when(((x1 < x2) & (y1 > y2)) | ((x1 > x2) & (y1 < y2)), one)
            .otherwise(zero)
        ).cast("bigint").alias("disc"),
        F.sum(F.when((x1 == x2) & (y1 != y2), one).otherwise(zero))
        .cast("bigint").alias("ties_x"),
        F.sum(F.when((y1 == y2) & (x1 != x2), one).otherwise(zero))
        .cast("bigint").alias("ties_y"),
        F.sum(F.when((x1 == x2) & (y1 == y2), one).otherwise(zero))
        .cast("bigint").alias("ties_both"),
        F.count("*").cast("bigint").alias("n0"),
    )
    # standard tau-b subtracts ALL x-tied pairs from the x leg (n1
    # includes pairs tied on both axes) — ties_x above excludes the
    # both-tied pairs so they are counted once here and added back to
    # each leg (r11 ADVICE: |tau_b| was understated whenever two days
    # shared both n_orders and spend).
    return s.select(
        F.col("n0").alias("n_pairs"),
        "conc",
        "disc",
        "ties_x",
        "ties_y",
        "ties_both",
        (
            (F.col("conc") - F.col("disc")).cast("double")
            / (
                F.sqrt(
                    (F.col("n0") - F.col("ties_x") - F.col("ties_both"))
                    .cast("double")
                )
                * F.sqrt(
                    (F.col("n0") - F.col("ties_y") - F.col("ties_both"))
                    .cast("double")
                )
            )
        ).alias("tau_b"),
    )


# ---------------------------------------------------------------------------
# Cramér's V (r11 late batch): effect size for the priority × status
# association — the chi2_independence companion that answers "how
# strong", not just "is there". One hash aggregate builds the 15-cell
# contingency table; expected counts and per-cell chi² terms are
# doubles folded through the round-9 decimal accumulator (order-free),
# and V = sqrt(chi² / (n · min(r−1, c−1))) reuses the SAME rounded sum
# so both reported numbers come from one arithmetic path.
# ---------------------------------------------------------------------------
@register(
    "cramers_v",
    """
    WITH cell AS (SELECT o_orderpriority AS pri, o_orderstatus AS st,
                         CAST(COUNT(*) AS BIGINT) AS o
                  FROM orders GROUP BY 1, 2),
    tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
                   CAST(COUNT(DISTINCT pri) AS BIGINT) AS r,
                   CAST(COUNT(DISTINCT st) AS BIGINT) AS c
            FROM cell),
    m AS (SELECT pri, CAST(SUM(o) AS BIGINT) AS rt FROM cell GROUP BY pri),
    s AS (SELECT st, CAST(SUM(o) AS BIGINT) AS ct FROM cell GROUP BY st),
    chi AS (SELECT SUM(CAST(ROUND(
                POWER(COALESCE(cell.o, 0) - CAST(m.rt * s.ct AS DOUBLE) / tot.n, 2)
                  / (CAST(m.rt * s.ct AS DOUBLE) / tot.n), 9)
              AS DECIMAL(20,9))) AS chi2
            FROM m CROSS JOIN s
            LEFT JOIN cell ON cell.pri = m.pri AND cell.st = s.st
            CROSS JOIN tot)
    SELECT tot.n, tot.r AS n_rows_cat, tot.c AS n_cols_cat,
           CAST(chi.chi2 AS DOUBLE) AS chi2,
           SQRT(CAST(chi.chi2 AS DOUBLE)
                / (tot.n * LEAST(tot.r - 1, tot.c - 1))) AS cramers_v
    FROM chi CROSS JOIN tot
    """,
)
def cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    cell = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("pri"),
            F.col("o_orderstatus").alias("st"),
        )
        .agg(F.count("*").cast("bigint").alias("o"))
    )
    tot = cell.agg(
        F.sum("o").cast("bigint").alias("n"),
        F.count_distinct("pri").cast("bigint").alias("r"),
        F.count_distinct("st").cast("bigint").alias("c"),
    )
    m = cell.groupBy("pri").agg(F.sum("o").cast("bigint").alias("rt"))
    s = cell.groupBy("st").agg(F.sum("o").cast("bigint").alias("ct"))
    e = (F.col("rt") * F.col("ct")).cast("double") / F.col("n")
    # full r×c grid: an EMPTY contingency cell (O=0, E>0) contributes
    # E to chi² — joining only OBSERVED cells understates chi2/V at
    # any scale factor where a priority×status combo is absent (r11
    # ADVICE). m×s cross join IS the grid (row/col margins attached);
    # observed counts re-attach by left join, COALESCE(o, 0).
    grid = (
        m.crossJoin(F.broadcast(s))
        .join(F.broadcast(cell), ["pri", "st"], "left")
        .withColumn("o", F.coalesce(F.col("o"), F.lit(0).cast("bigint")))
    )
    chi = (
        grid
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.round(F.pow(F.col("o") - e, F.lit(2)) / e, 9).cast(
                    "decimal(20,9)"
                )
            ).alias("chi2")
        )
    )
    return chi.crossJoin(F.broadcast(tot)).select(
        "n",
        F.col("r").alias("n_rows_cat"),
        F.col("c").alias("n_cols_cat"),
        F.col("chi2").cast("double").alias("chi2"),
        F.sqrt(
            F.col("chi2").cast("double")
            / (F.col("n") * F.least(F.col("r") - 1, F.col("c") - 1))
        ).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# Per-column Shannon entropy (r11 late batch): the data-profiling
# primitive behind feature screening and drift baselines — H(col),
# normalized H/ln(k), and the modal share, for three categorical
# columns across two tables. Spark unpivots orders with one stack()
# scan (≡ the oracle's UNION ALL); each −Σ p·ln p folds through the
# round-9 decimal accumulator, which also absorbs the ≤1-ulp
# JVM-vs-libm log() spread. Outputs are rounded at 9 decimals so the
# normalized ratio is hash-stable cross-engine.
# ---------------------------------------------------------------------------
@register(
    "column_entropy",
    """
    WITH v AS (
      SELECT 'o_orderpriority' AS col, o_orderpriority AS val FROM orders
      UNION ALL
      SELECT 'o_orderstatus', o_orderstatus FROM orders
      UNION ALL
      SELECT 'c_mktsegment', c_mktsegment FROM customer),
    census AS (SELECT col, val, CAST(COUNT(*) AS BIGINT) AS cnt
               FROM v GROUP BY 1, 2),
    tot AS (SELECT col, CAST(SUM(cnt) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS k,
                   CAST(MAX(cnt) AS BIGINT) AS modal
            FROM census GROUP BY col),
    h AS (SELECT census.col,
                 SUM(CAST(ROUND(
                     (CAST(cnt AS DOUBLE) / n) * LN(CAST(cnt AS DOUBLE) / n),
                     9) AS DECIMAL(20,9))) AS negent
          FROM census JOIN tot USING (col) GROUP BY census.col)
    SELECT tot.col, tot.n, tot.k AS n_distinct,
           CAST(-h.negent AS DOUBLE) AS entropy_nats,
           ROUND(CAST(-h.negent AS DOUBLE) / LN(CAST(tot.k AS DOUBLE)), 9)
             AS norm_entropy,
           ROUND(CAST(tot.modal AS DOUBLE) / tot.n, 9) AS modal_share
    FROM h JOIN tot USING (col) ORDER BY tot.col
    """,
)
def column_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    v = orders.select(
        F.expr(
            "stack(2, 'o_orderpriority', o_orderpriority,"
            " 'o_orderstatus', o_orderstatus) AS (col, val)"
        )
    ).unionAll(
        cust.select(
            F.lit("c_mktsegment").alias("col"),
            F.col("c_mktsegment").alias("val"),
        )
    )
    census = v.groupBy("col", "val").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    tot = census.groupBy("col").agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("k"),
        F.max("cnt").cast("bigint").alias("modal"),
    )
    p = F.col("cnt").cast("double") / F.col("n")
    h = (
        census.join(F.broadcast(tot), "col")
        .groupBy("col")
        .agg(
            F.sum(F.round(p * F.log(p), 9).cast("decimal(20,9)")).alias(
                "negent"
            )
        )
    )
    return (
        h.join(F.broadcast(tot), "col")
        .select(
            "col",
            "n",
            F.col("k").alias("n_distinct"),
            (-F.col("negent")).cast("double").alias("entropy_nats"),
            F.round(
                (-F.col("negent")).cast("double")
                / F.log(F.col("k").cast("double")),
                9,
            ).alias("norm_entropy"),
            F.round(F.col("modal").cast("double") / F.col("n"), 9).alias(
                "modal_share"
            ),
        )
        .orderBy("col")
    )


# ---------------------------------------------------------------------------
# Mann-Kendall trend test (r11 late batch): the nonparametric
# monotone-trend test on the daily order-count series. S and the
# tie-corrected variance are EXACT integers (the pair census is the
# kendall_tau_daily self-join restricted to the time ordering; the
# tie term sums over the value census), so the only double is the
# final z = (S ∓ 1)/sqrt(Var) — bit-equal cross-engine because sqrt
# is IEEE-correctly-rounded. Quadratic stage bounded by the daily
# aggregate, never the fact table.
# ---------------------------------------------------------------------------
@register(
    "mann_kendall_trend",
    """
    WITH d AS (SELECT o_orderdate AS d,
                      CAST(COUNT(*) AS BIGINT) AS n_orders
               FROM orders GROUP BY 1),
    s AS (SELECT CAST(SUM(CASE WHEN b.n_orders > a.n_orders THEN 1
                               WHEN b.n_orders < a.n_orders THEN -1
                               ELSE 0 END) AS BIGINT) AS s_stat
          FROM d a JOIN d b ON a.d < b.d),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
    ties AS (SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0)
                         AS BIGINT) AS tie_term
             FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t
                   FROM d GROUP BY n_orders) g
             WHERE t > 1),
    v AS (SELECT n.n,
                 (n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie_term) AS var18
          FROM n CROSS JOIN ties)
    SELECT v.n AS n_days, s.s_stat,
           CASE WHEN v.var18 = 0 THEN NULL
                ELSE CAST(v.var18 AS DOUBLE) / 18 END AS var_s,
           CASE WHEN v.var18 = 0 THEN NULL
                ELSE (CASE WHEN s.s_stat > 0 THEN s.s_stat - 1
                           WHEN s.s_stat < 0 THEN s.s_stat + 1
                           ELSE 0 END)
                       / SQRT(CAST(v.var18 AS DOUBLE) / 18) END AS z
    FROM s CROSS JOIN v
    """,
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(F.count("*").cast("bigint").alias("n_orders"))
    )
    a, b = d.alias("a"), d.alias("b")
    s = (
        a.join(b, F.col("a.d") < F.col("b.d"))
        .agg(
            F.sum(
                F.when(F.col("b.n_orders") > F.col("a.n_orders"), 1)
                .when(F.col("b.n_orders") < F.col("a.n_orders"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s_stat")
        )
    )
    n = d.agg(F.count("*").cast("bigint").alias("n"))
    ties = (
        d.groupBy("n_orders")
        .agg(F.count("*").cast("bigint").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tie_term")
        )
    )
    v = n.crossJoin(F.broadcast(ties)).select(
        "n",
        (
            F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
            - F.col("tie_term")
        ).alias("var18"),
    )
    ss = F.col("s_stat")
    # degenerate guard (r11 ADVICE, mirrors runs_test_daily): if every
    # daily count ties, var18=0 and z is 0/sqrt(0) — Spark NULL vs
    # DuckDB NaN, a cross-engine parity break on a flat series. Both
    # engines return NULL explicitly instead.
    degenerate = F.col("var18") == 0
    return s.crossJoin(F.broadcast(v)).select(
        F.col("n").alias("n_days"),
        "s_stat",
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(F.col("var18").cast("double") / 18)
        .alias("var_s"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(
            F.when(ss > 0, ss - 1).when(ss < 0, ss + 1).otherwise(0)
            / F.sqrt(F.col("var18").cast("double") / 18)
        )
        .alias("z"),
    )


# ---------------------------------------------------------------------------
# Simpson diversity index (r11 late batch): corpus-balance audit per
# document source — probability two random docs share a language,
# complement (diversity), and inverse-Simpson effective class count.
# Entirely integer census arithmetic (Σ n_i(n_i−1) / N(N−1)) until
# the final ratios, so the doubles are bit-equal cross-engine; the
# inverse form divides the same two exact integers the other way.
# ---------------------------------------------------------------------------
@register(
    "simpson_diversity",
    """
    WITH census AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
                    FROM documents GROUP BY 1, 2),
    agg AS (SELECT source,
                   CAST(SUM(n) AS BIGINT) AS total,
                   CAST(COUNT(*) AS BIGINT) AS n_langs,
                   CAST(SUM(n * (n - 1)) AS BIGINT) AS same_pairs,
                   CAST(SUM(n * n) AS BIGINT) AS sq
            FROM census GROUP BY source)
    SELECT source, total, n_langs,
           CAST(same_pairs AS DOUBLE) / (total * (total - 1)) AS simpson_l,
           1 - CAST(same_pairs AS DOUBLE) / (total * (total - 1))
             AS diversity,
           CAST(total * total AS DOUBLE) / sq AS inv_simpson
    FROM agg ORDER BY source
    """,
)
def simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    census = (
        _t(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    agg = census.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("total"),
        F.count("*").cast("bigint").alias("n_langs"),
        F.sum(F.col("n") * (F.col("n") - 1)).cast("bigint").alias("same_pairs"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("sq"),
    )
    same_ratio = F.col("same_pairs").cast("double") / (
        F.col("total") * (F.col("total") - 1)
    )
    return agg.select(
        "source",
        "total",
        "n_langs",
        same_ratio.alias("simpson_l"),
        (F.lit(1) - same_ratio).alias("diversity"),
        (
            (F.col("total") * F.col("total")).cast("double") / F.col("sq")
        ).alias("inv_simpson"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test (r11 late batch): randomness check on the
# daily order-count series — above/below-median binarization (ties at
# the median excluded, the classical convention), run count via a
# lag-window, and the exact-integer moments E[R] = 1 + 2·n1·n2/n,
# Var[R] = 2·n1·n2·(2·n1·n2 − n)/(n²·(n−1)). The median of a BIGINT
# relation interpolates at worst to an exact .5 (both engines), the
# run census is exact integers, and the final z divides two doubles
# derived from them — bit-equal cross-engine. The ordered lag window
# runs on the bounded daily aggregate (seasonal_decomposition
# precedent), never the fact table.
# ---------------------------------------------------------------------------
@register(
    "runs_test_daily",
    """
    WITH d AS (SELECT o_orderdate AS d,
                      CAST(COUNT(*) AS BIGINT) AS n_orders
               FROM orders GROUP BY 1),
    med AS (SELECT MEDIAN(n_orders) AS m FROM d),
    b AS (SELECT d.d, CASE WHEN d.n_orders > med.m THEN 1 ELSE 0 END AS hi
          FROM d CROSS JOIN med
          WHERE d.n_orders <> med.m),
    r AS (SELECT hi, CASE WHEN LAG(hi) OVER (ORDER BY d) IS NULL
                            OR LAG(hi) OVER (ORDER BY d) <> hi
                          THEN 1 ELSE 0 END AS new_run
          FROM b),
    s AS (SELECT CAST(SUM(new_run) AS BIGINT) AS runs,
                 CAST(SUM(hi) AS BIGINT) AS n1,
                 CAST(SUM(1 - hi) AS BIGINT) AS n2,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM r)
    SELECT n, n1, n2, runs,
           CASE WHEN n1 = 0 OR n2 = 0 OR n < 2 THEN NULL
                ELSE 1 + CAST(2 * n1 * n2 AS DOUBLE) / n END
             AS expected_runs,
           CASE WHEN n1 = 0 OR n2 = 0 OR n < 2 THEN NULL
                ELSE (runs - (1 + CAST(2 * n1 * n2 AS DOUBLE) / n))
                  / SQRT(CAST(2 * n1 * n2 * (2 * n1 * n2 - n) AS DOUBLE)
                         / (CAST(n AS DOUBLE) * n * (n - 1))) END AS z
    FROM s
    """,
)
def runs_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(F.count("*").cast("bigint").alias("n_orders"))
    )
    med = d.agg(F.median("n_orders").alias("m"))
    b = (
        d.crossJoin(F.broadcast(med))
        .filter(F.col("n_orders") != F.col("m"))
        .select(
            "d",
            F.when(F.col("n_orders") > F.col("m"), 1).otherwise(0).alias("hi"),
        )
    )
    lag = F.lag("hi").over(W.orderBy("d"))
    r = b.select(
        "hi",
        F.when(lag.isNull() | (lag != F.col("hi")), 1).otherwise(0).alias(
            "new_run"
        ),
    )
    s = r.agg(
        F.sum("new_run").cast("bigint").alias("runs"),
        F.sum("hi").cast("bigint").alias("n1"),
        F.sum(1 - F.col("hi")).cast("bigint").alias("n2"),
        F.count("*").cast("bigint").alias("n"),
    )
    n, n1, n2, runs = F.col("n"), F.col("n1"), F.col("n2"), F.col("runs")
    # The test is undefined on a degenerate split (all values on one
    # side of the median, or <2 usable points): NULL, not an ANSI
    # divide-by-zero — sf0.001's one-order-per-day series hits this.
    degenerate = (n1 == 0) | (n2 == 0) | (n < 2)
    expected = 1 + (2 * n1 * n2).cast("double") / n
    return s.select(
        "n",
        "n1",
        "n2",
        "runs",
        F.when(degenerate, F.lit(None)).otherwise(expected).alias(
            "expected_runs"
        ),
        F.when(degenerate, F.lit(None))
        .otherwise(
            (runs - expected)
            / F.sqrt(
                (2 * n1 * n2 * (2 * n1 * n2 - n)).cast("double")
                / (n.cast("double") * n * (n - 1))
            )
        )
        .alias("z"),
    )


# ===========================================================================
# Round-12 additions.
# ===========================================================================


# ---------------------------------------------------------------------------
# Exact equi-depth octiles over a STRING metric at distinct == rows
# (r12): the direct gate for the common-prefix-stripped byte surrogate
# that closed VERDICT r11 "What's missing" #1. Every c_name shares the
# long "Customer#" prefix, so a fixed-position surrogate would
# collapse to one range (= the old unpartitioned single-range
# fallback); the surrogate seeds from the 6 bytes AFTER the corpus
# common prefix, keeping the boundary window range-partitioned
# (plan-asserted in tests/test_quantiles.py). The oracle is plain
# NTILE over (c_name, c_custkey) — bit-equality, not approximation;
# string MIN/MAX agree cross-engine because both sides compare
# bytewise.
# ---------------------------------------------------------------------------
@register(
    "equidepth_string",
    """
    WITH t AS (SELECT c_name, c_custkey,
                      NTILE(8) OVER (ORDER BY c_name, c_custkey) AS tile
               FROM customer)
    SELECT CAST(tile AS INT) AS tile,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(c_name) AS first_name,
           MAX(c_name) AS last_name,
           CAST(SUM(c_custkey) AS BIGINT) AS key_sum
    FROM t GROUP BY tile ORDER BY tile
    """,
)
def equidepth_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ome_arrow_spark.operators.quantiles import equidepth_bucket

    c = _t(spark, sf_dir, "customer").select("c_name", "c_custkey")
    d = equidepth_bucket(c, "c_name", "c_custkey", 8, out="tile")
    return (
        d.groupBy(F.col("tile").cast("int").alias("tile"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.min("c_name").alias("first_name"),
            F.max("c_name").alias("last_name"),
            F.sum("c_custkey").cast("bigint").alias("key_sum"),
        )
        .orderBy("tile")
    )
