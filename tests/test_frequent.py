"""Heavy hitters (operators/frequent.py): Misra-Gries candidates +
exact recount must equal the brute-force explode→groupBy top-k."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ome_arrow_spark.functions import text as TX
from ome_arrow_spark.operators.frequent import heavy_hitters


def _brute_topk(docs, k, ngram=1):
    toks = docs.select(F.explode(TX.tokens(F.col("text"))).alias("t"))
    if ngram == 2:
        toks = docs.select(
            F.explode(TX.bigrams(TX.tokens(F.col("text")))).alias("t")
        )
    return [
        (r["t"], r["cnt"])
        for r in toks.groupBy("t")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("t"))
        .limit(k)
        .collect()
    ]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.01/documents.parquet"
    ).select("doc_id", "text")


@pytest.mark.heavy
def test_matches_brute_force_unigram(spark, docs):
    got = heavy_hitters(docs, k=25, m=4096).collect()
    want = _brute_topk(docs, 25)
    assert [(r["term"], r["cnt"]) for r in got] == want
    assert [r["rk"] for r in got] == list(range(1, 26))


def test_matches_brute_force_bigram(spark, docs):
    got = heavy_hitters(docs, k=10, m=8192, ngram=2).collect()
    want = _brute_topk(docs, 10, ngram=2)
    assert [(r["term"], r["cnt"]) for r in got] == want


def test_small_capacity_still_finds_dominant_terms(spark):
    """With m far below the distinct count, terms above total/m are
    still guaranteed: a dominant term must surface."""
    rows = [(i, "needle " * 50 + f"hay{i} straw{i}") for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = heavy_hitters(docs, k=1, m=16).collect()
    assert got[0]["term"] == "needle"
    assert got[0]["cnt"] == 200 * 50


def test_empty_and_null_docs(spark):
    docs = spark.createDataFrame(
        [(0, None), (1, ""), (2, "one one two")],
        "doc_id long, text string",
    )
    got = heavy_hitters(docs, k=5, m=64).collect()
    assert [(r["term"], r["cnt"]) for r in got] == [("one", 2), ("two", 1)]


# --------------------------------------------------------------------------
# KMV bottom-k sketch (suite_llm.kmv_sketch_quantiles): the sketch
# invariants that make the driver row trustworthy, checked against a
# pure-Python model on synthetic data with a known distinct count.
# --------------------------------------------------------------------------
def _py_kmv(values, k=64):
    import hashlib

    hv = sorted(
        {(hashlib.md5(v.encode()).hexdigest(), v) for v in values}
    )
    return hv[:k]


def test_kmv_merge_of_partials_equals_direct_sketch():
    # Truncated partial sketches union to the same bottom-k as one
    # direct pass — the property the two-level Spark plan relies on.
    vals = [f"{i * 37 % 991}.00" for i in range(500)]
    parts = [vals[0:200], vals[200:350], vals[350:500]]
    merged = sorted(
        {hv for p in parts for hv in _py_kmv(p, 64)}
    )[:64]
    assert merged == _py_kmv(vals, 64)


def test_kmv_estimate_within_25pct_at_k64():
    import hashlib

    vals = [f"{i}.00" for i in range(5000)]  # 5000 distinct
    sk = _py_kmv(vals, 64)
    h_k = int(sk[-1][0][:13], 16) / float(1 << 52)
    est = 63 / h_k
    assert abs(est - 5000) / 5000 < 0.25


def test_kmv_exact_below_k():
    vals = [f"{i}.00" for i in range(40)] * 3  # 40 distinct, k=64
    sk = _py_kmv(vals, 64)
    assert len(sk) == 40  # sketch IS the distinct set -> exact count


def test_kmv_set_ops_accuracy():
    """Intersection/Jaccard estimation from bottom-k sketches (Beyer
    et al. 2007) against known ground truth on synthetic sets with a
    controlled overlap."""
    import hashlib

    K = 256
    A = {f"a{i}" for i in range(3000)} | {f"c{i}" for i in range(1000)}
    B = {f"b{i}" for i in range(3000)} | {f"c{i}" for i in range(1000)}
    true_union = len(A | B)          # 7000
    true_inter = len(A & B)          # 1000
    true_jac = true_inter / true_union

    def sketch(s):
        return sorted(hashlib.md5(v.encode()).hexdigest() for v in s)[:K]

    ska, skb = set(sketch(A)), set(sketch(B))
    u = sorted(ska | skb)[:K]
    rho = sum(1 for h in u if h in ska and h in skb)
    h_k = int(u[-1][:13], 16) / float(1 << 52)
    est_union = (K - 1) / h_k
    est_jac = rho / K
    est_inter = est_jac * est_union
    assert abs(est_union - true_union) / true_union < 0.15
    assert abs(est_jac - true_jac) < 0.08
    assert abs(est_inter - true_inter) / true_inter < 0.6  # k-limited
