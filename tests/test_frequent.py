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
