"""ANN recall thresholds vs a numpy brute-force oracle (VERDICT r7
"Next round" #6): every approximate index type must clear a recall@10
floor at a 20k-vector regime — large enough that bucket/list pruning is
real, small enough for CI.  The 100k-vector tracked numbers live in
bench.py's ``bench_ann``."""

from __future__ import annotations

import pytest

from bench import _recall_at10, make_ann_fixture

N_VECTORS = 20_000


@pytest.fixture(scope="module")
def fixture(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ann_recall"))
    corpus_path, q_rows, truth = make_ann_fixture(d, n_vectors=N_VECTORS)
    corpus = spark.read.parquet(corpus_path)
    queries = spark.createDataFrame(q_rows, "qid long, embedding array<float>")
    return d, corpus, queries, truth


@pytest.mark.heavy
def test_brute_force_recall_is_one(spark, fixture):
    from ome_arrow_spark.operators import similarity as SIM

    _, corpus, queries, truth = fixture
    rows = SIM.cosine_topk(queries, corpus, k=10).collect()
    assert _recall_at10(rows, truth) == 1.0


@pytest.mark.heavy
def test_lsh_recall_floor(spark, fixture):
    from ome_arrow_spark.operators import similarity as SIM

    _, corpus, queries, truth = fixture
    rows = SIM.cosine_topk_lsh(
        queries, corpus, k=10, n_planes=8, n_tables=16
    ).collect()
    assert _recall_at10(rows, truth) >= 0.80


@pytest.mark.heavy
def test_ivf_index_recall_floor(spark, fixture):
    from ome_arrow_spark.operators import ann_index as AI

    d, corpus, queries, truth = fixture
    t = f"{d}/ivf"
    AI.build_ivf_index(spark, corpus, t, n_centroids=32)
    rows = AI.ivf_index_search(spark, t, queries, k=10, n_probe=8).collect()
    assert _recall_at10(rows, truth) >= 0.90


@pytest.mark.heavy
def test_pq_rerank_recall_floor(spark, fixture):
    """candidates=5% of corpus: PQ recall is governed by re-rank depth
    relative to quantization distortion, not training quality — a
    perfectly-trained numpy PQ at m=8/k=16 scores 0.375@cand=200 on
    this clustered fixture (in-cluster neighbors are inside one code
    cell) and 1.000@cand=1000.  The depth is the user's recall knob;
    the floor pins that the ENGINE's codebooks are no worse than
    ideal training at the same depth."""
    from ome_arrow_spark.operators import pq_index as PQ

    d, corpus, queries, truth = fixture
    t = f"{d}/pq"
    PQ.build_pq_index(spark, corpus, t, m=8, k=16)
    rows = PQ.pq_rerank_search(
        spark, t, queries, corpus, topk=10, candidates=1000
    ).collect()
    assert _recall_at10(rows, truth) >= 0.90


@pytest.mark.heavy
def test_ivfpq_recall_floor(spark, fixture):
    from ome_arrow_spark.operators import pq_index as PQ

    d, corpus, queries, truth = fixture
    t = f"{d}/ivfpq"
    PQ.build_ivfpq_index(spark, corpus, t, n_centroids=32, m=8, k=16)
    rows = PQ.ivfpq_rerank_search(
        spark, t, queries, corpus, topk=10, candidates=1000, n_probe=8
    ).collect()
    assert _recall_at10(rows, truth) >= 0.85
