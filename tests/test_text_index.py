"""Persistent BM25 inverted index (operators/text_index.py): build →
pruned search → incremental maintenance, with an independent
pure-Python BM25 model as the scoring oracle."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from ome_arrow_spark.operators import text_index as TI
from ome_arrow_spark.sources import table_log as tl

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "a quick model trains on clean data"),
    (2, "data data data model model quality"),
    (3, "the lazy pipeline shuffles data across the cluster"),
    (4, "brown bears eat fish not data"),
    (5, "completely unrelated text about gardening tulips"),
    (6, "model quality depends on data quality and scale"),
]


def _model_bm25(query_terms, k1=1.2, b=0.75):
    """Independent BM25: plain dict arithmetic, ordered-term float sum."""
    toks = {d: re.findall(r"[a-z0-9]+", t.lower()) for d, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(v) for v in toks.values()) / n
    scores = {}
    nterms = {}
    for d, tk in toks.items():
        total = 0.0
        hit = 0
        for q in sorted(set(query_terms)):
            tf = tk.count(q)
            if tf == 0:
                continue
            df = sum(1 for v in toks.values() if q in v)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            total += idf * (tf * (k1 + 1)) / (
                tf + k1 * (1 - b + b * len(tk) / avgdl)
            )
            hit += 1
        if hit:
            scores[d] = round(total, 6)
            nterms[d] = hit
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked, nterms


@pytest.fixture()
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.fixture()
def index(spark, tmp_path, docs_df):
    t = str(tmp_path / "tix")
    TI.build_text_index(spark, docs_df, t, n_files=4)
    return t


def test_search_matches_independent_model(spark, index):
    got = TI.text_index_search(spark, index, "data model", k=10).collect()
    want, nterms = _model_bm25(["data", "model"])
    assert [(r["doc_id"], r["score"]) for r in got] == want
    assert [r["rk"] for r in got] == list(range(1, len(want) + 1))
    assert {r["doc_id"]: r["n_terms"] for r in got} == nterms


def test_query_string_tokenized_and_case_folded(spark, index):
    a = TI.text_index_search(spark, index, "Data, MODEL!", k=10).collect()
    b = TI.text_index_search(spark, index, ["data", "model"], k=10).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_search_scans_only_pruned_files(spark, index):
    live, total = TI.text_index_file_stats(index, ["data"])
    assert 0 < live < total
    post = TI._pruned_postings(spark, index, ["data"])
    read = {f.split("/")[-1] for f in post.inputFiles()}
    snap = tl._resolve_snapshot(index)
    pruned = set(tl._prune(snap["files"], [("term", "=", "data")]))
    assert read <= pruned and len(read) == live


def test_unknown_term_and_empty_query(spark, index):
    res = TI.text_index_search(spark, index, "zzznope", k=5)
    assert res.count() == 0
    assert [f.name for f in res.schema.fields] == [
        "doc_id", "score", "rk", "n_terms",
    ]
    assert TI.text_index_search(spark, index, [], k=5).count() == 0


@pytest.mark.heavy
def test_incremental_add_equals_full_rebuild(spark, tmp_path, docs_df):
    part1 = docs_df.filter(F.col("doc_id") < 4)
    part2 = docs_df.filter(F.col("doc_id") >= 4)
    t_inc = str(tmp_path / "inc")
    TI.build_text_index(spark, part1, t_inc, n_files=4)
    TI.add_to_text_index(spark, part2, t_inc)
    t_full = str(tmp_path / "full")
    TI.build_text_index(spark, docs_df, t_full, n_files=4)
    for q in ("data model", "the lazy", "gardening"):
        a = TI.text_index_search(spark, t_inc, q, k=10).collect()
        b = TI.text_index_search(spark, t_full, q, k=10).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b], q
    pa = tl.table_properties(t_inc)
    pb = tl.table_properties(t_full)
    assert pa[TI.N_DOCS_PROP] == pb[TI.N_DOCS_PROP]
    assert pa[TI.SUM_DL_PROP] == pb[TI.SUM_DL_PROP]


def test_delete_doc_then_scores_shift(spark, tmp_path, docs_df, index):
    dl2 = 6  # "data data data model model quality"
    TI.delete_doc_from_text_index(spark, index, 2, dl=dl2)
    got = TI.text_index_search(spark, index, "data model", k=10).collect()
    assert 2 not in {r["doc_id"] for r in got}
    props = tl.table_properties(index)
    assert props[TI.N_DOCS_PROP] == str(len(DOCS) - 1)
    # equals a fresh index built without doc 2
    t2 = str(tmp_path / "wo2")
    TI.build_text_index(
        spark, docs_df.filter(F.col("doc_id") != 2), t2, n_files=4
    )
    want = TI.text_index_search(spark, t2, "data model", k=10).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_set_table_properties_merges(spark, tmp_path, docs_df):
    t = str(tmp_path / "p")
    TI.build_text_index(spark, docs_df, t)
    v0 = tl.current_version(t)
    tl.set_table_properties(t, {"owner": "curation", TI.N_DOCS_PROP: "7"})
    props = tl.table_properties(t)
    assert props["owner"] == "curation"
    assert tl.current_version(t) == v0 + 1
    # data untouched
    assert tl.read_table(spark, t).count() > 0


def test_search_many_matches_single_query_search(spark, index):
    qdf = spark.createDataFrame(
        [(100, "data model"), (200, "the lazy"), (300, "zzznope")],
        "query_id long, query string",
    )
    batch = TI.text_index_search_many(spark, index, qdf, k=10).collect()
    by_qid = {}
    for r in batch:
        by_qid.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["score"], r["rk"], r["n_terms"])
        )
    for qid, q in ((100, "data model"), (200, "the lazy")):
        single = [
            (r["doc_id"], r["score"], r["rk"], r["n_terms"])
            for r in TI.text_index_search(spark, index, q, k=10).collect()
        ]
        assert sorted(by_qid[qid]) == sorted(single), qid
    assert 300 not in by_qid  # no-hit query yields no rows


def test_search_many_prunes_to_term_union(spark, index):
    qdf = spark.createDataFrame(
        [("a", "data"), ("b", "model")], "query_id string, query string"
    )
    res = TI.text_index_search_many(
        spark, index, qdf, k=5, query_id="query_id", text="query"
    )
    live, total = TI.text_index_file_stats(index, ["data", "model"])
    read = {f.split("/")[-1] for f in res.inputFiles()}
    assert len(read) <= live < total
    assert {r["query_id"] for r in res.collect()} == {"a", "b"}


@pytest.mark.heavy
def test_optimize_restores_clustering_after_adds(spark, tmp_path):
    """Incremental MERGEs fragment term locality; optimize (recluster)
    restores a bounded file count AND the pruning tightness, with
    search results bit-identical before/after."""
    rows = [(i, f"term{i % 11} shared common word{i % 7}") for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    t = str(tmp_path / "frag")
    TI.build_text_index(spark, docs.filter(F.col("doc_id") < 20), t, n_files=4)
    for lo in (20, 30, 40, 50):
        TI.add_to_text_index(
            spark,
            docs.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 10)
            ),
            t,
        )
    before = TI.text_index_search(spark, t, "shared term3", k=10).collect()
    _, total_before = TI.text_index_file_stats(t)
    TI.optimize_text_index(spark, t, n_files=4)
    after = TI.text_index_search(spark, t, "shared term3", k=10).collect()
    assert [tuple(r) for r in before] == [tuple(r) for r in after]
    live, total = TI.text_index_file_stats(t, ["term3"])
    assert total == 4 and live < total
    # postings content identical across the recluster commit
    a = tl.read_table(spark, t).orderBy("pk").collect()
    b = tl.read_table(
        spark, t, version=tl.current_version(t) - 1
    ).orderBy("pk").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


class TestPhraseSearch:
    PDOCS = [
        (0, "the quick brown fox the quick brown cat"),
        (1, "quick brown is a color the quick red"),
        (2, "brown quick inverted order here"),
        (3, "the the the quick quick brown brown"),
    ]

    @pytest.fixture()
    def pos_index(self, spark, tmp_path):
        docs = spark.createDataFrame(self.PDOCS, "doc_id long, text string")
        t = str(tmp_path / "pos")
        TI.build_text_index(spark, docs, t, n_files=2, positions=True)
        return t

    def _brute(self, phrase):
        import re

        toks = phrase.split()
        n = len(toks)
        out = {}
        for d, txt in self.PDOCS:
            tk = re.findall(r"[a-z0-9]+", txt.lower())
            c = sum(1 for i in range(len(tk) - n + 1) if tk[i : i + n] == toks)
            if c:
                out[d] = c
        return out

    @pytest.mark.parametrize(
        "phrase", ["quick brown", "the quick brown", "the the", "brown cat"]
    )
    def test_matches_brute_force(self, spark, pos_index, phrase):
        got = {
            r["doc_id"]: r["phrase_count"]
            for r in TI.phrase_search(spark, pos_index, phrase).collect()
        }
        assert got == self._brute(phrase)

    def test_absent_phrase_and_empty(self, spark, pos_index):
        assert TI.phrase_search(spark, pos_index, "purple zebra").count() == 0
        assert TI.phrase_search(spark, pos_index, "").count() == 0

    def test_non_positional_index_rejected(self, spark, tmp_path):
        docs = spark.createDataFrame(self.PDOCS, "doc_id long, text string")
        t = str(tmp_path / "flat")
        TI.build_text_index(spark, docs, t, n_files=2)
        with pytest.raises(ValueError, match="positional"):
            TI.phrase_search(spark, t, "quick brown")

    def test_incremental_add_carries_positions(self, spark, pos_index):
        TI.add_to_text_index(
            spark,
            spark.createDataFrame(
                [(9, "quick brown quick brown")], "doc_id long, text string"
            ),
            pos_index,
        )
        got = {
            r["doc_id"]: r["phrase_count"]
            for r in TI.phrase_search(spark, pos_index, "quick brown").collect()
        }
        assert got[9] == 2


@pytest.mark.heavy
def test_update_docs_replace_semantics(spark, tmp_path, docs_df):
    """A re-ingested doc that LOST a term must stop matching it —
    update_docs_in_text_index equals a fresh rebuild with the new
    text, scalars included."""
    t = str(tmp_path / "upd")
    TI.build_text_index(spark, docs_df, t, n_files=4)
    changed = spark.createDataFrame(
        [(2, "completely different words now")],  # was data/model/quality
        "doc_id long, text string",
    )
    TI.update_docs_in_text_index(spark, changed, t)
    got = TI.text_index_search(spark, t, "data model", k=10).collect()
    assert 2 not in {r["doc_id"] for r in got}
    assert TI.text_index_search(spark, t, "different words", k=5).collect()[0][
        "doc_id"
    ] == 2
    # equals the rebuilt index
    rebuilt_docs = docs_df.filter(F.col("doc_id") != 2).unionByName(changed)
    t2 = str(tmp_path / "fresh")
    TI.build_text_index(spark, rebuilt_docs, t2, n_files=4)
    for q in ("data model", "different words", "the lazy"):
        a = [tuple(r) for r in TI.text_index_search(spark, t, q, k=10).collect()]
        b = [tuple(r) for r in TI.text_index_search(spark, t2, q, k=10).collect()]
        assert a == b, q
    pa_, pb = tl.table_properties(t), tl.table_properties(t2)
    assert pa_[TI.N_DOCS_PROP] == pb[TI.N_DOCS_PROP]
    assert pa_[TI.SUM_DL_PROP] == pb[TI.SUM_DL_PROP]
