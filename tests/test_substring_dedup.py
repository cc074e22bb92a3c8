"""Span-level exact substring dedup (operators/dedup.py dup_spans /
strip_dup_spans): hand-computed fixtures for span detection, merging,
and first-occurrence retention, plus a seeded random-corpus check
against a pure-Python model.
"""

from __future__ import annotations

import random

from ome_arrow_spark.operators.dedup import dup_spans, strip_dup_spans

K = 4  # small gram size keeps fixtures readable


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _toks(t):
    import re

    return re.findall(r"[a-z0-9]+", t.lower())


def _py_spans(texts, k=K, min_count=2):
    """Pure-Python model: duplicated k-gram positions merged to maximal
    per-doc spans (1-based inclusive token positions)."""
    from collections import Counter

    grams = Counter()
    per_doc = []
    for t in texts:
        toks = _toks(t)
        gs = [tuple(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        per_doc.append(gs)
        grams.update(gs)
    out = []
    for d, gs in enumerate(per_doc):
        positions = [
            i + 1 for i, g in enumerate(gs) if grams[g] >= min_count
        ]
        spans = []
        for p in positions:
            if spans and p <= spans[-1][1] + 1:
                spans[-1][1] = max(spans[-1][1], p + k - 1)
                spans[-1][2] += 1
            else:
                spans.append([p, p + k - 1, 1])
        out += [(d, s, e, e - s + 1, n) for s, e, n in spans]
    return sorted(out)


def _py_strip(texts, k=K, min_count=2):
    """Model for strip_dup_spans: global-first occurrence per gram kept,
    other occurrences' token intervals removed (merged per doc)."""
    from collections import defaultdict

    occ = defaultdict(list)
    toks_by_doc = []
    for d, t in enumerate(texts):
        toks = _toks(t)
        toks_by_doc.append(toks)
        for i in range(len(toks) - k + 1):
            occ[tuple(toks[i : i + k])].append((d, i + 1))
    removals = defaultdict(set)
    for g, sites in occ.items():
        if len(sites) < min_count:
            continue
        for d, p in sorted(sites)[1:]:
            removals[d].update(range(p, p + k))
    out = []
    for d, toks in enumerate(toks_by_doc):
        kept = [t for i, t in enumerate(toks, start=1) if i not in removals[d]]
        out.append((d, " ".join(kept), len(toks), len(toks) - len(kept)))
    return out


def test_dup_spans_hand_fixture(spark):
    # doc0 and doc1 share tokens "one two three four" (one 4-gram);
    # doc2 repeats "a b c d e" internally giving overlapping dup grams
    # that must merge into one maximal span per occurrence region.
    texts = [
        "x one two three four y",
        "p q one two three four",
        "a b c d e z a b c d e",
    ]
    got = sorted(
        tuple(r)
        for r in dup_spans(_df(spark, texts), k=K).collect()
    )
    assert got == [
        # doc0: span covers positions 2-5
        (0, 2, 5, 4, 1),
        # doc1: positions 3-6
        (1, 3, 6, 4, 1),
        # doc2: "a b c d" and "b c d e" both duplicated -> merged 1-5, 7-11
        (2, 1, 5, 5, 2),
        (2, 7, 11, 5, 2),
    ]
    assert got == _py_spans(texts)


def test_strip_keeps_globally_first_occurrence(spark):
    texts = [
        "x one two three four y",   # first occurrence (doc0 < doc1): kept
        "p q one two three four",   # stripped
        "fully unique text with no repeats at all",
    ]
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in strip_dup_spans(_df(spark, texts), k=K).collect()
    }
    assert got[0] == ("x one two three four y", 6, 0)
    assert got[1] == ("p q", 6, 4)
    assert got[2][2] == 0 and got[2][0] == texts[2]


def test_strip_intra_document_repeat(spark):
    # The same doc repeats a phrase: second occurrence removed.
    texts = ["a b c d junk a b c d"]
    got = strip_dup_spans(_df(spark, texts), k=K).collect()[0]
    assert got["clean_text"] == "a b c d junk"
    assert got["n_removed"] == 4


def test_short_docs_pass_through(spark):
    texts = ["one two", "", "one two"]  # shorter than k: no grams
    rows = strip_dup_spans(_df(spark, texts), k=K).collect()
    assert len(rows) == 3
    assert all(r["n_removed"] == 0 for r in rows)
    assert dup_spans(_df(spark, texts), k=K).count() == 0


def test_random_corpus_matches_python_model(spark):
    rng = random.Random(20260815)
    vocab = [f"w{i}" for i in range(12)]  # small vocab -> many collisions
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30)))
        for _ in range(40)
    ]
    df = _df(spark, texts)
    got_spans = sorted(tuple(r) for r in dup_spans(df, k=K).collect())
    assert got_spans == _py_spans(texts)
    got_strip = sorted(tuple(r) for r in strip_dup_spans(df, k=K).collect())
    assert got_strip == sorted(_py_strip(texts))


def test_trigram_perplexity_matches_python_model(spark):
    """suite_llm.lm_trigram_perplexity against an independent pure-
    Python JM-interpolated trigram model on a tiny synthetic corpus
    written as a parquet sf_dir (only `documents` is touched)."""
    import math
    import os
    import tempfile
    from collections import Counter

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ome_arrow_spark.suite_llm import lm_trigram_perplexity

    texts = {
        0: "the cat sat on the mat",          # held out (doc 0)
        1: "the cat sat on the hat",
        2: "the dog sat on the mat",
        3: "a cat and a dog sat",
        10: "the dog sat on the unknownword", # held out
        11: "cats everywhere",
    }
    d = tempfile.mkdtemp(prefix="lm3_")
    pq.write_table(
        pa.table(
            {
                "doc_id": list(texts),
                "text": list(texts.values()),
                "lang": ["en"] * len(texts),
                "source": ["t"] * len(texts),
                "n_chars": [len(t) for t in texts.values()],
            }
        ),
        os.path.join(d, "documents.parquet"),
    )

    toks = {k: v.lower().split() for k, v in texts.items()}
    train = [toks[k] for k in texts if k % 10 != 0]
    c3 = Counter(tuple(t[i : i + 3]) for t in train for i in range(len(t) - 2))
    c2 = Counter(tuple(t[i : i + 2]) for t in train for i in range(len(t) - 1))
    c1 = Counter(w for t in train for w in t)
    n_tok = sum(len(t) for t in train)
    v = len(c1)

    def score(t):
        nlls = []
        for i in range(len(t) - 2):
            w1, w2, w3 = t[i : i + 3]
            p3 = c3[(w1, w2, w3)] / c2[(w1, w2)] if c2[(w1, w2)] else 0.0
            p2 = c2[(w2, w3)] / c1[w2] if c1[w2] else 0.0
            p1 = c1[w3] / n_tok
            p = 0.6 * p3 + 0.29 * p2 + 0.1 * p1 + 0.01 * (1.0 / v)
            nlls.append(round(-math.log(p), 9))
        s = round(sum(nlls), 9)  # decimal-sum is exact; float sum of
        # round-9 terms at this size is too
        avg = round(s / len(nlls), 6)
        return len(nlls), avg, round(math.exp(avg), 4)

    got = {
        r["doc_id"]: (r["n_trigrams"], r["avg_nll"], r["ppl"])
        for r in lm_trigram_perplexity(spark, d).collect()
    }
    assert set(got) == {0, 10}
    for k in (0, 10):
        n, avg, ppl = score(toks[k])
        assert got[k][0] == n
        assert abs(got[k][1] - avg) < 1e-9
        assert abs(got[k][2] - ppl) < 1e-6


def test_fuzzy_join_blocking_is_complete(spark):
    """Deletion-neighborhood blocking finds EVERY edit-distance<=1 pair
    the brute-force cross join finds (suite_llm.fuzzy_join_editdist's
    scale claim), including substitutions, insertions, and deletions."""
    from pyspark.sql import functions as F

    from ome_arrow_spark.suite_llm import fuzzy_join_editdist

    # Build a corpus whose vocab contains known typo families. Each
    # token needs df >= 5 to enter the vocab.
    words = [
        "hello", "hallo", "helo", "helloo",      # sub / del / ins of hello
        "world", "wordl",                          # transposition: dist 2, excluded
        "spark", "spork", "sprk",
        "unrelated",
    ]
    text = " ".join(w for w in words for _ in range(5))
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp(prefix="fuzzy_")
    pq.write_table(
        pa.table(
            {
                "doc_id": [0],
                "text": [text],
                "lang": ["en"],
                "source": ["t"],
                "n_chars": [len(text)],
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    got = {
        (r["tok_a"], r["tok_b"])
        for r in fuzzy_join_editdist(spark, d).collect()
    }
    # brute force over the same vocab (df>=5, len 4..12, + planted
    # df>=20 typos — none here since every df is 5)
    import itertools

    def ed(a, b):
        import numpy as np

        m = np.zeros((len(a) + 1, len(b) + 1), int)
        m[:, 0] = range(len(a) + 1)
        m[0, :] = range(len(b) + 1)
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                m[i, j] = min(
                    m[i - 1, j] + 1,
                    m[i, j - 1] + 1,
                    m[i - 1, j - 1] + (a[i - 1] != b[j - 1]),
                )
        return m[len(a), len(b)]

    vocab = [w for w in set(words) if 4 <= len(w) <= 12]
    brute = {
        (a, b)
        for a, b in itertools.combinations(sorted(vocab), 2)
        if ed(a, b) <= 1
    }
    assert got == brute
    assert ("hallo", "hello") in got and ("hello", "helloo") in got
    assert ("spark", "spork") in got and ("spark", "sprk") in got
    assert ("wordl", "world") not in got  # transposition = distance 2


def test_doc_chunking_edges_and_plan(spark):
    """suite_llm.doc_chunking: coverage/containment invariants on edge
    lengths, and the plan is projection-only (zero exchanges)."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ome_arrow_spark.suite_llm import doc_chunking

    texts = {
        0: "only",                          # 1 token  -> 1 chunk
        1: " ".join(f"w{i}" for i in range(64)),   # exactly size
        2: " ".join(f"w{i}" for i in range(65)),   # one past size
        3: " ".join(f"w{i}" for i in range(113)),  # 3 chunks
        4: "",                              # no tokens -> no chunks
    }
    d = tempfile.mkdtemp(prefix="chunk_")
    pq.write_table(
        pa.table(
            {
                "doc_id": list(texts),
                "text": list(texts.values()),
                "lang": ["en"] * len(texts),
                "source": ["t"] * len(texts),
                "n_chars": [len(t) for t in texts.values()],
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    df = doc_chunking(spark, d)
    rows = {
        (r["doc_id"], r["chunk_id"]): r for r in df.collect()
    }
    counts = {}
    for (doc, _), r in rows.items():
        counts[doc] = counts.get(doc, 0) + 1
    assert counts == {0: 1, 1: 1, 2: 2, 3: 3}
    assert rows[(0, 0)]["n_chunk_tokens"] == 1
    assert rows[(1, 0)]["n_chunk_tokens"] == 64
    assert rows[(2, 1)]["n_chunk_tokens"] == 17 and rows[(2, 1)]["first_pos"] == 49
    # every token covered: last chunk of doc 3 reaches position 113
    assert rows[(3, 2)]["first_pos"] + rows[(3, 2)]["n_chunk_tokens"] - 1 == 113
    # overlap contract: consecutive chunks share exactly 16 tokens
    c0, c1 = rows[(3, 0)], rows[(3, 1)]
    assert c1["first_pos"] - c0["first_pos"] == 48
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # projection-only: no shuffle


def test_mmr_rerank_matches_python_model(spark, sf_small):
    """operators/similarity.mmr_rerank (one Catalyst fold) against an
    independent Python greedy-MMR model on the real embeddings
    fixture."""
    from pyspark.sql import functions as F

    from ome_arrow_spark.operators.similarity import cosine_topk, mmr_rerank

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    c = emb.filter(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("cid"), "embedding"
    )
    rel = cosine_topk(q, c, k=8)
    got = sorted(
        (r["qid"], r["mmr_rank"], r["cid"])
        for r in mmr_rerank(rel, c, n_select=4, lam=0.7).collect()
    )

    relp = rel.toPandas()
    vecs = {r["cid"]: list(r["embedding"]) for r in c.collect()}

    def sim(x, y):
        import math

        d = sum(a * b for a, b in zip(vecs[x], vecs[y]))
        nx = math.sqrt(sum(a * a for a in vecs[x]))
        ny = math.sqrt(sum(a * a for a in vecs[y]))
        return round(d / (nx * ny), 6)

    exp = []
    for qid, g in relp.groupby("qid"):
        rem = dict(zip(g["cid"], g["cos_sim"]))
        sel = []
        for step in range(4):
            if not sel:
                m = max(rem.values())
                cid = min(cc for cc, rr in rem.items() if rr == m)
            else:
                scored = {
                    cc: round(
                        0.7 * rr - 0.3 * max(sim(cc, s) for s in sel), 6
                    )
                    for cc, rr in rem.items()
                }
                m = max(scored.values())
                cid = min(cc for cc, sc in scored.items() if sc == m)
            sel.append(cid)
            rem.pop(cid)
            exp.append((qid, step + 1, cid))
    assert got == sorted(exp)
    # diversification property: MMR ranks differ from pure relevance
    # order for at least one query on this fixture
    rel_order = {
        (r["qid"], r["rk"]): r["cid"] for r in rel.collect() if r["rk"] <= 4
    }
    assert any(
        rel_order.get((qid, k)) != cid for qid, k, cid in got
    )


def test_prefix_filtering_is_complete(spark, sf_small):
    """suite_llm.set_similarity_prefix: the prefix-filtered candidate
    join must find EXACTLY the pairs the naive all-shared-shingle join
    finds — the prefix-filtering completeness theorem, checked
    empirically on the fixture."""
    from ome_arrow_spark.suite_llm import _set_similarity

    pref = {
        (r["doc_a"], r["doc_b"], r["inter"], r["jaccard"])
        for r in _set_similarity(spark, sf_small, mode="prefix").collect()
    }
    naive = {
        (r["doc_a"], r["doc_b"], r["inter"], r["jaccard"])
        for r in _set_similarity(spark, sf_small, mode="naive").collect()
    }
    assert pref == naive and len(pref) > 0
