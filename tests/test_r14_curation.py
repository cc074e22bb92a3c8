"""Round-14 curation operators (VERDICT r13 "Next round" #3):
C4 three-sentence-span dedup and DoReMi-lite domain-mixture
reweighting.

- span_dedup_3sent is re-derived independently in plain Python
  (regex sentence split, 12-token chunking, sliding 3-windows,
  first-occurrence by (doc_id, span_no)); per-source aggregates must
  match, and the five planted docs must hit exactly the cross-doc,
  within-doc, too-short, and chunking branches.
- domain_mixture_reweight is re-derived with the same Knuth hash and
  exact-integer rate arithmetic; invariants (clamped sources keep
  everything, selected tokens <= tokens, both clamp branches hit)
  are asserted on top.
"""

from __future__ import annotations

import re

import pyarrow.parquet as pq

from ome_arrow_spark.suite_llm import (
    _SPANDUP_PLANTED,
    domain_mixture_reweight,
    span_dedup_3sent,
)

SF = "/root/testdata/sf0.001"


def _py_units(text: str) -> list[str]:
    units: list[str] = []
    for sent in re.split(r"[.!?\n]+", text or ""):
        toks = re.findall(r"[a-z0-9]+", sent.lower())
        for i in range(0, len(toks), 12):
            chunk = " ".join(toks[i : i + 12])
            if chunk:
                units.append(chunk)
    return units


def _py_span_stats(sf_dir: str) -> dict[str, tuple[int, int, int, int]]:
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    )
    rows = list(
        zip(
            tbl["doc_id"].to_pylist(),
            tbl["source"].to_pylist(),
            tbl["text"].to_pylist(),
        )
    ) + list(_SPANDUP_PLANTED)
    occ: list[tuple[int, str, str, int]] = []
    for doc_id, source, text in rows:
        units = _py_units(text)
        for j in range(len(units) - 2):
            span = "\x1f".join(units[j : j + 3])
            occ.append((doc_id, source, span, j + 1))
    firsts: dict[str, tuple[int, int]] = {}
    for doc_id, _s, span, no in occ:
        key = (doc_id, no)
        if span not in firsts or key < firsts[span]:
            firsts[span] = key
    stats: dict[str, list] = {}
    for doc_id, source, span, no in occ:
        kept = firsts[span] == (doc_id, no)
        st = stats.setdefault(source, [0, 0, 0, set()])
        st[0] += 1
        st[1] += 1 if kept else 0
        st[2] += 0 if kept else 1
        if not kept:
            st[3].add(doc_id)
    return {
        s: (v[0], v[1], v[2], len(v[3])) for s, v in stats.items()
    }


def test_span_dedup_matches_python_rederivation(spark):
    got = {
        r["source"]: (
            r["n_span_occurrences"],
            r["n_kept"],
            r["n_removed"],
            r["n_docs_losing_spans"],
        )
        for r in span_dedup_3sent(spark, SF).collect()
    }
    assert got == _py_span_stats(SF)


def test_span_dedup_planted_branches(spark):
    rows = {
        r["source"]: r for r in span_dedup_3sent(spark, SF).collect()
    }
    p = rows["planted"]
    # docs A+B: 2+2 spans, B's first span duplicates A's (cross-doc);
    # doc C: 4 spans, span 4 duplicates span 1 (within-doc); doc D:
    # too short, 0 spans; doc E: one long unpunctuated sentence ->
    # 3 chunks -> 1 span.  Total 2+2+4+0+1 = 9, removed = 2.
    assert p["n_span_occurrences"] == 9
    assert p["n_removed"] == 2
    assert p["n_kept"] == 7
    assert p["n_docs_losing_spans"] == 2  # doc B (cross) + doc C (within)


def test_domain_mixture_matches_python_rederivation(spark):
    tbl = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "source", "text"]
    )
    docs = [
        (
            d,
            s,
            len(re.findall(r"[a-z0-9]+", (t or "").lower())),
            (d * 2654435761) % 4294967296,
        )
        for d, s, t in zip(
            tbl["doc_id"].to_pylist(),
            tbl["source"].to_pylist(),
            tbl["text"].to_pylist(),
        )
    ]
    per_src: dict[str, list[int]] = {}
    for _d, s, n, _h in docs:
        st = per_src.setdefault(s, [0, 0])
        st[0] += 1
        st[1] += n
    w = {s: (int(re.search(r"[0-9]+", s).group()) % 5) + 1 for s in per_src}
    sw = sum(w.values())
    total = sum(v[1] for v in per_src.values())
    budget = (total * 9) // 10
    rate = {
        s: min(1.0, (budget * w[s]) / (sw * per_src[s][1])) for s in per_src
    }
    sel: dict[str, list[int]] = {s: [0, 0] for s in per_src}
    for _d, s, n, h in docs:
        if h / 4294967296.0 < rate[s]:
            sel[s][0] += 1
            sel[s][1] += n

    got = {r["source"]: r for r in domain_mixture_reweight(spark, SF).collect()}
    assert set(got) == set(per_src)
    clamped = unclamped = 0
    for s, r in got.items():
        assert r["target_weight"] == w[s]
        assert (r["n_docs"], r["tokens"]) == tuple(per_src[s])
        assert r["sampling_rate"] == round(rate[s], 9)
        assert (r["n_selected"], r["selected_tokens"]) == tuple(sel[s])
        assert r["selected_tokens"] <= r["tokens"]
        if rate[s] >= 1.0:
            clamped += 1
            # rate 1 keeps every doc (hash fraction < 1 always)
            assert r["n_selected"] == r["n_docs"]
        else:
            unclamped += 1
    assert clamped > 0 and unclamped > 0  # both branches exercised
