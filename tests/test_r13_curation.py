"""Round-13 pretraining-curation operators (VERDICT r12 "Next round"
#5): GPT-style sequence packing and the C4/RedPajama line-level
quality-rule battery.

- sequence_packing is re-derived independently in plain Python
  (hashlib md5 order, regex tokens, cumulative cut at 2048) and the
  Spark result must match pack for pack; structural invariants (every
  non-final pack exactly full, at most one spanning doc per pack) are
  asserted on top.
- c4_quality_rules' seven planted rows isolate each rule branch; the
  'planted' source aggregate must count exactly one failure per rule
  and exactly one all-pass doc.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow.parquet as pq

from ome_arrow_spark.suite_llm import (
    _PACK_BUDGET,
    c4_quality_rules,
    sequence_packing,
)

SF = "/root/testdata/sf0.001"


def _python_packs(sf_dir: str, budget: int) -> dict[int, tuple[int, int, int]]:
    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    docs = []
    for doc_id, text in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()):
        n = len(re.findall(r"[a-z0-9]+", (text or "").lower()))
        if n > 0:
            docs.append((hashlib.md5(str(doc_id).encode()).hexdigest(), doc_id, n))
    docs.sort()
    packs: dict[int, list[int]] = {}
    c = 0
    for _h, _i, n in docs:
        before, after = c, c + n
        c = after
        for p in range(before // budget, (after - 1) // budget + 1):
            tok = min(after, (p + 1) * budget) - max(before, p * budget)
            st = 1 if p == before // budget else 0
            d = packs.setdefault(p, [0, 0, 0])
            d[0] += 1
            d[1] += st
            d[2] += tok
    return {p: tuple(v) for p, v in packs.items() if p < 40}


def test_sequence_packing_matches_python_rederivation(spark):
    got = {
        r["pack_id"]: (r["n_docs"], r["n_starts"], r["tokens"])
        for r in sequence_packing(spark, SF).collect()
    }
    assert got == _python_packs(SF, _PACK_BUDGET)


def test_sequence_packing_invariants(spark):
    rows = sorted(
        sequence_packing(spark, SF).collect(), key=lambda r: r["pack_id"]
    )
    assert rows, "no packs produced"
    # contiguous pack ids from 0
    assert [r["pack_id"] for r in rows] == list(range(len(rows)))
    for r in rows[:-1]:
        assert r["tokens"] == _PACK_BUDGET, f"pack {r['pack_id']} not full"
    assert 0 < rows[-1]["tokens"] <= _PACK_BUDGET
    for r in rows:
        # at most ONE doc spans into a pack from the previous cut
        assert r["n_docs"] - r["n_starts"] in (0, 1)


def test_c4_planted_rows_isolate_each_rule(spark):
    row = next(
        r
        for r in c4_quality_rules(spark, SF).collect()
        if r["source"] == "planted"
    )
    assert row["n_docs"] == 7
    assert row["n_pass"] == 1
    assert row["fail_terminal_punct"] == 1
    assert row["fail_min_sentences"] == 1
    assert row["fail_code_marker"] == 1
    assert row["fail_bad_words"] == 1
    assert row["fail_dup_lines"] == 1
    assert row["fail_word_count"] == 1


def test_c4_real_sources_present(spark):
    rows = c4_quality_rules(spark, SF).collect()
    srcs = {r["source"] for r in rows}
    assert "planted" in srcs and len(srcs) > 1
    for r in rows:
        # per-rule failures never exceed doc count; pass + any-fail >= docs
        assert 0 <= r["n_pass"] <= r["n_docs"]


def test_line_dedup_planted_counts(spark):
    from ome_arrow_spark.suite_llm import line_dedup_global

    row = next(
        r
        for r in line_dedup_global(spark, SF).collect()
        if r["source"] == "planted"
    )
    # 8 non-empty line occurrences; 'shared boilerplate footer' repeats
    # across docs (1 removed) and 'repeat me twice' within a doc
    # (1 removed); two docs lose a line
    assert row["n_line_occurrences"] == 8
    assert row["n_kept"] == 6
    assert row["n_removed"] == 2
    assert row["n_docs_losing_lines"] == 2


def test_soft_dedup_matches_python(spark):
    import collections
    from decimal import Decimal

    from ome_arrow_spark.suite_llm import soft_dedup_weights

    tbl = pq.read_table(
        f"{SF}/documents.parquet", columns=["source", "text"]
    )
    csize = collections.Counter(
        hashlib.md5((t or "").encode()).hexdigest()
        for t in tbl["text"].to_pylist()
    )
    eff = collections.defaultdict(Decimal)
    n_docs = collections.Counter()
    distinct = collections.defaultdict(set)
    for s, t in zip(tbl["source"].to_pylist(), tbl["text"].to_pylist()):
        h = hashlib.md5((t or "").encode()).hexdigest()
        n_docs[s] += 1
        distinct[s].add(h)
        eff[s] += Decimal(str(round(1.0 / csize[h], 9)))
    got = {r["source"]: r for r in soft_dedup_weights(spark, SF).collect()}
    assert set(got) == set(n_docs)
    for s in n_docs:
        assert got[s]["n_docs"] == n_docs[s]
        assert got[s]["n_distinct_texts"] == len(distinct[s])
        assert got[s]["effective_docs"] == float(eff[s])
    # global invariant: effective docs sum to the number of distinct
    # texts (each cluster contributes exactly one unit)
    assert abs(sum(r["effective_docs"] for r in got.values())
               - len(csize)) < 1e-6


def test_sequence_packing_no_single_partition(spark):
    """The global running token sum must run as the two-phase bucketed
    cumsum — a naive SUM() OVER (ORDER BY ...) would put an 'Exchange
    SinglePartition' under the window and serialize the corpus."""
    plan = (
        sequence_packing(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange SinglePartition" not in plan, plan
