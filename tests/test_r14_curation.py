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


# ---------------------------------------------------------------------------
# Round-14 second wave: CCNet perplexity terciles + Bloom membership
# probe.  Both are re-derived in plain Python from the parquet file
# (hashlib md5 / math.log — no Spark, no DuckDB) so a bug shared by
# the two engines' common design would still be caught.
# ---------------------------------------------------------------------------


def _round9(x: float) -> float:
    from decimal import ROUND_HALF_UP, Decimal

    # Spark's ROUND(double, 9) is HALF_UP on the shortest decimal repr
    return float(Decimal(repr(x)).quantize(Decimal("1e-9"), ROUND_HALF_UP))


def test_ccnet_buckets_matches_python_rederivation(spark):
    import math
    from collections import Counter, defaultdict
    from decimal import Decimal

    from ome_arrow_spark.suite_llm import ccnet_ppl_buckets

    got = {
        (r["lang"], r["bucket"]): r
        for r in ccnet_ppl_buckets(spark, SF).collect()
    }

    tbl = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "lang", "text"]
    )
    rows = list(
        zip(
            tbl["doc_id"].to_pylist(),
            tbl["lang"].to_pylist(),
            tbl["text"].to_pylist(),
        )
    )
    cnt: dict[str, Counter] = defaultdict(Counter)
    tot: Counter = Counter()
    doc_toks: dict[int, list[str]] = {}
    for doc_id, lang, text in rows:
        toks = re.findall(r"[a-z0-9]+", (text or "").lower())
        doc_toks[doc_id] = toks
        cnt[lang].update(toks)
        tot[lang] += len(toks)
    per_lang: dict[str, list[tuple[float, int, int]]] = defaultdict(list)
    for doc_id, lang, _ in rows:
        toks = doc_toks[doc_id]
        if not toks:
            continue
        s = sum(
            Decimal(repr(_round9(math.log(tot[lang]) - math.log(cnt[lang][w]))))
            for w in toks
        )
        per_lang[lang].append((_round9(float(s) / len(toks)), doc_id, len(toks)))

    want_keys = set()
    for lang, docs in per_lang.items():
        docs.sort()
        n = len(docs)
        by_bucket: dict[str, list[tuple[float, int, int]]] = defaultdict(list)
        for rn0, (mean_nll, doc_id, n_tok) in enumerate(docs):
            rn = rn0 + 1
            bucket = (
                "head"
                if rn * 3 <= n
                else ("middle" if rn * 3 <= 2 * n else "tail")
            )
            by_bucket[bucket].append((mean_nll, doc_id, n_tok))
        for bucket, members in by_bucket.items():
            want_keys.add((lang, bucket))
            g = got[(lang, bucket)]
            assert g["n_docs"] == len(members)
            assert g["n_tokens"] == sum(m[2] for m in members)
            assert g["cut_nll"] == max(m[0] for m in members)
            avg = _round9(
                float(sum(Decimal(repr(m[0])) for m in members)) / len(members)
            )
            assert abs(g["avg_nll"] - avg) < 1e-12
        # exact tercile sizes: the integer rank rule, not approximate
        assert len(by_bucket.get("head", [])) == n // 3
        assert len(by_bucket.get("middle", [])) == 2 * n // 3 - n // 3
    assert want_keys == set(got)


def test_bloom_probe_matches_python_rederivation(spark):
    import hashlib

    from ome_arrow_spark.suite_llm import bloom_dedup_probe

    got = {r["cls"]: r for r in bloom_dedup_probe(spark, SF).collect()}

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    rows = list(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))

    def fp_of(toks: list[str]) -> str:
        return hashlib.md5(" ".join(toks).encode()).hexdigest()

    def positions(fp: str, m: int) -> list[int]:
        return [
            int(hashlib.md5(f"{j}:{fp}".encode()).hexdigest()[:13], 16) % m
            for j in range(4)
        ]

    m = max(64 * len(rows), 64)
    ref_fps = []
    probe = []  # (cls, fp)
    for doc_id, text in rows:
        toks = re.findall(r"[a-z0-9]+", (text or "").lower())
        ref_fps.append(fp_of(toks))
        if doc_id % 3 == 0:
            probe.append(("dup", fp_of(toks)))
        elif doc_id % 3 == 1:
            probe.append(("mutated", fp_of(toks[1:])))
    bits = set()
    for fp in ref_fps:
        bits.update(positions(fp, m))
    ref_set = set(ref_fps)

    from collections import Counter

    n_probe: Counter = Counter()
    n_maybe: Counter = Counter()
    n_present: Counter = Counter()
    n_fp: Counter = Counter()
    for cls, fp in probe:
        n_probe[cls] += 1
        maybe = all(p in bits for p in positions(fp, m))
        present = fp in ref_set
        n_maybe[cls] += maybe
        n_present[cls] += present
        n_fp[cls] += maybe and not present
    for cls in ("dup", "mutated"):
        g = got[cls]
        assert g["n_probe"] == n_probe[cls]
        assert g["n_maybe"] == n_maybe[cls]
        assert g["n_present"] == n_present[cls]
        assert g["n_false_pos"] == n_fp[cls]
        # no false negatives: every present probe is flagged maybe
        assert g["n_maybe"] == g["n_present"] + g["n_false_pos"]
    assert got["dup"]["n_maybe"] == got["dup"]["n_probe"]
    assert got["dup"]["fp_rate"] is None  # zero non-members -> guarded NULL


def test_bloom_probe_false_positive_branch(spark, tmp_path):
    """Force the FP branch with an adversarially tiny corpus: with only
    three 1-token seen docs the derived m=192-bit filter is small enough
    that a planted non-member colliding on all 4 positions is found by
    brute force, proving maybe=true/present=false flows to n_false_pos."""
    import hashlib

    from ome_arrow_spark.suite_llm import bloom_dedup_probe

    def positions(fp: str, m: int) -> list[int]:
        return [
            int(hashlib.md5(f"{j}:{fp}".encode()).hexdigest()[:13], 16) % m
            for j in range(4)
        ]

    seen = ["alpha", "beta", "gamma"]  # doc_id 0,3,6 -> all ref + dup-probed
    m = 64 * 4  # the corpus will hold 4 docs (3 seen + the probe doc)
    base_bits = set()
    for t in seen:
        base_bits.update(positions(hashlib.md5(t.encode()).hexdigest(), m))
    # find a token whose doc (id%3==1, text "x <t>", mutated probe drops
    # the leading 'x') hashes entirely into the filter — which holds the
    # 3 seen docs PLUS the probe doc's own full text "x <t>"
    cand = None
    for i in range(200000):
        t = f"w{i}"
        fp = hashlib.md5(t.encode()).hexdigest()
        full_fp = hashlib.md5(f"x {t}".encode()).hexdigest()
        bits = base_bits | set(positions(full_fp, m))
        if t not in seen and all(p in bits for p in positions(fp, m)):
            cand = t
            break
    assert cand is not None, "no 4-way collision found in 200k candidates"
    import pyarrow as pa
    import pyarrow.parquet as pqw

    docs = [(0, seen[0]), (3, seen[1]), (6, seen[2]), (1, f"x {cand}")]
    t = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([s for _, s in docs]),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["t"] * 4),
            "n_chars": pa.array([len(s) for _, s in docs], pa.int64()),
        }
    )
    pqw.write_table(t, str(tmp_path / "documents.parquet"))
    got = {r["cls"]: r for r in bloom_dedup_probe(spark, str(tmp_path)).collect()}
    assert got["mutated"]["n_false_pos"] == 1
    assert got["mutated"]["fp_rate"] == 1.0
    assert got["dup"]["n_maybe"] == got["dup"]["n_probe"] == 3


def test_ccnet_buckets_no_single_partition(spark):
    """The per-language exact tercile rank must run as the census-offset
    two-phase recipe — a naive ROW_NUMBER() OVER (PARTITION BY lang) puts
    the whole corpus of one language on one task (langs are few and
    huge); the window here must be partitioned by (lang, cell)."""
    from ome_arrow_spark.suite_llm import ccnet_ppl_buckets

    plan = (
        ccnet_ppl_buckets(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan
    assert "windowspecdefinition(lang" in plan and "cell" in plan


def test_incremental_lsh_bucket_emission(spark):
    """Bucket-level semantics of the asymmetric candidate generator:
    k old docs + 1 new doc sharing a band emit exactly k pairs (never
    the C(k+1,2) a full self-pairing would), old-only buckets emit
    nothing, and new×new pairs come out i<j once."""
    from ome_arrow_spark.operators.dedup import lsh_candidates_incremental

    rows = [
        # bucket A (band keys all equal): 3 old + 1 new -> 3 pairs
        (10, False, "a", "a", "z1", "z1"),
        (11, False, "a", "a", "z2", "z2"),
        (12, False, "a", "a", "z3", "z3"),
        (-5, True, "a", "a", "z4", "z4"),
        # bucket B: old-only -> 0 pairs
        (20, False, "b", "b", "y1", "y1"),
        (21, False, "b", "b", "y2", "y2"),
        # bucket C: 2 new -> 1 pair
        (-7, True, "c", "c", "x1", "x1"),
        (-9, True, "c", "c", "x2", "x2"),
    ]
    sig = spark.createDataFrame(
        rows, "doc_id long, is_new boolean, mh0 string, mh1 string, "
        "mh2 string, mh3 string"
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidates_incremental(sig).collect()
    }
    assert got == {(-5, 10), (-5, 11), (-5, 12), (-9, -7)}


def test_incremental_neardup_equals_filtered_full(spark):
    """The asymmetric plan must produce exactly the full candidate set
    restricted to new-touching pairs (the oracle's formulation)."""
    from ome_arrow_spark.operators.dedup import (
        lsh_candidates,
        lsh_candidates_incremental,
    )
    from ome_arrow_spark.suite_llm import _mutated_docs

    from pyspark.sql import functions as F

    sig = __import__(
        "ome_arrow_spark.operators.dedup", fromlist=["minhash_signatures"]
    ).minhash_signatures(_mutated_docs(spark, SF))
    full = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidates(sig).collect()
        if r["id_a"] < 0 or r["id_b"] < 0
    }
    inc = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidates_incremental(
            sig.withColumn("is_new", F.col("doc_id") < 0)
        ).collect()
    }
    assert inc == full and len(inc) > 0


def test_cross_source_overlap_matches_python_rederivation(spark):
    import hashlib
    from collections import Counter, defaultdict

    from ome_arrow_spark.suite_llm import cross_source_overlap

    got = {
        (r["src_a"], r["src_b"]): r
        for r in cross_source_overlap(spark, SF).collect()
    }

    tbl = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "source", "text"]
    )
    rows = list(
        zip(
            tbl["doc_id"].to_pylist(),
            tbl["source"].to_pylist(),
            tbl["text"].to_pylist(),
        )
    )
    corpus = [(d, s, t) for d, s, t in rows] + [
        (
            -(d + 1),
            f"src{(int(re.search(r'[0-9]+', s).group()) + 1) % 20}",
            t,
        )
        for d, s, t in rows
        if d % 7 == 0
    ]
    fp_sources: dict[str, set] = defaultdict(set)
    for _d, s, t in corpus:
        fp = hashlib.md5(
            " ".join(re.findall(r"[a-z0-9]+", (t or "").lower())).encode()
        ).hexdigest()
        fp_sources[fp].add(s)
    per: Counter = Counter()
    for srcs in fp_sources.values():
        for s in srcs:
            per[s] += 1
    shared: Counter = Counter()
    for srcs in fp_sources.values():
        ss = sorted(srcs)
        for i in range(len(ss)):
            for jj in range(i + 1, len(ss)):
                shared[(ss[i], ss[jj])] += 1
    assert set(got) == set(shared)
    for (a, b), n in shared.items():
        g = got[(a, b)]
        assert g["n_shared"] == n
        assert g["nf_a"] == per[a] and g["nf_b"] == per[b]
        assert g["jaccard"] == _round9(n / (per[a] + per[b] - n))
    # the planted band: every adjacent source pair must overlap
    assert len(got) >= 20


def test_minhash_jaccard_estimate_census_invariants(spark):
    from ome_arrow_spark.suite_llm import (
        minhash_jaccard_estimate,
        _mutated_docs,
    )
    from ome_arrow_spark.operators.dedup import (
        lsh_candidates,
        minhash_signatures,
    )

    rows = minhash_jaccard_estimate(spark, SF).collect()
    # candidates share a full 2-min band -> agreement is 2, 3, or 4
    assert all(2 <= r["shared_mins"] <= 4 for r in rows)
    n_cand = lsh_candidates(
        minhash_signatures(_mutated_docs(spark, SF))
    ).count()
    assert sum(r["n_pairs"] for r in rows) == n_cand
    for r in rows:
        assert 0.0 < r["min_jaccard"] <= r["mean_jaccard"] <= r["max_jaccard"] <= 1.0
    # full 4/4 agreement pairs exist (the mutated mirrors) and are the
    # most similar stratum on this corpus
    by = {r["shared_mins"]: r for r in rows}
    assert 4 in by
    assert by[4]["mean_jaccard"] >= max(
        r["mean_jaccard"] for r in rows if r["shared_mins"] < 4
    )
