"""Deduplication operators for training-data pipelines (SURVEY.md §2C):
exact, MinHash+LSH near-dup, SimHash, n-gram Jaccard.

All distributed-by-construction: hash-groupBys and shingle-explode
joins — no pairwise O(n²) over the full corpus. Hash functions are
md5-based so results are engine-portable (the DuckDB oracles recompute
them exactly); at pure-Spark scale you'd swap md5 for xxhash64, which
is cheaper — the structure is identical.

Scale notes:
* exact dedup is one shuffle on the 128-bit fingerprint — safe at any
  corpus size; fingerprints are uniform so no skew.
* MinHash-LSH: cost is #shingles rows in the explode; band buckets are
  tiny except for boilerplate-heavy corpora — cap bucket size before
  pairing (candidate pairs within a B-row bucket are B², so a 10k-doc
  boilerplate bucket would generate 10⁸ pairs; ``max_bucket`` guards).
* verification joins are broadcast-able when the candidate set is
  small; here they stay shuffle joins for generality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ome_arrow_spark.functions.text import fingerprint, tokens


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Groups of normalized-content duplicates: one row per distinct
    content with the representative (min id) and the group size."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("rep_id"),
            F.count("*").alias("n_dups"),
        )
    )


def drop_exact_dups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the min-id representative per content group (the actual
    dedup sink path)."""
    w = Window.partitionBy(fingerprint(F.col(text_col))).orderBy(F.col(id_col))
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def shingles(text: Column, k: int = 3) -> Column:
    """k-word shingles of the token stream. Guarded for docs shorter
    than k tokens — Spark's ``sequence(0, negative)`` would count DOWN,
    fabricating bogus shingles."""
    toks = tokens(text)
    return F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - k),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 4,
    k: int = 3,
    shingles_col: str | None = None,
) -> DataFrame:
    """MinHash signature per document: for seed s, ``min(md5('s:' ||
    shingle))``. Documents with fewer than k tokens produce no shingles
    and are absent (they can't near-dup on k-grams anyway).

    ``shingles_col`` names a precomputed shingle-array column to reuse
    (a pipeline that also verifies Jaccard shingles once, not per
    stage); min is multiplicity-insensitive, so distinct shingle sets
    give identical signatures."""
    sh_expr = (
        F.col(shingles_col) if shingles_col else shingles(F.col(text_col), k)
    )
    sh = df.select(F.col(id_col), F.explode(sh_expr).alias("sh"))
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("sh")))).alias(f"mh{s}")
        for s in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidates(
    sig: DataFrame,
    id_col: str = "doc_id",
    bands: tuple[tuple[str, ...], ...] = (("mh0", "mh1"), ("mh2", "mh3")),
    max_bucket: int = 1000,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any full band signature.
    Buckets larger than ``max_bucket`` are dropped (boilerplate guard —
    see module scale notes).

    All bands materialize from ONE pass over ``sig`` (explode of the
    per-band keys), and pairs come from ONE shuffle: group ids per
    bucket, guard the bucket size, emit i<j combinations with a nested
    ``transform``. The join formulation (bucket counts → join back →
    self-join) costs three shuffles of the same data and materializes
    every oversized bucket's B² pairs before any guard can drop them;
    here oversized buckets are dropped as B-row id lists, never as
    pairs."""
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.concat_ws("|", *[F.col(c) for c in cols]).alias("band_key"),
            )
            for bi, cols in enumerate(bands)
        ]
    )
    b = sig.select(F.col(id_col), F.explode(band_structs).alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key")
    )
    buckets = (
        b.groupBy("band", "band_key")
        .agg(F.sort_array(F.collect_set(id_col)).alias("ids"))
        .filter(F.size("ids").between(2, max_bucket))
    )
    pairs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select(F.col("p.id_a"), F.col("p.id_b"))
        .distinct()
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
) -> DataFrame:
    """SimHash over the token multiset. Bit j of a token's hash is the
    parity of hex digit j of its md5; the document bit is the sign of
    the ±1 vote sum. Engine-portable (ascii/md5/substr are identical in
    DuckDB), at the cost of using only parity per hex char — swap for
    xxhash64 bit tests in a pure-Spark deployment."""
    tok = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
    h = F.md5(F.col("tok"))
    votes = [
        F.sum(2 * (F.ascii(F.substring(h, j + 1, 1)) % 2) - 1).alias(f"v{j}")
        for j in range(bits)
    ]
    voted = tok.groupBy(id_col).agg(*votes)
    sim = None
    for j in range(bits):
        bit = F.when(F.col(f"v{j}") > 0, F.lit(2**j)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return voted.select(F.col(id_col), sim.cast("long").alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.1,
    block_col: str | None = None,
) -> DataFrame:
    """Exact Jaccard similarity on distinct k-gram shingle sets, via
    shingle-explode + equi-join (no all-pairs scan: only docs sharing
    ≥1 shingle meet). ``block_col`` optionally restricts pairs to the
    same block (e.g. source) — the standard blocking trick."""
    base = df.select(
        F.col(id_col),
        *( [F.col(block_col)] if block_col else [] ),
        F.array_distinct(shingles(F.col(text_col), k)).alias("shs"),
    ).withColumn("n_sh", F.size("shs"))
    ex = base.select(id_col, *( [block_col] if block_col else [] ), "n_sh", F.explode("shs").alias("sh"))
    a, b = ex.alias("a"), ex.alias("b")
    cond = (F.col(f"a.sh") == F.col(f"b.sh")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    inter = (
        a.join(b, cond)
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.n_sh").alias("na"),
            F.col("b.n_sh").alias("nb"),
        )
        .agg(F.count("*").alias("inter"))
    )
    jac = inter.withColumn(
        "jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    )
    return jac.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "inter", "jaccard"
    )
