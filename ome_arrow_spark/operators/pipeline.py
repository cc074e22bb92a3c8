"""Composed pipeline operators — the multi-step jobs a training-data /
imaging platform actually schedules, built from the parity-tested
primitives.

``near_dedup`` is the canonical corpus-dedup pipeline:
LSH candidates → exact Jaccard verification → connected components →
keep min-id representative per duplicate cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ome_arrow_spark.operators.clustering import connected_components
from ome_arrow_spark.operators.dedup import (
    lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
)


def near_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.5,
    num_hashes: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """Full near-dedup: returns the input's columns plus
    ``component`` (duplicate-cluster id, = own id when unique) and
    ``is_representative`` (min id in its cluster).

    Stage economics at 100 TB: LSH bounds the candidate set (linear in
    shingles), Jaccard verification touches only candidates, label
    propagation runs on the (tiny) verified-pair graph, and the final
    join back is key-partitioned. No stage is quadratic in the corpus.
    """
    # one materialization: both the signature and the verification
    # stages re-tokenize the corpus otherwise (two full scans of a
    # possibly-computed input)
    docs = docs.localCheckpoint(eager=True)
    sig = minhash_signatures(docs, text_col, id_col, num_hashes, shingle_k)
    candidates = lsh_candidates(sig, id_col)
    # verify candidates with exact Jaccard (blocked to the candidate set)
    verified = (
        ngram_jaccard_pairs(docs, text_col, id_col, shingle_k, jaccard_threshold)
        .join(candidates, ["id_a", "id_b"], "left_semi")
    )
    comps = connected_components(verified)
    out = docs.join(
        comps.withColumnRenamed("node", id_col), id_col, "left"
    ).withColumn("component", F.coalesce("component", F.col(id_col)))
    return out.withColumn("is_representative", F.col(id_col) == F.col("component"))


def drop_near_duplicates(docs: DataFrame, **kw) -> DataFrame:
    """The sink form: only cluster representatives survive."""
    return (
        near_dedup(docs, **kw)
        .filter(F.col("is_representative"))
        .drop("component", "is_representative")
    )
