"""Term-based document similarity: exact sparse cosine over the
inverted index — the lexical complement to the embedding-space
similarity family (ops/similarity.py). Web-scale uses: template/mirror
detection beyond shingle dedup, related-document linking, cluster
seeding.

Weights are the engine's Default-strategy wdt = 1 + ln(tftd) and the
norm is the reference's Ld over the KEPT vocabulary, so the score is
the exact cosine in the pruned term space (self-consistent, not an
estimate of the unpruned cosine).

Scale shape — the self-join on ``term`` is the only quadratic risk,
and it is bounded the standard way: terms with df > ``max_df`` are
dropped BEFORE the join (a term with document frequency df contributes
up to df·(df−1)/2 pairs, so stopword-like terms are exactly the ones
that explode; they also carry no discriminative cosine mass). Total
candidate volume is ≤ max_df · |postings kept|, linear in corpus size
for fixed max_df. The remaining exchanges: one groupBy(term) for df,
one term-keyed sort-merge self-join feeding a partial-agged
groupBy(pair) dot product, two broadcast-sized norm joins. Pinned
``hint("merge")`` on the corpus-sized sides for the same AQE
misestimate documented in ops/dedup.jaccard_verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_term_weights(docs: DataFrame, text_col: str = "text",
                     max_df: int = 100) -> DataFrame:
    """(doc_id, term, w, norm): ln-scaled weights over df-capped terms
    plus the per-doc L2 norm in that pruned space."""
    from ..indexing.simple import simple_tokens

    tftd = (
        simple_tokens(docs, text_col=text_col)
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tftd"))
    )
    kept = (
        tftd.groupBy("term")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_df)
        .select("term")
    )
    w = tftd.join(kept, "term").select(
        "doc_id", "term", (1.0 + F.log("tftd")).alias("w")
    )
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm")
    )
    return w.join(norms, "doc_id")


def sparse_cosine_pairs(docs: DataFrame, text_col: str = "text",
                        max_df: int = 100, threshold: float = 0.5,
                        materialize: bool = True) -> DataFrame:
    """(doc_a, doc_b, cosine) for all pairs with exact pruned-space
    cosine ≥ threshold, doc_a < doc_b.

    ``materialize`` localCheckpoints the weights table first: the
    weights subtree feeds BOTH self-join sides, and without
    materialization Catalyst duplicates the whole
    tokenize→explode→aggregate pipeline per consumer (8 scans in the
    static plan — measured; AQE's exchange reuse recovers some at
    runtime, but re-tokenizing a 100 TB corpus even twice is the
    dominant cost). Same eager-truncation pattern as
    ops.dedup.duplicate_clusters; pass False to keep the plan lazy
    (tiny inputs, or when the caller materializes w itself)."""
    w = doc_term_weights(docs, text_col, max_df)
    if materialize:
        w = w.localCheckpoint()
    a = w.select(F.col("doc_id").alias("doc_a"), "term",
                 F.col("w").alias("wa"), F.col("norm").alias("na"))
    b = w.select(F.col("doc_id").alias("doc_b"), "term",
                 F.col("w").alias("wb"), F.col("norm").alias("nb"))
    return (
        a.hint("merge")
        .join(b.hint("merge"),
              (a["term"] == b["term"]) & (F.col("doc_a") < F.col("doc_b")))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
        .withColumn("cosine", F.col("dot") / (F.col("na") * F.col("nb")))
        .filter(F.col("cosine") >= threshold)
        .select("doc_a", "doc_b", "cosine")
    )
