"""Pseudo-relevance feedback — Rocchio query expansion (Manning IIR
§9.1): assume the top-k answers are relevant, move the query toward
their tf-idf centroid, and re-rank with the expanded term set. The
reference ships the Rocchio CLASSIFIER (/root/reference/rocchio_classification.py)
but never feeds scores back into querying; this closes that loop with
the same weighting family (default-strategy wdt = 1 + ln tf,
wqt = ln(1 + N/df) — strictly positive, so expansion weights are
comparable across rare and common terms).

    w(t) = β/|D| · Σ_{d∈D_fb} (1 + ln tf_{t,d}) · ln(1 + N/df_t)

Scale shape: the feedback docs are the ranked top-k (k rows,
broadcast), their term frequencies come from tokenizing THOSE k
documents' text (a k-row broadcast join against the corpus table —
the forward-index lookup; a doc_id-keyed scan of the term-keyed
postings would touch every bucket), and df joins in from the
vocabulary aggregate restricted to the candidate terms. Everything
after the top-k is bounded by k · |doc terms|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..indexing.build import SparkIndex
from ..indexing.simple import token_array
from .ranked import query_rank_terms, rank_topk


def prf_expansion_terms(
    index: SparkIndex,
    docs: DataFrame,
    query: str,
    strategy: str = "bm25",
    fb_docs: int = 10,
    fb_terms: int = 5,
    beta: float = 0.75,
    normalize=None,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(term, weight) — the ``fb_terms`` highest-centroid-weight terms
    from the query's top-``fb_docs`` results, original query terms
    excluded; ties term asc."""
    qterms = [t for t in query_rank_terms(query, normalize) if t]
    n_docs, _ = index.corpus_scalars()
    top = rank_topk(index, query, strategy, fb_docs, normalize=normalize)
    # collect the ≤fb_docs feedback ids once (query-metadata-sized, the
    # WAND-θ collect class): the actual |D_fb| is the Rocchio divisor —
    # dividing by the nominal fb_docs deflates weights when fewer docs
    # match — and the collected frame feeds the broadcast join without
    # recomputing the ranking
    spark = index.postings.sparkSession
    top_rows = top.select("doc_id").collect()
    n_fb = len(top_rows) or 1
    fb_ids = spark.createDataFrame(top_rows, "doc_id long")
    fb = docs.select(
        F.col(doc_id_col).cast("long").alias("doc_id"),
        F.explode(token_array(F.col(text_col))).alias("term"),
    ).join(F.broadcast(fb_ids), "doc_id")
    tf = fb.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    cand = tf.filter(~F.col("term").isin(qterms))
    df_t = (
        index.postings.join(
            F.broadcast(cand.select("term").distinct()), "term"
        )
        .groupBy("term")
        .agg(F.count("*").cast("double").alias("df"))
    )
    n = F.lit(float(n_docs))
    weighted = (
        cand.join(F.broadcast(df_t), "term")
        .withColumn(
            "_w",
            (F.lit(1.0) + F.log("tf")) * F.log(F.lit(1.0) + n / F.col("df")),
        )
        .groupBy("term")
        .agg(
            (F.lit(float(beta)) / F.lit(float(n_fb)) * F.sum("_w"))
            .alias("weight")
        )
    )
    return (
        weighted.orderBy(F.desc("weight"), F.asc("term"))
        .limit(fb_terms)
        .select("term", "weight")
    )


def rank_topk_prf(
    index: SparkIndex,
    docs: DataFrame,
    query: str,
    strategy: str = "bm25",
    k: int = 10,
    fb_docs: int = 10,
    fb_terms: int = 5,
    normalize=None,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Two-pass ranked retrieval: rank, expand with the Rocchio terms,
    re-rank with the expanded query (expansion terms enter at weight 1
    — weighted accumulation is the ``mult`` column in rank_scores).
    The ≤fb_terms collect is query-metadata-sized, same class as the
    WAND θ collect."""
    exp = [
        r["term"]
        for r in prf_expansion_terms(
            index, docs, query, strategy, fb_docs, fb_terms,
            normalize=normalize, doc_id_col=doc_id_col, text_col=text_col,
        ).collect()
    ]
    expanded = query + "".join(f" {t}" for t in exp)
    return rank_topk(index, expanded, strategy, k, normalize=normalize)
