"""Query-independent authority blended into ranked retrieval — the
web-search move the reference's pure text scorer
(/root/reference/ranked_strategy.py) has no analogue for: BM25 says how
well a page matches the query, PageRank says how much the link graph
endorses the page; final order uses both (static quality signals /
query-independent priors, Manning IIR §7.1.4 and §21).

Blend: ``blended = text_score * ln(1 + pagerank * n_nodes)``.
``pagerank * n_nodes`` is the page's authority relative to the uniform
prior (≈1 for an average page, so an average page keeps ≈ln 2 of its
text score); the log keeps hub pages from drowning text relevance. The
fixed-point ranks from ops.linkgraph (int64, bit-identical to the SQL
oracle) make the blend reproducible across engines: both sides compute
``ln(1 + (rank_fp * n) / 2^40)`` in float64 from identical integers.

Scale shape: the text side is matched-postings-sized (term-pruned
scan), the rank side is one corpus-sized (node, rank_fp) table joined
on doc_id — bucketed by doc_id in a real deployment so the join is
co-located (sources/snapshots.py bucket layout); top-k stays a
TakeOrderedAndProject. Blending happens BEFORE top-k: a prior can
promote a doc from outside any fixed-k text prefix, so re-ranking a
text top-k would be wrong (and is exactly the mistake the gate oracle
would catch)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..indexing.build import SparkIndex
from ..ops.linkgraph import SCALE, pagerank_fixedpoint
from .ranked import rank_scores


def blend_pagerank(scores: DataFrame, ranks: DataFrame,
                   n_nodes: int) -> DataFrame:
    """(doc_id, score, rank_fp, blended): text scores × fixed-point
    PageRank. Docs absent from the graph keep rank_fp 0 → blended 0
    (ln 1): text match alone never outranks an endorsed page, matching
    the oracle's LEFT JOIN + coalesce semantics."""
    pr = ranks.select(F.col("node").alias("doc_id"), "rank_fp")
    return (
        scores.join(pr, "doc_id", "left")
        .withColumn("rank_fp", F.coalesce(F.col("rank_fp"), F.lit(0)))
        .withColumn(
            "blended",
            F.col("score")
            * F.log(
                F.lit(1.0)
                + F.col("rank_fp").cast("double") * F.lit(float(n_nodes))
                / F.lit(float(SCALE))
            ),
        )
    )


def rank_topk_pagerank(
    index: SparkIndex,
    edges: DataFrame,
    query: str,
    strategy: str = "bm25",
    k: int = 10,
    iters: int = 3,
    normalize=None,
    ranks: DataFrame | None = None,
    n_nodes: int | None = None,
) -> DataFrame:
    """Top-k by the PageRank-blended score (ties: doc_id desc).

    Pass precomputed ``ranks``/``n_nodes`` (pagerank_fixedpoint output)
    to amortize the power iteration across queries — the production
    shape, where ranks are a published table refreshed with the crawl,
    not a per-query job."""
    if ranks is None:
        nodes = (
            edges.select(F.col("src").alias("node"))
            .union(edges.select(F.col("dst").alias("node")))
            .distinct()
        )
        n_nodes = nodes.count()
        ranks = pagerank_fixedpoint(edges, iters, n_nodes=n_nodes)
    elif n_nodes is None:
        n_nodes = ranks.count()
    scores = rank_scores(index, query, strategy, normalize=normalize)
    blended = blend_pagerank(scores, ranks, n_nodes)
    return blended.orderBy(F.desc("blended"), F.desc("doc_id")).limit(k)
