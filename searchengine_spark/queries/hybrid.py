"""Hybrid retrieval — lexical BM25 fused with dense embedding
similarity by Reciprocal Rank Fusion (Cormack/Clarke/Büttcher, SIGIR
2009): the standard way a modern engine combines a sparse and a dense
ranker without calibrating their incomparable score scales.

    rrf(d) = Σ_lists 1 / (c + rank_list(d))        (c = 60 canonical)

Scale shape: each input list is ALREADY a bounded top-depth result
(TakeOrderedAndProject / bucketed ANN — the distributed part), so the
fusion itself runs on ≤ Σ depth_i rows: the single-partition
row_number window and the final sort are deliberate and cheap — this
is the k-row coordinator step of a scatter-gather ranker, not a
corpus-sized plan. Ranks are integers and each doc appears in ≤ 2
lists, so the fused score is an order-independent sum of ≤ 2 floats —
bit-equal across engines, which is what lets the gate hash it.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

RRF_C = 60


def with_rank(topk: DataFrame, score_col: str, id_col: str,
              id_ties_desc: bool = False) -> DataFrame:
    """(id, rank) for a bounded top-k frame: rank 1 = best. The window
    is global on purpose — inputs are k-row results, never corpora.
    ``id_ties_desc`` matches the tie convention of the producing
    ranker (BM25's heap breaks ties doc_id DESC, the cosine path
    id ASC)."""
    tie = F.col(id_col).desc() if id_ties_desc else F.col(id_col).asc()
    w = Window.orderBy(F.col(score_col).desc(), tie)
    return topk.select(
        F.col(id_col).alias("id"),
        F.row_number().over(w).cast("long").alias("rank"),
    )


def rrf_fuse(rankings: dict[str, DataFrame], k: int = 10,
             c: int = RRF_C, id_col: str = "doc_id") -> DataFrame:
    """Fuse named (id, rank) lists: (id_col, rrf_score, n_lists),
    top-k by rrf desc (ties: id asc — fusion has no better signal)."""
    parts = [
        df.select(F.col("id"), F.col("rank"))
        for df in rankings.values()
    ]
    u = reduce(lambda a, b: a.unionByName(b), parts)
    fused = u.groupBy("id").agg(
        F.sum(F.lit(1.0) / (F.lit(float(c)) + F.col("rank"))).alias("rrf_score"),
        F.count("*").cast("long").alias("n_lists"),
    )
    return (
        fused.orderBy(F.desc("rrf_score"), F.asc("id"))
        .limit(k)
        .select(F.col("id").alias(id_col), "rrf_score", "n_lists")
    )


def hybrid_topk(
    index,
    embeddings: DataFrame,
    query: str,
    query_vec: list[float],
    k: int = 10,
    depth: int = 20,
    c: int = RRF_C,
    normalize=None,
    id_col: str = "vec_id",
) -> DataFrame:
    """BM25 ⊕ cosine hybrid: top-``depth`` from each ranker, RRF-fused
    to a top-``k``. ``embeddings``' id column is the document id (a
    document-embedding table keyed like the corpus)."""
    from ..ops.similarity import brute_force_topk
    from .ranked import rank_topk

    lex = rank_topk(index, query, "bm25", depth, normalize=normalize)
    dense = brute_force_topk(embeddings, query_vec, depth, id_col=id_col)
    return rrf_fuse(
        {
            "bm25": with_rank(lex, "score", "doc_id", id_ties_desc=True),
            "cosine": with_rank(dense, "cosine", id_col, id_ties_desc=False),
        },
        k=k, c=c,
    )
