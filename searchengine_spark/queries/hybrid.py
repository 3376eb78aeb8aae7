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


def dense_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    depth: int,
    dense="ann",
    id_col: str = "vec_id",
    nbits: int = 16,
) -> DataFrame:
    """Resolve the dense arm of a hybrid query to a bounded
    (``id_col``, cosine) top-``depth`` frame.

    ``dense`` selects the ranker:

    * ``"ann"`` (default) — sign-LSH bucketed ``ops.similarity.ann_topk``
      (``nbits`` hyperplanes): the SCALE path; candidates come from one
      bucket (partition-prunable when the table is written bucketed),
      never a full-corpus scan. Size ``nbits`` to the corpus: expected
      bucket occupancy is n/2^nbits, so the 16-bit default suits ≥10^6
      vectors — on small corpora drop nbits (or use ``"brute"``, which
      is both exact and cheap there) or the query's bucket may hold
      fewer than ``depth`` candidates.
    * ``"brute"`` — exact ``brute_force_topk``: the recall-1 oracle twin.
      A full scan per query — correctness baseline, not a serving path.
    * a callable ``(embeddings, query_vec, depth) -> DataFrame`` —
      any other ranker (e.g. ``lambda e, q, d: ivf.search(q, d)`` for a
      fitted ``IvfIndex``, which ignores the raw embeddings arg).
    * a ``DataFrame`` — a pre-ranked (``id_col``, cosine) frame (the
      amortized shape: one ANN job scored a query batch up front);
      re-bounded to ``depth`` under the canonical order so the RRF
      depth contract holds regardless of how many rows were passed.
    """
    from ..ops.similarity import ann_topk, brute_force_topk

    if isinstance(dense, DataFrame):
        return dense.orderBy(F.desc("cosine"), F.asc(id_col)).limit(depth)
    if callable(dense):
        # re-bound like the frame branch: a ranker that ignores the
        # depth argument must not feed ranks beyond the RRF depth
        # contract into the fusion
        return (dense(embeddings, query_vec, depth)
                .orderBy(F.desc("cosine"), F.asc(id_col)).limit(depth))
    if dense == "ann":
        return ann_topk(embeddings, query_vec, depth, nbits=nbits,
                        id_col=id_col)
    if dense == "brute":
        return brute_force_topk(embeddings, query_vec, depth, id_col=id_col)
    raise ValueError(f"unknown dense ranker: {dense!r}")


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
    dense="ann",
    nbits: int = 16,
) -> DataFrame:
    """BM25 ⊕ cosine hybrid: top-``depth`` from each ranker, RRF-fused
    to a top-``k``. ``embeddings``' id column is the document id (a
    document-embedding table keyed like the corpus).

    The dense arm is pluggable (see ``dense_topk``): sign-LSH ANN by
    default — at corpus scale the dense candidate set must come from a
    bucketed/partition-pruned structure, not a per-query full scan —
    with ``dense="brute"`` as the exact-recall oracle twin and callable/
    pre-ranked-frame hooks for IVF or batch-scored deployments."""
    from .ranked import rank_topk

    lex = rank_topk(index, query, "bm25", depth, normalize=normalize)
    dns = dense_topk(embeddings, query_vec, depth, dense=dense,
                     id_col=id_col, nbits=nbits)
    return rrf_fuse(
        {
            "bm25": with_rank(lex, "score", "doc_id", id_ties_desc=True),
            "cosine": with_rank(dns, "cosine", id_col, id_ties_desc=False),
        },
        k=k, c=c,
    )
