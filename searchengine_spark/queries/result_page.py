"""The assembled result page — what a search frontend actually calls:
spell-check the query, run the (possibly corrected) ranked retrieval
with duplicate suppression, and attach a query-biased snippet to every
result. One function, one job graph, every stage bounded by the query
after the top-k.

This is a COMPOSITION of the gated operators (lexicon.spell_correct,
diversify.rank_topk_diverse, snippets.query_hits/best_windows), not new
semantics — each piece keeps its own oracle; this module's tests pin
the plumbing (correction rewires retrieval, snippets attach to the
diversified survivors, the did_you_mean column reports what happened).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..indexing.build import SparkIndex
from ..indexing.simple import token_array
from .diversify import rank_topk_diverse
from .lexicon import spell_correct
from .ranked import query_rank_terms, rank_topk
from .snippets import best_windows, query_hits


def search_page(
    index: SparkIndex,
    docs: DataFrame,
    query: str,
    clusters: DataFrame | None = None,
    strategy: str = "bm25",
    k: int = 10,
    width: int = 8,
    normalize=None,
    vocab: DataFrame | None = None,
    deletions: DataFrame | None = None,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, str | None]:
    """Returns (results, did_you_mean).

    results: (doc_id, score, cluster_id, win_start, snippet) — top-k
    after near-dup suppression (``clusters``; None = no suppression),
    each with its best ``width``-token passage.

    did_you_mean: the corrected query string when every original term
    is OUT of vocabulary and every term has a distance-1 correction
    (the conservative rewrite policy — a query with any in-vocabulary
    term runs as typed); None otherwise. The correction RUNS — the
    returned results are for the corrected query, with the rewrite
    surfaced so the frontend can show "showing results for …".
    """
    terms = [t for t in query_rank_terms(query, normalize) if t]
    did_you_mean = None
    if terms and vocab is not None:
        present = {
            r["term"]
            for r in vocab.filter(F.col("term").isin(terms))
            .select("term").collect()
        }
        if not (set(terms) & present):
            fixes = {
                r["query_term"]: r["suggestion"]
                for r in spell_correct(vocab, terms,
                                       deletions=deletions).collect()
            }
            if set(fixes) == set(terms):
                # rebuild in the user's token order — same default
                # normalizer as query_rank_terms, so the fixes keyed by
                # normalized term are found even when normalize=None
                from ..oracle.engine import term_for_rank_mode

                norm = normalize or term_for_rank_mode
                fixed = []
                for raw in query.split(" "):
                    nt = norm(raw)
                    if nt:
                        fixed.append(fixes.get(nt, nt))
                did_you_mean = " ".join(fixed)
                query = did_you_mean
                terms = [t for t in query_rank_terms(query, normalize) if t]

    if clusters is not None:
        top = rank_topk_diverse(index, query, clusters, strategy, k,
                                normalize=normalize)
    else:
        top = rank_topk(index, query, strategy, k, normalize=normalize
                        ).withColumn("cluster_id", F.col("doc_id"))

    hits = query_hits(index, terms, top)
    best = best_windows(hits, width)
    toks = docs.select(
        F.col(doc_id_col).cast("long").alias("doc_id"),
        token_array(F.col(text_col)).alias("_ts"),
    )
    results = (
        top.join(best.select("doc_id", "win_start"), "doc_id")
        .join(toks, "doc_id")
        .select(
            "doc_id",
            "score",
            "cluster_id",
            "win_start",
            F.concat_ws(
                " ", F.slice("_ts", F.col("win_start").cast("int"), width)
            ).alias("snippet"),
        )
        .orderBy(F.desc("score"), F.desc("doc_id"))
    )
    return results, did_you_mean
