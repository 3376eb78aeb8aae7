"""Block-max WAND top-k over compressed segments — the scale path for
BM25 ranked retrieval (north rule: "BM25 top-k scoring with block-max
WAND posting-list intersection as a DataFrame pipeline").

The reference's only pruning is the scalar vocab-elimination wqt
threshold (/root/reference/vocab_elimination_main_precision_demo.py:142,171);
block-max WAND generalizes it to per-block score upper bounds
(Broder et al. CIKM'03; Ding & Suel SIGIR'11 — see PAPERS.md).

Safe two-phase logic, compiled into ONE main DataFrame action plus a
single ≤|terms|-row metadata collect (round-2 rewrite: the round-1
version paid two data-dependent driver collects per query — champion
ids and θ — plus per-query caches; champion selection and θ are now
dataflow, θ riding along as a broadcast 1-row aggregate, and the only
driver round-trip is the per-term dft lookup — the Spark analogue of
the reference's SQLite vocabulary seek):

1. **Upper bounds** (metadata only — no posting decode): for each
   (term, block) of the query's terms, ``ub = wqt · wdt_max`` where
   ``wdt_max`` plugs the block's ``max_tftd`` and ``min_doc_length``
   into the BM25 wdt (wdt is increasing in tftd, decreasing in
   doc_length). Block totals ``UB(block) = Σ_terms ub`` overestimate
   every doc's score in that block.
2. **Champion blocks**: top ``champion_blocks`` blocks by UB
   (TakeOrderedAndProject — no global sort), greedily trimmed by a
   running doc-count window (tiny: ≤ champion_blocks rows) to the
   prefix covering ≥ k docs.
3. **θ**: decode ONLY champion blocks, score exactly, take the k-th
   best exact score (−∞ when champions cover < k docs) — a 1-row
   aggregate, broadcast.
4. **Pruned pass**: decode + score ONLY blocks with ``UB ≥ θ``; blocks
   below θ cannot contain a top-k doc (their every doc scores < θ ≤
   current k-th). Final top-k over the survivors.

The pruned pass re-scores champion blocks too — idempotent, and keeps
the plan a single decode→score pipeline. Exactness is asserted against
the unpruned ``rank_topk`` in tests and the driver's SQL oracle
(``wand_bm25`` shares ``rank_bm25``'s SQL verbatim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..indexing.segments import decode_postings
from .ranked import query_rank_terms

K1, B = 1.2, 0.75


def _bm25_wqt(n_docs: float):
    dft = F.col("dft").cast("double")
    return F.greatest(F.lit(0.1), F.log((F.lit(n_docs) - dft + 0.5) / (dft + 0.5)))


def bm25_wdt_expr(tftd_col, dl_col, avg_dl: float):
    """(k1+1)·tftd / (k1·(0.25 + 0.75·dl/avgdl) + tftd) — the exact
    reference constants (ranked_strategy.py:134-135: 1.2·(0.25+0.75·…))."""
    tftd = tftd_col.cast("double")
    denom = F.lit(K1) * (F.lit(0.25) + F.lit(0.75) * dl_col / F.lit(avg_dl)) + tftd
    return F.lit(K1 + 1.0) * tftd / denom


def wand_topk(
    index,
    segments: DataFrame,
    query: str,
    k: int = 10,
    normalize=None,
    term_buckets: int | None = None,
    champion_blocks: int = 8,
    deletes: DataFrame | None = None,
) -> DataFrame:
    """BM25 top-k via block-max WAND — one main DataFrame action plus
    a tiny per-term dft metadata collect, zero caches. ``index``
    supplies corpus scalars;
    ``segments`` is the compressed block table (doc_lengths ride inside
    the segments — no doc_stats join). Returns DataFrame(doc_id, score)
    with the reference tie-break (score desc, doc_id desc —
    main.py:463-467).

    ``deletes`` — merge-on-read serving from a refreshed snapshot
    (pipeline/refresh.py): a delta-sized (doc_id, _del_seq) frame;
    ``segments`` must then carry the snapshot layer's ``_seq`` column.
    Superseded postings (row seq < the doc's delete seq) are dropped at
    decode time, so results never contain a stale document version.
    Like Lucene serving an unmerged index with liveDocs, the METADATA
    side (dft→wqt, block maxima) still counts superseded postings
    until a rewrite: bounds stay safe upper bounds and θ is exact over
    live docs (pruning exactness holds w.r.t. this wqt), but absolute
    scores drift from a from-scratch rebuild until
    ``rewrite_pages_index`` — the documented Lucene/Iceberg contract.
    ``refreshed_topk`` is the exact-scores serving path."""
    from pyspark.sql.window import Window

    spark = segments.sparkSession
    terms = query_rank_terms(query, normalize)
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    n_docs, avg_dl = index.corpus_scalars()

    from ..indexing.build import term_filter

    seq_cols = ["_seq"] if deletes is not None else []
    if deletes is not None and "_seq" not in segments.columns:
        raise ValueError(
            "deletes requires segments read with with_seq=True so the "
            "sequence-number delete rule can apply post-decode")
    seg = term_filter(segments, list(terms), term_buckets).select(
        "term", "block", "df_block", "max_tftd", "min_doc_length",
        "docids_vb", "tftds_vb", "pos_lens_vb", "positions_vb",
        "doc_lengths_vb", *seq_cols,
    )

    # term-level dft = Σ blocks df_block — a ≤|terms|-row metadata
    # aggregate, collected once (the Spark analogue of the reference's
    # SQLite vocabulary seek). Keeping wqt as a driver literal keeps the
    # main query plan shallow: otherwise the dft subtree is recomputed
    # inside all three consumers (block UBs, champion scores, survivor
    # scores) within the single action.
    wq = _query_weights(spark, seg, terms, n_docs)
    if wq is None:
        return spark.createDataFrame([], "doc_id long, score double")

    # 1. per-block upper bounds from metadata only
    block_ub = (
        seg.join(F.broadcast(wq), "term")
        .withColumn(
            "ub_t",
            F.col("wqt")
            * bm25_wdt_expr(F.col("max_tftd"), F.col("min_doc_length"), avg_dl),
        )
        .groupBy("block")
        .agg(F.sum("ub_t").alias("ub"), F.sum("df_block").alias("docs_in_block"))
    )

    # 2. champion prefix: top-C blocks by UB (per-partition heaps), then
    # keep the UB-desc prefix whose cumulative doc count first reaches k
    # (window over ≤C rows — single tiny partition by construction)
    topc = block_ub.orderBy(F.desc("ub")).limit(max(champion_blocks, 1))
    # Global (partition-less) window — DELIBERATE, not a scale bug:
    # its input is the limit(C) above, so it sees at most
    # ``champion_blocks`` rows (single digits) regardless of corpus
    # size. Spark still logs a WindowExec single-partition warning
    # because the bound isn't visible to the planner; a literal
    # partition key would silence it but obscure that the prefix scan
    # is ordered across ALL champion blocks by construction.
    w = Window.orderBy(F.desc("ub"), F.asc("block")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    champs = (
        topc.withColumn("cum_docs", F.sum("docs_in_block").over(w))
        .filter(F.col("cum_docs") - F.col("docs_in_block") < k)
        .select("block")
    )

    def exact_scores(seg_subset: DataFrame) -> DataFrame:
        # doc_length decodes from the segment itself (doc_lengths_vb):
        # NO doc_stats join — at 10^12 docs that join would shuffle a
        # corpus-sized table per query.
        postings = decode_postings(seg_subset, list(terms),
                                   term_buckets=None, with_positions=False,
                                   passthrough=tuple(seq_cols))
        postings = _apply_deletes(postings, deletes)
        return (
            postings.join(F.broadcast(wq), "term")
            .withColumn(
                "contrib",
                F.col("wqt")
                * bm25_wdt_expr(F.col("tftd"), F.col("doc_length").cast("double"),
                                avg_dl),
            )
            .groupBy("doc_id")
            .agg(F.sum("contrib").alias("score"))
        )

    # 3. θ = k-th best exact score among champion docs, −∞ when the
    # champions cover < k docs — a 1-row aggregate, broadcast into the
    # pruning filter instead of collected to the driver
    champ_scores = exact_scores(seg.join(F.broadcast(champs), "block"))
    theta_df = (
        champ_scores.orderBy(F.desc("score"), F.desc("doc_id"))
        .limit(k)
        .agg(
            F.when(F.count("*") >= k, F.min("score"))
            .otherwise(F.lit(float("-inf")))
            .alias("theta")
        )
    )

    # 4. prune blocks whose UB < θ, score survivors exactly
    keep_blocks = (
        block_ub.join(F.broadcast(theta_df))
        .filter(F.col("ub") >= F.col("theta"))
        .select("block")
    )
    survivors = seg.join(F.broadcast(keep_blocks), "block")
    final = exact_scores(survivors)
    return final.orderBy(F.desc("score"), F.desc("doc_id")).limit(k)


def _apply_deletes(postings: DataFrame,
                   deletes: DataFrame | None) -> DataFrame:
    """Sequence-number delete rule on decoded postings: drop a row when
    the doc has a delete with seq GREATER than the row's file seq (a
    re-add in the delete's own commit survives). ``deletes`` is
    delta-sized → broadcast; no-op when None."""
    if deletes is None:
        return postings
    return (
        postings.join(F.broadcast(deletes), "doc_id", "left")
        .filter(F.col("_del_seq").isNull()
                | (F.col("_del_seq") <= F.col("_seq")))
        .drop("_del_seq", "_seq")
    )


def _query_weights(spark, seg: DataFrame, terms: dict[str, int],
                   n_docs: float):
    """Per-term BM25 query weights as a ≤|terms|-row broadcastable
    frame (term, wqt×multiplicity), dft summed from segment block
    metadata.  Returns None when no query term exists in the index."""
    import math

    dft_rows = (
        seg.groupBy("term").agg(F.sum("df_block").alias("dft")).collect()
    )
    wq_rows = []
    for r in dft_rows:
        dft = float(r["dft"])
        num = n_docs - dft + 0.5
        # num ≤ 0 only when dft overcounts live docs — segment metadata
        # over a merge-on-read snapshot still counts superseded
        # postings (the documented Lucene drift contract). The
        # reference's 0.1 floor (ranked_strategy.py) already flattens
        # every ratio ≤ e^0.1, so the clamp changes nothing on clean
        # indexes.
        wqt = 0.1 if num <= 0 else \
            max(0.1, math.log(num / (dft + 0.5)))
        wq_rows.append((r["term"], wqt * terms[r["term"]]))
    if not wq_rows:
        return None
    return spark.createDataFrame(wq_rows, "term string, wqt double")


def decode_topk(
    index,
    segments: DataFrame,
    query: str,
    k: int = 10,
    normalize=None,
    term_buckets: int | None = None,
) -> DataFrame:
    """BM25 top-k by decoding the query terms' full posting blocks —
    the non-pruned baseline ``wand_topk`` must beat at decode-bound
    scale, and the better serving path when the matched posting lists
    are short (WAND's metadata pass then costs more than it saves).
    Same tie-break and scoring as wand_topk; identical results by
    construction (asserted per-trial by the crossover bench)."""
    from ..indexing.build import term_filter
    from ..indexing.segments import decode_postings

    spark = segments.sparkSession
    terms = query_rank_terms(query, normalize)
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    n_docs, avg_dl = index.corpus_scalars()
    seg = term_filter(segments, list(terms), term_buckets)
    wq = _query_weights(spark, seg, terms, n_docs)
    if wq is None:
        return spark.createDataFrame([], "doc_id long, score double")
    postings = decode_postings(seg, list(terms), term_buckets=None,
                               with_positions=False)
    return (
        postings.join(F.broadcast(wq), "term")
        .withColumn(
            "contrib",
            F.col("wqt")
            * bm25_wdt_expr(F.col("tftd"),
                            F.col("doc_length").cast("double"), avg_dl),
        )
        .groupBy("doc_id")
        .agg(F.sum("contrib").alias("score"))
        .orderBy(F.desc("score"), F.desc("doc_id"))
        .limit(k)
    )
