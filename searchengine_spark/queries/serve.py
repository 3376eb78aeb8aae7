"""Serve the reference's FULL query surface from a published index
snapshot — the boolean half of the serving path (the ranked half is
queries/wand.wand_topk / decode_topk over the same table, wired in
scripts/submit_query_job.py).

The reference's disk-index driver answers boolean AND/OR/NOT, phrase
(with the two-term biword fast path, /root/reference/main.py:413-418)
and NEAR/k queries from its written index. This module answers the same
grammar from a ``publish_segments`` snapshot:

* parse the query ONCE driver-side to collect the normalized lookup
  terms (plus the biword key when the whole query is a two-term
  phrase — the only case the reference routes to the biword index),
* plan a bucket-pruned file read from the snapshot manifest
  (``read_published_segments``) — at 10^12 docs a 3-term boolean query
  opens 3 buckets' worth of data files, not the table,
* decode ONLY those terms' postings (positions included — phrase/NEAR
  need them) and hand the decoded frame to the SAME compiled engine
  (queries/engine.boolean_query), so served results are definitionally
  the in-memory engine's results, quirks and all.

Biword rows live in the same table under their space-containing keys
(pipeline/index_pipeline.publish_segments(biword=...)); the ``biword``
table property tells the reader whether the fast path is available.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..indexing.build import SparkIndex
from ..indexing.segments import decode_postings
from .engine import boolean_query, boolean_query_term
from .parser import Node, parse_boolean_query
from .ranked import query_rank_terms


def lookup_terms(node: Node, normalize) -> set[str]:
    """Every normalized index term a query's evaluation will look up."""
    if node.kind == "term":
        return {normalize(node.term)}
    if node.kind == "phrase":
        return {normalize(w) for w in node.term.split(" ")}
    out: set[str] = set()
    for child in node.children:
        out |= lookup_terms(child, normalize)
    return out


def boolean_from_published(
    spark: SparkSession,
    table_root: str,
    query: str,
    version: int | None = None,
    tag: str | None = None,
    normalize=None,
) -> DataFrame:
    """Answer a boolean/phrase/NEAR query from a published snapshot;
    returns DataFrame(doc_id) in the canonical sorted order, identical
    to ``boolean_query`` over the index the snapshot was built from.

    Two-term-phrase queries require the snapshot to carry the biword
    family (``publish_segments(biword=index.biword, ...)``): the fast
    path is a different index lookup with its own semantics (clean
    adjacency, vs the positional merge's reference quirks), so silently
    substituting one for the other would change results. A snapshot
    without it raises with the republish instruction.
    """
    from ..pipeline.index_pipeline import read_published_segments
    from ..sources.snapshots import SnapshotTable

    normalize = normalize or boolean_query_term
    node = parse_boolean_query(query)
    if node is None:
        return spark.createDataFrame([], "doc_id long")

    props = SnapshotTable(table_root).properties(
        version if tag is None else SnapshotTable(table_root).tags()[tag])
    term_buckets = props.get("term_buckets")

    terms = lookup_terms(node, normalize)
    if node.kind == "phrase" and len(node.term.split(" ")) == 2:
        if not props.get("biword"):
            raise KeyError(
                "two-term phrase queries use the biword fast path, but "
                "this snapshot was published without the biword family — "
                "republish with publish_segments(..., biword=index.biword)")
        t1, t2 = node.term.split(" ")
        # The fast path reads ONLY the biword key's postings.
        terms = {normalize(t1) + " " + normalize(t2)}

    seg = read_published_segments(spark, table_root, terms=sorted(terms),
                                  version=version, tag=tag)
    postings = decode_postings(seg, terms=sorted(terms),
                               term_buckets=term_buckets)
    idx = SparkIndex(
        postings=postings.filter(~F.col("term").contains(" ")),
        doc_stats=None,
        corpus_stats=None,
        biword=postings.filter(F.col("term").contains(" "))
        .select("term", "doc_id"),
        term_buckets=None,  # already decoded + term-filtered
    )
    return boolean_query(idx, query, normalize)


def ranked_batch_from_published(
    spark: SparkSession,
    table_root: str,
    queries: dict[str, str],
    k: int = 10,
    normalize=None,
    version: int | None = None,
    tag: str | None = None,
) -> DataFrame:
    """Batch BM25 serving from a published snapshot — the query-log
    replay path (queries/ranked.rank_topk_batch) re-expressed over the
    snapshot table. Returns DataFrame(query_id, doc_id, score, rank),
    per-query identical to ``decode_topk``/``wand_topk`` over the same
    snapshot (same weights, same reference tie-break: score desc,
    doc_id desc — /root/reference/main.py:463-467).

    Scale shape (one Spark job for the whole batch):

    * ONE bucket-pruned manifest read covering the UNION of every
      query's terms (|union| crc32 calls driver-side; at 10^12 docs a
      100-query batch opens ~100 buckets' files, not the table),
    * ONE positionless decode of those terms' posting blocks,
    * per-term dft/wqt from segment block metadata — computed
      DataFrame-side and broadcast (no driver collect; the batch path
      never touches the driver with anything corpus-sized),
    * a broadcast (query_id, term, multiplicity) fan-out, one
      partial-agged (query_id, doc_id) shuffle, then a per-query
      window top-k (parallel across queries; no global sort).
    """
    from ..indexing.build import term_filter
    from ..pipeline.index_pipeline import (queryable_published,
                                           read_published_segments)
    from ..sources.snapshots import SnapshotTable
    from .wand import bm25_wdt_expr

    out_schema = "query_id string, doc_id long, score double, rank int"
    if tag is not None:
        version = SnapshotTable(table_root).tags()[tag]
    scalars, term_buckets = queryable_published(spark, table_root, version)
    n_docs, avg_dl = scalars.corpus_scalars()

    qt_rows = [
        (qid, t, float(m))
        for qid, q in queries.items()
        for t, m in query_rank_terms(q, normalize).items()
    ]
    if not qt_rows:
        return spark.createDataFrame([], out_schema)
    qt = spark.createDataFrame(
        qt_rows, "query_id string, term string, mult double")
    terms = sorted({t for _, t, _ in qt_rows})

    seg = term_filter(
        read_published_segments(spark, table_root, terms=terms,
                                version=version),
        terms, term_buckets)
    # dft from block metadata alone (no decode), wqt as an expression —
    # ≤|union terms| rows, broadcast to the scorer.
    dft = seg.groupBy("term").agg(
        F.sum("df_block").cast("double").alias("dft"))
    wq = dft.withColumn(
        "wqt",
        F.greatest(F.lit(0.1),
                   F.log((F.lit(float(n_docs)) - F.col("dft") + 0.5)
                         / (F.col("dft") + 0.5))),
    ).select("term", "wqt")

    postings = decode_postings(seg, terms, term_buckets=None,
                               with_positions=False)
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.desc("doc_id"))
    return (
        postings.join(F.broadcast(wq), "term")
        .join(F.broadcast(qt), "term")
        .withColumn(
            "contrib",
            F.col("wqt") * F.col("mult")
            * bm25_wdt_expr(F.col("tftd"),
                            F.col("doc_length").cast("double"), avg_dl),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("contrib").alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
