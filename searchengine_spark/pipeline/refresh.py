"""O(delta) refresh of a published index from a versioned pages table —
the closed crawl-refresh loop the north rule's Iceberg framing implies:

    pages SnapshotTable (url, warc_ts, html, text, lang)
        v_k ──append crawl batch──▶ v_{k+1}
                    │ read_appends(v_k, v_{k+1})   (incremental scan,
                    ▼                               manifests only)
    analyze ONLY the delta (url-hash doc_ids, streaming/ingest's
    analyzer — batch and streamed indexes agree on doc identity)
                    │
                    ▼
    index SnapshotTable: commit(delta segments, deletes=delta doc_ids)
        — an Iceberg-v2 row-delta commit: the 10^12-doc base segment
        files are NEVER rewritten; re-crawled urls are superseded by
        an equality-delete file interpreted at decode time (the
        sequence-number rule keeps the delta's own rows).

Contrast with the two existing maintenance paths:

* ``indexing/segments.merge_segments`` (copy-on-write): rewrites the
  delta-touched (term, block) groups and republishes — bounded work,
  but the whole segment set is written back per merge.  Right when
  merges are infrequent and reads dominate.
* ``streaming/ingest.start_segment_maintenance``: merge_segments per
  micro-batch with directory versioning — right for a continuous
  drip.
* THIS module (merge-on-read): a refresh writes ONLY delta-sized
  files (new segment rows + a delete file); readers reconcile.  Right
  when refreshes are frequent relative to full rewrites — Iceberg v2
  / Lucene-liveDocs economics.  ``rewrite_pages_index`` is the major
  compaction that folds the accumulated layers back into a clean
  base.

Serving exactness contract (tested in tests/test_refresh.py):

* ``refreshed_topk`` / ``refreshed_boolean`` — EXACT: identical rows,
  scores and quirks to a from-scratch build over the latest crawl
  state (dft is counted from live decoded postings; n_docs/avg_dl
  come from the docstats companion table, which applies its deletes
  generically).
* ``queries/wand.wand_topk(deletes=…)`` — live docs only, exact
  pruning, but wqt/bounds count superseded postings until the next
  rewrite (the Lucene unmerged-index contract); after
  ``rewrite_pages_index`` it is score-identical to a scratch build.

Reference tie-in: the reference's only refresh is the REPL's full
``:index <dir>`` rebuild (/root/reference/main.py:261-392); this is
the at-scale replacement, with the reference's analyzer, ranking and
tie-breaks preserved end to end.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..indexing.segments import (
    biword_as_segments,
    build_segments,
    decode_postings,
    hash_block_span,
)
from ..sources.snapshots import SnapshotTable
from ..streaming.ingest import analyze_pages

# Companion table (same root, its own snapshot lineage): (doc_id, url,
# doc_length) per live doc. Its deletes ARE on a table column, so the
# generic snapshot read reconciles it — one 3-column scan gives exact
# corpus scalars per refresh, and url→doc_id identity for consumers.
_DOCSTATS = "docstats"


def _docstats_table(index_root: str) -> SnapshotTable:
    return SnapshotTable(os.path.join(index_root, _DOCSTATS))


def _delta_artifacts(analyzed: DataFrame, term_buckets: int,
                     block_span: int
                     ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(segment rows incl. biword family + bucket, docstats rows,
    persisted encode handle) for an analyzed pages batch.  Callers
    must ``unpersist()`` the third frame once the commit lands."""
    postings = analyzed.select(
        "doc_id",
        F.col("doc_length").cast("int").alias("doc_length"),
        F.explode("postings").alias("tp"),
    ).select(
        F.col("tp.term").alias("term"),
        "doc_id",
        F.size("tp.positions").cast("int").alias("tftd"),
        F.col("tp.positions").alias("positions"),
        "doc_length",
    )
    seg = build_segments(postings, doc_stats=None, block_span=block_span)
    biword = analyzed.select(
        "doc_id", F.explode("biwords").alias("term")
    ).select("term", "doc_id")
    seg = seg.unionByName(
        biword_as_segments(biword, block_span=block_span))
    seg = seg.withColumn(
        "bucket",
        F.pmod(F.crc32(F.col("term").cast("binary")),
               F.lit(term_buckets)).cast("int"),
    )
    # Range-cluster by bucket so per-file stats stay selective and the
    # serving read plans files away (publish_segments does the same).
    # persist first: repartitionByRange SAMPLES its input to place the
    # range boundaries, which would run the VB-encode subtree twice
    # (sample pass + real shuffle — measured 2x encode wall per
    # commit). Caching the already-encoded rows makes it one encode;
    # the cached frame is compressed segments, far smaller than the
    # exploded postings.
    encoded = seg.persist()
    seg = encoded.repartitionByRange("bucket")
    stats = analyzed.select(
        "doc_id", "url", F.col("doc_length").cast("double").alias(
            "doc_length"))
    return seg, stats, encoded


def _scalar_props(spark: SparkSession, index_root: str) -> dict:
    row = (
        _docstats_table(index_root).read(spark)
        .agg(F.count("*").alias("n"), F.avg("doc_length").alias("avg"))
        .collect()[0]
    )
    return {"n_docs": int(row["n"]), "avg_doc_length": float(row["avg"])}


def build_pages_index(
    spark: SparkSession,
    pages_root: str,
    index_root: str,
    term_buckets: int = 64,
    block_span: int | None = None,
    pages_version: int | None = None,
) -> int:
    """Initial full build: the pages table's current (or pinned)
    version → segments + biword + docstats, published as version 0 of
    the index table with ``pages_version`` recorded — the watermark
    every later ``refresh_pages_index`` resumes from.  doc_id =
    url-hash (streaming/ingest.py's scheme): dense ranks would
    renumber the corpus on every crawl batch.  ``block_span`` defaults
    to :func:`hash_block_span` of the corpus size (~512 docs/block in
    hash-id space); refresh/merge/rewrite reuse the recorded span."""
    pages = SnapshotTable(pages_root)
    if pages_version is None:
        pages_version = pages.current_version()
    # persist: three downstream actions consume the analyzed frame (the
    # docstats commit, and the postings + biword branches of the index
    # commit) — without it the Arrow analyzer (the expensive stage) and
    # the latest_per_url shuffle re-run once per action (measured 3x
    # build wall at 400k docs). Spills to disk when it outgrows memory;
    # at cluster scale the checkpointed pipeline stages to storage
    # instead.
    # analyze_pages applies latest_per_url itself — no outer call, or
    # the url window shuffle+sort runs twice.
    analyzed = analyze_pages(
        pages.read(spark, version=pages_version)).persist()
    encoded = None
    try:
        if block_span is None:
            block_span = hash_block_span(analyzed.count())
        seg, stats, encoded = _delta_artifacts(analyzed, term_buckets,
                                               block_span)
        _docstats_table(index_root).commit(stats, mode="overwrite",
                                           note=f"pages v{pages_version}")
        props = {
            "term_buckets": term_buckets,
            "block_span": block_span,
            "biword": True,
            "pages_version": pages_version,
            **_scalar_props(spark, index_root),
        }
        return SnapshotTable(index_root).commit(
            seg, mode="overwrite",
            note=f"full build of pages v{pages_version}",
            properties=props)
    finally:
        if encoded is not None:
            encoded.unpersist()
        analyzed.unpersist()


def refresh_pages_index(
    spark: SparkSession,
    pages_root: str,
    index_root: str,
    pages_version: int | None = None,
) -> int:
    """Fold the pages table's appends since the last indexed version
    into the published index — one row-delta commit, work and bytes
    written both O(delta):

    * incremental scan of the new crawl rows (manifests only),
    * analyze + encode ONLY those rows,
    * equality-delete the delta's doc_ids (supersede-by-identity: a
      re-crawled url replaces its old postings; a brand-new url's
      delete matches nothing), re-add in the same commit — the
      sequence-number rule keeps the new rows,
    * docstats companion gets the same delta + deletes, then the
      refreshed corpus scalars are re-aggregated from it (one tiny
      3-column scan) into the index table's properties.

    Returns the new index version (or the current one when the pages
    table hasn't moved)."""
    pages = SnapshotTable(pages_root)
    index = SnapshotTable(index_root)
    props = index.properties()
    from_v = props["pages_version"]
    if pages_version is None:
        pages_version = pages.current_version()
    if pages_version == from_v:
        return index.current_version()

    delta = pages.read_appends(spark, from_v, pages_version)
    # persist: five actions consume the analyzed delta (docstats rows +
    # deletes, index postings/biword branches + deletes) — same
    # recompute hazard as build_pages_index, delta-sized here.
    # (analyze_pages applies latest_per_url itself.)
    analyzed = analyze_pages(delta).persist()
    encoded = None
    try:
        seg, stats, encoded = _delta_artifacts(
            analyzed, props["term_buckets"], props["block_span"])
        # Delete rows are 8 bytes each; left at the analyzer's
        # partitioning they fan out into per-partition near-empty files
        # (measured: 33 files for 36 rows) that every merge-on-read
        # scan must open. Coalesce to a few writer tasks — even a
        # 10^9-doc delta is ~1 GB/file at 8.
        ids = analyzed.select("doc_id").coalesce(8)
        _docstats_table(index_root).commit(
            stats, deletes=ids, equality_columns=["doc_id"],
            note=f"refresh to pages v{pages_version}")
        new_props = {"pages_version": pages_version,
                     **_scalar_props(spark, index_root)}
        return index.commit(
            seg, deletes=ids, equality_columns=["doc_id"],
            note=f"delta refresh pages v{from_v}->v{pages_version}",
            properties=new_props)
    finally:
        if encoded is not None:
            encoded.unpersist()
        analyzed.unpersist()


def published_deletes(spark: SparkSession, index_root: str,
                      version: int | None = None) -> DataFrame | None:
    """(doc_id, _del_seq) — max delete seq per superseded doc, or None
    for a delete-free snapshot.  Delta-sized; consumers broadcast it."""
    dele = SnapshotTable(index_root).delete_rows(spark, version)
    if dele is None:
        return None
    return dele.groupBy("doc_id").agg(F.max("_seq").alias("_del_seq"))


def published_postings(
    spark: SparkSession,
    index_root: str,
    terms: list[str] | None,
    version: int | None = None,
    with_positions: bool = True,
) -> DataFrame:
    """Live decoded postings for a term set from a refreshed snapshot —
    bucket-pruned file planning, then the sequence-number delete rule
    post-decode (the index-table analogue of the snapshot layer's
    generic merge-on-read read)."""
    from ..indexing.build import term_bucket, term_filter
    from ..queries.wand import _apply_deletes

    tbl = SnapshotTable(index_root)
    props = tbl.properties(version)
    tb = props.get("term_buckets")
    preds = None
    if terms and tb:
        buckets = sorted({term_bucket(t, tb) for t in terms})
        preds = [("bucket", "in", buckets)]
    dele = published_deletes(spark, index_root, version)
    seg = tbl.read(spark, version=version, predicates=preds,
                   apply_deletes=False, with_seq=dele is not None)
    if terms is not None:
        seg = term_filter(seg, terms, tb)
    postings = decode_postings(
        seg, terms=None, with_positions=with_positions,
        passthrough=("_seq",) if dele is not None else ())
    return _apply_deletes(postings, dele)


def refreshed_topk(
    spark: SparkSession,
    index_root: str,
    query: str,
    k: int = 10,
    normalize=None,
    version: int | None = None,
) -> DataFrame:
    """Exact BM25 top-k from a refreshed snapshot: identical scores,
    rows and tie-breaks to a from-scratch index of the latest crawl
    state.  dft counts LIVE postings (a per-term count over the decoded
    frame — the decode is already paid; this is what upgrades the
    Lucene drift contract to exactness), corpus scalars come from the
    snapshot's properties (maintained from the docstats companion at
    refresh time).  One job: decode → dft → wqt join → score →
    TakeOrderedAndProject."""
    from ..queries.ranked import query_rank_terms
    from ..queries.wand import bm25_wdt_expr

    terms = query_rank_terms(query, normalize)
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    props = SnapshotTable(index_root).properties(version)
    n_docs, avg_dl = float(props["n_docs"]), float(props["avg_doc_length"])

    postings = published_postings(spark, index_root, sorted(terms),
                                  version=version, with_positions=False)
    # Materialize the pruned, delete-reconciled decode ONCE — the plan
    # audit (tools/explain_audit.py, PERF.md) showed it running twice:
    # the exact-dft aggregate and the scoring join each re-ran the
    # bucket scan + VB decode. The frame is bounded by the query
    # terms' posting lists, so an executor-local checkpoint is cheap,
    # and the dft aggregate stays a partial agg over the checkpointed
    # partitions (head-term skew handling unchanged). localCheckpoint
    # trades fault re-compute for latency — the right side of the
    # trade for a per-query serving path.
    postings = postings.localCheckpoint(eager=True)
    mult = F.create_map(
        *[F.lit(x) for kv in terms.items() for x in kv])
    wq = (
        postings.groupBy("term")
        .agg(F.count("*").cast("double").alias("dft"))
        .withColumn(
            "wqt",
            F.greatest(
                F.lit(0.1),
                F.log((F.lit(n_docs) - F.col("dft") + 0.5)
                      / (F.col("dft") + 0.5))) * mult[F.col("term")])
        .select("term", "wqt")
    )
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


def refreshed_topk_batch(
    spark: SparkSession,
    index_root: str,
    queries: dict[str, str],
    k: int = 10,
    normalize=None,
    version: int | None = None,
) -> DataFrame:
    """Query-log replay over a refreshed (merge-on-read) snapshot: ALL
    queries in ONE job — the path a serving fleet actually reads a
    delta-layered index through, and therefore the shape the serving
    tax must be measured on (a per-query loop re-pays file planning +
    delete reconciliation per query; the batch pays them once).

    Returns (query_id, doc_id, score, rank), rank 1..k per query,
    per-query rows identical to :func:`refreshed_topk` (same live-dft
    exactness rule — dft counts live postings after the delete
    reconcile).

    Scale shape: one bucket-pruned decode of the UNION of all query
    terms (delta layers + base, deletes applied once), localCheckpoint,
    per-term dft aggregate, broadcast (query_id, term, mult) fan-out,
    ONE partial-agg shuffle on (query_id, doc_id), per-query window
    top-k — the merge-on-read twin of queries.ranked.rank_topk_batch.
    """
    from pyspark.sql.window import Window

    from ..queries.ranked import query_rank_terms
    from ..queries.wand import bm25_wdt_expr

    qt_rows = [
        (qid, t, float(m))
        for qid, q in queries.items()
        for t, m in query_rank_terms(q, normalize).items()
    ]
    if not qt_rows:
        return spark.createDataFrame(
            [], "query_id string, doc_id long, score double, rank int")
    props = SnapshotTable(index_root).properties(version)
    n_docs, avg_dl = float(props["n_docs"]), float(props["avg_doc_length"])
    qt = spark.createDataFrame(
        qt_rows, "query_id string, term string, mult double")
    terms = sorted({t for _, t, _ in qt_rows})

    postings = published_postings(spark, index_root, terms,
                                  version=version, with_positions=False)
    # one materialization of the pruned, delete-reconciled decode — the
    # dft aggregate and the scoring join both read it (same rationale
    # as refreshed_topk, amortized over the whole query log here)
    postings = postings.localCheckpoint(eager=True)
    wq = (
        postings.groupBy("term")
        .agg(F.count("*").cast("double").alias("dft"))
        .withColumn(
            "wqt",
            F.greatest(
                F.lit(0.1),
                F.log((F.lit(n_docs) - F.col("dft") + 0.5)
                      / (F.col("dft") + 0.5))))
        .select("term", "wqt")
    )
    scored = (
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
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.desc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def refreshed_boolean(
    spark: SparkSession,
    index_root: str,
    query: str,
    version: int | None = None,
    normalize=None,
) -> DataFrame:
    """Boolean/phrase/NEAR serving from a refreshed snapshot — the
    merge-on-read twin of queries/serve.boolean_from_published: same
    parse-once term planning, same biword fast-path routing, same
    compiled engine; the only difference is the delete reconciliation
    between decode and evaluation."""
    from ..indexing.build import SparkIndex
    from ..queries.engine import boolean_query, boolean_query_term
    from ..queries.parser import parse_boolean_query
    from ..queries.serve import lookup_terms

    normalize = normalize or boolean_query_term
    node = parse_boolean_query(query)
    if node is None:
        return spark.createDataFrame([], "doc_id long")
    props = SnapshotTable(index_root).properties(version)
    terms = lookup_terms(node, normalize)
    if node.kind == "phrase" and len(node.term.split(" ")) == 2:
        if not props.get("biword"):
            raise KeyError(
                "two-term phrase queries use the biword fast path, but "
                "this snapshot was published without the biword family")
        t1, t2 = node.term.split(" ")
        terms = {normalize(t1) + " " + normalize(t2)}

    postings = published_postings(spark, index_root, sorted(terms),
                                  version=version, with_positions=True)
    idx = SparkIndex(
        postings=postings.filter(~F.col("term").contains(" ")),
        doc_stats=None,
        corpus_stats=None,
        biword=postings.filter(F.col("term").contains(" "))
        .select("term", "doc_id"),
        term_buckets=None,
    )
    return boolean_query(idx, query, normalize)


def refreshed_wand_topk(
    spark: SparkSession,
    index_root: str,
    query: str,
    k: int = 10,
    normalize=None,
    version: int | None = None,
    champion_blocks: int = 8,
) -> DataFrame:
    """Block-max WAND from a refreshed snapshot (bucket-pruned read +
    the sequence-number delete rule inside the exact-score passes).
    Serves live docs only with exact pruning; absolute scores follow
    the Lucene unmerged-index contract until ``rewrite_pages_index``
    (see queries/wand.wand_topk's deletes note)."""
    from ..indexing.build import term_bucket
    from ..queries.ranked import query_rank_terms
    from ..queries.wand import wand_topk
    from .index_pipeline import PublishedScalars

    tbl = SnapshotTable(index_root)
    props = tbl.properties(version)
    tb = props.get("term_buckets")
    terms = query_rank_terms(query, normalize)
    preds = None
    if terms and tb:
        buckets = sorted({term_bucket(t, tb) for t in terms})
        preds = [("bucket", "in", buckets)]
    dele = published_deletes(spark, index_root, version)
    seg = tbl.read(spark, version=version, predicates=preds,
                   apply_deletes=False, with_seq=dele is not None)
    scalars = PublishedScalars(float(props["n_docs"]),
                               float(props["avg_doc_length"]))
    return wand_topk(scalars, seg, query, k=k, normalize=normalize,
                     term_buckets=tb, champion_blocks=champion_blocks,
                     deletes=dele)


def maintenance_stats(index_root: str) -> dict:
    """Metadata-only accounting of the merge-on-read debt a refreshed
    index has accumulated since its last base (overwrite) snapshot —
    read from the current manifest alone, no Spark job, no data scan
    (the way Iceberg's maintenance procedures budget a rewrite from
    manifest row counts, not matched-delete counts):

    * ``delta_commits`` — distinct append seqs layered on the base;
      every one is an extra delete layer the read side reconciles.
    * ``delete_rows`` — rows across all live equality-delete files.
      An UPPER bound on superseded docs: each refresh deletes its
      whole delta's doc_ids, and a brand-new url's delete matches
      nothing.
    * ``delete_ratio`` — delete_rows / live docs (properties n_docs).
    * ``data_files`` / ``delete_files`` — live file counts (small-file
      pressure from many delta commits shows up here).
    """
    tbl = SnapshotTable(index_root)
    man = tbl.manifest(tbl.current_version())
    seqs = sorted({f["seq"] for f in man["data_files"]})
    delete_rows = sum(f["rows"] for f in man.get("delete_files", []))
    n_docs = int(man.get("properties", {}).get("n_docs", 0))
    return {
        "version": man["version"],
        "delta_commits": max(0, len(seqs) - 1),
        "data_files": len(man["data_files"]),
        "delete_files": len(man.get("delete_files", [])),
        "delete_rows": delete_rows,
        "live_docs": n_docs,
        "delete_ratio": delete_rows / n_docs if n_docs else 0.0,
    }


def maybe_rewrite_pages_index(
    spark: SparkSession,
    index_root: str,
    max_delete_ratio: float = 0.2,
    max_delta_commits: int = 8,
) -> tuple[bool, int, dict]:
    """Run the major compaction only when the accumulated
    merge-on-read debt crosses a threshold — the maintenance policy a
    scheduled crawl-refresh job calls after every refresh (Iceberg's
    rewrite_data_files-on-delete-ratio economics: a rewrite costs a
    full live-postings pass, so it must be amortized over many O(delta)
    refreshes).  Thresholds are metadata-only (``maintenance_stats``);
    defaults compact when superseded-or-new doc deletes exceed 20% of
    live docs or more than 8 delta layers have stacked up — past
    either, per-read reconcile work (delete broadcast + seq filter per
    layer) and WAND's stale-bound slack stop being cheap.

    Returns ``(compacted, current_version, stats_before)``.
    """
    stats = maintenance_stats(index_root)
    if (stats["delete_ratio"] > max_delete_ratio
            or stats["delta_commits"] > max_delta_commits):
        return True, rewrite_pages_index(spark, index_root), stats
    return False, stats["version"], stats


def rewrite_pages_index(spark: SparkSession, index_root: str,
                        block_span: int | None = None) -> int:
    """Major compaction of a refreshed index (Lucene forceMerge /
    Iceberg rewrite): decode the live postings (deletes applied),
    rebuild clean segments, publish as an overwrite snapshot — after
    which WAND metadata is exact again and reads are single-layer.
    The docstats companion is rewritten with the generic
    ``rewrite_deletes``.  Readers pinned to pre-rewrite versions keep
    the merge-on-read view (time travel is unaffected)."""
    index = SnapshotTable(index_root)
    props = index.properties()
    if block_span is None:
        # Re-derive the span for the corpus the table holds NOW — the
        # one moment re-blocking is free (everything is decoded and
        # re-encoded anyway). Properties carry the new span forward.
        block_span = hash_block_span(int(props["n_docs"]))
    live = published_postings(spark, index_root, terms=None,
                              with_positions=True)
    # persist before the range shuffle: its boundary-sampling pass
    # would otherwise run the decode→re-encode subtree (the whole cost
    # of a compaction) twice — see _delta_artifacts.
    encoded = build_segments(live, doc_stats=None,
                             block_span=block_span).withColumn(
        "bucket",
        F.pmod(F.crc32(F.col("term").cast("binary")),
               F.lit(props["term_buckets"])).cast("int"),
    ).persist()
    try:
        seg = encoded.repartitionByRange("bucket")
        _docstats_table(index_root).rewrite_deletes(spark)
        new_props = {**_scalar_props(spark, index_root),
                     "block_span": block_span,
                     "pages_version": props["pages_version"]}
        return index.commit(
            seg, mode="overwrite",
            note="rewrite (major compaction) at pages "
                 f"v{props['pages_version']}",
            properties=new_props)
    finally:
        encoded.unpersist()
