"""Structured-Streaming ingestion tests: incremental index == batch
index over the same pages; re-crawl upserts; watermarked stats."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from searchengine_spark.corpus import PAGES_SCHEMA, make_page


def _write_pages(spark, path, ids, seed=42, mutate=None):
    rows = []
    for i in ids:
        p = make_page(i, seed)
        if mutate:
            p = mutate(p)
        rows.append(p)
    spark.createDataFrame(rows, PAGES_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_incremental_matches_batch(spark, tmp_path):
    from searchengine_spark.indexing.build import build_index
    from searchengine_spark.streaming.ingest import (
        compact_index,
        start_incremental_index,
    )

    inp = str(tmp_path / "in")
    root = str(tmp_path / "idx")
    _write_pages(spark, inp, range(0, 20))
    q = start_incremental_index(spark, inp, root)
    q.awaitTermination(120)
    # second drop of files → second micro-batch
    _write_pages(spark, inp, range(20, 30))
    q2 = start_incremental_index(spark, inp, root)
    q2.awaitTermination(120)

    sidx = compact_index(spark, root)

    batch_docs = spark.read.parquet(inp).select(
        F.xxhash64("url").bitwiseAND(F.lit((1 << 63) - 1)).alias("doc_id"),
        "text",
        F.octet_length("html").alias("byte_size"),
    )
    bidx = build_index(batch_docs, byte_size_col="byte_size")

    s = {(r["term"], r["doc_id"], r["tftd"], tuple(r["positions"]))
         for r in sidx.postings.collect()}
    b = {(r["term"], r["doc_id"], r["tftd"], tuple(r["positions"]))
         for r in bidx.postings.collect()}
    assert s == b and len(s) > 0
    assert sidx.doc_stats.count() == 30


def test_recrawl_last_write_wins(spark, tmp_path):
    from searchengine_spark.streaming.ingest import (
        compact_index,
        start_incremental_index,
    )

    inp = str(tmp_path / "in")
    root = str(tmp_path / "idx")
    _write_pages(spark, inp, [1, 2, 3])
    start_incremental_index(spark, inp, root).awaitTermination(120)

    # re-crawl page 2 with new content (same url → same doc_id)
    def mutate(p):
        if p["url"].endswith("page0002"):
            p = dict(p, text="fresh recrawl content only", html=b"<html><head><title>t</title></head><body>fresh recrawl content only</body></html>")
        return p

    _write_pages(spark, inp, [2], mutate=mutate)
    start_incremental_index(spark, inp, root).awaitTermination(120)

    idx = compact_index(spark, root)
    assert idx.doc_stats.count() == 3  # still 3 unique urls
    doc2 = idx.postings.filter(F.col("term") == "recrawl").collect()
    assert len(doc2) == 1  # new content indexed, old replaced


def test_ingestion_stats_watermark(spark, tmp_path):
    from searchengine_spark.streaming.ingest import ingestion_stats, stream_pages

    inp = str(tmp_path / "in")
    out = str(tmp_path / "stats")
    _write_pages(spark, inp, range(0, 12))
    stats = ingestion_stats(stream_pages(spark, inp))
    q = (
        stats.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode emits only watermark-finalized windows; with a single
    # availableNow drain the last window may be withheld — drive a
    # second batch to advance the watermark
    _write_pages(spark, inp, range(12, 24))
    q2 = (
        ingestion_stats(stream_pages(spark, inp))
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() > 0
    row = got.orderBy("window_start").collect()[0]
    assert row["n_docs"] > 0 and row["bytes"] > 0
    # pages arrive 37s apart → 1-minute windows hold 1-2 docs per lang
    assert (row["window_end"] - row["window_start"]).total_seconds() == 60


def test_stateful_sessionize_stream_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization: closed sessions emitted by
    the stream (state carried ACROSS micro-batches) must equal the
    batch-computed closed sessions for the same events."""
    import datetime as dt

    from searchengine_spark.streaming.ingest import sessionize_stream

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    # user 1: 3 sessions (gaps of 45 and 90 min); user 2: 2 sessions.
    events = [
        (1, base + dt.timedelta(minutes=m))
        for m in (0, 5, 10, 55, 60, 150)
    ] + [
        (2, base + dt.timedelta(minutes=m))
        for m in (0, 20, 29, 100)
    ]
    rows = [(i, u, t, "click", 1.0) for i, (u, t) in enumerate(events)]
    src = str(tmp_path / "events_stream")
    # two files + maxFilesPerTrigger=1 => the open-session state MUST
    # survive a micro-batch boundary for the result to come out right
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
              "event_type string, value double"
    )
    df.filter(F.col("ts") < base + dt.timedelta(minutes=58)).coalesce(1) \
        .write.parquet(f"{src}/a")
    df.filter(F.col("ts") >= base + dt.timedelta(minutes=58)).coalesce(1) \
        .write.parquet(f"{src}/b")
    import shutil

    merged = str(tmp_path / "merged")
    os.makedirs(merged)
    n = 0
    for age, sub in ((200, "a"), (100, "b")):
        for f in sorted(os.listdir(f"{src}/{sub}")):
            if f.endswith(".parquet"):
                dst = f"{merged}/{sub}_{f}"
                shutil.copy(f"{src}/{sub}/{f}", dst)
                # the file source orders micro-batches by modification
                # time — pin it so batch 'a' (earlier events) is first
                import time as _time

                now = _time.time()
                os.utime(dst, (now - age, now - age))
                n += 1
    assert n == 2

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(merged)
    )
    out_dir = str(tmp_path / "sessions_out")
    q = (
        sessionize_stream(stream, gap_minutes=30)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(out_dir).collect()
    }
    # closed sessions only (the open tail per user stays in state):
    expect = {
        (1, base, base + dt.timedelta(minutes=10), 3),
        (1, base + dt.timedelta(minutes=55), base + dt.timedelta(minutes=60), 2),
        (2, base, base + dt.timedelta(minutes=29), 3),
    }
    assert got == expect


def test_dedup_stream_matches_batch_exact_dedup(spark, tmp_path):
    """Streaming exact dedup (dropDuplicatesWithinWatermark over the
    body md5) must keep exactly the first arrival of each distinct
    text — i.e. the survivors of ops.dedup.exact_duplicates on the
    same corpus at rest with arrival-ordered doc_ids — including a
    duplicate arriving in a LATER micro-batch within the watermark."""
    import shutil
    import time as _time

    from searchengine_spark.ops.dedup import exact_duplicates
    from searchengine_spark.streaming.ingest import dedup_stream

    # batch A: originals 0..9, where page 8 is an IN-batch duplicate of
    # page 2's text; batch B (later arrivals, within the 10-minute
    # watermark — warc_ts spacing is 37 s): cross-batch duplicates of
    # pages 0/3/7 under fresh urls, plus fresh pages 13/14.
    def page(i, text_of=None):
        p = make_page(i)
        if text_of is not None:
            p = dict(p, text=make_page(text_of)["text"])
        return p

    rows_a = [page(i) for i in range(8)] + [page(8, text_of=2), page(9)]
    rows_b = [page(10, text_of=0), page(11, text_of=3), page(12, text_of=7),
              page(13), page(14)]

    src = str(tmp_path / "src")
    for sub, rows in (("a", rows_a), ("b", rows_b)):
        spark.createDataFrame(rows, PAGES_SCHEMA).coalesce(1).write.parquet(
            f"{src}/{sub}"
        )
    merged = str(tmp_path / "merged")
    os.makedirs(merged)
    for age, sub in ((200, "a"), (100, "b")):
        for f in sorted(os.listdir(f"{src}/{sub}")):
            if f.endswith(".parquet"):
                dst = f"{merged}/{sub}_{f}"
                shutil.copy(f"{src}/{sub}/{f}", dst)
                now = _time.time()
                os.utime(dst, (now - age, now - age))  # a arrives first

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(merged)
    )
    out = str(tmp_path / "deduped")
    q = (
        dedup_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got_urls = {r["url"] for r in spark.read.parquet(out).collect()}

    # batch twin: arrival order == page index (warc_ts = epoch + i*37s),
    # so exact_duplicates' min-doc_id keep policy == first arrival
    at_rest = spark.read.parquet(merged).select(
        ((F.col("warc_ts").cast("long")
          - F.lit(make_page(0)["warc_ts"]).cast("long")) / 37)
        .cast("long").alias("doc_id"),
        "url", "text",
    )
    groups = exact_duplicates(at_rest)
    losers = (
        at_rest.select(
            "doc_id", "url",
            F.md5(F.col("text").cast("binary")).alias("text_md5"))
        .join(groups, "text_md5")
        .filter(F.col("doc_id") != F.col("keep_doc_id"))
    )
    batch_urls = {
        r["url"] for r in at_rest.join(
            losers.select("doc_id"), "doc_id", "left_anti"
        ).collect()
    }

    assert got_urls == batch_urls
    # the planted duplicates (8 in-batch; 10/11/12 cross-batch) died
    dead = {make_page(i)["url"] for i in (8, 10, 11, 12)}
    assert got_urls.isdisjoint(dead)
    assert make_page(13)["url"] in got_urls and make_page(0)["url"] in got_urls
    assert len(got_urls) == 11


def test_segment_maintenance_matches_compacted_index(spark, tmp_path):
    """Streaming segment maintenance: after replaying drops that include
    a re-crawled url, the CURRENT segment version must decode to exactly
    the postings of the compacted delta index (last-write-wins), and old
    versions must be retired to the retention window."""
    import os

    from searchengine_spark.indexing.segments import decode_postings
    from searchengine_spark.streaming.ingest import (
        compact_index,
        read_current_segments,
        start_incremental_index,
        start_segment_maintenance,
    )

    inp = str(tmp_path / "in")
    seg_root = str(tmp_path / "segs")
    idx_root = str(tmp_path / "idx")

    _write_pages(spark, inp, range(0, 12))
    start_segment_maintenance(spark, inp, seg_root).awaitTermination(120)

    # drop 2: re-crawl page 3 with NEW text (same url → same doc_id,
    # old postings must vanish) + 4 fresh pages
    def mutate(p):
        if p["url"].endswith("page0003"):
            import datetime

            p = dict(p, text="fresh recrawl content only",
                     html=b"<html><body>fresh recrawl content only"
                          b"</body></html>",
                     warc_ts=p["warc_ts"] + datetime.timedelta(days=1))
        return p

    _write_pages(spark, inp, [3, 12, 13, 14, 15], mutate=mutate)
    start_segment_maintenance(spark, inp, seg_root).awaitTermination(120)

    seg, cur = read_current_segments(spark, seg_root)
    assert seg is not None and cur["version"] >= 1
    got = {
        (r["term"], r["doc_id"], r["tftd"], tuple(r["positions"]),
         r["doc_length"])
        for r in decode_postings(seg, terms=None).collect()
    }

    # batch twin: the delta-append + compact path over the same drops
    start_incremental_index(spark, inp, idx_root).awaitTermination(120)
    cidx = compact_index(spark, idx_root)
    dl = {r["doc_id"]: int(r["doc_length"])
          for r in cidx.doc_stats.collect()}
    want = {
        (r["term"], r["doc_id"], r["tftd"], tuple(r["positions"]),
         dl[r["doc_id"]])
        for r in cidx.postings.collect()
    }
    assert got == want and len(got) > 0

    # the re-crawl actually replaced content: page 3's fresh terms exist
    terms = {t for (t, *_rest) in got}
    assert "recrawl" in terms

    # retention: at most the two newest versions remain on disk
    versions = [d for d in os.listdir(seg_root)
                if d.startswith("v") and d[1:].isdigit()]
    assert len(versions) <= 2

    # the maintained set is directly QUERYABLE: block-max WAND over the
    # current version (scalars from its doc-stats sidecar) must be
    # rank-identical to unpruned BM25 over the compacted twin
    from searchengine_spark.queries.ranked import rank_topk
    from searchengine_spark.queries.wand import wand_topk
    from searchengine_spark.streaming.ingest import current_queryable

    seg_q, scalars = current_queryable(spark, seg_root)
    got_top = [
        (r["doc_id"], round(r["score"], 9))
        for r in wand_topk(scalars, seg_q, "fresh recrawl content",
                           5).collect()
    ]
    want_top = [
        (r["doc_id"], round(r["score"], 9))
        for r in rank_topk(cidx, "fresh recrawl content", "bm25",
                           5).collect()
    ]
    assert got_top == want_top and len(got_top) > 0


def test_publish_current_serves_streamed_index(spark, tmp_path):
    """streaming/ingest.publish_current bridges the maintenance loop to
    the published serving surface: after a re-crawl lands, the snapshot
    version it commits serves BM25 — single-query decode AND the
    one-job batch path — rank-and-score-identical to WAND over the
    maintained current version, with corpus scalars equal to the
    doc-stats sidecar's."""
    import datetime

    from searchengine_spark.pipeline.index_pipeline import (
        queryable_published,
        read_published_segments,
    )
    from searchengine_spark.queries.serve import ranked_batch_from_published
    from searchengine_spark.queries.wand import decode_topk, wand_topk
    from searchengine_spark.streaming.ingest import (
        current_queryable,
        publish_current,
        start_segment_maintenance,
    )

    inp = str(tmp_path / "in")
    seg_root = str(tmp_path / "segs")
    tbl_root = str(tmp_path / "tbl")

    _write_pages(spark, inp, range(0, 12))
    start_segment_maintenance(spark, inp, seg_root).awaitTermination(120)

    def mutate(p):
        if p["url"].endswith("page0003"):
            p = dict(p, text="fresh recrawl content only",
                     html=b"<html><body>fresh recrawl content only"
                          b"</body></html>",
                     warc_ts=p["warc_ts"] + datetime.timedelta(days=1))
        return p

    _write_pages(spark, inp, [3, 12, 13, 14], mutate=mutate)
    start_segment_maintenance(spark, inp, seg_root).awaitTermination(120)

    v = publish_current(spark, seg_root, tbl_root, term_buckets=8,
                        cluster_partitions=4)
    cur_seg, cur_scalars = current_queryable(spark, seg_root)
    pub_scalars, tb = queryable_published(spark, tbl_root, v)
    assert pub_scalars.corpus_scalars() == cur_scalars.corpus_scalars()
    assert tb == 8

    q = "fresh recrawl content"
    want = [(r["doc_id"], round(r["score"], 9))
            for r in wand_topk(cur_scalars, cur_seg, q, 5).collect()]
    assert want  # the re-crawled doc is findable

    pub_seg = read_published_segments(spark, tbl_root,
                                      terms=sorted(set(q.split())),
                                      version=v)
    got = [(r["doc_id"], round(r["score"], 9))
           for r in decode_topk(pub_scalars, pub_seg, q, 5,
                                term_buckets=tb).collect()]
    assert got == want

    batch = ranked_batch_from_published(
        spark, tbl_root, {"q0": q}, k=5, version=v).collect()
    got_batch = [(r.doc_id, round(r.score, 9))
                 for r in sorted(batch, key=lambda r: r.rank)]
    assert got_batch == want
