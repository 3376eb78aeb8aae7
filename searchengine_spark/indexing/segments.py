"""Compressed, block-split posting-list segments — the Spark-native
rebuild of the reference's disk index format
(/root/reference/diskindexwriter.py:58-114: per term ``VB(df)`` then per
posting ``VB(docid_gap) VB(tftd) VB(position_gaps...)``), redesigned for
10^12-doc scale:

* **Posting-list splitting**: block id = ``doc_id // block_span``.
  Fixed doc-id ranges → the (term, block) grouping key is bounded by
  ``block_span`` rows per group, so Zipf head terms ("the" in every
  doc) can never produce a straggler group — the skew handling the
  north rule requires, with no window and no salting round-trip.
  Spark's partial aggregation performs the two-stage combine.
* **Delta + VB compression** (vb.py, numpy-vectorized inside an
  Arrow-batched pandas UDF): doc-id gaps within block, per-posting
  tftds, per-posting position gaps, concatenated; ``pos_lens`` VB array
  carries the per-posting position counts so positions decode without
  consulting tftd (they are equal by construction, but storing both
  mirrors the reference format's redundancy).
* **Block-max metadata**: per (term, block) ``df_block``, ``max_tftd``
  and ``min_doc_length`` — the inputs to a BM25 score upper bound —
  feed block-max WAND pruning (queries/wand.py; Broder et al. 2003,
  Ding & Suel 2011 as surfaced in PAPERS.md).
* **Columnar position-skipping**: positions live in their own binary
  column; ranked reads project only (docids_vb, tftds_vb) — the
  columnar replacement for the reference's byte-skipping read path
  (/root/reference/indexes/diskpositionalindex.py:178-186).
* Written parquet partitioned by ``bucket = crc32(term) % n`` so a
  query's term lookups prune to a handful of partition directories
  (the Spark analogue of the SQLite term→offset B-tree,
  /root/reference/diskindexwriter.py:30-38).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .build import SparkIndex
from .vb import delta_decode, delta_encode, vb_decode, vb_encode

DEFAULT_BLOCK_SPAN = 4096

ENC_SCHEMA = T.StructType(
    [
        T.StructField("docids_vb", T.BinaryType()),
        T.StructField("tftds_vb", T.BinaryType()),
        T.StructField("pos_lens_vb", T.BinaryType()),
        T.StructField("positions_vb", T.BinaryType()),
        T.StructField("doc_lengths_vb", T.BinaryType()),
    ]
)


def _encode_batch(doc_ids: pd.Series, tftds: pd.Series,
                  positions: pd.Series, doc_lengths: pd.Series) -> pd.DataFrame:
    """Encode one Arrow batch of (term, block) posting groups. Inputs
    are arrays-per-row (already sorted by doc_id via sort_array)."""
    out = {k.name: [] for k in ENC_SCHEMA.fields}
    for dids, tfs, poss, dls in zip(doc_ids, tftds, positions, doc_lengths):
        out["docids_vb"].append(vb_encode(delta_encode(list(dids))))
        out["tftds_vb"].append(vb_encode(list(tfs)))
        out["pos_lens_vb"].append(vb_encode([len(p) for p in poss]))
        flat = []
        for p in poss:
            flat.extend(delta_encode(list(p)))
        out["positions_vb"].append(vb_encode(flat))
        out["doc_lengths_vb"].append(vb_encode([int(d) for d in dls]))
    return pd.DataFrame(out)


encode_udf = F.pandas_udf(_encode_batch, ENC_SCHEMA)


def build_segments(postings: DataFrame, doc_stats: DataFrame,
                   block_span: int = DEFAULT_BLOCK_SPAN) -> DataFrame:
    """postings(term, doc_id, tftd, positions) → compressed segments:
    (term, block, df_block, max_tftd, min_doc_length, *_vb binary).

    Per-posting doc_lengths ride INSIDE the segment (``doc_lengths_vb``)
    so ranked/WAND reads score without any doc_stats join — the segment
    is self-contained the way the reference's postings.bin +
    docWeights.bin pair is after a single seek. Uses the denormalized
    ``doc_length`` posting column when present (SparkIndex contract);
    falls back to a doc_stats join for bare postings frames."""
    if "doc_length" in postings.columns:
        with_dl = postings.select("term", "doc_id", "tftd", "positions",
                                  "doc_length")
    else:
        with_dl = postings.select("term", "doc_id", "tftd", "positions").join(
            doc_stats.select("doc_id", "doc_length"), "doc_id"
        )
    with_block = with_dl.withColumn(
        "block", (F.col("doc_id") / F.lit(block_span)).cast("long")
    )
    grouped = with_block.groupBy("term", "block").agg(
        F.count("*").cast("long").alias("df_block"),
        F.max("tftd").cast("int").alias("max_tftd"),
        F.min("doc_length").cast("double").alias("min_doc_length"),
        F.sort_array(
            F.collect_list(F.struct("doc_id", "tftd", "positions", "doc_length"))
        ).alias("ps"),
    )
    enc = grouped.withColumn(
        "enc",
        encode_udf(F.col("ps.doc_id"), F.col("ps.tftd"), F.col("ps.positions"),
                   F.col("ps.doc_length")),
    )
    return enc.select(
        "term", "block", "df_block", "max_tftd", "min_doc_length",
        F.col("enc.docids_vb").alias("docids_vb"),
        F.col("enc.tftds_vb").alias("tftds_vb"),
        F.col("enc.pos_lens_vb").alias("pos_lens_vb"),
        F.col("enc.positions_vb").alias("positions_vb"),
        F.col("enc.doc_lengths_vb").alias("doc_lengths_vb"),
    )


def write_segments(postings: DataFrame, doc_stats: DataFrame, path: str,
                   block_span: int = DEFAULT_BLOCK_SPAN,
                   term_buckets: int = 64) -> None:
    """Materialize segments parquet, bucket-partitioned by term hash
    (+ build lineage: spark partition id per row)."""
    seg = build_segments(postings, doc_stats, block_span).withColumn(
        "bucket",
        F.pmod(F.crc32(F.col("term").cast("binary")), F.lit(term_buckets)).cast("int"),
    ).withColumn("_build_part", F.spark_partition_id())
    (
        seg.repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{path}/segments")
    )
    import json
    import os

    os.makedirs(path, exist_ok=True)
    with open(f"{path}/_segments_meta.json", "w") as fh:
        json.dump({"block_span": block_span, "term_buckets": term_buckets}, fh)


def read_segments(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    import json

    with open(f"{path}/_segments_meta.json") as fh:
        meta = json.load(fh)
    return spark.read.parquet(f"{path}/segments"), meta


SEG_COLS = [
    "term", "block", "df_block", "max_tftd", "min_doc_length",
    "docids_vb", "tftds_vb", "pos_lens_vb", "positions_vb", "doc_lengths_vb",
]


def hash_block_span(n_docs: int, docs_per_block: int = 512) -> int:
    """Block span for url-HASH doc_ids (uniform over [0, 2^63)), sized
    so a block holds ~``docs_per_block`` docs at the given corpus size.

    ``block = doc_id // span`` only groups postings when the span is
    scaled to the ID SPACE: with dense ids a span of 4096 means 4096
    docs per block, but with hash ids it means 4096 *hash units* —
    ~2^51 blocks, one posting per (term, block) group, which destroys
    both the encode batching (one Python-loop group per posting) and
    the delta/VB compression (no gaps to compress). Measured on the
    20k-doc pages corpus: 1.0 postings/group and a 131 s segment
    commit vs ~8 s once the span matches the space.

    The span is a build-time property recorded in the index table
    (``properties["block_span"]``) and reused verbatim by refresh,
    merge and streaming-delta paths, so adaptivity at build time never
    desynchronizes (term, block) keys across versions. Growth is safe:
    a corpus that doubles just halves docs/block until the next major
    rewrite re-derives the span."""
    n_blocks = max(1, n_docs // docs_per_block)
    # cap: 2^63 itself overflows a signed long (tiny corpora → 1 block)
    return min((1 << 63) - 1, (1 << 63) // n_blocks)


def merge_segments(base: DataFrame, delta: DataFrame,
                   superseded: DataFrame | None = None,
                   block_span: int = DEFAULT_BLOCK_SPAN) -> DataFrame:
    """Lucene-style segment merge: fold a (small) delta index into an
    existing segment set, rewriting ONLY the groups the delta touches.

    The reference's disk index is write-once (diskindexwriter.py builds
    the whole postings.bin in one shot; adding documents means a full
    rebuild). At 10^12 docs a rebuild per crawl batch is untenable —
    this is the posting-list MERGE the north rule names, with cost
    proportional to the delta, not the index:

    * a base (term, block) group is rewritten only when (a) the delta
      writes the same (term, block), or (b) its block holds a
      superseded doc_id (stale postings must be dropped). Everything
      else passes through as untouched columnar bytes — no decode, no
      re-encode, no shuffle of cold data (the anti-join against the
      broadcast collision set is exchange-free on the base side).
    * ``superseded`` (doc_ids whose old postings the delta replaces —
      re-crawled or deleted pages) is delta-sized by assumption and is
      broadcast; pass ``None`` for pure appends (fresh doc_ids).
    * hot groups decode → drop superseded → union the decoded delta →
      re-encode via :func:`build_segments`, so merged bytes are
      bit-identical to a from-scratch build of the logical union corpus
      (the encoder is deterministic; asserted by pytest and the
      ``segments_merge`` gate entry).

    Scale shape: with B = blocks touched by the delta, the rewrite work
    is O(B · block_span) postings regardless of index size. A uniformly
    random re-crawl touches every block (any doc-range layout degrades
    the same way); batch re-crawls by doc-id locality to keep B small.
    """
    base = base.select(*SEG_COLS)
    delta = delta.select(*SEG_COLS)

    delta_keys = delta.select("term", "block").distinct() \
        .withColumn("_collide", F.lit(True))
    tagged = base.join(F.broadcast(delta_keys), ["term", "block"], "left")
    if superseded is not None:
        sup_ids = superseded.select(F.col("doc_id").cast("long").alias("doc_id"))
        sup_blocks = sup_ids.select(
            (F.col("doc_id") / F.lit(block_span)).cast("long").alias("block")
        ).distinct().withColumn("_sup", F.lit(True))
        tagged = tagged.join(F.broadcast(sup_blocks), ["block"], "left")
    else:
        tagged = tagged.withColumn("_sup", F.lit(None).cast("boolean"))
    hot = F.coalesce(F.col("_collide"), F.lit(False)) | \
        F.coalesce(F.col("_sup"), F.lit(False))

    base_cold = tagged.filter(~hot).select(*SEG_COLS)
    base_hot = tagged.filter(hot).select(*SEG_COLS)

    hot_postings = decode_postings(base_hot, terms=None)
    if superseded is not None:
        hot_postings = hot_postings.join(F.broadcast(sup_ids), "doc_id",
                                         "left_anti")
    merged_postings = hot_postings.unionByName(
        decode_postings(delta, terms=None))
    merged_hot = build_segments(merged_postings, doc_stats=None,
                                block_span=block_span)
    return base_cold.unionByName(merged_hot.select(*SEG_COLS))


def biword_as_segments(biword: DataFrame,
                       block_span: int = DEFAULT_BLOCK_SPAN) -> DataFrame:
    """Encode the biword index (term "t1 t2" → doc_ids;
    /root/reference/indexes/positionalinvertedindex.py biword map, fed
    by main.py:413-418's two-term fast path) through the SAME segment
    format so one published table serves the whole query surface.

    Biword keys always contain a space and unigram terms never do (the
    tokenizer splits on ' '), so the two posting families share the
    table without a discriminator column: a term lookup can only ever
    match its own family, and ranked/WAND reads — which look up unigram
    terms — never touch a biword row. Positions are empty, tftd/doc
    lengths are 1 (the fast path reads doc_ids only)."""
    return build_segments(
        biword.select("term", "doc_id").distinct().select(
            "term",
            F.col("doc_id").cast("long").alias("doc_id"),
            F.lit(1).cast("int").alias("tftd"),
            F.array().cast("array<int>").alias("positions"),
            F.lit(1.0).alias("doc_length"),
        ),
        doc_stats=None,
        block_span=block_span,
    )


DEC_SCHEMA = T.StructType(
    [
        T.StructField("doc_ids", T.ArrayType(T.LongType())),
        T.StructField("tftds", T.ArrayType(T.IntegerType())),
        T.StructField("positions", T.ArrayType(T.ArrayType(T.IntegerType()))),
        T.StructField("doc_lengths", T.ArrayType(T.IntegerType())),
    ]
)


def _decode_batch(docids_vb: pd.Series, tftds_vb: pd.Series,
                  pos_lens_vb: pd.Series, positions_vb: pd.Series,
                  doc_lengths_vb: pd.Series) -> pd.DataFrame:
    rows = {"doc_ids": [], "tftds": [], "positions": [], "doc_lengths": []}
    for dvb, tvb, lvb, pvb, dlvb in zip(docids_vb, tftds_vb, pos_lens_vb,
                                        positions_vb, doc_lengths_vb):
        dids = delta_decode(vb_decode(bytes(dvb)))
        rows["doc_ids"].append([int(x) for x in dids])
        rows["tftds"].append([int(x) for x in vb_decode(bytes(tvb))])
        if dlvb is None or len(dlvb) == 0:
            # Fail loudly rather than zero-fill: a doc_length of 0
            # would silently inflate BM25 wdt for every posting in the
            # segment. Only segments written by a pre-doc_lengths
            # format could hit this — they must be rebuilt.
            raise ValueError(
                "segment is missing doc_lengths_vb (written by an old "
                "format?) — rebuild segments with build_segments()"
            )
        rows["doc_lengths"].append([int(x) for x in vb_decode(bytes(dlvb))])
        if pvb is None or len(pvb) == 0:
            rows["positions"].append([[] for _ in dids])
            continue
        lens = vb_decode(bytes(lvb))
        flat = vb_decode(bytes(pvb))
        poss, off = [], 0
        for ln in lens:
            ln = int(ln)
            poss.append([int(x) for x in delta_decode(flat[off:off + ln])])
            off += ln
        rows["positions"].append(poss)
    return pd.DataFrame(rows)


decode_udf = F.pandas_udf(_decode_batch, DEC_SCHEMA)


def decode_postings(segments: DataFrame, terms: list[str] | None,
                    term_buckets: int | None = None,
                    with_positions: bool = True,
                    passthrough: tuple = ()) -> DataFrame:
    """Segments → exploded postings for a term set. Ranked reads pass
    ``with_positions=False`` and never touch the positions column
    (columnar projection = the reference's position-skip, R2).
    ``terms=None`` decodes EVERY segment (full-index scan — bulk
    verification / reindexing path) without collecting the vocabulary
    to the driver.  ``passthrough`` names extra segment columns carried
    onto every decoded posting row (e.g. the snapshot layer's ``_seq``
    sequence number, which the merge-on-read delete rule keys on)."""
    from .build import term_filter

    seg = segments if terms is None else term_filter(segments, terms, term_buckets)
    extra = list(passthrough)
    if with_positions:
        dec = seg.withColumn(
            "d",
            decode_udf("docids_vb", "tftds_vb", "pos_lens_vb", "positions_vb",
                       "doc_lengths_vb"),
        ).select(
            "term", *extra,
            F.explode(
                F.arrays_zip("d.doc_ids", "d.tftds", "d.positions",
                             "d.doc_lengths")
            ).alias("z"),
        )
        return dec.select(
            "term", *extra,
            F.col("z.doc_ids").alias("doc_id"),
            F.col("z.tftds").alias("tftd"),
            F.col("z.positions").alias("positions"),
            F.col("z.doc_lengths").alias("doc_length"),
        )
    # Ranked read: skip the positions columns entirely (columnar
    # position-skip, R2) but decode the in-segment doc_lengths — the
    # scorer needs no doc_stats join.
    dec = seg.withColumn(
        "d",
        decode_udf(
            "docids_vb", "tftds_vb",
            F.lit(b"").cast("binary"), F.lit(b"").cast("binary"),
            "doc_lengths_vb",
        ),
    ).select(
        "term", *extra,
        F.explode(
            F.arrays_zip("d.doc_ids", "d.tftds", "d.doc_lengths")
        ).alias("z"),
    )
    return dec.select(
        "term", *extra,
        F.col("z.doc_ids").alias("doc_id"),
        F.col("z.tftds").alias("tftd"),
        F.col("z.doc_lengths").alias("doc_length"),
    )
