"""The "simple" analyzer — a pure-JVM tokenization + index-build path.

Two analyzers coexist in this engine:

* **reference** (``indexing/build.py``): byte-exact parity with the
  reference's EnglishTokenStream + NewTokenProcessor + Porter2 stemming
  (/root/reference/text/englishtokenstream.py,
  /root/reference/text/newtokenprocessor.py), which requires an
  Arrow-batched pandas UDF because Porter2 has no Spark builtin. Parity
  is asserted by pytest against the pure-Python oracle.
* **simple** (this module): ``regexp_extract_all(lower(text),
  '[a-z0-9]+')`` — every token, 1-based positions, no stemming, no
  pairwise-loop quirks. This path stays entirely inside whole-stage
  codegen (zero Python on executors) and its semantics are expressible
  verbatim in ANSI SQL, which is what the driver's DuckDB oracle gate
  checks (``__spark_entry__.oracle_sql``). At 10^12-doc scale this is
  also the throughput-optimal analyzer when stemming parity is not
  required.

Both produce the same :class:`~searchengine_spark.indexing.build.SparkIndex`
shape, so the boolean/ranked/WAND query engines run unchanged on top of
either.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .build import SparkIndex

TOKEN_PATTERN = "[a-z0-9]+"


def simple_query_term(raw: str) -> str:
    """Normalize one query literal under the simple analyzer: the first
    regex token of the lowercased literal ('' when none)."""
    import re

    m = re.search(TOKEN_PATTERN, raw.lower())
    return m.group(0) if m else ""


def token_array(text_col) -> "F.Column":
    """Column of all [a-z0-9]+ runs in lower(text), in order."""
    return F.regexp_extract_all(F.lower(text_col), F.lit(TOKEN_PATTERN), 0)


def simple_tokens(docs: DataFrame, doc_id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(doc_id, term, pos) with 1-based positions — whole-stage codegen
    end to end (the scan→project→generate pipeline never leaves the JVM)."""
    return (
        docs.select(
            F.col(doc_id_col).cast("long").alias("doc_id"),
            F.posexplode(token_array(F.col(text_col))).alias("pos0", "term"),
        )
        .select("doc_id", "term", (F.col("pos0") + 1).cast("int").alias("pos"))
    )


def build_simple_index(docs: DataFrame, doc_id_col: str = "doc_id",
                       text_col: str = "text", persist: bool = False) -> SparkIndex:
    """Build a SparkIndex under the simple analyzer.

    ONE shuffle total: the raw docs are hash-repartitioned by doc_id
    up front (the narrowest representation the corpus ever has), and
    every downstream exchange requirement is then already satisfied —
    groupBy(term, doc_id) and groupBy(doc_id) need only co-location of
    equal doc_ids (ClusteredDistribution on a key superset), the biword
    lead() window partitions by doc_id, and the denormalizing
    postings⋈doc_stats join is co-partitioned on doc_id from both
    sides. Without the up-front repartition each of those is its own
    corpus-sized exchange of the (3× larger) exploded token stream.
    doc_length here is the plain token count (no reference +1 quirk) and
    Ld/avg_tftd use the same formulas (main.py:186-209).
    """
    base = docs.select(
        F.col(doc_id_col).cast("long").alias("doc_id"),
        token_array(F.col(text_col)).alias("ts"),
        F.octet_length(F.col(text_col)).cast("double").alias("byte_size"),
    ).repartition("doc_id")
    if persist:
        from pyspark import StorageLevel

        base = base.persist(StorageLevel.MEMORY_AND_DISK)
    tok = base.select(
        "doc_id", F.posexplode("ts").alias("pos0", "term")
    ).select("doc_id", "term", (F.col("pos0") + 1).cast("int").alias("pos"))

    postings = tok.groupBy("term", "doc_id").agg(
        F.count("*").cast("int").alias("tftd"),
        F.sort_array(F.collect_list("pos")).alias("positions"),
    )

    per_doc = postings.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.pow(F.lit(1.0) + F.log("tftd"), F.lit(2.0)))).alias("Ld"),
        (F.sum("tftd") / F.count("*")).cast("double").alias("avg_tftd"),
    )

    doc_stats = (
        base.select(
            "doc_id",
            F.size("ts").cast("double").alias("doc_length"),
            "byte_size",
        )
        .join(per_doc, "doc_id", "left")
        .fillna({"Ld": 0.0, "avg_tftd": 0.0})
        .select("doc_id", "Ld", "doc_length", "byte_size", "avg_tftd")
    )

    corpus_stats = doc_stats.agg(
        F.count("*").alias("n_docs"),
        F.avg("doc_length").alias("avg_doc_length"),
    )

    # Biword index: adjacent token pairs via lead() over per-doc windows
    # (SURVEY.md I3). Partitions are doc-sized — no skew. Distinct mirrors
    # the per-doc dedupe of InvertedIndex.add_term.
    w = Window.partitionBy("doc_id").orderBy("pos")
    biword = (
        tok.withColumn("nxt", F.lead("term").over(w))
        .where(F.col("nxt").isNotNull())
        .select(F.concat_ws(" ", "term", "nxt").alias("term"), "doc_id")
        .distinct()
    )

    # Denormalized doc stats on every posting row (SparkIndex contract:
    # ranked retrieval never joins doc_stats at query time).
    postings = postings.join(doc_stats, "doc_id").select(
        "term", "doc_id", "tftd", "positions",
        "doc_length", "Ld", "byte_size", "avg_tftd",
    )

    return SparkIndex(postings, doc_stats, corpus_stats, biword)
