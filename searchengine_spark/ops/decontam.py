"""Benchmark decontamination — flag / drop training documents that
overlap an evaluation set by a shared token n-gram (the GPT-3-style
13-gram rule, Brown et al. 2020, arXiv:2005.14165 §C; n is a
parameter). A standard last-mile pass of every LLM training-data
pipeline: leaked eval text inflates benchmark scores, so any document
containing any n-gram that also appears in the benchmark suite is
flagged for removal.

Scale shape (the asymmetry is the whole design): the CORPUS side is
map-only — per-doc n-grams are built and deduped inside the row
(array_distinct), hashed to 60 bits, and probed against the benchmark
set via a BROADCAST hash join, because benchmark suites are tiny
(10^6-10^8 n-grams) while the corpus is 10^12 docs. The only shuffle
is the final groupBy(doc_id) over MATCHED rows, which at sane
contamination rates is a vanishing fraction of the corpus. No
corpus-sized exchange anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..indexing.simple import token_array
from .dedup import h60
from .textstats import ngram_col


def doc_ngram_hashes(docs: DataFrame, n: int = 13,
                     text_col: str = "text") -> DataFrame:
    """(doc_id, gram_hash): 60-bit hashes of the document's DISTINCT
    token n-grams. The dedup is doc-local (array_distinct before the
    explode) — no shuffle; docs shorter than n tokens emit no rows."""
    return (
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            token_array(F.col(text_col)).alias("ts"),
        )
        .select("doc_id", F.explode(F.array_distinct(ngram_col("ts", n)))
                .alias("g"))
        .select("doc_id", h60(F.col("g")).alias("gram_hash"))
    )


def benchmark_ngram_set(bench_docs: DataFrame, n: int = 13,
                        text_col: str = "text") -> DataFrame:
    """(gram_hash): the distinct n-gram hash set of a benchmark corpus.
    Small by construction (eval suites, not training corpora) — the
    broadcast side of :func:`contamination`."""
    return doc_ngram_hashes(bench_docs, n, text_col).select(
        "gram_hash").distinct()


def contamination(docs: DataFrame, bench_grams: DataFrame,
                  n: int = 13, text_col: str = "text") -> DataFrame:
    """(doc_id, n_matched_ngrams): every document sharing at least one
    token n-gram with the benchmark set, with the count of its distinct
    matched n-grams. Broadcast inner join — the corpus is never
    shuffled; only matched rows reach the (tiny) doc_id aggregation."""
    return (
        doc_ngram_hashes(docs, n, text_col)
        .join(F.broadcast(bench_grams), "gram_hash")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_matched_ngrams"))
    )


def decontaminated(docs: DataFrame, bench_grams: DataFrame,
                   n: int = 13, text_col: str = "text") -> DataFrame:
    """The corpus with contaminated documents REMOVED — the pipeline
    action. Broadcast anti-join on the flagged doc_ids (contaminated
    docs are a vanishing fraction of a sane corpus; same policy as
    dedup.drop_duplicates_by_pairs)."""
    flagged = contamination(docs, bench_grams, n, text_col).select("doc_id")
    return docs.join(F.broadcast(flagged), "doc_id", "left_anti")
