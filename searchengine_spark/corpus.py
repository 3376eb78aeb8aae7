"""Deterministic synthetic Common-Crawl-style ``pages`` corpus + the
text-extraction UDF (FIXTURES.md §1, BASELINE.json input_hint).

pages(url: string, warc_ts: timestamp, html: binary, text: string,
      lang: string)

Every row is a pure function of (seed, i), so generation scales out via
``spark.range(n) -> mapInPandas`` with no driver materialization and no
cross-partition coordination — the same generator yields byte-identical
rows at any parallelism, which is what makes the local[8]-vs-local[32]
scaling-efficiency evidence meaningful.

The body text is Zipf-distributed over a fixed vocabulary (exercises
head-term skew), with planted hyphenated tokens, punctuation wrappers,
apostrophes, and multi-space runs to exercise every tokenizer quirk
(/root/reference/text/newtokenprocessor.py:10-34).
"""

from __future__ import annotations

import bisect
import datetime as dt
import random

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

VOCAB = (
    "the of and a to in is was he for it with as his on be at by i this had "
    "not are but from or have an they which one you were her all she there "
    "would their we him been has when who will more no if out so said what "
    "up its about into than them can only other new some could time these "
    "two may then do first any my now such like our over man me even most "
    "made after also did many before must through back years where much your "
    "way well down should because each just those people mr how too little "
    "state good very make world still own see men work long get here between "
    "both life being under never day same another know while last might us "
    "great old year off come since against go came right used take three "
    "camping yosemite devils postpile strenuous whaling bedford historical "
    "national park search engine index query ranking retrieval"
).split()

HYPHEN_TOKENS = (
    "Hewlett-Packard", "real-gas", "state-of-the-art", "twenty-one",
    "self-evident", "full-text",
)

LANGS = ("en", "en", "en", "en", "en", "en", "en", "en", "de", "fr")

_EPOCH = dt.datetime(2020, 1, 1, tzinfo=dt.timezone.utc)

# Zipf CDF over VOCAB (weight 1/rank)
_weights = [1.0 / (r + 1) for r in range(len(VOCAB))]
_total = sum(_weights)
_CDF = []
_acc = 0.0
for _w in _weights:
    _acc += _w / _total
    _CDF.append(_acc)


def _make_body(rng: random.Random, n_tokens: int) -> str:
    pieces: list[str] = []
    for _ in range(n_tokens):
        roll = rng.random()
        if roll < 0.01:
            word = rng.choice(HYPHEN_TOKENS)
        else:
            word = VOCAB[bisect.bisect_left(_CDF, rng.random())]
            deco = rng.random()
            if deco < 0.02:
                word = word.capitalize() + "!"
            elif deco < 0.03:
                word = '"' + word + '"'
            elif deco < 0.04:
                word = word + "'s"
            elif deco < 0.05:
                word = "(" + word + ")"
        pieces.append(word)
        # multi-space runs and newlines survive to exercise the stream
        sep_roll = rng.random()
        if sep_roll < 0.02:
            pieces.append("")  # yields a double space on join
        elif sep_roll < 0.04:
            pieces.append("\n")
    body = " ".join(pieces).replace(" \n ", "\n")
    return body


def make_page(i: int, seed: int = 42) -> dict:
    """One deterministic page row as a plain dict."""
    rng = random.Random(seed * 1_000_003 + i)
    site, page = divmod(i, 100)
    url = f"https://example.org/site{site:06d}/page{page:04d}"
    n_tokens = 5 + int(rng.random() ** 2 * 120)
    topic = VOCAB[bisect.bisect_left(_CDF, rng.random())]
    title = f"Page {i} about {topic}"
    body = _make_body(rng, n_tokens)
    text = title + "\n" + body
    html = (
        f"<html><head><title>{title}</title></head>"
        f"<body>{body}</body></html>"
    ).encode("utf-8")
    return {
        "url": url,
        "warc_ts": _EPOCH + dt.timedelta(seconds=i * 37),
        "html": html,
        "text": text,
        "lang": LANGS[i % len(LANGS)],
    }


PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def pages_df(spark: SparkSession, n_docs: int, seed: int = 42,
             partitions: int | None = None) -> DataFrame:
    """Distributed generation: spark.range -> mapInPandas, no driver data."""

    def gen(batches):
        for pdf in batches:
            rows = [make_page(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    rng_range = spark.range(n_docs, numPartitions=partitions)
    return rng_range.mapInPandas(gen, PAGES_SCHEMA)


def _extract_batch(htmls: pd.Series) -> pd.Series:
    """title + '\\n' + body from the canonical html shape — must be
    byte-identical to the generator's ``text`` per url (input_hint)."""
    out = []
    for raw in htmls:
        s = bytes(raw).decode("utf-8")
        t0 = s.index("<title>") + 7
        t1 = s.index("</title>", t0)
        b0 = s.index("<body>", t1) + 6
        b1 = s.rindex("</body>")
        out.append(s[t0:t1] + "\n" + s[b0:b1])
    return pd.Series(out)


extract_text_udf = F.pandas_udf(_extract_batch, T.StringType())


def docs_from_pages(pages: DataFrame, lang: str | None = None,
                    partitions: int | None = None) -> DataFrame:
    """Assign deterministic doc_ids = global rank of (unique) url
    (replaces the reference's glob-order id counter,
    directorycorpus.py:47-55).

    Distributed two-phase ranking — NO global single-task window:
    (1) range-partition + sort within partitions by url (parallel),
    (2) collect the tiny per-partition row counts, broadcast cumulative
        offsets, and add a per-partition row_number.
    doc_id depends only on the global url order (urls are unique), so
    the result is identical at any parallelism — which is what makes
    the local[8]-vs-local[32] scaling evidence apples-to-apples.
    """
    from pyspark.sql.window import Window

    if lang:
        pages = pages.filter(F.col("lang") == lang)
    if partitions is None:
        partitions = max(pages.sparkSession.sparkContext.defaultParallelism, 2)
    ranged = (
        pages.select("url", "text", F.octet_length("html").alias("byte_size"))
        .repartitionByRange(partitions, "url")
        .withColumn("_pid", F.spark_partition_id())
    )
    # two passes over `ranged` (counts, then ranking) — persist so the
    # upstream scan/generation runs once; at warehouse scale this is a
    # checkpointed stage instead (pipeline/checkpoint.py)
    ranged = ranged.persist()
    counts = {
        r["_pid"]: r["cnt"]
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    spark = pages.sparkSession
    off_df = F.broadcast(
        spark.createDataFrame(
            [(pid, off) for pid, off in offsets.items()], "_pid int, _off long"
        )
    )
    w = Window.partitionBy("_pid").orderBy("url")  # per-partition: parallel
    out = (
        ranged.join(off_df, "_pid")
        .withColumn("doc_id", (F.col("_off") + F.row_number().over(w) - 1).cast("long"))
        .select("doc_id", "url", "text", "byte_size")
    )
    # The internal cache must not outlive the consumer: callers (and
    # pipeline.run_stage) invoke _cleanup after materializing, so
    # repeated builds in one session don't accumulate cached stages.
    out._cleanup = ranged.unpersist  # type: ignore[attr-defined]
    return out
