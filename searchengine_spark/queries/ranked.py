"""Ranked retrieval — the four reference scoring strategies
(/root/reference/ranked_strategy.py) as pure-JVM DataFrame pipelines.

Shape per strategy (strategy pattern, ranked_strategy.py:10-33):
query terms are deduped via set(query.split(' ')) BEFORE normalization
(ranked_strategy.py:62); each raw term maps through the rank-mode
TermLiteral rules (termliteral.py:36-42 — hyphenated terms collapse to
their LAST part); scores accumulate per doc; a per-doc normalizer
divides at the end; top-K uses heapq tuple order = (score desc, doc_id
desc) on ties (main.py:463-467), locked here via orderBy(desc(score),
desc(doc_id)).limit(k) -> Catalyst's TakeOrderedAndProject.

Scale notes: the postings scan is filtered to the handful of query
terms (partition-pruned when the index is bucket-partitioned); dft
counts are a tiny aggregate joined back by broadcast; corpus scalars
are literals; the only wide shuffle is groupBy(doc_id) over the
matched postings, which is exactly the accumulator the reference
builds one doc at a time.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..indexing.build import SparkIndex, term_filter
from ..oracle.engine import term_for_rank_mode

STRATEGIES = ("default", "tfidf", "bm25", "wacky")

# Vocab-elimination thresholds (S7):
# vocab_elimination_main_precision_demo.py:142,171
PRUNE_THRESHOLDS = {"default": 1.1, "bm25": 0.4}


def query_rank_terms(query: str, normalize=None) -> dict[str, int]:
    """raw query -> {index term: multiplicity}. Multiplicity >1 happens
    when two distinct raw terms normalize to the same index term — the
    reference then accumulates that term's postings twice.

    The EMPTY normalized term is kept: the reference's analyzer indexes
    '' for punctuation-only tokens (newtokenprocessor.py strips to
    nothing, main loop add_term's it anyway), and its query path looks
    '' up like any term — Cranfield queries end in " . \\n", so ''
    carries dft≈N and a real accumulator contribution under
    default/bm25 (under tfidf/wacky its wqt is exactly 0, which is why
    only two strategies expose the quirk). Simple-analyzer indexes
    contain no '' term, so keeping it is a no-op there.

    ``normalize`` defaults to the reference rank-mode rules
    (termliteral.py:36-42); pass ``simple.simple_query_term`` for
    simple-analyzer indexes."""
    normalize = normalize or term_for_rank_mode
    counts: Counter[str] = Counter()
    for raw in set(query.split(" ")):
        counts[normalize(raw)] += 1
    return dict(counts)


def _wqt(strategy: str, n_docs: int):
    dft = F.col("dft").cast("double")
    n = F.lit(float(n_docs))
    if strategy == "default":
        return F.log(F.lit(1.0) + n / dft)
    if strategy == "tfidf":
        return F.log(n / dft)
    if strategy == "bm25":
        return F.greatest(F.lit(0.1), F.log((n - dft + 0.5) / (dft + 0.5)))
    if strategy == "wacky":
        # numpy ln(0) = -inf in the reference, so max(0, ln(0)) == 0
        return F.when(n > dft, F.greatest(F.lit(0.0), F.log((n - dft) / dft))).otherwise(0.0)
    raise ValueError(strategy)


def _wdt(strategy: str, avg_doc_length: float):
    tftd = F.col("tftd").cast("double")
    if strategy == "default":
        return F.lit(1.0) + F.log(tftd)
    if strategy == "tfidf":
        return tftd
    if strategy == "bm25":
        # k1=1.2, b=0.75 fixed (ranked_strategy.py:134-135)
        denom = 1.2 * (0.25 + 0.75 * F.col("doc_length") / F.lit(avg_doc_length)) + tftd
        return 2.2 * tftd / denom
    if strategy == "wacky":
        return F.when(
            F.col("avg_tftd") > 0,
            (F.lit(1.0) + F.log(tftd)) / (F.lit(1.0) + F.log("avg_tftd")),
        ).otherwise(0.0)
    raise ValueError(strategy)


def _normalizer(strategy: str):
    if strategy == "bm25":
        return F.lit(1.0)
    if strategy == "wacky":
        return F.sqrt(F.col("byte_size"))
    return F.col("Ld")


def rank_scores(
    index: SparkIndex,
    query: str,
    strategy: str = "bm25",
    prune: bool = False,
    normalize=None,
) -> DataFrame:
    """Full scored frame DataFrame(doc_id, score) over every matching
    doc — the accumulator table before top-k selection. Callers that
    re-rank with a second signal (e.g. the PageRank blend in
    queries/webrank.py) must consume this, not the top-k: a
    query-independent prior can promote a doc from outside any fixed-k
    prefix."""
    terms = query_rank_terms(query, normalize)
    spark = index.postings.sparkSession
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")

    mult_df = spark.createDataFrame(
        [(t, float(m)) for t, m in terms.items()], "term string, mult double"
    )
    return rank_scores_terms(index, mult_df, strategy, prune,
                             literal_terms=list(terms))


def rank_scores_terms(
    index: SparkIndex,
    terms_df: DataFrame,
    strategy: str = "bm25",
    prune: bool = False,
    literal_terms: list[str] | None = None,
) -> DataFrame:
    """rank_scores over a (term, mult) DataFrame instead of a parsed
    query string — the shape an EXPANDED term set arrives in (wildcard
    expansion can be thousands of terms at web vocabulary; collecting
    them to literals would put the expansion on the driver). The
    postings scan prunes by broadcast semi-join; pass ``literal_terms``
    when the term list is known driver-side to ALSO get the bucket-
    literal partition pruning of ``term_filter``."""
    n_docs, avg_dl = index.corpus_scalars()
    # Ranked path never reads positions: columnar projection gives the
    # reference's position-skipping read (R2) for free. Doc stats come
    # from the DENORMALIZED posting columns (SparkIndex contract) — no
    # corpus-sized doc_stats join at query time; the legacy join path
    # remains only for un-enriched postings frames.
    stat_cols = ("doc_length", "Ld", "byte_size", "avg_tftd")
    enriched = set(stat_cols) <= set(index.postings.columns)
    cols = ["term", "doc_id", "tftd", *(stat_cols if enriched else ())]
    mult_df = terms_df.select(
        "term",
        (F.col("mult") if "mult" in terms_df.columns else F.lit(1.0))
        .cast("double").alias("mult"),
    )
    if literal_terms is not None:
        matched = term_filter(
            index.postings, literal_terms, index.term_buckets
        ).select(*cols)
    else:
        matched = index.postings.join(
            F.broadcast(mult_df.select("term")), "term", "left_semi"
        ).select(*cols)

    dft = matched.groupBy("term").agg(F.count("*").alias("dft"))
    dft = dft.withColumn("wqt", _wqt(strategy, n_docs))
    threshold = PRUNE_THRESHOLDS.get(strategy)
    if prune and threshold is not None:
        dft = dft.filter(F.col("wqt") >= threshold)

    scored = matched.join(F.broadcast(dft.select("term", "wqt")), "term").join(
        F.broadcast(mult_df), "term"
    )
    if not enriched:
        scored = scored.join(index.doc_stats, "doc_id")
    scored = (
        scored.withColumn("contrib", _wdt(strategy, avg_dl) * F.col("wqt") * F.col("mult"))
        .groupBy("doc_id")
        .agg(
            F.sum("contrib").alias("raw_score"),
            # normalizer inputs are functionally dependent on doc_id;
            # carrying them through the agg avoids a second doc_stats join
            F.first("Ld").alias("Ld"),
            F.first("byte_size").alias("byte_size"),
        )
        .select(
            "doc_id",
            (F.col("raw_score") / _normalizer(strategy)).alias("score"),
        )
    )
    return scored


def rank_topk(
    index: SparkIndex,
    query: str,
    strategy: str = "bm25",
    k: int = 10,
    prune: bool = False,
    normalize=None,
) -> DataFrame:
    """Return DataFrame(doc_id, score) — top-k, ties broken doc_id desc.

    ``prune=True`` applies the vocab-elimination wqt threshold (S7)
    before touching postings — the scalar degenerate case of WAND.
    """
    scored = rank_scores(index, query, strategy, prune, normalize)
    return scored.orderBy(F.desc("score"), F.desc("doc_id")).limit(k)


def champion_lists(index: SparkIndex, r: int = 64, salt: int = 16,
                   strategy: str = "bm25") -> DataFrame:
    """Per-term CHAMPION LIST (impact-ordered prefix): the ``r`` docs
    with the highest per-term IMPACT — wdt(strategy)/normalizer, the
    exact single-term score up to the query-side wqt constant, all
    computable at index time from the denormalized posting columns.
    A static pruning structure from the public IR literature (champion
    lists / top-docs, Manning IIR §7.1.3): approximate ranked retrieval
    scores only champion docs, so query cost is bounded by r·|query|
    regardless of posting-list length — the static complement of WAND's
    dynamic block-max pruning. (Raw tftd is NOT a usable impact proxy
    under BM25's length normalization: on short-doc corpora tftd ties
    make the prefix arbitrary and recall collapses — measured 0.3 vs
    1.0 with true-impact ordering at r=64, k=10.)

    Impact is quantized to e6 for the ordering (ties → tftd desc,
    doc_id desc) so the champion SET is identical across engines and
    partitionings — raw float ordering would flip ulp-close pairs
    between this build and the SQL oracle.

    Skew shape: a naive per-term window would sort a head term's ENTIRE
    posting list in one task (10^11 rows for "the" at the design
    point). Two-stage instead: top-r per (term, doc_id%salt) — each
    head term split across ``salt`` independent tasks — then top-r of
    the ≤ salt·r survivors per term. Identical result (global top-r is
    contained in the union of per-salt top-rs), reducer fan-in bounded
    by salt·r rows regardless of df."""
    from pyspark.sql.window import Window

    _, avg_dl = index.corpus_scalars()
    stat_cols = ("doc_length", "Ld", "byte_size", "avg_tftd")
    if set(stat_cols) <= set(index.postings.columns):
        base = index.postings.select("term", "doc_id", "tftd", *stat_cols)
    else:
        # un-enriched postings (e.g. a legacy persisted index): the
        # impact expression needs the per-doc stats, so join doc_stats
        # once at champion-build time (index-time, amortized)
        base = index.postings.select("term", "doc_id", "tftd").join(
            index.doc_stats.select("doc_id", *stat_cols), "doc_id"
        )
    impact = _wdt(strategy, avg_dl) / _normalizer(strategy)
    base = base.withColumn(
        "_impact_e6", F.floor(impact * F.lit(1e6)).cast("long")
    )
    order = [F.desc("_impact_e6"), F.desc("tftd"), F.desc("doc_id")]
    w1 = Window.partitionBy("term", "_salt").orderBy(*order)
    part = (
        base.withColumn("_salt", F.pmod(F.col("doc_id"), F.lit(salt)))
        .withColumn("_rr", F.row_number().over(w1))
        .filter(F.col("_rr") <= r)
        .drop("_rr")
    )
    w2 = Window.partitionBy("term").orderBy(*order)
    return (
        part.withColumn("_rr", F.row_number().over(w2))
        .filter(F.col("_rr") <= r)
        .drop("_rr", "_salt", "_impact_e6")
    )


def rank_topk_champions(
    index: SparkIndex,
    champions: DataFrame,
    query: str,
    strategy: str = "bm25",
    k: int = 10,
    normalize=None,
) -> DataFrame:
    """Approximate top-k over a :func:`champion_lists` frame.

    Champion lists approximate the CANDIDATE SET, never the scoring:
    candidates are every doc that is a champion of at least one query
    term; those candidates are then scored EXACTLY — full matched
    postings (so a candidate championed by one term still accumulates
    its other query terms' contributions) and TRUE document
    frequencies from the full index. Scoring only the champion rows
    would systematically underestimate multi-term docs (measured
    recall@10 collapse 1.0 → 0.2 on the gate corpus).

    Scale shape: the candidate set is ≤ r·|query| doc_ids — a
    broadcast semi-join against the term-pruned postings scan — so the
    scored volume is bounded regardless of posting-list length.
    Returns (doc_id, score); recall vs exact top-k is pytest-asserted.
    """
    terms = query_rank_terms(query, normalize)
    n_docs, avg_dl = index.corpus_scalars()
    spark = index.postings.sparkSession
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    mult_df = spark.createDataFrame(
        [(t, float(m)) for t, m in terms.items()], "term string, mult double"
    )
    cand_docs = (
        champions.filter(F.col("term").isin(list(terms)))
        .select("doc_id").distinct()
    )
    stat_cols = ("doc_length", "Ld", "byte_size", "avg_tftd")
    enriched = set(stat_cols) <= set(index.postings.columns)
    cols = ["term", "doc_id", "tftd", *(stat_cols if enriched else ())]
    matched = (
        term_filter(index.postings, list(terms), index.term_buckets)
        .select(*cols)
    )
    dft = matched.groupBy("term").agg(F.count("*").alias("dft"))
    dft = dft.withColumn("wqt", _wqt(strategy, n_docs))
    scored = (
        matched.join(F.broadcast(cand_docs), "doc_id", "left_semi")
        .join(F.broadcast(dft.select("term", "wqt")), "term")
        .join(F.broadcast(mult_df), "term")
    )
    if not enriched:
        scored = scored.join(index.doc_stats, "doc_id")
    scored = (
        scored.withColumn("contrib",
                          _wdt(strategy, avg_dl) * F.col("wqt") * F.col("mult"))
        .groupBy("doc_id")
        .agg(
            F.sum("contrib").alias("raw_score"),
            F.first("Ld").alias("Ld"),
            F.first("byte_size").alias("byte_size"),
        )
        .select("doc_id",
                (F.col("raw_score") / _normalizer(strategy)).alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.desc("doc_id")).limit(k)


def rank_topk_batch(
    index: SparkIndex,
    queries: dict[str, str],
    strategy: str = "bm25",
    k: int = 10,
    normalize=None,
) -> DataFrame:
    """Batch ranked retrieval: ALL queries in ONE Spark job.

    Returns DataFrame(query_id, doc_id, score, rank) with rank 1..k per
    query (reference tie-break per query). Per-query results are
    identical to :func:`rank_topk` — dft/wqt are per-term properties,
    independent of which query mentions the term.

    Scale shape: one postings scan filtered to the UNION of all query
    terms (partition-pruned), one broadcast of the (query_id, term,
    mult) table — postings fan out to the queries sharing each term —
    one partial-agg shuffle on (query_id, doc_id), then a per-query
    window top-k (parallel across queries; no global sort). This is the
    evaluation-harness path: 225 Cranfield queries cost one job, not
    225 (tools/cranfield_eval.py), and at warehouse scale it is how a
    query log replays against the index.
    """
    from pyspark.sql.window import Window

    n_docs, avg_dl = index.corpus_scalars()
    spark = index.postings.sparkSession
    qt_rows = [
        (qid, t, float(m))
        for qid, q in queries.items()
        for t, m in query_rank_terms(q, normalize).items()
    ]
    if not qt_rows:
        return spark.createDataFrame(
            [], "query_id string, doc_id long, score double, rank int"
        )
    qt = spark.createDataFrame(
        qt_rows, "query_id string, term string, mult double"
    )
    terms = sorted({t for _, t, _ in qt_rows})

    stat_cols = ("doc_length", "Ld", "byte_size", "avg_tftd")
    enriched = set(stat_cols) <= set(index.postings.columns)
    cols = ["term", "doc_id", "tftd", *(stat_cols if enriched else ())]
    matched = term_filter(index.postings, terms, index.term_buckets).select(*cols)

    dft = matched.groupBy("term").agg(F.count("*").alias("dft"))
    dft = dft.withColumn("wqt", _wqt(strategy, n_docs))

    scored = matched.join(F.broadcast(dft.select("term", "wqt")), "term").join(
        F.broadcast(qt), "term"
    )
    if not enriched:
        scored = scored.join(index.doc_stats, "doc_id")
    scored = (
        scored.withColumn(
            "contrib", _wdt(strategy, avg_dl) * F.col("wqt") * F.col("mult")
        )
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum("contrib").alias("raw_score"),
            F.first("Ld").alias("Ld"),
            F.first("byte_size").alias("byte_size"),
        )
        .select(
            "query_id",
            "doc_id",
            (F.col("raw_score") / _normalizer(strategy)).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.desc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
