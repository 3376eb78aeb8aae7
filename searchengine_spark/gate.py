"""Driver-gate query registry: every entry pairs a Spark DataFrame
callable ``(spark, sf_dir) -> DataFrame`` with an equivalent ANSI-SQL
string the DuckDB oracle runs on the same parquet tables.

Design notes
------------
* Gate queries run the engine under the **simple analyzer**
  (``indexing/simple.py``) because DuckDB cannot Porter2-stem (the fts
  extension is unavailable offline); the stemmed reference-parity path
  is asserted by pytest against the pure-Python oracle
  (``oracle/engine.py``) instead, and is exposed here as rows-only
  ``ref_*`` entries (no oracle SQL — the driver records the weaker
  check, as documented in ``__spark_entry__.oracle_sql``).
* Every gate column is a STRING or BIGINT. Floating-point results are
  emitted as ``floor(x * 1e6)`` bigints so Spark↔DuckDB double
  formatting differences can't break the value hash; both engines
  compute in float64 with identical formulas.
* Quirk-free operator variants (clean phrase/NEAR) are used where the
  reference's two-pointer tail quirks (merge_posting.py:94-101,287-296)
  have no SQL equivalent; the quirky algorithms stay pytest-verified.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .indexing.build import SparkIndex, build_index
from .indexing.simple import build_simple_index, simple_query_term
from .queries.engine import boolean_query
from .queries.ranked import rank_topk

E6 = 1_000_000

# ---------------------------------------------------------------------------
# Table + index access (memoized per session/sf_dir)
# ---------------------------------------------------------------------------

_CACHE: dict = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def simple_index(spark: SparkSession, sf_dir: str) -> SparkIndex:
    key = (id(spark.sparkContext), sf_dir, "simple")
    if key not in _CACHE:
        idx = build_simple_index(load_table(spark, sf_dir, "documents"))
        _CACHE[key] = idx.cache()
    return _CACHE[key]


def reference_index(spark: SparkSession, sf_dir: str) -> SparkIndex:
    key = (id(spark.sparkContext), sf_dir, "reference")
    if key not in _CACHE:
        idx = build_index(load_table(spark, sf_dir, "documents"))
        _CACHE[key] = idx.cache()
    return _CACHE[key]


# ---------------------------------------------------------------------------
# Shared oracle-SQL building blocks (DuckDB dialect, ANSI-ish)
# ---------------------------------------------------------------------------

SQL_PREFIX = """
WITH tokarr AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts, text
  FROM documents
),
tok AS (
  SELECT doc_id, unnest(ts) AS term, generate_subscripts(ts, 1) AS pos
  FROM tokarr
),
postings AS (
  SELECT term, doc_id, count(*)::BIGINT AS tftd,
         min(pos)::BIGINT AS min_pos, max(pos)::BIGINT AS max_pos
  FROM tok GROUP BY term, doc_id
)
"""

SQL_STATS_CTES = """
, docstats AS (
  SELECT doc_id, sqrt(sum(pow(1 + ln(tftd), 2))) AS ld,
         sum(tftd)::DOUBLE / count(*) AS avg_tftd
  FROM postings GROUP BY doc_id
),
dl AS (
  SELECT doc_id, len(ts)::DOUBLE AS doc_length,
         strlen(text)::DOUBLE AS byte_size
  FROM tokarr
),
cstats AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(len(ts)) AS avg_dl FROM tokarr
)
"""

# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


def _e6(col) -> F.Column:
    return F.floor(col * F.lit(float(E6))).cast("long")


# ---------------------------------------------------------------------------
# 1. Index construction operators (SURVEY.md §2.2: I1, I6, I7, I3, R5)
# ---------------------------------------------------------------------------


@register(
    "index_postings",
    SQL_PREFIX
    + "SELECT term, doc_id, tftd, min_pos, max_pos FROM postings",
)
def index_postings(spark, sf_dir):
    """Positional inverted index (I1) — postings projected to scalar
    position summaries (the full positions array drives phrase/NEAR)."""
    idx = simple_index(spark, sf_dir)
    return idx.postings.select(
        "term",
        "doc_id",
        F.col("tftd").cast("long").alias("tftd"),
        F.element_at("positions", 1).cast("long").alias("min_pos"),
        F.element_at("positions", -1).cast("long").alias("max_pos"),
    )


@register(
    "index_doc_stats",
    SQL_PREFIX
    + SQL_STATS_CTES
    + """
SELECT d.doc_id, d.doc_length::BIGINT AS doc_length,
       floor(coalesce(s.ld, 0) * 1e6)::BIGINT AS ld_e6,
       floor(coalesce(s.avg_tftd, 0) * 1e6)::BIGINT AS avg_tftd_e6
FROM dl d LEFT JOIN docstats s USING (doc_id)
""",
)
def index_doc_stats(spark, sf_dir):
    """Per-document weights (I6): docLength, Ld = sqrt(Σ(1+ln tftd)²),
    avg_tftd (main.py:186-209 formulas)."""
    idx = simple_index(spark, sf_dir)
    return idx.doc_stats.select(
        "doc_id",
        F.col("doc_length").cast("long").alias("doc_length"),
        _e6(F.col("Ld")).alias("ld_e6"),
        _e6(F.col("avg_tftd")).alias("avg_tftd_e6"),
    )


@register(
    "index_corpus_stats",
    SQL_PREFIX
    + """
SELECT count(*)::BIGINT AS n_docs,
       floor(avg(len(ts)) * 1e6)::BIGINT AS avg_dl_e6
FROM tokarr
""",
)
def index_corpus_stats(spark, sf_dir):
    """Corpus-level average document length (I7, main.py:216)."""
    idx = simple_index(spark, sf_dir)
    return idx.corpus_stats.select(
        F.col("n_docs").cast("long").alias("n_docs"),
        _e6(F.col("avg_doc_length")).alias("avg_dl_e6"),
    )


@register(
    "index_vocabulary",
    SQL_PREFIX + "SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY term",
)
def index_vocabulary(spark, sf_dir):
    """Sorted vocabulary with document frequencies (R5 + dft)."""
    idx = simple_index(spark, sf_dir)
    return idx.postings.groupBy("term").agg(F.count("*").cast("long").alias("df"))


@register(
    "index_biword_df",
    SQL_PREFIX
    + """
SELECT bw AS term, count(*)::BIGINT AS df FROM (
  SELECT DISTINCT a.doc_id, a.term || ' ' || b.term AS bw
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
) GROUP BY bw
""",
)
def index_biword_df(spark, sf_dir):
    """Biword index (I3): adjacent-token-pair keys with doc frequencies."""
    idx = simple_index(spark, sf_dir)
    return idx.biword.groupBy("term").agg(F.count("*").cast("long").alias("df"))


# ---------------------------------------------------------------------------
# 2. Boolean retrieval (SURVEY.md §2.4: Q1-Q5, Q9)
# ---------------------------------------------------------------------------


def _bool(query: str):
    def fn(spark, sf_dir):
        idx = simple_index(spark, sf_dir)
        return boolean_query(idx, query, normalize=simple_query_term).select(
            F.col("doc_id").cast("long").alias("doc_id")
        )

    return fn


QUERIES["bool_and"] = _bool("table scan")
ORACLE_SQL["bool_and"] = (
    SQL_PREFIX
    + """
SELECT a.doc_id FROM postings a JOIN postings b USING (doc_id)
WHERE a.term = 'table' AND b.term = 'scan'
"""
)

QUERIES["bool_or"] = _bool("query + window")
ORACLE_SQL["bool_or"] = (
    SQL_PREFIX
    + """
SELECT DISTINCT doc_id FROM postings WHERE term IN ('query', 'window')
"""
)

QUERIES["bool_and_not"] = _bool("table -stream")
ORACLE_SQL["bool_and_not"] = (
    SQL_PREFIX
    + """
SELECT doc_id FROM postings WHERE term = 'table'
AND doc_id NOT IN (SELECT doc_id FROM postings WHERE term = 'stream')
"""
)

QUERIES["bool_mixed"] = _bool("table scan + agg -join")
ORACLE_SQL["bool_mixed"] = (
    SQL_PREFIX
    + """
SELECT DISTINCT doc_id FROM (
  SELECT a.doc_id FROM postings a JOIN postings b USING (doc_id)
  WHERE a.term = 'table' AND b.term = 'scan'
  UNION
  SELECT doc_id FROM postings WHERE term = 'agg'
  AND doc_id NOT IN (SELECT doc_id FROM postings WHERE term = 'join')
)
"""
)


# ---------------------------------------------------------------------------
# 3. Phrase / NEAR / biword (Q6-Q8) — clean positional semantics
#    (exists a position pair at the exact offset); the reference's
#    quirky two-pointer variants are pytest-verified instead.
# ---------------------------------------------------------------------------


def _clean_phrase_docs(idx: SparkIndex, terms: list[str]) -> DataFrame:
    """Docs containing the exact phrase: fold i-th term with predicate
    ∃p∈P₁: p+i ∈ Pᵢ — pure JVM via array_intersect over shifted
    positions (SURVEY.md Q6's idiomatic mapping)."""
    acc = idx.postings.filter(F.col("term") == terms[0]).select(
        "doc_id", F.col("positions").alias("_pl")
    )
    for i in range(1, len(terms)):
        nxt = idx.postings.filter(F.col("term") == terms[i]).select(
            "doc_id", F.col("positions").alias("_pr")
        )
        acc = (
            acc.join(nxt, "doc_id")
            .withColumn(
                "_pl",
                F.array_intersect(
                    F.col("_pl"),
                    F.transform(F.col("_pr"), lambda x: x - F.lit(i)),
                ),
            )
            .filter(F.size("_pl") > 0)
            .select("doc_id", "_pl")
        )
    return acc.select(F.col("doc_id").cast("long").alias("doc_id")).distinct()


@register(
    "phrase_2",
    SQL_PREFIX
    + """
SELECT DISTINCT a.doc_id FROM tok a JOIN tok b
  ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
WHERE a.term = 'table' AND b.term = 'scan'
""",
)
def phrase_2(spark, sf_dir):
    idx = simple_index(spark, sf_dir)
    return _clean_phrase_docs(idx, ["table", "scan"])


@register(
    "phrase_3",
    SQL_PREFIX
    + """
SELECT DISTINCT a.doc_id
FROM tok a
JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
JOIN tok c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
WHERE a.term = 'order' AND b.term = 'group' AND c.term = 'value'
""",
)
def phrase_3(spark, sf_dir):
    idx = simple_index(spark, sf_dir)
    return _clean_phrase_docs(idx, ["order", "group", "value"])


@register(
    "near_k",
    SQL_PREFIX
    + """
SELECT DISTINCT a.doc_id FROM tok a JOIN tok b
  ON a.doc_id = b.doc_id AND b.pos - a.pos BETWEEN 1 AND 3
WHERE a.term = 'table' AND b.term = 'scan'
""",
)
def near_k(spark, sf_dir):
    """[table NEAR/3 scan] with clean semantics: 1 <= pos_b − pos_a <= 3
    (the reference's exact-k main-loop quirk, merge_posting.py:271, is
    pytest-verified separately)."""
    idx = simple_index(spark, sf_dir)
    a = idx.postings.filter(F.col("term") == "table").select("doc_id", F.col("positions").alias("_pl"))
    b = idx.postings.filter(F.col("term") == "scan").select("doc_id", F.col("positions").alias("_pr"))
    hit = F.exists(
        "_pl",
        lambda x: F.exists("_pr", lambda y: (y - x >= 1) & (y - x <= 3)),
    )
    return (
        a.join(b, "doc_id")
        .filter(hit)
        .select(F.col("doc_id").cast("long").alias("doc_id"))
        .distinct()
    )


@register(
    "biword_phrase",
    SQL_PREFIX
    + """
SELECT DISTINCT a.doc_id FROM tok a JOIN tok b
  ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
WHERE a.term = 'customer' AND b.term = 'line'
""",
)
def biword_phrase(spark, sf_dir):
    """Two-term phrase answered from the biword index (Q7 fast path,
    main.py:413-418) — semantically identical to adjacent-pair lookup."""
    idx = simple_index(spark, sf_dir)
    return boolean_query(idx, '"customer line"', normalize=simple_query_term).select(
        F.col("doc_id").cast("long").alias("doc_id")
    )


# ---------------------------------------------------------------------------
# 4. Ranked retrieval (SURVEY.md §2.5: S1-S7)
# ---------------------------------------------------------------------------

RANK_QUERY = "table scan merge"
RANK_TERMS = ["table", "scan", "merge"]


def _rank_sql(strategy: str, terms: list[str], k: int = 10,
              wqt_threshold: float | None = None) -> str:
    vals = ", ".join(f"'{t}'" for t in terms)
    wqt = {
        "default": "ln(1 + s.n_docs / d.dft)",
        "tfidf": "ln(s.n_docs / d.dft)",
        "bm25": "greatest(0.1, ln((s.n_docs - d.dft + 0.5) / (d.dft + 0.5)))",
        "wacky": (
            "CASE WHEN s.n_docs > d.dft THEN "
            "greatest(0.0, ln((s.n_docs - d.dft) / d.dft)) ELSE 0.0 END"
        ),
    }[strategy]
    wdt = {
        "default": "(1 + ln(p.tftd))",
        "tfidf": "p.tftd::DOUBLE",
        "bm25": "(2.2 * p.tftd) / (1.2 * (0.25 + 0.75 * l.doc_length / s.avg_dl) + p.tftd)",
        "wacky": (
            "CASE WHEN ds.avg_tftd > 0 THEN "
            "(1 + ln(p.tftd)) / (1 + ln(ds.avg_tftd)) ELSE 0.0 END"
        ),
    }[strategy]
    norm = {
        "default": "ld",
        "tfidf": "ld",
        "bm25": "1.0",
        "wacky": "sqrt(byte_size)",
    }[strategy]
    prune = (
        f"WHERE wqt >= {wqt_threshold}" if wqt_threshold is not None else ""
    )
    return (
        SQL_PREFIX
        + SQL_STATS_CTES
        + f"""
, qterms AS (SELECT unnest([{vals}]) AS term),
dft AS (
  SELECT p.term, count(*)::DOUBLE AS dft
  FROM postings p JOIN qterms q USING (term) GROUP BY p.term
),
wq AS (
  SELECT d.term, {wqt} AS wqt FROM dft d CROSS JOIN cstats s {prune}
),
scored AS (
  SELECT p.doc_id, ds.ld AS ld, ds.avg_tftd AS doc_avg_tftd,
         l.byte_size AS byte_size,
         sum(w.wqt * {wdt}) AS raw_score
  FROM postings p
  JOIN wq w ON p.term = w.term
  JOIN dl l ON p.doc_id = l.doc_id
  JOIN docstats ds ON p.doc_id = ds.doc_id
  CROSS JOIN cstats s
  GROUP BY p.doc_id, ds.ld, ds.avg_tftd, l.byte_size
)
SELECT doc_id, floor(raw_score / {norm} * 1e6)::BIGINT AS score_e6
FROM scored ORDER BY raw_score / {norm} DESC, doc_id DESC LIMIT {k}
"""
    )


def _rank(strategy: str, query: str = RANK_QUERY, k: int = 10, prune: bool = False):
    def fn(spark, sf_dir):
        idx = simple_index(spark, sf_dir)
        top = rank_topk(idx, query, strategy, k, prune=prune,
                        normalize=simple_query_term)
        return top.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            _e6(F.col("score")).alias("score_e6"),
        )

    return fn


QUERIES["rank_bm25"] = _rank("bm25")
ORACLE_SQL["rank_bm25"] = _rank_sql("bm25", RANK_TERMS)

QUERIES["rank_default"] = _rank("default")
ORACLE_SQL["rank_default"] = _rank_sql("default", RANK_TERMS)

QUERIES["rank_tfidf"] = _rank("tfidf")
ORACLE_SQL["rank_tfidf"] = _rank_sql("tfidf", RANK_TERMS)

QUERIES["rank_wacky"] = _rank("wacky")
ORACLE_SQL["rank_wacky"] = _rank_sql("wacky", RANK_TERMS)

# Vocab-elimination pruning (S7): BM25 threshold 0.4
# (vocab_elimination_main_precision_demo.py:171). 'dup' is the only
# low-df term in the synthetic corpus, so it survives the prune while
# the head terms are eliminated.
QUERIES["rank_bm25_pruned"] = _rank("bm25", query="table dup", prune=True)
ORACLE_SQL["rank_bm25_pruned"] = _rank_sql("bm25", ["table", "dup"],
                                           wqt_threshold=0.4)


# ---------------------------------------------------------------------------
# 5. Reference-analyzer (stemmed, quirk-exact) entries — rows-only checks:
#    DuckDB cannot Porter2-stem offline, so parity for these paths is
#    asserted by tests/ against the pure-Python oracle instead.
# ---------------------------------------------------------------------------


@register("ref_bm25_topk")
def ref_bm25_topk(spark, sf_dir):
    """BM25 top-10 through the full reference-parity pipeline (Arrow
    pandas-UDF tokenizer + Porter2 + quirky docLength accounting)."""
    idx = reference_index(spark, sf_dir)
    top = rank_topk(idx, RANK_QUERY, "bm25", 10)
    return top.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        _e6(F.col("score")).alias("score_e6"),
    )


@register("ref_boolean_mixed")
def ref_boolean_mixed(spark, sf_dir):
    """Boolean AND/OR/NOT through the reference-parity analyzer."""
    idx = reference_index(spark, sf_dir)
    return boolean_query(idx, "table scan + agg -join").select(
        F.col("doc_id").cast("long").alias("doc_id")
    )
