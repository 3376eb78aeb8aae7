"""URL normalization, host extraction, and URL-level dedup — the
first pass of any Common-Crawl-style web corpus (the north-rule input
table is keyed by ``url``). All pure regexp/array column expressions
(codegen, row-local): normalization never shuffles; the dedup and the
host rollup each cost exactly one groupBy on their key, which is the
information-theoretic minimum.

Normalization rules (the standard crawl-dedup canon):

* drop the fragment (``#...``),
* lowercase scheme and host,
* strip explicit default ports ``:80`` / ``:443``,
* strip trailing slashes from the path,
* drop ``utm_*`` tracking parameters from the query (keeping the
  remaining params in their original order), and the ``?`` itself if
  nothing survives.

Every rule is expressible in both Java regex (Spark) and RE2 (DuckDB
oracle), so the whole normalizer has an exact SQL twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def url_host(url: F.Column) -> F.Column:
    """Lowercased host with any explicit port stripped."""
    hostport = F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1))
    return F.regexp_replace(hostport, r":[0-9]+$", "")


def normalize_url_col(url: F.Column) -> F.Column:
    """The normalized-URL column expression (see module docstring)."""
    no_frag = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(no_frag, _HOSTPORT_RE, 1))
    host = F.regexp_replace(hostport, r":(80|443)$", "")
    path = F.regexp_replace(
        F.regexp_extract(no_frag, _PATH_RE, 1), r"/+$", ""
    )
    query = F.regexp_extract(no_frag, _QUERY_RE, 1)
    kept = F.array_join(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != F.lit("")) & (~p.startswith("utm_")),
        ),
        "&",
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(kept != "", F.concat(F.lit("?"), kept)).otherwise(F.lit("")),
    )


def normalize_urls(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Pages with ``norm_url`` and ``host`` columns added — row-local,
    no shuffle; downstream dedup/rollups key on these."""
    u = F.col(url_col)
    return pages.withColumn("norm_url", normalize_url_col(u)).withColumn(
        "host", url_host(u)
    )


def url_dedup_groups(pages: DataFrame, url_col: str = "url",
                     id_col: str = "doc_id") -> DataFrame:
    """(norm_url, n_docs, keep_doc_id): one row per NORMALIZED url with
    the smallest doc_id as the stable keeper — the crawl-side exact
    dedup that runs before any content dedup. One hash-partial-agged
    groupBy on norm_url; at 10^12 rows AQE handles hot-host skew and
    the map-side partial keeps the exchange at ~|distinct urls|."""
    return (
        normalize_urls(pages, url_col)
        .groupBy("norm_url")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min(id_col).cast("long").alias("keep_doc_id"),
        )
    )


def host_stats(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """(host, n_docs, n_urls): per-host document count and distinct
    normalized-URL count — the domain-mix report every crawl curation
    run starts from (and the input to host-level throttling/blocklist
    policies). distinct-count is exact, not approximate, so the gate
    hash is deterministic; swap in approx_count_distinct at 10^12 rows
    if exactness is not required."""
    return (
        normalize_urls(pages, url_col)
        .groupBy("host")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("norm_url").cast("long").alias("n_urls"),
        )
    )
