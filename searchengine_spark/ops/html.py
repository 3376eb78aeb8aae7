"""General HTML boilerplate stripping and link extraction — the web
ingest step between a raw crawl (``url``, ``html``) and the curation
pipeline, for pages that are NOT the canonical fixture shape (those go
through ``corpus.extract_text_udf``, the byte-identical pandas-UDF
twin of the reference's reader; reference corpus loading:
/root/reference/DiskIndexWriter.py + jsonfilereader.py read
pre-extracted text, so the strip rules here are the public crawl-canon
ones, not reference parity).

Everything is a chain of regexp/replace column expressions — pure JVM
whole-stage codegen, zero shuffles, and every pattern is restricted to
the Java-regex ∩ RE2 common subset (no backrefs, no lookaround,
inline ``(?is)`` flags only) so the DuckDB oracle replays the
extraction rule-for-rule:

1. drop ``<script>``/``<style>`` blocks (their text is code, not prose),
2. drop ``<!-- comments -->``,
3. replace every remaining tag with a space,
4. decode the six core entities (``&amp;`` LAST, so ``&amp;lt;``
   correctly yields literal ``&lt;`` rather than ``<``),
5. collapse ``[ \\t\\n\\r]+`` runs and trim.

``<title>`` text is captured before stripping; like any plain
tag-strip, the title text also remains in the body text.

At 100 TB this is the cheapest possible shape: a map-only projection
fused into the parquet/Iceberg scan, no exchange anywhere; link
extraction adds one generator (explode) per page, still shuffle-free
until the consumer aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCRIPT_RE = r"(?is)<script\b[^>]*>.*?</script>"
_STYLE_RE = r"(?is)<style\b[^>]*>.*?</style>"
_COMMENT_RE = r"(?s)<!--.*?-->"
_TAG_RE = r"(?s)<[^>]*>"
_TITLE_RE = r"(?is)<title[^>]*>(.*?)</title>"
_HREF_RE = r'(?is)<a\b[^>]*\bhref="([^"]*)"'

# decode order is part of the contract: &amp; must come last
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def strip_html_col(html) -> F.Column:
    """Visible-text column expression for an html string column."""
    t = F.regexp_replace(html, _SCRIPT_RE, " ")
    t = F.regexp_replace(t, _STYLE_RE, " ")
    t = F.regexp_replace(t, _COMMENT_RE, " ")
    t = F.regexp_replace(t, _TAG_RE, " ")
    for ent, ch in _ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, r"[ \t\n\r]+", " "))


def title_col(html) -> F.Column:
    """First ``<title>`` text, entity-decoded and whitespace-collapsed;
    '' when the page has none (regexp_extract's no-match value in both
    Spark and DuckDB)."""
    t = F.regexp_extract(html, _TITLE_RE, 1)
    for ent, ch in _ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, r"[ \t\n\r]+", " "))


def extract_visible_text(pages: DataFrame, html_col: str = "html",
                         id_col: str = "doc_id") -> DataFrame:
    """(doc_id, title, text, n_links): the strip pipeline above plus a
    link count — one map-only projection."""
    h = F.col(html_col).cast("string")
    return pages.select(
        F.col(id_col).cast("long").alias("doc_id"),
        title_col(h).alias("title"),
        strip_html_col(h).alias("text"),
        F.regexp_count(h, F.lit(_HREF_RE)).cast("long").alias("n_links"),
    )


_ANCHOR_RE = r'(?is)<a\b[^>]*\bhref="([^"]*)"[^>]*>(.*?)</a>'


def extract_anchors(pages: DataFrame, html_col: str = "html",
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, link_pos, href, anchor): every closed ``<a href>``
    element with its VISIBLE anchor text (nested tags stripped,
    entities decoded, whitespace collapsed — the same cleanup chain as
    the body text). Anchor text is the classic off-page relevance
    signal: it describes the TARGET, so an anchor-term index keyed by
    target is what web ranking actually joins against.

    Both capture groups come from one pattern evaluated twice (group 1
    then group 2) — the arrays are equal-length by construction and
    zipped row-locally; still map-only + one generator. Unterminated
    ``<a>`` elements don't match (no ``</a>``), so this can emit fewer
    rows than :func:`extract_links`, whose pattern doesn't require the
    close."""
    h = F.col(html_col).cast("string")
    hrefs = F.regexp_extract_all(h, F.lit(_ANCHOR_RE), 1)
    anchors = F.regexp_extract_all(h, F.lit(_ANCHOR_RE), 2)
    z = pages.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.posexplode(F.arrays_zip(hrefs.alias("href"),
                                  anchors.alias("anchor"))).alias("p0", "z"),
    )
    raw = F.col("z.anchor")
    cleaned = F.regexp_replace(raw, _TAG_RE, " ")
    for ent, ch in _ENTITIES:
        cleaned = F.replace(cleaned, F.lit(ent), F.lit(ch))
    cleaned = F.trim(F.regexp_replace(cleaned, r"[ \t\n\r]+", " "))
    return z.select(
        "doc_id",
        (F.col("p0") + 1).cast("long").alias("link_pos"),
        F.col("z.href").alias("href"),
        cleaned.alias("anchor"),
    )


def anchor_term_stats(anchors: DataFrame) -> DataFrame:
    """(host, term, n_links, n_source_docs): anchor terms aggregated
    per TARGET host — the anchor-text index a web ranker joins at
    query time. One groupBy after a row-local token explode."""
    from ..indexing.simple import token_array
    from .urlstats import url_host

    return (
        anchors.select(
            "doc_id",
            url_host(F.col("href")).alias("host"),
            F.explode(token_array(F.col("anchor"))).alias("term"),
        )
        .filter(F.col("host") != "")
        .groupBy("host", "term")
        .agg(
            F.count("*").cast("long").alias("n_links"),
            F.countDistinct("doc_id").cast("long").alias("n_source_docs"),
        )
    )


def anchor_field(anchors: DataFrame, target_doc) -> DataFrame:
    """(doc_id, anchor): the anchor-text FIELD of each target document
    — every inlink's visible anchor text concatenated in deterministic
    (source doc, link position) order, ready to feed
    ``indexing.fielded.build_fielded_index`` as a third BM25F field
    (the web-ranking shape: what OTHER pages call a page often
    describes it better than its own body, Manning IIR §21.1.1).

    ``target_doc`` is a Column resolving each anchor row's href to the
    doc_id it points at — url→doc resolution is deployment-specific (a
    join against the crawl table's url→doc_id map, or a path rule);
    rows resolving to NULL (external/unresolvable links) are dropped.

    Scale shape: one groupBy(target) over the anchors table; the
    per-doc field is bounded by inlink count — at web scale feed this
    a df-capped anchors frame (hub pages with millions of inlinks want
    a sampled/capped anchor set, same policy knob as docsim's max_df)
    and the collect_list stays bounded. BM25F only reads the token
    MULTISET (wtf + field length), so the deterministic sort is for
    reproducibility of the string, not a semantic requirement."""
    return (
        anchors.select(
            target_doc.cast("long").alias("target"),
            F.struct(
                F.col("doc_id").alias("src"), F.col("link_pos")
            ).alias("ord"),
            "anchor",
        )
        .filter(F.col("target").isNotNull())
        .groupBy("target")
        .agg(F.array_sort(
            F.collect_list(F.struct("ord", "anchor"))).alias("xs"))
        .select(
            F.col("target").alias("doc_id"),
            F.concat_ws(
                " ", F.transform("xs", lambda x: x["anchor"])
            ).alias("anchor"),
        )
    )


def inlink_host_stats(links: DataFrame) -> DataFrame:
    """(host, n_inlinks, n_source_docs) over an
    :func:`extract_links`-shaped table — the inbound-authority rollup a
    crawl scheduler and a quality prior both read. One partial-agged
    groupBy on the lowercased, port-stripped target host
    (``ops.urlstats.url_host`` — same normalization as the URL dedup
    path, so the two reports join on equal keys)."""
    from .urlstats import url_host

    return (
        links.select("doc_id", url_host(F.col("href")).alias("host"))
        .filter(F.col("host") != "")
        .groupBy("host")
        .agg(
            F.count("*").cast("long").alias("n_inlinks"),
            F.countDistinct("doc_id").cast("long").alias("n_source_docs"),
        )
    )


def extract_links(pages: DataFrame, html_col: str = "html",
                  id_col: str = "doc_id") -> DataFrame:
    """(doc_id, link_pos, href): every ``<a href="...">`` target in
    document order (1-based) — the outlink table a link-graph /
    PageRank stage consumes. Map-only + one generator; no shuffle."""
    h = F.col(html_col).cast("string")
    return pages.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.posexplode(F.regexp_extract_all(h, F.lit(_HREF_RE), 1)).alias(
            "p0", "href"
        ),
    ).select("doc_id", (F.col("p0") + 1).cast("long").alias("link_pos"), "href")
