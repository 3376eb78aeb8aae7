"""BM25F fielded ranking — degeneracy to the reference BM25 on a
single weight-1 field, field-weight semantics, and the
fold-before-saturation property that distinguishes BM25F from a
per-field score sum."""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.indexing.fielded import (
    build_fielded_index,
    rank_topk_fielded,
)
from searchengine_spark.indexing.simple import (
    build_simple_index,
    simple_query_term,
)
from searchengine_spark.queries.ranked import rank_topk

DOCS = [
    (1, "big table", "table scan merge table batch"),
    (2, "data notes", "table scan filler words here and more"),
    (3, "scan report", "words words words words table"),
    (4, "other title", "nothing relevant at all"),
]
QUERY = "table scan"


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, title string, body string").cache()


def test_single_field_weight1_degenerates_to_reference_bm25(spark, frame):
    body_only = frame.select("doc_id", F.col("body").alias("text"))
    idx = build_simple_index(body_only)
    want = {r["doc_id"]: r["score"] for r in rank_topk(
        idx, QUERY, "bm25", k=10, normalize=simple_query_term).collect()}
    fidx = build_fielded_index(frame, {"body": 1.0})
    got = {r["doc_id"]: r["score"] for r in rank_topk_fielded(
        fidx, QUERY, k=10, normalize=simple_query_term).collect()}
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12)


def test_title_weight_promotes_title_hits(spark, frame):
    # body-only weights: doc 1 (two 'table' + 'scan' in a short body) wins
    flat = rank_topk_fielded(
        build_fielded_index(frame, {"title": 1.0, "body": 1.0}),
        QUERY, k=4, normalize=simple_query_term).collect()
    # crank the title weight: doc 3 ('scan' in title) must beat doc 2
    # (both terms only in a longer body)
    boosted = rank_topk_fielded(
        build_fielded_index(frame, {"title": 10.0, "body": 1.0}),
        QUERY, k=4, normalize=simple_query_term).collect()
    rank_of = lambda rows, d: [r["doc_id"] for r in rows].index(d)  # noqa: E731
    assert rank_of(boosted, 3) < rank_of(boosted, 2)
    # and doc 1's title 'table' keeps it at the head
    assert boosted[0]["doc_id"] == 1
    assert len(flat) == len(boosted) == 3  # doc 4 never matches


def test_weighted_pseudo_frequencies_fold_before_saturation(spark):
    # one term in BOTH fields of one doc vs the same total weight in a
    # single field of another: fold-first BM25F must give them EQUAL
    # scores (equal wtf, equal wdl), while a per-field BM25 sum would
    # saturate each field separately and rank them apart.
    docs = spark.createDataFrame(
        [(1, "x x", "y y y y"), (2, "y y", "x x y y")],
        "doc_id long, title string, body string")
    fidx = build_fielded_index(docs, {"title": 1.0, "body": 1.0})
    got = {r["doc_id"]: r["score"] for r in rank_topk_fielded(
        fidx, "x", k=2, normalize=simple_query_term).collect()}
    # doc1: wtf(x)=2 (title), doc2: wtf(x)=2 (body); wdl both 6
    assert got[1] == pytest.approx(got[2], rel=1e-12)


def test_empty_query_and_missing_term(spark, frame):
    fidx = build_fielded_index(frame, {"title": 2.0, "body": 1.0})
    assert rank_topk_fielded(fidx, "zzz qqq",
                             normalize=simple_query_term).count() == 0


def test_rejects_empty_field_map(spark, frame):
    with pytest.raises(ValueError):
        build_fielded_index(frame, {})


def test_null_field_is_empty_field_not_document_killer(spark):
    # a NULL title must not drop the document from postings / n_docs
    # (ADVICE r4: NULL propagated through concat + the wdl sum)
    docs = spark.createDataFrame(
        [(1, "big table", "table scan merge"),
         (2, None, "table scan filler")],
        "doc_id long, title string, body string")
    fidx = build_fielded_index(docs, {"title": 2.0, "body": 1.0})
    n_docs, avg_wdl = fidx.corpus_scalars()
    assert n_docs == 2
    by_doc = {r["doc_id"]: r for r in fidx.postings.collect() if r["term"] == "table"}
    assert set(by_doc) == {1, 2}
    # doc 2's wdl is body-only (3 tokens * 1.0); doc 1 adds 2*2.0 title
    assert by_doc[2]["wdl"] == pytest.approx(3.0)
    assert by_doc[1]["wdl"] == pytest.approx(7.0)
    # and both docs are rankable
    got = {r["doc_id"] for r in rank_topk_fielded(
        fidx, QUERY, k=10, normalize=simple_query_term).collect()}
    assert got == {1, 2}


def test_anchor_field_decides_planted_query(spark):
    """Anchor text as a third BM25F field: a term that appears ONLY in
    other pages' anchor text toward a doc must rank that doc first —
    the off-page signal the reference's single-field scorer cannot
    express. Also pins anchor_field's deterministic inlink order."""
    from searchengine_spark.ops.html import anchor_field, extract_anchors

    pages = spark.createDataFrame(
        [
            (1, '<html><head><title>alpha</title></head><body>'
                '<p>table scan body</p>'
                '<a href="http://x.com/l/3">best spark engine</a>'
                '</body></html>'),
            (2, '<html><head><title>beta</title></head><body>'
                '<p>table scan body words</p>'
                '<a href="http://x.com/l/3">spark engine docs</a>'
                '</body></html>'),
            (3, '<html><head><title>gamma</title></head><body>'
                '<p>plain page about tables</p></body></html>'),
        ],
        "doc_id long, html string")
    from searchengine_spark.ops.html import extract_visible_text

    fields_df = extract_visible_text(pages)
    anch = anchor_field(
        extract_anchors(pages),
        F.regexp_extract(F.col("href"), r"/l/([0-9]+)$", 1).cast("long"))
    rows = {r["doc_id"]: r["anchor"] for r in anch.collect()}
    # deterministic (src, link_pos) order of the concatenated field
    assert rows == {3: "best spark engine spark engine docs"}

    fidx = build_fielded_index(
        fields_df.join(anch, "doc_id", "left"),
        {"title": 2.0, "text": 1.0, "anchor": 3.0})
    # 'engine' never occurs in doc 3's own title/body — only inlink
    # anchors carry it; the anchor field must put doc 3 on top
    top = rank_topk_fielded(fidx, "engine", k=3,
                            normalize=simple_query_term).collect()
    assert top[0]["doc_id"] == 3
    # and a doc with no inlinks still ranks on its own fields
    top2 = rank_topk_fielded(fidx, "gamma", k=3,
                             normalize=simple_query_term).collect()
    assert top2[0]["doc_id"] == 3
