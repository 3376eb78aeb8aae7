"""Duplicate-aware serving — one result per cluster, next-distinct
promotion, singleton fallback."""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.indexing.simple import (
    build_simple_index,
    simple_query_term,
)
from searchengine_spark.queries.diversify import rank_topk_diverse
from searchengine_spark.queries.ranked import rank_topk

# docs 1 and 2 are near-identical twins (one cluster) and the two best
# text matches; doc 3 is the next distinct match; doc 4 never matches
DOCS = [
    (1, "table scan table scan merge"),
    (2, "table scan table scan merge extra"),
    (3, "table words words scan words"),
    (4, "irrelevant filler text"),
]
QUERY = "table scan"


@pytest.fixture(scope="module")
def setup(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    idx = build_simple_index(docs)
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1)], "doc_id long, cluster_id long")
    return idx, clusters


def test_one_result_per_cluster_next_distinct_promoted(spark, setup):
    idx, clusters = setup
    text_top2 = [r["doc_id"] for r in rank_topk(
        idx, QUERY, "bm25", 2, normalize=simple_query_term).collect()]
    assert set(text_top2) == {1, 2}  # the twins own the text top-2
    got = rank_topk_diverse(idx, QUERY, clusters, "bm25", k=2,
                            normalize=simple_query_term).collect()
    ids = [r["doc_id"] for r in got]
    assert len(set(ids)) == 2 and 3 in ids  # doc 3 promoted into k=2
    assert len({1, 2} & set(ids)) == 1      # exactly one twin survives
    # the surviving twin is the cluster's best scorer
    scores = {r["doc_id"]: r["score"] for r in rank_topk(
        idx, QUERY, "bm25", 10, normalize=simple_query_term).collect()}
    twin = ({1, 2} & set(ids)).pop()
    assert scores[twin] == max(scores[1], scores[2])


def test_unclustered_docs_are_singletons(spark, setup):
    idx, _ = setup
    empty = idx.postings.sparkSession.createDataFrame(
        [], "doc_id long, cluster_id long")
    got = rank_topk_diverse(idx, QUERY, empty, "bm25", k=10,
                            normalize=simple_query_term).collect()
    want = rank_topk(idx, QUERY, "bm25", 10,
                     normalize=simple_query_term).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
    for g in got:
        assert g["cluster_id"] == g["doc_id"]


def test_cluster_id_column_reports_membership(spark, setup):
    idx, clusters = setup
    got = {r["doc_id"]: r["cluster_id"] for r in rank_topk_diverse(
        idx, QUERY, clusters, "bm25", k=10,
        normalize=simple_query_term).collect()}
    for d, c in got.items():
        assert c == (1 if d in (1, 2) else d)
