"""PageRank-blended ranking — blend semantics, the promote-from-
outside-top-k property, and graph-absent docs."""

import math

import pytest
from pyspark.sql import functions as F

from searchengine_spark.indexing.simple import (
    build_simple_index,
    simple_query_term,
)
from searchengine_spark.ops.linkgraph import SCALE, pagerank_fixedpoint
from searchengine_spark.queries.ranked import rank_scores
from searchengine_spark.queries.webrank import (
    blend_pagerank,
    rank_topk_pagerank,
)

# doc 1 is the best TEXT match; doc 3 is a weaker text match but the
# link hub every other doc points at (and its own outlink goes to a
# non-matching doc, so none of its authority leaks back to doc 1)
DOCS = [
    (1, "table table table scan"),
    (2, "table scan filler words here"),
    (3, "table scan words words words"),
    (4, "words only no match"),
    (5, "more words without any hit"),
    (6, "yet more filler text rows"),
]
EDGES = [(1, 3), (2, 3), (4, 3), (5, 3), (6, 3), (3, 4)]
N = len(DOCS)
QUERY = "table scan"


@pytest.fixture(scope="module")
def setup(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    idx = build_simple_index(docs)
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    ranks = pagerank_fixedpoint(edges, iters=3, n_nodes=N)
    return idx, edges, ranks


def test_blend_formula_and_left_join(spark, setup):
    idx, edges, ranks = setup
    scores = rank_scores(idx, QUERY, "bm25", normalize=simple_query_term)
    out = {r["doc_id"]: r for r in
           blend_pagerank(scores, ranks, N).collect()}
    rk = {r["node"]: r["rank_fp"] for r in ranks.collect()}
    for doc_id, row in out.items():
        want = row["score"] * math.log1p(rk.get(doc_id, 0) * N / SCALE)
        assert row["blended"] == pytest.approx(want, rel=1e-12)
        assert row["rank_fp"] == rk.get(doc_id, 0)


def test_authority_promotes_weak_text_match(spark, setup):
    idx, edges, ranks = setup
    # pure text: doc 1 on top
    scores = {r["doc_id"]: r["score"] for r in rank_scores(
        idx, QUERY, "bm25", normalize=simple_query_term).collect()}
    assert max(scores, key=scores.get) == 1
    # blended: the hub (doc 3) outranks it
    top = rank_topk_pagerank(idx, edges, QUERY, "bm25", k=N,
                             normalize=simple_query_term,
                             ranks=ranks, n_nodes=N).collect()
    assert top[0]["doc_id"] == 3
    # and the blended column is sorted desc
    blended = [r["blended"] for r in top]
    assert blended == sorted(blended, reverse=True)


def test_doc_absent_from_graph_gets_zero_blend(spark, setup):
    idx, _, _ = setup
    # a graph that never mentions docs 1/2/4
    edges = idx.postings.sparkSession.createDataFrame(
        [(3, 5), (5, 3)], "src long, dst long")
    top = rank_topk_pagerank(idx, edges, QUERY, "bm25", k=N,
                             normalize=simple_query_term).collect()
    by_doc = {r["doc_id"]: r for r in top}
    assert by_doc[1]["rank_fp"] == 0 and by_doc[1]["blended"] == 0.0
    assert by_doc[3]["rank_fp"] > 0 and by_doc[3]["blended"] > 0.0
    assert top[0]["doc_id"] == 3  # the only endorsed match wins


def test_blend_happens_before_topk(spark, setup):
    idx, edges, ranks = setup
    # k=1: the winner must be the hub even though the text top-1 is doc 1
    top = rank_topk_pagerank(idx, edges, QUERY, "bm25", k=1,
                             normalize=simple_query_term,
                             ranks=ranks, n_nodes=N).collect()
    assert [r["doc_id"] for r in top] == [3]


def test_blend_survives_huge_rank_times_nodes(spark):
    # ADVICE r4: rank_fp * n_nodes multiplied in int64 wraps once the
    # product exceeds 2^63 (hub page at web scale) -> log(negative) ->
    # NULL blended score. The double cast must happen BEFORE the multiply.
    n_nodes = 2 ** 24  # ~16.7M pages
    scores = spark.createDataFrame([(1, 1.0)], "doc_id long, score double")
    ranks = spark.createDataFrame(
        [(1, SCALE)], "node long, rank_fp long")  # a hub holding ALL rank
    row = blend_pagerank(scores, ranks, n_nodes).collect()[0]
    assert row["blended"] is not None
    assert row["blended"] == pytest.approx(math.log1p(float(n_nodes)), rel=1e-12)
