"""Reciprocal Rank Fusion — formula vs a python twin, rank-source tie
conventions, and the fusion properties (consensus wins, single-list
docs survive)."""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.queries.hybrid import rrf_fuse, with_rank


def _py_rrf(lists, c=60):
    scores = {}
    counts = {}
    for ranking in lists:
        for rank, doc in enumerate(ranking, 1):
            scores[doc] = scores.get(doc, 0.0) + 1.0 / (c + rank)
            counts[doc] = counts.get(doc, 0) + 1
    order = sorted(scores, key=lambda d: (-scores[d], d))
    return order, scores, counts


def _ranked_df(spark, ranking):
    return spark.createDataFrame(
        [(d, i + 1) for i, d in enumerate(ranking)], "id long, rank long")


def test_rrf_matches_python_twin(spark):
    lex = [5, 3, 9, 1, 7]
    dense = [3, 8, 5, 2]
    order, scores, counts = _py_rrf([lex, dense])
    got = rrf_fuse(
        {"lex": _ranked_df(spark, lex), "dense": _ranked_df(spark, dense)},
        k=10).collect()
    assert [r["doc_id"] for r in got] == order
    for r in got:
        assert r["rrf_score"] == pytest.approx(scores[r["doc_id"]], rel=0)
        assert r["n_lists"] == counts[r["doc_id"]]


def test_consensus_beats_single_list_head(spark):
    # doc 9 is rank 2 in BOTH lists; doc 1 and doc 2 are rank-1 in one
    # list each. 2/(c+2) > 1/(c+1): consensus wins under RRF.
    got = rrf_fuse(
        {"a": _ranked_df(spark, [1, 9, 3]),
         "b": _ranked_df(spark, [2, 9, 4])},
        k=1).collect()
    assert got[0]["doc_id"] == 9 and got[0]["n_lists"] == 2


def test_with_rank_tie_conventions(spark):
    df = spark.createDataFrame(
        [(1, 2.0), (2, 2.0), (3, 1.0)], "doc_id long, score double")
    desc = {r["id"]: r["rank"] for r in
            with_rank(df, "score", "doc_id", id_ties_desc=True).collect()}
    asc = {r["id"]: r["rank"] for r in
           with_rank(df, "score", "doc_id", id_ties_desc=False).collect()}
    assert desc == {2: 1, 1: 2, 3: 3}  # BM25 heap: doc_id desc on ties
    assert asc == {1: 1, 2: 2, 3: 3}   # cosine path: id asc on ties


def test_fused_topk_truncates_after_fusion(spark):
    # a doc at the tail of both lists can outrank a doc at the head of
    # one — so truncation must happen after fusion, which k=1 exposes
    got = rrf_fuse(
        {"a": _ranked_df(spark, [1, 2, 9]),
         "b": _ranked_df(spark, [3, 4, 9])},
        k=2).collect()
    assert [r["doc_id"] for r in got][0] == 9
