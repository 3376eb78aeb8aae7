"""The assembled result page — correction rewires retrieval, snippets
attach to diversified survivors, conservative rewrite policy."""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.indexing.simple import (
    build_simple_index,
    simple_query_term,
)
from searchengine_spark.queries.result_page import search_page

DOCS = [
    (1, "table scan table scan merge"),
    (2, "table scan table scan merge extra"),
    (3, "table words words scan words"),
    (4, "irrelevant filler text"),
]


@pytest.fixture(scope="module")
def setup(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    idx = build_simple_index(docs)
    vocab = idx.postings.groupBy("term").agg(
        F.count("*").cast("long").alias("df")).cache()
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1)], "doc_id long, cluster_id long")
    return docs, idx, vocab, clusters


def test_page_has_diversified_results_with_snippets(spark, setup):
    docs, idx, vocab, clusters = setup
    results, dym = search_page(idx, docs, "table scan", clusters=clusters,
                               k=3, width=3, normalize=simple_query_term,
                               vocab=vocab)
    assert dym is None
    rows = results.collect()
    ids = [r["doc_id"] for r in rows]
    assert len({1, 2} & set(ids)) == 1  # one twin suppressed
    assert 3 in ids
    for r in rows:
        assert r["snippet"] and "table" in r["snippet"] or "scan" in r["snippet"]
        assert len(r["snippet"].split()) <= 3


def test_misspelled_query_is_corrected_and_reported(spark, setup):
    docs, idx, vocab, clusters = setup
    results, dym = search_page(idx, docs, "tble scann", clusters=clusters,
                               k=3, normalize=simple_query_term, vocab=vocab)
    assert dym == "table scan"
    assert results.count() > 0  # corrected query actually ran


def test_partially_valid_query_runs_as_typed(spark, setup):
    docs, idx, vocab, clusters = setup
    # 'table' is in vocabulary -> conservative policy: no rewrite
    results, dym = search_page(idx, docs, "table scann", clusters=clusters,
                               k=3, normalize=simple_query_term, vocab=vocab)
    assert dym is None


def test_no_clusters_means_no_suppression(spark, setup):
    docs, idx, vocab, _ = setup
    results, _ = search_page(idx, docs, "table scan", clusters=None, k=3,
                             normalize=simple_query_term, vocab=vocab)
    ids = {r["doc_id"] for r in results.collect()}
    assert {1, 2} <= ids  # both twins present without a cluster table


def test_default_normalizer_applies_correction(spark):
    # ADVICE r4: with normalize=None the rebuild loop used the RAW
    # token to look up fixes keyed by the normalized term, so any
    # non-identity normalization (uppercase here) silently skipped the
    # correction. 'disk'/'scan' are Porter2 fixed points, so the
    # default rank-mode normalizer maps DSK->dsk, SCN->scn.
    docs = spark.createDataFrame(
        [(1, "disk scan disk merge"), (2, "disk scan rows")],
        "doc_id long, text string")
    idx = build_simple_index(docs)
    vocab = idx.postings.groupBy("term").agg(
        F.count("*").cast("long").alias("df"))
    results, dym = search_page(idx, docs, "DSK SCN", k=2, vocab=vocab,
                               normalize=None)
    assert dym == "disk scan"
    assert results.count() > 0
