"""Snippet extraction — best-window selection checked against a
brute-force scan over every possible window start."""

import re

import pytest
from pyspark.sql import functions as F

from searchengine_spark.indexing.simple import (
    build_simple_index,
    simple_query_term,
)
from searchengine_spark.queries.snippets import (
    best_windows,
    query_hits,
    snippets_topk,
)

DOCS = [
    (1, "table scan merge table batch merge a hash join"),
    (2, "scan line customer merge line scan scan column"),
    (3, "the the the table the the the scan merge table"),
    (4, "merge merge merge merge nothing else here"),
    (5, "no query words at all in this document"),
    (6, "table"),
]
TERMS = ["table", "scan", "merge"]
WIDTH = 4


def _brute_best(text, terms, width):
    toks = re.findall("[a-z0-9]+", text.lower())
    hit_pos = [i + 1 for i, t in enumerate(toks) if t in terms]
    if not hit_pos:
        return None
    best = None
    for start in range(1, len(toks) + 1):
        win = toks[start - 1:start - 1 + width]
        n_terms = len({t for t in win if t in terms})
        hits = sum(1 for t in win if t in terms)
        key = (-n_terms, -hits, start)
        if best is None or key < best[0]:
            best = (key, start, n_terms, hits)
    return best[1], best[2], best[3]


@pytest.fixture(scope="module")
def idx(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return build_simple_index(docs)


def test_best_windows_match_bruteforce(spark, idx):
    subset = spark.createDataFrame([(i,) for i, _ in DOCS], "doc_id long")
    hits = query_hits(idx, TERMS, subset)
    got = {
        r["doc_id"]: (r["win_start"], r["n_terms"], r["hits"])
        for r in best_windows(hits, WIDTH).collect()
    }
    for doc_id, text in DOCS:
        want = _brute_best(text, TERMS, WIDTH)
        if want is None:
            assert doc_id not in got
        else:
            # engine candidates are hit starts only; a brute-force
            # optimum that starts off-hit has an equal-valued hit-start
            # twin (dropping leading non-hits never loses a hit)
            g = got[doc_id]
            assert (g[1], g[2]) == (want[1], want[2]), doc_id
            b = _brute_best(text, TERMS, WIDTH)
            assert g[0] >= b[0]


def test_best_window_value_equals_bruteforce_value(spark, idx):
    # the (n_terms, hits) of the chosen window must equal the global
    # optimum even when the brute-force scan allows non-hit starts
    subset = spark.createDataFrame([(i,) for i, _ in DOCS], "doc_id long")
    hits = query_hits(idx, TERMS, subset)
    got = {r["doc_id"]: (r["n_terms"], r["hits"])
           for r in best_windows(hits, WIDTH).collect()}
    for doc_id, text in DOCS:
        want = _brute_best(text, TERMS, WIDTH)
        if want:
            assert got[doc_id] == (want[1], want[2])


def test_snippets_topk_renders_window_text(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    idx2 = build_simple_index(docs)
    out = snippets_topk(idx2, docs, "table scan merge", "bm25", k=10,
                        width=WIDTH, normalize=simple_query_term)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert 5 not in rows  # scores nothing, never ranked
    for doc_id, text in DOCS:
        if doc_id not in rows:
            continue
        toks = re.findall("[a-z0-9]+", text.lower())
        r = rows[doc_id]
        start = r["win_start"]
        assert r["snippet"] == " ".join(toks[start - 1:start - 1 + WIDTH])
        # snippet contains at least one query term
        assert set(r["snippet"].split()) & set(TERMS)


def test_snippet_clips_at_document_end(spark):
    docs = spark.createDataFrame([(1, "only a table")], "doc_id long, text string")
    idx2 = build_simple_index(docs)
    out = snippets_topk(idx2, docs, "table", "bm25", k=1, width=8,
                        normalize=simple_query_term).collect()
    assert out[0]["snippet"] == "table"  # slice clips, no padding
    assert out[0]["win_start"] == 3
