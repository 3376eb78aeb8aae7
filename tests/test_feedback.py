"""Rocchio pseudo-relevance feedback — expansion weights vs a python
twin, exclusion of original terms, and the end-to-end re-rank pulling
in a doc the original query cannot match."""

import math
import re

import pytest
from pyspark.sql import functions as F

from searchengine_spark.indexing.simple import (
    build_simple_index,
    simple_query_term,
)
from searchengine_spark.queries.feedback import (
    prf_expansion_terms,
    rank_topk_prf,
)
from searchengine_spark.queries.ranked import rank_topk

# 'engine' co-occurs with the query terms in the top docs; doc 6
# contains ONLY 'engine', so the original query can never retrieve it
DOCS = [
    (1, "table scan engine table"),
    (2, "table scan engine speed"),
    (3, "table scan engine other"),
    (4, "table noise words here"),
    (5, "unrelated filler text block"),
    (6, "engine engine standalone document"),
]
QUERY = "table scan"


@pytest.fixture(scope="module")
def setup(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return build_simple_index(docs), docs


def _py_expansion(fb_doc_ids, qterms, fb_docs, beta=0.75):
    toks = {d: re.findall("[a-z0-9]+", t.lower()) for d, t in DOCS}
    n = len(DOCS)
    df = {}
    for d, ts in toks.items():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    w = {}
    for d in fb_doc_ids:
        for t in set(toks[d]):
            if t in qterms:
                continue
            tf = toks[d].count(t)
            w[t] = w.get(t, 0.0) + (1 + math.log(tf)) * math.log(1 + n / df[t])
    return {t: beta / fb_docs * v for t, v in w.items()}


def test_expansion_matches_python_twin(spark, setup):
    idx, docs = setup
    fb_docs, fb_terms = 3, 4
    top = [r["doc_id"] for r in rank_topk(
        idx, QUERY, "bm25", fb_docs, normalize=simple_query_term).collect()]
    want = _py_expansion(top, {"table", "scan"}, fb_docs)
    got = prf_expansion_terms(idx, docs, QUERY, "bm25", fb_docs, fb_terms,
                              normalize=simple_query_term).collect()
    order = sorted(want, key=lambda t: (-want[t], t))[:fb_terms]
    assert [r["term"] for r in got] == order
    for r in got:
        assert r["weight"] == pytest.approx(want[r["term"]], rel=1e-12)
    assert not {"table", "scan"} & {r["term"] for r in got}


def test_prf_rerank_retrieves_unreachable_doc(spark, setup):
    idx, docs = setup
    base = {r["doc_id"] for r in rank_topk(
        idx, QUERY, "bm25", 10, normalize=simple_query_term).collect()}
    assert 6 not in base  # no original term in doc 6
    expanded = {r["doc_id"] for r in rank_topk_prf(
        idx, docs, QUERY, "bm25", k=10, fb_docs=3, fb_terms=1,
        normalize=simple_query_term).collect()}
    assert 6 in expanded  # 'engine' was the top expansion term


def test_expansion_empty_when_feedback_docs_add_nothing(spark):
    docs = spark.createDataFrame(
        [(1, "table scan"), (2, "table scan")], "doc_id long, text string")
    idx = build_simple_index(docs)
    got = prf_expansion_terms(idx, docs, QUERY, "bm25", 2, 5,
                              normalize=simple_query_term).collect()
    assert got == []


def test_divisor_is_actual_feedback_count_not_nominal_k(spark, setup):
    # ADVICE r4: weights divided by the fb_docs parameter even when
    # fewer docs match; the divisor must be the actual |D_fb|
    idx, docs = setup
    # only 4 docs contain a query term, so fb_docs=10 retrieves 4
    a = {r["term"]: r["weight"] for r in prf_expansion_terms(
        idx, docs, QUERY, "bm25", fb_docs=10, fb_terms=5,
        normalize=simple_query_term).collect()}
    b = {r["term"]: r["weight"] for r in prf_expansion_terms(
        idx, docs, QUERY, "bm25", fb_docs=4, fb_terms=5,
        normalize=simple_query_term).collect()}
    assert set(a) == set(b)
    for t in a:
        assert a[t] == pytest.approx(b[t], rel=1e-12)
