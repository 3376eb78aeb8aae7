"""End-to-end evaluation parity: the MAP harness over the Spark engine
vs the pure-Python reference-semantics oracle on the synthetic pages
corpus — the full §3.3 lifecycle (index → rank → AP → MAP) both ways."""

from __future__ import annotations

import pytest

from searchengine_spark.corpus import make_page
from searchengine_spark.eval.metrics import average_precision, evaluate_ranking
from searchengine_spark.oracle import engine as oracle

QUERIES = (
    "camping in yosemite",
    "the national park",
    "search engine index",
    "whaling devils postpile",
    "strenuous historical bedford",
)
N_DOCS = 120
K = 20


@pytest.fixture(scope="module")
def pages():
    return [make_page(i) for i in range(N_DOCS)]


@pytest.fixture(scope="module")
def oidx(pages):
    docs = [(i, p["text"]) for i, p in enumerate(sorted(pages, key=lambda p: p["url"]))]
    sizes = {i: float(len(p["html"]))
             for i, p in enumerate(sorted(pages, key=lambda p: p["url"]))}
    return oracle.build_index(docs, byte_sizes=sizes)


@pytest.fixture(scope="module")
def sidx(spark, pages):
    from searchengine_spark.corpus import docs_from_pages, pages_df
    from searchengine_spark.indexing.build import build_index

    docs = docs_from_pages(pages_df(spark, N_DOCS, partitions=4))
    idx = build_index(docs, byte_size_col="byte_size").cache()
    idx.postings.count()
    return idx


def _qrels_oracle(oidx):
    return {q: set(oracle.boolean_query_docs(oidx, q)) for q in QUERIES}


def test_map_parity_bm25(spark, sidx, oidx):
    from searchengine_spark.queries.ranked import rank_topk

    qrels = _qrels_oracle(oidx)

    spark_res = evaluate_ranking(
        lambda q: rank_topk(sidx, q, "bm25", K), QUERIES, qrels, k=K
    )
    # oracle side: same harness math over the python engine
    oracle_aps = {}
    for q in QUERIES:
        ranked = [d for _, d in oracle.rank(oidx, q, "bm25", K)]
        oracle_aps[q] = average_precision(ranked, qrels[q])
    oracle_map = sum(oracle_aps.values()) / len(QUERIES)

    for q in QUERIES:
        assert spark_res["ap_per_query"][q] == pytest.approx(oracle_aps[q], abs=1e-12), q
    assert spark_res["map"] == pytest.approx(oracle_map, abs=1e-12)
    assert spark_res["throughput_qps"] > 0

    # the one-job batch harness must produce the identical MAP + APs
    from searchengine_spark.eval.metrics import evaluate_ranking_batch

    batch_res = evaluate_ranking_batch(sidx, QUERIES, "bm25", qrels, k=K)
    assert batch_res["ap_per_query"] == spark_res["ap_per_query"]
    assert batch_res["map"] == pytest.approx(spark_res["map"], abs=1e-15)


@pytest.mark.parametrize("strategy", ["default", "tfidf", "wacky"])
def test_rank_identity_all_strategies_pages(spark, sidx, oidx, strategy):
    from searchengine_spark.queries.ranked import rank_topk

    for q in QUERIES[:3]:
        want = [(d, pytest.approx(s, abs=1e-9))
                for s, d in oracle.rank(oidx, q, strategy, 10)]
        got = [(r["doc_id"], r["score"])
               for r in rank_topk(sidx, q, strategy, 10).collect()]
        assert [g[0] for g in got] == [w[0] for w in want], (strategy, q)
        for (gd, gs), (wd, ws) in zip(got, want):
            assert gs == ws, (strategy, q, gd)
