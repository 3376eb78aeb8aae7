"""REPL surface tests (§2.7 special commands, main.py:261-392)."""

from __future__ import annotations

import json

import pytest


@pytest.fixture(scope="module")
def repl(spark, tmp_path_factory):
    from searchengine_spark.repl import Repl

    d = tmp_path_factory.mktemp("corpus")
    docs = [
        ("pets1.txt", "cats jump high"),
        ("pets2.txt", "dogs run fast"),
        ("pets3.txt", "dogs and cats are pets"),
    ]
    for name, text in docs:
        (d / name).write_text(text)
    return Repl(spark, str(d))


def test_repl_index_and_boolean(repl):
    out = repl.handle("cats")
    assert out.endswith("2 documents")
    assert "pets1" in out and "pets3" in out


def test_repl_stem(repl):
    assert repl.handle(":stem running") == "run"
    assert repl.handle(":stem Hewlett-Packard") == "hewlettpackard hewlett packard"


def test_repl_vocab(repl):
    out = repl.handle(":vocab")
    assert "cat" in out.splitlines() and out.endswith("terms total")


def test_repl_style_and_formula_toggle(repl):
    assert repl.handle(":querystyle") == "query style: ranked"
    ranked_out = repl.handle("cats dogs")
    assert len(ranked_out.splitlines()) > 0  # scored lines
    assert repl.handle(":rankformula").startswith("rank formula:")
    assert repl.handle(":querystyle") == "query style: boolean"


def test_repl_quit(repl):
    assert repl.handle(":q") is None


def test_repl_author_search(spark, tmp_path):
    from searchengine_spark.repl import Repl

    for i, (author, body) in enumerate(
        [("smith", "alpha beta"), ("smyth", "gamma delta"), ("jones", "epsilon")]
    ):
        (tmp_path / f"d{i}.json").write_text(
            json.dumps({"title": f"T{i}", "body": body, "author": author})
        )
    r = Repl(spark, str(tmp_path), json_corpus=True)
    out = r.handle(":author smith")
    # smith and smyth share a soundex code; jones does not
    assert "smith" in out and "smyth" in out and "jones" not in out

def test_local_fast_path_matches_distributed(spark):
    """LocalQueryCache answers == the distributed engine's, for both
    ranked (all strategies) and boolean queries, on a real docs table."""
    import time

    from pyspark.sql import functions as F

    from searchengine_spark.indexing.build import build_index
    from searchengine_spark.queries.engine import boolean_query
    from searchengine_spark.queries.local import LocalQueryCache
    from searchengine_spark.queries.ranked import STRATEGIES, rank_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = build_index(docs, persist=True).cache()
    idx.postings.count()
    local = LocalQueryCache(idx)

    for q in ("table scan merge", "customer line value"):
        for strategy in STRATEGIES:
            dist = [
                (r["doc_id"], round(r["score"], 9))
                for r in rank_topk(idx, q, strategy, 10).collect()
            ]
            t0 = time.time()
            loc = [(d, round(s, 9)) for d, s in local.rank_topk(q, strategy, 10)]
            took = time.time() - t0
            assert loc == dist, (strategy, q)
            assert took < 0.1  # interactive-grade latency

    for q in ("table scan", "query + window", "table -stream",
              '"customer line"'):
        dist = sorted(r["doc_id"] for r in boolean_query(idx, q).collect())
        assert local.boolean(q) == dist, q


def test_local_cache_guard():
    import pytest as _pytest

    from searchengine_spark.queries.local import (
        IndexTooLargeError,
        collect_local_index,
    )

    class FakeIndex:
        def corpus_scalars(self):
            return (10_000_000, 100.0)

    with _pytest.raises(IndexTooLargeError):
        collect_local_index(FakeIndex())
