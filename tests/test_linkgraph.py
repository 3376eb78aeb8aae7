"""Link-graph ops (ops/linkgraph.py): fixed-point PageRank vs an
independent pure-Python replay, plus degree stats."""

from collections import defaultdict

from searchengine_spark.ops.linkgraph import (
    DAMP_DEN,
    DAMP_NUM,
    SCALE,
    degree_stats,
    pagerank_fixedpoint,
)


def _py_pagerank(edges, iters=3):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    outdeg = defaultdict(int)
    for u, _ in edges:
        outdeg[u] += 1
    base = ((DAMP_DEN - DAMP_NUM) * (SCALE // n)) // DAMP_DEN
    rank = {v: SCALE // n for v in nodes}
    for _ in range(iters):
        s = defaultdict(int)
        for u, v in edges:
            s[v] += rank[u] // outdeg[u]
        rank = {v: base + (DAMP_NUM * s[v]) // DAMP_DEN for v in nodes}
    return rank


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def test_pagerank_matches_python_replay(spark):
    # ring + chords + a hub: mixed in/out degrees, no dangling sinks
    edges = [(i, (i + 1) % 7) for i in range(7)]
    edges += [(0, 3), (2, 5), (4, 0), (6, 3), (1, 3)]
    got = {
        r["node"]: r["rank_fp"]
        for r in pagerank_fixedpoint(_edges_df(spark, edges), iters=3).collect()
    }
    assert got == _py_pagerank(edges, iters=3)
    # node 3 (3 in-links) ranks in the top 2; node 2 (1 in-link from a
    # high-outdegree source) ranks last
    top2 = sorted(got, key=got.get, reverse=True)[:2]
    assert 3 in top2
    assert min(got, key=got.get) == 2


def test_pagerank_dangling_node_gets_base_only(spark):
    # 9 is a pure sink: evaporating-mass contract means its rank is
    # base + damped in-flow, and its own mass goes nowhere
    edges = [(1, 9), (2, 9), (1, 2)]
    got = {
        r["node"]: r["rank_fp"]
        for r in pagerank_fixedpoint(_edges_df(spark, edges), iters=3).collect()
    }
    assert got == _py_pagerank(edges, iters=3)
    assert got[9] > got[2] > got[1] * 0  # sink collects the most


def test_pagerank_empty_edges(spark):
    out = pagerank_fixedpoint(_edges_df(spark, []), iters=3)
    assert out.count() == 0


def test_degree_stats(spark):
    edges = [(1, 2), (1, 3), (2, 3), (3, 1)]
    got = {
        r["node"]: (r["out_degree"], r["in_degree"])
        for r in degree_stats(_edges_df(spark, edges)).collect()
    }
    assert got == {1: (2, 1), 2: (1, 1), 3: (1, 2)}
