"""Driver-local interactive fast path for SMALL indexes.

Spark's fixed per-job latency (~1 s in local mode) is the right price
for plans that survive 10^12 docs, but an interactive REPL user on a
40k-doc corpus feels it on every keystroke (the reference answers in
~4 ms in-process). This module closes that gap without touching the
scale path: collect the whole index ONCE into the pure-Python
reference-semantics oracle (`oracle/engine.py` — the same code pytest
proves rank-identical to the reference), then answer every query
in-process in microseconds-to-milliseconds.

Guarded by ``max_docs``: building the cache on a large index raises
instead of silently materializing a warehouse on the driver — callers
fall back to the distributed `rank_topk`/`boolean_query` paths
(repl.py does this automatically).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..indexing.build import SparkIndex
from ..oracle.engine import OracleIndex, boolean_query_docs, rank

DEFAULT_MAX_DOCS = 200_000


class IndexTooLargeError(ValueError):
    pass


def collect_local_index(index: SparkIndex,
                        max_docs: int = DEFAULT_MAX_DOCS) -> OracleIndex:
    """Materialize a SparkIndex into the in-process OracleIndex.

    One pass over each index table (postings iterated via
    toLocalIterator — no single giant collect buffer); postings lists
    keep ascending doc_id order, which the merge algorithms rely on."""
    n_docs, avg_dl = index.corpus_scalars()
    if n_docs > max_docs:
        raise IndexTooLargeError(
            f"{n_docs} docs > max_docs={max_docs}: use the distributed "
            "query path instead"
        )
    oidx = OracleIndex(n_docs=n_docs, avg_doc_length=avg_dl)
    rows = (
        index.postings.select("term", "doc_id", "tftd", "positions")
        .orderBy("term", "doc_id")
        .toLocalIterator()
    )
    for r in rows:
        oidx.postings.setdefault(r["term"], []).append(
            (r["doc_id"], r["tftd"], list(r["positions"]))
        )
    for r in (
        index.biword.select("term", "doc_id").orderBy("term", "doc_id")
        .toLocalIterator()
    ):
        lst = oidx.biword.setdefault(r["term"], [])
        if not lst or lst[-1] != r["doc_id"]:
            lst.append(r["doc_id"])
    for r in index.doc_stats.collect():
        did = r["doc_id"]
        oidx.doc_length[did] = float(r["doc_length"])
        oidx.ld[did] = float(r["Ld"])
        oidx.byte_size[did] = float(r["byte_size"])
        oidx.avg_tftd[did] = float(r["avg_tftd"])
    return oidx


class LocalQueryCache:
    """In-process query answering over a collected small index —
    identical results to the distributed engine (pytest-asserted),
    reference-grade latency."""

    def __init__(self, index: SparkIndex, max_docs: int = DEFAULT_MAX_DOCS):
        self.oidx = collect_local_index(index, max_docs)

    def rank_topk(self, query: str, strategy: str = "bm25",
                  k: int = 10) -> list[tuple[int, float]]:
        """[(doc_id, score)] best-first — reference tie-break
        (score desc, doc_id desc)."""
        return [(doc_id, score) for score, doc_id in
                rank(self.oidx, query, strategy, k)]

    def boolean(self, query: str) -> list[int]:
        """Sorted doc_ids matching the boolean query language
        (+ OR, space AND, - NOT, phrases, NEAR/k)."""
        return boolean_query_docs(self.oidx, query)
