"""Cranfield relevance eval on the REFERENCE'S OWN corpus + queries +
qrels (/root/reference/relevance_cranfield: 1402 json docs, 225 queries)
— the real-workload parity check round 1 lacked.

Both sides index the SAME files and answer the SAME raw query lines
(including trailing newlines, exactly as the reference driver feeds
them, main_precision_recall_all_queries.py:150-152):

* Spark side: ``sources.directory.load_json_directory`` →
  ``indexing.build.build_index`` (Arrow pandas-UDF reference-parity
  analyzer) → ``queries.ranked.rank_topk_batch`` (ALL 225 queries per
  strategy in ONE job, K=50).
* Reference side: its own classes end to end — the indexing loop
  transcribed from main_precision_recall_all_queries.py:18-80 (the
  driver's loop lives inside ``if __name__``-level code that opens
  stdin-independent files relative to cwd, so it cannot be imported),
  then DiskIndexWriter → DiskPositionalIndex → the four
  ranked_strategy classes with heapq.nlargest(K).

Compared per (strategy, query): the top-K (file_name, score) multiset
rounded to 1e-9 — rank identity. Then MAP per strategy on both sides
with the reference's AP formula (precision at hit ranks ÷ |relevant|,
main_precision_recall_all_queries.py:190-208) against the shipped qrel.

Usage: python tools/cranfield_eval.py [--n-docs N] [--n-queries M] [--k K]
Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import heapq
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

from tools.reference_benchmark import install_porter2_stub  # noqa: E402

CRANFIELD = "/root/reference/relevance_cranfield"
STRATEGY_NAMES = ("default", "tfidf", "bm25", "wacky")


def load_queries_and_qrels(n_queries: int | None):
    with open(f"{CRANFIELD}/relevance/queries") as fh:
        queries = fh.readlines()  # raw lines incl. '\n' — as the reference
    with open(f"{CRANFIELD}/relevance/qrel") as fh:
        qrels = [
            [int(x) for x in line.split()] for line in fh.readlines()
        ]
    if n_queries:
        queries, qrels = queries[:n_queries], qrels[:n_queries]
    return queries, qrels


def corpus_dir(n_docs: int | None) -> tuple[str, bool]:
    """Full corpus dir, or a temp dir of symlinks to the first N docs
    (subset mode — both engines index the identical subset)."""
    if not n_docs:
        return CRANFIELD, False
    files = sorted(
        f for f in os.listdir(CRANFIELD) if f.endswith(".json")
    )[:n_docs]
    tmp = tempfile.mkdtemp(prefix="cranfield_sub_")
    for f in files:
        os.symlink(os.path.join(CRANFIELD, f), os.path.join(tmp, f))
    return tmp, True


def average_precision_reference(result_file_ids: list[int],
                                relevant: list[int]) -> float:
    """AP exactly as main_precision_recall_all_queries.py:190-208."""
    relevant_count, total = 0, 0.0
    for j, doc in enumerate(result_file_ids):
        if doc in relevant:
            relevant_count += 1
            total += relevant_count / (j + 1)
    return total / len(relevant)


def build_reference_disk_index(path: str, index_dir: str):
    """Indexing loop transcribed from
    main_precision_recall_all_queries.py:18-80 (index_corpus): the
    SIMPLE per-token loop (no pairwise/biword pass), driving the
    reference's own corpus/tokenizer/index/writer classes."""
    from math import sqrt

    from documents.directorycorpus import DirectoryCorpus
    from indexes.positionalinvertedindex import PositionalInvertedIndex
    from numpy import log as ln
    from text.englishtokenstream import EnglishTokenStream
    from text.newtokenprocessor import NewTokenProcessor

    corpus = DirectoryCorpus.load_json_directory(path, ".json")
    token_processor = NewTokenProcessor()
    index = PositionalInvertedIndex()
    document_weights, doc_lengths, byte_sizes, average_tftds = [], [], [], []
    total_tokens = 0
    id_to_file = {}
    n_docs = 0
    for d in corpus:
        n_docs += 1
        id_to_file[d.id] = d.get_file_name()
        term_tftd: dict = {}
        stream = EnglishTokenStream(d.get_content())
        doc_len = 0
        position = 1
        for token in stream:
            terms = token_processor.process_token(token)
            for term in terms:
                term_tftd[term] = term_tftd.get(term, 0) + 1
                index.add_term(term=term, position=position, doc_id=d.id)
            position += 1
            doc_len += 1
        ld = sqrt(sum((1 + ln(tftd)) ** 2 for tftd in term_tftd.values()))
        document_weights.append(ld)
        doc_lengths.append(doc_len)
        total_tokens += doc_len
        average_tftds.append(
            sum(term_tftd.values()) / len(term_tftd) if term_tftd else 0
        )
        byte_sizes.append(d.get_file_size())
    avg_tokens = total_tokens / n_docs

    from diskindexwriter import DiskIndexWriter

    writer = DiskIndexWriter(
        Path(index_dir),
        document_weights=document_weights,
        docLengthd=doc_lengths,
        byteSized=byte_sizes,
        average_tftd=average_tftds,
        document_tokens_length_average=avg_tokens,
    )
    writer.write_index(index)

    from indexes.diskpositionalindex import DiskPositionalIndex

    return DiskPositionalIndex(writer, num_docs=n_docs), n_docs, id_to_file


def reference_rank(disk_index, n_docs: int, query: str, strategy: str, k: int):
    import ranked_strategy as rs

    strat = {
        "default": rs.DefaultStrategy,
        "tfidf": rs.TraditionalStrategy,
        "bm25": rs.OkapiBM25Strategy,
        "wacky": rs.WackyStrategy,
    }[strategy]()
    acc = strat.calculate(query=query, disk_index=disk_index,
                          corpus_size=n_docs)
    return heapq.nlargest(k, [(score, doc_id) for doc_id, score in acc.items()])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=None)
    ap.add_argument("--n-queries", type=int, default=None)
    ap.add_argument("--k", type=int, default=50)
    ap.add_argument("--strategies", default=",".join(STRATEGY_NAMES))
    args = ap.parse_args()
    strategies = args.strategies.split(",")

    queries, qrels = load_queries_and_qrels(args.n_queries)
    path, is_tmp = corpus_dir(args.n_docs)
    index_dir = tempfile.mkdtemp(prefix="cranfield_refidx_")
    out: dict = {"corpus": path, "n_queries": len(queries), "k": args.k}
    try:
        # ---- Spark side ----
        from searchengine_spark.indexing.build import build_index
        from searchengine_spark.queries.ranked import rank_topk_batch
        from searchengine_spark.session import get_spark
        from searchengine_spark.sources.directory import load_json_directory

        spark = get_spark("cranfield-eval", cores=8)
        docs = load_json_directory(spark, path)
        t0 = time.time()
        sidx = build_index(docs, byte_size_col="byte_size", persist=True, loop="stream").cache()
        sidx.postings.count()
        n_spark_docs = sidx.corpus_scalars()[0]
        out["spark_index_s"] = round(time.time() - t0, 2)
        out["n_docs"] = n_spark_docs
        # doc_id (sorted path order) -> int(file stem)
        stems = {
            i: int(os.path.splitext(f)[0])
            for i, f in enumerate(
                sorted(f for f in os.listdir(path) if f.endswith(".json"))
            )
        }
        qmap = {str(i): q for i, q in enumerate(queries)}
        spark_results: dict = {}
        spark_lat: dict = {}
        for strategy in strategies:
            t0 = time.time()
            rows = rank_topk_batch(sidx, qmap, strategy, args.k).collect()
            spark_lat[strategy] = time.time() - t0
            per_q: dict = {}
            for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
                per_q.setdefault(r["query_id"], []).append(
                    (stems[r["doc_id"]], r["score"])
                )
            spark_results[strategy] = per_q
        spark.stop()

        # ---- reference side (its own code end to end) ----
        install_porter2_stub()
        sys.path.insert(0, "/root/reference")
        t0 = time.time()
        disk_index, n_ref_docs, id_to_file = build_reference_disk_index(
            path, index_dir
        )
        out["ref_index_s"] = round(time.time() - t0, 2)
        assert n_ref_docs == n_spark_docs

        mismatch_total = 0
        for strategy in strategies:
            mismatches = []
            ref_maps, spark_maps = [], []
            ref_lat = 0.0
            for i, q in enumerate(queries):
                t0 = time.time()
                top = reference_rank(disk_index, n_ref_docs, q, strategy,
                                     args.k)
                ref_lat += time.time() - t0
                ref_list = [(int(id_to_file[doc_id]), score)
                            for score, doc_id in top]
                spark_list = spark_results[strategy].get(str(i), [])
                a = sorted((f, round(s, 9)) for f, s in ref_list)
                b = sorted((f, round(s, 9)) for f, s in spark_list)
                if a != b:
                    mismatches.append({"query_i": i, "ref": a[:3],
                                       "spark": b[:3]})
                rel = qrels[i]
                ref_maps.append(average_precision_reference(
                    [f for f, _ in ref_list], rel))
                spark_maps.append(average_precision_reference(
                    [f for f, _ in spark_list], rel))
            out[f"{strategy}_rank_identical"] = not mismatches
            out[f"{strategy}_mismatches"] = mismatches[:3]
            out[f"{strategy}_map_ref"] = round(
                sum(ref_maps) / len(ref_maps), 6)
            out[f"{strategy}_map_spark"] = round(
                sum(spark_maps) / len(spark_maps), 6)
            out[f"{strategy}_ref_query_ms"] = round(
                ref_lat / len(queries) * 1000, 2)
            out[f"{strategy}_spark_batch_s"] = round(spark_lat[strategy], 2)
            mismatch_total += len(mismatches)
        out["all_rank_identical"] = mismatch_total == 0
        print(json.dumps(out))
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)
        if is_tmp:
            shutil.rmtree(path, ignore_errors=True)


if __name__ == "__main__":
    main()
