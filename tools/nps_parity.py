"""Head-to-head parity on the reference's REAL shipped corpus:
``all-nps-sites-extracted`` (36,804 json docs — the corpus
main_disk.py:56-58 indexes), including its own demo query
"camping in yosemite" (main_disk.py:79).

Spark side: load_json_directory → build_index (Arrow pandas-UDF
reference-parity analyzer) → rank_topk_batch per strategy + boolean
engine. Reference side: its own corpus/tokenizer/index/disk-writer/
query classes end to end (builder shared with tools/cranfield_eval.py).

Boolean queries avoid 2-term phrases on purpose: the reference's biword
fast path needs a second index build (main.py's pairwise loop); the
positional phrase/NEAR/AND/OR/NOT paths exercised here all run off the
single positional index both engines build. (2-term biword parity is
covered by tools/reference_rank_parity.py on synthetic corpora.)

Usage: python tools/nps_parity.py [--n-docs N] [--k K]
Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from tools.cranfield_eval import build_reference_disk_index  # noqa: E402
from tools.reference_benchmark import install_porter2_stub  # noqa: E402

NPS = "/root/reference/all-nps-sites-extracted"
STRATEGY_NAMES = ("default", "tfidf", "bm25", "wacky")

RANK_QUERIES = [
    "camping in yosemite",            # main_disk.py:79 — the demo query
    "the national park service",
    "hiking trail maps",
    "grand canyon south rim",
    "fishing permit regulations",
    "volcano crater lake",
]

BOOLEAN_QUERIES = [
    "camping yosemite",                       # AND
    "hiking + fishing",                       # OR
    "camping -yosemite",                      # AND-NOT
    '"national park service"',                # 3-term positional phrase
    "[camping NEAR/3 yosemite]",              # NEAR/k
    "park camping + trail -permit",           # mixed
]

K = 10


def subset_dir(n_docs: int | None) -> tuple[str, bool]:
    if not n_docs:
        return NPS, False
    files = sorted(
        (f for f in os.listdir(NPS) if f.endswith(".json")),
    )[:n_docs]
    tmp = tempfile.mkdtemp(prefix="nps_sub_")
    for f in files:
        os.symlink(os.path.join(NPS, f), os.path.join(tmp, f))
    return tmp, True


def reference_boolean(disk_index, query: str, id_to_file):
    from queries import BooleanQueryParser
    from text.newtokenprocessor import NewTokenProcessor

    parser = BooleanQueryParser()
    component = parser.parse_query(query=query)
    postings = component.get_postings(disk_index, NewTokenProcessor())
    return sorted({id_to_file[p.doc_id] for p in postings})


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=None)
    ap.add_argument("--k", type=int, default=K)
    args = ap.parse_args()

    path, is_tmp = subset_dir(args.n_docs)
    index_dir = tempfile.mkdtemp(prefix="nps_refidx_")
    out: dict = {"corpus": path, "k": args.k}
    try:
        # ---- Spark side ----
        from searchengine_spark.indexing.build import build_index
        from searchengine_spark.queries.engine import boolean_query
        from searchengine_spark.queries.ranked import rank_topk_batch
        from searchengine_spark.session import get_spark
        from searchengine_spark.sources.directory import load_json_directory

        spark = get_spark("nps-parity", cores=16)
        docs = load_json_directory(spark, path)
        t0 = time.time()
        sidx = build_index(docs, byte_size_col="byte_size", persist=True, loop="stream").cache()
        sidx.postings.count()
        out["n_docs"] = sidx.corpus_scalars()[0]
        out["spark_index_s"] = round(time.time() - t0, 2)
        out["spark_docs_per_sec"] = round(out["n_docs"] / out["spark_index_s"], 1)
        stems = {
            i: os.path.splitext(f)[0]
            for i, f in enumerate(
                sorted(f for f in os.listdir(path) if f.endswith(".json"))
            )
        }
        qmap = {str(i): q for i, q in enumerate(RANK_QUERIES)}
        spark_rank: dict = {}
        for strategy in STRATEGY_NAMES:
            t0 = time.time()
            rows = rank_topk_batch(sidx, qmap, strategy, args.k).collect()
            out[f"spark_batch_{strategy}_s"] = round(time.time() - t0, 2)
            for r in rows:
                spark_rank.setdefault((strategy, int(r["query_id"])), []).append(
                    (stems[r["doc_id"]], round(r["score"], 9))
                )
        spark_bool = {}
        for q in BOOLEAN_QUERIES:
            spark_bool[q] = sorted(
                stems[r["doc_id"]] for r in boolean_query(sidx, q).collect()
            )
        spark.stop()

        # ---- reference side ----
        install_porter2_stub()
        sys.path.insert(0, "/root/reference")
        t0 = time.time()
        disk_index, n_ref, id_to_file = build_reference_disk_index(path, index_dir)
        out["ref_index_s"] = round(time.time() - t0, 2)
        out["ref_docs_per_sec"] = round(n_ref / out["ref_index_s"], 1)
        assert n_ref == out["n_docs"]

        from tools.cranfield_eval import reference_rank

        rank_mismatches = []
        ref_lat = []
        for strategy in STRATEGY_NAMES:
            for i, q in enumerate(RANK_QUERIES):
                t0 = time.time()
                top = reference_rank(disk_index, n_ref, q, strategy, args.k)
                ref_lat.append(time.time() - t0)
                ref = sorted(
                    (id_to_file[doc_id], round(score, 9)) for score, doc_id in top
                )
                got = sorted(spark_rank.get((strategy, i), []))
                if ref != got:
                    rank_mismatches.append(
                        {"strategy": strategy, "query": q,
                         "ref": ref[:3], "spark": got[:3]}
                    )
        out["rank_identical"] = not rank_mismatches
        out["rank_mismatches"] = rank_mismatches[:4]
        out["ref_rank_query_ms_mean"] = round(
            sum(ref_lat) / len(ref_lat) * 1000, 1)

        bool_mismatches = []
        for q in BOOLEAN_QUERIES:
            ref_docs = reference_boolean(disk_index, q, id_to_file)
            if ref_docs != spark_bool[q]:
                bool_mismatches.append(
                    {"query": q, "ref_n": len(ref_docs),
                     "spark_n": len(spark_bool[q])}
                )
        out["boolean_identical"] = not bool_mismatches
        out["boolean_mismatches"] = bool_mismatches
        print(json.dumps(out))
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)
        if is_tmp:
            shutil.rmtree(path, ignore_errors=True)


if __name__ == "__main__":
    main()
