"""ONE-command cluster driver for the whole warehouse loop: build (or
refresh) the published index from the crawled pages table, run the
maintenance policy, and serve a query batch — the single entrypoint the
README's switching guide promises a reference user (whose whole engine
was one ``python main.py`` REPL).

    cd /root/repo && zip -r /tmp/searchengine_spark.zip searchengine_spark
    spark-submit --py-files /tmp/searchengine_spark.zip \
        scripts/submit_warehouse_job.py \
        --warehouse /warehouse \
        --queries "new york; camping in yosemite"

Layout under --warehouse: ``pages/`` (SnapshotTable of crawled pages —
url, warc_ts, html, text, lang) and ``pages_index/`` (the published
index table, created on first run). Each invocation:

1. BUILD or REFRESH, decided from warehouse state: no index table yet →
   full base build; otherwise an O(delta) merge-on-read refresh of the
   new pages versions (delegated to submit_refresh_job — same flags,
   same commit accounting in the output).
2. MAINTAIN: compact only past the delete-ratio / delta-commit
   thresholds (--no-compact to skip).
3. SERVE: the --queries batch through ``refreshed_topk_batch`` — one
   Spark job for the whole query log against the version this run just
   published.

Prints ONE JSON line: phase + versions + O(delta) commit accounting +
maintenance decision + per-query top-k (doc_id, score).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv: list[str] | None = None, spark=None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warehouse", required=True,
                    help="root dir holding pages/ and pages_index/")
    ap.add_argument("--queries", default=None,
                    help="semicolon-separated ranked queries to serve "
                         "after the build/refresh (omit to skip)")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--term-buckets", type=int, default=64,
                    help="first-build segment layout")
    ap.add_argument("--max-delete-ratio", type=float, default=0.2)
    ap.add_argument("--max-delta-commits", type=int, default=8)
    ap.add_argument("--no-compact", action="store_true")
    args = ap.parse_args(argv)

    owns_spark = spark is None
    if owns_spark:
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder
                 .appName("searchengine-warehouse").getOrCreate())
    try:
        import searchengine_spark  # noqa: F401
    except ImportError:
        sys.path.insert(0, ".")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from submit_refresh_job import main as refresh_job

    from searchengine_spark.pipeline import refresh as R
    from searchengine_spark.sources.snapshots import SnapshotTable

    pages_root = os.path.join(args.warehouse, "pages")
    index_root = os.path.join(args.warehouse, "pages_index")
    if SnapshotTable(pages_root).current_version() is None:
        raise SystemExit(
            f"no pages table at {pages_root} — commit the crawl first "
            "(sources.snapshots.SnapshotTable(pages_root).commit(df))")

    # 1+2: build-or-refresh + maintenance, decided from warehouse state
    is_init = SnapshotTable(index_root).current_version() is None
    sub_argv = ["--pages-root", pages_root, "--index-root", index_root,
                "--max-delete-ratio", str(args.max_delete_ratio),
                "--max-delta-commits", str(args.max_delta_commits)]
    if is_init:
        sub_argv += ["--init", "--term-buckets", str(args.term_buckets)]
    if args.no_compact:
        sub_argv += ["--no-compact"]
    out = refresh_job(sub_argv, spark=spark, _print=False)
    out["warehouse"] = args.warehouse

    # 3: serve the query batch against the version just published
    if args.queries:
        # dedupe preserving order: results are keyed by query text, so
        # a repeated query would silently collapse in the output dict
        qlist = list(dict.fromkeys(
            q.strip() for q in args.queries.split(";") if q.strip()))
        qmap = {f"q{i}": q for i, q in enumerate(qlist)}
        t0 = time.time()
        rows = R.refreshed_topk_batch(
            spark, index_root, qmap, k=args.k,
            version=out["index_version"]).collect()
        per_q: dict = {qid: [] for qid in qmap}
        for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
            per_q[r["query_id"]].append(
                [r["doc_id"], round(r["score"], 6)])
        out["serve"] = {
            "k": args.k,
            "batch_wall_s": round(time.time() - t0, 3),
            "results": {qmap[qid]: res for qid, res in per_q.items()},
        }

    print(json.dumps(out))
    if owns_spark:
        spark.stop()
    return out


if __name__ == "__main__":
    main()
