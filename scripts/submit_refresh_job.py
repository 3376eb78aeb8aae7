"""spark-submit entrypoint for the scheduled crawl-refresh loop: fold
the pages table's new crawl batches into the published index as one
O(delta) row-delta commit, then compact only when the accumulated
merge-on-read debt crosses the maintenance thresholds.

This is the production driver for ``pipeline/refresh.py`` — the
at-scale replacement for the reference REPL's full ``:index <dir>``
rebuild (/root/reference/main.py:261-392), run per crawl cycle:

    cd /root/repo && zip -r /tmp/searchengine_spark.zip searchengine_spark
    spark-submit --py-files /tmp/searchengine_spark.zip \
        scripts/submit_refresh_job.py \
        --pages-root /warehouse/pages \
        --index-root /warehouse/pages_index \
        [--init]                      # first run: full base build
        [--term-buckets 64]           # --init only
        [--pages-version 7]           # pin instead of current
        [--max-delete-ratio 0.2]      # compaction thresholds
        [--max-delta-commits 8]
        [--no-compact]                # refresh only, never rewrite

Prints ONE JSON line: versions moved, O(delta) commit accounting from
the manifest (files/bytes written vs table size), the maintenance
stats the compaction decision read, and wall times per phase.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None, spark=None,
         _print: bool = True) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages-root", required=True,
                    help="SnapshotTable root of the crawled pages "
                         "(url, warc_ts, html, text, lang)")
    ap.add_argument("--index-root", required=True,
                    help="SnapshotTable root of the published index")
    ap.add_argument("--init", action="store_true",
                    help="full base build (index table must not exist "
                         "yet); later runs refresh incrementally")
    ap.add_argument("--term-buckets", type=int, default=64)
    ap.add_argument("--pages-version", type=int, default=None,
                    help="index this pinned pages snapshot instead of "
                         "the current one")
    ap.add_argument("--max-delete-ratio", type=float, default=0.2)
    ap.add_argument("--max-delta-commits", type=int, default=8)
    ap.add_argument("--no-compact", action="store_true",
                    help="skip the maintenance check entirely")
    args = ap.parse_args(argv)

    owns_spark = spark is None
    if owns_spark:
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder
                 .appName("searchengine-crawl-refresh").getOrCreate())
    try:
        import searchengine_spark  # noqa: F401
    except ImportError:
        sys.path.insert(0, ".")
    from searchengine_spark.pipeline import refresh as R
    from searchengine_spark.sources.snapshots import SnapshotTable

    index = SnapshotTable(args.index_root)
    from_version = index.current_version()
    out: dict = {"pages_root": args.pages_root,
                 "index_root": args.index_root,
                 "index_version_before": from_version}

    t0 = time.time()
    if args.init:
        if from_version is not None:
            raise SystemExit(
                f"--init but {args.index_root} already has snapshot "
                f"v{from_version}; run without --init to refresh")
        version = R.build_pages_index(
            spark, args.pages_root, args.index_root,
            term_buckets=args.term_buckets,
            pages_version=args.pages_version)
        out["phase"] = "init"
    else:
        version = R.refresh_pages_index(
            spark, args.pages_root, args.index_root,
            pages_version=args.pages_version)
        out["phase"] = "refresh"
    out["refresh_wall_s"] = round(time.time() - t0, 2)
    out["index_version"] = version

    man = index.manifest(version)
    new_data = [f for f in man["data_files"] if f["seq"] == version]
    new_dels = [f for f in man.get("delete_files", [])
                if f["seq"] == version]
    out["commit"] = {
        "mode": man["mode"],
        "pages_version": man["properties"].get("pages_version"),
        "n_docs": man["properties"].get("n_docs"),
        "new_data_files": len(new_data),
        "new_delete_files": len(new_dels),
        "bytes_written": sum(f["bytes"] for f in new_data + new_dels),
        "table_data_bytes": sum(f["bytes"] for f in man["data_files"]),
    }

    if not args.no_compact:
        t1 = time.time()
        compacted, version, stats = R.maybe_rewrite_pages_index(
            spark, args.index_root,
            max_delete_ratio=args.max_delete_ratio,
            max_delta_commits=args.max_delta_commits)
        out["maintenance"] = {"compacted": compacted,
                              "stats_before": stats,
                              "wall_s": round(time.time() - t1, 2)}
        out["index_version"] = version

    if _print:
        print(json.dumps(out))
    if owns_spark:
        spark.stop()
    return out


if __name__ == "__main__":
    main()
