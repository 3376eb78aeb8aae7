"""spark-submit entrypoint for incremental segment maintenance: fold a
delta crawl batch into an existing segment set (north rule: posting-list
MERGE, run via spark-submit --py-files).

Cluster usage:

    cd /root/repo && zip -r /tmp/searchengine_spark.zip searchengine_spark
    spark-submit --py-files /tmp/searchengine_spark.zip \
        scripts/submit_merge_job.py \
        --base /warehouse/segments/v41 \
        --delta-docs /crawl/batch_20260819.parquet \
        --out /warehouse/segments/v42 \
        [--supersede]   # delta re-crawls existing doc_ids

The merge rewrites only delta-touched (term, block) groups; everything
else passes through as raw columnar bytes (see
searchengine_spark/indexing/segments.py:merge_segments and the measured
5.5x-vs-rebuild BENCH_dev_merge_r4.json). Prints one JSON line with
group accounting and wall time.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", required=True,
                    help="parquet dir of the existing segments")
    ap.add_argument("--delta-docs", required=True,
                    help="parquet of the new docs (doc_id, text)")
    ap.add_argument("--out", required=True,
                    help="output parquet dir for the merged segments")
    ap.add_argument("--block-span", type=int, default=4096)
    ap.add_argument("--supersede", action="store_true",
                    help="delta doc_ids replace their old postings "
                         "(re-crawl); default treats the delta as a "
                         "pure append of fresh ids")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("searchengine-segment-merge").getOrCreate()
    try:
        import searchengine_spark  # noqa: F401
    except ImportError:
        sys.path.insert(0, ".")
    from searchengine_spark.indexing.segments import (
        SEG_COLS,
        build_segments,
        merge_segments,
    )
    from searchengine_spark.indexing.simple import build_simple_index

    t0 = time.time()
    base = spark.read.parquet(args.base)
    delta_docs = spark.read.parquet(args.delta_docs).select("doc_id", "text")
    idx = build_simple_index(delta_docs)
    delta = build_segments(idx.postings, idx.doc_stats,
                           block_span=args.block_span)
    merged = merge_segments(
        base, delta,
        superseded=delta_docs.select("doc_id") if args.supersede else None,
        block_span=args.block_span,
    )
    merged.select(*SEG_COLS).write.mode("overwrite").parquet(args.out)
    wall = time.time() - t0

    print(json.dumps({
        "base_groups": spark.read.parquet(args.base).count(),
        "merged_groups": spark.read.parquet(args.out).count(),
        "delta_docs": delta_docs.count(),
        "superseded": bool(args.supersede),
        "block_span": args.block_span,
        "wall_s": round(wall, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
