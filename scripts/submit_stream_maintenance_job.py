"""spark-submit entrypoint for STREAMING segment maintenance: drain the
pages drops under --input through start_segment_maintenance (per
micro-batch: delta index → merge_segments with url supersede → versioned
segment dir + atomic pointer swap), then optionally checkpoint the
resulting current version into the published serving SnapshotTable
(streaming/ingest.publish_current) so the query fleet can repin.

Cluster usage (cron per crawl-drop cadence):

    cd /root/repo && zip -r /tmp/searchengine_spark.zip searchengine_spark
    spark-submit --py-files /tmp/searchengine_spark.zip \
        scripts/submit_stream_maintenance_job.py \
        --input /crawl/drops --seg-root /warehouse/stream_segments \
        [--publish-root /warehouse/serving_table] \
        [--term-buckets 64] [--block-span 4096]

Exactly-once across invocations comes from the stream's checkpoint dir
(file-source offsets under {seg-root}/_checkpoint); re-running after a
crash resumes from the last committed micro-batch. Prints one JSON line
with the current version, doc count, and (if published) the committed
table version.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="directory the crawl drops (pages parquet) land in")
    ap.add_argument("--seg-root", required=True,
                    help="root for the maintained versioned segment dirs")
    ap.add_argument("--publish-root", default=None,
                    help="SnapshotTable root to checkpoint the drained "
                         "current version into (publish_current)")
    ap.add_argument("--term-buckets", type=int, default=64)
    ap.add_argument("--cluster-partitions", type=int, default=None)
    ap.add_argument("--block-span", type=int, default=4096)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder
             .appName("searchengine-stream-maintenance").getOrCreate())
    try:
        import searchengine_spark  # noqa: F401
    except ImportError:
        sys.path.insert(0, ".")
    from searchengine_spark.streaming.ingest import (
        current_queryable,
        publish_current,
        start_segment_maintenance,
    )

    t0 = time.time()
    start_segment_maintenance(
        spark, args.input, args.seg_root,
        block_span=args.block_span).awaitTermination()
    drain_wall = time.time() - t0

    out = {"seg_root": args.seg_root, "drain_wall_s": round(drain_wall, 3)}
    seg, scalars = current_queryable(spark, args.seg_root)
    if seg is None:
        out["current"] = None  # no drops to drain
    else:
        n_docs, avg_dl = scalars.corpus_scalars()
        out["current"] = {"n_docs": int(n_docs),
                          "avg_doc_length": round(avg_dl, 3)}
        if args.publish_root:
            t1 = time.time()
            v = publish_current(
                spark, args.seg_root, args.publish_root,
                term_buckets=args.term_buckets,
                cluster_partitions=args.cluster_partitions)
            out["published"] = {"table_root": args.publish_root,
                                "version": v,
                                "wall_s": round(time.time() - t1, 3)}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
