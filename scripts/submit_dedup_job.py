"""spark-submit entrypoint for the training-data dedup pipeline:
exact dedup → MinHash signatures → banded-LSH candidates (hot-bucket
cap) → exact n-gram-Jaccard verification → filtered corpus written as
parquet. The deployment surface for the `ops/dedup.py` operators
(north rule: "run via spark-submit --py-files on multi-executor
clusters").

Cluster usage:

    cd /root/repo && zip -r /tmp/searchengine_spark.zip searchengine_spark
    spark-submit --py-files /tmp/searchengine_spark.zip \
        scripts/submit_dedup_job.py \
        --docs-parquet /data/documents.parquet --out /data/deduped

On a real cluster add --master/--num-executors; the job is
master-agnostic. Prints ONE JSON line with stage counts + walls so a
scheduler can assert candidate volume stayed bounded (the way LSH dies
at web scale is a silent candidate explosion — this surfaces it).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs-parquet", required=True,
                    help="input parquet with (doc_id, text) columns")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--threshold", type=float, default=0.5,
                    help="Jaccard threshold for a verified duplicate")
    ap.add_argument("--bucket-cap", type=int, default=10_000)
    ap.add_argument("--num-hashes", type=int, default=8)
    ap.add_argument("--bands", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("searchengine-dedup").getOrCreate()
    try:
        import searchengine_spark  # noqa: F401
    except ImportError:
        sys.path.insert(0, "/root/repo")
    from searchengine_spark.ops.dedup import (
        dedup_filter,
        exact_duplicates,
        jaccard_verify,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from searchengine_spark.session import _ship_package

    _ship_package(spark)
    docs = spark.read.parquet(args.docs_parquet).select("doc_id", "text")
    stages: dict[str, dict] = {}

    from pyspark.sql import functions as F

    t0 = time.time()
    n_docs = docs.count()
    n_exact = exact_duplicates(docs).count()
    # Exact dedup ACTS here, not just reports: keep the smallest doc_id
    # per identical text and drop the rest BEFORE MinHash. This is what
    # makes lsh_candidate_pairs' bucket_cap safe — a 10^5-copy
    # boilerplate group would otherwise share one LSH bucket, blow the
    # cap, be dropped from candidate generation, and silently survive
    # near-dup dedup entirely.
    keep_first = (
        docs.groupBy(F.md5("text").alias("_h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    docs_u = docs.join(keep_first, "doc_id", "left_semi").cache()
    n_unique = docs_u.count()
    stages["exact"] = {"n_docs": n_docs, "n_exact_dup_groups": n_exact,
                       "n_dropped_exact": n_docs - n_unique,
                       "wall_s": round(time.time() - t0, 2)}

    t0 = time.time()
    sigs = minhash_signatures(docs_u, num_hashes=args.num_hashes).cache()
    stages["signatures"] = {"n": sigs.count(),
                            "wall_s": round(time.time() - t0, 2)}

    t0 = time.time()
    cand = lsh_candidate_pairs(
        sigs, num_hashes=args.num_hashes, bands=args.bands,
        bucket_cap=args.bucket_cap,
    ).cache()
    n_cand = cand.count()
    stages["candidates"] = {
        "n": n_cand,
        "per_doc": round(n_cand / max(n_docs, 1), 4),
        "bucket_cap": args.bucket_cap,
        "wall_s": round(time.time() - t0, 2),
    }

    t0 = time.time()
    dup_pairs = jaccard_verify(docs_u, cand, threshold=args.threshold).cache()
    stages["verified"] = {"n": dup_pairs.count(),
                          "threshold": args.threshold,
                          "wall_s": round(time.time() - t0, 2)}

    t0 = time.time()
    kept = dedup_filter(docs_u, dup_pairs)
    kept.write.mode("overwrite").parquet(args.out)
    n_kept = spark.read.parquet(args.out).count()
    stages["write"] = {"n_kept": n_kept,
                       "n_dropped_neardup": n_unique - n_kept,
                       "n_dropped_total": n_docs - n_kept,
                       "wall_s": round(time.time() - t0, 2)}

    print(json.dumps({"job": "dedup", "out": args.out, "stages": stages}))
    spark.stop()


if __name__ == "__main__":
    main()
