"""spark-submit entrypoint for the END-TO-END training-data curation
pipeline (pipeline/curation.py): URL dedup → exact dedup → MinHash/LSH
near-dedup → quality + repetition filters → optional benchmark
decontamination → PII redaction → optional stratified sampling →
curated corpus written as parquet.

Cluster usage:

    cd /root/repo && zip -r /tmp/searchengine_spark.zip searchengine_spark
    spark-submit --py-files /tmp/searchengine_spark.zip \
        scripts/submit_curation_job.py \
        --docs-parquet /data/documents.parquet --out /data/curated \
        --bench-parquet /data/benchmarks.parquet \
        --rates '{"en": 0.9, "de": 0.5}'

Master-agnostic; on a real cluster add --master/--num-executors.
Prints ONE JSON line with per-stage survivor counts + walls — the
accounting a scheduler asserts volume invariants against (candidate
explosion in LSH, an over-aggressive quality threshold) instead of
discovering them in the loss curve.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs-parquet", required=True,
                    help="input parquet with (doc_id, text[, lang][, url])")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--bench-parquet", default=None,
                    help="optional benchmark corpus to decontaminate against")
    ap.add_argument("--rates", default=None,
                    help='optional JSON stratum->rate map, e.g. {"en":0.9}')
    ap.add_argument("--jaccard-threshold", type=float, default=0.5)
    ap.add_argument("--bucket-cap", type=int, default=10_000)
    ap.add_argument("--num-hashes", type=int, default=8)
    ap.add_argument("--bands", type=int, default=4)
    ap.add_argument("--cluster-dedup", action="store_true",
                    help="resolve verified pairs to connected components "
                         "and keep one representative per cluster")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("searchengine-curation").getOrCreate()
    try:
        import searchengine_spark  # noqa: F401
    except ImportError:
        sys.path.insert(0, "/root/repo")
    from searchengine_spark.pipeline.curation import (
        CurationConfig,
        run_curation,
    )
    from searchengine_spark.session import _ship_package

    _ship_package(spark)
    cfg = CurationConfig(
        num_hashes=args.num_hashes,
        bands=args.bands,
        bucket_cap=args.bucket_cap,
        jaccard_threshold=args.jaccard_threshold,
        cluster_dedup=args.cluster_dedup,
        sample_rates=json.loads(args.rates) if args.rates else None,
    )
    docs = spark.read.parquet(args.docs_parquet)
    bench = (
        spark.read.parquet(args.bench_parquet)
        if args.bench_parquet else None
    )

    t0 = time.time()
    curated = run_curation(docs, cfg, bench_docs=bench)
    curated.write.mode("overwrite").parquet(args.out)
    n_out = spark.read.parquet(args.out).count()

    print(json.dumps({
        "job": "curation",
        "out": args.out,
        "n_out": n_out,
        "total_wall_s": round(time.time() - t0, 2),
        "stages": cfg.stages,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
