"""spark-submit entrypoint for benchmark decontamination: build the
n-gram hash set of a benchmark corpus, flag every training document
sharing an n-gram with it, and write the cleaned corpus as parquet.
The deployment surface for the `ops/decontam.py` operators (north
rule: "run via spark-submit --py-files on multi-executor clusters").

Cluster usage:

    cd /root/repo && zip -r /tmp/searchengine_spark.zip searchengine_spark
    spark-submit --py-files /tmp/searchengine_spark.zip \
        scripts/submit_decontam_job.py \
        --docs-parquet /data/documents.parquet \
        --bench-parquet /data/benchmarks.parquet --out /data/clean

Both inputs need (doc_id, text) columns. Prints ONE JSON line with
stage counts + walls; `bench_ngrams` is the broadcast-side cardinality
(eval suites must stay broadcast-small — a scheduler can assert it),
`contaminated` is the flagged-doc count.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs-parquet", required=True,
                    help="training corpus parquet with (doc_id, text)")
    ap.add_argument("--bench-parquet", required=True,
                    help="benchmark/eval corpus parquet with (doc_id, text)")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--ngram", type=int, default=13,
                    help="overlap n-gram size (GPT-3 rule: 13)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("searchengine-decontam").getOrCreate()
    try:
        import searchengine_spark  # noqa: F401
    except ImportError:
        sys.path.insert(0, "/root/repo")
    from searchengine_spark.ops.decontam import (
        benchmark_ngram_set,
        contamination,
        decontaminated,
    )
    from searchengine_spark.session import _ship_package

    _ship_package(spark)
    docs = spark.read.parquet(args.docs_parquet).select("doc_id", "text")
    bench_docs = spark.read.parquet(args.bench_parquet).select(
        "doc_id", "text")
    stages: dict[str, dict] = {}

    t0 = time.time()
    grams = benchmark_ngram_set(bench_docs, n=args.ngram).cache()
    stages["benchmark"] = {
        "n_bench_docs": bench_docs.count(),
        "bench_ngrams": grams.count(),
        "n": args.ngram,
        "wall_s": round(time.time() - t0, 2),
    }

    t0 = time.time()
    flagged = contamination(docs, grams, n=args.ngram).cache()
    n_docs = docs.count()
    stages["flag"] = {
        "n_docs": n_docs,
        "contaminated": flagged.count(),
        "wall_s": round(time.time() - t0, 2),
    }

    t0 = time.time()
    clean = decontaminated(docs, grams, n=args.ngram)
    clean.write.mode("overwrite").parquet(args.out)
    n_kept = spark.read.parquet(args.out).count()
    stages["write"] = {
        "n_kept": n_kept,
        "n_dropped": n_docs - n_kept,
        "wall_s": round(time.time() - t0, 2),
    }

    print(json.dumps({"job": "decontam", "out": args.out, "stages": stages}))
    spark.stop()


if __name__ == "__main__":
    main()
