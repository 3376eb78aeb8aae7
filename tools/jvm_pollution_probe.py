"""Reproduce r03's pages-build inflation and pin the mechanism.

BENCH_r03 recorded `index_build_pages` at 38.5 s (519 docs/s) in the
runs where the main latency section followed the long scaling phases,
vs 6.8-7.3 s (≈2,900 docs/s) in isolated sessions — far past the VM's
15-25% noise band. Every bench phase shared ONE python process and
therefore ONE py4j gateway JVM: `SparkContext.stop()` ends the Spark
app but the JVM lives on, keeping its grown heap, GC history, and
loaded classes. This probe measures the same pages-build:

  mode A (fresh)    — new process → first session → pages build ×3
  mode B (polluted) — same process first runs a scaling-phase-shaped
                      workload (stage a large corpus + an index
                      pipeline across several sessions), stops it all,
                      THEN opens a new session and runs pages build ×3

Usage: python tools/jvm_pollution_probe.py A|B [n_docs] [pollute_n]
Prints one JSON line: {"mode", "walls_s", "pollute_wall_s"}.

Run A, then B, then A again (interleaved vs VM noise) and compare.
"""

from __future__ import annotations

import json
import shutil
import sys
import time

sys.path.insert(0, ".")

from searchengine_spark.session import get_spark  # noqa: E402


def pages_build(spark, n_docs: int) -> float:
    from searchengine_spark.corpus import docs_from_pages, pages_df
    from searchengine_spark.indexing.build import build_index

    t0 = time.time()
    pages = pages_df(spark, n_docs, partitions=64)
    docs = docs_from_pages(pages)
    idx = build_index(docs, byte_size_col="byte_size", persist=True)
    idx.postings.count()
    idx.doc_stats.count()
    return time.time() - t0


def pollute(pollute_n: int) -> float:
    """The scaling-phase shape: stage a corpus, run the index pipeline
    at two core counts, several sessions opened and stopped."""
    from searchengine_spark.pipeline.index_pipeline import (
        run_index_pipeline,
        stage_docs,
    )

    t0 = time.time()
    root = "/tmp/probe_pipeline"
    shutil.rmtree(root, ignore_errors=True)
    s = get_spark("probe-stage", cores=32)
    stage_docs(s, root, pollute_n, partitions=128)
    s.stop()
    for cores in (2, 8):
        s = get_spark(f"probe-scale-{cores}", cores=cores,
                      shuffle_partitions=cores * 2)
        docs = s.read.parquet(f"{root}/docs/data")
        run_index_pipeline(s, f"{root}/idx_{cores}", docs, "probe")
        s.stop()
    return time.time() - t0


def main() -> None:
    mode = sys.argv[1]
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    pollute_n = int(sys.argv[3]) if len(sys.argv) > 3 else 400_000

    pollute_wall = None
    if mode == "B":
        pollute_wall = pollute(pollute_n)

    spark = get_spark("probe-pages", cores=32)
    walls = []
    for _ in range(3):
        spark.catalog.clearCache()  # trial isolation (persist=True builds)
        walls.append(pages_build(spark, n_docs))
    spark.stop()
    print(json.dumps({
        "mode": mode,
        "n_docs": n_docs,
        "walls_s": [round(w, 2) for w in walls],
        "pollute_wall_s": round(pollute_wall, 1) if pollute_wall else None,
    }))


if __name__ == "__main__":
    main()
