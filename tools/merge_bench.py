"""Segment-merge vs full-rebuild benchmark — evidence that incremental
index maintenance costs ∝ delta, not ∝ index.

Scenario: a 400k-doc pages corpus is indexed into block-split VB
segments (the base). A fresh crawl batch of 1% arrives with new doc_ids
at the top of the id space (the append pattern a perpetual crawl
produces). Two ways to fold it in:

* full rebuild: re-index all 404k docs and re-encode every segment
  (the only option the reference's write-once disk index has);
* merge_segments: index the 4k delta, rewrite only the (term, block)
  groups the delta touches, pass every cold group through as raw bytes.

Also measured: a SCATTERED 1% re-crawl (uniform random ids). With
block-range layout a uniform update touches every block, so the merge
degrades toward rebuild cost — recorded here rather than hidden
(batch re-crawls by doc-id locality to keep the touched-block count
small; see merge_segments docstring).

Usage: python tools/merge_bench.py [n_docs] [delta_pct]
Writes BENCH_dev_merge_r4.json and prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
DELTA_PCT = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
BLOCK_SPAN = 4096
OUT = "BENCH_dev_merge_r4.json"


def main() -> None:
    from pyspark.sql import functions as F

    from searchengine_spark.indexing.segments import (
        build_segments,
        merge_segments,
    )
    from searchengine_spark.indexing.simple import build_simple_index
    from searchengine_spark.pipeline.index_pipeline import stage_docs
    from searchengine_spark.session import get_spark

    spark = get_spark("merge-bench", cores=8)
    root = "/tmp/merge_bench"
    n_delta = int(N_DOCS * DELTA_PCT / 100)
    stage_docs(spark, root, N_DOCS + n_delta, partitions=128)
    docs = spark.read.parquet(f"{root}/docs/data").select("doc_id", "text")

    base_docs = docs.filter(F.col("doc_id") < N_DOCS)
    delta_docs = docs.filter(F.col("doc_id") >= N_DOCS)  # append batch

    def seg_of(d):
        idx = build_simple_index(d)
        return build_segments(idx.postings, idx.doc_stats,
                              block_span=BLOCK_SPAN)

    def write(df, path):
        df.write.mode("overwrite").parquet(path)

    # warmup: spawn python workers + JIT on a small slice (steady state)
    write(seg_of(docs.limit(5_000)), f"{root}/warm")

    # base segments, materialized untimed (they exist before the batch)
    write(seg_of(base_docs), f"{root}/base")
    base_seg = spark.read.parquet(f"{root}/base")
    n_groups = base_seg.count()

    results: dict = {
        "n_docs_base": N_DOCS,
        "n_docs_delta": n_delta,
        "block_span": BLOCK_SPAN,
        "base_groups": n_groups,
    }

    # --- full rebuild (the reference's only option) ---
    t0 = time.time()
    write(seg_of(docs), f"{root}/rebuild")
    rebuild_s = time.time() - t0
    results["full_rebuild_s"] = round(rebuild_s, 2)

    # --- append merge: fresh ids → only the boundary block collides ---
    t0 = time.time()
    merged = merge_segments(base_seg, seg_of(delta_docs),
                            superseded=None, block_span=BLOCK_SPAN)
    write(merged, f"{root}/merged_append")
    append_s = time.time() - t0
    results["merge_append_s"] = round(append_s, 2)
    results["merge_append_speedup_vs_rebuild"] = round(rebuild_s / append_s, 2)

    # hot-group accounting for the append (delta-touched blocks only)
    delta_blocks = (
        seg_of(delta_docs).select("block").distinct()
        .join(base_seg.select("block").distinct(), "block", "left_semi")
    )
    hot = base_seg.join(delta_blocks, "block", "left_semi").count()
    results["append_hot_base_groups"] = hot
    results["append_cold_passthrough_groups"] = n_groups - hot

    # --- scattered re-crawl: uniform 1% of ids, text changed ---
    recrawl = base_docs.filter(F.col("doc_id") % int(100 / DELTA_PCT) == 0) \
        .select("doc_id", F.concat(F.lit("recrawl "), "text").alias("text"))
    t0 = time.time()
    merged2 = merge_segments(base_seg, seg_of(recrawl),
                             superseded=recrawl.select("doc_id"),
                             block_span=BLOCK_SPAN)
    write(merged2, f"{root}/merged_recrawl")
    recrawl_s = time.time() - t0
    results["merge_scattered_recrawl_s"] = round(recrawl_s, 2)
    results["merge_scattered_speedup_vs_rebuild"] = round(
        rebuild_s / recrawl_s, 2)

    # sanity: merged row/posting parity vs rebuild
    results["merged_groups"] = spark.read.parquet(
        f"{root}/merged_append").count()
    results["rebuild_groups"] = spark.read.parquet(
        f"{root}/rebuild").count()

    with open(OUT, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
