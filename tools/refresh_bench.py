"""Merge-on-read refresh vs full rebuild — evidence for the O(delta)
economics of the crawl-refresh loop (pipeline/refresh.py).

Scenario: a pages SnapshotTable holds N crawled pages, fully indexed
(version 0 of the index table). A crawl batch of ~1% arrives as pages
v1 — half brand-new urls, half re-crawls of existing urls with changed
text. Three ways to bring the index up to date:

* full rebuild (the reference's only option): re-analyze and re-encode
  all N+delta docs (`build_pages_index` into a twin root);
* COW merge: `indexing/segments.merge_segments` — measured separately
  in tools/merge_bench.py (BENCH_dev_merge_r4.json);
* merge-on-read refresh (THIS benchmark): `refresh_pages_index` — one
  row-delta commit; base segment files are never rewritten.

Measured:
* refresh wall vs rebuild wall (speedup);
* bytes WRITTEN by the refresh commit (new segment files + the
  equality-delete file) vs the full table's data bytes — the claim is
  write-amplification ∝ delta, not ∝ index;
* the merge-on-read serving tax: `refreshed_topk` p50 over df-banded
  queries on the two-layer refreshed table vs the same queries after
  `rewrite_pages_index` (major compaction, single clean layer);
* compaction wall (the amortized cost that buys the tax back).

Usage: python tools/refresh_bench.py [n_docs] [delta_pct]
Writes BENCH_dev_refresh_r4.json and prints one JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import time


def _log(msg: str) -> None:
    print(f"[refresh_bench +{time.time() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


_T0 = time.time()

sys.path.insert(0, ".")

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
DELTA_PCT = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
N_QUERIES = 12
OUT = sys.argv[3] if len(sys.argv) > 3 else "BENCH_dev_refresh_r4.json"
ROOT = "/tmp/refresh_bench"


def _commit_bytes(tbl, version: int) -> dict:
    """Bytes/files first appearing at ``version`` (not carried by
    reference from the parent manifest)."""
    man = tbl.manifest(version)
    parent = man.get("parent")
    seen = set()
    if parent is not None:
        pm = tbl.manifest(parent)
        seen = {f["path"] for f in pm["data_files"]}
        seen |= {f["path"] for f in pm.get("delete_files", [])}
    new_data = [f for f in man["data_files"] if f["path"] not in seen]
    new_del = [f for f in man.get("delete_files", [])
               if f["path"] not in seen]
    return {
        "new_data_files": len(new_data),
        "new_delete_files": len(new_del),
        "bytes_written": sum(f["bytes"] for f in new_data + new_del),
        "table_data_bytes": sum(f["bytes"] for f in man["data_files"]),
        "table_data_files": len(man["data_files"]),
    }


def _band_queries(spark, index_root: str, n: int) -> list[str]:
    """Two-term queries from the index's own vocabulary at df-ranks
    [20, 200) — same protocol as bench.run_query_scaling (tail terms
    measure only fixed overhead)."""
    from pyspark.sql import functions as F

    from searchengine_spark.pipeline.refresh import published_postings

    vocab = (
        published_postings(spark, index_root, terms=None,
                           with_positions=False)
        .groupBy("term").agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(200)
        .collect()
    )
    terms = [r["term"] for r in vocab[20:200]]
    return [f"{terms[(2 * i) % len(terms)]} "
            f"{terms[(2 * i + 7) % len(terms)]}" for i in range(n)]


def main() -> None:
    from pyspark.sql import functions as F

    import searchengine_spark.pipeline.refresh as R
    from searchengine_spark.corpus import pages_df
    from searchengine_spark.session import get_spark
    from searchengine_spark.sources.snapshots import SnapshotTable

    spark = get_spark("refresh-bench", cores=8)
    shutil.rmtree(ROOT, ignore_errors=True)
    pr, ir, twin = f"{ROOT}/pages", f"{ROOT}/idx", f"{ROOT}/twin"
    n_delta = int(N_DOCS * DELTA_PCT / 100)
    n_new, n_recrawl = n_delta - n_delta // 2, n_delta // 2

    pages = SnapshotTable(pr)
    base = pages_df(spark, N_DOCS, seed=42, partitions=64)
    pages.commit(base, mode="overwrite", note="crawl v0")
    _log("pages v0 committed")

    # untimed warmup (python workers + Arrow + JIT) on a SMALL table —
    # the warm table exists only to spin up the slow first-run paths
    warm_pages = SnapshotTable(f"{ROOT}/warm_pages")
    warm_pages.commit(pages_df(spark, 5_000, seed=7, partitions=8),
                      mode="overwrite")
    R.build_pages_index(spark, f"{ROOT}/warm_pages", f"{ROOT}/warm_idx",
                        term_buckets=16)
    shutil.rmtree(f"{ROOT}/warm_idx", ignore_errors=True)
    shutil.rmtree(f"{ROOT}/warm_pages", ignore_errors=True)
    t0 = time.time()
    _log("base build (timed) start")
    iv0 = R.build_pages_index(spark, pr, ir, term_buckets=64)
    base_build_s = time.time() - t0

    # crawl batch: new urls (ids beyond N) + re-crawls with changed text
    new_pages = pages_df(spark, N_DOCS + n_new, seed=42, partitions=8) \
        .join(base.select("url"), "url", "left_anti")  # ids >= N_DOCS only
    recrawl = (
        base.filter(F.xxhash64("url") % int(N_DOCS / n_recrawl) == 0)
        .withColumn("text", F.concat("text", F.lit(" refreshed crawl")))
        .withColumn("html", F.col("text").cast("binary"))
        .withColumn("warc_ts", F.col("warc_ts")
                    + F.expr("interval 10 days"))
    )
    pages.commit(new_pages.unionByName(recrawl), note="crawl v1")
    delta_rows = pages.read_appends(
        spark, pages.current_version() - 1, pages.current_version()).count()

    results: dict = {
        "n_docs_base": N_DOCS,
        "n_delta_rows": delta_rows,
        "n_delta_new_urls_target": n_new,
        "n_delta_recrawls_target": n_recrawl,
        "base_build_s": round(base_build_s, 2),
    }

    # --- merge-on-read refresh: one row-delta commit ---
    t0 = time.time()
    _log("refresh start")
    iv1 = R.refresh_pages_index(spark, pr, ir)
    refresh_s = time.time() - t0
    results["refresh_s"] = round(refresh_s, 2)
    idx_tbl = SnapshotTable(ir)
    results["refresh_commit"] = _commit_bytes(idx_tbl, iv1)
    base_bytes = _commit_bytes(idx_tbl, iv0)["table_data_bytes"]
    results["refresh_commit"]["write_amplification_vs_table"] = round(
        results["refresh_commit"]["bytes_written"] / base_bytes, 4)

    # --- full rebuild of the same crawl state (the comparator) ---
    t0 = time.time()
    _log("rebuild start")
    R.build_pages_index(spark, pr, twin, term_buckets=64)
    rebuild_s = time.time() - t0
    results["full_rebuild_s"] = round(rebuild_s, 2)
    results["refresh_speedup_vs_rebuild"] = round(rebuild_s / refresh_s, 2)
    results["rebuild_bytes_written"] = _commit_bytes(
        SnapshotTable(twin), SnapshotTable(twin).current_version()
    )["bytes_written"]

    # --- serving tax: two-layer (merge-on-read) vs compacted ---
    _log("band queries start")
    qs = _band_queries(spark, ir, N_QUERIES)

    t0 = time.time()
    _log("compaction start")
    iv2 = R.rewrite_pages_index(spark, ir)
    results["compaction_s"] = round(time.time() - t0, 2)

    # Time travel keeps the pre-compaction (two-layer) view readable at
    # iv1, so both serving modes are measured INTERLEAVED per query —
    # the VM's multi-minute noise bursts hit both sides equally instead
    # of poisoning whichever phase they land on (BASELINE.md protocol).
    def timed(q, version):
        t0 = time.time()
        R.refreshed_topk(spark, ir, q, k=10, version=version).collect()
        return time.time() - t0

    _log("interleaved serving-tax trials start")
    timed(qs[0], iv1), timed(qs[0], iv2)  # warm both paths
    mor, comp = [], []
    for i, q in enumerate(qs):
        order = ((iv1, mor), (iv2, comp)) if i % 2 == 0 else \
            ((iv2, comp), (iv1, mor))
        for version, sink in order:
            sink.append(timed(q, version))
    results["topk_p50_merge_on_read_s"] = round(
        sorted(mor)[len(mor) // 2], 3)
    results["topk_p50_compacted_s"] = round(
        sorted(comp)[len(comp) // 2], 3)
    results["topk_walls_merge_on_read"] = [round(w, 2) for w in mor]
    results["topk_walls_compacted"] = [round(w, 2) for w in comp]
    results["merge_on_read_read_tax"] = round(
        results["topk_p50_merge_on_read_s"]
        / results["topk_p50_compacted_s"], 2)

    with open(OUT, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
