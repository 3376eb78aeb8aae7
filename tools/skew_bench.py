"""Head-term skew — measured evidence for the north rule's sentence
"Skew from head terms is handled explicitly via posting-list splitting
and two-stage combine".

The adversary: the synthetic pages corpus guarantees Zipf-head terms
with df == N (every title contains "Page ... about ..."), so a naive
``groupBy(term)`` segment build puts one term's ENTIRE posting list —
N structs with positions — into a single reducer task: the classic
straggler that stalls a 1000-executor stage on one core.

Two builds over the IDENTICAL staged postings parquet:

* ``split``   — the shipped design (`indexing/segments.build_segments`):
  block = doc_id // span with span sized to ~512 docs, so a df=N head
  term becomes N/512 bounded (term, block) groups that spread across
  the whole stage;
* ``monolith`` — span = 2^62 (one block per term): semantically the
  same index, physically the naive single-group-per-term build.

Both variants produce the same decoded postings (asserted on head +
mid terms); what differs — and what this benchmark records — is the
group-size distribution and the wall. The salted two-stage term-stats
combine (`indexing/build.term_stats_salted`, the other half of the
north-rule sentence) is timed against its naive single-groupBy twin on
the same frame, with result equality asserted.

Trials are INTERLEAVED (split, monolith, split, monolith, ...) and
best-of per variant — the shared VM's noise bursts hit both sides
equally instead of poisoning one (BASELINE.md protocol).

The run measures TWO corpus sizes (N/4 and N): the headline number is
not the local[8] wall ratio (at sandbox scale even a 200k-row group
fits one task) but the GROWTH LAW — the monolith's max group is ∝N
(at 10^12 docs a df=10^11 stopword is a 10^11-struct collect_list in
ONE task: guaranteed OOM, the job never finishes), while the split
build's max group stays pinned at ~span rows at any N. That pinned
bound is what "posting-list splitting" buys and what the artifact
records.

Usage: python tools/skew_bench.py [n_docs] [trials]
Writes BENCH_dev_skew_r4.json and prints one JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import time

_T0 = time.time()
sys.path.insert(0, ".")

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
TRIALS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
SPLIT_SPAN = 512            # dense ids -> ~512 docs per block
MONO_SPAN = 1 << 62         # every doc_id -> block 0: one group per term
OUT = "BENCH_dev_skew_r4.json"
ROOT = "/tmp/skew_bench"


def _log(msg: str) -> None:
    print(f"[skew_bench +{time.time() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def measure_size(spark, n_docs: int) -> dict:
    from pyspark.sql import functions as F

    from searchengine_spark.corpus import docs_from_pages, pages_df
    from searchengine_spark.indexing.build import build_index
    from searchengine_spark.indexing.segments import (
        build_segments,
        decode_postings,
    )

    # ---- stage the postings ONCE (untimed) ----------------------------
    _log(f"staging postings for {n_docs} docs")
    pages = pages_df(spark, n_docs, partitions=64)
    docs = docs_from_pages(pages)
    idx = build_index(docs, byte_size_col="byte_size", persist=True)
    (idx.postings
        .select("term", "doc_id", "tftd", "positions", "doc_length")
        .write.mode("overwrite").parquet(f"{ROOT}/postings"))
    idx.postings.unpersist()
    postings = spark.read.parquet(f"{ROOT}/postings")

    head = (postings.groupBy("term").agg(F.count("*").alias("df"))
            .orderBy(F.desc("df"), F.asc("term")).limit(5).collect())
    n_postings = postings.count()
    out: dict = {
        "n_docs": n_docs,
        "n_postings": n_postings,
        "head_terms": [{"term": r["term"], "df": r["df"]} for r in head],
    }
    _log(f"{n_postings} postings staged; head df={head[0]['df']}")

    # ---- segment build: split vs monolith, interleaved best-of --------
    def timed_build(span: int, name: str) -> float:
        t0 = time.time()
        (build_segments(postings, None, block_span=span)
         .withColumn("_build_part", F.spark_partition_id())
         .write.mode("overwrite").parquet(f"{ROOT}/seg_{name}"))
        return time.time() - t0

    walls: dict[str, list[float]] = {"split": [], "monolith": []}
    for t in range(TRIALS):
        for name, span in (("split", SPLIT_SPAN), ("monolith", MONO_SPAN)):
            w = timed_build(span, name)
            walls[name].append(w)
            _log(f"n={n_docs} build {name} trial {t}: {w:.1f}s")

    for name in ("split", "monolith"):
        seg = spark.read.parquet(f"{ROOT}/seg_{name}")
        bytes_cols = sum(
            (F.octet_length(c) for c in
             ("docids_vb", "tftds_vb", "pos_lens_vb", "positions_vb",
              "doc_lengths_vb")),
            F.lit(0))
        stats = seg.agg(
            F.count("*").alias("n_groups"),
            F.max("df_block").alias("max_group_rows"),
            F.expr("percentile(df_block, 0.99)").alias("p99_group_rows"),
            F.sum("df_block").alias("total_rows"),
            F.max(bytes_cols).alias("max_group_bytes"),
        ).collect()[0]
        # straggler proxy: share of all posting rows encoded by the
        # single busiest task of the encode stage
        per_part = (seg.groupBy("_build_part")
                    .agg(F.sum("df_block").alias("rows")))
        busiest = per_part.agg(F.max("rows")).collect()[0][0]
        out[name] = {
            "build_wall_s_best": round(min(walls[name]), 2),
            "build_walls_s": [round(w, 2) for w in walls[name]],
            "n_groups": stats["n_groups"],
            "max_group_rows": int(stats["max_group_rows"]),
            "p99_group_rows": int(stats["p99_group_rows"]),
            "total_rows": int(stats["total_rows"]),
            "max_group_bytes": int(stats["max_group_bytes"]),
            "busiest_task_row_share": round(busiest / n_postings, 4),
            # the encode stage's usable parallelism: with one group per
            # task at best, the stage can never finish faster than its
            # biggest group, so cores beyond total/max_group idle.
            # local[8] sits under both ceilings (walls tie); a
            # 1000-executor cluster does not.
            "scaling_ceiling_tasks": round(
                int(stats["total_rows"]) / int(stats["max_group_rows"]), 1),
        }

    out["split_speedup_vs_monolith"] = round(
        out["monolith"]["build_wall_s_best"]
        / out["split"]["build_wall_s_best"], 2)

    # ---- equality: same decoded postings either way --------------------
    mid_term = (postings.groupBy("term").agg(F.count("*").alias("df"))
                .filter((F.col("df") > 50) & (F.col("df") < n_docs // 4))
                .orderBy(F.desc("df")).limit(1).collect()[0]["term"])
    probe = [head[0]["term"], mid_term]

    def probe_hash(name: str):
        seg = spark.read.parquet(f"{ROOT}/seg_{name}")
        dec = decode_postings(seg, probe, with_positions=True)
        return dec.agg(
            F.count("*").alias("rows"),
            F.sum(F.hash("term", "doc_id", "tftd", "positions")
                  .cast("long")).alias("h"),
        ).collect()[0]

    a, b = probe_hash("split"), probe_hash("monolith")
    out["decode_equal"] = (a["rows"] == b["rows"] and a["h"] == b["h"])
    out["probe_terms"] = probe
    assert out["decode_equal"], (a, b)
    return out


def measure_term_stats(spark) -> dict:
    """Salted two-stage term stats vs the naive single groupBy on the
    biggest staged postings parquet (results asserted equal)."""
    from pyspark.sql import functions as F

    from searchengine_spark.indexing.build import term_stats_salted

    postings = spark.read.parquet(f"{ROOT}/postings")

    def run_salted():
        return term_stats_salted(postings).toPandas()

    def run_naive():
        return (postings.groupBy("term")
                .agg(F.count("*").cast("long").alias("df"),
                     F.sum("tftd").cast("long").alias("cf"))
                .toPandas())

    salted_w, naive_w, frames = [], [], {}
    for _ in range(max(TRIALS, 2)):
        for name, fn, sink in (("salted", run_salted, salted_w),
                               ("naive", run_naive, naive_w)):
            t0 = time.time()
            frames[name] = fn()
            sink.append(time.time() - t0)

    def canon(pdf):
        return (pdf[["term", "df", "cf"]]
                .sort_values("term").reset_index(drop=True))

    eq = canon(frames["salted"]).equals(canon(frames["naive"]))
    assert eq
    return {
        "salted_wall_s_best": round(min(salted_w), 2),
        "naive_wall_s_best": round(min(naive_w), 2),
        "n_terms": len(frames["salted"]),
        "results_equal": bool(eq),
    }


def main() -> None:
    from searchengine_spark.session import get_spark

    # 64 shuffle partitions at 8 cores: the split build schedules as 8
    # waves of bounded tasks (the cluster shape), so a monolith group
    # that outgrows one wave shows up as the straggling long pole.
    spark = get_spark("skew-bench", cores=8, shuffle_partitions=64)
    shutil.rmtree(ROOT, ignore_errors=True)

    results: dict = {"split_span": SPLIT_SPAN, "sizes": []}
    for n in (N_DOCS // 4, N_DOCS):
        results["sizes"].append(measure_size(spark, n))

    small, big = results["sizes"]
    results["growth_n"] = round(big["n_docs"] / small["n_docs"], 2)
    results["monolith_max_group_growth"] = round(
        big["monolith"]["max_group_rows"]
        / small["monolith"]["max_group_rows"], 2)
    results["split_max_group_growth"] = round(
        big["split"]["max_group_rows"]
        / small["split"]["max_group_rows"], 2)
    # postings parquet on disk is the LAST size's — term stats run there
    results["term_stats"] = measure_term_stats(spark)

    with open(OUT, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
