"""Ranked batch serving at staged scale: replay a query log against the
PUBLISHED 1.2M-doc snapshot table (the one tools/boolean_serve_scale.py
publishes) through queries/serve.ranked_batch_from_published — ONE
Spark job for the whole batch — and compare against the per-query
decode_topk loop over the same table.

Evidence this produces (BENCH_dev_ranked_serve_r4.json):
* batch wall + queries/sec for a 60-query log served in one job
  (union-of-terms bucket-pruned read, one decode, one partial-agged
  (query_id, doc_id) shuffle, per-query window top-k),
* the per-query decode loop's wall over a 12-query subset (the serving
  pattern the batch path amortizes: per-query job submission + its own
  bucket-pruned read), scaled to a per-query p50,
* a per-query (doc_id, score) parity assert between the two paths on
  that subset — correctness of the amortization at scale, not just
  speed.

Query terms are sampled from the index's own vocabulary at df-rank
band [20, 200) — skipping the df≈N stopword head and the df=1 tail —
exactly bench.run_query_scaling's protocol (a tail-term batch does no
posting work and measures only fixed overhead).

Usage:  python tools/ranked_serve_scale.py [publish_root] [index_root]
Defaults: /tmp/bool_serve_pub, newest /tmp/bench_pipeline/idx_c8_t*.
Do NOT run concurrently with bench.py (shared-VM noise).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

N_BATCH = 60
N_LOOP = 12
K = 10


def main() -> None:
    from pyspark.sql import functions as F

    from searchengine_spark.pipeline.index_pipeline import (
        queryable_published,
        read_published_segments,
    )
    from searchengine_spark.queries.ranked import query_rank_terms
    from searchengine_spark.queries.serve import ranked_batch_from_published
    from searchengine_spark.queries.wand import decode_topk
    from searchengine_spark.session import get_spark
    from tools.boolean_serve_scale import newest_staged_index

    pub_root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bool_serve_pub"
    index_root = sys.argv[2] if len(sys.argv) > 2 else newest_staged_index()
    out = {"publish_root": pub_root, "index_root": index_root,
           "n_batch": N_BATCH, "n_loop": N_LOOP, "k": K}

    # term selection, untimed (bench.run_query_scaling's band protocol)
    s = get_spark("ranked-serve-prep", cores=8)
    ranked_vocab = (
        s.read.parquet(f"{index_root}/postings/data")
        .groupBy("term").agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(200)
        .collect()
    )
    s.stop()
    terms = [r["term"] for r in ranked_vocab[20:200]]
    T = len(terms)
    batch = {
        f"q{i}": f"{terms[(2 * i) % T]} {terms[(2 * i + 7) % T]}"
        for i in range(N_BATCH)
    }

    s = get_spark("ranked-serve", cores=8, shuffle_partitions=16)
    try:
        scalars, tb = queryable_published(s, pub_root)

        # untimed warmup (JVM JIT + manifest/footer reads)
        ranked_batch_from_published(
            s, pub_root, {"w0": f"{terms[0]} {terms[1]}"}, k=K).count()

        # ---- batch path: the whole log, ONE job --------------------
        t0 = time.time()
        rows = ranked_batch_from_published(s, pub_root, batch, k=K).collect()
        batch_wall = time.time() - t0
        by_q: dict[str, list] = {}
        for r in sorted(rows, key=lambda r: (r.query_id, r.rank)):
            by_q.setdefault(r.query_id, []).append(
                (r.doc_id, round(r.score, 9)))
        out["batch"] = {
            "wall_s": round(batch_wall, 3),
            "queries_per_s": round(N_BATCH / batch_wall, 2),
            "result_rows": len(rows),
        }

        # ---- per-query decode loop over a subset -------------------
        loop_walls = []
        mismatch = 0
        for i in range(N_LOOP):
            qid = f"q{i * (N_BATCH // N_LOOP)}"
            q = batch[qid]
            t0 = time.time()
            seg = read_published_segments(
                s, pub_root, terms=list(query_rank_terms(q)))
            got = [(r.doc_id, round(r.score, 9)) for r in
                   decode_topk(scalars, seg, q, k=K,
                               term_buckets=tb).collect()]
            loop_walls.append(time.time() - t0)
            if got != by_q.get(qid, []):
                mismatch += 1
        loop_walls.sort()
        out["per_query_loop"] = {
            "n": N_LOOP,
            "wall_s": round(sum(loop_walls), 3),
            "p50_s": round(loop_walls[N_LOOP // 2], 3),
            "projected_log_wall_s": round(
                sum(loop_walls) / N_LOOP * N_BATCH, 1),
        }
        out["parity_mismatches"] = mismatch
        out["batch_speedup_vs_loop"] = round(
            (sum(loop_walls) / N_LOOP * N_BATCH) / batch_wall, 2)
        if mismatch:
            raise SystemExit(f"PARITY FAILED on {mismatch} queries")
    finally:
        s.stop()

    print(json.dumps(out))
    with open("BENCH_dev_ranked_serve_r4.json", "w") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
