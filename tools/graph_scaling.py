"""N→4N scaling evidence for the two iterative graph operators
(ops/linkgraph.pagerank_fixedpoint, ops/dedup.duplicate_clusters) at
~10⁶-node scale — the north rule's two-cluster-size criterion applied
to the round-3 additions, under the same VM protocol as bench.py's
phases (interleaved best-of-N trials, pinned shuffle_partitions, an
untimed warmup job per fresh session, all per-trial walls recorded).

Inputs are synthesized with spark.range (no disk dependency):
* PageRank: every node i links to (7i+3) mod n, even nodes add
  (13i+5) mod n — ~1.5·n edges, mixed in-degrees, no dangling sinks.
* CC: stars of 5 (hub = i−i mod 5) chained every 5th hub via
  (i, i+5) — ~n·4/5 pairs whose components need real transitive
  merging, not just one propagation step.

Usage: python tools/graph_scaling.py [n_pagerank] [n_cc] [trials]
Prints ONE JSON line with walls, rows/sec at each core count, the two
efficiency figures, and the solved fixed-overhead decomposition
(T = F + W/c from the two core counts) that shows how much of each
wall is per-job driver cost rather than scalable work. The two sizes
differ because per-row work differs: the protocol (BASELINE.md,
"fixed overhead") needs W/c to dominate F at the LARGER core count,
and CC's per-pair work is ~2× lighter than PageRank's per-edge work.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

CORES_N, CORES_4N = 2, 8


def _edges(spark, n: int):
    from pyspark.sql import functions as F

    r = spark.range(0, n, 1, numPartitions=32)
    i = F.col("id")
    e1 = r.select(i.alias("src"), ((i * 7 + 3) % n).alias("dst"))
    e2 = r.filter(i % 2 == 0).select(
        i.alias("src"), ((i * 13 + 5) % n).alias("dst")
    )
    return e1.union(e2).filter(F.col("src") != F.col("dst"))


def _pairs(spark, n: int):
    from pyspark.sql import functions as F

    r = spark.range(0, n, 1, numPartitions=32)
    i = F.col("id")
    stars = r.filter(i % 5 != 0).select(
        (i - i % 5).alias("doc_a"), i.alias("doc_b")
    )
    chains = r.filter((i % 25 == 0) & (i + 5 < n)).select(
        i.alias("doc_a"), (i + 5).alias("doc_b")
    )
    return stars.union(chains)


def main() -> None:
    from pyspark.sql import functions as F

    from searchengine_spark.ops.dedup import duplicate_clusters
    from searchengine_spark.ops.linkgraph import pagerank_fixedpoint
    from searchengine_spark.session import get_spark

    n_pr = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    n_cc = int(sys.argv[2]) if len(sys.argv) > 2 else 40_000_000
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    walls: dict[str, dict[int, list[float]]] = {
        "pagerank": {CORES_N: [], CORES_4N: []},
        "cc": {CORES_N: [], CORES_4N: []},
    }
    counts: dict[str, int] = {}
    for trial in range(trials):
        for cores in (CORES_N, CORES_4N):  # interleaved
            s = get_spark(f"graph-scale-{cores}-t{trial}", cores=cores,
                          shuffle_partitions=16)
            # untimed warmups: JVM JIT + one tiny run of each operator
            s.range(0, 1_000_000, 1, numPartitions=cores * 4).agg(
                F.sum("id")).collect()
            pagerank_fixedpoint(_edges(s, 10_000), iters=3).count()
            duplicate_clusters(_pairs(s, 10_000)).count()

            if n_pr > 0:  # size 0 skips the op (single-op reruns)
                e = _edges(s, n_pr)
                counts["n_edges"] = e.count()
                t0 = time.time()
                pagerank_fixedpoint(e, iters=3).count()
                walls["pagerank"][cores].append(time.time() - t0)

            if n_cc > 0:
                p = _pairs(s, n_cc)
                counts["n_pairs"] = p.count()
                t0 = time.time()
                counts["n_clustered_nodes"] = duplicate_clusters(p).count()
                walls["cc"][cores].append(time.time() - t0)
            s.stop()

    out = {"n_nodes_pagerank": n_pr, "n_nodes_cc": n_cc, "trials": trials,
           "selection": f"best_of_{trials}_interleaved", **counts}
    for op, per_core in walls.items():
        if not per_core[CORES_N]:
            continue
        best = {c: min(ws) for c, ws in per_core.items()}
        rows = counts["n_edges"] if op == "pagerank" else counts["n_pairs"]
        thr = {c: rows / w for c, w in best.items()}
        # T(c) = F + W/c solved from the two best walls: how much of
        # the wall is fixed per-job cost vs scalable work
        t_n, t_4n = best[CORES_N], best[CORES_4N]
        w_work = (t_n - t_4n) / (1 / CORES_N - 1 / CORES_4N)
        out[op] = {
            "trials_wall_s": {f"local{c}": [round(w, 1) for w in ws]
                              for c, ws in per_core.items()},
            "rows_per_sec": {f"local{c}": round(t) for c, t in thr.items()},
            "efficiency_n_to_4n": round(
                thr[CORES_4N] / (4 * thr[CORES_N]), 3),
            "solved_fixed_overhead_s": round(t_n - w_work / CORES_N, 1),
            "solved_work_s_1core": round(w_work, 1),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
