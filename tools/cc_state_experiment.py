"""A/B the two per-round state stores of
``ops.dedup.duplicate_clusters`` at the scale where the localCheckpoint
store was measured to stop scaling (PERF.md "CC at 100M pairs":
0.507 N→4N — per-round node-sized heap materializations contend on the
single shared local-mode heap).

Protocol matches tools/graph_scaling.py: interleaved local[2]/local[8]
trials, pinned shuffle_partitions=16, untimed warmups per fresh
session, per-trial walls recorded. Each (cores, store) cell is visited
once per trial sweep so a VM noise burst cannot poison one cell's
whole window.

Usage: python tools/cc_state_experiment.py [n_cc] [trials] [out.json]
Defaults: n_cc such that pairs ≈ the 100M regression point, 2 trials.
Prints ONE JSON line and writes it to out.json if given.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from tools.graph_scaling import CORES_4N, CORES_N, _pairs  # noqa: E402


def main() -> None:
    from pyspark.sql import functions as F

    from searchengine_spark.ops.dedup import duplicate_clusters
    from searchengine_spark.session import get_spark

    n_cc = int(sys.argv[1]) if len(sys.argv) > 1 else 125_000_000
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    out_path = sys.argv[3] if len(sys.argv) > 3 else None

    stores = ("local_checkpoint", "parquet_state")
    walls: dict[str, dict[int, list[float]]] = {
        s: {CORES_N: [], CORES_4N: []} for s in stores
    }
    counts: dict[str, int] = {}
    for trial in range(trials):
        for cores in (CORES_N, CORES_4N):  # interleaved
            for store in stores:
                # Fresh session per cell: running both stores in one
                # 8g JVM OOM'd at local[8] — the first store's
                # localCheckpoint label blocks stayed pinned in the
                # block manager while the second run's sorters asked
                # for execution pages (UNABLE_TO_ACQUIRE_MEMORY).
                s = get_spark(f"cc-state-{store}-{cores}-t{trial}",
                              cores=cores, shuffle_partitions=16)
                s.range(0, 1_000_000, 1, numPartitions=cores * 4).agg(
                    F.sum("id")).collect()
                duplicate_clusters(_pairs(s, 10_000)).count()

                p = _pairs(s, n_cc)
                counts["n_pairs"] = p.count()
                state = None
                if store == "parquet_state":
                    state = tempfile.mkdtemp(prefix="cc_state_")
                t0 = time.time()
                counts["n_clustered_nodes"] = duplicate_clusters(
                    p, state_dir=state).count()
                walls[store][cores].append(time.time() - t0)
                if state:
                    shutil.rmtree(state, ignore_errors=True)
                if out_path:
                    # Flush raw walls after every cell so a killed run
                    # (harness restarts take tmux children with them)
                    # still leaves auditable partial data.
                    partial = {"n_nodes_cc": n_cc, "partial": True,
                               **counts,
                               "trials_wall_s": {
                                   st: {f"local{c}": [round(w, 1) for w in ws]
                                        for c, ws in per.items()}
                                   for st, per in walls.items()}}
                    with open(out_path + ".partial", "w") as f:
                        f.write(json.dumps(partial) + "\n")
                s.stop()

    import os

    out = {"n_nodes_cc": n_cc, "trials": trials,
           "selection": f"best_of_{trials}_interleaved",
           "driver_mem": os.environ.get("SPARK_DRIVER_MEM", "8g"),
           "session_per_cell": True, **counts}
    for store, per_core in walls.items():
        best = {c: min(ws) for c, ws in per_core.items()}
        thr = {c: counts["n_pairs"] / w for c, w in best.items()}
        t_n, t_4n = best[CORES_N], best[CORES_4N]
        w_work = (t_n - t_4n) / (1 / CORES_N - 1 / CORES_4N)
        out[store] = {
            "trials_wall_s": {f"local{c}": [round(w, 1) for w in ws]
                              for c, ws in per_core.items()},
            "pairs_per_sec": {f"local{c}": round(t) for c, t in thr.items()},
            "efficiency_n_to_4n": round(thr[CORES_4N] / (4 * thr[CORES_N]), 3),
            "solved_fixed_overhead_s": round(t_n - w_work / CORES_N, 1),
            "solved_work_s_1core": round(w_work, 1),
        }
    line = json.dumps(out)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
