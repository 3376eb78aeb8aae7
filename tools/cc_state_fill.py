"""Finish an interrupted tools/cc_state_experiment.py run: re-run the
MISSING (store, cores) cells recorded in the .partial flush, merge the
walls, and write the final artifact in the experiment's format.

The round-4 50M-node run needed this: its trial-1 local[8]
local_checkpoint cell died in a GCLocker allocation storm followed by
shuffle-file fetch failures — the exact shared-heap contention
pathology the parquet state store exists to avoid (PERF.md), so the
crash itself is a data point and is recorded in the artifact.

Usage: python tools/cc_state_fill.py out.json [target_trials]
Reads out.json.partial, tops every cell up to target_trials (default 2)
walls, prints the final ONE JSON line and writes it to out.json.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from tools.graph_scaling import CORES_4N, CORES_N, _pairs  # noqa: E402


def run_cell(n_cc: int, store: str, cores: int) -> tuple[float, dict]:
    from pyspark.sql import functions as F

    from searchengine_spark.ops.dedup import duplicate_clusters
    from searchengine_spark.session import get_spark

    s = get_spark(f"cc-fill-{store}-{cores}", cores=cores,
                  shuffle_partitions=16)
    s.range(0, 1_000_000, 1, numPartitions=cores * 4).agg(
        F.sum("id")).collect()
    duplicate_clusters(_pairs(s, 10_000)).count()

    p = _pairs(s, n_cc)
    counts = {"n_pairs": p.count()}
    state = tempfile.mkdtemp(prefix="cc_state_") \
        if store == "parquet_state" else None
    t0 = time.time()
    counts["n_clustered_nodes"] = duplicate_clusters(
        p, state_dir=state).count()
    wall = time.time() - t0
    if state:
        shutil.rmtree(state, ignore_errors=True)
    s.stop()
    return wall, counts


def main() -> None:
    import os

    out_path = sys.argv[1]
    target = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    with open(out_path + ".partial") as f:
        partial = json.loads(f.readline())
    n_cc = partial["n_nodes_cc"]
    walls = {st: {int(c.removeprefix("local")): list(ws)
                  for c, ws in per.items()}
             for st, per in partial["trials_wall_s"].items()}
    counts = {k: partial[k] for k in ("n_pairs", "n_clustered_nodes")
              if k in partial}

    filled = []
    for cores in (CORES_N, CORES_4N):
        for store in walls:
            while len(walls[store][cores]) < target:
                w, counts = run_cell(n_cc, store, cores)
                walls[store][cores].append(round(w, 1))
                filled.append(f"{store}/local{cores}")
                partial["trials_wall_s"] = {
                    st: {f"local{c}": ws for c, ws in per.items()}
                    for st, per in walls.items()}
                with open(out_path + ".partial", "w") as f:
                    f.write(json.dumps(partial) + "\n")

    out = {"n_nodes_cc": n_cc, "trials": target,
           "selection": f"best_of_{target}_interleaved",
           "driver_mem": os.environ.get("SPARK_DRIVER_MEM", "8g"),
           "session_per_cell": True,
           "filled_cells_after_crash": filled,
           "crash_note": ("original trial-1 local[8] local_checkpoint "
                          "cell died in a GCLocker storm + shuffle "
                          "fetch failures (the shared-heap contention "
                          "PERF.md documents); missing cells re-run in "
                          "fresh sessions"),
           **counts}
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
    with open(out_path, "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
