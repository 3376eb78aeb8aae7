"""bench.py contract: prints exactly ONE compact JSON line with the
driver's required keys (metric/value/unit/queries/sf), small enough to
fit the driver's 2000-byte stdout tail, and writes the full artifact
(per-trial walls) to SPARK_GRAFT_FULL_OUT. Runs in fast mode (sf
0.001, no scaling phase, single trials) — protects BENCH_r{N}.json
production."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_emits_single_compact_json_line(tmp_path):
    full_out = str(tmp_path / "bench_full.json")
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_SCALING="0",
        SPARK_GRAFT_PAGES_N="300",
        SPARK_GRAFT_WAND_N="100000",
        SPARK_GRAFT_BUILD_TRIALS="1",
        SPARK_GRAFT_LAT_PASSES="1",
        SPARK_GRAFT_XOVER_TRIALS="1",
        SPARK_GRAFT_FULL_OUT=full_out,
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    json_lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert len(json_lines) == 1
    line = json_lines[0]
    # the driver records only the last 2000 bytes of stdout — the whole
    # line (plus trailing newline) must survive that window
    assert len(line) <= 1900, len(line)
    rec = json.loads(line)
    for key in ("metric", "value", "unit", "queries", "sf",
                "wand_crossover_speedup", "scaling_eff", "full_artifact"):
        assert key in rec, key
    assert rec["unit"] == "sec" and rec["sf"] == 0.001
    assert rec["value"] > 0
    assert {"index_build_reference", "bm25_p50_k10", "wand_p50_k10"} <= set(rec["queries"])
    assert all(v >= 0 for v in rec["queries"].values())
    assert rec["errors"] is None, rec["errors"]
    assert rec["wand_identical_topk"] is True

    # full artifact: per-trial walls present and consistent
    with open(full_out) as f:
        full = json.load(f)
    assert full["queries"] == rec["queries"]
    assert "latency_trials_s" in full and "build_trials_s" in full
    assert "wand_crossover" in full and full["wand_crossover"]["trials"] == 1
    assert set(full["sections"]) == {"main", "crossover"}
    assert all("error" not in m for m in full["sections"].values())
