"""bench.py contract: prints exactly ONE JSON line with the driver's
required keys (metric/value/unit/queries/sf). Runs in fast mode (sf
0.001, no scaling phase) — protects BENCH_r{N}.json production."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_emits_single_json_line():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_SCALING="0",
        SPARK_GRAFT_PAGES_N="300",
        SPARK_GRAFT_WAND_N="100000",
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    json_lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert len(json_lines) == 1
    rec = json.loads(json_lines[0])
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in rec, key
    assert rec["unit"] == "sec" and rec["sf"] == 0.001
    assert rec["value"] > 0
    assert {"index_build_reference", "bm25_p50_k10", "wand_p50_k10"} <= set(rec["queries"])
    assert all(v >= 0 for v in rec["queries"].values())
