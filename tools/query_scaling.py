"""Standalone CLI for the query-side N→4N scaling phase of bench.py
(``bench.run_query_scaling`` — rank_topk_batch, the one-job query-log
replay path, over a pre-staged pages index at local[N] vs local[4N]).

Usage: python tools/query_scaling.py [index_root] [n_queries] [trials] [lo] [hi]
  index_root defaults to the newest staged bench trial index under
  /tmp/bench_pipeline; run ``python bench.py --section scaling`` first
  to stage it. [lo, hi) is the df-rank band the
  query terms are sampled from — see run_query_scaling's docstring for
  why the band must avoid both the stopword head and the df=1 tail.

Prints one JSON line: per-trial walls, queries/sec at each core count,
efficiency.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


def main() -> None:
    import bench

    root = sys.argv[1] if len(sys.argv) > 1 else None  # newest staged
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 180
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    lo = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    hi = int(sys.argv[5]) if len(sys.argv) > 5 else 200

    queries: dict = {}
    extra: dict = {}
    bench.run_query_scaling(queries, extra, index_root=root,
                            n_queries=n_queries, trials=trials,
                            band=(lo, hi))
    print(json.dumps({"index_root": root, **extra["query_scaling"]}))


if __name__ == "__main__":
    main()
