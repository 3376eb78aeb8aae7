"""Boolean serving at staged scale: publish the 1.2M-doc pages index
(BOTH posting families — unigram segments + biword) as a snapshot
table, then serve the reference's boolean grammar from it and record
walls + a scale parity check.

Evidence this produces (BENCH_dev_bool_serve_r4.json):
* publish cost for the two families at ~60M unigram / ~50M biword
  postings (one-off, amortized over every query),
* per-query serve walls (cold + warm trials) for AND, mixed
  AND/OR/NOT, biword fast-path phrase, 3-term positional phrase and
  NEAR/k — each a bucket-pruned file read of the published table,
* a doc_id-set parity assert against the in-memory engine over the
  same staged index (correctness at scale, not just latency).

Usage:  python tools/boolean_serve_scale.py [index_root] [publish_root]
Defaults: newest /tmp/bench_pipeline/idx_c8_t*, /tmp/bool_serve_pub.
Do NOT run concurrently with bench.py (shared-VM noise).
"""

from __future__ import annotations

import glob
import json
import sys
import time

sys.path.insert(0, ".")


def newest_staged_index() -> str:
    cands = sorted(glob.glob("/tmp/bench_pipeline/idx_c8_t*"),
                   key=lambda p: int(p.rsplit("_t", 1)[1]))
    if not cands:
        raise FileNotFoundError(
            "no staged index under /tmp/bench_pipeline — run bench.py's "
            "scaling section first")
    return cands[-1]


def main() -> None:
    from pyspark.sql import functions as F

    from searchengine_spark.session import get_spark

    index_root = sys.argv[1] if len(sys.argv) > 1 else newest_staged_index()
    pub_root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bool_serve_pub"
    out = {"index_root": index_root, "publish_root": pub_root}

    # ---- publish (own session; the one-off build-side cost) ----------
    import shutil

    shutil.rmtree(pub_root, ignore_errors=True)
    s = get_spark("bool-serve-publish", cores=8)
    from searchengine_spark.indexing.segments import build_segments
    from searchengine_spark.pipeline.index_pipeline import publish_segments

    postings = s.read.parquet(f"{index_root}/postings/data")
    doc_stats = s.read.parquet(f"{index_root}/doc_stats/data")
    corpus_stats = s.read.parquet(f"{index_root}/corpus_stats/data")
    biword = s.read.parquet(f"{index_root}/biword/data")
    out["n_postings"] = postings.count()
    out["n_biword_rows"] = biword.count()

    t0 = time.time()
    seg = build_segments(postings, doc_stats).withColumn(
        "bucket",
        F.pmod(F.crc32(F.col("term").cast("binary")), F.lit(64)).cast("int"))
    publish_segments(s, pub_root, seg, term_buckets=64, biword=biword,
                     corpus_stats=corpus_stats, cluster_partitions=64,
                     note="boolean-serve scale evidence")
    out["publish_wall_s"] = round(time.time() - t0, 1)

    # deterministic query terms from the index's own vocabulary:
    # df-rank band [20, 200) (the head is stopword monsters, the tail
    # does no posting work — BASELINE.md protocol)
    vocab = (postings.groupBy("term").agg(F.count("*").alias("df"))
             .orderBy(F.desc("df"), F.asc("term")).limit(200).collect())
    band = [r["term"] for r in vocab[20:200]]
    t_a, t_b, t_c, t_d = band[0], band[7], band[40], band[80]
    top_biword = (biword.groupBy("term").agg(F.count("*").alias("df"))
                  .orderBy(F.desc("df"), F.asc("term")).limit(1)
                  .collect()[0]["term"])
    s.stop()

    ident = lambda t: t  # noqa: E731  (staged index = simple analyzer terms)
    queries = {
        "and2": f"{t_a} {t_b}",
        "mixed": f"{t_a} {t_b} + {t_c} -{t_d}",
        "biword_phrase": f'"{top_biword}"',
        "phrase3": f'"{t_a} {t_b} {t_c}"',
        "near4": f"[{t_a} NEAR/4 {t_b}]",
    }
    out["queries"] = queries

    # ---- serve (fresh session: cold first trial, then warm) ----------
    from searchengine_spark.queries.serve import boolean_from_published

    s = get_spark("bool-serve-query", cores=8)
    walls: dict[str, list[float]] = {}
    rows: dict[str, int] = {}
    for name, q in queries.items():
        walls[name] = []
        for _ in range(3):
            t0 = time.time()
            rows[name] = boolean_from_published(
                s, pub_root, q, normalize=ident).count()
            walls[name].append(round(time.time() - t0, 3))
    out["serve_walls_s"] = walls
    out["serve_result_rows"] = rows

    # ---- parity at scale vs the in-memory engine ----------------------
    from searchengine_spark.indexing.build import SparkIndex
    from searchengine_spark.queries.engine import boolean_query

    idx = SparkIndex(
        postings=s.read.parquet(f"{index_root}/postings/data"),
        doc_stats=s.read.parquet(f"{index_root}/doc_stats/data"),
        corpus_stats=s.read.parquet(f"{index_root}/corpus_stats/data"),
        biword=s.read.parquet(f"{index_root}/biword/data"),
    )
    parity = {}
    for name in ("mixed", "biword_phrase", "near4"):
        t0 = time.time()
        want = [r.doc_id for r in boolean_query(
            idx, queries[name], normalize=ident).collect()]
        inmem_wall = round(time.time() - t0, 3)
        got = [r.doc_id for r in boolean_from_published(
            s, pub_root, queries[name], normalize=ident).collect()]
        parity[name] = {"equal": got == want, "n": len(want),
                        "inmem_wall_s": inmem_wall}
        if got != want:
            raise SystemExit(f"PARITY FAIL {name}: {len(got)} vs {len(want)}")
    out["parity"] = parity
    s.stop()

    with open("BENCH_dev_bool_serve_r4.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("n_postings", "n_biword_rows", "publish_wall_s",
                       "serve_walls_s", "serve_result_rows")}))


if __name__ == "__main__":
    main()
