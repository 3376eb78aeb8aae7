"""Lexicon-index scale evidence: build the SymSpell deletion index and
the k-gram index over a synthetic 1M-term vocabulary (the web-scale
shape — the gate corpora have tiny vocabularies) at two parallelism
levels, interleaved A/B trials, and probe them with did-you-mean /
wildcard queries. Writes one JSON artifact.

Vocabulary: term = md5(id) prefix of length 6+id%11 (6–16 chars,
realistic token lengths), df = 1 + id % 1000 — pure codegen, byte-
identical at any parallelism (the same determinism argument as
corpus.pages_df), so the N vs 4N comparison measures the engine, not
the generator.

Run: python tools/lexicon_scale_bench.py [n_terms] [out.json]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def _vocab(spark, n: int, partitions: int):
    from pyspark.sql import functions as F

    return (
        spark.range(0, n, 1, numPartitions=partitions)
        .select(
            F.substring(F.md5(F.col("id").cast("string")), 1,
                        (F.lit(6) + (F.col("id") % 11)).cast("int"))
            .alias("term"),
            (F.lit(1) + F.col("id") % 1000).cast("long").alias("df"),
        )
    )


def _build_once(cores: int, n: int) -> dict:
    from pyspark.sql import SparkSession

    from searchengine_spark.queries.lexicon import (
        deletion_index,
        expand_wildcard,
        kgram_index,
        spell_correct,
    )

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"lexicon-scale-{cores}")
        .config("spark.sql.shuffle.partitions", str(max(cores, 4)))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    try:
        vocab = _vocab(spark, n, cores * 4).cache()
        n_vocab = vocab.count()

        t0 = time.time()
        deletions = deletion_index(vocab).cache()
        n_del = deletions.count()
        t_del = time.time() - t0

        t0 = time.time()
        kg = kgram_index(vocab).cache()
        n_kg = kg.count()
        t_kg = time.time() - t0

        t0 = time.time()
        sugg = spell_correct(
            vocab, ["a1b2c3", "deadbeef", "0f0f0f0", "c0ffee11", "abcdef"],
            deletions=deletions,
        ).collect()
        t_spell = time.time() - t0

        t0 = time.time()
        n_wc = expand_wildcard(vocab, "abc*", kgrams=kg).count()
        t_wc = time.time() - t0
    finally:
        spark.stop()
    return {
        "cores": cores,
        "n_vocab": n_vocab,
        "deletion_rows": n_del,
        "deletion_build_s": round(t_del, 2),
        "kgram_rows": n_kg,
        "kgram_build_s": round(t_kg, 2),
        "spell_probe_s": round(t_spell, 2),
        "spell_suggestions": len(sugg),
        "wildcard_probe_s": round(t_wc, 2),
        "wildcard_matches": n_wc,
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_dev_lexicon_r4.json"
    trials = {2: [], 8: []}
    for _ in range(2):  # interleaved A/B
        for cores in (2, 8):
            trials[cores].append(_build_once(cores, n))
    best = {
        c: min(ts, key=lambda r: r["deletion_build_s"] + r["kgram_build_s"])
        for c, ts in trials.items()
    }
    build2 = best[2]["deletion_build_s"] + best[2]["kgram_build_s"]
    build8 = best[8]["deletion_build_s"] + best[8]["kgram_build_s"]
    eff = (build2 / build8) / 4.0
    out = {
        "metric": "lexicon index build (deletion + k-gram) over synthetic vocabulary",
        "n_terms": n,
        "best": best,
        "trials": trials,
        "rows_per_sec_local8": round(
            (best[8]["deletion_rows"] + best[8]["kgram_rows"]) / build8, 1),
        "efficiency_n_to_4n": round(eff, 3),
        "selection": "best-of-2 interleaved per level, combined build wall",
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("n_terms", "rows_per_sec_local8",
                       "efficiency_n_to_4n")}))


if __name__ == "__main__":
    main()
