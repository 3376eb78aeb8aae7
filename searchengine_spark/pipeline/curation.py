"""End-to-end training-data curation pipeline — the composition of the
`ops/` curation operators in the order a web corpus actually needs
them:

1. URL-level dedup (crawl duplicates; only if the input has a url)
2. exact text dedup (identical bodies — MUST precede MinHash so giant
   boilerplate groups can't blow the LSH bucket cap and silently
   survive, see scripts/submit_dedup_job.py)
3. MinHash/LSH near-dedup with exact Jaccard verification
4. quality + repetition filters (Gopher-style feature thresholds)
5. benchmark decontamination (13-gram rule; optional — needs a
   benchmark corpus)
6. PII redaction (map-only rewrite, last so it never has to run over
   rows the earlier stages drop)
7. deterministic stratified sampling by language (optional mixture)

Every stage is an action over DataFrames built from `ops/` primitives
— no new semantics live here, only order, caching, and accounting.
Stage order is also the cost order: the cheap row-local key dedups run
first so the shuffling stages (LSH bands, Jaccard verify) see the
smallest possible corpus. Each stage's count is an accounting point
so a scheduler can assert volume invariants (candidate explosion,
over-aggressive filters) instead of discovering them in the loss
curve.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class CurationConfig:
    """Knobs for :func:`run_curation`; defaults are gate-scale sane."""

    # near-dedup
    num_hashes: int = 8
    bands: int = 4
    bucket_cap: int = 10_000
    jaccard_threshold: float = 0.5
    # resolve verified pairs to connected components and keep one rep
    # per CLUSTER (ops.dedup.dedup_cluster_filter) instead of the
    # greedy drop-every-doc_b policy; costs O(log diameter) extra
    # label-propagation rounds over the pair set only
    cluster_dedup: bool = False
    # per-round label state store for the cluster resolution: None =
    # localCheckpoint (heap blocks, gate-scale); a directory path =
    # double-buffered parquet spill — the 10^8+-node configuration
    # (see ops.dedup.duplicate_clusters)
    cc_state_dir: str | None = None
    # quality/repetition thresholds (ppm = parts per million of n-grams)
    max_top2_ppm: int = 200_000
    max_dup2_ppm: int = 200_000
    max_top3_ppm: int = 180_000
    max_dup3_ppm: int = 180_000
    # decontamination
    decontam_n: int = 13
    # sampling: stratum -> keep rate; None disables the stage
    sample_rates: dict[str, float] | None = None
    sample_seed: str = "sample"
    stages: dict[str, dict] = field(default_factory=dict)

    def record(self, name: str, t0: float, **counts) -> None:
        self.stages[name] = {
            **counts, "wall_s": round(time.time() - t0, 2)
        }


def _keep_min_per_key(docs: DataFrame, key: F.Column) -> DataFrame:
    """Drop all but the smallest doc_id per key — the stable keeper
    policy shared by url-level and exact dedup. One partial-agged
    groupBy on the key plus a left-semi join back (the join side is
    ~|distinct keys| and co-partitioned on doc_id by AQE)."""
    keep = (
        docs.select("doc_id", key.alias("_k"))
        .groupBy("_k")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return docs.join(keep, "doc_id", "left_semi")


def run_curation(docs: DataFrame, cfg: CurationConfig | None = None,
                 bench_docs: DataFrame | None = None) -> DataFrame:
    """Run the full curation chain over ``docs`` (doc_id, text[, lang]
    [, url]); returns the curated corpus with ``text`` redacted in
    place and all other input columns preserved. Per-stage counts and
    walls land in ``cfg.stages``.

    Each stage .cache()+count()s its survivor set: the counts are the
    accounting contract, and the cache stops Spark re-running the whole
    upstream chain once per downstream stage (lineage here is deep and
    includes shuffles). At real scale replace the caches with
    checkpoint parquets (pipeline/checkpoint.py) — same shape, spill-
    proof, and resumable.
    """
    cfg = cfg or CurationConfig()
    from ..ops.dedup import (
        dedup_filter,
        jaccard_verify,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from ..ops.pii import redact_pii
    from ..ops.textstats import quality_scores, repetition_stats

    def advance(prev: DataFrame | None, new: DataFrame) -> tuple[DataFrame, int]:
        """Materialize the next survivor set, then release the previous
        stage's cache — peak memory stays at ~2 corpus snapshots instead
        of one per stage (the difference between fitting and OOMing in a
        single-JVM local run; on a cluster it's executor storage churn)."""
        n = new.cache().count()
        if prev is not None:
            prev.unpersist()
        return new, n

    t0 = time.time()
    cur, n_in = advance(None, docs)
    cfg.record("input", t0, n_docs=n_in)

    # 1. URL-level dedup (crawl-side; no-op without a url column)
    if "url" in cur.columns:
        from ..ops.urlstats import normalize_url_col

        t0 = time.time()
        cur, n = advance(
            cur, _keep_min_per_key(cur, normalize_url_col(F.col("url")))
        )
        cfg.record("url_dedup", t0, n_kept=n)

    # 2. exact text dedup
    t0 = time.time()
    cur, n = advance(
        cur, _keep_min_per_key(cur, F.md5(F.col("text").cast("binary")))
    )
    cfg.record("exact_dedup", t0, n_kept=n)

    # 3. near-dedup (MinHash -> banded LSH -> exact Jaccard verify)
    t0 = time.time()
    sigs = minhash_signatures(cur, num_hashes=cfg.num_hashes)
    cand = lsh_candidate_pairs(
        sigs, num_hashes=cfg.num_hashes, bands=cfg.bands,
        bucket_cap=cfg.bucket_cap,
    ).cache()
    n_cand = cand.count()
    pairs = jaccard_verify(cur, cand, threshold=cfg.jaccard_threshold)
    if cfg.cluster_dedup:
        from ..ops.dedup import dedup_cluster_filter

        cur, n = advance(
            cur, dedup_cluster_filter(cur, pairs, state_dir=cfg.cc_state_dir)
        )
    else:
        cur, n = advance(cur, dedup_filter(cur, pairs))
    cand.unpersist()
    cfg.record("near_dedup", t0, n_candidates=n_cand, n_kept=n)

    # 4. quality + repetition filters (two map-only feature passes
    #    joined on doc_id; both are row-local so the join is the only
    #    exchange, and it is doc_id-partitioned like everything else)
    t0 = time.time()
    q = quality_scores(cur).select("doc_id", "quality_pass")
    r = repetition_stats(cur).select(
        "doc_id",
        (
            (F.col("top_2gram_ppm") <= cfg.max_top2_ppm)
            & (F.col("dup_2gram_ppm") <= cfg.max_dup2_ppm)
            & (F.col("top_3gram_ppm") <= cfg.max_top3_ppm)
            & (F.col("dup_3gram_ppm") <= cfg.max_dup3_ppm)
        ).alias("rep_pass"),
    )
    ok = q.join(r, "doc_id").filter("quality_pass AND rep_pass").select("doc_id")
    cur, n = advance(cur, cur.join(ok, "doc_id", "left_semi"))
    cfg.record("quality", t0, n_kept=n)

    # 5. decontamination (optional)
    if bench_docs is not None:
        from ..ops.decontam import benchmark_ngram_set, decontaminated

        t0 = time.time()
        grams = benchmark_ngram_set(bench_docs, n=cfg.decontam_n)
        cur, n = advance(cur, decontaminated(cur, grams, n=cfg.decontam_n))
        cfg.record("decontam", t0, n_kept=n)

    # 6. PII redaction (map-only; no count change by construction)
    cur = redact_pii(cur)

    # 7. stratified sampling (optional)
    if cfg.sample_rates is not None:
        from ..ops.sampling import stratified_sample

        t0 = time.time()
        cur, n = advance(
            cur, stratified_sample(cur, cfg.sample_rates,
                                   seed=cfg.sample_seed)
        )
        cfg.record("sample", t0, n_kept=n)

    return cur
