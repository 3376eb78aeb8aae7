"""PII / stratified-sampling / URL-canon / substring-dedup semantics.

Cross-engine value parity for these ops is enforced by the gate
(pii_redact, sample_stratified, sample_summary, url_dedup,
url_host_stats, dedup_substring vs DuckDB); these tests pin the
semantic properties the hash alone can't name: which spans redact,
sample stability under corpus growth, each normalization rule in
isolation, and the bucket_cap boilerplate bound.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------


def test_pii_counts_and_redaction(spark):
    from searchengine_spark.ops.pii import pii_stats, redact_pii

    docs = _docs(spark, [
        (0, "mail a.b+c@ex.io or X_9@sub.domain.org today"),
        (1, "hosts 10.0.0.1 and 255.255.255.255 and 999.1.2.3"),
        (2, "call +1 800-555-0199 or +44 207-946-0958"),
        (3, "no pii here, just words and 12345 and a.b"),
        (4, "combo z@q.de at 8.8.8.8 via +7 999-123-4567 end"),
    ])
    stats = {r["doc_id"]: r for r in pii_stats(docs).collect()}
    assert (stats[0]["n_emails"], stats[0]["n_ipv4"], stats[0]["n_phones"]) == (2, 0, 0)
    # range validation is deliberately out of scope: 999.1.2.3 matches
    assert (stats[1]["n_emails"], stats[1]["n_ipv4"]) == (0, 3)
    assert stats[2]["n_phones"] == 2
    assert stats[3]["n_pii"] == 0
    assert (stats[4]["n_emails"], stats[4]["n_ipv4"], stats[4]["n_phones"]) == (1, 1, 1)

    red = {r["doc_id"]: r["text"] for r in redact_pii(docs).collect()}
    assert red[0] == "mail <EMAIL> or <EMAIL> today"
    assert red[1] == "hosts <IP> and <IP> and <IP>"
    assert red[2] == "call <PHONE> or <PHONE>"
    assert red[3] == docs.filter("doc_id = 3").first()["text"]
    assert red[4] == "combo <EMAIL> at <IP> via <PHONE> end"


def test_pii_non_matches_survive(spark):
    from searchengine_spark.ops.pii import redact_pii

    docs = _docs(spark, [
        # bare numbers, @-less, +-less phone shapes must pass through
        (0, "version 1.2.3 at x.y, 800-555-0199, user at host dot com"),
    ])
    assert redact_pii(docs).first()["text"] == docs.first()["text"]


# ---------------------------------------------------------------------------
# Stratified sampling
# ---------------------------------------------------------------------------


def _corpus(spark, n):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
    )


def test_sample_deterministic_and_growth_stable(spark):
    from searchengine_spark.ops.sampling import stratified_sample

    rates = {"en": 0.5, "de": 0.25}
    small = stratified_sample(_corpus(spark, 400), rates)
    big = stratified_sample(_corpus(spark, 1000), rates)
    kept_small = {r["doc_id"] for r in small.collect()}
    kept_small2 = {r["doc_id"] for r in small.collect()}
    kept_big = {r["doc_id"] for r in big.collect()}
    assert kept_small == kept_small2  # rerun-identical
    # growth stability: a doc's fate never changes when docs are added
    assert kept_small == {d for d in kept_big if d < 400}


def test_sample_rates_and_unknown_stratum(spark):
    from searchengine_spark.ops.sampling import sample_summary

    rows = sample_summary(_corpus(spark, 3000), {"en": 0.8}).collect()
    by = {r["stratum"]: r for r in rows}
    # 'de' has no configured rate -> dropped entirely
    assert by["de"]["n_sampled"] == 0
    # realized 'en' rate within a loose binomial band around 0.8
    en = by["en"]
    assert en["n_total"] == 1000
    assert 0.72 <= en["n_sampled"] / en["n_total"] <= 0.88


def test_rate_threshold_bounds():
    from searchengine_spark.ops.sampling import rate_threshold

    assert rate_threshold(0.0) == 0
    assert rate_threshold(1.0) == 1 << 32
    with pytest.raises(ValueError):
        rate_threshold(1.5)


# ---------------------------------------------------------------------------
# URL normalization / host stats
# ---------------------------------------------------------------------------


NORM_CASES = [
    # (raw, normalized, host) — one rule per case
    ("HTTP://WWW.Ex.COM/A/b", "http://www.ex.com/A/b", "www.ex.com"),
    ("http://ex.com:80/x", "http://ex.com/x", "ex.com"),
    ("https://ex.com:443/x", "https://ex.com/x", "ex.com"),
    ("http://ex.com:8080/x", "http://ex.com:8080/x", "ex.com"),
    ("http://ex.com/x/", "http://ex.com/x", "ex.com"),
    ("http://ex.com/x///", "http://ex.com/x", "ex.com"),
    ("http://ex.com/x#frag?fake=1", "http://ex.com/x", "ex.com"),
    ("http://ex.com/x?utm_source=a&q=1&utm_b=c", "http://ex.com/x?q=1",
     "ex.com"),
    ("http://ex.com/x?utm_source=a", "http://ex.com/x", "ex.com"),
    ("http://ex.com/x?b=2&a=1", "http://ex.com/x?b=2&a=1", "ex.com"),
    ("http://ex.com", "http://ex.com", "ex.com"),
]


def test_url_normalization_rules(spark):
    from searchengine_spark.ops.urlstats import normalize_urls

    pages = spark.createDataFrame(
        [(i, raw) for i, (raw, _, _) in enumerate(NORM_CASES)],
        "doc_id long, url string",
    )
    out = {r["doc_id"]: r for r in normalize_urls(pages).collect()}
    for i, (raw, want_norm, want_host) in enumerate(NORM_CASES):
        assert out[i]["norm_url"] == want_norm, raw
        assert out[i]["host"] == want_host, raw


def test_url_dedup_groups(spark):
    from searchengine_spark.ops.urlstats import host_stats, url_dedup_groups

    pages = spark.createDataFrame(
        [
            (3, "http://ex.com/x?utm_source=a"),
            (1, "HTTP://EX.COM/x/"),
            (2, "http://ex.com:80/x#top"),
            (4, "http://other.com/x"),
        ],
        "doc_id long, url string",
    )
    groups = {r["norm_url"]: r for r in url_dedup_groups(pages).collect()}
    g = groups["http://ex.com/x"]
    assert (g["n_docs"], g["keep_doc_id"]) == (3, 1)
    assert groups["http://other.com/x"]["n_docs"] == 1
    hosts = {r["host"]: r for r in host_stats(pages).collect()}
    assert (hosts["ex.com"]["n_docs"], hosts["ex.com"]["n_urls"]) == (3, 1)


# ---------------------------------------------------------------------------
# Exact-substring dedup
# ---------------------------------------------------------------------------


def test_substring_pairs_partial_overlap(spark):
    from searchengine_spark.ops.dedup import substring_pairs

    shared = "one two three four five six seven"  # 7 tokens = 1 window
    docs = _docs(spark, [
        (0, f"alpha beta {shared} gamma"),
        (1, f"delta {shared} epsilon zeta"),
        (2, "unrelated words that never repeat anything here at all"),
        # doc 3 repeats the shared window twice -> still DISTINCT per doc
        (3, f"{shared} filler {shared}"),
    ])
    pairs = {
        (r["doc_a"], r["doc_b"]): r["n_shared_windows"]
        for r in substring_pairs(docs, n=7).collect()
    }
    assert (0, 1) in pairs and (0, 3) in pairs and (1, 3) in pairs
    assert all((2 not in p) for p in pairs)
    # window counts are over DISTINCT windows within each doc
    assert pairs[(0, 1)] == 1


def test_substring_pairs_bucket_cap_drops_boilerplate(spark):
    from searchengine_spark.ops.dedup import substring_pairs

    nav = "home about contact privacy terms login search"
    docs = _docs(spark, [(i, f"{nav} page{i} x y z") for i in range(6)])
    # the nav window appears in 6 docs: cap=5 excludes it entirely
    assert substring_pairs(docs, n=7, bucket_cap=5).count() == 0
    # with a generous cap all 15 pairs surface
    assert substring_pairs(docs, n=7, bucket_cap=100).count() == 15


def test_shingles_short_docs_emit_nothing(spark):
    # regression: sequence(1, 0) runs DESCENDING in Spark, so an
    # unguarded transform indexed out of range on docs with < n tokens
    from searchengine_spark.ops.dedup import shingles

    docs = _docs(spark, [(0, "zz"), (1, "two words"), (2, "a b c d")])
    out = shingles(docs, n=3).collect()
    assert {r["doc_id"] for r in out} == {2}
    assert {r["shingle"] for r in out} == {"a b c", "b c d"}


def test_remove_duplicate_spans_keep_first(spark):
    from searchengine_spark.ops.dedup import remove_duplicate_spans

    shared = "one two three four five six seven"  # exactly one 7-window
    docs = _docs(spark, [
        (0, f"alpha beta {shared} gamma"),       # keeper: untouched
        (1, f"delta {shared} epsilon zeta"),     # loser: span removed
        (2, "totally unrelated words that never repeat anything"),
        (3, "tiny doc"),                         # < 7 tokens: untouched
        (4, ""),                                 # empty: no crash
    ])
    out = {r["doc_id"]: r for r in remove_duplicate_spans(docs, n=7).collect()}
    assert out[0]["text"] == f"alpha beta {shared} gamma"
    assert out[0]["n_tokens_removed"] == 0
    assert out[1]["text"] == "delta epsilon zeta"
    assert out[1]["n_tokens_removed"] == 7
    assert out[2]["n_tokens_removed"] == 0
    assert out[3]["text"] == "tiny doc"
    assert out[4]["text"] == "" and out[4]["n_tokens_removed"] == 0


def test_remove_duplicate_spans_remove_all(spark):
    from searchengine_spark.ops.dedup import remove_duplicate_spans

    shared = "one two three four five six seven"
    docs = _docs(spark, [
        (0, f"alpha beta {shared} gamma"),
        (1, f"delta {shared} epsilon zeta"),
    ])
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(docs, n=7, keep_first=False).collect()
    }
    assert out[0]["text"] == "alpha beta gamma"
    assert out[1]["text"] == "delta epsilon zeta"


def test_remove_duplicate_spans_overlapping_windows(spark):
    from searchengine_spark.ops.dedup import remove_duplicate_spans

    # an 8-token shared run = two overlapping 7-windows in the loser;
    # coverage is the union, so all 8 tokens go
    shared = "one two three four five six seven eight"
    docs = _docs(spark, [
        (0, f"{shared} keeper tail words here"),
        (1, f"head {shared} tail"),
    ])
    out = {r["doc_id"]: r for r in remove_duplicate_spans(docs, n=7).collect()}
    assert out[1]["text"] == "head tail"
    assert out[1]["n_tokens_removed"] == 8
    assert out[0]["n_tokens_removed"] == 0


def test_duplicate_clusters_chain_and_star(spark):
    from searchengine_spark.ops.dedup import duplicate_clusters

    # chain 1-2-3 (diameter 2), star {10,11,12} via hub 10, isolated pair
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (10, 12), (20, 21)],
        "doc_a long, doc_b long",
    )
    out = {r["doc_id"]: r["cluster_id"]
           for r in duplicate_clusters(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_duplicate_clusters_long_path_converges(spark):
    from searchengine_spark.ops.dedup import duplicate_clusters

    # a 33-node path: diameter 32 > max_iter rounds without pointer
    # jumping; with it, convergence takes O(log d) rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(32)], "doc_a long, doc_b long"
    )
    out = duplicate_clusters(pairs, max_iter=10).collect()
    assert {r["cluster_id"] for r in out} == {0}
    assert len(out) == 33


def test_duplicate_clusters_parquet_state_parity(spark, tmp_path):
    from searchengine_spark.ops.dedup import duplicate_clusters

    # same inputs as the chain/star case, plus a path long enough to
    # need >2 rounds so labels_{0,1} double-buffering actually cycles
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (10, 12), (20, 21)]
        + [(100 + i, 101 + i) for i in range(12)],
        "doc_a long, doc_b long",
    )
    base = {(r["doc_id"], r["cluster_id"])
            for r in duplicate_clusters(pairs).collect()}
    spilled = {(r["doc_id"], r["cluster_id"])
               for r in duplicate_clusters(
                   pairs, state_dir=str(tmp_path / "cc_state")).collect()}
    assert spilled == base
    assert (tmp_path / "cc_state" / "edges").exists()


def test_duplicate_clusters_empty_pairs(spark):
    from searchengine_spark.ops.dedup import duplicate_clusters

    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert duplicate_clusters(pairs).count() == 0


def test_dedup_cluster_filter_beats_greedy(spark):
    from searchengine_spark.ops.dedup import dedup_cluster_filter, dedup_filter

    docs = _docs(spark, [(1, "a"), (3, "b"), (5, "c"), (7, "d")])
    # component {1,3,5} where 3 never appears as doc_b: greedy keeps
    # {1,3,7}, cluster filter keeps exactly one rep {1,7}
    pairs = spark.createDataFrame([(1, 5), (3, 5)], "doc_a long, doc_b long")
    greedy = {r["doc_id"] for r in dedup_filter(docs, pairs).collect()}
    cluster = {r["doc_id"] for r in dedup_cluster_filter(docs, pairs).collect()}
    assert greedy == {1, 3, 7}
    assert cluster == {1, 7}


# ---------------------------------------------------------------------------
# End-to-end curation pipeline: one planted victim per stage
# ---------------------------------------------------------------------------


def test_run_curation_end_to_end(spark):
    from searchengine_spark.pipeline.curation import (
        CurationConfig,
        run_curation,
    )

    good = ("the quick brown fox jumps over the lazy dog while rain "
            "falls gently on quiet green hills near town")
    secret = ("the committee will convene on thursday to review the "
              "annual budget proposal in detail")  # 14 tokens
    rows = [
        # survivors
        (0, good, "en", "http://a.com/1"),
        (7, "please contact me at a@b.io about the meeting scheduled "
            "for next tuesday morning in the main office", "en",
         "http://a.com/7"),
        (8, "ein ganz normales deutsches dokument mit vielen "
            "verschiedenen woertern und ohne jede wiederholung darin",
         "de", "http://a.com/8"),
        # victims, one per stage
        (1, good, "en", "http://b.com/1"),              # exact dup of 0
        (2, "totally different words here about sailing boats on "
            "clear blue water under bright skies today", "en",
         "HTTP://A.COM:80/1"),                          # url dup of 0
        (3, good + " extra", "en", "http://a.com/3"),   # near dup of 0
        (4, "zz", "en", "http://a.com/4"),              # quality fail
        (5, " ".join(["spam ham"] * 30), "en", "http://a.com/5"),  # rep
        (6, f"leading words then {secret} trailing words", "en",
         "http://a.com/6"),                             # contaminated
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, url string"
    )
    bench = spark.createDataFrame([(100, secret)], "doc_id long, text string")
    cfg = CurationConfig(sample_rates={"en": 1.0, "de": 0.0})
    out = run_curation(docs, cfg, bench_docs=bench).collect()
    by = {r["doc_id"]: r for r in out}

    # de doc sampled out at rate 0; every planted victim dropped at its
    # stage; the two en survivors remain
    assert set(by) == {0, 7}
    # PII redacted in place, other columns preserved
    assert "<EMAIL>" in by[7]["text"] and "a@b.io" not in by[7]["text"]
    assert by[0]["url"] == "http://a.com/1" and by[0]["lang"] == "en"

    # stage accounting: monotone survivor counts, every stage present
    s = cfg.stages
    assert s["input"]["n_docs"] == 9
    assert s["url_dedup"]["n_kept"] == 8
    assert s["exact_dedup"]["n_kept"] == 7
    assert s["near_dedup"]["n_kept"] == 6
    assert s["quality"]["n_kept"] == 4
    assert s["decontam"]["n_kept"] == 3
    assert s["sample"]["n_kept"] == 2


def test_run_curation_cluster_dedup_option(spark, tmp_path):
    from searchengine_spark.pipeline.curation import (
        CurationConfig,
        run_curation,
    )

    base = ("the quick brown fox jumps over the lazy dog while rain "
            "falls gently on quiet green hills near town")
    # 1 and 3 are both near-dups of 5 (greedy drops only 5's partners
    # that appear as doc_b: 3 and 5; cluster mode keeps exactly min=1)
    rows = [
        (1, base + " one", "en"),
        (3, base + " two", "en"),
        (5, base, "en"),
        (9, "completely unrelated prose about winter mountains and "
            "long journeys across the frozen northern plains", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    greedy = {r["doc_id"]
              for r in run_curation(docs, CurationConfig()).collect()}
    clustered = {r["doc_id"]
                 for r in run_curation(
                     docs, CurationConfig(cluster_dedup=True)).collect()}
    assert clustered == {1, 9}
    assert clustered <= greedy
    spilled = {r["doc_id"]
               for r in run_curation(
                   docs, CurationConfig(
                       cluster_dedup=True,
                       cc_state_dir=str(tmp_path / "cc"))).collect()}
    assert spilled == clustered


def test_run_curation_without_optional_stages(spark):
    from searchengine_spark.pipeline.curation import (
        CurationConfig,
        run_curation,
    )

    docs = spark.createDataFrame(
        [(i, f"document number {i} holds several distinct useful "
             f"words about topic{i} and more", "en") for i in range(4)],
        "doc_id long, text string, lang string",
    )
    cfg = CurationConfig()  # no sampling, no bench, no url column
    assert run_curation(docs, cfg).count() == 4
    assert "url_dedup" not in cfg.stages
    assert "decontam" not in cfg.stages
    assert "sample" not in cfg.stages
