"""Training-data ops + classification + eval + multimodal tests.

Cross-engine value correctness for most ops is enforced by the driver
gate (tools/check_gate.py vs DuckDB); these tests pin semantic
properties: planted near-duplicates are found, ANN ⊆ brute-force
semantics, AP/MAP formulas, multimodal determinism + schema.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_minhash_lsh_finds_planted_neardups(spark, docs):
    from searchengine_spark.ops.dedup import (
        jaccard_verify,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    sig = minhash_signatures(docs)
    cand = lsh_candidate_pairs(sig, min_matches=2)
    verified = jaccard_verify(docs, cand, threshold=0.5).collect()
    # the synthetic corpus plants 'dup'-marked near-duplicate pairs
    assert len(verified) > 0
    marked = {
        r["doc_id"]
        for r in docs.filter(F.col("text").contains("dup")).select("doc_id").collect()
    }
    # planted scheme: a near-dup pair links an original to a copy with a
    # 'dup' marker token — at least one member of every true pair is marked
    for r in verified:
        assert r["doc_a"] in marked or r["doc_b"] in marked
        assert 0.5 <= r["jaccard"] <= 1.0
    # and every marked doc should surface in at least one verified pair
    found = {r["doc_a"] for r in verified} | {r["doc_b"] for r in verified}
    assert len(marked - found) <= len(marked) // 2


def test_simhash_close_for_neardups(spark, docs):
    from searchengine_spark.ops.dedup import jaccard_verify, lsh_candidate_pairs, minhash_signatures, simhash

    pair = (
        jaccard_verify(docs, lsh_candidate_pairs(minhash_signatures(docs)), threshold=0.5)
        .orderBy(F.desc("jaccard")).limit(1).collect()
    )
    assert pair
    a, b = pair[0]["doc_a"], pair[0]["doc_b"]
    sh = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    hamming = bin(sh[a] ^ sh[b]).count("1")
    assert hamming <= 10  # near-dups agree on most simhash bits (32-bit)


def test_ann_subset_of_bruteforce_bucket(spark, emb):
    from searchengine_spark.ops.similarity import (
        ann_topk,
        brute_force_topk,
        with_lsh_buckets,
    )

    qv = [float(v) for v in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    rest = emb.filter(F.col("vec_id") != 0)
    ann = ann_topk(rest, qv, k=5, nbits=4).collect()
    assert len(ann) > 0
    # ANN results must be exactly brute-force restricted to the bucket
    qbucket = sum(1 << i for i, v in enumerate(qv[:4]) if v > 0)
    bucket_members = with_lsh_buckets(rest, nbits=4).filter(
        F.col("bucket") == qbucket
    )
    bf = brute_force_topk(bucket_members, qv, k=5).collect()
    assert [r["vec_id"] for r in ann] == [r["vec_id"] for r in bf]


def test_bruteforce_topk_selfsim(spark, emb):
    from searchengine_spark.ops.similarity import brute_force_topk

    qv = [float(v) for v in emb.filter(F.col("vec_id") == 7).collect()[0]["embedding"]]
    top = brute_force_topk(emb, qv, k=1).collect()
    assert top[0]["vec_id"] == 7 and abs(top[0]["cosine"] - 1.0) < 1e-9


def test_lang_id_and_quality_schema(spark, docs):
    from searchengine_spark.ops.textstats import lang_id, quality_scores, token_counts

    n = docs.count()
    assert lang_id(docs).count() == n
    q = quality_scores(docs)
    assert set(q.columns) == {
        "doc_id", "n_tokens", "mean_tok_len", "stopword_ratio",
        "alnum_ratio", "quality_pass",
    }
    tc = token_counts(docs).collect()
    for r in tc:
        assert r["alnum_tokens"] <= r["ws_tokens"] + r["n_chars"]  # sanity


def test_fingerprint_order_sensitive(spark):
    from searchengine_spark.ops.textstats import fingerprints

    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "gamma beta alpha")], "doc_id long, text string"
    )
    fps = {r["doc_id"]: r["fingerprint"] for r in fingerprints(df).collect()}
    assert fps[0] != fps[1]


def test_fingerprint_long_doc_no_overflow(spark):
    """The per-step mod-reduce keeps the int64 sum bounded even for a
    pathological multi-hundred-thousand-token document: the result must
    stay non-negative (an overflow would wrap negative) and below
    n_tokens * modulus."""
    from searchengine_spark.ops.textstats import fingerprints

    n_tokens = 200_000
    text = " ".join(f"tok{i % 1000}" for i in range(n_tokens))
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    fp = fingerprints(df).collect()[0]["fingerprint"]
    assert 0 <= fp < n_tokens * 1_000_000_007


def test_unigram_logprob(spark):
    """Hand-checked unigram LM on a 3-doc corpus + the quality-signal
    property: a doc of rare tokens scores a lower mean logprob than a
    doc of corpus-head tokens."""
    import math

    from searchengine_spark.ops.textstats import unigram_logprob

    df = spark.createDataFrame(
        [(0, "the the the cat"), (1, "the the dog dog"), (2, "zyx qwv")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    n = 10  # total tokens
    p = {"the": 5 / n, "cat": 1 / n, "dog": 2 / n, "zyx": 1 / n, "qwv": 1 / n}
    exp0 = (3 * math.log(p["the"]) + math.log(p["cat"])) / 4
    exp2 = (math.log(p["zyx"]) + math.log(p["qwv"])) / 2
    assert rows[0]["n_tokens"] == 4
    assert rows[0]["mean_logprob"] == pytest.approx(exp0, abs=1e-12)
    assert rows[2]["mean_logprob"] == pytest.approx(exp2, abs=1e-12)
    assert rows[2]["mean_logprob"] < rows[0]["mean_logprob"]


def test_classifiers_majority_class_sanity(spark, docs):
    from searchengine_spark.ops.classify import knn_classify, nb_classify, rocchio_classify

    n = docs.count()
    for fn in (nb_classify, lambda d: rocchio_classify(d, d), lambda d: knn_classify(d, d)):
        preds = fn(docs)
        assert preds.count() == n
        langs = {r["pred_class"] for r in preds.select("pred_class").distinct().collect()}
        assert langs <= {"en", "de", "es", "fr", "zh"}


def test_knn_max_df_parity_on_gate_corpus(spark, docs):
    """The gate's df cap (max_df=0.9 of train count) must not change
    predictions on the gate corpus: its synthetic vocabulary is
    uniformly mid-df (every term df ≈ 0.78·N), so the cap keeps every
    term and the capped run is prediction-identical to the uncapped
    reference behavior."""
    from searchengine_spark.ops.classify import knn_classify

    uncapped = {r["doc_id"]: r["pred_class"]
                for r in knn_classify(docs, docs, k=5).collect()}
    capped = {r["doc_id"]: r["pred_class"]
              for r in knn_classify(docs, docs, k=5, max_df=0.9).collect()}
    assert capped == uncapped


def test_knn_max_df_binding_drops_stopword(spark):
    """When the cap BINDS (planted stopword in every doc), the
    stopword is excluded from the distance space, the join fan-out
    shrinks, and predictions still match the uncapped run — the
    class-signal terms dominate the vote (the docsim rationale: df≈N
    terms carry no discriminative signal)."""
    from searchengine_spark.ops.classify import _normalized_vectors, knn_classify

    rows = []
    for i in range(12):
        cls = "en" if i % 2 == 0 else "de"
        signal = ("alpha beta" if cls == "en" else "gamma delta")
        # 'the' in EVERY doc with varying tf — df = N, the stopword tier
        rows.append((i, cls, f"{signal} {signal} " + "the " * (1 + i % 3)))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")

    uncapped = {r["doc_id"]: r["pred_class"]
                for r in knn_classify(df, df, k=3).collect()}
    capped = {r["doc_id"]: r["pred_class"]
              for r in knn_classify(df, df, k=3, max_df=0.9).collect()}
    assert capped == uncapped
    assert set(uncapped.values()) == {"en", "de"}

    # the cap genuinely binds: an absolute cap below N excludes 'the'
    # (df=12) — assert via the absolute-int path too
    capped_abs = {r["doc_id"]: r["pred_class"]
                  for r in knn_classify(df, df, k=3, max_df=11).collect()}
    assert capped_abs == uncapped
    vocab_df = {r["term"]: r["df"] for r in _normalized_vectors(df)
                .groupBy("term").agg(F.count("*").alias("df")).collect()}
    assert vocab_df["the"] == 12  # the planted df=N term the cap drops


def test_average_precision_formula():
    from searchengine_spark.eval.metrics import average_precision

    # hits at ranks 1 and 3 of 2 relevant: (1/1 + 2/3) / 2
    assert abs(average_precision([5, 9, 7], {5, 7}) - (1 + 2 / 3) / 2) < 1e-12
    # reference divides by |relevant|, not #retrieved-hits
    assert abs(average_precision([5], {5, 7, 8}) - (1 / 3)) < 1e-12
    assert average_precision([1, 2], set()) == 0.0


def test_multimodal_features_deterministic(spark):
    from searchengine_spark.ops.multimodal import (
        FEATURE_DIM,
        extract_features,
        media_df,
        sample_frames,
    )

    feats1 = {r["media_id"]: r["features"]
              for r in extract_features(media_df(spark, 12, partitions=2)).collect()}
    feats2 = {r["media_id"]: r["features"]
              for r in extract_features(media_df(spark, 12, partitions=4)).collect()}
    assert feats1 == feats2  # parallelism-invariant
    assert all(len(v) == FEATURE_DIM for v in feats1.values())
    frames = sample_frames(media_df(spark, 12, partitions=2), every=2).collect()
    vids = {r["media_id"] for r in frames}
    assert vids == {2, 5, 8, 11}  # every 3rd id is video
    assert {r["frame_idx"] for r in frames} == {0, 2, 4, 6}


def test_multimodal_resize_bilinear(spark):
    import numpy as np

    from searchengine_spark.ops.multimodal import (
        MAGIC,
        _decode_raster,
        bilinear_resize,
        media_df,
        resize_image,
        synth_payload,
    )

    out = {r["media_id"]: r for r in resize_image(media_df(spark, 4), 16, 16).collect()}
    assert len(out) == 4
    for mid, row in out.items():
        src = _decode_raster(synth_payload(mid), 32, 32)
        expected = bilinear_resize(src, 16, 16)
        assert bytes(row["payload"]) == MAGIC + expected.tobytes()
        assert (row["width"], row["height"]) == (16, 16)
    # identity resize reproduces the source raster exactly
    ident = resize_image(media_df(spark, 2), 32, 32).collect()
    for row in ident:
        src = _decode_raster(synth_payload(row["media_id"]), 32, 32)
        assert bytes(row["payload"]) == MAGIC + src.tobytes()
    # kernel golden: 2x2 -> 3x3 bilinear with align_corners
    k = bilinear_resize(np.array([[0, 100], [100, 200]], dtype=np.uint8), 3, 3)
    assert k.tolist() == [[0, 50, 100], [50, 100, 150], [100, 150, 200]]


def test_lsh_banding_bounds_hot_bucket(spark):
    """A boilerplate line shared by many docs must NOT merge them all
    into one LSH bucket (the band-size-1 failure mode): with b×r
    banding ALL r minhashes of a band must collide, and the bucket cap
    bounds the worst case."""
    from searchengine_spark.ops.dedup import lsh_candidate_pairs, minhash_signatures

    boiler = "click here to subscribe to our newsletter today"
    rows = [
        (
            i,
            boiler + " " + " ".join(f"u{i}w{j}" for j in range(30)),
        )
        for i in range(80)
    ]
    # two genuine near-dups on top of the boilerplate corpus
    rows.append((1000, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    rows.append((1001, "alpha beta gamma delta epsilon zeta eta theta iota kappa x"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sig = minhash_signatures(docs)
    banded = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(sig, min_matches=0).collect()
    }
    assert (1000, 1001) in banded
    # bands=8 → r=1 is the round-1 scheme: ONE shared boilerplate
    # minhash value merges docs into a bucket. r=2 requires both
    # minhashes of a band to agree, which the 30 unique tokens per doc
    # break — candidate volume must drop sharply on the same corpus.
    band1 = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(sig, min_matches=0, bands=8).collect()
    }
    assert len(banded) < len(band1) / 2
    assert len(banded) < 1000  # nowhere near the 80·79/2 = 3160 blowup
    # and the cap is a hard bound: cap=1 drops every multi-doc bucket
    capped = lsh_candidate_pairs(sig, min_matches=0, bucket_cap=1).collect()
    assert capped == []


def test_nb_train_test_split(spark, docs):
    from searchengine_spark.ops.classify import nb_classify

    train = docs.filter(F.col("doc_id") % 5 != 0)
    test = docs.filter(F.col("doc_id") % 5 == 0)
    preds = nb_classify(train, test)
    pred_ids = {r["doc_id"] for r in preds.select("doc_id").collect()}
    test_ids = {r["doc_id"] for r in test.select("doc_id").collect()}
    assert pred_ids <= test_ids          # only held-out docs are scored
    assert len(pred_ids) >= len(test_ids) // 2  # most have feature terms
    langs = {r["pred_class"] for r in preds.select("pred_class").distinct().collect()}
    assert langs <= {"en", "de", "es", "fr", "zh"}


def test_ivf_ann_recall(spark, emb):
    from searchengine_spark.ops.similarity import IvfIndex, brute_force_topk

    qv = [float(v) for v in emb.filter(F.col("vec_id") == 3).collect()[0]["embedding"]]
    rest = emb.filter(F.col("vec_id") != 3)
    ivf = IvfIndex.fit(rest, n_centroids=8)
    exact = {r["vec_id"] for r in brute_force_topk(rest, qv, k=10).collect()}
    # probing half the cells must recover most of the true top-10
    approx = {r["vec_id"] for r in ivf.search(qv, k=10, n_probe=4).collect()}
    assert len(approx & exact) >= 6
    # probing ALL cells is exhaustive => exact
    full = {r["vec_id"] for r in ivf.search(qv, k=10, n_probe=8).collect()}
    assert full == exact

def test_embedding_neardup_planted(spark):
    """Planted near-identical vectors are found at 0.9+ cosine via the
    bucketed join (never an all-pairs cross join)."""
    import random

    from searchengine_spark.ops.similarity import embedding_neardup_pairs

    rng = random.Random(3)
    base = [rng.gauss(0, 1) for _ in range(16)]
    near = [v + rng.gauss(0, 0.01) for v in base]  # cosine ~0.9999
    rows = [(0, base), (1, near)] + [
        (i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(2, 60)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = embedding_neardup_pairs(emb, threshold=0.9, nbits=8).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 1) in found
    for r in pairs:
        assert r["cosine"] >= 0.9
    # bucket pruning: pair volume far below the 59*58/2 all-pairs count
    loose = embedding_neardup_pairs(emb, threshold=-1.0, nbits=8).count()
    assert loose < 59 * 58 / 2 / 2

def test_simhash_candidates_feed_jaccard_verify(spark, docs):
    """SimHash banded candidates → exact Jaccard verification finds the
    same planted near-dup pairs as the MinHash route (the third dedup
    family, end to end)."""
    from searchengine_spark.ops.dedup import (
        jaccard_verify,
        lsh_candidate_pairs,
        minhash_signatures,
        simhash,
        simhash_candidate_pairs,
    )

    cand = simhash_candidate_pairs(simhash(docs), max_hamming=6)
    via_simhash = {
        (r["doc_a"], r["doc_b"])
        for r in jaccard_verify(docs, cand, threshold=0.5).collect()
    }
    via_minhash = {
        (r["doc_a"], r["doc_b"])
        for r in jaccard_verify(
            docs, lsh_candidate_pairs(minhash_signatures(docs)), threshold=0.5
        ).collect()
    }
    assert via_minhash  # planted pairs exist
    assert via_simhash >= via_minhash  # simhash route recalls them all

def test_embedding_neardup_multitable_recall(spark):
    """A near-dup pair that straddles a sign boundary in table 0 (dim 0
    flips sign) is missed by one table and recovered by the second
    (dims 8-15 agree) — the multi-table recall property."""
    import random

    from searchengine_spark.ops.similarity import embedding_neardup_pairs

    rng = random.Random(5)
    base = [0.001] + [rng.gauss(0, 1) for _ in range(15)]
    near = list(base)
    near[0] = -0.001  # sign flip on dim 0 only: cosine still ~1
    rows = [(0, base), (1, near)] + [
        (i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(2, 40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    one = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(emb, 0.9, nbits=8, n_tables=1).collect()
    }
    two = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(emb, 0.9, nbits=8, n_tables=2).collect()
    }
    assert (0, 1) not in one   # split in the only table
    assert (0, 1) in two       # second table recovers it


def test_repetition_stats_hand_checked(spark):
    """'a b a b a b': 2-grams = {'a b'x3, 'b a'x2} -> n2=5, best=3,
    dup=5; 3-grams = {'a b a'x2, 'b a b'x2} -> n3=4, best=2, dup=4.
    All-unique doc -> dup 0. Degenerate docs (1 token / empty) -> all
    zeros, no bogus descending-sequence n-grams."""
    from searchengine_spark.ops.textstats import repetition_stats

    df = spark.createDataFrame(
        [(0, "a b a b a b"), (1, "one two three four"), (2, "solo"), (3, "")],
        "doc_id long, text string",
    )
    r = {x["doc_id"]: x for x in repetition_stats(df).collect()}
    assert (r[0]["n_2grams"], r[0]["n_3grams"]) == (5, 4)
    assert r[0]["top_2gram_ppm"] == 3 * 1_000_000 // 5
    assert r[0]["dup_2gram_ppm"] == 1_000_000
    assert r[0]["top_3gram_ppm"] == 500_000
    assert r[0]["dup_3gram_ppm"] == 1_000_000
    assert r[1]["dup_2gram_ppm"] == 0
    assert r[1]["top_2gram_ppm"] == 1_000_000 // 3
    for d in (2, 3):
        assert all(
            r[d][c] == 0
            for c in ("n_2grams", "n_3grams", "top_2gram_ppm",
                      "dup_2gram_ppm", "top_3gram_ppm", "dup_3gram_ppm")
        )


def test_decontamination(spark):
    """Doc 1 shares exactly one 3-gram ('y z a') with the benchmark doc
    0; doc 2 shares none. The action drops docs 0 and 1, keeps doc 2."""
    from searchengine_spark.ops.decontam import (
        benchmark_ngram_set,
        contamination,
        decontaminated,
    )

    docs = spark.createDataFrame(
        [(0, "x y z a b"), (1, "q y z a r"), (2, "m n o p q")],
        "doc_id long, text string",
    )
    bench = benchmark_ngram_set(docs.filter("doc_id = 0"), n=3)
    got = {r["doc_id"]: r["n_matched_ngrams"]
           for r in contamination(docs, bench, n=3).collect()}
    assert got == {0: 3, 1: 1}  # doc 0 matches all its own 3 3-grams
    clean = sorted(
        r["doc_id"] for r in decontaminated(docs, bench, n=3).collect()
    )
    assert clean == [2]
