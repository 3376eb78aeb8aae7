"""Text-analysis operators for training-data curation: token counting,
n-gram/stopword language ID, quality scoring, within-doc repetition
filters, and document fingerprinting — all JVM-side column expressions
over the simple analyzer's token arrays (zero Python on executors;
the scalar paths are whole-stage codegen, the repetition fold uses
higher-order array functions, which Catalyst evaluates off-codegen but
still in-JVM and doc-locally).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..indexing.simple import token_array
from .dedup import h60

# tiny per-language stopword profiles (deterministic heuristic — the
# lists ARE the model; accuracy is a property of the lists, correctness
# of the pipeline is what the oracle checks)
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it", "you", "that"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "ich", "zu", "mit"),
    "es": ("el", "la", "de", "que", "y", "los", "en", "un", "por", "una"),
    "fr": ("le", "la", "les", "et", "de", "un", "une", "est", "que", "dans"),
    "zh": ("de", "shi", "le", "wo", "ni", "ta", "zai", "you", "he", "bu"),
}
LANG_ORDER = ("en", "de", "es", "fr", "zh")  # deterministic tie order


# GPT-2-style pre-tokenizer shape: contraction suffixes, letter runs,
# digit runs, punctuation runs, residual whitespace — each match ≈ one
# BPE pre-token, so the count upper-bounds (and closely tracks) a real
# BPE token count without shipping a merges table. Pure regex → same
# count in any engine.
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, ws_tokens, alnum_tokens, bpe_ish_tokens, n_chars):
    whitespace-run count, analyzer-token count, and a BPE-style
    pre-token count — the three standard size measures of a
    training-data pipeline."""
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), 0))
        .cast("long").alias("ws_tokens"),
        F.size(token_array(F.col(text_col))).cast("long").alias("alnum_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0))
        .cast("long").alias("bpe_ish_tokens"),
        F.length(text_col).cast("long").alias("n_chars"),
    )


def _stopword_hits(lang: str) -> F.Column:
    words = LANG_STOPWORDS[lang]
    return F.size(
        F.filter(F.col("ts"), lambda t: t.isin(*words))
    ).cast("long")


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang): argmax of per-language stopword hit counts,
    ties resolved in fixed LANG_ORDER."""
    base = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        token_array(F.col(text_col)).alias("ts"),
    )
    scored = base.select(
        "doc_id",
        *[_stopword_hits(lang).alias(f"s_{lang}") for lang in LANG_ORDER],
    )
    # argmax with deterministic tie order: fold over languages
    pred = F.lit(LANG_ORDER[0])
    best = F.col(f"s_{LANG_ORDER[0]}")
    for lang in LANG_ORDER[1:]:
        cond = F.col(f"s_{lang}") > best
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
        best = F.when(cond, F.col(f"s_{lang}")).otherwise(best)
    return scored.select("doc_id", pred.alias("pred_lang"), best.alias("hits"))


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style quality features + pass flag (the thresholds are
    illustrative constants; the pipeline shape is the product):
    n_tokens, mean token length, stopword ratio, alnum character ratio.
    """
    base = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
        token_array(F.col(text_col)).alias("ts"),
    )
    en = LANG_STOPWORDS["en"]
    feats = base.select(
        "doc_id",
        F.size("ts").cast("long").alias("n_tokens"),
        (
            F.aggregate("ts", F.lit(0.0), lambda a, t: a + F.length(t))
            / F.greatest(F.size("ts"), F.lit(1))
        ).alias("mean_tok_len"),
        (
            F.size(F.filter("ts", lambda t: t.isin(*en)))
            / F.greatest(F.size("ts"), F.lit(1)).cast("double")
        ).alias("stopword_ratio"),
        (
            F.length(F.regexp_replace("text", r"[^a-zA-Z0-9]", ""))
            / F.greatest(F.length("text"), F.lit(1)).cast("double")
        ).alias("alnum_ratio"),
    )
    passes = (
        (F.col("n_tokens") >= 5)
        & (F.col("mean_tok_len") >= 2.0) & (F.col("mean_tok_len") <= 12.0)
        & (F.col("alnum_ratio") >= 0.5)
    )
    return feats.withColumn("quality_pass", passes)


def bigram_logprob(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_bigrams, mean_logprob): mean transition
    log-probability under the corpus's OWN interpolated bigram model —
    the second-order companion to :func:`unigram_logprob` (CCNet-style
    LM filtering): p(b|a) = 0.9·count(ab)/count(a) + 0.1·count(b)/N,
    the rational 9/10–1/10 interpolation guaranteeing every transition
    has mass (no OOV-pair −inf) while staying a deterministic function
    of exact integer counts. Repetitive boilerplate scores HIGH and
    incoherent token soup scores LOW even when the unigram mix looks
    normal — the two scores separate different failure modes.

    Shape: bigram extraction is the row-local shifted-array zip (no
    positional self-join, see ops/cooccur.py); the model tables are
    one groupBy(a,b) and one groupBy(term); scoring joins transitions
    to both tables (sort-merge at corpus scale) and takes one
    groupBy(doc_id) mean. Docs with <2 tokens emit n_bigrams=0 with a
    NULL mean (nothing to score).
    """
    ts = token_array(F.col(text_col))
    zipped = F.arrays_zip(
        F.slice(ts, 1, F.greatest(F.size(ts) - 1, F.lit(0))).alias("a"),
        F.slice(ts, 2, F.greatest(F.size(ts) - 1, F.lit(0))).alias("b"),
    )
    base = docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                       zipped.alias("z"))
    trans = base.select(
        "doc_id", F.explode("z").alias("p")
    ).select("doc_id", F.col("p.a").alias("a"), F.col("p.b").alias("b"))

    tok = docs.select(F.explode(ts).alias("term"))
    # vocabulary-sized: one tokenize pass feeds counts AND N (the
    # transitions table stays lazy — re-deriving it beats writing a
    # corpus-sized checkpoint; see PERF.md plan audit)
    uni = tok.groupBy("term").agg(F.count("*").alias("n")).localCheckpoint()
    n_total = uni.agg(F.sum("n")).collect()[0][0]
    big = trans.groupBy("a", "b").agg(F.count("*").alias("nab"))

    scored = (
        trans.hint("merge")
        .join(big.hint("merge"), ["a", "b"])
        .join(uni.select(F.col("term").alias("a"),
                         F.col("n").alias("na")).hint("merge"), "a")
        .join(uni.select(F.col("term").alias("b"),
                         F.col("n").alias("nb")).hint("merge"), "b")
        .select(
            "doc_id",
            F.log(
                0.9 * F.col("nab") / F.col("na")
                + 0.1 * F.col("nb") / F.lit(float(n_total))
            ).alias("lp"),
        )
    )
    return (
        docs.select(F.col("doc_id").cast("long").alias("doc_id"))
        .join(
            scored.groupBy("doc_id").agg(
                F.count("*").cast("long").alias("n_bigrams"),
                F.avg("lp").alias("mean_logprob"),
            ),
            "doc_id", "left",
        )
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            "mean_logprob",
        )
    )


def unigram_logprob(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, mean_logprob): mean token log-probability
    under the corpus's OWN unigram language model — the classic
    LM-based quality signal of web-scale curation pipelines (CCNet-
    style filtering, Wenzek et al. 2020, arXiv:1911.00359): documents
    whose token distribution is far from the corpus mass (gibberish,
    boilerplate codes, wrong-language fragments) score a low mean
    logprob and can be threshold-filtered. Self-contained: the "model"
    is the corpus unigram MLE p(t) = count(t)/N, so no external model
    ships, and the whole op is two codegen aggregations:

    * term counts — one groupBy(term) with partial aggregation (the
      Zipf head is bounded by map-side combine, same shape as
      index_vocabulary);
    * per-doc mean — join tokens to the term-prob table on term (sort-
      merge at corpus scale; the prob table is vocabulary-sized, NOT
      broadcastable at 10^12 docs) and one groupBy(doc_id).

    Deterministic to e6 quantization: ln of an exact count ratio,
    averaged — both engines compute identical doubles per token; the
    sum order can differ, so gate consumers quantize the mean.
    """
    ts = token_array(F.col(text_col))
    tok = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(ts).alias("term"),
    )
    n_total = tok.count()
    probs = tok.groupBy("term").agg(
        (F.count("*") / F.lit(float(n_total))).alias("p")
    )
    return (
        tok.join(probs.hint("merge"), "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.avg(F.log("p")).alias("mean_logprob"),
        )
    )


def ngram_col(ts: str, n: int) -> F.Column:
    """Doc-local token n-grams of the token-array column named ``ts``,
    as space-joined strings; array() when the doc has fewer than n
    tokens. The size guard matters: Spark's sequence(1, stop) runs
    DESCENDING when stop < 1, which would emit bogus out-of-range
    slices instead of an empty list."""
    return F.expr(
        f"CASE WHEN size({ts}) >= {n} THEN "
        f"transform(sequence(1, size({ts}) - {n - 1}), "
        f"i -> array_join(slice({ts}, i, {n}), ' ')) "
        f"ELSE array() END"
    )


def _run_stats(arr: F.Column) -> F.Column:
    """struct(best, dup) over a SORTED string array: ``best`` = length
    of the longest run of equal elements (count of the most frequent
    value), ``dup`` = total elements in runs of length ≥ 2 (elements
    whose value appears more than once). One doc-local fold — the
    within-document frequency table that would otherwise need a
    groupBy never leaves the row."""
    init = F.struct(
        F.lit("\t").alias("prev"),  # tab: impossible in [a-z0-9 ]+ n-grams
        F.lit(0).alias("run"), F.lit(0).alias("best"), F.lit(0).alias("dup"),
    )

    def merge(acc, x):
        same = x == acc["prev"]
        closed_best = F.greatest(acc["best"], acc["run"])
        closed_dup = acc["dup"] + F.when(acc["run"] > 1, acc["run"]).otherwise(0)
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.when(same, acc["best"]).otherwise(closed_best).alias("best"),
            F.when(same, acc["dup"]).otherwise(closed_dup).alias("dup"),
        )

    def finish(acc):  # close the trailing run
        return F.struct(
            F.greatest(acc["best"], acc["run"]).alias("best"),
            (acc["dup"] + F.when(acc["run"] > 1, acc["run"]).otherwise(0))
            .alias("dup"),
        )

    return F.aggregate(arr, init, merge, finish)


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Within-document repetition signals (the Gopher repetition
    filters, Rae et al. 2021, arXiv:2112.11446 §A1.1, token-count
    variant): per document, the fraction of token n-grams claimed by
    the single most frequent n-gram (``top_{n}gram_ppm``) and by
    n-grams occurring more than once (``dup_{n}gram_ppm``), for
    n = 2, 3. Boilerplate, keyword-stuffed, and degenerately looping
    pages score high and are threshold-filtered.

    Fractions are integer parts-per-million: (count · 10^6) div
    max(total, 1) — integer division end to end, so the values are
    engine-exact (no float rounding to reconcile with the SQL twin).

    Scale shape: everything is doc-local — n-grams, sort, and the
    run-length fold happen inside the row via higher-order functions,
    so the op is MAP-ONLY with zero shuffle at any corpus size (the
    per-doc frequency table never materializes)."""
    base = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        token_array(F.col(text_col)).alias("ts"),
    ).select(
        "doc_id",
        F.array_sort(ngram_col("ts", 2)).alias("g2"),
        F.array_sort(ngram_col("ts", 3)).alias("g3"),
    ).select(
        "doc_id",
        F.size("g2").cast("long").alias("n_2grams"),
        F.size("g3").cast("long").alias("n_3grams"),
        _run_stats(F.col("g2")).alias("r2"),
        _run_stats(F.col("g3")).alias("r3"),
    )
    return base.select(
        "doc_id", "n_2grams", "n_3grams",
        F.expr("cast(r2.best as bigint) * 1000000 div greatest(n_2grams, 1)")
        .alias("top_2gram_ppm"),
        F.expr("cast(r2.dup as bigint) * 1000000 div greatest(n_2grams, 1)")
        .alias("dup_2gram_ppm"),
        F.expr("cast(r3.best as bigint) * 1000000 div greatest(n_3grams, 1)")
        .alias("top_3gram_ppm"),
        F.expr("cast(r3.dup as bigint) * 1000000 div greatest(n_3grams, 1)")
        .alias("dup_3gram_ppm"),
    )


def fingerprints(docs: DataFrame, text_col: str = "text",
                 modulus: int = 1_000_000_007) -> DataFrame:
    """(doc_id, fingerprint): order-sensitive rolling document hash —
    Σ_i ((h60(tok_i) mod M) · ((i mod 997) + 1) mod M), folded in
    int64. The per-step mod-reduce bounds each addend below M ≈ 1e9,
    so the running sum stays within int64 for any document below
    ~9·10^9 tokens — unconditional at any realistic document size.
    Engine-portable: identical in ANSI SQL."""
    ts = token_array(F.col(text_col))
    tok = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.posexplode(ts).alias("pos0", "term"),
    )
    return tok.groupBy("doc_id").agg(
        F.sum(
            ((h60(F.col("term")) % modulus) * ((F.col("pos0") % 997) + 1))
            % modulus
        ).cast("long").alias("fingerprint")
    )
