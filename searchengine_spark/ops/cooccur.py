"""Windowed term co-occurrence and PMI — corpus-level distributional
statistics (phrase mining, collocation detection, tokenizer-merge
candidates for LLM data work).

Pair generation is ROW-LOCAL pure codegen: for each offset d in
1..window, the token array is zipped with its d-shifted self
(slice + arrays_zip), so no positional self-join ever happens — the
only exchanges are the final groupBys on (term_a, term_b) and term.
Directional windows (term_b follows term_a within ``window`` tokens)
keep the counting convention unambiguous; min_count bounds the output
the same way it bounds every published collocation table.

PMI = ln(n_ab · N / (n_a · n_b)) computed from exact integer counts,
so the only float is the final ln — e6-quantized at the gate
boundary like every score column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_pairs(docs: DataFrame, text_col: str = "text",
                   window: int = 2) -> DataFrame:
    """(term_a, term_b, n_cooc): directional co-occurrence counts for
    0 < pos(b) − pos(a) ≤ window, exact integers."""
    from ..indexing.simple import token_array

    ts = token_array(F.col(text_col))
    pair_arrays = [
        F.arrays_zip(
            F.slice(ts, 1, F.greatest(F.size(ts) - d, F.lit(0))).alias("a"),
            F.slice(ts, 1 + d, F.greatest(F.size(ts) - d, F.lit(0))).alias("b"),
        )
        for d in range(1, window + 1)
    ]
    return (
        docs.select(F.explode(F.flatten(F.array(*pair_arrays))).alias("p"))
        .select(F.col("p.a").alias("term_a"), F.col("p.b").alias("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count("*").cast("long").alias("n_cooc"))
    )


def pmi_table(docs: DataFrame, text_col: str = "text", window: int = 2,
              min_count: int = 5) -> DataFrame:
    """(term_a, term_b, n_cooc, pmi): pointwise mutual information of
    directional window pairs with n_cooc ≥ min_count. N is the total
    token count; unigram counts are occurrence counts over the same
    stream — one extra groupBy(term) plus two broadcast-friendly joins
    (the unigram table is vocabulary-sized)."""
    from ..indexing.simple import simple_tokens

    tok = simple_tokens(docs, text_col=text_col)
    # vocabulary-sized: materialize once so N and both joins read the
    # same table instead of re-tokenizing the corpus per consumer
    # (plan audit: 4 corpus scans without this, 2 with — see PERF.md)
    uni = tok.groupBy("term").agg(F.count("*").alias("n")).localCheckpoint()
    n_total = uni.agg(F.sum("n").alias("N"))
    pairs = windowed_pairs(docs, text_col, window).filter(
        F.col("n_cooc") >= min_count
    )
    return (
        pairs.join(uni.select(F.col("term").alias("term_a"),
                              F.col("n").alias("na")), "term_a")
        .join(uni.select(F.col("term").alias("term_b"),
                         F.col("n").alias("nb")), "term_b")
        .crossJoin(F.broadcast(n_total))
        .select(
            "term_a", "term_b", "n_cooc",
            F.log(
                F.col("n_cooc") * F.col("N")
                / (F.col("na") * F.col("nb"))
            ).alias("pmi"),
        )
    )
