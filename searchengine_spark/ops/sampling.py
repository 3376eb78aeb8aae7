"""Deterministic stratified sampling — the training-mixture step of a
data pipeline: keep each document with a per-stratum probability
(e.g. by language or quality bucket), decided by a SEEDED HASH of the
document id rather than an RNG, so the sample is

* reproducible across runs, engines, and cluster sizes (no
  partition-order dependence — ``df.sample`` is seeded per partition
  and reshuffles change the outcome; this does not),
* stable under corpus growth (a document's keep/drop never changes
  when other documents are added), and
* exactly replayable in SQL (the oracle recomputes the identical
  md5-derived uniform).

The decision ``u32(md5(seed:doc_id)) < floor(rate * 2^32)`` is pure
integer arithmetic — no float comparison anywhere near the cut line.
Row-local filter: zero shuffles, embarrassingly parallel at 10^12
rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_U32 = 1 << 32


def hash_u32(col: F.Column, seed: str) -> F.Column:
    """Deterministic uniform 32-bit integer in [0, 2^32) from a seeded
    md5 — engine-portable (same value in DuckDB: both hash the UTF-8
    of ``seed || ':' || value``)."""
    key = F.concat(F.lit(f"{seed}:"), col.cast("string"))
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")


def rate_threshold(rate: float) -> int:
    """The integer cut for a keep-probability in [0, 1]."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return int(rate * _U32)


def _threshold_col(rates: dict[str, float], strata_col: str) -> F.Column:
    """Per-row integer threshold: chained literals (a handful of
    strata — languages, quality buckets — so this stays a codegen CASE
    chain, not a join). Strata absent from ``rates`` get 0 (dropped),
    the conservative default for an unknown bucket."""
    out: F.Column = F.lit(0)
    for stratum, rate in sorted(rates.items()):
        out = F.when(
            F.col(strata_col) == stratum, F.lit(rate_threshold(rate))
        ).otherwise(out)
    return out.cast("long")


def stratified_sample(docs: DataFrame, rates: dict[str, float],
                      strata_col: str = "lang", id_col: str = "doc_id",
                      seed: str = "sample") -> DataFrame:
    """The sampled corpus: rows kept iff their seeded hash falls under
    the stratum's threshold. All input columns preserved."""
    keep = hash_u32(F.col(id_col), seed) < _threshold_col(rates, strata_col)
    return docs.filter(keep)


def sample_summary(docs: DataFrame, rates: dict[str, float],
                   strata_col: str = "lang", id_col: str = "doc_id",
                   seed: str = "sample") -> DataFrame:
    """(stratum, n_total, n_sampled): the realized rate per stratum —
    the mixture report checked against the target rates. One groupBy
    on the (tiny-cardinality) stratum column."""
    kept = (
        hash_u32(F.col(id_col), seed) < _threshold_col(rates, strata_col)
    ).cast("long")
    return (
        docs.select(F.col(strata_col).alias("stratum"), kept.alias("k"))
        .groupBy("stratum")
        .agg(
            F.count("*").cast("long").alias("n_total"),
            F.sum("k").cast("long").alias("n_sampled"),
        )
    )
