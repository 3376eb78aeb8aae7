"""PII detection and redaction for training-data curation — emails,
IPv4 addresses, and international-format phone numbers, as pure
regexp column expressions (whole-stage codegen; zero Python on
executors, zero shuffles: both detection and redaction are row-local
map operators, so the pass is embarrassingly parallel at any corpus
size).

The patterns are deliberately restricted to constructs that behave
identically in Java `java.util.regex` (Spark) and RE2 (the DuckDB
oracle): character classes, bounded repetition, `\\b`, no lookaround,
no backreferences — that is what makes every operator here
oracle-checkable with a byte-identical redacted-text hash.

Redaction is applied in a FIXED order (email, then IPv4, then phone):
the patterns are mutually non-overlapping on any single span, but a
fixed order makes the output deterministic by construction rather
than by argument.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# local-part @ domain . tld — the pragmatic curation-pipeline email
# shape (RFC 5321 full grammar is not the goal; catching leaked
# addresses is)
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# dotted quad with word boundaries; octet-range validation (<=255) is
# out of scope for a redaction pass — over-redaction is the safe side
IPV4_PATTERN = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# +CC NNN-NNN(N)-NNNN with space/dash separators; the leading '+'
# keeps plain numerics (quantities, ids) out
PHONE_PATTERN = r"\+\d{1,2}[ -]\d{3}[ -]\d{3,4}[ -]\d{4}\b"

# (kind, pattern, replacement) in application order
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("emails", EMAIL_PATTERN, "<EMAIL>"),
    ("ipv4", IPV4_PATTERN, "<IP>"),
    ("phones", PHONE_PATTERN, "<PHONE>"),
)


def pii_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_emails, n_ipv4, n_phones, n_pii): per-document match
    counts for each rule plus the total. Counts are taken on the raw
    text (each rule independently), before any redaction."""
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0))
        .cast("long").alias(f"n_{kind}")
        for kind, pat, _ in PII_RULES
    ]
    out = docs.select(F.col("doc_id").cast("long").alias("doc_id"), *counts)
    total = None
    for kind, _, _ in PII_RULES:
        c = F.col(f"n_{kind}")
        total = c if total is None else total + c
    return out.withColumn("n_pii", total.cast("long"))


def redact_col(text: F.Column) -> F.Column:
    """The redacted-text column expression: every PII rule applied
    globally, in PII_RULES order. Exposed separately so callers can
    redact in place without materializing a second text column."""
    out = text
    for _, pat, repl in PII_RULES:
        out = F.regexp_replace(out, pat, repl)
    return out


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The corpus with PII spans replaced by typed placeholders —
    the pipeline action. All columns preserved; ``text_col`` is
    rewritten in place."""
    return docs.withColumn(text_col, redact_col(F.col(text_col)))
