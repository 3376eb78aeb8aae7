"""Author soundex search (C5) — the Spark-first rebuild of
/root/reference/SoundexIndexer.py:11-44: author name tokens are
basic-processed (strip ``\\W``, lowercase — basictokenprocessor.py:5-11),
soundex-coded (the quirky soundexcode.py algorithm), and indexed
code → names; a query name matches every author name sharing its code.

Everything is whole-stage codegen: the quirky soundex itself is a pure
column expression (translate + per-digit RE2 run collapse — the same
construction as the fuzz-verified DuckDB oracle in gate.py), so author
search over 10^12 docs is a scan + two narrow aggregations, no Python.

Disclosed deviation: the reference's SoundexIndex.add_term
(indexes/soundexindex.py:11-16) RESETS a code's name list whenever an
already-present name is re-added (the ``else`` arm overwrites), making
its index lossy and dependent on document enumeration order. This
engine keeps full set semantics — every (code, name) pair ever seen —
which is a superset of any order's reference result; the parity
harness (tools/mlb_soundex_parity.py) asserts exactly that containment
plus the reference's own golden memberships.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..text.tokenizer import basic_process, soundex

_SOUNDEX_MAP = "01230120022455012623010202" + "0000000000"
_SOUNDEX_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789"


def soundex_col(term) -> F.Column:
    """Quirk-exact soundex as a pure codegen column expression
    (bug-for-bug twin of text.tokenizer.soundex — pytest fuzz-verified):
    digits over term[1:], per-digit adjacent-run collapse, trailing-run
    drop tested on the RAW digit string, zero removal, pad to 4."""
    # Any character outside the translate alphabet (underscore — kept
    # by basic_process — or a non-ASCII letter) maps to '0' exactly
    # like the Python twin's _SOUNDEX_CODES.get(ch, "0"), so index-side
    # and query-side codes agree for such names.
    d = F.regexp_replace(
        F.translate(F.substring(term, 2, 1_000_000),
                    _SOUNDEX_ALPHABET, _SOUNDEX_MAP),
        "[^0-6]", "0",
    )
    c = d
    for dig in "0123456":
        c = F.regexp_replace(c, dig + "{2,}", dig)
    cq = (
        F.when(F.length(d) <= 1, F.lit(""))
        .when(
            F.substring(d, -2, 1) == F.substring(d, -1, 1),
            F.regexp_replace(c, ".$", ""),
        )
        .otherwise(c)
    )
    code = F.concat(
        F.upper(F.substring(term, 1, 1)),
        F.rpad(F.translate(cq, "0", ""), 3, "0"),
    )
    return F.when(term == "", F.lit("")).otherwise(F.substring(code, 1, 4))


def author_name_tokens(docs: DataFrame,
                       author_col: str = "author") -> DataFrame:
    """(doc_id, name): basic-processed author name tokens
    (split on ' ', strip \\W, lowercase — SoundexIndexer.py:28-33)."""
    return (
        docs.filter(F.col(author_col).isNotNull())
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.explode(F.split(F.col(author_col), " ")).alias("tok"),
        )
        .select(
            "doc_id",
            # (?U) = Java UNICODE_CHARACTER_CLASS so \W matches what
            # Python's Unicode-aware re.sub(r'\W') matches — accented
            # author letters survive exactly as in the reference.
            F.lower(F.regexp_replace("tok", r"(?U)\W+", "")).alias("name"),
        )
        .filter(F.col("name") != "")
    )


def author_soundex_index(docs: DataFrame,
                         author_col: str = "author") -> DataFrame:
    """(code, name): the soundex index — full set semantics (see module
    docstring), one distinct over the name tokens."""
    return (
        author_name_tokens(docs, author_col)
        .select(soundex_col(F.col("name")).alias("code"), "name")
        .distinct()
    )


def author_search(docs: DataFrame, query: str,
                  author_col: str = "author") -> DataFrame:
    """(name, n_docs, doc_ids): every author name sounding like
    ``query`` (SoundexIndexer.soundex_indexer) + the docs carrying it
    as an author token — sorted doc_id list per name."""
    code = soundex(basic_process(query))
    names = author_name_tokens(docs, author_col)
    return (
        names.withColumn("code", soundex_col(F.col("name")))
        .filter(F.col("code") == code)
        .groupBy("name")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.sort_array(F.collect_set("doc_id")).alias("doc_ids"),
        )
    )
