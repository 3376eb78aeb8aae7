"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship reference-parity BM25 pipeline
at sf0.001. ``queries()``/``oracle_sql()`` expose the operator registry
from ``searchengine_spark.gate``: every SQL-expressible operator is
checked against the DuckDB oracle at sf0.01; the stemmed
reference-parity paths (Porter2 has no offline DuckDB equivalent) are
rows-only here and rank-identity-verified by ``python -m pytest -x -q``
against the pure-Python oracle instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from searchengine_spark import gate


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full reference-parity pipeline (Arrow pandas-UDF
    tokenizer + Porter2 + positional index build) then BM25 top-10."""
    return gate.QUERIES["ref_bm25_topk"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(gate.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(gate.ORACLE_SQL)
