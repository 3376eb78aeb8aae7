"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship reference-parity BM25 pipeline
at sf0.001. ``queries()``/``oracle_sql()`` expose the operator registry
from ``searchengine_spark.gate``: since round 3 EVERY registered entry
carries DuckDB oracle SQL — including the stemmed reference-parity
paths (full Porter2 generated as SQL CTEs, ``oracle/porter2_sql.py``),
the quirky phrase/NEAR merges (recursive-CTE pointer walks) and IVF
(fixed-point integer Lloyd replayed in SQL). The same pairs are also
replayed by ``tools/check_gate.py`` and ``python -m pytest -x -q``.
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
