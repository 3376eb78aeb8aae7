"""Driver-contract consistency: every oracle key has a query, every
callable has the (spark, sf_dir) arity, SQL strings are DuckDB-parsable
against empty views — catches registry drift without running Spark."""

from __future__ import annotations

import inspect

import duckdb
import pytest

import __spark_entry__ as se

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

SCHEMAS = {
    "documents": "doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT",
    "embeddings": "vec_id BIGINT, embedding FLOAT[], label INTEGER",
    "events": "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type VARCHAR, value DOUBLE, props VARCHAR",
}


def test_every_oracle_key_has_query():
    qs, sqls = se.queries(), se.oracle_sql()
    assert set(sqls) <= set(qs), set(sqls) - set(qs)
    assert len(qs) >= 40
    # the majority of the registry must be oracle-checked
    assert len(sqls) / len(qs) >= 0.8


def test_query_callables_arity():
    for name, fn in se.queries().items():
        params = inspect.signature(fn).parameters
        assert len([p for p in params.values()
                    if p.default is inspect.Parameter.empty]) == 2, name


@pytest.mark.parametrize("name", sorted(se.oracle_sql()))
def test_oracle_sql_parses_and_runs_on_empty_tables(name):
    con = duckdb.connect()
    for t in TABLES:
        schema = SCHEMAS.get(t, "id BIGINT")
        con.execute(f"CREATE TABLE {t} ({schema})")
    # empty inputs → must run without error (may return 0 rows)
    con.execute(se.oracle_sql()[name]).fetchall()
