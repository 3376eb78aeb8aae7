"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry and its ``oracle_sql()`` twin at a
given sf_dir, compare row count + schema + order-insensitive values.

Usage: python tools/check_gate.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as se
    from searchengine_spark.session import get_spark

    spark = get_spark("check-gate", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, sqls = se.queries(), se.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {exc}")
            failures += 1
            continue
        took = time.time() - t0
        sql = sqls.get(name)
        if sql is None:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{took:.1f}s]")
            continue
        try:
            odf = con.execute(sql).df()
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures += 1
            continue
        a, b = canon(sdf), canon(odf)
        if list(a.columns) != list(b.columns):
            print(f"FAIL  {name}: columns {list(a.columns)} vs {list(b.columns)}")
            failures += 1
            continue
        if len(a) != len(b):
            print(f"FAIL  {name}: rows {len(a)} vs {len(b)}")
            failures += 1
            continue
        # compare as strings like a value-hash would
        eq = a.astype(str).equals(b.astype(str))
        if not eq:
            diff = (a.astype(str) != b.astype(str)).any(axis=1)
            print(f"FAIL  {name}: {int(diff.sum())}/{len(a)} rows differ; first:")
            print(pd.concat([a[diff].head(3), b[diff].head(3)], axis=1))
            failures += 1
        else:
            print(f"OK    {name}: {len(a)} rows [{took:.1f}s]")
    print(f"\n{failures} failures / {len(only) if only else len(qs)} checked")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
