"""Oracle-differential test — mirrors the driver's t2 gate.

Runs every registered demo query in Spark AND its DuckDB oracle on the
same parquet tables, then compares row count, column names, and values
(columns sorted by name, rows sorted by all columns — order-insensitive,
like the driver's value hash). Floats must match to 1e-9 relative; the
engine's exact-decimal discipline should make them bit-identical.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from tests.conftest import SF_DIR

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def canon(rows, columns):
    """Sort columns by name, then rows; round floats for a stable key."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda r: tuple(str(x) for x in r))
    return [columns[i] for i in order], out


def compare_query(spark, name: str, qfn, sql: str, sf_dir: str):
    sdf = qfn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duck_con(sf_dir)
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s_cols, s_canon = canon(spark_rows, spark_cols)
    d_cols, d_canon = canon(duck_rows, duck_cols)
    for i, (sr, dr) in enumerate(zip(s_canon, d_canon)):
        assert sr == dr, f"{name}: first diff at sorted row {i}:\n spark={sr}\n duck ={dr}"


def all_oracle_queries():
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    o = entrymod.oracle_sql()
    return [(name, q[name], o[name]) for name in sorted(o)]


@pytest.mark.parametrize(
    "name,qfn,sql", all_oracle_queries(), ids=[n for n, _, _ in all_oracle_queries()]
)
def test_oracle_match(spark, name, qfn, sql):
    compare_query(spark, name, qfn, sql, SF_DIR)


def test_rows_only_queries_run(spark):
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    o = entrymod.oracle_sql()
    for name in sorted(set(q) - set(o)):
        df = q[name](spark, SF_DIR)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == [
        "cust_id",
        "dt",
        "revenue",
        "order_count",
        "purchases",
        "sessions",
    ]
