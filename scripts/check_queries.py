"""Spot-check named registered queries vs their DuckDB oracles.

Usage: python scripts/check_queries.py SF_DIR q_name [q_name ...]
Same canonicalization as the driver / verify skill (sorted columns,
9-dp float rounding, order-insensitive rows).
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")
import __spark_entry__ as m  # noqa: E402
from aws_lakehouse_project_spark.session import build_session  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    sf = sys.argv[1]
    names = sys.argv[2:]
    spark = build_session(
        app_name="check", master="local[8]", shuffle_partitions=8
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    q, o = m.queries(), m.oracle_sql()
    fails = []
    for name in names:
        sdf = q[name](spark, sf)
        srows = [tuple(r) for r in sdf.collect()]
        if name not in o:
            print(name, "rows-only", len(srows))
            continue
        res = con.execute(o[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        idx_s = sorted(range(len(sdf.columns)), key=lambda i: sdf.columns[i])
        idx_d = sorted(range(len(dcols)), key=lambda i: dcols[i])

        def canon(rows, idx):
            return sorted(
                (
                    tuple(
                        round(r[i], 9) if isinstance(r[i], float) else r[i]
                        for i in idx
                    )
                    for r in rows
                ),
                key=lambda t: tuple(str(x) for x in t),
            )

        ok = (
            len(srows) == len(drows)
            and sorted(sdf.columns) == sorted(dcols)
            and canon(srows, idx_s) == canon(drows, idx_d)
        )
        print(name, "MATCH" if ok else "MISMATCH", f"rows={len(srows)}/{len(drows)}")
        if not ok:
            fails.append(name)
            if sorted(sdf.columns) != sorted(dcols):
                print("  spark cols:", sorted(sdf.columns))
                print("  duck  cols:", sorted(dcols))
            else:
                cs, cd = canon(srows, idx_s), canon(drows, idx_d)
                diff = [(a, b) for a, b in zip(cs, cd) if a != b][:5]
                for a, b in diff:
                    print("  spark:", a)
                    print("  duck :", b)
    print("RESULT:", fails or "ALL MATCH")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
