"""Driver-gate rehearsal: run every registered query + its DuckDB oracle
at an arbitrary scale factor and report row/schema/value mismatches.

Usage: python scripts/oracle_sweep.py [sf_dir] [--only name1,name2] [--plain]

``--plain`` runs on a default unconfigured SparkSession instead of the
engine's build_session — rehearsing a driver that applies none of the
engine's conf (AQE, UTC, overwrite mode). Writers and queries must pass
either way.
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, ".")

from tests.test_oracle_diff import compare_query  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))

    import __spark_entry__ as entrymod

    if "--plain" in sys.argv:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").appName("oracle-sweep-plain").getOrCreate()
    else:
        from aws_lakehouse_project_spark.session import build_session

        spark = build_session(app_name="oracle-sweep")
    q = entrymod.queries()
    o = entrymod.oracle_sql()

    failures = []
    for i, name in enumerate(q, 1):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            if name in o:
                compare_query(spark, name, q[name], o[name], sf_dir)
                status = "ok"
            else:
                n = q[name](spark, sf_dir).count()
                status = f"rows-only ok ({n} rows)"
        except Exception as exc:  # noqa: BLE001
            status = f"FAIL: {exc}"
            failures.append(name)
            traceback.print_exc()
        print(f"{i:3d} {name:28s} {time.time() - t0:6.1f}s  {status}", flush=True)

    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
