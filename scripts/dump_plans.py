"""Dump .explain('formatted') for registered queries to a directory.

Usage: python scripts/dump_plans.py OUTDIR SUFFIX [--sf DIR] [--budget S]
       [names ...]

With no names: every registered query, in registry order. Queries whose
DataFrame CONSTRUCTION takes longer than --budget seconds (fixture-heavy
lakehouse/MV queries execute commits during construction) are still
dumped — the budget only reports them; nothing is skipped. Streaming
queries that refuse to explain lazily are recorded as SKIP.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("suffix")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from aws_lakehouse_project_spark.session import build_session

    os.makedirs(args.outdir, exist_ok=True)
    spark = build_session(app_name="dump_plans")
    registry = entrymod.queries()
    names = args.names or list(registry)
    for name in names:
        t0 = time.perf_counter()
        try:
            df = registry[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            print(f"# {name}: SKIP ({type(exc).__name__}: {exc})",
                  file=sys.stderr)
            continue
        dt = time.perf_counter() - t0
        out = os.path.join(args.outdir, f"{name}_{args.suffix}.txt")
        with open(out, "w") as fh:
            fh.write(plan)
        print(f"# {name}: {dt:.1f}s -> {out}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
