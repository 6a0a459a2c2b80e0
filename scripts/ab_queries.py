"""Generic same-window A/B harness (generalizes ab_dedup.py, r6 VERDICT
task 3): times $AB_QUERIES (comma-separated) in THIS checkout (cwd
decides which code runs) with bench.py's exact protocol — warm-up at
sf0.001, noop-write materialization at sf0.1 — and prints one JSON line.
Run alternately from two worktrees (suspect HEAD vs current) in one
quiet host window; the interleaving cancels host drift. Include an
unchanged control query to read the window's noise level.
"""

from __future__ import annotations

import json
import os
import sys
import time

QUERIES = [
    q.strip()
    for q in os.environ.get(
        "AB_QUERIES",
        "q_dedup_simhash_portable,q_kmeans_assign,q_window_rolling",
    ).split(",")
    if q.strip()
]
REPS = int(os.environ.get("AB_REPS", "3"))
WARM_SF = os.environ.get("AB_WARM_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    sys.path.insert(0, os.getcwd())
    import __spark_entry__ as entrymod
    from aws_lakehouse_project_spark.session import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="ab-queries")
    registry = entrymod.queries()

    if os.path.isdir(WARM_SF):  # warm-up: JIT + codegen amortized out
        for name in QUERIES:
            registry[name](spark, WARM_SF).write.format("noop").mode(
                "overwrite"
            ).save()

    out: dict[str, list[float]] = {n: [] for n in QUERIES}
    for _ in range(REPS):
        for name in QUERIES:
            t0 = time.perf_counter()
            registry[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            out[name].append(round(time.perf_counter() - t0, 3))
    med = {n: sorted(v)[len(v) // 2] for n, v in out.items()}
    print(json.dumps({"checkout": os.getcwd(), "median": med, "runs": out}))


if __name__ == "__main__":
    main()
