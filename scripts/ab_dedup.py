"""A/B harness for the dedup-family perf investigation (r5 VERDICT task 3).

Times a fixed set of queries in THIS checkout (cwd decides which code
runs) with bench.py's exact protocol — warm-up at sf0.001, noop-write
materialization at sf0.1 — and prints one JSON line. Run alternately
from two worktrees (r4 HEAD vs current) in one quiet host window; the
interleaving cancels host drift.
"""

from __future__ import annotations

import json
import os
import sys
import time

QUERIES = ["q_dedup_exact", "q_dedup_minhash", "q_ngram_jaccard", "q_window_rolling"]
REPS = int(os.environ.get("AB_REPS", "3"))


def main() -> None:
    sys.path.insert(0, os.getcwd())
    import __spark_entry__ as entrymod
    from aws_lakehouse_project_spark.session import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="ab-dedup")
    registry = entrymod.queries()

    for name in QUERIES:  # warm-up: JIT + codegen amortized out
        registry[name](spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()

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
