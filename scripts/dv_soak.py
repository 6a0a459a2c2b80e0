"""Scale soak for the round-8 mutation features: times
q_delete_vectors / q_update_where / q_replace_where at two scale
factors (default sf0.1 and .scratch/sf1 = 10x) and prints one JSON
line with walls + ratios.

The expectation at 10x data is ~linear wall (fixture build + one pass
over touched files); merge-on-read's whole point is that the DELETE/
UPDATE commit cost is ∝ churn, so a super-linear ratio here means a
scan or join sneaked into the commit path.

Usage: python scripts/dv_soak.py [SMALL_SF_DIR] [BIG_SF_DIR] [REPS]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else ".scratch/sf1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from aws_lakehouse_project_spark.operators.lakehouse import (
        q_delete_vectors,
        q_replace_where,
        q_update_where,
    )
    from aws_lakehouse_project_spark.session import build_session

    spark = build_session(app_name="dv-soak")
    queries = {
        "q_delete_vectors": q_delete_vectors,
        "q_update_where": q_update_where,
        "q_replace_where": q_replace_where,
    }
    out: dict[str, object] = {"small": small, "big": big, "reps": reps}
    for name, fn in queries.items():
        walls = {}
        for label, sf in (("small", small), ("big", big)):
            best = None
            for _ in range(reps):
                t0 = time.monotonic()
                fn(spark, sf).collect()
                w = time.monotonic() - t0
                best = w if best is None else min(best, w)
            walls[label] = round(best, 2)
        out[name] = {**walls, "ratio_at_10x": round(walls["big"] / walls["small"], 1)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
