"""Streaming soak: drive all 7 Structured Streaming queries to
completion in sequence against SF_DIR, N times (VERDICT r6 item 5 —
retire the one transient q_stream_sessions cancellation seen in the r6
sf10 soak's first sequence run: 3 consecutive clean sequences = closed).

Usage: python scripts/stream_soak.py [SF_DIR] [N_SEQUENCES]
Prints one JSON line per sequence and a final verdict line.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf10"
    n_seq = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import __spark_entry__ as entrymod
    from aws_lakehouse_project_spark.session import build_session

    spark = build_session(app_name="stream-soak")
    stream_queries = {
        n: f for n, f in entrymod.queries().items() if n.startswith("q_stream_")
    }
    failures = []
    for seq in range(1, n_seq + 1):
        result: dict[str, object] = {"sequence": seq, "sf_dir": sf_dir}
        for name, fn in stream_queries.items():
            t0 = time.perf_counter()
            try:
                rows = fn(spark, sf_dir).count()
                result[name] = {
                    "rows": rows,
                    "sec": round(time.perf_counter() - t0, 1),
                }
            except Exception as exc:  # noqa: BLE001
                traceback.print_exc()
                result[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
                failures.append((seq, name))
        print(json.dumps(result), flush=True)
    print(
        json.dumps(
            {"sequences": n_seq, "failures": [f"{s}:{n}" for s, n in failures]}
        ),
        flush=True,
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
