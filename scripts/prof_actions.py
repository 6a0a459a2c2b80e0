"""Per-action time attribution for one or more registered queries.

For each named query: runs it once at the given SF dir (noop-sink for
the returned frame, matching bench.py), capturing every finalized
action through a QueryExecutionListener — per-action JVM duration, the
executed plan's first line (operator fingerprint), and the wall-clock
gaps BETWEEN actions (driver-side Python/py4j/manifest work). Prints a
table per query plus a summary: total wall, sum(action JVM time),
driver gap = wall - sum(actions).

Usage: python scripts/prof_actions.py [--sf DIR] q_name [q_name ...]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


class _Cap:
    def __init__(self) -> None:
        self.events: list[tuple[float, float, str]] = []  # (t_done, dur_s, head)

    def onSuccess(self, funcName, qe, durationNs) -> None:  # noqa: N802
        try:
            s = qe.executedPlan().toString()
            head = s.split("\n", 1)[0][:60]
            import re as _re

            ops = _re.findall(
                r"(Exchange hash|Exchange range|SortMergeJoin|"
                r"BroadcastHashJoin|Window|HashAggregate|Scan parquet|"
                r"LocalTableScan|Generate explode)", s)
            from collections import Counter

            fp = ",".join(
                f"{k.split()[-1]}x{v}" for k, v in Counter(ops).items()
            )
            head = f"{head} [{fp[:120]}]"
        except Exception:  # noqa: BLE001
            head = "?"
        self.events.append((time.perf_counter(), durationNs / 1e9, head))

    def onFailure(self, funcName, qe, exception) -> None:  # noqa: N802
        pass

    class Java:
        implements = ["org.apache.spark.sql.util.QueryExecutionListener"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--warm", action="store_true",
                    help="run each query once at sf0.001 first (JIT warm)")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from aws_lakehouse_project_spark.session import build_session

    spark = build_session(app_name="prof_actions")
    registry = entrymod.queries()

    from pyspark.java_gateway import ensure_callback_server_started

    ensure_callback_server_started(spark.sparkContext._gateway)
    cap = _Cap()
    spark._jsparkSession.listenerManager().register(cap)

    if args.warm:
        for name in args.names:
            try:
                registry[name](spark, "/root/testdata/sf0.001").write.format(
                    "noop"
                ).mode("overwrite").save()
            except Exception as exc:  # noqa: BLE001
                print(f"# warm {name} failed: {exc}", file=sys.stderr)

    for name in args.names:
        cap.events.clear()
        t0 = time.perf_counter()
        registry[name](spark, args.sf).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - t0
        try:
            spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty(10_000)
        except Exception:  # noqa: BLE001
            time.sleep(1.0)
        evs = sorted(e for e in cap.events if e[0] >= t0)
        print(f"\n=== {name}: wall {wall:.3f}s, {len(evs)} actions ===")
        prev = t0
        gaps = 0.0
        jvm_total = 0.0
        for t_done, dur, head in evs:
            gap = max(0.0, (t_done - prev) - dur)
            gaps += gap
            jvm_total += dur
            prev = t_done
            print(f"  gap {gap:7.3f}s | act {dur:7.3f}s | {head}")
        tail = max(0.0, t0 + wall - prev)
        print(f"  tail gap {tail:.3f}s")
        print(
            f"  SUMMARY {name}: wall {wall:.3f}s = actions {jvm_total:.3f}s"
            f" + driver gaps {gaps + tail:.3f}s ({len(evs)} actions)"
        )
    spark.stop()


if __name__ == "__main__":
    main()
