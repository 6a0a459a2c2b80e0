"""Registry-wide scale soak: times EVERY batch query at sf0.1 and at a
scaled dir (default .scratch/sf1) back-to-back in one session, prints
one JSON line with per-query times and the scaling factor, and lists
queries whose factor exceeds a flag threshold. Streaming queries are
excluded (they drive real streaming jobs; their scale posture is
watermark/state-bound, covered in tests).

Usage: python scripts/registry_soak.py [SCALED_DIR] [FLAG_FACTOR]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"


def main() -> None:
    scaled = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf1"
    flag_factor = float(sys.argv[2]) if len(sys.argv) > 2 else 20.0

    import __spark_entry__ as entrymod
    from aws_lakehouse_project_spark.session import build_session

    spark = build_session(app_name="registry-soak")
    reg = {
        n: f for n, f in entrymod.queries().items() if not n.startswith("q_stream_")
    }

    def run(name: str, sf_dir: str) -> float | None:
        t0 = time.perf_counter()
        try:
            reg[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            return round(time.perf_counter() - t0, 3)
        except Exception as exc:  # per-query fault isolation
            print(f"# {name} FAILED at {sf_dir}: {exc}", file=sys.stderr)
            return None

    for name in reg:  # warm-up at the smallest SF (JIT/codegen amortized)
        run(name, "/root/testdata/sf0.001")

    out: dict[str, dict[str, float | None]] = {}
    for name in reg:
        b = run(name, BASE)
        s = run(name, scaled)
        f = round(s / b, 1) if b and s else None
        out[name] = {"base": b, "scaled": s, "factor": f}
        print(f"# {name}: {b} -> {s} ({f}x)", file=sys.stderr)

    flagged = sorted(
        (n for n, v in out.items() if v["factor"] and v["factor"] >= flag_factor),
        key=lambda n: -out[n]["factor"],
    )
    failed = [n for n, v in out.items() if v["base"] is None or v["scaled"] is None]
    print(
        json.dumps(
            {
                "base": BASE,
                "scaled": scaled,
                "n_queries": len(out),
                "failed": failed,
                "flagged_ge": flag_factor,
                "flagged": flagged,
                "queries": out,
            }
        )
    )


if __name__ == "__main__":
    main()
