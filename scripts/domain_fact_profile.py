"""Stage-time decomposition of q_domain_fact_versioned (the r10 judge's
watch item: 13.2 s at sf0.1, 2x the next-slowest extra — is the cost a
bad plan or the commit fixtures?).

Mirrors the query exactly (operators/lakehouse.py::q_domain_fact_versioned)
but times each stage; prints one JSON line. Run on an otherwise idle box:

    python scripts/domain_fact_profile.py [sf_dir] [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from aws_lakehouse_project_spark.functions.scratch import scratch_dir  # noqa: E402
from aws_lakehouse_project_spark.operators.lakehouse import (  # noqa: E402
    DOMAIN_FACT_HORIZON,
    _write_domain_raw,
)
from aws_lakehouse_project_spark.pipeline import (  # noqa: E402
    LakehousePipeline,
    PipelineConfig,
)
from aws_lakehouse_project_spark.plans.versioned import VersionedTable  # noqa: E402
from aws_lakehouse_project_spark.session import build_session  # noqa: E402


def run_once(spark, sf_dir: str) -> dict[str, float]:
    from aws_lakehouse_project_spark.operators.domain_fact import (
        build_fct_daily_store_metrics,
    )

    t: dict[str, float] = {}

    def mark(name, t0):
        t[name] = round(time.monotonic() - t0, 3)

    work = scratch_dir("spark_graft_domainprof", unique=True)
    curated = os.path.join(work, "curated")

    t0 = time.monotonic()
    paths = _write_domain_raw(spark, sf_dir, os.path.join(work, "raw"), stale=True)
    mark("extract_stale_csv_json", t0)

    def cfg():
        return PipelineConfig(
            raw_paths=dict(paths), curated_dir=curated,
            versioned_publish=True, publish_views=False,
        )

    pipe = LakehousePipeline(spark, cfg())
    for d in ("erp_orders", "crm_leads", "web_events"):
        t0 = time.monotonic()
        pipe.run_domain(d)
        mark(f"v0_domain_{d}", t0)
    t0 = time.monotonic()
    fact = build_fct_daily_store_metrics(
        pipe.staged["erp_orders"], pipe.staged["crm_leads"],
        pipe.staged["web_events"],
    )
    fact_dir = pipe.publish_fact(fact)
    mark("v0_fact_wap_publish", t0)

    t0 = time.monotonic()
    _write_domain_raw(spark, sf_dir, os.path.join(work, "raw"), stale=False)
    mark("extract_full_csv_json", t0)

    pipe2 = LakehousePipeline(spark, cfg())
    for d in ("erp_orders", "crm_leads", "web_events"):
        t0 = time.monotonic()
        pipe2.run_domain(d)
        mark(f"restage_domain_{d}", t0)
    t0 = time.monotonic()
    fact_full = build_fct_daily_store_metrics(
        pipe2.staged["erp_orders"], pipe2.staged["crm_leads"],
        pipe2.staged["web_events"],
    )
    pipe2.publish_fact(
        fact_full.filter(F.col("dt") >= F.lit(DOMAIN_FACT_HORIZON))
    )
    mark("fact_horizon_merge", t0)

    t0 = time.monotonic()
    fvt = VersionedTable(fact_dir)
    n = fvt.read(spark).count()
    mark("final_read", t0)
    t["rows"] = n
    t["total"] = round(sum(v for k, v in t.items() if k != "rows"), 3)
    return t


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(
        app_name="domain-fact-profile", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    runs = [run_once(spark, sf_dir) for _ in range(repeats)]
    best = {k: min(r[k] for r in runs) for k in runs[0]}
    print(json.dumps({"sf_dir": sf_dir, "repeats": repeats,
                      "best_per_stage": best, "runs": runs}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
