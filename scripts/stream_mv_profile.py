"""Stage-time decomposition of q_stream_mv (r10 verdict task 8: 67.7 s
at sf10, 7.2x at 100x — split the versioned-commit FIXTURE cost from
the stream-FOLD cost so the churn-proportional claim is measured for
the fold alone).

Mirrors operators/incremental.py::q_stream_mv with timers; prints one
JSON line. Usage: python scripts/stream_mv_profile.py [sf_dir] [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from aws_lakehouse_project_spark.functions.scratch import scratch_dir  # noqa: E402
from aws_lakehouse_project_spark.operators.incremental import (  # noqa: E402
    _DECIMAL_REV,
    _daily_agg,
    _daily_decimal,
    fold_changes_into_aggregate,
)
from aws_lakehouse_project_spark.plans.versioned import VersionedTable  # noqa: E402
from aws_lakehouse_project_spark.session import build_session  # noqa: E402


def run_once(spark, sf_dir: str) -> dict:
    t: dict = {}
    work = scratch_dir("spark_graft_streammv_prof", unique=True)
    vt = VersionedTable(
        os.path.join(work, "fact"), stats_cols=["dt"], change_feed=True
    )
    orders = _daily_decimal(spark, sf_dir)
    stale = _daily_agg(orders.filter(F.col("o_orderkey") % 10 != 0))
    upd = (
        _daily_agg(orders)
        .filter(F.col("cust_id") % 7 == 0)
        .withColumn("revenue", (F.col("revenue") * 2).cast(_DECIMAL_REV))
    )
    t0 = time.monotonic()
    vt.write_full(stale.repartition(4))
    t["fixture_write_full"] = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    vt.merge_upsert(spark, upd, keys=["cust_id", "dt"])
    t["fixture_merge_upsert"] = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    vt.delete_where(spark, "cust_id % 5 = 0")
    t["fixture_delete"] = round(time.monotonic() - t0, 3)

    empty_mv = spark.createDataFrame(
        [], "dt date, revenue decimal(28,2), total_orders bigint, n_custs bigint"
    )
    gens: dict[int, str] = {}

    def fold_batch(batch, batch_id):
        prev = [b for b in gens if b < batch_id]
        mv = spark.read.parquet(gens[max(prev)]) if prev else empty_mv
        delta = batch.select(
            "_change_type", "dt", "revenue",
            F.col("order_count").alias("total_orders"),
        )
        out = fold_changes_into_aggregate(
            mv, delta, group_keys=["dt"],
            sum_cols=["revenue", "total_orders"], count_col="n_custs",
        )
        path = os.path.join(work, f"mv_gen{batch_id}")
        out.write.mode("overwrite").parquet(path)
        gens[batch_id] = path

    t0 = time.monotonic()
    q = (
        vt.stream_changes(spark, max_files_per_trigger=2)
        .writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(1200), "stream did not drain"
    t["stream_fold_drain"] = round(time.monotonic() - t0, 3)
    t["n_generations"] = len(gens)
    t0 = time.monotonic()
    t["mv_rows"] = spark.read.parquet(gens[max(gens)]).count()
    t["final_read"] = round(time.monotonic() - t0, 3)
    t["total"] = round(
        sum(v for k, v in t.items() if isinstance(v, float)), 3
    )
    return t


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(
        app_name="stream-mv-profile", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    runs = [run_once(spark, sf_dir) for _ in range(repeats)]
    best = {k: min(r[k] for r in runs) for k in runs[0]}
    print(json.dumps({"sf_dir": sf_dir, "repeats": repeats,
                      "best_per_stage": best, "runs": runs}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
