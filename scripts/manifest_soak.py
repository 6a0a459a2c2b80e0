"""Manifest-log growth soak (r8 task 1's done-condition, r9 verdict
task 4): drive a 100+-commit MIXED append/merge/delete history at
$SPARK_GRAFT_SF_DIR (default sf0.1) and measure, per commit,

- claimed manifest bytes (the delta log's actual cost),
- what the pre-r9 FULL-form log would have cost (resolved snapshot
  serialized — the O(commits x files) shape),
- churn (files added + removed) to show bytes ∝ churn,

plus checkpoint count/bytes (the (C/K)·F term) and the fresh-instance
head-resolution raw-read count (must be <= checkpoint_interval).
Prints one JSON line; summary lands in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aws_lakehouse_project_spark.catalog import load_table  # noqa: E402
from aws_lakehouse_project_spark.functions.money import money  # noqa: E402
from aws_lakehouse_project_spark.functions.scratch import scratch_dir  # noqa: E402
from aws_lakehouse_project_spark.plans.versioned import VersionedTable  # noqa: E402
from aws_lakehouse_project_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_COMMITS = int(os.environ.get("SOAK_COMMITS", "100"))
CKPT_INTERVAL = int(os.environ.get("SOAK_CKPT_INTERVAL", "20"))


def main() -> None:
    spark = build_session(app_name="manifest-soak")
    work = scratch_dir("spark_graft_manifest_soak", unique=True)
    vt = VersionedTable(
        os.path.join(work, "fact"),
        stats_cols=["dt"],
        checkpoint_interval=CKPT_INTERVAL,
    )
    daily = (
        load_table(spark, SF_DIR, "orders")
        .select(
            F.col("o_custkey").alias("cust_id"),
            F.col("o_orderdate").cast("date").alias("dt"),
            money("o_totalprice").alias("price"),
        )
        .groupBy("cust_id", "dt")
        .agg(
            F.sum("price").cast("double").alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("order_count"),
        )
        .persist()
    )
    vt.write_full(daily.repartition(16, "cust_id"))

    per_commit = []
    t0 = time.time()
    for i in range(N_COMMITS):
        kind = i % 10
        prev = vt._manifest()
        if kind < 7:  # append a small synthetic slice (~new keys)
            slice_df = (
                daily.filter(F.col("cust_id") % 400 == i % 400)
                .withColumn("cust_id", F.col("cust_id") + F.lit(10_000_000 + i))
                .coalesce(1)
            )
            v = vt.append(slice_df)
        elif kind < 9:  # CoW merge touching ~0.25% of keys
            upd = daily.filter(F.col("cust_id") % 397 == i % 397).withColumn(
                "revenue", F.col("revenue") * 1.01
            )
            v = vt.merge_upsert(spark, upd, keys=["cust_id", "dt"])
        else:  # CoW delete of a thin predicate
            v = vt.delete_where(spark, f"cust_id % 9973 = {i % 9973}")
        cur = vt._manifest(v)
        raw_path = vt._log_path(v)
        with open(raw_path) as fh:
            raw = json.load(fh)
        churn = len(set(cur["files"]) ^ set(prev["files"]))
        per_commit.append(
            {
                "v": v,
                "op": cur["op"],
                "is_delta": "base" in raw,
                "claimed_bytes": os.path.getsize(raw_path),
                "full_bytes": len(json.dumps(cur, sort_keys=True)),
                "churn_files": churn,
                "n_files": len(cur["files"]),
            }
        )
    wall = time.time() - t0
    daily.unpersist()

    ckpts = [
        n
        for n in os.listdir(os.path.join(vt.path, "_log"))
        if n.endswith(".ckpt.json")
    ]
    ckpt_bytes = sum(
        os.path.getsize(os.path.join(vt.path, "_log", n)) for n in ckpts
    )

    fresh = VersionedTable(vt.path, checkpoint_interval=CKPT_INTERVAL)
    reads: list[int] = []
    orig = fresh._raw_manifest
    fresh._raw_manifest = lambda v: (reads.append(v), orig(v))[1]
    head = fresh._manifest()

    deltas = [c for c in per_commit if c["is_delta"]]
    fulls = [c for c in per_commit if not c["is_delta"]]
    claimed_total = sum(c["claimed_bytes"] for c in per_commit)
    full_total = sum(c["full_bytes"] for c in per_commit)
    # churn-proportionality: mean bytes per churned file, first vs last
    # third of the history — flat means bytes/commit ∝ churn, not age
    third = len(deltas) // 3
    bpc_early = sum(c["claimed_bytes"] for c in deltas[:third]) / max(
        1, sum(c["churn_files"] for c in deltas[:third])
    )
    bpc_late = sum(c["claimed_bytes"] for c in deltas[-third:]) / max(
        1, sum(c["churn_files"] for c in deltas[-third:])
    )
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "commits": N_COMMITS,
                "wall_sec": round(wall, 1),
                "head_version": head["version"],
                "head_files": len(head["files"]),
                "delta_commits": len(deltas),
                "full_commits": len(fulls),
                "claimed_log_bytes": claimed_total,
                "hypothetical_full_log_bytes": full_total,
                "log_ratio_full_over_delta": round(
                    full_total / max(1, claimed_total), 1
                ),
                "bytes_per_churned_file_early": round(bpc_early, 1),
                "bytes_per_churned_file_late": round(bpc_late, 1),
                "checkpoints": len(ckpts),
                "checkpoint_bytes": ckpt_bytes,
                "fresh_head_resolution_raw_reads": len(reads),
                "checkpoint_interval": CKPT_INTERVAL,
            }
        )
    )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
