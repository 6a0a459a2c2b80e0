"""OCC contention throughput (r8 task 5 / r9 verdict task 7): sustained
MIXED merge+append contention against ONE versioned table — N writer
threads each landing a fixed number of commits (appends race and
REBASE; CoW merges race and rebase over disjoint files, raising
ConcurrentWriteError only on real conflicts, which the writer then
retries with a fresh snapshot). Reports commit throughput, claim-level
retry counts (lost version-number CAS races), and op-level conflict
retries, plus a full-content audit at the end (no lost updates).

Usage: python scripts/occ_throughput.py [SF_DIR] [WRITERS] [COMMITS_PER_WRITER] [--vacuum]
With --vacuum, a maintenance thread loops ``vacuum(retain_last=2)``
throughout the storm (the r11 concurrency contract): no staged commit
may be reclaimed, and the final audit additionally asserts every
retained manifest resolves to files on disk.
Prints one JSON line; summary lands in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aws_lakehouse_project_spark.catalog import load_table  # noqa: E402
from aws_lakehouse_project_spark.functions.scratch import scratch_dir  # noqa: E402
from aws_lakehouse_project_spark.plans.versioned import (  # noqa: E402
    ConcurrentWriteError,
    VersionedTable,
)
from aws_lakehouse_project_spark.session import build_session  # noqa: E402


def main() -> None:
    with_vacuum = "--vacuum" in sys.argv
    argv = [a for a in sys.argv if a != "--vacuum"]
    sf_dir = argv[1] if len(argv) > 1 else ".scratch/sf1"
    n_writers = int(argv[2]) if len(argv) > 2 else 8
    per_writer = int(argv[3]) if len(argv) > 3 else 6

    spark = build_session(app_name="occ-throughput")
    work = scratch_dir("spark_graft_occ_throughput", unique=True)
    vt = VersionedTable(os.path.join(work, "fact"), stats_cols=["dt"])

    daily = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("cust_id"),
            F.col("o_orderdate").cast("date").alias("dt"),
        )
        .groupBy("cust_id", "dt")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
        .persist()
    )
    n_seed = daily.count()  # materialize before the race
    max_cust = daily.agg(F.max("cust_id")).first()[0]
    # key-range-clustered layout: each writer's merge slice maps to a
    # bounded, mostly-disjoint file set — the shape a 100 TB table has
    # (writers own partitions). Writers 0 and 1 deliberately SHARE a
    # hot range so real file-level conflicts occur and are measured.
    vt.write_full(daily.repartitionByRange(32, "cust_id"))

    # instrument claim-level CAS losses (lost races that rebase/loop)
    claim_attempts = [0]
    claim_lost = [0]
    lock = threading.Lock()
    orig_claim = vt._claim_version

    def counting_claim(manifest, parent=None):
        ok = orig_claim(manifest, parent=parent)
        with lock:
            claim_attempts[0] += 1
            if not ok:
                claim_lost[0] += 1
        return ok

    vt._claim_version = counting_claim

    conflicts = [0]
    errors: list[Exception] = []

    def writer(tid: int) -> None:
        try:
            for j in range(per_writer):
                if (tid + j) % 2 == 0:
                    # append a small synthetic slice with writer-unique keys
                    df = (
                        daily.filter(F.col("cust_id") % 101 == (tid * 7 + j) % 101)
                        .withColumn(
                            "cust_id",
                            F.col("cust_id")
                            + F.lit(1_000_000 * (tid + 1) + 1000 * j),
                        )
                        .coalesce(1)
                    )
                    vt.append(df)
                else:
                    # CoW merge on the writer's OWN key range (writers 0
                    # and 1 share range 0 — the contended pair); real
                    # conflicts raise -> jittered-backoff retry with a
                    # fresh snapshot, the documented caller contract
                    rng = 0 if tid <= 1 else tid
                    width = (max_cust + 1) // n_writers
                    lo, hi = rng * width, (rng + 1) * width
                    upd = daily.filter(
                        (F.col("cust_id") >= lo)
                        & (F.col("cust_id") < hi)
                        & (F.col("cust_id") % 17 == (tid + j) % 17)
                    ).withColumn("order_count", F.col("order_count") + 1)
                    for attempt in range(12):
                        try:
                            vt.merge_upsert(spark, upd, keys=["cust_id", "dt"])
                            break
                        except ConcurrentWriteError:
                            with lock:
                                conflicts[0] += 1
                            time.sleep(0.05 * (tid + 1) + 0.1 * attempt)
                    else:
                        raise RuntimeError(f"writer {tid} merge starved")
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    stop_vac = threading.Event()
    vac_stats = {"passes": 0, "skipped_inflight": 0, "removed_files": 0}

    def vacuumer() -> None:
        h = VersionedTable(vt.path)
        try:
            while not stop_vac.is_set():
                # retain_recent_s=30 is the in-flight-reader floor:
                # every storm op (merge snapshot read -> commit) runs
                # well under 30 s, so no reader loses files mid-scan,
                # while versions older than 30 s still reclaim DURING
                # the storm (the contract: floor >= longest op)
                res = h.vacuum(retain_last=2, retain_recent_s=30.0)
                vac_stats["passes"] += 1
                vac_stats["skipped_inflight"] += res["skipped_inflight_files"]
                vac_stats["removed_files"] += res["removed_data_files"]
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    t0 = time.time()
    threads = [
        threading.Thread(target=writer, args=(t,)) for t in range(n_writers)
    ]
    vthread = threading.Thread(target=vacuumer) if with_vacuum else None
    if vthread:
        vthread.start()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if vthread:
        stop_vac.set()
        vthread.join()
    wall = time.time() - t0

    head = vt._manifest()
    n_commits = head["version"]  # commits landed during the race
    audit_rows = vt.read(spark).count()
    manifest_holes = 0
    if with_vacuum:
        fresh = VersionedTable(vt.path)
        for v in fresh.versions():
            for f in fresh._manifest(v)["files"]:
                if not os.path.exists(os.path.join(vt.path, f)):
                    manifest_holes += 1
    daily.unpersist()
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "writers": n_writers,
                "commits_per_writer": per_writer,
                "seed_rows": n_seed,
                "landed_commits": n_commits,
                "wall_sec": round(wall, 1),
                "commits_per_sec": round(n_commits / wall, 2),
                "claim_attempts": claim_attempts[0],
                "claim_cas_losses": claim_lost[0],
                "op_level_conflict_retries": conflicts[0],
                "writer_errors": [str(e)[:200] for e in errors],
                "final_row_count": audit_rows,
                "final_version": head["version"],
                "vacuum": (
                    {**vac_stats, "manifest_holes": manifest_holes}
                    if with_vacuum
                    else None
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
