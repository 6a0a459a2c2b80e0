"""Fixture-vs-stream wall split for the two streaming lakehouse queries
(r7 VERDICT item 8): q_stream_merge and q_table_replicate dominate the
bench EXTRA, but most of their wall is fixture staging (building drop
files / the source table's three commits), not the stream. This script
times the two halves separately with the queries' own code so future
regressions in the STREAM half aren't masked by fixture noise.

Usage: python scripts/stream_split.py [sf_dir]  → one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from pyspark.sql import functions as F

    from aws_lakehouse_project_spark.functions.scratch import scratch_dir
    from aws_lakehouse_project_spark.operators.lakehouse import (
        _await_drained,
        _stale_and_upd,
    )
    from aws_lakehouse_project_spark.plans.versioned import (
        VersionedTable,
        replicate,
    )
    from aws_lakehouse_project_spark.session import build_session

    spark = build_session(app_name="stream-split")
    out: dict[str, dict[str, float]] = {}

    # -- q_table_replicate: fixture = 3 source commits (+CDF feeds);
    #    stream = replicate() drain ------------------------------------
    work = scratch_dir("split_replicate", unique=True)
    t0 = time.perf_counter()
    src = VersionedTable(
        os.path.join(work, "src"), stats_cols=["dt"], change_feed=True
    )
    stale, upd = _stale_and_upd(spark, sf_dir)
    src.write_full(stale.repartition(4))
    src.merge_upsert(spark, upd, keys=["cust_id", "dt"])
    src.delete_where(spark, "cust_id % 5 = 0")
    t1 = time.perf_counter()
    dst = VersionedTable(os.path.join(work, "replica"))
    q = replicate(
        spark, src, dst, keys=["cust_id", "dt"],
        checkpoint_dir=os.path.join(work, "ckpt"),
    )
    _await_drained(q)
    t2 = time.perf_counter()
    out["q_table_replicate"] = {
        "fixture_s": round(t1 - t0, 2),
        "stream_s": round(t2 - t1, 2),
    }

    # -- q_stream_merge: fixture = chronological drop files;
    #    stream = availableNow run with the CoW merge sink -------------
    import datetime as _dt
    import shutil

    from aws_lakehouse_project_spark.catalog import load_table
    from aws_lakehouse_project_spark.streaming.events_stream import (
        daily_user_metrics_stream,
        read_events_stream,
    )

    work = scratch_dir("split_streammerge", unique=True)
    drops = os.path.join(work, "drops")
    os.makedirs(drops)
    t0 = time.perf_counter()
    events = load_table(spark, sf_dir, "events")
    d_min, d_max = events.agg(
        F.min(F.to_date("ts")), F.max(F.to_date("ts"))
    ).first()
    span = max(0, (d_max - d_min).days)
    cuts = [
        d_min + _dt.timedelta(days=span // 3),
        d_min + _dt.timedelta(days=2 * span // 3),
    ]
    dt_col = F.to_date("ts")
    ranges = [
        dt_col < F.lit(cuts[0]),
        (dt_col >= F.lit(cuts[0])) & (dt_col < F.lit(cuts[1])),
        dt_col >= F.lit(cuts[1]),
    ]
    for i, cond in enumerate(ranges):
        part = events.filter(cond)
        if part.isEmpty():
            continue
        tmp = os.path.join(drops, f"stage{i}")
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        for n in os.listdir(tmp):
            if n.endswith(".parquet"):
                shutil.move(
                    os.path.join(tmp, n), os.path.join(drops, f"batch{i}.parquet")
                )
        shutil.rmtree(tmp)
    t1 = time.perf_counter()
    vt = VersionedTable(os.path.join(work, "fact"), stats_cols=["dt"])

    def merge_batch(batch_df, _epoch):
        if not batch_df.isEmpty():
            vt.merge_upsert(batch_df.sparkSession, batch_df, keys=["dt", "cust_id"])

    sq = (
        daily_user_metrics_stream(read_events_stream(spark, drops))
        .writeStream.outputMode("update")
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .foreachBatch(merge_batch)
        .start()
    )
    sq.processAllAvailable()
    sq.stop()
    t2 = time.perf_counter()
    out["q_stream_merge"] = {
        "fixture_s": round(t1 - t0, 2),
        "stream_s": round(t2 - t1, 2),
    }
    print(json.dumps({"sf_dir": sf_dir, "split": out}))


if __name__ == "__main__":
    main()
