"""Versioned-table (ACID-lite) demo queries — S7/S8 on the manifest
transaction layer (``plans/versioned.py``).

The reference's production stack declares a transactional table format
("Spark SQL + Delta/Iceberg", BASELINE.json) that is jar-blocked in this
environment; these queries drive the engine's portable replacement
end-to-end with DuckDB oracles: key-granular copy-on-write MERGE,
multi-version time travel with DELETE/OPTIMIZE, and a Structured
Streaming CDC sink committing one table version per micro-batch
(reference ``dbt/models/marts/fct_daily_store_metrics.sql:1-5`` for the
MERGE contract; ``airflow/dags/lakehouse_pipelines.py:105`` for the
6-hourly drop cadence the stream generalizes).

A property worth noting: unlike the partition-overwrite strategy
(``plans/merge.py``), copy-on-write never rewrites a file the merge plan
is reading — new versions are new files — so no ``localCheckpoint``
lineage break is needed anywhere on this path.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.money import money
from ..functions.scratch import scratch_dir
from ..plans.versioned import VersionedTable
from .registry import demo_query

MERGE_HORIZON = "2001-01-01"  # same pinned horizon as operators/fact.py


def _daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("cust_id"),
            F.col("o_orderdate").cast("date").alias("dt"),
            money("o_totalprice").alias("price"),
        )
        .groupBy("cust_id", "dt")
        .agg(
            F.sum("price").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("order_count"),
        )
    )


_DAILY_CTE = """
    daily AS (
      SELECT o_custkey AS cust_id, CAST(o_orderdate AS DATE) AS dt,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
             CAST(COUNT(*) AS BIGINT) AS order_count
      FROM orders GROUP BY 1, 2
    )
"""

VERSIONED_MERGE_ORACLE = f"""
    WITH {_DAILY_CTE},
    stale AS (
      SELECT o_custkey AS cust_id, CAST(o_orderdate AS DATE) AS dt,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
             CAST(COUNT(*) AS BIGINT) AS order_count
      FROM orders WHERE o_orderkey % 10 <> 0 GROUP BY 1, 2
    ),
    upd AS (
      SELECT cust_id, dt, revenue * 2 AS revenue, order_count
      FROM daily WHERE cust_id % 7 = 0
    )
    SELECT cust_id, dt, revenue, order_count FROM stale WHERE cust_id % 7 <> 0
    UNION ALL
    SELECT cust_id, dt, revenue, order_count FROM upd
"""


@demo_query("q_versioned_merge", oracle=VERSIONED_MERGE_ORACLE)
def q_versioned_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 on the transaction layer: key-granular copy-on-write MERGE.

    A stale fact (orders with orderkey%10==0 missing) is created as
    version 0; the update set — every seventh customer recomputed from
    the complete orders with corrected (doubled) revenue — upserts as
    version 1. Matched (cust_id, dt) keys are replaced, keys that only
    exist in the complete recompute insert, and every untouched file
    carries into the new manifest by reference (the Delta MERGE cost
    model: cost ∝ touched files, not table size). The oracle is the
    WHEN MATCHED/NOT MATCHED algebra in SQL.
    """
    work = scratch_dir("spark_graft_versioned", unique=True)
    vt = VersionedTable(os.path.join(work, "fact"), stats_cols=["dt"])

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("cust_id"),
        F.col("o_orderdate").cast("date").alias("dt"),
        money("o_totalprice").alias("price"),
    )

    def daily(df: DataFrame) -> DataFrame:
        return df.groupBy("cust_id", "dt").agg(
            F.sum("price").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("order_count"),
        )

    stale = daily(orders.filter(F.col("o_orderkey") % 10 != 0))
    upd = (
        daily(orders)
        .filter(F.col("cust_id") % 7 == 0)
        .withColumn("revenue", F.col("revenue") * 2)
    )
    vt.write_full(stale.repartition(4))
    vt.merge_upsert(spark, upd, keys=["cust_id", "dt"])
    return vt.read(spark).select(
        "cust_id",
        F.col("dt").cast("date").alias("dt"),
        "revenue",
        F.col("order_count").cast("bigint").alias("order_count"),
    )


TIME_TRAVEL_ORACLE = f"""
    WITH daily AS (
      SELECT o_custkey AS cust_id, CAST(o_orderdate AS DATE) AS dt,
             COUNT(*) AS order_count
      FROM orders GROUP BY 1, 2
    )
    SELECT 'create' AS stage, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(order_count) AS BIGINT) AS total_orders
    FROM daily WHERE dt < DATE '{MERGE_HORIZON}'
    UNION ALL
    SELECT 'append', CAST(COUNT(*) AS BIGINT), CAST(SUM(order_count) AS BIGINT)
    FROM daily
    UNION ALL
    SELECT 'delete', CAST(COUNT(*) AS BIGINT), CAST(SUM(order_count) AS BIGINT)
    FROM daily WHERE cust_id % 5 <> 0
    UNION ALL
    SELECT 'optimize', CAST(COUNT(*) AS BIGINT), CAST(SUM(order_count) AS BIGINT)
    FROM daily WHERE cust_id % 5 <> 0
"""


@demo_query("q_time_travel", oracle=TIME_TRAVEL_ORACLE)
def q_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot isolation across a create → append → DELETE → OPTIMIZE
    history: each stage's snapshot is read back BY VERSION after all
    four commits exist, so the query passes only if earlier versions are
    immutable under later writes (time travel), DELETE is file-granular
    copy-on-write, and OPTIMIZE changes layout but never content (its
    row equals the delete row). Exact integer metrics (row and order
    counts) make the oracle hash-stable."""
    work = scratch_dir("spark_graft_timetravel", unique=True)
    vt = VersionedTable(os.path.join(work, "fact"), stats_cols=["dt"])

    daily = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("cust_id"),
            F.col("o_orderdate").cast("date").alias("dt"),
        )
        .groupBy("cust_id", "dt")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )
    v_create = vt.write_full(
        daily.filter(F.col("dt") < F.lit(MERGE_HORIZON)).repartition(4)
    )
    v_append = vt.append(
        daily.filter(F.col("dt") >= F.lit(MERGE_HORIZON)).repartition(4)
    )
    v_delete = vt.delete_where(spark, "cust_id % 5 = 0")
    # pack everything below 10M rows/file into one right-sized file; may
    # be a no-op version (AQE can already have coalesced the delete
    # rewrite), which is exactly what the 'optimize' row then verifies
    v_opt = vt.optimize(spark, target_rows_per_file=10_000_000)

    def snap(stage: str, version: int) -> DataFrame:
        return (
            vt.read(spark, version=version)
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("order_count").cast("bigint").alias("total_orders"),
            )
            .select(F.lit(stage).alias("stage"), "n_rows", "total_orders")
        )

    return (
        snap("create", v_create)
        .unionByName(snap("append", v_append))
        .unionByName(snap("delete", v_delete))
        .unionByName(snap("optimize", v_opt))
    )


STREAM_MERGE_ORACLE = """
    SELECT CAST(ts AS DATE) AS dt,
           user_id AS cust_id,
           CAST(COUNT(*) AS BIGINT) AS sessions,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchases,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
"""


@demo_query("q_stream_merge", oracle=STREAM_MERGE_ORACLE)
def q_stream_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 × S8: Structured Streaming CDC sink on the transaction
    layer. The events feed arrives as THREE file drops (split by
    event_id so every micro-batch really lands); the update-mode daily
    aggregation emits each batch's refreshed key groups, and
    ``foreachBatch`` upserts them copy-on-write — one atomic table
    version per micro-batch, so a reader half-way through the stream
    sees a consistent (if older) fact, never a torn one. After the last
    drop the cumulative update-mode state makes the table equal the
    batch aggregation (the oracle). History length ≥ non-empty-drop
    count is asserted so a silently-fused single batch can't fake the
    pass.

    The drops are CHRONOLOGICAL thirds of the feed's date span — the
    realistic arrival order, and the one that keeps every row inside
    the 7-day watermark of its own batch (a random split would replay
    old events after the watermark advanced, and update mode would
    correctly drop them — as late data beyond the horizon should be —
    breaking batch parity)."""
    from ..streaming.events_stream import (
        daily_user_metrics_stream,
        read_events_stream,
    )

    work = scratch_dir("spark_graft_streammerge", unique=True)
    drops = os.path.join(work, "drops")
    os.makedirs(drops)
    events = load_table(spark, sf_dir, "events")
    # three deterministic chronological drops (fixture staging, same
    # device as the other streaming demos), one file each
    import datetime as _dt

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
    n_drops = 0
    for i, cond in enumerate(ranges):
        part = events.filter(cond)
        if part.isEmpty():
            continue
        tmp = os.path.join(drops, f"stage{i}")
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        for n in os.listdir(tmp):
            if n.endswith(".parquet"):
                shutil.move(
                    os.path.join(tmp, n),
                    os.path.join(drops, f"batch{i}.parquet"),
                )
        shutil.rmtree(tmp)
        n_drops += 1

    vt = VersionedTable(os.path.join(work, "fact"), stats_cols=["dt"])
    agg = daily_user_metrics_stream(read_events_stream(spark, drops))

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        vt.merge_upsert(batch_df.sparkSession, batch_df, keys=["dt", "cust_id"])

    query = (
        agg.writeStream.outputMode("update")
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .foreachBatch(merge_batch)
        .start()
    )
    query.processAllAvailable()
    query.stop()

    history = vt.history()
    if len(history) < n_drops:
        raise AssertionError(
            f"expected ≥{n_drops} versioned commits (one per non-empty "
            f"drop), got {history}"
        )
    return vt.read(spark).select(
        F.col("dt").cast("date").alias("dt"),
        "cust_id",
        "sessions",
        "purchases",
        "total_value",
    )
