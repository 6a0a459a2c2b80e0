"""Streaming twin of the events pipeline (SURVEY.md §2.9).

The reference batches its event stream every 6 hours and heals late data
by re-merging a 7-day horizon (reference
``airflow/dags/lakehouse_pipelines.py:105``,
``fct_daily_store_metrics.sql:34-36``). The Structured Streaming
re-expression makes that contract first-class:

- file source over the events directory (micro-batch = the 6-hourly file
  drop),
- ``withWatermark("ts", "7 days")`` — the watermark IS the reference's
  late-data horizon: rows later than 7 days are dropped, rows within it
  re-aggregate their day,
- tumbling daily ``window(ts, "1 day")`` per-user aggregation,
- ``foreachBatch`` + dynamic-partition-overwrite MERGE — the only sink
  mode that reproduces the reference's update-in-place fact semantics
  (plain append-mode windowed aggregation does not; SURVEY.md §7.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.money import money
from ..operators.registry import demo_query
from ..plans.merge import PartitionOverwriteMergeWriter

# raw parquet schema of the events table: ts is TIMESTAMP(NANOS) read as
# long via spark.sql.legacy.parquet.nanosAsLong (see catalog.load_table)
EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, events_path: str) -> DataFrame:
    """File-source stream over the events drop directory (S2/§2.9)."""
    # nanos→long mapping needs this conf even with an explicit schema;
    # runtime-settable, so tolerate sessions the engine didn't build
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one file drop per micro-batch
        .parquet(events_path)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def daily_user_metrics_stream(events: DataFrame, watermark: str = "7 days") -> DataFrame:
    """Watermarked tumbling-daily per-user aggregation — the streaming
    form of the fact's event-side metrics (sessions, purchases)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("day"), F.col("user_id").alias("cust_id"))
        .agg(
            F.count(F.lit(1)).alias("sessions"),
            F.count_if(F.col("event_type") == "purchase").alias("purchases"),
            F.sum(money("value")).cast("double").alias("total_value"),
        )
        .select(
            F.col("day.start").cast("date").alias("dt"),
            "cust_id",
            "sessions",
            "purchases",
            "total_value",
        )
    )


def dedup_events_stream(events: DataFrame, watermark: str = "7 days") -> DataFrame:
    """Streaming exact dedup: turn an at-least-once event feed into an
    exactly-once one by keeping the first copy of each ``event_id`` seen
    within the watermark horizon (``dropDuplicatesWithinWatermark``).

    State is one key per event_id inside the horizon, expired by the
    same 7-day watermark that bounds late data — a redelivery older than
    the horizon is by contract already outside the merge window. First
    copies emit immediately in append mode; redeliveries are dropped.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_stream_to_merge(
    spark: SparkSession,
    events_path: str,
    target_path: str,
    checkpoint_path: str,
    watermark: str = "7 days",
) -> PartitionOverwriteMergeWriter:
    """Drive the stream to completion (for file drops available now) and
    MERGE each micro-batch's updated days into the target fact.

    Update output mode emits refreshed (dt, cust_id) rows per batch;
    foreachBatch overwrites exactly the touched dt partitions — the
    streaming equivalent of the reference's incremental merge. The
    checkpoint gives exactly-once across restarts.
    """
    writer = PartitionOverwriteMergeWriter(target_path, partition_col="dt")
    agg = daily_user_metrics_stream(
        read_events_stream(spark, events_path), watermark=watermark
    )

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # update mode emits only the CHANGED (dt, cust_id) groups — merge
        # at key level so unchanged groups in a touched day survive
        writer.merge_upsert(batch_df.sparkSession, batch_df, ["dt", "cust_id"])

    query = (
        agg.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(merge_batch)
        .start()
    )
    query.processAllAvailable()
    query.stop()
    return writer


_STREAM_ORACLE = """
    SELECT CAST(ts AS DATE) AS dt,
           user_id AS cust_id,
           CAST(COUNT(*) AS BIGINT) AS sessions,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchases,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
"""


@demo_query("q_stream_daily", oracle=_STREAM_ORACLE)
def q_stream_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9: the full streaming pipeline driven to completion over the
    events table as one file drop. Because the watermark only drops data
    later than 7 days *behind already-seen data*, a single complete drop
    aggregates everything — so the merged fact must equal the plain batch
    aggregation, which is the DuckDB oracle. A streaming operator with an
    exact SQL oracle."""
    import os
    import shutil

    from ..functions.scratch import scratch_dir

    work = scratch_dir("spark_graft_stream", unique=True)
    drops = os.path.join(work, "drops")
    os.makedirs(drops)
    shutil.copy(
        os.path.join(sf_dir, "events.parquet"), os.path.join(drops, "events.parquet")
    )
    writer = run_stream_to_merge(
        spark,
        drops,
        target_path=os.path.join(work, "fact"),
        checkpoint_path=os.path.join(work, "ckpt"),
    )
    return writer.read(spark).select(
        F.col("dt").cast("date").alias("dt"),
        "cust_id",
        "sessions",
        "purchases",
        "total_value",
    )
