"""The fact-table build — the reference's flagship query re-expressed.

``fct_daily_store_metrics`` (reference
``dbt/models/marts/fct_daily_store_metrics.sql:7-32``,
``local_runner.py:136-156``) is: three per-(key, day) aggregations,
chained FULL OUTER joins on the composite key, coalesce/fillna defaulting,
sort, and an incremental MERGE upsert bounded by a 7-day horizon. Here the
same shape runs over the testdata analogs (orders≈erp_orders,
events≈web_events, purchase≈converted — FIXTURES.md §3 analogies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.money import money
from .joins import daily_event_metrics, daily_order_metrics
from .registry import demo_query

FACT_ORACLE = """
    WITH o AS (
      SELECT o_custkey AS cust_id, CAST(o_orderdate AS DATE) AS dt,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
             CAST(COUNT(*) AS BIGINT) AS order_count
      FROM orders GROUP BY 1, 2
    ), p AS (
      SELECT user_id AS cust_id, CAST(ts AS DATE) AS dt,
             CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchases
      FROM events GROUP BY 1, 2
    ), s AS (
      SELECT user_id AS cust_id, CAST(ts AS DATE) AS dt,
             CAST(COUNT(*) AS BIGINT) AS sessions
      FROM events GROUP BY 1, 2
    )
    SELECT COALESCE(o.cust_id, p.cust_id, s.cust_id) AS cust_id,
           COALESCE(o.dt, p.dt, s.dt) AS dt,
           COALESCE(o.revenue, 0) AS revenue,
           COALESCE(o.order_count, 0) AS order_count,
           COALESCE(p.purchases, 0) AS purchases,
           COALESCE(s.sessions, 0) AS sessions
    FROM o
    FULL OUTER JOIN p ON o.cust_id = p.cust_id AND o.dt = p.dt
    FULL OUTER JOIN s ON COALESCE(o.cust_id, p.cust_id) = s.cust_id
                     AND COALESCE(o.dt, p.dt) = s.dt
"""


def build_fact_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship fact build: three aggregates → chained FULL OUTER
    joins (J2) on the composite (cust_id, dt) key with USING coalescing
    (J1/P7) → zero-defaulting (P8) → stable ordering (O1).

    Scale notes: the reference chains three joins because its three
    metric families come from three tables; here purchases and sessions
    both derive from events, so they are computed in ONE aggregation pass
    (multi-aggregate, A4) and the fact is a single full-outer join — two
    scans, two shuffles total, with the join reusing the aggregations'
    (cust_id, dt) hash partitioning. The genuine 3-table 3-way chain
    lives in operators/domain_fact.py. A chained join here would scan
    events twice and re-shuffle after the first join (coalesced USING
    keys lose their partitioning lineage) — measured in
    tests/test_plans.py.
    """
    o = daily_order_metrics(spark, sf_dir).select(
        "cust_id",
        "dt",
        F.col("revenue_dec").cast("double").alias("revenue"),
        "order_count",
    )
    ev = daily_event_metrics(spark, sf_dir).select(
        "cust_id", "dt", "purchases", "sessions"
    )
    fact = o.join(ev, ["cust_id", "dt"], "full_outer").na.fill(
        0, ["revenue", "order_count", "purchases", "sessions"]
    )
    return fact.orderBy("cust_id", "dt")


@demo_query("q_fact_daily", oracle=FACT_ORACLE)
def q_fact_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_fact_daily(spark, sf_dir)


@demo_query("q_sql_fact", oracle=FACT_ORACLE)
def q_sql_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dbt compilation path (SURVEY.md §3.3): the same fact written
    as pure SQL over registered views — Catalyst produces an equivalent
    plan either way, proving SQL-surface parity with the DataFrame API.
    The DECIMAL(12,2)-before-SUM discipline appears verbatim in SQL."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH o AS (
          SELECT o_custkey AS cust_id, CAST(o_orderdate AS DATE) AS dt,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
                 COUNT(*) AS order_count
          FROM orders GROUP BY 1, 2
        ), e AS (
          SELECT user_id AS cust_id, CAST(ts AS DATE) AS dt,
                 COUNT_IF(event_type = 'purchase') AS purchases,
                 COUNT(*) AS sessions
          FROM events GROUP BY 1, 2
        )
        SELECT COALESCE(o.cust_id, e.cust_id) AS cust_id,
               COALESCE(o.dt, e.dt) AS dt,
               COALESCE(o.revenue, 0) AS revenue,
               COALESCE(o.order_count, 0) AS order_count,
               COALESCE(e.purchases, 0) AS purchases,
               COALESCE(e.sessions, 0) AS sessions
        FROM o FULL OUTER JOIN e ON o.cust_id = e.cust_id AND o.dt = e.dt
        """
    )


# ---------------------------------------------------------------------------
# S8: incremental MERGE upsert (dbt incremental, merge strategy)
# ---------------------------------------------------------------------------

MERGE_HORIZON = "2001-01-01"  # pinned stand-in for dateadd(day,-7,current_date)

MERGE_ORACLE = f"""
    WITH existing AS (
      SELECT o_custkey AS cust_id, CAST(o_orderdate AS DATE) AS dt,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
             CAST(COUNT(*) AS BIGINT) AS order_count
      FROM orders WHERE o_orderkey % 10 <> 0
      GROUP BY 1, 2
    ), fresh AS (
      SELECT o_custkey AS cust_id, CAST(o_orderdate AS DATE) AS dt,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
             CAST(COUNT(*) AS BIGINT) AS order_count
      FROM orders WHERE CAST(o_orderdate AS DATE) >= DATE '{MERGE_HORIZON}'
      GROUP BY 1, 2
    )
    SELECT cust_id, dt, revenue, order_count
    FROM existing WHERE dt < DATE '{MERGE_HORIZON}'
    UNION ALL
    SELECT cust_id, dt, revenue, order_count FROM fresh
"""


@demo_query("q_merge_upsert", oracle=MERGE_ORACLE)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 incremental MERGE on (key, dt) without Delta (reference
    fct_daily_store_metrics.sql:1-5 `incremental_strategy='merge'`,
    unique_key=['store_id','dt']; horizon :34-36).

    Because the fact row is fully recomputed from the horizon's source
    rows, MERGE ≡ (keep existing rows outside horizon) ∪ (recompute inside
    horizon) — exactly what dynamic partition overwrite does on a
    dt-partitioned table. The demo simulates a stale existing table
    (orders with orderkey%10==0 missing, i.e. late-arriving rows) and
    merges the fresh horizon: late rows inside the horizon are healed,
    matching the reference's late-data contract. See plans/merge.py for
    the materializing writer.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey"),
        F.col("o_custkey").alias("cust_id"),
        F.col("o_orderdate").cast("date").alias("dt"),
        money("o_totalprice").alias("price"),
    )

    def daily(df: DataFrame) -> DataFrame:
        return df.groupBy("cust_id", "dt").agg(
            F.sum("price").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("order_count"),
        )

    existing = daily(orders.filter(F.col("o_orderkey") % 10 != 0))
    fresh = daily(orders.filter(F.col("dt") >= F.lit(MERGE_HORIZON)))
    kept = existing.filter(F.col("dt") < F.lit(MERGE_HORIZON))
    return kept.unionByName(fresh)


MERGE_DELETE_BASE = "2000-10-01"  # bounded base window: ~90 dt-partitions

MERGE_DELETE_ORACLE = f"""
    WITH daily AS (
      SELECT o_custkey AS cust_id,
             CAST(o_orderdate AS DATE) AS dt,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
             CAST(COUNT(*) AS BIGINT) AS order_count
      FROM orders
      WHERE CAST(o_orderdate AS DATE) >= DATE '{MERGE_DELETE_BASE}'
      GROUP BY 1, 2
    )
    SELECT cust_id, dt, revenue, order_count
    FROM daily WHERE dt < DATE '{MERGE_HORIZON}'
    UNION ALL
    SELECT cust_id, dt, revenue * 2 AS revenue, order_count
    FROM daily WHERE dt >= DATE '{MERGE_HORIZON}' AND cust_id % 3 <> 0
"""


@demo_query("q_merge_delete", oracle=MERGE_DELETE_ORACLE)
def q_merge_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 extension: FULL MERGE from a change feed (WHEN MATCHED THEN
    UPDATE / DELETE + WHEN NOT MATCHED THEN INSERT) driven through the
    real materializing writer, not simulated — the demo builds the fact
    on disk, applies a horizon change feed (every third customer's rows
    deleted, the rest corrected to doubled revenue), and returns the
    re-read table. Only the horizon's dt-partitions are read or
    rewritten (plans/merge.py::merge_apply)."""
    import os

    from ..functions.scratch import scratch_dir
    from ..plans.merge import PartitionOverwriteMergeWriter, merge_apply

    orders = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("cust_id"),
            F.col("o_orderdate").cast("date").alias("dt"),
            money("o_totalprice").alias("price"),
        )
        .filter(F.col("dt") >= F.lit(MERGE_DELETE_BASE))
    )
    daily = orders.groupBy("cust_id", "dt").agg(
        F.sum("price").cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("order_count"),
    )
    # partitioned writers order columns (data..., partition): keep dt last
    daily = daily.select("cust_id", "revenue", "order_count", "dt")

    work = scratch_dir("spark_graft_merge_delete", unique=True)
    writer = PartitionOverwriteMergeWriter(os.path.join(work, "fact"), partition_col="dt")
    writer.write_full(daily)

    changes = (
        daily.filter(F.col("dt") >= F.lit(MERGE_HORIZON))
        .withColumn(
            "op",
            F.when(F.col("cust_id") % 3 == 0, F.lit("delete")).otherwise(
                F.lit("upsert")
            ),
        )
        .withColumn(
            "revenue",
            F.when(F.col("op") == "upsert", F.col("revenue") * 2).otherwise(
                F.col("revenue")
            ),
        )
    )
    merge_apply(writer, spark, changes, keys=["cust_id", "dt"])
    return writer.read(spark).select(
        "cust_id",
        F.col("dt").cast("date").alias("dt"),
        "revenue",
        F.col("order_count").cast("bigint").alias("order_count"),
    )


TABLE_DIFF_ORACLE = f"""
    WITH newt AS (
      SELECT o_custkey AS cust_id, CAST(o_orderdate AS DATE) AS dt,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
             CAST(COUNT(*) AS BIGINT) AS order_count
      FROM orders WHERE o_orderkey % 10 <> 0
      GROUP BY 1, 2
    ), oldt AS (
      SELECT o_custkey AS cust_id, CAST(o_orderdate AS DATE) AS dt,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
             CAST(COUNT(*) AS BIGINT) AS order_count
      FROM orders GROUP BY 1, 2
    )
    SELECT COALESCE(n.cust_id, o.cust_id) AS cust_id,
           COALESCE(n.dt, o.dt) AS dt,
           COALESCE(n.revenue, o.revenue) AS revenue,
           COALESCE(n.order_count, o.order_count) AS order_count,
           CASE WHEN n.cust_id IS NULL THEN 'delete' ELSE 'upsert' END AS op
    FROM oldt o
    FULL OUTER JOIN newt n ON o.cust_id = n.cust_id AND o.dt = n.dt
    WHERE n.cust_id IS NULL OR o.cust_id IS NULL
       OR n.revenue <> o.revenue OR n.order_count <> o.order_count
"""


@demo_query("q_table_diff", oracle=TABLE_DIFF_ORACLE)
def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed generation (plans/merge.py::table_diff): diff the
    full daily fact against a version with every tenth order retracted —
    upserts where group values changed, deletes where groups vanished.
    ``merge_apply(table_diff(old, new)) ≡ new`` is the tested round-trip
    contract (Delta CDF → MERGE on plain parquet)."""
    from ..plans.merge import table_diff

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey"),
        F.col("o_custkey").alias("cust_id"),
        F.col("o_orderdate").cast("date").alias("dt"),
        money("o_totalprice").alias("price"),
    )

    def daily(df: DataFrame) -> DataFrame:
        return df.groupBy("cust_id", "dt").agg(
            F.sum("price").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("order_count"),
        )

    old = daily(orders)
    new = daily(orders.filter(F.col("o_orderkey") % 10 != 0))
    return table_diff(old, new, keys=["cust_id", "dt"])
