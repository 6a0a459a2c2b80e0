"""fct_daily_store_metrics — the reference's mart, Spark-native.

Semantics from ``dbt/models/marts/fct_daily_store_metrics.sql:7-32`` and
its pandas twin ``local_runner.py:136-156``:

- orders → (store_id, dt): SUM(order_value) AS revenue, COUNT(*) AS
  order_count
- leads → (store_id, dt): COUNT(*) FILTER (status='converted') AS
  converted_leads
- web events → (store_id, dt): COUNT(*) AS sessions
- chained FULL OUTER joins USING (store_id, dt), coalesced keys,
  metrics defaulted to 0, ordered by (store_id, dt)

Revenue stays DECIMAL(12,2) end-to-end (dbt's type) — exact under any
aggregation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_fct_daily_store_metrics(
    stg_erp_orders: DataFrame,
    stg_crm_leads: DataFrame,
    stg_web_events: DataFrame,
) -> DataFrame:
    orders = stg_erp_orders.groupBy("store_id", "dt").agg(
        F.sum("order_value").alias("revenue"),
        F.count(F.lit(1)).alias("order_count"),
    )
    leads = stg_crm_leads.groupBy("store_id", "dt").agg(
        F.count_if(F.col("status") == "converted").alias("converted_leads")
    )
    web = stg_web_events.groupBy("store_id", "dt").agg(
        F.count(F.lit(1)).alias("sessions")
    )
    # list-of-names joins coalesce the composite key like SQL USING
    # (fct_daily_store_metrics.sql:24-31); all three inputs are already
    # hash-partitioned on (store_id, dt) by their aggregations, so the
    # joins reuse that exchange — no extra shuffle.
    fact = (
        orders.join(leads, ["store_id", "dt"], "full_outer")
        .join(web, ["store_id", "dt"], "full_outer")
        .select(
            "store_id",
            "dt",
            F.coalesce(F.col("revenue"), F.lit(0).cast("decimal(12,2)")).alias(
                "revenue"
            ),
            F.coalesce(F.col("order_count"), F.lit(0)).alias("order_count"),
            F.coalesce(F.col("converted_leads"), F.lit(0)).alias("converted_leads"),
            F.coalesce(F.col("sessions"), F.lit(0)).alias("sessions"),
        )
        .orderBy("store_id", "dt")
    )
    return fact
