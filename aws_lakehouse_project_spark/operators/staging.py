"""Staging transforms — the dbt staging views, Spark-native.

Each transform is the typed cast+project contract from the reference's
``dbt/models/staging/stg_*.sql`` (P1-P4): fixed ordered columns, int cast
for order_id, DECIMAL(12,2) for money (dbt's numeric(12,2) — we follow
dbt, not the pandas float shortcut, per SURVEY.md §7.1), to_date for dt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.money import money


def stage_erp_orders(raw: DataFrame) -> DataFrame:
    """stg_erp_orders (reference dbt/models/staging/stg_erp_orders.sql:3-9)."""
    return raw.select(
        F.col("order_id").cast("int").alias("order_id"),
        F.col("customer_id").cast("string").alias("customer_id"),
        F.col("store_id").cast("string").alias("store_id"),
        F.to_date("dt").alias("dt"),
        money("order_value").alias("order_value"),
        F.col("status").cast("string").alias("status"),
    )


def stage_crm_leads(raw: DataFrame) -> DataFrame:
    """stg_crm_leads (reference dbt/models/staging/stg_crm_leads.sql:3-10)."""
    return raw.select(
        F.col("lead_id").cast("string").alias("lead_id"),
        F.col("name").cast("string").alias("name"),
        F.col("email").cast("string").alias("email"),
        F.col("source").cast("string").alias("source"),
        F.col("status").cast("string").alias("status"),
        F.col("store_id").cast("string").alias("store_id"),
        F.to_date("dt").alias("dt"),
    )


def stage_web_events(raw: DataFrame) -> DataFrame:
    """stg_web_events (reference dbt/models/staging/stg_web_events.sql:3-10).
    The metadata map is carried opaque, exactly like the reference."""
    return raw.select(
        F.col("event_id").cast("string").alias("event_id"),
        F.col("visitor_id").cast("string").alias("visitor_id"),
        F.col("store_id").cast("string").alias("store_id"),
        F.to_date("dt").alias("dt"),
        F.col("page").cast("string").alias("page"),
        F.col("event_type").cast("string").alias("event_type"),
        F.col("metadata"),
    )


def stage_products(raw: DataFrame) -> DataFrame:
    """stg_products (reference dbt/models/staging/stg_products.sql:3-10)."""
    return raw.select(
        F.col("product_id").cast("string").alias("product_id"),
        F.col("name").cast("string").alias("name"),
        F.col("category").cast("string").alias("category"),
        money("price").alias("price"),
        F.col("active").cast("boolean").alias("active"),
        F.col("store_id").cast("string").alias("store_id"),
        F.to_date("dt").alias("dt"),
    )


STAGING_TRANSFORMS = {
    "erp_orders": stage_erp_orders,
    "crm_leads": stage_crm_leads,
    "web_events": stage_web_events,
    "products": stage_products,
}
