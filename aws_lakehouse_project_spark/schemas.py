"""Explicit StructType schemas.

Two families:

1. The reference's four domain tables — ordered-column contracts from the
   GE suites (reference ``great_expectations/expectations/*.json`` line 3)
   with types from the dbt staging casts (reference
   ``dbt/models/staging/stg_*.sql``). Schema *discovery* in the reference is
   Glue-crawler/pandas inference; here schemas are enforced on read
   (stronger — SURVEY.md §1.3).

2. The driver testdata tables at /root/testdata (FIXTURES.md §3), used by
   the demo-query/oracle surface.
"""

from __future__ import annotations

from pyspark.sql import types as T

DECIMAL_MONEY = T.DecimalType(12, 2)  # dbt numeric(12,2): stg_erp_orders.sql:8

# ---------------------------------------------------------------------------
# Reference domain tables (raw zone: everything lands as strings/JSON and is
# cast during staging, mirroring stg_*.sql; see operators/staging.py)
# ---------------------------------------------------------------------------

# Raw CSV/JSON-lines schemas: read everything as string (CSV has no types)
# except JSON-native shapes; casting happens in staging like the reference.
ERP_ORDERS_RAW = T.StructType(
    [
        T.StructField("order_id", T.StringType()),
        T.StructField("customer_id", T.StringType()),
        T.StructField("store_id", T.StringType()),
        T.StructField("dt", T.StringType()),
        T.StructField("order_value", T.StringType()),
        T.StructField("status", T.StringType()),
    ]
)

CRM_LEADS_RAW = T.StructType(
    [
        T.StructField("lead_id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("store_id", T.StringType()),
        T.StructField("dt", T.StringType()),
    ]
)

# web_events metadata: heterogeneous sparse string keys → MapType, not
# StructType (reference samples/web_events.json:1-4; SURVEY.md §1.3)
WEB_EVENTS_RAW = T.StructType(
    [
        T.StructField("event_id", T.StringType()),
        T.StructField("visitor_id", T.StringType()),
        T.StructField("store_id", T.StringType()),
        T.StructField("dt", T.StringType()),
        T.StructField("page", T.StringType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    ]
)

PRODUCTS_RAW = T.StructType(
    [
        T.StructField("product_id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("category", T.StringType()),
        T.StructField("price", T.StringType()),
        T.StructField("active", T.StringType()),
        T.StructField("store_id", T.StringType()),
        T.StructField("dt", T.StringType()),
    ]
)

# Staged (typed) schemas — the dbt staging view contracts.
ERP_ORDERS_STAGED = T.StructType(
    [
        T.StructField("order_id", T.IntegerType()),
        T.StructField("customer_id", T.StringType()),
        T.StructField("store_id", T.StringType()),
        T.StructField("dt", T.DateType()),
        T.StructField("order_value", DECIMAL_MONEY),
        T.StructField("status", T.StringType()),
    ]
)

CRM_LEADS_STAGED = T.StructType(
    [
        T.StructField("lead_id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("store_id", T.StringType()),
        T.StructField("dt", T.DateType()),
    ]
)

WEB_EVENTS_STAGED = T.StructType(
    [
        T.StructField("event_id", T.StringType()),
        T.StructField("visitor_id", T.StringType()),
        T.StructField("store_id", T.StringType()),
        T.StructField("dt", T.DateType()),
        T.StructField("page", T.StringType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    ]
)

PRODUCTS_STAGED = T.StructType(
    [
        T.StructField("product_id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("category", T.StringType()),
        T.StructField("price", DECIMAL_MONEY),
        T.StructField("active", T.BooleanType()),
        T.StructField("store_id", T.StringType()),
        T.StructField("dt", T.DateType()),
    ]
)

FACT_DAILY_STORE_METRICS = T.StructType(
    [
        T.StructField("store_id", T.StringType()),
        T.StructField("dt", T.DateType()),
        T.StructField("revenue", DECIMAL_MONEY),
        T.StructField("order_count", T.LongType()),
        T.StructField("converted_leads", T.LongType()),
        T.StructField("sessions", T.LongType()),
    ]
)

DOMAIN_RAW_SCHEMAS = {
    "erp_orders": ERP_ORDERS_RAW,
    "crm_leads": CRM_LEADS_RAW,
    "web_events": WEB_EVENTS_RAW,
    "products": PRODUCTS_RAW,
}

DOMAIN_STAGED_SCHEMAS = {
    "erp_orders": ERP_ORDERS_STAGED,
    "crm_leads": CRM_LEADS_STAGED,
    "web_events": WEB_EVENTS_STAGED,
    "products": PRODUCTS_STAGED,
}

# ---------------------------------------------------------------------------
# Driver testdata tables (FIXTURES.md §3) — parquet carries its own types;
# these names are the canonical table list for catalog registration.
# ---------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Static fallback for the events file-source stream when the drop
# directory is empty/absent at stream-definition time (schema inference
# needs at least one footer). ``ts`` is TIMESTAMP_NTZ — the generator's
# current encoding (TIMESTAMP_MICROS, isAdjustedToUTC=0); normalize_ts
# rewrites it to session-zoned TIMESTAMP either way.
EVENTS_RAW_FALLBACK_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)
