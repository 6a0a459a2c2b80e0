"""Table catalog over the driver testdata directory.

Replaces the reference's Glue-crawler catalog (reference
``terraform/main.tf:33-41``, ``airflow/dags/lakehouse_pipelines.py:76-79``)
with the Spark session catalog: parquet scans registered as temp views so
both the DataFrame API and ``spark.sql`` see the same tables (SURVEY.md §2
S3/S4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one testdata table (S4). Predicate pushdown and
    column pruning are Catalyst's job — callers filter/select lazily."""
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        # events.ts is TIMESTAMP(NANOS) parquet, surfaced as long nanos via
        # spark.sql.legacy.parquet.nanosAsLong; truncate to micros exactly
        # like DuckDB does (integer div, no double rounding)
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view (S3/S9)."""
    out: dict[str, DataFrame] = {}
    for name in TESTDATA_TABLES:
        path = table_path(sf_dir, name)
        if not os.path.exists(path):
            continue
        df = load_table(spark, sf_dir, name)  # handles events' nanos ts
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
