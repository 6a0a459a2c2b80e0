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
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's reader
        # rejects outright unless nanosAsLong is on. The conf is runtime-
        # settable, and the driver may hand us a session without it —
        # set it here so entry()/queries() work on ANY session, then
        # truncate nanos to micros exactly like DuckDB (integer div).
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


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
