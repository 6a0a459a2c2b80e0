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


def normalize_ts(
    df: DataFrame, col: str = "ts", *, long_is_nanos: bool = True
) -> DataFrame:
    """Normalize an event-time column to session-zoned TIMESTAMP whatever
    parquet physical type the testdata generator used this round:

    - TIMESTAMP(NANOS) read as long (``nanosAsLong``) → truncate to
      micros (integer div, exactly like DuckDB) and re-type;
    - TIMESTAMP_MICROS with ``isAdjustedToUTC=0`` → Spark 4 reads
      TIMESTAMP_NTZ; the session is pinned UTC (session.py), so a plain
      cast is value-preserving;
    - already TIMESTAMP / TIMESTAMP_NTZ → lossless cast or no-op.

    PRECONDITION for the LongType branch: it assumes a LongType ``col``
    is nanos-of-epoch produced by ``spark.sql.legacy.parquet.nanosAsLong``
    decoding of a TIMESTAMP(NANOS) parquet column. Passing a genuine
    bigint column (an id, a count) would silently produce garbage
    timestamps — only call this on columns that are event-time by
    contract, or pass ``long_is_nanos=False`` to make LongType a no-op.

    Works on both batch and streaming DataFrames (pure column rewrite).
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    dt = df.schema[col].dataType
    if isinstance(dt, T.LongType) and long_is_nanos:
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if isinstance(dt, T.TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one testdata table (S4). Predicate pushdown and
    column pruning are Catalyst's job — callers filter/select lazily."""
    if name == "events":
        # events.ts encoding has varied across testdata regenerations
        # (TIMESTAMP(NANOS) in r1-r2, TIMESTAMP_MICROS NTZ since r3).
        # nanosAsLong is runtime-settable and harmless for micros data —
        # set it so entry()/queries() work on ANY session, then let
        # normalize_ts sort out whichever type actually arrived.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_ts(spark.read.parquet(table_path(sf_dir, name)))
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
