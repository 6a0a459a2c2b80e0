"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship fact-build query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with its DuckDB oracle (rows-only ops omit the oracle).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from aws_lakehouse_project_spark.operators.fact import build_fact_daily

    return build_fact_daily(spark, "/root/testdata/sf0.001")


def _registry():
    # Import for registration side effects. ORDER MATTERS: the driver
    # verifies the first 50 registered queries per round, so modules whose
    # queries lack a CORRECTNESS row from the previous round register
    # first (round 1 checked positions 1-50 = analytics..similarity; round
    # 2 rotates stats/text/tpch/streaming to the front — their round-1
    # positions were 51+).
    from aws_lakehouse_project_spark.operators import (  # noqa: F401
        stats,
        text,
        tpch,
    )
    from aws_lakehouse_project_spark.streaming import events_stream  # noqa: F401
    from aws_lakehouse_project_spark.operators import (  # noqa: F401
        similarity,
        dedup,
        evolution,
        multimodal,
        corpus,
        fact,
        relational,
        joins,
        analytics,
    )
    from aws_lakehouse_project_spark.operators.registry import ORACLES, QUERIES

    return QUERIES, ORACLES


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_registry()[0])


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted keys are rows-only."""
    return dict(_registry()[1])
