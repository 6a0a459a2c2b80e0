"""Demo-query registry.

A demo query is ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible)
a DuckDB oracle string over the same parquet tables. The driver compares
row-count + schema + order-insensitive value hash, sorting columns by name —
so every computed column is aliased identically on both sides, and
floating-point aggregates use the exact-decimal pattern from
``functions.money`` (bit-identical across engines).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def demo_query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a demo query; ``oracle=None`` marks a rows-only check
    (non-SQL-expressible op per the driver contract)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco
