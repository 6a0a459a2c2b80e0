"""Exact money arithmetic for cross-engine determinism.

Floating-point SUM is order-dependent; a Spark plan and a DuckDB oracle
summing the same doubles can differ in the last ulp, which breaks value-hash
comparison. The engine therefore computes money aggregates in
``DecimalType`` (exact integer arithmetic at scale 2, matching the
reference's ``numeric(12,2)`` — reference ``dbt/models/staging/
stg_erp_orders.sql:8``) and casts the final result to double. The same
cast-before-sum pattern in the oracle SQL yields bit-identical results.

At 100 TB this costs nothing extra: decimal sum is still a single-pass
partial+final hash aggregate; only the per-row cast is added.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..schemas import DECIMAL_MONEY


def money(col: Column | str) -> Column:
    """Cast to the canonical money decimal before aggregation."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DECIMAL_MONEY)


def money_sum(col: Column | str, alias: str) -> Column:
    """Exact SUM over decimal, emitted as double (oracle-stable)."""
    return F.sum(money(col)).cast("double").alias(alias)


def money_avg(col: Column | str, alias: str) -> Column:
    """Exact-sum / count, emitted as double — deterministic because both
    operands are identical across engines (no fp accumulation order)."""
    return (F.sum(money(col)).cast("double") / F.count(F.lit(1))).alias(alias)
