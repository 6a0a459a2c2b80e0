"""JVM-local literal frames for small driver-side row sets.

``spark.createDataFrame(rows, schema)`` over a Python list is
RDD-backed: every later action on the frame (a noop write, a
``.first()``, an ``append`` into a versioned table) launches a job that
round-trips through a Python worker to unpickle the rows — measured at
0.5–1 s per action on local[32] (OPTIMIZATION_r14.md). For the bounded
metadata-shaped results this engine returns (history rows, stats
answers, 1-row fixtures), ``local_rows`` builds the same frame as a
literal ``inline(array(struct(...)))`` projection — a pure JVM local
relation with zero Python involvement at action time.

Only for DRIVER-BOUNDED row sets (history lengths, per-version answers,
hand-written fixture rows) — never for anything proportional to data:
the literals live in the query plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def local_rows(
    spark: SparkSession, rows: Sequence, ddl: str | T.StructType
) -> DataFrame:
    """``spark.createDataFrame(rows, ddl)`` as a JVM-literal plan."""
    schema = (
        ddl
        if isinstance(ddl, T.StructType)
        else T._parse_datatype_string(ddl)  # noqa: SLF001 — public enough
    )
    if not rows:
        return spark.createDataFrame([], schema)
    # strict zip keeps the replaced API's fail-loud contract: a row whose
    # arity differs from the schema must raise here, not silently
    # truncate into a wrong-but-well-typed frame (ADVICE r14).
    structs = [
        F.struct(
            *[
                F.lit(v).cast(f.dataType).alias(f.name)
                for v, f in zip(tuple(row), schema.fields, strict=True)
            ]
        )
        for row in rows
    ]
    return spark.range(1).select(F.inline(F.array(*structs)))
