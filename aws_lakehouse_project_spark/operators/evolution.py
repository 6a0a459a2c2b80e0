"""Schema-evolution demo query (S10 — reference ``dbt/dbt_project.yml:15``
``on_schema_change: sync_all_columns``).

The reference's contract: when an incremental model's source grows a
column, the target syncs to the union schema and old rows read as NULL
for the new column. Spark-native twin: parquet ``mergeSchema`` on read
over batches written with different (compatible) schemas — evolution is
a metadata union, no data rewrite, which is the only strategy that
survives a 100 TB table (rewriting history to add a column does not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.scratch import scratch_dir
from .registry import demo_query


@demo_query(
    "q_schema_evolution",
    # the evolved inventory is fully derivable: the union schema's
    # columns/dtypes are fixed by construction and the null-backfill
    # count equals the batch-2 row count — so the mergeSchema semantics
    # are value-verified against SQL, not just rows-counted
    oracle="""
    SELECT 'month' AS col_name, 'string' AS dtype,
           CAST(COUNT(*) AS BIGINT) AS n_nonnull FROM orders
    UNION ALL
    SELECT 'o_orderkey', 'bigint', CAST(COUNT(*) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'price', 'double', CAST(COUNT(*) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'priority', 'string', CAST(COUNT(*) AS BIGINT)
    FROM orders WHERE strftime(o_orderdate, '%Y-%m') >= '1996-01'
    """,
)
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-batch mergeSchema round trip returning the evolved column
    inventory with per-column null profile.

    Batch 1 writes (o_orderkey, month, price); batch 2 appends the same
    shape plus a new ``priority`` column. The mergeSchema read must
    surface the union schema, with batch-1 rows NULL in ``priority`` —
    the returned inventory (one row per column: dtype, non-null count)
    proves both the sync and the null-backfill semantics.
    """
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.col("o_totalprice").cast("double").alias("price"),
        "o_orderpriority",
    )
    v1 = base.filter(F.col("month") < "1996-01").drop("o_orderpriority")
    v2 = base.filter(F.col("month") >= "1996-01").withColumnRenamed(
        "o_orderpriority", "priority"
    )

    # unique per invocation: the two-batch overwrite+append sequence is
    # NOT idempotent against leftover state (under dynamic partition
    # overwrite, batch 1's overwrite clears only its own months, so a
    # re-run would append batch 2 on top of the previous run's copy)
    out = scratch_dir("spark_graft_schema_evo", unique=True)
    v1.write.mode("overwrite").partitionBy("month").parquet(out)
    v2.write.mode("append").partitionBy("month").parquet(out)

    back = spark.read.option("mergeSchema", True).parquet(out)
    # one aggregation pass over the union schema, then stack() unpivots it
    # into the per-column inventory — a single scan regardless of width
    fields = back.schema.fields
    agg = back.agg(
        *[F.count(F.col(f.name)).alias(f"c_{i}") for i, f in enumerate(fields)]
    )
    stack_args = ", ".join(
        f"'{f.name}', '{f.dataType.simpleString()}', c_{i}"
        for i, f in enumerate(fields)
    )
    return agg.select(
        F.expr(f"stack({len(fields)}, {stack_args}) AS (col_name, dtype, n_nonnull)")
    ).orderBy("col_name")
