"""Grouped-map Arrow seam (`applyInPandas`): per-group model fitting.

The custom-operator ladder (SURVEY.md §7.1, brief): (a) compose built-in
DataFrame ops when semantics allow, else (b) Arrow-batched grouped-map,
else (c) mapPartitions. This module is the (b) rung exercised end-to-end:
per-group ordinary-least-squares, the stand-in for any per-group
procedure that genuinely cannot be written as Spark expressions (sklearn
fits, scipy optimizations, per-entity forecasting).

OLS itself HAS a closed form — `q_corr_regression` in stats.py computes
it UDF-free, and that is the right production choice — which is exactly
what makes it the right demo here: the Arrow path's numbers can be
oracle-checked against the closed-form SQL instead of trusted blindly.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..catalog import load_table
from .registry import demo_query

_OLS_SCHEMA = T.StructType(
    [
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("slope", T.DoubleType()),
        T.StructField("intercept", T.DoubleType()),
    ]
)


def grouped_ols(df: DataFrame, group: str, x: str, y: str) -> DataFrame:
    """Per-group OLS (y ~ x) via ``applyInPandas``.

    Each group's rows stream to one Python worker as Arrow batches and
    the fit runs vectorized in pandas/numpy — the grouped-map shape for
    per-entity modeling. Scale posture: one shuffle on the group key
    (identical to a groupBy); a group must fit one worker's memory, so
    key cardinality ≫ group size is the design point — the same contract
    as any per-entity fit. Sums are ordered by a deterministic column
    sort before reduction so the float result is partition-order-free.
    """

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([x, y], kind="mergesort")  # deterministic sum order
        n = len(pdf)
        sx = pdf[x].sum()
        sy = pdf[y].sum()
        sxx = (pdf[x] * pdf[x]).sum()
        sxy = (pdf[x] * pdf[y]).sum()
        denom = n * sxx - sx * sx
        slope = (n * sxy - sx * sy) / denom if denom else float("nan")
        intercept = (sy - slope * sx) / n
        return pd.DataFrame(
            {
                group: [pdf[group].iloc[0]],
                "n_rows": [n],
                "slope": [round(slope, 6)],
                "intercept": [round(intercept, 6)],
            }
        )

    return df.select(group, x, y).groupBy(group).applyInPandas(fit, _OLS_SCHEMA)


@demo_query(
    "q_grouped_ols",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 6) AS slope,
           ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 6) AS intercept
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_grouped_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow grouped-map per-group OLS of extendedprice on quantity,
    checked against DuckDB's closed-form REGR_SLOPE/REGR_INTERCEPT (see
    ``grouped_ols``; the UDF-free closed form is `q_corr_regression`)."""
    li = load_table(spark, sf_dir, "lineitem")
    return grouped_ols(li, "l_returnflag", "l_quantity", "l_extendedprice")
