"""Testdata-encoding tripwire (round-3 post-mortem).

The driver regenerated /root/testdata between rounds 2 and 3, switching
events.ts from parquet TIMESTAMP(NANOS) to TIMESTAMP_MICROS with
isAdjustedToUTC=0 (Spark 4: TIMESTAMP_NTZ) — six queries broke while
unit tests on synthetic frames stayed green. These tests pin the ONE
contract the engine actually relies on: whatever physical encoding the
generator uses, ``catalog.load_table`` / ``normalize_ts`` must surface
``events.ts`` as session-zoned TIMESTAMP. If the driver re-encodes
again, this fails first with a one-line cause instead of a cascade of
``unix_micros`` analysis errors.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_events_ts_normalizes_to_timestamp(spark, sf):
    from aws_lakehouse_project_spark.catalog import load_table

    sf_dir = f"/root/testdata/{sf}"
    if not os.path.exists(os.path.join(sf_dir, "events.parquet")):
        pytest.skip(f"{sf_dir} absent")
    df = load_table(spark, sf_dir, "events")
    got = df.schema["ts"].dataType
    assert isinstance(got, T.TimestampType), (
        f"events.ts normalized to {got} at {sf} — the testdata generator "
        "changed ts encoding again; extend catalog.normalize_ts"
    )


def test_events_ts_values_survive_normalization(spark):
    """Value check, not just type: normalized timestamps must agree with
    DuckDB's read of the same file (micro-of-epoch equality on the min
    and max — catches a wrong-by-1000× or timezone-shifted conversion,
    the actual round-3 failure mode)."""
    import duckdb

    from aws_lakehouse_project_spark.catalog import load_table, table_path

    sf_dir = "/root/testdata/sf0.001"
    path = table_path(sf_dir, "events")
    lo, hi = duckdb.sql(
        f"SELECT epoch_us(min(ts)), epoch_us(max(ts)) FROM read_parquet('{path}')"
    ).fetchone()
    row = (
        load_table(spark, sf_dir, "events")
        .selectExpr("unix_micros(min(ts)) AS lo", "unix_micros(max(ts)) AS hi")
        .collect()[0]
    )
    assert (row["lo"], row["hi"]) == (lo, hi)


def test_normalize_ts_long_gating(spark):
    """The LongType branch assumes nanos-of-epoch by contract;
    long_is_nanos=False must leave a genuine bigint column untouched
    (the silent-garbage hazard the gate exists to prevent)."""
    from pyspark.sql import types as T

    from aws_lakehouse_project_spark.catalog import normalize_ts

    df = spark.createDataFrame([(1700000000_000_000_000,), (42,)], "ts long")
    gated = normalize_ts(df, "ts", long_is_nanos=False)
    assert isinstance(gated.schema["ts"].dataType, T.LongType)
    assert {r["ts"] for r in gated.collect()} == {1700000000_000_000_000, 42}

    converted = normalize_ts(df, "ts")  # default: nanos contract applies
    assert isinstance(converted.schema["ts"].dataType, T.TimestampType)
