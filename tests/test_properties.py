"""Property-based tests (hypothesis) — SURVEY.md §5: the reference ships
zero automated tests; these go beyond fixed fixtures by checking
algebraic properties on generated data.

Each property materializes ONE generated dataset per example into a
DataFrame (examples kept small — Spark round-trips dominate runtime).
"""

from __future__ import annotations

from decimal import Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SLOW = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key
        st.integers(min_value=0, max_value=3),  # day
        st.decimals(
            min_value=Decimal("-999.99"),
            max_value=Decimal("999.99"),
            places=2,
            allow_nan=False,
            allow_infinity=False,
        ),
    ),
    min_size=0,
    max_size=30,
)


@given(rows=rows_strategy)
@settings(**SLOW)
def test_salted_agg_equals_direct(spark, rows):
    """Two-phase salted aggregation ≡ direct aggregation, for any data
    (the exact-decimal discipline is what makes this hold)."""
    df = spark.createDataFrame(
        [(k, d, float(v)) for k, d, v in rows], "k INT, d INT, v DOUBLE"
    )
    direct = {
        (r["k"],): (r["s"], r["c"])
        for r in df.groupBy("k")
        .agg(
            F.sum(F.col("v").cast("decimal(12,2)")).cast("double").alias("s"),
            F.count(F.lit(1)).alias("c"),
        )
        .collect()
    }
    salted = (
        df.withColumn("salt", F.pmod(F.xxhash64("d"), F.lit(4)))
        .groupBy("k", "salt")
        .agg(
            F.sum(F.col("v").cast("decimal(12,2)")).alias("ps"),
            F.count(F.lit(1)).alias("pc"),
        )
        .groupBy("k")
        .agg(F.sum("ps").cast("double").alias("s"), F.sum("pc").alias("c"))
    )
    got = {(r["k"],): (r["s"], r["c"]) for r in salted.collect()}
    assert got == direct


@given(rows=rows_strategy)
@settings(**SLOW)
def test_merge_upsert_idempotent_and_converges(spark, rows, tmp_path_factory):
    """merge_upsert applied twice with the same updates equals once, and
    the result contains exactly the union of keys."""
    from aws_lakehouse_project_spark.plans.merge import PartitionOverwriteMergeWriter

    if not rows:
        return
    base_dir = tmp_path_factory.mktemp("merge_prop")
    df = spark.createDataFrame(
        [(k, str(d), float(v)) for k, d, v in rows], "k INT, d STRING, v DOUBLE"
    ).groupBy("k", "d").agg(F.sum(F.col("v").cast("decimal(12,2)")).cast("double").alias("v"))

    writer = PartitionOverwriteMergeWriter(str(base_dir / "t"), partition_col="d")
    writer.write_full(df)
    updates = df.filter(F.col("k") % 2 == 0).withColumn("v", F.col("v") + 1.0)
    writer.merge_upsert(spark, updates, ["k", "d"])
    once = sorted(
        (r["k"], str(r["d"]), r["v"]) for r in writer.read(spark).collect()
    )
    writer.merge_upsert(spark, updates, ["k", "d"])
    twice = sorted(
        (r["k"], str(r["d"]), r["v"]) for r in writer.read(spark).collect()
    )
    assert once == twice
    all_keys = {(r["k"], str(r["d"])) for r in df.collect()}
    assert {(k, d) for k, d, _ in once} == all_keys


@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=0, max_size=15
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=0, max_size=15
    ),
)
@settings(**SLOW)
def test_asof_join_matches_naive(spark, left, right):
    """asof_join ≡ the naive per-row 'max right ts <= left ts' spec."""
    from aws_lakehouse_project_spark.operators.analytics import asof_join

    if not left:
        return
    ldf = spark.createDataFrame(left, "user_id INT, ts INT").distinct()
    rdf = spark.createDataFrame(right or [(99, 0)], "user_id INT, ts INT")
    got = {
        (r["user_id"], r["ts"]): r["_asof"]
        for r in asof_join(ldf, rdf, on="user_id").collect()
    }
    for uid, ts in {(u, t) for u, t in left}:
        candidates = [rt for ru, rt in right if ru == uid and rt <= ts]
        want = max(candidates) if candidates else None
        assert got[(uid, ts)] == want, (uid, ts)


@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab @."),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(**SLOW)
def test_expectation_regex_matches_python(spark, texts):
    """The compiled regex violation count ≡ Python's re over the same
    rows (nulls excluded by construction here)."""
    import re

    from aws_lakehouse_project_spark.quality.expectations import Expectation

    pattern = r"^.+@.+\..+$"
    df = spark.createDataFrame([(t,) for t in texts], "email STRING")
    exp = Expectation(
        "expect_column_values_to_match_regex",
        {"column": "email", "regex": pattern},
    )
    n = df.agg(F.count_if(exp.violation_condition()).alias("v")).collect()[0]["v"]
    want = sum(0 if re.match(pattern, t) else 1 for t in texts)
    assert n == want
