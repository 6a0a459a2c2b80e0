"""Nullable-key oracle parity for the two-level distinct re-plans.

The Expand-free rewrites (dedup.q_dedup_exact, tpch.q_distinct_agg,
analytics.q_approx_distinct) replace COUNT(DISTINCT col) with an inner
groupBy + rollup; COUNT(DISTINCT) drops NULL keys while a NULL forms its
own inner group, so the rollup must count count_if(key IS NOT NULL).
These tests run each registered query AND its DuckDB oracle on synthetic
tables CONTAINING NULL keys and require exact parity — plus the
chunk_dup_profile doc_id-uniqueness contract guard."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import Row

from aws_lakehouse_project_spark.operators import analytics, dedup, tpch  # noqa: F401
from aws_lakehouse_project_spark.operators.registry import ORACLES, QUERIES


def _parity(spark, tmp_path, table, df, name):
    sf = str(tmp_path)
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, f"{table}.parquet")
    )
    sdf = QUERIES[name](spark, sf)
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {table} AS SELECT * FROM "
        f"parquet_scan('{sf}/{table}.parquet/*.parquet')"
    )
    res = con.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    idx_s = sorted(range(len(sdf.columns)), key=lambda i: sdf.columns[i])
    idx_d = sorted(range(len(dcols)), key=lambda i: dcols[i])

    def canon(rows, idx):
        return sorted(
            (
                tuple(
                    round(r[i], 9) if isinstance(r[i], float) else r[i]
                    for i in idx
                )
                for r in rows
            ),
            key=lambda t: tuple(str(x) for x in t),
        )

    assert canon(srows, idx_s) == canon(drows, idx_d)


def test_dedup_exact_null_text_parity(spark, tmp_path):
    rows = [
        Row(doc_id=1, lang="en", source="s", n_chars=3, text="aaa"),
        Row(doc_id=2, lang="en", source="s", n_chars=3, text="aaa"),
        Row(doc_id=3, lang="en", source="s", n_chars=3, text=None),
        Row(doc_id=4, lang="en", source="s", n_chars=3, text=None),
        Row(doc_id=5, lang="de", source="s", n_chars=3, text=None),
        Row(doc_id=6, lang="de", source="s", n_chars=3, text="bbb"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars int, text string"
    )
    _parity(spark, tmp_path, "documents", df, "q_dedup_exact")


def test_distinct_agg_null_keys_parity(spark, tmp_path):
    rows = [
        Row(l_returnflag="A", l_suppkey=1, l_partkey=10),
        Row(l_returnflag="A", l_suppkey=1, l_partkey=None),
        Row(l_returnflag="A", l_suppkey=None, l_partkey=11),
        Row(l_returnflag="R", l_suppkey=None, l_partkey=None),
        Row(l_returnflag="R", l_suppkey=2, l_partkey=10),
        Row(l_returnflag="R", l_suppkey=3, l_partkey=10),
    ]
    df = spark.createDataFrame(
        rows, "l_returnflag string, l_suppkey long, l_partkey long"
    )
    _parity(spark, tmp_path, "lineitem", df, "q_distinct_agg")


def test_approx_distinct_null_keys_parity(spark, tmp_path):
    rows = [Row(l_returnflag="A", l_orderkey=None)] * 3 + [
        Row(l_returnflag="A", l_orderkey=k) for k in (1, 1, 2, 3)
    ] + [Row(l_returnflag="N", l_orderkey=k) for k in (5, 5, None, 6)]
    df = spark.createDataFrame(rows, "l_returnflag string, l_orderkey long")
    _parity(spark, tmp_path, "lineitem", df, "q_approx_distinct")


def test_chunk_dup_profile_contract_guard(spark):
    from aws_lakehouse_project_spark.operators.corpus import chunk_dup_profile

    clean = spark.createDataFrame(
        [
            Row(doc_id=1, source="a", text="x y z x y z"),
            Row(doc_id=2, source="b", text="x y z p q r"),
        ],
        "doc_id long, source string, text string",
    )
    ok = chunk_dup_profile(clean, chunk=3, check_contract=True)
    assert ok.count() == 2  # guard passes on a single-source-per-doc frame

    dirty = spark.createDataFrame(
        [
            Row(doc_id=1, source="a", text="x y z"),
            Row(doc_id=1, source="b", text="x y z"),
        ],
        "doc_id long, source string, text string",
    )
    with pytest.raises(ValueError, match="doc_id values repeat"):
        chunk_dup_profile(dirty, chunk=3, check_contract=True)
