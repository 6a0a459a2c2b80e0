"""Bloom-pruned semi join (operators/joins.py split-block filter): no
false negatives ever, false-positive rate inside the design bound,
NULL keys handled with semi-join semantics, compact blocks table."""

from pyspark.sql import functions as F

from aws_lakehouse_project_spark.operators.joins import (
    bloom_prune,
    build_bloom_blocks,
)


def test_bloom_no_false_negatives_and_fp_bound(spark):
    keys = spark.range(500).select(F.col("id").alias("k"))
    blocks, nblocks = build_bloom_blocks(keys, "k")
    probe = spark.range(20_000).select(F.col("id").alias("k"))
    got = {r["k"] for r in bloom_prune(probe, "k", blocks, nblocks).collect()}
    assert set(range(500)) <= got, "bloom dropped a true key"
    fp = len(got - set(range(500))) / (20_000 - 500)
    # split-block design bound ~1e-3 at 16 bits/key; order of margin
    assert fp <= 0.01, f"false-positive rate {fp}"


def test_bloom_drops_null_probe_keys(spark):
    keys = spark.range(10).select(F.col("id").alias("k"))
    blocks, nblocks = build_bloom_blocks(keys, "k")
    probe = spark.createDataFrame([(1,), (None,)], "k long")
    got = [r["k"] for r in bloom_prune(probe, "k", blocks, nblocks).collect()]
    assert got == [1]


def test_bloom_build_ignores_null_keys(spark):
    keys = spark.createDataFrame([(7,), (None,)], "k long")
    blocks, nblocks = build_bloom_blocks(keys, "k")
    probe = spark.createDataFrame([(7,), (8,)], "k long")
    got = {r["k"] for r in bloom_prune(probe, "k", blocks, nblocks).collect()}
    assert 7 in got


def test_bloom_blocks_table_is_compact(spark):
    """nblocks tracks the build-side count: 16 bits/key in 64-bit
    blocks, rounded to a power of two — the broadcast stays tiny and
    independent of key width."""
    keys = spark.range(1000).select(F.col("id").alias("k"))
    blocks, nblocks = build_bloom_blocks(keys, "k")
    assert nblocks <= 512  # 1000 keys * 16 bits / 64 -> 250 -> 256
    assert blocks.count() <= nblocks


def test_bloom_works_on_string_keys(spark):
    """The compression argument is strongest for wide keys — the filter
    must accept them natively (xxhash64 hashes any atomic type)."""
    keys = spark.createDataFrame(
        [(f"https://example.com/doc/{i}",) for i in range(200)], "k string"
    )
    blocks, nblocks = build_bloom_blocks(keys, "k")
    probe = spark.createDataFrame(
        [(f"https://example.com/doc/{i}",) for i in range(400)], "k string"
    )
    got = {r["k"] for r in bloom_prune(probe, "k", blocks, nblocks).collect()}
    assert {f"https://example.com/doc/{i}" for i in range(200)} <= got
