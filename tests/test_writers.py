"""Writer-layout tests: bucketed join without shuffle (S3/§2.1),
Z-order-approx clustering (S7), schema evolution on read (S10)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key must join with zero Exchange
    operators — the co-located-join contract."""
    from aws_lakehouse_project_spark.catalog import load_table
    from aws_lakehouse_project_spark.sources.writers import write_bucketed

    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, "b_orders", 4, ["o_orderkey"], str(tmp_path / "bo"))
    write_bucketed(li, "b_lineitem", 4, ["l_orderkey"], str(tmp_path / "bl"))
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force sort-merge: tiny test tables would otherwise broadcast,
        # which bypasses (and disables) bucketed scans entirely
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_zorder_approx_sorted_within_files(spark, tmp_path):
    """The Z-order-approx writer must produce files whose rows are
    sorted on the cluster keys (what enables row-group min/max
    pruning)."""
    from aws_lakehouse_project_spark.catalog import load_table
    from aws_lakehouse_project_spark.sources.writers import write_zorder_approx

    orders = load_table(spark, SF_DIR, "orders").select(
        F.date_format("o_orderdate", "yyyy").alias("year"),
        F.col("o_custkey"),
        F.col("o_orderkey"),
    )
    out = str(tmp_path / "zo")
    write_zorder_approx(orders, out, ["year"], ["o_custkey"])
    for f in glob.glob(f"{out}/year=*/**/*.parquet", recursive=True):
        vals = [r["o_custkey"] for r in spark.read.parquet(f).collect()]
        assert vals == sorted(vals), f"{f} not clustered"
    # content round-trips
    assert spark.read.parquet(out).count() == orders.count()


def test_schema_evolution_merge_schema(spark, tmp_path):
    """S10 `on_schema_change: sync_all_columns`: a batch with an added
    column lands alongside the old files; mergeSchema surfaces the
    union, with nulls for pre-evolution rows."""
    from aws_lakehouse_project_spark.sources.writers import write_partitioned_parquet

    out = str(tmp_path / "evo")
    v1 = spark.createDataFrame([("a", "2024-01-01", 1)], "k STRING, dt STRING, x INT")
    write_partitioned_parquet(v1, out, ["dt"])
    v2 = spark.createDataFrame(
        [("b", "2024-01-02", 2, 9.5)], "k STRING, dt STRING, x INT, y DOUBLE"
    )
    v2.write.mode("append").partitionBy("dt").parquet(out)

    back = spark.read.option("mergeSchema", True).parquet(out)
    assert set(back.columns) == {"k", "dt", "x", "y"}
    rows = {r["k"]: (r["x"], r["y"]) for r in back.collect()}
    assert rows == {"a": (1, None), "b": (2, 9.5)}


def test_compact_table_merges_small_files(spark, tmp_path):
    """A fragmented table compacts to the expected file count with
    identical contents, and range-sorted compaction keeps files
    range-disjoint."""
    from aws_lakehouse_project_spark.sources.writers import compact_table

    path = str(tmp_path / "frag")
    df = spark.range(0, 1000).selectExpr("id", "id % 7 AS grp")
    df.repartition(40).write.parquet(path)  # 40 shards of ~25 rows

    before, after = compact_table(spark, path, target_rows_per_file=500, sort_within=["id"])
    assert before == 40
    assert after == 2

    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert back.agg({"id": "sum"}).collect()[0][0] == 499500
    # range-disjoint files: per-file max < next file's min
    import os
    ranges = []
    for name in sorted(os.listdir(path)):
        if name.endswith(".parquet"):
            part = spark.read.parquet(os.path.join(path, name))
            lo, hi = part.agg({"id": "min"}).collect()[0][0], part.agg({"id": "max"}).collect()[0][0]
            ranges.append((lo, hi))
    ranges.sort()
    for (_, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi1 < lo2


def test_zorder_files_cover_compact_rectangles(spark, tmp_path):
    """True Z-order: every output file covers a compact (x, y) rectangle,
    so min/max pruning works on BOTH columns. The lexicographic sort
    (write_zorder_approx) clusters only the leading column — its files
    span the full y range. Quantified: mean per-file y-span under Z-order
    must be a fraction of the lexicographic writer's."""
    import os

    from aws_lakehouse_project_spark.sources.writers import (
        write_zorder,
        write_zorder_approx,
    )

    # uniform 64x64 grid — worst case for single-column clustering
    grid = spark.range(0, 64 * 64).selectExpr(
        "CAST(id % 64 AS DOUBLE) AS x", "CAST(id DIV 64 AS DOUBLE) AS y"
    )

    def mean_y_span(path: str) -> float:
        spans = []
        for name in sorted(os.listdir(path)):
            if name.endswith(".parquet"):
                part = spark.read.parquet(os.path.join(path, name))
                row = part.agg({"y": "min"}).collect()[0][0], part.agg(
                    {"y": "max"}
                ).collect()[0][0]
                spans.append(row[1] - row[0])
        assert len(spans) >= 8
        return sum(spans) / len(spans)

    zpath = str(tmp_path / "zorder")
    write_zorder(grid, zpath, ["x", "y"], n_files=16)
    lexpath = str(tmp_path / "lex")
    write_zorder_approx(grid, lexpath, [], ["x", "y"], n_files_per_partition=16)

    z_span = mean_y_span(zpath)
    lex_span = mean_y_span(lexpath)
    # 16 z-order files over a 64x64 grid ≈ 16x16 tiles → y-span ~16;
    # lexicographic files each span nearly all 64 y values
    assert z_span < lex_span / 2, (z_span, lex_span)
    # content preserved
    assert spark.read.parquet(zpath).count() == 64 * 64


def test_zorder_three_columns(spark, tmp_path):
    """Morton interleave generalizes beyond two columns: a 3-D grid
    clusters compactly in every dimension."""
    import os

    from aws_lakehouse_project_spark.sources.writers import write_zorder

    grid = spark.range(0, 16 * 16 * 16).selectExpr(
        "CAST(id % 16 AS DOUBLE) AS x",
        "CAST((id DIV 16) % 16 AS DOUBLE) AS y",
        "CAST(id DIV 256 AS DOUBLE) AS z",
    )
    path = str(tmp_path / "z3")
    write_zorder(grid, path, ["x", "y", "z"], n_files=8)
    back = spark.read.parquet(path)
    assert back.count() == 4096
    # files cluster in EVERY dimension: mean bounding-box span per dim
    # stays well under the full 0..15 extent (a lexicographic sort gives
    # ~15 for y and z in every file; boundary files may straddle two
    # octants, so per-file spans are checked on average, not worst-case)
    spans = {c: [] for c in ("x", "y", "z")}
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        part = spark.read.parquet(os.path.join(path, name))
        for c in spans:
            lo = part.agg({c: "min"}).collect()[0][0]
            hi = part.agg({c: "max"}).collect()[0][0]
            spans[c].append(hi - lo)
    for c, vals in spans.items():
        assert len(vals) >= 8
        assert sum(vals) / len(vals) <= 12, (c, vals)


def test_zorder_value_never_negative_with_many_columns(spark):
    """4+ cluster columns at the default 16 bits would shift past bit 63
    (sign bit) — zorder_value must scale bits down so every key stays
    non-negative and high-coordinate rows keep sorting last."""
    from pyspark.sql import functions as F

    from aws_lakehouse_project_spark.sources.writers import zorder_value

    df = spark.range(0, 256).select(
        (F.col("id") % 4).alias("a"),
        ((F.col("id") / 4).cast("long") % 4).alias("b"),
        ((F.col("id") / 16).cast("long") % 4).alias("c"),
        ((F.col("id") / 64).cast("long") % 4).alias("d"),
    )
    z = zorder_value(["a", "b", "c", "d"], [0.0] * 4, [3.0] * 4, bits=16)
    rows = df.withColumn("z", z).collect()
    assert all(r["z"] >= 0 for r in rows)
    zmax = {(r["a"], r["b"], r["c"], r["d"]): r["z"] for r in rows}
    # the all-max corner must carry the largest key (sign-bit overflow
    # would have made it the smallest)
    assert zmax[(3, 3, 3, 3)] == max(r["z"] for r in rows)
    assert zmax[(0, 0, 0, 0)] == min(r["z"] for r in rows)


def test_compact_table_counts_same_extensions_both_sides(spark, tmp_path):
    """files_before/files_after use one predicate (.parquet), so the
    pair is comparable; the swap leaves no staging/backup directories."""
    import os

    from aws_lakehouse_project_spark.sources.writers import compact_table

    path = str(tmp_path / "t")
    spark.range(0, 100).repartition(10).write.parquet(path)
    before, after = compact_table(spark, path, target_rows_per_file=100)
    assert before == 10 and after == 1
    assert not os.path.exists(path + ".__compact__")
    assert not os.path.exists(path + ".__old__")
    assert spark.read.parquet(path).count() == 100
