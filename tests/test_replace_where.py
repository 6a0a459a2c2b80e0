"""Atomic selective overwrite (Delta replaceWhere) on VersionedTable.

Models the reference's dbt incremental partition-overwrite contract
(/root/reference/dbt/models/marts/fct_daily_store_metrics.sql:1-5) as
one atomic commit: delete-the-window + insert-the-recompute."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from aws_lakehouse_project_spark.plans.versioned import VersionedTable


def _rows(df):
    return sorted((tuple(r) for r in df.collect()), key=str)


def _mk(spark, pairs):
    return spark.createDataFrame(
        [Row(dt=d, v=v) for d, v in pairs], "dt string, v int"
    )


@pytest.fixture()
def vt(tmp_path):
    return VersionedTable(str(tmp_path / "t"), stats_cols=["dt"])


def test_replace_where_basic(spark, vt):
    vt.write_full(
        _mk(spark, [("d1", 1), ("d1", 2), ("d2", 3), ("d3", 4)]).repartition(3)
    )
    v = vt.replace_where(
        spark, "dt = 'd2'", _mk(spark, [("d2", 30), ("d2", 31)])
    )
    assert v == 1
    assert _rows(vt.read(spark)) == [
        ("d1", 1), ("d1", 2), ("d2", 30), ("d2", 31), ("d3", 4)
    ]
    assert vt.history()[-1]["op"] == "replace_where"


def test_replace_where_rejects_leaking_rows(spark, vt):
    vt.write_full(_mk(spark, [("d1", 1)]))
    with pytest.raises(ValueError, match="must all match"):
        vt.replace_where(
            spark, "dt = 'd1'", _mk(spark, [("d1", 9), ("d2", 8)])
        )
    assert vt.latest_version() == 0  # aborted before any commit


def test_replace_where_null_predicate_rows_survive_and_reject(spark, vt):
    vt.write_full(
        spark.createDataFrame(
            [Row(dt="d1", v=1), Row(dt=None, v=2)], "dt string, v int"
        )
    )
    # NULL-dt row does not match, so it survives the replace
    vt.replace_where(spark, "dt = 'd1'", _mk(spark, [("d1", 10)]))
    assert _rows(vt.read(spark)) == sorted(
        [("d1", 10), (None, 2)], key=str
    )
    # and a NULL-dt replacement row does not satisfy the predicate
    with pytest.raises(ValueError, match="must all match"):
        vt.replace_where(
            spark,
            "dt = 'd1'",
            spark.createDataFrame([Row(dt=None, v=0)], "dt string, v int"),
        )


def test_replace_where_carries_untouched_files(spark, vt):
    # one file per dt via range partitioning on dt
    df = _mk(spark, [(f"d{i}", i) for i in range(6)]).repartitionByRange(3, "dt")
    vt.write_full(df)
    m0 = vt._manifest()
    vt.replace_where(spark, "dt = 'd0'", _mk(spark, [("d0", 100)]))
    m1 = vt._manifest()
    assert set(m0["files"]) & set(m1["files"])  # untouched carried by ref
    assert vt.history()[-1]["meta"]["touched_files"] < len(m0["files"])


def test_replace_where_empty_window_is_pure_insert(spark, vt):
    vt.write_full(_mk(spark, [("d1", 1)]))
    vt.replace_where(spark, "dt = 'd9'", _mk(spark, [("d9", 9)]))
    assert _rows(vt.read(spark)) == [("d1", 1), ("d9", 9)]


def test_replace_where_creates_table(spark, tmp_path):
    vt = VersionedTable(str(tmp_path / "fresh"))
    vt.replace_where(spark, "dt = 'd1'", _mk(spark, [("d1", 1)]))
    assert _rows(vt.read(spark)) == [("d1", 1)]


def test_replace_where_applies_deletion_vectors(spark, vt):
    """Survivor rewrite must not resurrect MoR-deleted rows."""
    vt.write_full(_mk(spark, [("d1", 1), ("d1", 2), ("d2", 3)]).coalesce(1))
    vt.delete_where(spark, "v = 2", mode="merge_on_read")
    vt.replace_where(spark, "dt = 'd2'", _mk(spark, [("d2", 30)]))
    assert _rows(vt.read(spark)) == [("d1", 1), ("d2", 30)]


def test_replace_where_cdf(spark, tmp_path):
    vt = VersionedTable(str(tmp_path / "t"), change_feed=True)
    vt.write_full(_mk(spark, [("d1", 1), ("d2", 2)]))
    vt.replace_where(spark, "dt = 'd2'", _mk(spark, [("d2", 20)]))
    feed = spark.read.parquet(vt._cdf_version_dir(1))
    assert sorted((r["_change_type"], r["dt"], r["v"]) for r in feed.collect()) == [
        ("delete", "d2", 2),
        ("insert", "d2", 20),
    ]


def test_replace_where_schema_mismatch_raises(spark, vt):
    vt.write_full(_mk(spark, [("d1", 1)]))
    bad = spark.createDataFrame([Row(dt="d1", other=1)], "dt string, other int")
    with pytest.raises(ValueError, match="schema mismatch"):
        vt.replace_where(spark, "dt = 'd1'", bad)
