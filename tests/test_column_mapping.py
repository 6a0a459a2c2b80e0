"""Column mapping: metadata-only RENAME/DROP COLUMN on VersionedTable.

Delta column-mapping semantics re-derived on plain parquet: logical
names live in the manifest, physical names are frozen at a column's
first write, so renames/drops never touch data files. No reference
code exists for this (the reference delegates DDL to Athena)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row, functions as F

from aws_lakehouse_project_spark.plans.versioned import VersionedTable


def _rows(df):
    return sorted((tuple(r) for r in df.collect()), key=str)


def _mk(spark, pairs):
    return spark.createDataFrame(
        [Row(k=k, v=v) for k, v in pairs], "k int, v string"
    )


def _data_files(vt):
    out = []
    for dirpath, _d, names in os.walk(os.path.join(vt.path, "data")):
        for n in names:
            if n.endswith(".parquet"):
                st = os.stat(os.path.join(dirpath, n))
                out.append((os.path.relpath(os.path.join(dirpath, n), vt.path),
                            st.st_mtime_ns, st.st_size))
    return sorted(out)


@pytest.fixture()
def vt(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"), stats_cols=["k"])
    t.write_full(_mk(spark, [(1, "a"), (2, "b"), (3, "c")]))
    return t


def test_rename_is_metadata_only(spark, vt):
    before = _data_files(vt)
    v = vt.rename_column("v", "label")
    assert v == 1 and _data_files(vt) == before
    assert vt.read(spark).columns == ["k", "label"]
    assert _rows(vt.read(spark)) == [(1, "a"), (2, "b"), (3, "c")]
    assert vt.history()[-1]["op"] == "rename_column"


def test_rename_then_write_roundtrip(spark, vt):
    vt.rename_column("v", "label")
    vt.append(
        spark.createDataFrame([Row(k=4, label="d")], "k int, label string")
    )
    assert _rows(vt.read(spark)) == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]
    # new files store the PHYSICAL name; a second rename still reads both
    vt.rename_column("label", "tag")
    assert _rows(vt.read(spark).select("k", "tag")) == [
        (1, "a"), (2, "b"), (3, "c"), (4, "d")
    ]


def test_rename_survives_mutations(spark, vt):
    vt.rename_column("v", "label")
    vt.delete_where(spark, "k = 2")
    vt.update_where(spark, "k = 1", {"label": "'A'"}, mode="merge_on_read")
    vt.merge_upsert(
        spark,
        spark.createDataFrame([Row(k=9, label="i")], "k int, label string"),
        keys=["k"],
    )
    assert _rows(vt.read(spark)) == [(1, "A"), (3, "c"), (9, "i")]


def test_time_travel_across_rename(spark, vt):
    vt.rename_column("v", "label")
    assert vt.read(spark, 0).columns == ["k", "v"]  # old logical names
    assert vt.read(spark, 1).columns == ["k", "label"]
    assert _rows(vt.read(spark, 0)) == _rows(vt.read(spark, 1))


def test_restore_across_rename_restores_names(spark, vt):
    vt.rename_column("v", "label")
    vt.restore(0, spark=spark)
    assert vt.read(spark).columns == ["k", "v"]


def test_rename_keeps_stats_skipping(spark, tmp_path):
    vt = VersionedTable(str(tmp_path / "s"), stats_cols=["k"])
    vt.write_full(
        _mk(spark, [(i, "x") for i in range(100)]).repartitionByRange(4, "k")
    )
    vt.rename_column("k", "key")
    pruned = vt.scan(spark, "key", lo=0, hi=10)
    assert 0 < len(pruned.inputFiles()) < 4
    assert pruned.count() == 11


def test_rename_rejects_constraint_ref(spark, vt):
    vt.add_constraint(spark, "v_ok", "v IS NOT NULL")
    with pytest.raises(ValueError, match="CHECK constraint"):
        vt.rename_column("v", "label")
    vt.drop_constraint("v_ok")
    vt.rename_column("v", "label")  # now fine


def test_rename_validation(spark, vt):
    with pytest.raises(ValueError, match="no column"):
        vt.rename_column("nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        vt.rename_column("v", "k")


def test_drop_column_metadata_only_and_undrop(spark, vt):
    before = _data_files(vt)
    vt.drop_column("v")
    assert _data_files(vt) == before
    assert vt.read(spark).columns == ["k"]
    # RESTORE across the drop un-drops the data (bytes never left)
    vt.restore(0, spark=spark)
    assert _rows(vt.read(spark)) == [(1, "a"), (2, "b"), (3, "c")]


def test_drop_column_then_evolve_same_name_rejected(spark, vt):
    vt.drop_column("v")
    with pytest.raises(ValueError, match="physical"):
        vt.append(
            spark.createDataFrame([Row(k=4, v="NEW")], "k int, v string"),
            evolve=True,
        )
    # a different name evolves fine
    vt.append(
        spark.createDataFrame([Row(k=4, v2="NEW")], "k int, v2 string"),
        evolve=True,
    )
    got = _rows(vt.read(spark))
    assert (4, "NEW") in got and (1, None) in got


def test_rename_to_retired_physical_rejected(spark, vt):
    vt.rename_column("v", "label")
    # "v" is still the physical name under logical "label"
    vt2 = VersionedTable(vt.path)
    with pytest.raises(ValueError, match="physical name"):
        vt2.rename_column("k", "v")


def test_dropped_column_purged_by_optimize(spark, vt):
    vt.drop_column("v")
    vt.optimize(spark, target_rows_per_file=100, rewrite_all=True)
    import pyarrow.parquet as pq

    m = vt._manifest()
    cols = set()
    for f in m["files"]:
        cols |= set(pq.read_schema(os.path.join(vt.path, f)).names)
    assert cols == {"k"}  # bytes physically shed


def test_change_feed_empty_for_rename(spark, tmp_path):
    vt = VersionedTable(str(tmp_path / "t"), change_feed=True)
    vt.write_full(_mk(spark, [(1, "a")]))
    v = vt.rename_column("v", "label")
    assert not os.path.exists(vt._cdf_version_dir(v))
    # changes() across the rename is empty (physical identity)
    assert vt.changes(spark, 0, 1).count() == 0


def test_clone_carries_mapping(spark, vt, tmp_path):
    vt.rename_column("v", "label")
    dest = vt.clone(str(tmp_path / "c"), shallow=False)
    assert dest.read(spark).columns == ["k", "label"]
    assert _rows(dest.read(spark)) == [(1, "a"), (2, "b"), (3, "c")]


def test_mapping_with_deletion_vectors(spark, vt):
    vt.rename_column("v", "label")
    vt.delete_where(spark, "label = 'b'", mode="merge_on_read")
    assert _rows(vt.read(spark)) == [(1, "a"), (3, "c")]
    vt.optimize(spark, target_rows_per_file=100, purge_dvs=True)
    assert _rows(vt.read(spark)) == [(1, "a"), (3, "c")]


def test_sql_rename_and_drop(spark, tmp_path):
    from aws_lakehouse_project_spark.plans.lakehouse_sql import LakehouseSession

    lh = LakehouseSession(spark)
    lh.create("t", str(tmp_path / "t"))
    spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b")], "k int, v string"
    ).createOrReplaceTempView("seed")
    lh.sql("CREATE TABLE t AS SELECT * FROM seed")
    lh.sql("ALTER TABLE t RENAME COLUMN v TO label")
    assert lh.sql("SELECT label FROM t WHERE k = 1").first()["label"] == "a"
    lh.sql("ALTER TABLE t DROP COLUMN label")
    assert lh.sql("SELECT * FROM t").columns == ["k"]
