"""Deletion vectors: merge-on-read DELETE on VersionedTable.

Delta/Iceberg DV semantics re-derived on plain parquet: a delete
records (file, row-position) pairs in a churn-sized sidecar instead of
rewriting data files; readers anti-join the dead positions via
parquet's ``_metadata.row_index``. Reference behavior modeled:
Delta deletion vectors (delta.enableDeletionVectors) and
``REORG TABLE ... APPLY (PURGE)``; no reference code exists for this
(the reference delegates storage to Athena/S3 —
/root/reference/dbt/models at large)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row, functions as F

from aws_lakehouse_project_spark.plans.versioned import VersionedTable


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mk(spark, pairs):
    return spark.createDataFrame(
        [Row(k=k, v=v) for k, v in pairs], "k int, v string"
    )


@pytest.fixture()
def vt(tmp_path):
    return VersionedTable(str(tmp_path / "t"), stats_cols=["k"])


def _data_files(vt):
    """(rel_path, mtime_ns, size) of every data parquet — identity check
    that MoR deletes touch nothing."""
    out = []
    for dirpath, _d, names in os.walk(os.path.join(vt.path, "data")):
        for n in names:
            if n.endswith(".parquet") and "-dv" not in os.path.basename(dirpath):
                p = os.path.join(dirpath, n)
                st = os.stat(p)
                out.append((os.path.relpath(p, vt.path), st.st_mtime_ns, st.st_size))
    return sorted(out)


def test_mor_delete_correct_and_zero_rewrite(spark, vt):
    vt.write_full(_mk(spark, [(i, f"v{i}") for i in range(10)]))
    vt.append(_mk(spark, [(i, f"v{i}") for i in range(10, 20)]))
    before = _data_files(vt)
    v = vt.delete_where(spark, "k % 3 = 0", mode="merge_on_read")
    assert v == 2
    # no data file was added, removed, or modified
    assert _data_files(vt) == before
    assert _rows(vt.read(spark)) == [
        (i, f"v{i}") for i in range(20) if i % 3 != 0
    ]
    # manifest carries the DV map + exact per-file dead counts
    m = vt._manifest()
    assert set(m["dvs"]) <= set(m["files"])
    assert sum(m["dv_counts"].values()) == 7  # 0,3,6,9,12,15,18
    h = vt.history()[-1]
    assert h["op"] == "delete" and h["meta"]["mode"] == "merge_on_read"
    assert h["n_rows"] == 13 and h["n_dv_rows"] == 7


def test_mor_delete_null_predicate_keeps_rows(spark, vt):
    vt.write_full(
        spark.createDataFrame(
            [Row(k=1, v="a"), Row(k=None, v="b"), Row(k=2, v="c")],
            "k int, v string",
        )
    )
    vt.delete_where(spark, "k = 1", mode="merge_on_read")
    got = sorted((tuple(r) for r in vt.read(spark).collect()), key=str)
    assert got == [(2, "c"), (None, "b")]


def test_mor_delete_noop_no_version(spark, vt):
    vt.write_full(_mk(spark, [(1, "a")]))
    assert vt.delete_where(spark, "k = 99", mode="merge_on_read") == 0
    assert vt.latest_version() == 0


def test_second_mor_delete_folds_single_dv_per_file(spark, vt):
    vt.write_full(_mk(spark, [(i, "x") for i in range(10)]))
    vt.delete_where(spark, "k < 2", mode="merge_on_read")
    vt.delete_where(spark, "k >= 8", mode="merge_on_read")
    m = vt._manifest()
    # every file maps to exactly one dv dir (no chains to chase)
    assert all(isinstance(d, str) for d in m["dvs"].values())
    assert sum(m["dv_counts"].values()) == 4
    assert _rows(vt.read(spark)) == [(i, "x") for i in range(2, 8)]
    # a dead row can never re-match a later delete (positions exact)
    vt.delete_where(spark, "k < 5", mode="merge_on_read")
    assert sum(vt._manifest()["dv_counts"].values()) == 7
    assert _rows(vt.read(spark)) == [(i, "x") for i in range(5, 8)]


def test_mor_equals_cow_delete(spark, tmp_path):
    """Property: MoR and CoW deletes produce identical logical tables."""
    data = [(i, f"v{i % 4}") for i in range(50)]
    a = VersionedTable(str(tmp_path / "a"))
    b = VersionedTable(str(tmp_path / "b"))
    for t in (a, b):
        t.write_full(_mk(spark, data))
    a.delete_where(spark, "k % 7 = 2", mode="merge_on_read")
    b.delete_where(spark, "k % 7 = 2", mode="copy_on_write")
    assert _rows(a.read(spark)) == _rows(b.read(spark))


def test_time_travel_across_mor_delete(spark, vt):
    vt.write_full(_mk(spark, [(i, "x") for i in range(6)]))
    vt.delete_where(spark, "k < 3", mode="merge_on_read")
    assert _rows(vt.read(spark, 0)) == [(i, "x") for i in range(6)]
    assert _rows(vt.read(spark, 1)) == [(i, "x") for i in range(3, 6)]


def test_restore_undoes_mor_delete_and_feeds_inserts(spark, tmp_path):
    vt = VersionedTable(str(tmp_path / "t"), change_feed=True)
    vt.write_full(_mk(spark, [(i, "x") for i in range(4)]))
    vt.delete_where(spark, "k in (1, 2)", mode="merge_on_read")
    vt.restore(1 - 1, spark=spark)  # back to v0
    assert _rows(vt.read(spark)) == [(i, "x") for i in range(4)]
    # restore's feed reports the un-deleted rows as inserts
    feed = spark.read.parquet(vt._cdf_version_dir(2))
    assert sorted(
        (r["_change_type"], r["k"]) for r in feed.collect()
    ) == [("insert", 1), ("insert", 2)]


def test_mor_delete_change_feed_emits_deletes(spark, tmp_path):
    vt = VersionedTable(str(tmp_path / "t"), change_feed=True)
    vt.write_full(_mk(spark, [(i, "x") for i in range(5)]))
    vt.delete_where(spark, "k >= 3", mode="merge_on_read")
    feed = spark.read.parquet(vt._cdf_version_dir(1))
    assert sorted((r["_change_type"], r["k"]) for r in feed.collect()) == [
        ("delete", 3),
        ("delete", 4),
    ]


def test_cow_merge_on_dvd_file_does_not_resurrect(spark, vt):
    """A CoW MERGE rewriting a DV'd file must not bring dead rows back."""
    vt.write_full(_mk(spark, [(i, "old") for i in range(6)]).coalesce(1))
    vt.delete_where(spark, "k in (0, 5)", mode="merge_on_read")
    vt.merge_upsert(spark, _mk(spark, [(2, "NEW")]), keys=["k"])
    assert _rows(vt.read(spark)) == [
        (1, "old"),
        (2, "NEW"),
        (3, "old"),
        (4, "old"),
    ]
    # the rewrite shed the file's DV entry entirely
    assert vt._manifest().get("dvs", {}) == {}


def test_optimize_purges_dvs(spark, vt):
    vt.write_full(_mk(spark, [(i, "x") for i in range(20)]))
    vt.delete_where(spark, "k % 2 = 0", mode="merge_on_read")
    v = vt.optimize(spark, target_rows_per_file=100, purge_dvs=True)
    m = vt._manifest(v)
    assert m.get("dvs", {}) == {}
    assert _rows(vt.read(spark)) == [(i, "x") for i in range(20) if i % 2]
    # physical = logical now: dead rows dropped for good
    assert vt.history()[-1]["n_rows"] == 10


def test_scan_skipping_applies_dvs(spark, vt):
    vt.write_full(_mk(spark, [(i, "x") for i in range(10)]).repartition(2))
    vt.delete_where(spark, "k = 4", mode="merge_on_read")
    got = _rows(vt.scan(spark, "k", lo=2, hi=6))
    assert got == [(2, "x"), (3, "x"), (5, "x"), (6, "x")]


def test_vacuum_retains_live_dv_reclaims_dead(spark, vt):
    vt.write_full(_mk(spark, [(i, "x") for i in range(8)]))
    vt.delete_where(spark, "k < 2", mode="merge_on_read")
    vt.delete_where(spark, "k > 5", mode="merge_on_read")  # folds dv
    rep = vt.vacuum(retain_last=1, retain_recent_s=0.0)
    # v1's superseded dv dir is reclaimed; v2's survives and still reads
    assert rep["removed_versions"] == 2
    assert _rows(vt.read(spark)) == [(i, "x") for i in range(2, 6)]
    live_dirs = set(vt._manifest()["dvs"].values())
    assert all(os.path.isdir(os.path.join(vt.path, d)) for d in live_dirs)


def test_clone_carries_dvs(spark, tmp_path):
    src = VersionedTable(str(tmp_path / "src"))
    src.write_full(_mk(spark, [(i, "x") for i in range(10)]))
    src.delete_where(spark, "k in (2, 7)", mode="merge_on_read")
    for shallow in (True, False):
        dest = src.clone(str(tmp_path / f"c_{shallow}"), shallow=shallow)
        assert _rows(dest.read(spark)) == [
            (i, "x") for i in range(10) if i not in (2, 7)
        ]
        # the clone's DVs are its own: deleting in the clone never
        # touches the source
        dest.delete_where(spark, "k = 0", mode="merge_on_read")
        assert _rows(src.read(spark)) == [
            (i, "x") for i in range(10) if i not in (2, 7)
        ]


def test_mor_delete_rejects_unknown_mode(spark, vt):
    vt.write_full(_mk(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="unknown mode"):
        vt.delete_where(spark, "k = 1", mode="in_place")


def test_dv_read_plan_splits_clean_and_dirty(spark, vt):
    """Files without a DV take the join-free branch: the physical plan
    unions a plain scan with one anti-join over only the DV'd files."""
    vt.write_full(_mk(spark, [(i, "x") for i in range(10)]).repartition(2))
    # delete rows from exactly one of the two files
    one_file = vt._manifest()["files"][0]
    tagged = vt.read(spark).withColumn("__file", F.input_file_name())
    ks = [
        r["k"]
        for r in tagged.filter(F.col("__file").endswith(one_file)).collect()
    ]
    vt.delete_where(spark, F.col("k").isin(ks[:2]), mode="merge_on_read")
    m = vt._manifest()
    assert len(m["dvs"]) == 1  # only the one file carries a DV
    plan = vt.read(spark)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") >= 2  # clean branch + dirty branch
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def _two_file_mor_history(spark, vt):
    """File A holds k 0-9, file B holds k 10-19; delete #1 writes ONE dv
    dir covering BOTH files, delete #2 folds file A's positions into a
    fresh dir while the old dir stays live for file B (and still holds
    stale copies of file A's old positions)."""
    vt.write_full(_mk(spark, [(i, f"v{i}") for i in range(10)]).coalesce(1))
    vt.append(_mk(spark, [(i, f"v{i}") for i in range(10, 20)]).coalesce(1))
    v1 = vt.delete_where(spark, "k IN (1, 11)", mode="merge_on_read")
    v2 = vt.delete_where(spark, "k = 2", mode="merge_on_read")
    m1, m2 = vt._manifest(v1), vt._manifest(v2)
    assert len(set(m1["dvs"].values())) == 1  # one dir covers both files
    redirs = [f for f, d in m2["dvs"].items() if m1["dvs"][f] != d]
    assert len(redirs) == 1  # the fold re-dir'd file A only
    return v1, v2


def test_changes_after_partial_fold_no_phantom_deletes(spark, vt):
    """r8 ADVICE (high): a superseded dv dir repeats the folded file's
    old positions; the change feed must restrict each side to the
    (file, dir) pairs its manifest maps, or rows already dead at
    from_version re-emit as deletes."""
    v1, v2 = _two_file_mor_history(spark, vt)
    feed = vt.changes(spark, v1, v2)
    assert _rows(feed) == [("delete", 2, "v2")]


def test_fold_carries_positions_per_mapped_dir_only(spark, vt):
    """A third delete re-touching BOTH files must carry each file's
    prior positions from the dir its manifest maps — not every dir that
    ever mentioned the file name — or dv_counts overcount and the feed
    emits duplicate deletes."""
    _, v2 = _two_file_mor_history(spark, vt)
    v3 = vt.delete_where(spark, "k IN (3, 12)", mode="merge_on_read")
    m = vt._manifest(v3)
    assert sum(m["dv_counts"].values()) == 5  # 1,2,3 + 11,12 exactly
    assert sorted(m["dv_counts"].values()) == [2, 3]
    assert _rows(vt.read(spark)) == [
        (i, f"v{i}") for i in range(20) if i not in (1, 2, 3, 11, 12)
    ]
    assert _rows(vt.changes(spark, v2, v3)) == [
        ("delete", 3, "v3"), ("delete", 12, "v12")
    ]
