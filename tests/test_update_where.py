"""UPDATE ... SET ... WHERE on VersionedTable, both execution modes.

Delta UPDATE semantics re-derived on the manifest transaction layer:
copy-on-write rewrites only touched files; merge-on-read (Delta's
DV-based update) marks preimages dead in a deletion-vector sidecar and
appends postimages in the same atomic commit. No reference code exists
for this (the reference delegates mutation to Athena/dbt MERGE —
/root/reference/dbt/models/marts/fct_daily_store_metrics.sql:1-5)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row, functions as F

from aws_lakehouse_project_spark.plans.versioned import VersionedTable

MODES = ("copy_on_write", "merge_on_read")


def _rows(df):
    return sorted((tuple(r) for r in df.collect()), key=str)


def _mk(spark, triples):
    return spark.createDataFrame(
        [Row(k=k, grp=g, v=v) for k, g, v in triples],
        "k int, grp string, v double",
    )


@pytest.fixture()
def vt(tmp_path):
    return VersionedTable(str(tmp_path / "t"), stats_cols=["k"])


@pytest.mark.parametrize("mode", MODES)
def test_update_basic(spark, vt, mode):
    vt.write_full(_mk(spark, [(i, "a" if i < 3 else "b", float(i)) for i in range(6)]))
    v = vt.update_where(spark, "grp = 'a'", {"v": "v * 10"}, mode=mode)
    assert v == 1
    assert _rows(vt.read(spark)) == _rows(
        _mk(
            spark,
            [(i, "a", float(i) * 10) for i in range(3)]
            + [(i, "b", float(i)) for i in range(3, 6)],
        )
    )
    assert vt.history()[-1]["op"] == "update"
    # logical row count unchanged by an update in both modes
    assert vt.history()[-1]["n_rows"] == 6


@pytest.mark.parametrize("mode", MODES)
def test_update_evaluates_against_old_values(spark, vt, mode):
    """SET a = b, b = a must swap (standard UPDATE semantics)."""
    df = spark.createDataFrame([Row(a=1, b=2), Row(a=3, b=4)], "a int, b int")
    t = VersionedTable(vt.path + "_swap")
    t.write_full(df)
    t.update_where(spark, "a = 1", {"a": "b", "b": "a"}, mode=mode)
    assert _rows(t.read(spark)) == [(2, 1), (3, 4)]


@pytest.mark.parametrize("mode", MODES)
def test_update_null_predicate_untouched(spark, vt, mode):
    t = VersionedTable(vt.path + "_null")
    t.write_full(
        spark.createDataFrame(
            [Row(k=1, v="x"), Row(k=None, v="y")], "k int, v string"
        )
    )
    t.update_where(spark, "k < 5", {"v": "'HIT'"}, mode=mode)
    assert _rows(t.read(spark)) == sorted(
        [(1, "HIT"), (None, "y")], key=str
    )


@pytest.mark.parametrize("mode", MODES)
def test_update_noop_no_version(spark, vt, mode):
    vt.write_full(_mk(spark, [(1, "a", 1.0)]))
    assert vt.update_where(spark, "k = 99", {"v": "0.0"}, mode=mode) == 0
    assert vt.latest_version() == 0


def test_update_unknown_column_raises(spark, vt):
    vt.write_full(_mk(spark, [(1, "a", 1.0)]))
    with pytest.raises(ValueError, match="not in schema"):
        vt.update_where(spark, "k = 1", {"nope": "1"})
    with pytest.raises(ValueError, match="unknown mode"):
        vt.update_where(spark, "k = 1", {"v": "1"}, mode="in_place")


def test_update_casts_to_existing_type(spark, vt):
    vt.write_full(_mk(spark, [(1, "a", 1.0)]))
    vt.update_where(spark, "k = 1", {"v": "7"})  # int literal -> double col
    (row,) = vt.read(spark).collect()
    assert row["v"] == 7.0 and isinstance(row["v"], float)
    assert vt.read(spark).schema["v"].dataType.simpleString() == "double"


def test_cow_update_touches_only_matching_files(spark, vt):
    vt.write_full(_mk(spark, [(i, "a", float(i)) for i in range(8)]).repartition(4))
    m0 = vt._manifest()
    vt.update_where(spark, "k = 3", {"v": "-1.0"}, mode="copy_on_write")
    m1 = vt._manifest()
    carried = set(m0["files"]) & set(m1["files"])
    assert len(carried) >= 2  # most files carried by reference
    assert vt.history()[-1]["meta"]["touched_files"] < len(m0["files"])


def test_mor_update_zero_data_rewrite(spark, vt):
    vt.write_full(_mk(spark, [(i, "a", float(i)) for i in range(8)]).repartition(4))
    m0 = set(vt._manifest()["files"])

    def stat(rel):
        st = os.stat(os.path.join(vt.path, rel))
        return (st.st_mtime_ns, st.st_size)

    before = {f: stat(os.path.join(f, os.listdir(os.path.join(vt.path, f))[0]))
              if os.path.isdir(os.path.join(vt.path, f)) else stat(f)
              for f in m0}
    vt.update_where(spark, "k % 2 = 0", {"v": "v + 100"}, mode="merge_on_read")
    m1 = vt._manifest()
    # every original file carried BY REFERENCE, bytes untouched
    assert m0 <= set(m1["files"])
    for f in m0:
        cur = stat(os.path.join(f, os.listdir(os.path.join(vt.path, f))[0])) \
            if os.path.isdir(os.path.join(vt.path, f)) else stat(f)
        assert cur == before[f]
    # preimages dead, postimages appended
    assert sum(m1["dv_counts"].values()) == 4
    assert len(m1["files"]) > len(m0)


@pytest.mark.parametrize("mode", MODES)
def test_update_cdf_emits_update_pairs(spark, tmp_path, mode):
    vt = VersionedTable(str(tmp_path / f"cdf_{mode}"), change_feed=True)
    vt.write_full(_mk(spark, [(i, "a", float(i)) for i in range(4)]))
    vt.update_where(spark, "k in (1, 2)", {"v": "v * -1"}, mode=mode)
    feed = spark.read.parquet(vt._cdf_version_dir(1))
    got = sorted((r["_change_type"], r["k"], r["v"]) for r in feed.collect())
    assert got == [
        ("update_postimage", 1, -1.0),
        ("update_postimage", 2, -2.0),
        ("update_preimage", 1, 1.0),
        ("update_preimage", 2, 2.0),
    ]


@pytest.mark.parametrize("mode", MODES)
def test_time_travel_across_update(spark, vt, mode):
    t = VersionedTable(vt.path + f"_tt_{mode}")
    t.write_full(_mk(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    t.update_where(spark, "k = 1", {"v": "9.0"}, mode=mode)
    assert _rows(t.read(spark, 0)) == [(1, "a", 1.0), (2, "b", 2.0)]
    assert _rows(t.read(spark, 1)) == [(1, "a", 9.0), (2, "b", 2.0)]


def test_mor_update_then_optimize_purges(spark, vt):
    vt.write_full(_mk(spark, [(i, "a", float(i)) for i in range(10)]))
    vt.update_where(spark, "k < 5", {"v": "0.0"}, mode="merge_on_read")
    vt.optimize(spark, target_rows_per_file=100, purge_dvs=True)
    assert vt._manifest().get("dvs", {}) == {}
    assert _rows(vt.read(spark)) == _rows(
        _mk(spark, [(i, "a", 0.0 if i < 5 else float(i)) for i in range(10)])
    )


def test_update_modes_agree(spark, tmp_path):
    data = [(i, "g" + str(i % 3), float(i)) for i in range(40)]
    frames = []
    for mode in MODES:
        t = VersionedTable(str(tmp_path / mode))
        t.write_full(_mk(spark, data).repartition(3))
        t.update_where(spark, "k % 7 = 1", {"v": "v * 2", "grp": "'upd'"}, mode=mode)
        frames.append(_rows(t.read(spark)))
    assert frames[0] == frames[1]


def test_mor_update_after_mor_delete(spark, vt):
    """Update must not resurrect or re-match dead rows; the fold keeps
    one DV per file."""
    vt.write_full(_mk(spark, [(i, "a", float(i)) for i in range(6)]).coalesce(1))
    vt.delete_where(spark, "k in (0, 1)", mode="merge_on_read")
    vt.update_where(spark, "k < 4", {"v": "-1.0"}, mode="merge_on_read")
    assert _rows(vt.read(spark)) == [
        (2, "a", -1.0),
        (3, "a", -1.0),
        (4, "a", 4.0),
        (5, "a", 5.0),
    ]


@pytest.mark.parametrize("mode", MODES)
def test_concurrent_update_raises_on_stale_head(spark, tmp_path, mode):
    a = VersionedTable(str(tmp_path / "t"))
    a.write_full(_mk(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    b = VersionedTable(str(tmp_path / "t"))
    b.append(_mk(spark, [(3, "c", 3.0)]))
    # `a` computed nothing yet; update_where re-reads the head, so it
    # sees b's append and succeeds atomically on the new head
    a.update_where(spark, "k = 1", {"v": "9.0"}, mode=mode)
    assert (3, "c", 3.0) in _rows(a.read(spark))
