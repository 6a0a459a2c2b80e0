"""VersionedTable: atomic commits, time travel, file-granular CoW,
data skipping, optimize, vacuum, concurrency (plans/versioned.py)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row, functions as F

from aws_lakehouse_project_spark.plans.versioned import (
    ConcurrentWriteError,
    VacuumedVersionError,
    VersionedTable,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mk(spark, pairs):
    return spark.createDataFrame(
        [Row(k=k, v=v) for k, v in pairs], "k int, v string"
    )


@pytest.fixture()
def vt(tmp_path):
    return VersionedTable(str(tmp_path / "t"), stats_cols=["k"])


def test_create_read_roundtrip(spark, vt):
    v = vt.write_full(_mk(spark, [(1, "a"), (2, "b")]))
    assert v == 0
    assert _rows(vt.read(spark)) == [(1, "a"), (2, "b")]


def test_append_and_time_travel(spark, vt):
    vt.write_full(_mk(spark, [(1, "a")]))
    v1 = vt.append(_mk(spark, [(2, "b")]))
    assert v1 == 1
    assert _rows(vt.read(spark, version=0)) == [(1, "a")]
    assert _rows(vt.read(spark)) == [(1, "a"), (2, "b")]
    hist = vt.history()
    assert [h["op"] for h in hist] == ["overwrite", "append"]
    assert [h["n_rows"] for h in hist] == [1, 2]


def test_overwrite_keeps_old_snapshot(spark, vt):
    vt.write_full(_mk(spark, [(1, "a")]))
    vt.write_full(_mk(spark, [(9, "z")]))
    assert _rows(vt.read(spark, version=0)) == [(1, "a")]
    assert _rows(vt.read(spark)) == [(9, "z")]


def test_append_schema_mismatch_fails_fast(spark, vt):
    vt.write_full(_mk(spark, [(1, "a")]))
    other = spark.createDataFrame([Row(k=2, w="x")], "k int, w string")
    with pytest.raises(ValueError, match="schema mismatch"):
        vt.append(other)


def test_schema_evolution_append(spark, vt):
    vt.write_full(_mk(spark, [(1, "a")]))
    wide = spark.createDataFrame(
        [Row(k=2, v="b", extra=7)], "k int, v string, extra int"
    )
    vt.append(wide, evolve=True)
    got = vt.read(spark)
    assert set(got.columns) == {"k", "v", "extra"}
    assert _rows(got.select("k", "extra")) == [(1, None), (2, 7)]
    # pre-evolution snapshot still has the narrow schema
    assert set(vt.read(spark, version=0).columns) == {"k", "v"}


def test_merge_upsert_semantics(spark, vt):
    vt.write_full(_mk(spark, [(1, "a"), (2, "b"), (3, "c")]))
    vt.merge_upsert(spark, _mk(spark, [(2, "B!"), (4, "d")]), keys=["k"])
    assert _rows(vt.read(spark)) == [(1, "a"), (2, "B!"), (3, "c"), (4, "d")]


def test_merge_is_file_granular(spark, vt):
    # two disjoint key ranges land in separate commit dirs; an upsert
    # matching only the second must carry the first's files by reference
    vt.write_full(_mk(spark, [(1, "a"), (2, "b")]).coalesce(1))
    vt.append(_mk(spark, [(10, "x"), (11, "y")]).coalesce(1))
    before = set(vt._manifest()["files"])
    vt.merge_upsert(spark, _mk(spark, [(10, "X!")]), keys=["k"])
    after = vt._manifest()
    carried = before & set(after["files"])
    assert len(carried) == 1  # v0's file untouched, v1's rewritten
    assert after["meta"]["touched_files"] == 1
    assert _rows(vt.read(spark)) == [(1, "a"), (2, "b"), (10, "X!"), (11, "y")]


def test_delete_where(spark, vt):
    vt.write_full(_mk(spark, [(1, "a"), (2, "b"), (3, "c")]))
    v = vt.delete_where(spark, "k % 2 = 1")
    assert _rows(vt.read(spark)) == [(2, "b")]
    assert _rows(vt.read(spark, version=v - 1)) == [(1, "a"), (2, "b"), (3, "c")]
    # no-op delete creates no version
    assert vt.delete_where(spark, "k > 100") == v


def test_delete_null_predicate_keeps_row(spark, vt):
    df = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v=None)], "k int, v string"
    )
    vt.write_full(df)
    vt.delete_where(spark, F.col("v") == "a")  # NULL comparison -> keep
    assert _rows(vt.read(spark)) == [(2, None)]


def test_merge_apply_change_feed(spark, vt):
    vt.write_full(_mk(spark, [(1, "a"), (2, "b"), (3, "c")]))
    changes = spark.createDataFrame(
        [
            Row(k=1, v="A!", op="upsert"),
            Row(k=3, v="c", op="delete"),
            Row(k=4, v="d", op="upsert"),
        ],
        "k int, v string, op string",
    )
    vt.merge_apply(spark, changes, keys=["k"])
    assert _rows(vt.read(spark)) == [(1, "A!"), (2, "b"), (4, "d")]


def test_scan_prunes_files_by_stats(spark, vt):
    vt.write_full(_mk(spark, [(1, "a"), (2, "b")]).coalesce(1))
    vt.append(_mk(spark, [(100, "x"), (200, "y")]).coalesce(1))
    out = vt.scan(spark, "k", lo=1, hi=2)
    # the pruned plan reads exactly one file
    files = {r[0] for r in out.select(F.input_file_name()).distinct().collect()}
    assert len(files) == 1
    assert _rows(out) == [(1, "a"), (2, "b")]
    # residual row-level filter still applies inside a kept file
    assert _rows(vt.scan(spark, "k", lo=2, hi=2)) == [(2, "b")]


def test_optimize_bin_packs_small_files_only(spark, vt):
    for i in range(4):
        vt.append(_mk(spark, [(i, f"v{i}")]).coalesce(1))
    big = _mk(spark, [(j, "big") for j in range(100, 120)]).coalesce(1)
    vt.append(big)
    before = vt._manifest()
    content_before = _rows(vt.read(spark))
    v = vt.optimize(spark, target_rows_per_file=10)
    after = vt._manifest(v)
    assert after["op"] == "optimize"
    # the 20-row file carries over by reference; the 4 one-row files pack
    assert len(after["files"]) == 2
    assert len(set(before["files"]) & set(after["files"])) == 1
    assert _rows(vt.read(spark)) == content_before
    # idempotent: nothing left to pack
    assert vt.optimize(spark, target_rows_per_file=10) == v


def test_vacuum_reclaims_and_guards_time_travel(spark, vt):
    vt.write_full(_mk(spark, [(1, "a")]))
    vt.write_full(_mk(spark, [(2, "b")]))  # v0's file now unreferenced by head
    res = vt.vacuum(retain_last=1, retain_recent_s=0.0)
    assert res["removed_data_files"] >= 1
    assert res["removed_versions"] == 1
    assert _rows(vt.read(spark)) == [(2, "b")]
    with pytest.raises(VacuumedVersionError):
        vt.read(spark, version=0)


def test_vacuum_never_touches_retained_files(spark, vt):
    vt.write_full(_mk(spark, [(1, "a")]))
    vt.append(_mk(spark, [(2, "b")]))
    vt.vacuum(retain_last=2, retain_recent_s=0.0)  # both versions retained -> nothing to remove
    assert _rows(vt.read(spark, version=0)) == [(1, "a")]
    assert _rows(vt.read(spark)) == [(1, "a"), (2, "b")]


def test_concurrent_append_rebases(spark, vt):
    """Two writers race version 1: the loser's append must rebase onto
    the winner's manifest so no rows are lost."""
    vt.write_full(_mk(spark, [(1, "a")]))
    orig_claim = vt._claim_version
    raced = {"done": False}

    def racing_claim(manifest, parent=None):
        if not raced["done"] and manifest["op"] == "append":
            raced["done"] = True
            # competitor lands the same version number first
            other = VersionedTable(vt.path, stats_cols=["k"])
            other.append(_mk(spark, [(50, "w")]))
        return orig_claim(manifest, parent=parent)

    vt._claim_version = racing_claim
    try:
        vt.append(_mk(spark, [(2, "b")]))
    finally:
        vt._claim_version = orig_claim
    assert _rows(vt.read(spark)) == [(1, "a"), (2, "b"), (50, "w")]
    assert vt.latest_version() == 2


def test_concurrent_merge_rebases_over_append(spark, vt):
    """WriteSerializable: a CoW merge racing a plain append REBASES —
    the append did not touch the merge's files, so both commits land
    (r8 upgrade; the old all-or-nothing CAS raised here). Real
    conflicts still raise — covered by tests/test_occ.py."""
    vt.write_full(_mk(spark, [(1, "a")]))
    orig_claim = vt._claim_version
    raced = {"done": False}

    def racing_claim(manifest, parent=None):
        if not raced["done"] and manifest["op"] == "merge":
            raced["done"] = True
            VersionedTable(vt.path).append(_mk(spark, [(9, "z")]))
        return orig_claim(manifest, parent=parent)

    vt._claim_version = racing_claim
    try:
        vt.merge_upsert(spark, _mk(spark, [(1, "A!")]), keys=["k"])
    finally:
        vt._claim_version = orig_claim
    # BOTH effects present: the competitor's append and the merge
    assert _rows(vt.read(spark)) == [(1, "A!"), (9, "z")]
    assert vt.versions() == [0, 1, 2]


def test_failed_commit_leaves_table_readable(spark, vt):
    """A manifest claimed but never linked (crash before publish) is
    invisible: readers resolve the previous head."""
    vt.write_full(_mk(spark, [(1, "a")]))
    # simulate a crashed writer: data files exist, manifest doesn't
    df = _mk(spark, [(2, "b")])
    vt._write_commit_files(df, 99)
    assert _rows(vt.read(spark)) == [(1, "a")]
    assert vt.latest_version() == 0


def test_manifest_stats_recorded(spark, vt):
    vt.write_full(_mk(spark, [(5, "a"), (7, "b")]).coalesce(1))
    m = vt._manifest()
    (stats,) = m["stats"].values()
    assert stats["rows"] == 2
    assert stats["k"] == [5, 7]
    # manifests are valid standalone JSON on disk
    with open(vt._log_path(0)) as fh:
        assert json.load(fh)["version"] == 0


def test_empty_table_after_full_delete(spark, vt):
    vt.write_full(_mk(spark, [(1, "a")]))
    vt.delete_where(spark, "k = 1")
    got = vt.read(spark)
    assert got.count() == 0
    assert set(got.columns) == {"k", "v"}


def test_changes_append_is_pure_insert(spark, vt):
    vt.write_full(_mk(spark, [(1, "a")]))
    vt.append(_mk(spark, [(2, "b"), (3, "c")]))
    ch = _rows(vt.changes(spark, 0, 1))
    assert ch == [("insert", 2, "b"), ("insert", 3, "c")]


def test_changes_merge_emits_update_pair(spark, vt):
    vt.write_full(_mk(spark, [(1, "a"), (2, "b")]).repartition(2, "k"))
    vt.merge_upsert(spark, _mk(spark, [(2, "B"), (3, "c")]), keys=["k"])
    ch = _rows(vt.changes(spark, 0, 1))
    # the MERGE commit records merge_keys, so k=2's delete+insert pair
    # is tagged as Delta CDF's update pre/postimage; brand-new k=3 is a
    # plain insert; untouched k=1 cancels out
    assert ch == [
        ("insert", 3, "c"),
        ("update_postimage", 2, "B"),
        ("update_preimage", 2, "b"),
    ]


def test_changes_delete_and_optimize(spark, vt):
    vt.write_full(_mk(spark, [(1, "a"), (2, "b"), (3, "c")]).repartition(3, "k"))
    vt.delete_where(spark, "k = 2")
    v_opt = vt.optimize(spark, target_rows_per_file=10)
    assert _rows(vt.changes(spark, 0, 1)) == [("delete", 2, "b")]
    # OPTIMIZE is layout-only: empty change feed across it
    assert vt.changes(spark, 1, v_opt).count() == 0


def test_changes_reads_only_churned_files(spark, vt):
    """The feed's plan references only added/removed files, never the
    carried-by-reference majority."""
    vt.write_full(_mk(spark, [(i, "x") for i in range(8)]).repartition(8, "k"))
    vt.merge_upsert(spark, _mk(spark, [(0, "y")]), keys=["k"])
    m0, m1 = vt._manifest(0), vt._manifest(1)
    churn = set(m1["files"]) ^ set(m0["files"])
    carried = set(m0["files"]) & set(m1["files"])
    assert carried  # the test is vacuous unless most files were untouched
    scanned = {
        os.path.basename(f) for f in vt.changes(spark, 0, 1).inputFiles()
    }
    assert scanned == {os.path.basename(f) for f in churn}


def test_changes_duplicate_rows_multiset(spark, vt):
    """exceptAll semantics: going 2 copies -> 1 copy emits ONE delete."""
    vt.write_full(_mk(spark, [(1, "a"), (1, "a")]))
    vt.write_full(_mk(spark, [(1, "a")]))
    assert _rows(vt.changes(spark, 0, 1)) == [("delete", 1, "a")]


def test_changes_multiset_net_expands_multiplicity(spark, vt):
    """|net| > 1 re-expands: 3 copies -> 1 copy emits TWO deletes, and
    1 -> 3 emits TWO inserts (the r10 count-diff plan must reproduce
    exceptAll's multiset algebra exactly, not collapse to distinct)."""
    vt.write_full(_mk(spark, [(1, "a")] * 3 + [(2, "b")]))
    vt.write_full(_mk(spark, [(1, "a"), (2, "b")] + [(3, "c")] * 3))
    assert _rows(vt.changes(spark, 0, 1)) == [
        ("delete", 1, "a"),
        ("delete", 1, "a"),
        ("insert", 3, "c"),
        ("insert", 3, "c"),
        ("insert", 3, "c"),
    ]


def test_restore_is_metadata_only_and_roundtrips(spark, vt):
    vt.write_full(_mk(spark, [(1, "a"), (2, "b")]))
    vt.delete_where(spark, "k = 1")
    v2 = vt.restore(0)
    assert v2 == 2
    m0, m2 = vt._manifest(0), vt._manifest(v2)
    # metadata-only contract: the restored manifest references the SAME
    # file set — no data rewritten. List ORDER is canonical
    # parent-relative (r9): it must match what _apply_delta reconstructs
    # from the claimed action delta, so it follows the current head's
    # retained order, not the restored-to version's.
    assert set(m2["files"]) == set(m0["files"])
    assert m2["stats"] == {f: m0["stats"][f] for f in m0["stats"]}
    assert m2["op"] == "restore" and m2["meta"]["restored_version"] == 0
    assert _rows(vt.read(spark)) == [(1, "a"), (2, "b")]
    # the rolled-back version remains time-travelable
    assert _rows(vt.read(spark, version=1)) == [(2, "b")]
    # and the restore itself shows in the change feed as re-inserts
    assert _rows(vt.changes(spark, 1, v2)) == [("insert", 1, "a")]


def test_restore_after_vacuum_raises(spark, vt):
    vt.write_full(_mk(spark, [(1, "a")]))
    vt.write_full(_mk(spark, [(2, "b")]))
    vt.vacuum(retain_last=1, retain_recent_s=0.0)
    with pytest.raises(VacuumedVersionError):
        vt.restore(0)


# -- change-data feed (materialized CDF + streaming source) -----------------


@pytest.fixture()
def cdf_vt(tmp_path):
    return VersionedTable(str(tmp_path / "t"), stats_cols=["k"], change_feed=True)


def _feed(spark, vt, version=None):
    import os as _os

    root = _os.path.join(vt.path, "_change_data")
    df = (
        spark.read.option("basePath", root)
        .schema(vt.changes_schema())
        .parquet(root)
    )
    if version is not None:
        df = df.filter(F.col("_commit_version") == version)
    return df


def test_cdf_materializes_per_commit(spark, cdf_vt):
    vt = cdf_vt
    vt.write_full(_mk(spark, [(1, "a"), (2, "b")]))
    vt.merge_upsert(spark, _mk(spark, [(1, "A"), (3, "c")]), keys=["k"])
    vt.delete_where(spark, "k = 2")
    # v0 feed: initial snapshot as inserts
    assert _rows(_feed(spark, vt, 0).drop("_commit_version")) == [
        ("insert", 1, "a"),
        ("insert", 2, "b"),
    ]
    # v1 feed: the update pair + the new-key insert == changes(0, 1)
    assert _rows(_feed(spark, vt, 1).drop("_commit_version")) == _rows(
        vt.changes(spark, 0, 1)
    )
    # v2 feed: one delete
    assert _rows(_feed(spark, vt, 2).drop("_commit_version")) == [
        ("delete", 2, "b")
    ]


def test_cdf_optimize_writes_nothing(spark, cdf_vt):
    vt = cdf_vt
    vt.write_full(_mk(spark, [(1, "a")]).repartition(4))
    v = vt.optimize(spark, target_rows_per_file=100)
    assert not os.path.isdir(vt._cdf_version_dir(v))
    # but the stream schema/read over the remaining feed still works
    assert _feed(spark, vt).count() == 1


def test_cdf_restore_requires_spark(spark, cdf_vt):
    vt = cdf_vt
    vt.write_full(_mk(spark, [(1, "a")]))
    vt.delete_where(spark, "k = 1")
    with pytest.raises(ValueError, match="change_feed"):
        vt.restore(0)
    v = vt.restore(0, spark=spark)
    assert _rows(_feed(spark, vt, v).drop("_commit_version")) == [
        ("insert", 1, "a")
    ]


def test_cdf_materialize_is_idempotent(spark, cdf_vt):
    vt = cdf_vt
    vt.write_full(_mk(spark, [(1, "a"), (2, "b")]))
    before = _rows(_feed(spark, vt, 0))
    # crash-repair path: re-materializing the same version overwrites
    # in place, never duplicates
    vt.materialize_changes(spark, 0)
    assert _rows(_feed(spark, vt, 0)) == before


def test_cdf_replay_reconstructs_head(spark, cdf_vt):
    """Applying the feed in commit order (last change per key wins;
    keys whose final change is a delete are absent) rebuilds the head
    snapshot exactly — the consumer-side contract of a CDC feed."""
    from pyspark.sql import Window

    vt = cdf_vt
    vt.write_full(_mk(spark, [(1, "a"), (2, "b"), (3, "c")]))
    vt.merge_upsert(spark, _mk(spark, [(2, "B"), (4, "d")]), keys=["k"])
    vt.delete_where(spark, "k = 1")
    feed = _feed(spark, vt)
    post = F.col("_change_type").isin("insert", "update_postimage")
    w = Window.partitionBy("k").orderBy(
        F.desc("_commit_version"),
        # within a commit the postimage must win the tie over its
        # paired preimage
        F.when(post, 1).otherwise(0).desc(),
    )
    head = (
        feed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter(post)
        .select("k", "v")
    )
    assert _rows(head) == _rows(vt.read(spark))


def test_cdf_vacuum_reclaims_expired_feed(spark, cdf_vt):
    vt = cdf_vt
    vt.write_full(_mk(spark, [(1, "a")]))
    vt.write_full(_mk(spark, [(2, "b")]))
    vt.write_full(_mk(spark, [(3, "c")]))
    res = vt.vacuum(retain_last=1, retain_recent_s=0.0)
    assert res["removed_change_feeds"] == 2
    assert not os.path.isdir(vt._cdf_version_dir(0))
    assert os.path.isdir(vt._cdf_version_dir(2))


def test_stream_changes_requires_change_feed(spark, vt):
    vt.write_full(_mk(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="change_feed=True"):
        vt.stream_changes(spark)


def test_stream_changes_incremental_exactly_once(spark, cdf_vt, tmp_path):
    """The streaming CDC source delivers every commit's rows exactly
    once across separate availableNow runs sharing a checkpoint."""
    vt = cdf_vt
    vt.write_full(_mk(spark, [(1, "a"), (2, "b")]))
    vt.merge_upsert(spark, _mk(spark, [(1, "A")]), keys=["k"])
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            vt.stream_changes(spark)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    got1 = _rows(spark.read.parquet(sink))
    assert got1 == _rows(_feed(spark, vt))
    # a later commit arrives incrementally: second run appends ONLY it
    vt.delete_where(spark, "k = 2")
    run_once()
    got2 = _rows(spark.read.parquet(sink))
    assert got2 == _rows(_feed(spark, vt))
    assert len(got2) == len(got1) + 1


# -- CLONE (shallow/deep) + startingVersion ---------------------------------


def test_shallow_clone_is_metadata_only(spark, vt, tmp_path):
    vt.write_full(_mk(spark, [(1, "a"), (2, "b")]))
    cl = vt.clone(str(tmp_path / "cl"))
    # zero data files under the clone; reads resolve to the source's
    data_root = os.path.join(cl.path, "data")
    owned = [
        f for _, _, fs in os.walk(data_root) for f in fs if f.endswith(".parquet")
    ]
    assert owned == []
    assert _rows(cl.read(spark)) == _rows(vt.read(spark))
    m = cl._manifest(0)
    assert m["op"] == "clone" and m["meta"]["shallow"] is True
    assert m["meta"]["source_version"] == 0
    assert all(os.path.isabs(f) for f in m["files"])


def test_shallow_clone_evolves_independently(spark, vt, tmp_path):
    vt.write_full(_mk(spark, [(i, "x") for i in range(8)]).repartition(8, "k"))
    cl = vt.clone(str(tmp_path / "cl"))
    src_before = _rows(vt.read(spark))
    cl.merge_upsert(spark, _mk(spark, [(0, "CLONE")]), keys=["k"])
    # clone sees the change, source is untouched
    assert ("CLONE" in {v for _, v in _rows(cl.read(spark))})
    assert _rows(vt.read(spark)) == src_before
    # CoW stays file-granular across the borrow boundary: most borrowed
    # files carry by reference, only touched ones were rewritten locally
    m1 = cl._manifest(1)
    borrowed = [f for f in m1["files"] if os.path.isabs(f)]
    local = [f for f in m1["files"] if not os.path.isabs(f)]
    assert borrowed and local


def test_clone_vacuum_never_reclaims_source_files(spark, vt, tmp_path):
    vt.write_full(_mk(spark, [(1, "a"), (2, "b")]))
    cl = vt.clone(str(tmp_path / "cl"))
    cl.write_full(_mk(spark, [(9, "z")]))  # clone v1 drops the borrow
    cl.vacuum(retain_last=1, retain_recent_s=0.0)
    # source data intact and readable
    assert _rows(vt.read(spark)) == [(1, "a"), (2, "b")]
    assert _rows(cl.read(spark)) == [(9, "z")]


def test_clone_time_travel_pins_source_version(spark, vt, tmp_path):
    vt.write_full(_mk(spark, [(1, "a")]))
    vt.append(_mk(spark, [(2, "b")]))
    cl = vt.clone(str(tmp_path / "cl"), version=0)
    assert _rows(cl.read(spark)) == [(1, "a")]


def test_deep_clone_is_independent_of_source(spark, vt, tmp_path):
    vt.write_full(_mk(spark, [(1, "a"), (2, "b")]))
    cl = vt.clone(str(tmp_path / "cl"), shallow=False)
    assert _rows(cl.read(spark)) == [(1, "a"), (2, "b")]
    m = cl._manifest(0)
    assert all(not os.path.isabs(f) for f in m["files"])
    # stats carried: data skipping works on the clone immediately
    assert all(cl._manifest(0)["stats"][f]["rows"] >= 0 for f in m["files"])
    # source vacuum/delete cannot affect a deep clone
    vt.write_full(_mk(spark, [(9, "z")]))
    vt.vacuum(retain_last=1, retain_recent_s=0.0)
    assert _rows(cl.read(spark)) == [(1, "a"), (2, "b")]


def test_clone_refuses_existing_destination(spark, vt, tmp_path):
    vt.write_full(_mk(spark, [(1, "a")]))
    vt.clone(str(tmp_path / "cl"))
    with pytest.raises(ValueError, match="already has a table"):
        vt.clone(str(tmp_path / "cl"))


def test_stream_changes_starting_version(spark, cdf_vt, tmp_path):
    vt = cdf_vt
    vt.write_full(_mk(spark, [(1, "a"), (2, "b")]))
    vt.merge_upsert(spark, _mk(spark, [(1, "A")]), keys=["k"])
    vt.delete_where(spark, "k = 2")
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    q = (
        vt.stream_changes(spark, starting_version=1)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.schema(vt.changes_schema()).parquet(sink)
    assert {r["_commit_version"] for r in got.select("_commit_version").collect()} == {1, 2}


# -- CHECK constraints + write-audit-publish --------------------------------


def test_add_constraint_rejects_existing_violations(spark, vt):
    from aws_lakehouse_project_spark.plans.versioned import (
        ConstraintViolationError,
    )

    vt.write_full(_mk(spark, [(1, "a"), (-5, "bad")]))
    with pytest.raises(ConstraintViolationError, match="1 existing row"):
        vt.add_constraint(spark, "k_nonneg", "k >= 0")
    assert vt.latest_version() == 0  # nothing committed


def test_constraint_enforced_on_every_write_path(spark, vt):
    from aws_lakehouse_project_spark.plans.versioned import (
        ConstraintViolationError,
    )

    vt.write_full(_mk(spark, [(1, "a"), (2, "b")]))
    v1 = vt.add_constraint(spark, "k_nonneg", "k >= 0")
    assert vt._manifest(v1)["op"] == "set_constraint"
    head = _rows(vt.read(spark))
    # append, merge, and overwrite all reject; head never moves
    with pytest.raises(ConstraintViolationError, match="k_nonneg"):
        vt.append(_mk(spark, [(-1, "x")]))
    with pytest.raises(ConstraintViolationError, match="k_nonneg"):
        vt.merge_upsert(spark, _mk(spark, [(2, "B"), (-9, "x")]), keys=["k"])
    with pytest.raises(ConstraintViolationError, match="k_nonneg"):
        vt.write_full(_mk(spark, [(-2, "x")]))
    assert vt.latest_version() == v1
    assert _rows(vt.read(spark)) == head
    # no orphaned data files from the aborted writes
    m = vt._manifest()
    on_disk = {
        os.path.join("data", d, f)
        for d in os.listdir(os.path.join(vt.path, "data"))
        for f in os.listdir(os.path.join(vt.path, "data", d))
        if f.endswith(".parquet")
    }
    assert on_disk == set(m["files"])
    # a clean write passes, and NULL passes (SQL CHECK semantics)
    vt.append(
        spark.createDataFrame([(None, "n")], "k int, v string")
    )
    assert vt.latest_version() == v1 + 1


def test_drop_constraint_reopens_the_gate(spark, vt):
    vt.write_full(_mk(spark, [(1, "a")]))
    vt.add_constraint(spark, "k_nonneg", "k >= 0")
    vt.drop_constraint("k_nonneg")
    vt.append(_mk(spark, [(-1, "x")]))  # no longer rejected
    assert (-1, "x") in _rows(vt.read(spark))
    with pytest.raises(ValueError, match="no constraint"):
        vt.drop_constraint("k_nonneg")


def test_constraints_survive_clone(spark, vt, tmp_path):
    from aws_lakehouse_project_spark.plans.versioned import (
        ConstraintViolationError,
    )

    vt.write_full(_mk(spark, [(1, "a")]))
    vt.add_constraint(spark, "k_nonneg", "k >= 0")
    cl = vt.clone(str(tmp_path / "cl"))
    with pytest.raises(ConstraintViolationError):
        cl.append(_mk(spark, [(-1, "x")]))


def test_wap_publishes_only_after_audits_pass(spark, vt):
    vt.write_full(_mk(spark, [(1, "a")]))

    def audit_rows(df):
        if df.count() < 2:
            raise ValueError("audit: too few rows")

    v = vt.write_audit_publish(
        spark, _mk(spark, [(1, "a"), (2, "b")]), audits=[audit_rows]
    )
    assert vt._manifest(v)["op"] == "wap_overwrite"
    assert _rows(vt.read(spark)) == [(1, "a"), (2, "b")]


def test_wap_failed_audit_leaves_no_trace(spark, vt):
    vt.write_full(_mk(spark, [(1, "a")]))
    head = vt.latest_version()

    def audit_fail(df):
        raise ValueError("audit: nope")

    with pytest.raises(ValueError, match="audit: nope"):
        vt.write_audit_publish(spark, _mk(spark, [(9, "z")]), audits=[audit_fail])
    assert vt.latest_version() == head
    assert _rows(vt.read(spark)) == [(1, "a")]
    # the staged files were deleted, not orphaned
    m = vt._manifest()
    on_disk = {
        os.path.join("data", d, f)
        for d in os.listdir(os.path.join(vt.path, "data"))
        for f in os.listdir(os.path.join(vt.path, "data", d))
        if f.endswith(".parquet")
    }
    assert on_disk == set(m["files"])


def test_wap_append_mode_and_expectation_suite(spark, vt):
    from aws_lakehouse_project_spark.quality.expectations import (
        Expectation,
        validate,
    )

    vt.write_full(_mk(spark, [(1, "a")]))
    suite = [Expectation("expect_column_values_to_not_be_null", {"column": "v"})]
    v = vt.write_audit_publish(
        spark,
        _mk(spark, [(2, "b")]),
        audits=[lambda df: validate(df, suite, name="wap")],
        mode="append",
    )
    assert vt._manifest(v)["op"] == "wap_append"
    assert _rows(vt.read(spark)) == [(1, "a"), (2, "b")]


# -- CDF-driven replication -------------------------------------------------


def test_apply_changes_nets_multi_commit_batches(spark, cdf_vt, tmp_path):
    from aws_lakehouse_project_spark.plans.versioned import (
        VersionedTable,
        apply_changes,
    )

    src = cdf_vt
    src.write_full(_mk(spark, [(1, "a"), (2, "b"), (3, "c")]))
    src.merge_upsert(spark, _mk(spark, [(2, "B"), (4, "d")]), keys=["k"])
    src.delete_where(spark, "k = 1")
    feed = _feed(spark, src)  # all three commits in ONE batch
    dst = VersionedTable(str(tmp_path / "dst"))
    v = apply_changes(spark, dst, feed, keys=["k"])
    assert v == 0  # one atomic commit
    assert _rows(dst.read(spark)) == _rows(src.read(spark))


def test_apply_changes_empty_batch_is_noop(spark, vt, tmp_path):
    from aws_lakehouse_project_spark.plans.versioned import apply_changes

    vt.write_full(_mk(spark, [(1, "a")]))
    empty = spark.createDataFrame(
        [], "_change_type string, k int, v string, _commit_version long"
    )
    assert apply_changes(spark, vt, empty, keys=["k"]) is None
    assert vt.latest_version() == 0


def test_replicate_streams_source_into_dest_incrementally(
    spark, cdf_vt, tmp_path
):
    from aws_lakehouse_project_spark.plans.versioned import (
        VersionedTable,
        replicate,
    )

    src = cdf_vt
    src.write_full(_mk(spark, [(1, "a"), (2, "b")]))
    src.merge_upsert(spark, _mk(spark, [(1, "A"), (3, "c")]), keys=["k"])
    dst = VersionedTable(str(tmp_path / "dst"))
    ckpt = str(tmp_path / "ckpt")

    q = replicate(spark, src, dst, keys=["k"], checkpoint_dir=ckpt)
    q.awaitTermination(120)
    assert _rows(dst.read(spark)) == _rows(src.read(spark))

    # later source commits: a re-run with the SAME checkpoint applies
    # only the new feed (exactly-once), and the replica converges again
    src.delete_where(spark, "k = 2")
    src.merge_upsert(spark, _mk(spark, [(5, "e")]), keys=["k"])
    v_before = dst.latest_version()
    q2 = replicate(spark, src, dst, keys=["k"], checkpoint_dir=ckpt)
    q2.awaitTermination(120)
    assert _rows(dst.read(spark)) == _rows(src.read(spark))
    assert dst.latest_version() > v_before
    # replaying an already-drained feed commits nothing (no empty-batch
    # churn on the replica)
    v_stable = dst.latest_version()
    q3 = replicate(spark, src, dst, keys=["k"], checkpoint_dir=ckpt)
    q3.awaitTermination(120)
    assert dst.latest_version() == v_stable


# -- review-pass regressions (constraint/CDF edge cases) --------------------


def test_restore_revalidates_against_active_constraints(spark, vt):
    from aws_lakehouse_project_spark.plans.versioned import (
        ConstraintViolationError,
    )

    vt.write_full(_mk(spark, [(-5, "bad"), (1, "a")]))  # v0: dirty
    vt.delete_where(spark, "k < 0")  # v1: clean
    vt.add_constraint(spark, "k_nonneg", "k >= 0")  # v2: passes (head clean)
    with pytest.raises(ConstraintViolationError, match="restore"):
        vt.restore(0, spark=spark)
    # constraints active but no spark: must refuse, not silently skip
    with pytest.raises(ValueError, match="re-validate"):
        vt.restore(1)
    v = vt.restore(1, spark=spark)  # clean target restores fine
    assert vt._manifest(v)["op"] == "restore"


def test_constraint_added_concurrently_with_write_fails_loudly(spark, vt):
    from aws_lakehouse_project_spark.plans.versioned import (
        ConcurrentWriteError,
    )

    vt.write_full(_mk(spark, [(1, "a")]))
    # simulate: writer validates its files (no constraints yet), then a
    # concurrent ALTER TABLE ADD CONSTRAINT lands before its commit
    files, stats = vt._write_commit_files(_mk(spark, [(-1, "x")]), 99)
    vt.add_constraint(spark, "k_nonneg", "k >= 0")
    cur = vt._manifest()
    with pytest.raises(ConcurrentWriteError, match="constraints changed"):
        vt._commit(
            "append",
            cur["files"] + files,
            {**cur["stats"], **stats},
            cur["schema"],
            retry_append_files=files,
        )
    # the unvalidated data was never published
    assert (-1, "x") not in _rows(vt.read(spark))


def test_constraint_on_missing_column_cleans_up_stage(spark, vt):
    vt.write_full(_mk(spark, [(1, "a")]))
    vt.add_constraint(spark, "k_nonneg", "k >= 0")
    other = spark.createDataFrame([(1,)], "z int")
    with pytest.raises(Exception):
        vt.write_full(other)  # constraint can't resolve on this frame
    # no orphaned commit directory was left behind
    m = vt._manifest()
    on_disk = {
        os.path.join("data", d, f)
        for d in os.listdir(os.path.join(vt.path, "data"))
        for f in os.listdir(os.path.join(vt.path, "data", d))
        if f.endswith(".parquet")
    }
    assert on_disk == set(m["files"])


def test_stream_changes_refuses_feedless_versions(spark, vt, tmp_path):
    # commits made with change_feed=False have no feed; a later
    # change_feed=True handle must fail loudly, then work after backfill
    from aws_lakehouse_project_spark.plans.versioned import VersionedTable

    vt.write_full(_mk(spark, [(1, "a")]))
    vt2 = VersionedTable(vt.path, change_feed=True)
    with pytest.raises(ValueError, match="no materialized change feed"):
        vt2.stream_changes(spark)
    vt2.materialize_changes(spark, 0)
    assert vt2.stream_changes(spark) is not None  # guard satisfied


def test_clone_with_change_feed_streams_after_backfill(spark, vt, tmp_path):
    from aws_lakehouse_project_spark.plans.versioned import VersionedTable

    vt.write_full(_mk(spark, [(1, "a"), (2, "b")]))
    cl = vt.clone(str(tmp_path / "cl"), change_feed=True)
    with pytest.raises(ValueError, match="no materialized change feed"):
        cl.stream_changes(spark)
    # explicit backfill (reads the snapshot once — the caller opts into
    # that cost) or starting_version past the clone commit both work
    assert cl.stream_changes(spark, starting_version=1) is not None
    cl.materialize_changes(spark, 0)
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    q = (
        cl.stream_changes(spark)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.schema(cl.changes_schema()).parquet(sink)
    assert got.count() == 2  # the cloned snapshot arrived as inserts


def test_wap_generator_audits_counted(spark, vt):
    vt.write_full(_mk(spark, [(1, "a")]))
    ran = []
    auds = (a for a in [lambda df: ran.append(1), lambda df: ran.append(2)])
    v = vt.write_audit_publish(spark, _mk(spark, [(2, "b")]), audits=auds)
    assert ran == [1, 2]
    assert vt._manifest(v)["meta"]["audits"] == 2


def test_optimize_rewrite_all_reclusters_full_sized_files(spark, vt):
    # two full-sized but badly-clustered files: incremental optimize
    # carries them; rewrite_all (ZORDER semantics) rewrites both
    vt.write_full(
        _mk(spark, [(i, "x") for i in range(100)]).repartition(2)
    )
    m0 = vt._manifest()
    v_inc = vt.optimize(spark, target_rows_per_file=10)
    assert v_inc == 0  # nothing under target -> no-op, no new version
    v1 = vt.optimize(
        spark, target_rows_per_file=50, sort_within=["k"], rewrite_all=True
    )
    m1 = vt._manifest(v1)
    assert not set(m0["files"]) & set(m1["files"])  # every file rewritten
    # range layout restored: per-file k-ranges are disjoint
    spans = sorted(m1["stats"][f]["k"] for f in m1["files"])
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2
    assert _rows(vt.read(spark)) == _rows(vt.read(spark, version=0))


def test_vacuum_dry_run_reports_without_deleting(spark, vt):
    vt.write_full(_mk(spark, [(1, "a")]))
    vt.write_full(_mk(spark, [(2, "b")]))
    dry = vt.vacuum(retain_last=1, dry_run=True, retain_recent_s=0.0)
    assert dry["dry_run"] is True
    assert dry["removed_versions"] == 1 and dry["removed_data_files"] >= 1
    assert all(f.startswith("data") for f in dry["removed_files"])
    # nothing actually touched: old snapshot still readable
    assert _rows(vt.read(spark, version=0)) == [(1, "a")]
    # the real vacuum removes exactly what the dry run reported
    real = vt.vacuum(retain_last=1, retain_recent_s=0.0)
    assert real["removed_files"] == dry["removed_files"]
    with pytest.raises(VacuumedVersionError):
        vt.read(spark, version=0)


def test_concurrent_append_stress_many_writers(spark, vt):
    """8 threads x 3 appends race on one table: the os.link CAS must
    serialize every commit (no lost updates, no duplicate versions) and
    the final head must contain every appended row exactly once."""
    import threading

    vt.write_full(_mk(spark, [(-1, "base")]))
    errors = []

    def writer(tid: int) -> None:
        try:
            for j in range(3):
                k = 100 * tid + j
                vt.append(_mk(spark, [(k, f"w{tid}_{j}")]))
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(t,)) for t in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []
    rows = _rows(vt.read(spark))
    assert len(rows) == 1 + 8 * 3
    assert len(set(rows)) == len(rows)  # no duplicates
    vs = vt.versions()
    assert vs == sorted(set(vs))  # dense, unique version chain
    # history row counts are strictly increasing (each append landed)
    counts = [h["n_rows"] for h in vt.history()]
    assert counts == sorted(counts) and counts[-1] == 25


def test_cow_commit_rejects_any_intervening_commit(spark, vt):
    """expected_head optimistic concurrency: a CoW commit whose snapshot
    predates ANY later commit must raise, even though its version-number
    claim would succeed — without this the competitor's commit would be
    silently clobbered."""
    vt.write_full(_mk(spark, [(1, "a")]))
    m = vt._manifest()  # CoW op reads its snapshot at v0...
    vt.append(_mk(spark, [(2, "b")]))  # ...competitor lands v1
    with pytest.raises(ConcurrentWriteError, match="snapshot read at version 0"):
        vt._commit(
            "merge", m["files"], m["stats"], m["schema"], expected_head=0
        )
    assert _rows(vt.read(spark)) == [(1, "a"), (2, "b")]  # nothing lost


def test_replicate_surfaces_replica_constraint_violation(spark, cdf_vt, tmp_path):
    """Composition: a replica with its own CHECK constraint must fail
    the replication stream LOUDLY when the source feed carries a
    violating row — never publish it, never drop it silently."""
    from aws_lakehouse_project_spark.plans.versioned import (
        VersionedTable,
        replicate,
    )

    src = cdf_vt
    src.write_full(_mk(spark, [(1, "a")]))
    dst = VersionedTable(str(tmp_path / "dst"))
    dst.write_full(_mk(spark, [(1, "a")]))
    dst.add_constraint(spark, "k_nonneg", "k >= 0")
    src.append(_mk(spark, [(-7, "bad")]))  # violates the REPLICA's rule
    q = replicate(
        spark, src, dst, keys=["k"], checkpoint_dir=str(tmp_path / "ckpt")
    )
    with pytest.raises(Exception, match="k_nonneg"):
        q.awaitTermination(120)
        raise AssertionError("replication published a constraint violation")
    assert (-7, "bad") not in _rows(dst.read(spark))


# -- round-8 regressions: commit-boundary replication + CDF vocabulary ------


def test_apply_changes_watermark_rejects_split_commit(spark, cdf_vt, tmp_path):
    """The scale failure mode a naive CDC fold has: one commit's update
    pair split across micro-batches (postimage folded first, preimage
    arriving later) must NOT net the late preimage into a bare delete.
    The replication watermark drops rows of already-folded versions, so
    the replica keeps the live row."""
    from aws_lakehouse_project_spark.plans.versioned import (
        VersionedTable,
        apply_changes,
    )

    src = cdf_vt
    src.write_full(_mk(spark, [(1, "a"), (2, "b")]))
    src.merge_upsert(spark, _mk(spark, [(1, "A")]), keys=["k"])
    dst = VersionedTable(str(tmp_path / "dst"))
    apply_changes(spark, dst, _feed(spark, src), keys=["k"])
    assert _rows(dst.read(spark)) == _rows(src.read(spark))
    # split / duplicated re-delivery of version 1's preimage alone
    late = _feed(spark, src, 1).filter("_change_type = 'update_preimage'")
    assert late.count() == 1  # the scenario is vacuous without it
    assert apply_changes(spark, dst, late, keys=["k"]) is None
    assert _rows(dst.read(spark)) == _rows(src.read(spark))


def test_merge_apply_delete_only_missing_table_is_noop(spark, tmp_path):
    """A delete-only feed against a not-yet-created replica (e.g.
    replication starting past the initial load) must not publish an
    empty version-0 overwrite."""
    dst = VersionedTable(str(tmp_path / "dst"))
    ch = spark.createDataFrame(
        [Row(op="delete", k=1, v="a")], "op string, k int, v string"
    )
    assert dst.merge_apply(spark, ch, keys=["k"]) is None
    assert not dst.exists()


def test_to_rel_rejects_foreign_absolute_path(spark, vt, tmp_path):
    """Out-of-root files fail loudly unless the manifest already
    borrows them by absolute path (shallow clones)."""
    vt.write_full(_mk(spark, [(1, "a")]))
    foreign = str(tmp_path / "elsewhere" / "x.parquet")
    with pytest.raises(ValueError, match="outside table root"):
        vt._to_rel("file://" + foreign)
    assert vt._to_rel("file://" + foreign, frozenset([foreign])) == foreign


def test_cdf_feed_is_single_file_per_version(spark, cdf_vt):
    """One parquet file per version: a file-stream micro-batch can then
    never split a commit (files are batch-atomic in the source)."""
    vt = cdf_vt
    vt.write_full(_mk(spark, [(i, "x") for i in range(20)]).repartition(8))
    vt.merge_upsert(
        spark, _mk(spark, [(1, "y"), (2, "y")]).repartition(4), keys=["k"]
    )
    for v in (0, 1):
        files = [
            n
            for n in os.listdir(vt._cdf_version_dir(v))
            if n.endswith(".parquet")
        ]
        assert len(files) == 1, (v, files)


def test_replicate_poll_timeout_fails_batch_then_recovers(
    spark, cdf_vt, tmp_path
):
    """A feed version missing its _SUCCESS marker fails the micro-batch
    after the (configurable) poll budget — never silently skips the
    commit — and restarting the stream with the SAME checkpoint after
    the marker lands replays the batch to convergence (the documented
    recovery contract)."""
    from aws_lakehouse_project_spark.plans.versioned import (
        VersionedTable,
        replicate,
    )

    src = cdf_vt
    src.write_full(_mk(spark, [(1, "a")]))
    src.append(_mk(spark, [(2, "b")]))
    marker = os.path.join(src._cdf_version_dir(1), "_SUCCESS")
    os.unlink(marker)  # simulate a mid-write feed
    dst = VersionedTable(str(tmp_path / "dst"))
    ckpt = str(tmp_path / "ckpt")
    q = replicate(
        spark, src, dst, keys=["k"], checkpoint_dir=ckpt,
        success_poll_sec=0.5,
    )
    with pytest.raises(Exception, match="_SUCCESS"):
        q.awaitTermination(120)
        raise AssertionError("missing marker did not fail the batch")
    # writer finishes; same checkpoint replays the failed batch
    open(marker, "w").close()
    q2 = replicate(spark, src, dst, keys=["k"], checkpoint_dir=ckpt)
    assert q2.awaitTermination(180)
    assert _rows(dst.read(spark)) == [(1, "a"), (2, "b")]


def test_replicate_single_file_batches_fold_whole_commits(
    spark, cdf_vt, tmp_path
):
    """maxFilesPerTrigger=1 forces one-file micro-batches; the fold
    re-reads whole materialized commits in version order, so the
    replica still converges exactly."""
    from aws_lakehouse_project_spark.plans.versioned import (
        VersionedTable,
        replicate,
    )

    src = cdf_vt
    src.write_full(_mk(spark, [(1, "a"), (2, "b"), (3, "c")]))
    src.merge_upsert(spark, _mk(spark, [(2, "B"), (4, "d")]), keys=["k"])
    src.delete_where(spark, "k = 1")
    dst = VersionedTable(str(tmp_path / "dst"))
    q = replicate(
        spark,
        src,
        dst,
        keys=["k"],
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    assert q.awaitTermination(180)
    assert _rows(dst.read(spark)) == _rows(src.read(spark))
    ops = [h["op"] for h in dst.history()]
    assert ops[0] == "overwrite" and set(ops[1:]) <= {"merge"}


def test_concurrent_merge_append_cdc_stress(spark, cdf_vt):
    """Multi-writer contention WITH the change feed on: concurrent
    appends (rebase path) and CoW merges (expected_head CAS + bounded
    retry) interleave, every data commit materializes its single-file
    feed, and replaying the whole feed in commit order reconstructs the
    final head exactly — the CDF stays gap-free under contention."""
    import threading
    import time as _time

    from pyspark.sql import Window

    from aws_lakehouse_project_spark.plans.versioned import (
        ConcurrentWriteError,
        VersionedTable,
    )

    vt = cdf_vt
    vt.write_full(_mk(spark, [(i, "base") for i in range(4)]))
    errors = []

    def worker(tid: int) -> None:
        try:
            me = VersionedTable(vt.path, stats_cols=["k"], change_feed=True)
            for j in range(2):
                me.append(_mk(spark, [(1000 + 10 * tid + j, f"a{tid}_{j}")]))
                for _attempt in range(40):
                    try:
                        me.merge_upsert(
                            spark, _mk(spark, [(tid, f"m{tid}_{j}")]), keys=["k"]
                        )
                        break
                    except ConcurrentWriteError:
                        _time.sleep(0.02)
                else:
                    raise AssertionError(f"merge starved for writer {tid}")
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []
    vs = vt.versions()
    assert vs == list(range(len(vs)))  # dense chain under contention
    # every data commit materialized exactly one feed file
    for v in vs:
        d = vt._cdf_version_dir(v)
        assert os.path.isdir(d), f"version {v} has no feed"
        n = len([f for f in os.listdir(d) if f.endswith(".parquet")])
        assert n == 1, (v, n)
    feed = _feed(spark, vt)
    post = F.col("_change_type").isin("insert", "update_postimage")
    w = Window.partitionBy("k").orderBy(
        F.desc("_commit_version"), F.when(post, 1).otherwise(0).desc()
    )
    replay = (
        feed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter(post)
        .select("k", "v")
    )
    assert _rows(replay) == _rows(vt.read(spark))


def _commit_at(monkeypatch, ts):
    """Pin the commit wall-clock (manifest 'ts') for the next commits."""
    import aws_lakehouse_project_spark.plans.versioned as V

    monkeypatch.setattr(V.time, "time", lambda: ts)


def test_vacuum_retain_hours_keeps_young_versions(spark, vt, monkeypatch):
    """Delta's VACUUM ... RETAIN n HOURS: versions inside the window
    survive even when retain_last alone would drop them (union of the
    two horizons)."""
    _commit_at(monkeypatch, 1_000.0)
    vt.write_full(_mk(spark, [(1, "a")]))
    _commit_at(monkeypatch, 5_000.0)
    vt.write_full(_mk(spark, [(2, "b")]))
    _commit_at(monkeypatch, 9_000.0)
    vt.write_full(_mk(spark, [(3, "c")]))
    monkeypatch.undo()
    # cutoff = 10_000 - 1.5h*3600 = 4_600: v1 (ts 5_000) and v2 stay
    res = vt.vacuum(retain_last=1, retain_hours=1.5, now=10_000.0)
    # [1, 2] survive the horizons; 3 is the vacuum marker commit
    assert res["horizon_commit"] == 3
    assert res["retained_versions"] == [1, 2, 3]
    assert res["removed_versions"] == 1
    assert _rows(vt.read(spark, version=1)) == [(2, "b")]
    with pytest.raises(VacuumedVersionError):
        vt.read(spark, version=0)


def test_vacuum_retain_hours_zero_falls_back_to_count(spark, vt, monkeypatch):
    """retain_hours=0 keeps nothing by age — the count horizon (and the
    head with it) still applies."""
    _commit_at(monkeypatch, 1_000.0)
    vt.write_full(_mk(spark, [(1, "a")]))
    _commit_at(monkeypatch, 2_000.0)
    vt.write_full(_mk(spark, [(2, "b")]))
    monkeypatch.undo()
    res = vt.vacuum(retain_last=1, retain_hours=0.0, now=1e12)
    assert res["retained_versions"] == [1, res["horizon_commit"]]
    assert _rows(vt.read(spark)) == [(2, "b")]


def test_vacuum_retain_hours_validates(spark, vt):
    vt.write_full(_mk(spark, [(1, "a")]))
    with pytest.raises(ValueError):
        vt.vacuum(retain_hours=-1.0)


def test_vacuum_retain_hours_fresh_reader_ok(spark, vt, monkeypatch):
    """The checkpoint-backfill contract holds on the time horizon too:
    after an age-based vacuum of append history, a FRESH instance reads
    every retained version (the r9 judge-repro, time-horizon form)."""
    _commit_at(monkeypatch, 1_000.0)
    vt.write_full(_mk(spark, [(1, "a")]))
    for i, ts in enumerate([2_000.0, 3_000.0, 9_000.0]):
        _commit_at(monkeypatch, ts)
        vt.append(_mk(spark, [(10 + i, "x")]))
    monkeypatch.undo()
    res = vt.vacuum(retain_hours=2.0, now=10_000.0)  # cutoff 2_800: keep v2+
    assert res["retained_versions"] == [2, 3]
    # append ancestry: every dropped version's files are still live, so
    # the drop is manifest-only and no horizon marker lands
    assert res["horizon_commit"] is None
    fresh = VersionedTable(vt.path, stats_cols=["k"])
    assert len(_rows(fresh.read(spark))) == 4
    assert len(_rows(fresh.read(spark, version=2))) == 3


# -- vacuum vs concurrent writers (r10 judge finding) -----------------------


def _audit_manifests_resolve(spark, path):
    """Every retained manifest must reference only files on disk."""
    fresh = VersionedTable(path)
    for v in fresh.versions():
        for f in fresh._manifest(v)["files"]:
            assert os.path.exists(os.path.join(path, f)), (v, f)


def test_vacuum_spares_young_orphans(spark, vt):
    """An unreferenced file younger than the mtime floor may be a
    concurrent writer's staged-but-unclaimed commit — vacuum must leave
    it alone (and report it), while still reclaiming dropped versions'
    files at any age (those were provably claimed)."""
    import time as _time

    vt.write_full(_mk(spark, [(1, "a")]))
    vt.write_full(_mk(spark, [(1, "a"), (2, "b")]))  # v0's files now dead
    stage = os.path.join(vt.path, "data", "c00000099-feedface")
    os.makedirs(stage)
    orphan = os.path.join(stage, "part-00000-orphan.parquet")
    with open(orphan, "wb") as fh:
        fh.write(b"not yet claimed")
    with open(os.path.join(stage, "_SUCCESS"), "w"):
        pass
    res = vt.vacuum(retain_last=1, retain_recent_s=0.0)
    assert res["removed_versions"] == 1  # v0 dropped...
    assert res["removed_data_files"] >= 1  # ...and reclaimed immediately
    assert res["skipped_inflight_files"] == 1
    assert os.path.exists(orphan)  # the staged commit survived
    # once past the floor the orphan is reclaimable (crashed writer)
    old = _time.time() - 7200.0
    os.utime(orphan, (old, old))
    os.utime(os.path.join(stage, "_SUCCESS"), (old, old))
    os.utime(stage, (old, old))  # dir age gates the rmdir too
    res2 = vt.vacuum(retain_last=1, retain_recent_s=0.0)
    assert res2["skipped_inflight_files"] == 0
    assert not os.path.exists(orphan) and not os.path.isdir(stage)


def test_vacuum_orphan_floor_injectable_now(spark, vt):
    """`now` drives the age floor (deterministic tests, no sleeps)."""
    vt.write_full(_mk(spark, [(1, "a")]))
    stage = os.path.join(vt.path, "data", "c00000042-cafebabe")
    os.makedirs(stage)
    orphan = os.path.join(stage, "part-00000-x.parquet")
    with open(orphan, "wb") as fh:
        fh.write(b"staged")
    import time as _time

    future = _time.time() + 10_000.0
    assert vt.vacuum(now=future)["removed_data_files"] == 1
    assert not os.path.exists(orphan)


def test_vacuum_races_staged_commit_via_claim_seam(spark, tmp_path):
    """Deterministic repro of the r10 judge race: vacuum fires at the
    exact instant a writer has STAGED files but not yet claimed a
    version (the claim-backend seam). The staged commit must survive
    the vacuum, the claim must then succeed, and every retained
    manifest must still resolve to files on disk."""
    from aws_lakehouse_project_spark.plans.versioned import (
        CommitClaimBackend,
        PosixLinkClaim,
    )

    path = str(tmp_path / "t")
    seed = VersionedTable(path)
    seed.write_full(_mk(spark, [(1, "a")]))
    seed.append(_mk(spark, [(2, "b")]))
    report: dict = {}

    class VacuumDuringClaim(CommitClaimBackend):
        def __init__(self):
            self._inner = PosixLinkClaim()
            self.fired = False

        def claim(self, final: str, payload: str) -> bool:
            if not self.fired:
                self.fired = True
                report.update(VersionedTable(path).vacuum(retain_last=1, retain_recent_s=0.0))
            return self._inner.claim(final, payload)

    victim = VersionedTable(path, claim_backend=VacuumDuringClaim())
    victim.append(_mk(spark, [(3, "c")]))
    assert report["removed_versions"] == 1  # v0 was reclaimed mid-race
    assert report["skipped_inflight_files"] >= 1  # staged files spared
    fresh = VersionedTable(path)
    assert _rows(fresh.read(spark)) == [(1, "a"), (2, "b"), (3, "c")]
    _audit_manifests_resolve(spark, path)


def test_vacuum_concurrent_writer_stress(spark, vt):
    """4 writer threads append while a vacuum thread loops with the
    default floor: no staged commit is ever deleted (every append
    lands; content complete and duplicate-free) and every retained
    manifest resolves to files on disk."""
    import threading

    vt.write_full(_mk(spark, [(-1, "base")]))
    stop = threading.Event()
    errors: list = []

    def writer(tid: int) -> None:
        try:
            for j in range(3):
                vt.append(_mk(spark, [(100 * tid + j, f"w{tid}_{j}")]))
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    def vac() -> None:
        h = VersionedTable(vt.path)
        try:
            while not stop.is_set():
                h.vacuum(retain_last=1, retain_recent_s=0.0)
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    vthread = threading.Thread(target=vac)
    vthread.start()
    ws = [threading.Thread(target=writer, args=(t,)) for t in range(4)]
    for t in ws:
        t.start()
    for t in ws:
        t.join()
    stop.set()
    vthread.join()
    assert errors == []
    fresh = VersionedTable(vt.path)
    rows = _rows(fresh.read(spark))
    assert len(rows) == 1 + 4 * 3
    assert len(set(rows)) == len(rows)
    _audit_manifests_resolve(spark, vt.path)


def test_vacuum_races_staged_cow_merge_via_claim_seam(spark, tmp_path):
    """Same race as the append form, but the in-flight writer is a
    copy-on-write MERGE (stages rewritten+new files before its claim):
    vacuum mid-claim must spare the staged files and the merge must
    land on the post-vacuum log."""
    from aws_lakehouse_project_spark.plans.versioned import (
        CommitClaimBackend,
        PosixLinkClaim,
    )

    path = str(tmp_path / "t")
    seed = VersionedTable(path)
    seed.write_full(_mk(spark, [(1, "a"), (2, "b")]))
    seed.write_full(_mk(spark, [(1, "a"), (2, "b"), (3, "c")]))  # v0 dead
    report: dict = {}

    class VacuumDuringClaim(CommitClaimBackend):
        def __init__(self):
            self._inner = PosixLinkClaim()
            self.fired = False

        def claim(self, final: str, payload: str) -> bool:
            if not self.fired:
                self.fired = True
                report.update(VersionedTable(path).vacuum(retain_last=1, retain_recent_s=0.0))
            return self._inner.claim(final, payload)

    victim = VersionedTable(path, claim_backend=VacuumDuringClaim())
    victim.merge_upsert(
        spark, _mk(spark, [(2, "B!"), (4, "d")]), keys=["k"]
    )
    assert report["removed_versions"] == 1
    assert report["skipped_inflight_files"] >= 1
    fresh = VersionedTable(path)
    assert _rows(fresh.read(spark)) == [
        (1, "a"), (2, "B!"), (3, "c"), (4, "d"),
    ]
    _audit_manifests_resolve(spark, path)


def test_col_min_max_metadata_only(spark, vt):
    """(MIN, MAX) from stats alone; refuses on DVs and missing stats."""
    vt.write_full(_mk(spark, [(5, "a"), (1, "b")]).coalesce(1))
    vt.append(_mk(spark, [(9, "c")]).coalesce(1))
    assert vt.col_min_max("k") == (1, 9)
    assert vt.col_min_max("k", version=0) == (1, 5)
    with pytest.raises(ValueError, match="no .* stat|no column"):
        vt.col_min_max("v")  # v is not a stats column
    vt.delete_where(spark, "k = 9", mode="merge_on_read")  # DV lands
    with pytest.raises(ValueError, match="deletion vectors"):
        vt.col_min_max("k")
    # pre-DV versions still answer
    assert vt.col_min_max("k", version=1) == (1, 9)


def test_col_min_max_refuses_decimal(spark, tmp_path):
    from decimal import Decimal

    vt = VersionedTable(str(tmp_path / "d"), stats_cols=["amt"])
    df = spark.createDataFrame(
        [(Decimal("1.50"),), (Decimal("2.25"),)], "amt decimal(12,2)"
    )
    vt.write_full(df)
    with pytest.raises(ValueError, match="decimal"):
        vt.col_min_max("amt")


def test_auto_compact_bounds_trickle_appends(spark, tmp_path):
    """Delta's autoCompact: single-row appends (the streaming-sink
    trickle) trigger bin-packs once >=3 small files pile up, so the
    live file count stays bounded; content and history stay exact."""
    vt = VersionedTable(
        str(tmp_path / "t"), stats_cols=["k"], auto_compact=(3, 100)
    )
    vt.write_full(_mk(spark, [(0, "seed")]).coalesce(1))
    for i in range(1, 9):
        vt.append(_mk(spark, [(i, f"r{i}")]).coalesce(1))
    m = vt._manifest()
    assert len(m["files"]) <= 3  # without compaction this would be 9
    hist_ops = [h["op"] for h in vt.history()]
    assert "optimize" in hist_ops
    assert any(
        h["op"] == "optimize" and h["meta"].get("auto_compact")
        for h in vt.history()
    )
    assert _rows(vt.read(spark)) == [(i, f"r{i}" if i else "seed") for i in range(9)]


def test_auto_compact_merge_path_and_default_off(spark, tmp_path):
    on = VersionedTable(
        str(tmp_path / "on"), stats_cols=["k"], auto_compact=(3, 100)
    )
    off = VersionedTable(str(tmp_path / "off"), stats_cols=["k"])
    for vt in (on, off):
        vt.write_full(_mk(spark, [(0, "seed")]).coalesce(1))
        for i in range(1, 7):
            vt.merge_upsert(
                spark, _mk(spark, [(i, f"m{i}")]).coalesce(1), keys=["k"]
            )
    assert len(on._manifest()["files"]) < len(off._manifest()["files"])
    assert _rows(on.read(spark)) == _rows(off.read(spark))
    assert "optimize" not in [h["op"] for h in off.history()]


# -- CONVERT TO (register existing parquet as v0, zero copy) -----------------


def test_convert_from_parquet_zero_copy(spark, tmp_path):
    import glob

    src = str(tmp_path / "plain")
    spark.createDataFrame(
        [(i, f"r{i}") for i in range(100)], "k int, v string"
    ).repartition(3).write.parquet(src)
    before = {
        p: (os.path.getsize(p), os.path.getmtime(p))
        for p in glob.glob(src + "/*.parquet")
    }
    vt = VersionedTable.convert_from_parquet(
        spark, src, str(tmp_path / "vt"), stats_cols=["k"]
    )
    assert vt.row_count() == 100  # stats pass ran: metadata plane live
    assert vt.col_min_max("k") == (0, 99)
    assert len(_rows(vt.read(spark))) == 100
    assert [h["op"] for h in vt.history()] == ["convert"]
    # CoW evolves into the table's own data dir; source never touched
    vt.delete_where(spark, "k % 10 = 0")
    assert vt.row_count() == 90
    after = {
        p: (os.path.getsize(p), os.path.getmtime(p))
        for p in glob.glob(src + "/*.parquet")
    }
    assert before == after
    # vacuum walks only the table's own directory: dropping v0 cannot
    # reclaim borrowed source data
    vt.vacuum(retain_last=1, retain_recent_s=0.0)
    assert all(os.path.exists(p) for p in before)
    assert len(_rows(vt.read(spark))) == 90


def test_convert_rejects_hive_partitioned(spark, tmp_path):
    src = str(tmp_path / "part")
    spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "k int, g int"
    ).write.partitionBy("g").parquet(src)
    with pytest.raises(ValueError, match="hive-partitioned"):
        VersionedTable.convert_from_parquet(
            spark, src, str(tmp_path / "vt")
        )


def test_convert_rejects_empty_and_existing(spark, tmp_path):
    os.makedirs(tmp_path / "empty")
    with pytest.raises(ValueError, match="no parquet files"):
        VersionedTable.convert_from_parquet(
            spark, str(tmp_path / "empty"), str(tmp_path / "vt")
        )
    src = str(tmp_path / "plain")
    spark.createDataFrame([(1, "a")], "k int, v string").write.parquet(src)
    VersionedTable.convert_from_parquet(spark, src, str(tmp_path / "vt2"))
    with pytest.raises(ValueError, match="already has a table"):
        VersionedTable.convert_from_parquet(spark, src, str(tmp_path / "vt2"))


# -- vacuum × restore serialization (vacuum_horizon marker) ------------------


def test_vacuum_lands_horizon_marker_in_history(spark, vt):
    """A reclaiming vacuum logs a metadata-only "vacuum" commit (Delta's
    VACUUM START entry) that raises the inherited vacuum_horizon; no-op
    vacuums never grow the log."""
    vt.write_full(_mk(spark, [(1, "a")]))
    vt.write_full(_mk(spark, [(2, "b")]))
    res = vt.vacuum(retain_last=1, retain_recent_s=0.0)
    assert res["horizon_commit"] == 2
    head = vt._manifest()
    assert head["op"] == "vacuum"
    assert head["vacuum_horizon"] == 1
    assert _rows(vt.read(spark)) == [(2, "b")]  # marker changes no data
    # the horizon is inherited by ordinary commits
    vt.append(_mk(spark, [(3, "c")]))
    assert vt._manifest()["vacuum_horizon"] == 1
    # nothing to drop -> no marker, no new version
    head_v = vt.latest_version()
    res2 = vt.vacuum(retain_last=10, retain_recent_s=0.0)
    assert res2["horizon_commit"] is None
    assert vt.latest_version() == head_v


def test_restore_below_horizon_raises_despite_warm_cache(spark, vt):
    """The vacuum × restore race, same-process form: a handle that
    already resolved the target manifest (warm cache) must still refuse
    to restore below the vacuum horizon — without the manifest-level
    horizon, the cached manifest would let it commit a head referencing
    reclaimed files."""
    vt.write_full(_mk(spark, [(1, "a")]))
    vt.write_full(_mk(spark, [(2, "b")]))
    warm = VersionedTable(vt.path, stats_cols=["k"])
    assert _rows(warm.read(spark, version=0)) == [(1, "a")]  # warm v0
    vt.vacuum(retain_last=1, retain_recent_s=0.0)
    with pytest.raises(VacuumedVersionError):
        warm.restore(0)
    assert vt._manifest()["op"] == "vacuum"  # no restore head landed


def test_restore_interleaving_vacuum_marker_keeps_files_live(spark, vt):
    """A restore that commits BETWEEN vacuum's version listing and its
    horizon marker keeps the restored snapshot's files alive: the
    marker rebases onto the restore's head and the interleaved-commit
    walk folds those file references back into the live set."""
    vt.write_full(_mk(spark, [(1, "a")]))
    vt.write_full(_mk(spark, [(2, "b")]))
    orig_claim = vt._claim_version
    raced = {"done": False}

    def racing_claim(manifest, parent=None):
        if not raced["done"] and manifest["op"] == "vacuum":
            raced["done"] = True
            VersionedTable(vt.path, stats_cols=["k"]).restore(0)
        return orig_claim(manifest, parent=parent)

    vt._claim_version = racing_claim
    try:
        res = vt.vacuum(retain_last=1, retain_recent_s=0.0)
    finally:
        vt._claim_version = orig_claim
    assert res["removed_data_files"] == 0  # restore resurrected v0's file
    assert _rows(vt.read(spark)) == [(1, "a")]
    fresh = VersionedTable(vt.path)
    assert _rows(fresh.read(spark)) == [(1, "a")]


def test_auto_compact_is_best_effort_on_lost_race(spark, tmp_path):
    """autoCompact must never fail the parent write: the data commit is
    durable before the follow-up OPTIMIZE runs, so a lost race is
    skipped (a caller retrying ConcurrentWriteError would re-land the
    same rows)."""
    vt = VersionedTable(
        str(tmp_path / "t"), stats_cols=["k"], auto_compact=(2, 100)
    )
    vt.write_full(_mk(spark, [(1, "a")]).coalesce(1))
    orig = vt.optimize

    def losing_optimize(*a, **kw):
        raise ConcurrentWriteError("simulated lost compaction race")

    vt.optimize = losing_optimize
    try:
        v = vt.append(_mk(spark, [(2, "b")]).coalesce(1))
    finally:
        vt.optimize = orig
    assert _rows(vt.read(spark)) == [(1, "a"), (2, "b")]
    assert vt._manifest()["op"] == "append"
    assert vt.latest_version() == v


def test_auto_compact_fires_after_cow_delete(spark, tmp_path):
    """delete_where survivors count toward the small-file condition —
    the hook covers every layout-changing commit, not just appends."""
    plain = VersionedTable(str(tmp_path / "t"), stats_cols=["k"])
    for i in range(4):  # 4 small files, written compaction-free
        plain.append(
            _mk(spark, [(i * 10 + j, "x") for j in range(3)]).coalesce(1)
        )
    vt = VersionedTable(
        str(tmp_path / "t"), stats_cols=["k"], auto_compact=(3, 100)
    )
    vt.delete_where(spark, "k = 0")  # CoW rewrite through the AC handle
    head = vt._manifest()
    assert head["op"] == "optimize"
    assert head["meta"].get("auto_compact") is True
    assert len(head["files"]) == 1  # everything bin-packed
    assert len(_rows(vt.read(spark))) == 11


def test_col_min_max_refuses_on_missing_stats_entry(spark, vt):
    vt.write_full(_mk(spark, [(1, "a"), (5, "b")]))
    m = vt._manifest()
    broken = {**m, "stats": {}}
    orig = vt._manifest
    vt._manifest = lambda v=None: broken
    try:
        with pytest.raises(ValueError, match="no stats entry"):
            vt.col_min_max("k")
    finally:
        vt._manifest = orig


def test_col_non_null_count_unknown_column_raises(spark, vt):
    vt.write_full(_mk(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="no column"):
        vt.col_non_null_count("nope")


def test_set_bloom_cols_failed_ddl_does_not_linger(spark, vt):
    """A CREATE BLOOMFILTER INDEX that loses its commit must not leave
    the new column set on the handle — the next data commit would
    silently persist the 'failed' DDL."""
    vt.write_full(_mk(spark, [(1, "a")]))
    orig = vt._commit

    def failing_commit(op, *a, **kw):
        if op == "set_bloom_index":
            raise ConcurrentWriteError("simulated lost DDL race")
        return orig(op, *a, **kw)

    vt._commit = failing_commit
    try:
        with pytest.raises(ConcurrentWriteError):
            vt.set_bloom_cols(spark, ["k"])
    finally:
        vt._commit = orig
    assert vt.bloom_cols is None
    vt.append(_mk(spark, [(2, "b")]))
    assert "bloom_cols" not in vt._manifest()


def test_vacuum_loop_does_not_self_feed_markers(spark, vt):
    """A vacuum(retain_last=1) maintenance loop must converge: the pass
    after a reclaim drops only the pre-marker manifest (whose files the
    marker keeps live) — a manifest-only drop lands NO new marker, so
    the log stops growing."""
    vt.write_full(_mk(spark, [(1, "a")]))
    vt.write_full(_mk(spark, [(2, "b")]))
    r1 = vt.vacuum(retain_last=1, retain_recent_s=0.0)
    assert r1["horizon_commit"] == 2 and r1["removed_data_files"] >= 1
    r2 = vt.vacuum(retain_last=1, retain_recent_s=0.0)
    assert r2["horizon_commit"] is None  # manifest-only drop: no marker
    assert r2["removed_data_files"] == 0
    head = vt.latest_version()
    r3 = vt.vacuum(retain_last=1, retain_recent_s=0.0)
    assert r3["horizon_commit"] is None and r3["removed_versions"] == 0
    assert vt.latest_version() == head
    assert _rows(VersionedTable(vt.path).read(spark)) == [(2, "b")]


def test_vacuum_reader_retention_floor_default_safe(spark, vt):
    """Default vacuum never drops a version committed within the
    in-flight-reader floor (retain_recent_s, inheriting
    min_file_age_s): a snapshot read started seconds ago keeps its
    files. Lifting the floor (single-writer) reclaims immediately."""
    vt.write_full(_mk(spark, [(1, "a")]))
    vt.write_full(_mk(spark, [(2, "b")]))
    res = vt.vacuum(retain_last=1)  # v0 is seconds old -> retained
    assert res["removed_versions"] == 0
    assert res["removed_data_files"] == 0
    assert _rows(vt.read(spark, version=0)) == [(1, "a")]
    res2 = vt.vacuum(retain_last=1, retain_recent_s=0.0)
    assert res2["removed_versions"] == 1
    with pytest.raises(VacuumedVersionError):
        vt.read(spark, version=0)
    with pytest.raises(ValueError):
        vt.vacuum(retain_recent_s=-1.0)


def test_stream_changes_tolerates_all_feedless_ops(spark, cdf_vt, tmp_path):
    """Metadata-only / layout-only commits write no change-feed dir by
    design; the streaming source's completeness guard must exempt EVERY
    such op — rename_column, bloom-index DDL, and the vacuum horizon
    marker included (the guard and materialize_changes drifting apart
    broke CDC streaming after a reclaiming vacuum)."""
    vt = cdf_vt
    vt.write_full(_mk(spark, [(1, "a"), (2, "b")]))
    vt.write_full(_mk(spark, [(3, "c")], ))  # v0's files now dead
    vt.rename_column("v", "val")
    vt.set_bloom_cols(spark, ["k"])
    res = vt.vacuum(retain_last=3, retain_recent_s=0.0)
    assert res["horizon_commit"] is not None  # the marker op is live
    sink = str(tmp_path / "sink")
    q = (
        vt.stream_changes(spark, starting_version=1)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _rows(spark.read.parquet(sink).select("_change_type", "k"))
    assert ("insert", 3) in got


def test_two_vacuum_loops_race_without_dying(spark, vt):
    """Two concurrent maintenance loops vacuuming one table (plus a
    writer) must both survive: the manifest phase tolerates a peer
    unlinking manifests mid-pass (re-resolve / idempotent unlinks), the
    same way the data-file walk always has."""
    import threading

    vt.write_full(_mk(spark, [(1, "a")]))
    errors: list = []

    def vac_loop():
        h = VersionedTable(vt.path, stats_cols=["k"])
        try:
            for _ in range(15):
                h.vacuum(retain_last=1, retain_recent_s=0.0)
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    def writer_loop():
        h = VersionedTable(vt.path, stats_cols=["k"])
        try:
            for i in range(6):
                h.write_full(_mk(spark, [(i, f"w{i}")]))
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [
        threading.Thread(target=vac_loop),
        threading.Thread(target=vac_loop),
        threading.Thread(target=writer_loop),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == [], errors
    fresh = VersionedTable(vt.path)
    assert len(_rows(fresh.read(spark))) == 1  # last overwrite wins
    # every retained manifest resolves to files on disk
    for v in fresh.versions():
        for f in fresh._manifest(v)["files"]:
            assert os.path.exists(os.path.join(vt.path, f)), (v, f)


def test_optimize_where_scopes_by_stats(spark, vt):
    """optimize(where=(col, lo, hi)) packs only files whose manifest
    [min,max] could intersect the range; out-of-scope files and files
    without the stat behave per contract (skip / conservatively
    include)."""
    vt.write_full(_mk(spark, [(i, "base") for i in range(100, 120)]).coalesce(1))
    vt.append(_mk(spark, [(1, "hot")]).coalesce(1))
    vt.append(_mk(spark, [(2, "hot")]).coalesce(1))
    vt.append(_mk(spark, [(500, "cold")]).coalesce(1))
    before = vt._manifest()
    cold_file = before["files"][3]
    v = vt.optimize(spark, target_rows_per_file=10, where=("k", 0, 50))
    after = vt._manifest(v)
    assert after["meta"]["where"] == ["k", "0", "50"]
    assert cold_file in after["files"]  # out of scope: carried by name
    assert before["files"][0] in after["files"]  # full-sized: carried
    assert len(after["files"]) == 3  # 2 hot smalls packed into 1
    assert _rows(vt.read(spark)) == _rows(vt.read(spark, 3))
    # disjoint scope -> nothing to pack -> no new version
    head = vt.latest_version()
    assert vt.optimize(spark, 10, where=("k", 10_000, 20_000)) == head


def test_optimize_where_includes_statless_files(spark, tmp_path):
    """A file with no stat for the scope column MIGHT intersect — it
    stays in scope (conservative; rewriting is content-preserving)."""
    nostats = VersionedTable(str(tmp_path / "t"))  # no stats_cols
    nostats.write_full(_mk(spark, [(1, "a")]).coalesce(1))
    nostats.append(_mk(spark, [(2, "b")]).coalesce(1))
    v = nostats.optimize(spark, 10, where=("k", 0, 0))
    assert len(nostats._manifest(v)["files"]) == 1  # both packed
    assert _rows(nostats.read(spark)) == [(1, "a"), (2, "b")]


def test_optimize_where_packs_dv_files_and_sheds_dead_rows(spark, vt):
    """A merge-on-read-deleted file inside the scope packs like any
    small file and sheds its deletion vector (dead rows physically
    dropped); a DV'd file OUTSIDE the scope keeps its DV untouched."""
    vt.write_full(_mk(spark, [(i, "hot") for i in range(3)]).coalesce(1))
    vt.append(_mk(spark, [(100 + i, "cold") for i in range(3)]).coalesce(1))
    vt.delete_where(spark, "k = 1", mode="merge_on_read")
    vt.delete_where(spark, "k = 101", mode="merge_on_read")
    assert len(vt._manifest().get("dvs", {})) == 2
    v = vt.optimize(spark, target_rows_per_file=10, where=("k", 0, 50))
    m = vt._manifest(v)
    # the hot file was alone in scope BUT carries a DV -> it still
    # cannot pack with anything; scope with >=2 files is the packing
    # case, so append another hot small first for a real pack
    vt.append(_mk(spark, [(5, "hot2")]).coalesce(1))
    v = vt.optimize(spark, target_rows_per_file=10, where=("k", 0, 50))
    m = vt._manifest(v)
    dvs = m.get("dvs", {})
    # the cold file's DV survives; no hot file carries one anymore
    assert len(dvs) == 1
    (cold_dvd,) = dvs
    assert _rows(vt.read(spark)) == [
        (0, "hot"), (2, "hot"), (5, "hot2"),
        (100, "cold"), (102, "cold"),
    ]


def test_clone_inherits_change_feed_from_source(spark, cdf_vt, tmp_path):
    """Delta's CLONE copies table properties, including
    delta.enableChangeDataFeed: with change_feed=None (default) the
    clone inherits the SOURCE snapshot's flag, so post-clone commits
    keep materializing feeds; an explicit False still overrides."""
    cdf_vt.write_full(_mk(spark, [(1, "a"), (2, "b")]))
    cl = cdf_vt.clone(str(tmp_path / "cl"))
    assert cl.change_feed is True
    # a FRESH handle (no constructor flag) sees the persisted property
    fresh = VersionedTable(str(tmp_path / "cl"))
    assert fresh.change_feed is True
    # and a post-clone commit materializes its feed
    fresh.delete_where(spark, "k = 1")
    feed = fresh.changes(spark, 0, fresh.latest_version())
    assert [(r["_change_type"], r["k"]) for r in feed.collect()] == [
        ("delete", 1)
    ]
    # explicit override still wins
    off = cdf_vt.clone(str(tmp_path / "cl_off"), change_feed=False)
    assert off.change_feed is False
