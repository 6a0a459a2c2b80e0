"""COPY INTO (plans/ingest.py): exactly-once file ingestion whose
ledger rides the commit meta — idempotent across re-runs, fresh
handles, and interleaved unrelated commits; schema drift fails whole."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from aws_lakehouse_project_spark.plans.ingest import copy_into, loaded_files
from aws_lakehouse_project_spark.plans.versioned import VersionedTable


def _mk(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, v=v) for k, v in rows], "k string, v int"
    )


def _land(spark, path, rows):
    _mk(spark, rows).coalesce(1).write.mode("overwrite").parquet(path)


@pytest.fixture()
def vt(tmp_path):
    return VersionedTable(str(tmp_path / "t"))


def _rows(spark, vt):
    return sorted(tuple(r) for r in vt.read(spark).collect())


def test_first_copy_creates_table(spark, vt, tmp_path):
    _land(spark, str(tmp_path / "src/a"), [("x", 1)])
    out = copy_into(spark, vt, str(tmp_path / "src"), "*/*.parquet")
    assert out["files_loaded"] == 1 and out["rows_loaded"] == 1
    assert _rows(spark, vt) == [("x", 1)]


def test_rerun_is_noop_without_commit(spark, vt, tmp_path):
    _land(spark, str(tmp_path / "src/a"), [("x", 1)])
    copy_into(spark, vt, str(tmp_path / "src"), "*/*.parquet")
    v = vt.latest_version()
    out = copy_into(spark, vt, str(tmp_path / "src"), "*/*.parquet")
    assert out == {"version": v, "files_loaded": 0, "rows_loaded": 0}
    assert vt.latest_version() == v


def test_only_new_files_load(spark, vt, tmp_path):
    _land(spark, str(tmp_path / "src/a"), [("x", 1)])
    copy_into(spark, vt, str(tmp_path / "src"), "*/*.parquet")
    _land(spark, str(tmp_path / "src/b"), [("y", 2), ("z", 3)])
    out = copy_into(spark, vt, str(tmp_path / "src"), "*/*.parquet")
    assert out["files_loaded"] == 1 and out["rows_loaded"] == 2
    assert _rows(spark, vt) == [("x", 1), ("y", 2), ("z", 3)]


def test_ledger_survives_interleaved_commits(spark, vt, tmp_path):
    """A DELETE between copies must not reset the ledger — the walk
    finds the most recent commit that carries one."""
    _land(spark, str(tmp_path / "src/a"), [("x", 1), ("y", 2)])
    copy_into(spark, vt, str(tmp_path / "src"), "*/*.parquet")
    vt.delete_where(spark, "k = 'x'")
    out = copy_into(spark, vt, str(tmp_path / "src"), "*/*.parquet")
    assert out["files_loaded"] == 0
    # the deleted row must NOT come back via a sneaky re-load
    assert _rows(spark, vt) == [("y", 2)]
    _land(spark, str(tmp_path / "src/b"), [("z", 9)])
    out = copy_into(spark, vt, str(tmp_path / "src"), "*/*.parquet")
    assert out["files_loaded"] == 1
    assert _rows(spark, vt) == [("y", 2), ("z", 9)]
    assert len(loaded_files(vt)) == 2


def test_fresh_handle_is_idempotent(spark, vt, tmp_path):
    _land(spark, str(tmp_path / "src/a"), [("x", 1)])
    copy_into(spark, vt, str(tmp_path / "src"), "*/*.parquet")
    fresh = VersionedTable(vt.path)
    out = copy_into(spark, fresh, str(tmp_path / "src"), "*/*.parquet")
    assert out["files_loaded"] == 0


def test_schema_drift_fails_whole_command(spark, vt, tmp_path):
    _land(spark, str(tmp_path / "src/a"), [("x", 1)])
    copy_into(spark, vt, str(tmp_path / "src"), "*/*.parquet")
    spark.createDataFrame(
        [Row(k="bad", other=1.5)], "k string, other double"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "src/b"))
    with pytest.raises(Exception, match="schema|mismatch|merge"):
        copy_into(spark, vt, str(tmp_path / "src"), "*/*.parquet")
    # nothing half-loaded
    assert _rows(spark, vt) == [("x", 1)]


def test_empty_source_raises(spark, vt, tmp_path):
    with pytest.raises(FileNotFoundError, match="no files match"):
        copy_into(spark, vt, str(tmp_path / "nope"), "*.parquet")


def test_mixed_batch_with_one_drifting_file_fails_whole(spark, vt, tmp_path):
    """spark.read.parquet samples one file's schema for the batch, so a
    drifting file among good ones would coerce silently — the per-file
    footer check must fail the whole command instead."""
    _land(spark, str(tmp_path / "src/a"), [("x", 1)])
    copy_into(spark, vt, str(tmp_path / "src"), "*/*.parquet")
    _land(spark, str(tmp_path / "src/good"), [("y", 2)])
    spark.createDataFrame(
        [Row(k="bad", v=1, extra=9.9)], "k string, v int, extra double"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "src/bad"))
    with pytest.raises(ValueError, match="columns"):
        copy_into(spark, vt, str(tmp_path / "src"), "*/*.parquet")
    assert _rows(spark, vt) == [("x", 1)]  # the good file did NOT half-load


def test_vacuum_preserves_ledger_with_data_release(spark, vt, tmp_path):
    """Vacuum that drops the ledger-carrying commit (releasing its
    rewritten predecessors' files) must carry the ledger onto its
    horizon-marker commit — the next COPY INTO stays a no-op."""
    _land(spark, str(tmp_path / "src/a"), [("x", 1), ("y", 2)])
    copy_into(spark, vt, str(tmp_path / "src"), "*/*.parquet")
    # CoW delete rewrites files → the copy commit's files become dead
    vt.delete_where(spark, "k = 'x'")
    vt.delete_where(spark, "k = 'nope'")  # no-op predicate, extra commit
    vt.vacuum(retain_last=1, min_file_age_s=0.0, retain_recent_s=0.0)
    assert len(loaded_files(vt)) == 1
    out = copy_into(spark, vt, str(tmp_path / "src"), "*/*.parquet")
    assert out["files_loaded"] == 0
    assert _rows(spark, vt) == [("y", 2)]


def test_vacuum_ledger_rescue_without_data_release(spark, vt, tmp_path):
    """Even a drop that releases NO data files (append-only history,
    every file still live at head) must not discard the last ledger —
    the rescue marker fires just for it."""
    _land(spark, str(tmp_path / "src/a"), [("x", 1)])
    copy_into(spark, vt, str(tmp_path / "src"), "*/*.parquet")
    # append-only commits: the copy commit's file stays live forever
    vt.append(_mk(spark, [("z", 5)]))
    vt.append(_mk(spark, [("w", 6)]))
    rep = vt.vacuum(retain_last=1, min_file_age_s=0.0, retain_recent_s=0.0)
    assert len(loaded_files(vt)) == 1, f"ledger lost: {rep}"
    out = copy_into(spark, vt, str(tmp_path / "src"), "*/*.parquet")
    assert out["files_loaded"] == 0
    assert sorted(r[0] for r in _rows(spark, vt)) == ["w", "x", "z"]


def test_vacuum_ledger_rescue_terminates(spark, vt, tmp_path):
    """A second vacuum after a rescue retains the marker's ledger and
    does NOT stack another rescue marker (no self-feeding loop)."""
    _land(spark, str(tmp_path / "src/a"), [("x", 1)])
    copy_into(spark, vt, str(tmp_path / "src"), "*/*.parquet")
    vt.append(_mk(spark, [("z", 5)]))
    vt.vacuum(retain_last=1, min_file_age_s=0.0, retain_recent_s=0.0)
    head = vt.latest_version()
    vt.vacuum(retain_last=1, min_file_age_s=0.0, retain_recent_s=0.0)
    assert vt.latest_version() == head  # nothing new committed
    assert len(loaded_files(vt)) == 1


def test_ledger_is_union_across_commits(spark, vt, tmp_path):
    """A later commit carrying a SNAPSHOT-STALE ledger (the vacuum
    marker race shape) must not forget newer loads — the read is a
    union over the log, not newest-wins."""
    _land(spark, str(tmp_path / "src/a"), [("x", 1)])
    copy_into(spark, vt, str(tmp_path / "src"), "*/*.parquet")
    first_ledger = loaded_files(vt)
    _land(spark, str(tmp_path / "src/b"), [("y", 2)])
    copy_into(spark, vt, str(tmp_path / "src"), "*/*.parquet")
    # simulate the stale-marker: a newer commit carrying only the OLD ledger
    vt.append(_mk(spark, [("m", 9)]), meta={"copy_into_loaded": first_ledger})
    assert len(loaded_files(vt)) == 2  # union, not newest-wins
    out = copy_into(spark, vt, str(tmp_path / "src"), "*/*.parquet")
    assert out["files_loaded"] == 0  # nothing re-ingested


def test_type_drift_same_names_fails_whole(spark, vt, tmp_path):
    """Same column names, drifted type (v int → v double): the typed
    footer/schema checks must refuse the batch."""
    _land(spark, str(tmp_path / "src/a"), [("x", 1)])
    copy_into(spark, vt, str(tmp_path / "src"), "*/*.parquet")
    spark.createDataFrame(
        [Row(k="bad", v=1.5)], "k string, v double"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "src/b"))
    with pytest.raises(ValueError, match="drift|differs"):
        copy_into(spark, vt, str(tmp_path / "src"), "*/*.parquet")
    assert _rows(spark, vt) == [("x", 1)]


def test_path_spelling_never_reingests(spark, vt, tmp_path, monkeypatch):
    """The ledger is keyed by canonical realpath: a relative src, a
    different CWD, or a symlinked prefix are the SAME physical files
    and must diff as already-loaded (exactly-once contract)."""
    _land(spark, str(tmp_path / "src/a"), [("x", 1)])
    copy_into(spark, vt, str(tmp_path / "src"), "*/*.parquet")
    v = vt.latest_version()
    # relative spelling from a different CWD
    monkeypatch.chdir(tmp_path)
    out = copy_into(spark, vt, "src", "*/*.parquet")
    assert out["files_loaded"] == 0 and vt.latest_version() == v
    # symlinked prefix
    (tmp_path / "alias").symlink_to(tmp_path / "src")
    out = copy_into(spark, vt, str(tmp_path / "alias"), "*/*.parquet")
    assert out["files_loaded"] == 0 and vt.latest_version() == v
    # and genuinely new files still load through the alias
    _land(spark, str(tmp_path / "src/b"), [("y", 2)])
    out = copy_into(spark, vt, str(tmp_path / "alias"), "*/*.parquet")
    assert out["files_loaded"] == 1
    assert _rows(spark, vt) == [("x", 1), ("y", 2)]


def test_symlink_beside_target_loads_once(spark, vt, tmp_path):
    """Two directory ENTRIES resolving to one physical file (a 'latest'
    symlink next to its target) must collapse to one listing entry —
    not load the file's rows twice in one commit."""
    _land(spark, str(tmp_path / "src/a"), [("x", 1)])
    import glob as _glob
    [real] = _glob.glob(str(tmp_path / "src/a/*.parquet"))
    (tmp_path / "src/a/latest.parquet").symlink_to(real)
    out = copy_into(spark, vt, str(tmp_path / "src"), "*/*.parquet")
    assert out["files_loaded"] == 1 and out["rows_loaded"] == 1
    assert _rows(spark, vt) == [("x", 1)]
    out = copy_into(spark, vt, str(tmp_path / "src"), "*/*.parquet")
    assert out["files_loaded"] == 0
