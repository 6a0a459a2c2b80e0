"""File-level optimistic concurrency (Delta WriteSerializable rules).

A copy-on-write / merge-on-read commit whose snapshot went stale must
REBASE when the interloper touched disjoint files, and raise
ConcurrentWriteError only on a real conflict (touched file rewritten,
its deletion-vector entry churned, or schema/constraints/mapping
moved). Races are DETERMINISTIC: a claim backend that runs the
interloper's commit immediately before the victim's first claim —
the same instant a real race would land."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from aws_lakehouse_project_spark.plans.versioned import (
    CommitClaimBackend,
    ConcurrentWriteError,
    PosixLinkClaim,
    VersionedTable,
)


class RaceOnce(CommitClaimBackend):
    """Fires ``racer()`` exactly once, right before the first claim —
    the victim's snapshot is then one commit stale at claim time."""

    def __init__(self, racer):
        self.racer = racer
        self.fired = False
        self._inner = PosixLinkClaim()

    def claim(self, final: str, payload: str) -> bool:
        if not self.fired:
            self.fired = True
            self.racer()
        return self._inner.claim(final, payload)


def _mk(spark, ks, tag="x"):
    return spark.createDataFrame(
        [Row(k=k, v=f"{tag}{k}") for k in ks], "k int, v string"
    )


def _rows(df):
    return sorted((tuple(r) for r in df.collect()), key=str)


def _two_file_table(spark, path):
    """k 0..9 in file A (k<10) and 10..19 in file B — predicates on the
    halves touch disjoint files."""
    vt = VersionedTable(str(path), stats_cols=["k"])
    vt.write_full(_mk(spark, range(20)).repartitionByRange(2, "k"))
    return vt


def test_cow_delete_rebases_over_append(spark, tmp_path):
    other = VersionedTable(str(tmp_path / "t"))

    def racer():
        other.append(_mk(spark, [100], tag="new"))

    vt = _two_file_table(spark, tmp_path / "t")
    victim = VersionedTable(str(tmp_path / "t"), claim_backend=RaceOnce(racer))
    victim.delete_where(spark, "k < 5")
    got = _rows(victim.read(spark))
    # both effects present: delete applied AND the racer's row kept
    assert (100, "new100") in got
    assert all(k >= 5 for k, _ in got)
    assert victim.history()[-1]["op"] == "delete"
    assert len(victim.versions()) == 3  # base, append, delete


def test_cow_deletes_on_disjoint_files_both_land(spark, tmp_path):
    vt = _two_file_table(spark, tmp_path / "t")
    other = VersionedTable(str(tmp_path / "t"))

    def racer():
        other.delete_where(spark, "k >= 15")  # file B only

    victim = VersionedTable(str(tmp_path / "t"), claim_backend=RaceOnce(racer))
    victim.delete_where(spark, "k < 5")  # file A only
    assert _rows(victim.read(spark)) == _rows(_mk(spark, range(5, 15)))


def test_cow_merge_same_file_conflicts(spark, tmp_path):
    vt = _two_file_table(spark, tmp_path / "t")
    other = VersionedTable(str(tmp_path / "t"))

    def racer():
        other.delete_where(spark, "k = 1")  # rewrites file A

    victim = VersionedTable(str(tmp_path / "t"), claim_backend=RaceOnce(racer))
    with pytest.raises(ConcurrentWriteError, match="rewritten or dropped"):
        victim.merge_upsert(spark, _mk(spark, [2], tag="upd"), keys=["k"])
    # the loser left no manifest; the winner's delete stands
    assert (1, "x1") not in _rows(victim.read(spark))
    # a plain retry (fresh snapshot) succeeds
    VersionedTable(str(tmp_path / "t")).merge_upsert(
        spark, _mk(spark, [2], tag="upd"), keys=["k"]
    )
    assert (2, "upd2") in _rows(victim.read(spark))


def test_mor_delete_rebases_over_append(spark, tmp_path):
    vt = _two_file_table(spark, tmp_path / "t")
    other = VersionedTable(str(tmp_path / "t"))

    def racer():
        other.append(_mk(spark, [100], tag="new"))

    victim = VersionedTable(str(tmp_path / "t"), claim_backend=RaceOnce(racer))
    victim.delete_where(spark, "k < 3", mode="merge_on_read")
    got = _rows(victim.read(spark))
    assert (100, "new100") in got and all(k >= 3 for k, _ in got)


def test_mor_deletes_same_file_conflict(spark, tmp_path):
    vt = _two_file_table(spark, tmp_path / "t")
    other = VersionedTable(str(tmp_path / "t"))

    def racer():
        other.delete_where(spark, "k = 1", mode="merge_on_read")

    victim = VersionedTable(str(tmp_path / "t"), claim_backend=RaceOnce(racer))
    with pytest.raises(ConcurrentWriteError, match="eletion vector"):
        victim.delete_where(spark, "k = 2", mode="merge_on_read")
    # winner's delete intact; loser's positions never applied
    got = _rows(victim.read(spark))
    assert (1, "x1") not in got and (2, "x2") in got


def test_mor_deletes_disjoint_files_both_land(spark, tmp_path):
    vt = _two_file_table(spark, tmp_path / "t")
    other = VersionedTable(str(tmp_path / "t"))

    def racer():
        other.delete_where(spark, "k = 19", mode="merge_on_read")

    victim = VersionedTable(str(tmp_path / "t"), claim_backend=RaceOnce(racer))
    victim.delete_where(spark, "k = 0", mode="merge_on_read")
    got = _rows(victim.read(spark))
    assert (0, "x0") not in got and (19, "x19") not in got and len(got) == 18


def test_cow_conflicts_with_concurrent_rename(spark, tmp_path):
    vt = _two_file_table(spark, tmp_path / "t")
    other = VersionedTable(str(tmp_path / "t"))

    def racer():
        other.rename_column("v", "label")

    victim = VersionedTable(str(tmp_path / "t"), claim_backend=RaceOnce(racer))
    with pytest.raises(ConcurrentWriteError, match="schema|mapping"):
        victim.delete_where(spark, "k < 5")


def test_cow_conflicts_with_concurrent_constraint(spark, tmp_path):
    vt = _two_file_table(spark, tmp_path / "t")
    other = VersionedTable(str(tmp_path / "t"))

    def racer():
        other.add_constraint(spark, "k_ok", "k >= 0")

    victim = VersionedTable(str(tmp_path / "t"), claim_backend=RaceOnce(racer))
    with pytest.raises(ConcurrentWriteError, match="constraint"):
        victim.delete_where(spark, "k < 5")


def test_replace_where_rebases_over_disjoint_append(spark, tmp_path):
    vt = _two_file_table(spark, tmp_path / "t")
    other = VersionedTable(str(tmp_path / "t"))

    def racer():
        other.append(_mk(spark, [100], tag="new"))

    victim = VersionedTable(str(tmp_path / "t"), claim_backend=RaceOnce(racer))
    victim.replace_where(spark, "k < 5", _mk(spark, [0, 1], tag="r"))
    got = _rows(victim.read(spark))
    assert (0, "r0") in got and (100, "new100") in got
    assert (3, "x3") not in got


def test_optimize_rebases_over_append(spark, tmp_path):
    vt = _two_file_table(spark, tmp_path / "t")
    other = VersionedTable(str(tmp_path / "t"))

    def racer():
        other.append(_mk(spark, [100], tag="new"))

    victim = VersionedTable(str(tmp_path / "t"), claim_backend=RaceOnce(racer))
    victim.optimize(spark, target_rows_per_file=1000)
    got = _rows(victim.read(spark))
    assert len(got) == 21 and (100, "new100") in got


def test_append_racing_rename_column_raises(spark, tmp_path):
    """Blind-append rebase must NOT merge across a concurrent metadata
    change: a rename/drop landing between the append's validation and
    its claim could re-bind the old logical name to a physical column
    other files already use (Delta: MetadataChangedException)."""
    _two_file_table(spark, tmp_path / "t")
    other = VersionedTable(str(tmp_path / "t"))

    def racer():
        other.rename_column("v", "w")

    victim = VersionedTable(str(tmp_path / "t"), claim_backend=RaceOnce(racer))
    with pytest.raises(ConcurrentWriteError, match="schema|column mapping"):
        victim.append(_mk(spark, [100]))
    # the loser left no half-commit behind: head is the rename, and the
    # table reads cleanly under the new name
    assert other.history()[-1]["op"] == "rename_column"
    assert "w" in other.read(spark).columns


def test_append_racing_disjoint_append_still_rebases(spark, tmp_path):
    """Same-schema concurrent appends carry no metadata change and must
    keep composing (the r7 rebase contract is unchanged)."""
    _two_file_table(spark, tmp_path / "t")
    other = VersionedTable(str(tmp_path / "t"))

    def racer():
        other.append(_mk(spark, [200], tag="r"))

    victim = VersionedTable(str(tmp_path / "t"), claim_backend=RaceOnce(racer))
    victim.append(_mk(spark, [100], tag="a"))
    got = _rows(victim.read(spark))
    assert (100, "a100") in got and (200, "r200") in got
