"""The commit protocol is backend-independent (round 8, verdict item 6).

``VersionedTable`` needs exactly ONE storage primitive: an atomic
create-if-absent of the manifest object (``CommitClaimBackend``). These
tests prove the append-rebase + expected_head protocol holds against
both the POSIX default (tmp+fsync+os.link) and the object-store-shaped
``ConditionalPutClaim`` (single conditional create — S3
``PUT If-None-Match: *``), including under deterministically injected
races where a competitor claims the version between a writer's manifest
build and its claim call."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import Row

from aws_lakehouse_project_spark.plans.versioned import (
    CommitClaimBackend,
    ConcurrentWriteError,
    ConditionalPutClaim,
    PosixLinkClaim,
    TornManifestError,
    VersionedTable,
)

BACKENDS = [PosixLinkClaim, ConditionalPutClaim]


def _mk(spark, pairs):
    return spark.createDataFrame(
        [Row(k=k, v=v) for k, v in pairs], "k int, v string"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class RacyBackend(CommitClaimBackend):
    """Deterministically loses the first ``n_races`` claims: right
    before each claim, a competitor handle commits to the same table
    (winning that version number), so the inner claim returns False and
    the caller must take its rebase/abort path. This is the exact
    interleaving the 8-writer stress produces nondeterministically."""

    def __init__(self, inner: CommitClaimBackend, n_races: int, competitor):
        self.inner = inner
        self.n_races = n_races
        self.competitor = competitor  # zero-arg callable committing once
        self.lost = 0
        self._in_competitor = False

    def claim(self, final: str, payload: str) -> bool:
        if self.n_races > 0 and not self._in_competitor:
            self.n_races -= 1
            self._in_competitor = True  # competitor's commit claims freely
            try:
                self.competitor()
            finally:
                self._in_competitor = False
            self.lost += 1
        return self.inner.claim(final, payload)


@pytest.mark.parametrize("backend_cls", BACKENDS)
def test_full_protocol_on_backend(spark, tmp_path, backend_cls):
    """Representative op sequence — create, append, CoW merge, delete,
    restore, optimize, constraint — produces identical results on each
    backend."""
    vt = VersionedTable(
        str(tmp_path / "t"), stats_cols=["k"], claim_backend=backend_cls()
    )
    vt.write_full(_mk(spark, [(1, "a"), (2, "b")]).repartition(2, "k"))
    vt.append(_mk(spark, [(3, "c")]))
    vt.merge_upsert(spark, _mk(spark, [(2, "B"), (4, "d")]), keys=["k"])
    vt.delete_where(spark, "k = 1")
    assert _rows(vt.read(spark)) == [(2, "B"), (3, "c"), (4, "d")]
    v = vt.restore(1, spark=spark)
    assert _rows(vt.read(spark, v)) == [(1, "a"), (2, "b"), (3, "c")]
    vt.optimize(spark, target_rows_per_file=100)
    vt.add_constraint(spark, "k_pos", "k > 0")
    from aws_lakehouse_project_spark.plans.versioned import (
        ConstraintViolationError,
    )

    with pytest.raises(ConstraintViolationError):
        vt.append(_mk(spark, [(-1, "bad")]))
    assert _rows(vt.read(spark)) == [(1, "a"), (2, "b"), (3, "c")]


@pytest.mark.parametrize("backend_cls", BACKENDS)
def test_append_rebases_after_injected_lost_race(spark, tmp_path, backend_cls):
    """A writer that loses the claim race (twice) must rebase onto each
    winner's head: every competitor row survives alongside its own."""
    path = str(tmp_path / "t")
    competitor_vt = VersionedTable(path, claim_backend=backend_cls())

    seq = iter([(100, "c0"), (101, "c1")])

    def competitor():
        competitor_vt.append(_mk(spark, [next(seq)]))

    racy = RacyBackend(backend_cls(), n_races=0, competitor=competitor)
    vt = VersionedTable(path, claim_backend=racy)
    vt.write_full(_mk(spark, [(1, "base")]))
    racy.n_races = 2  # the append loses twice in a row, rebasing onto
    # each winner's head before retrying the next version number
    vt.append(_mk(spark, [(2, "mine")]))
    assert racy.lost == 2
    assert _rows(vt.read(spark)) == [
        (1, "base"),
        (2, "mine"),
        (100, "c0"),
        (101, "c1"),
    ]
    vs = vt.versions()
    assert vs == list(range(len(vs)))  # dense chain, no gaps


@pytest.mark.parametrize("backend_cls", BACKENDS)
def test_cow_rebases_after_injected_lost_race(spark, tmp_path, backend_cls):
    """A copy-on-write MERGE whose claim loses to an APPEND rebases
    onto the winner and lands both effects (WriteSerializable, r8) —
    and never silently clobbers the winner. Real conflicts (touched
    file rewritten) still raise: tests/test_occ.py."""
    path = str(tmp_path / "t")
    competitor_vt = VersionedTable(path, claim_backend=backend_cls())

    def competitor():
        competitor_vt.append(_mk(spark, [(99, "winner")]))

    racy = RacyBackend(backend_cls(), n_races=0, competitor=competitor)
    vt = VersionedTable(path, claim_backend=racy)
    vt.write_full(_mk(spark, [(1, "a")]))
    racy.n_races = 1  # next claim (the merge's) loses
    vt.merge_upsert(spark, _mk(spark, [(1, "A")]), keys=["k"])
    # the winner's commit is intact AND the merge landed after rebase
    assert _rows(vt.read(spark)) == [(1, "A"), (99, "winner")]
    assert vt.versions() == [0, 1, 2]


def test_conditional_put_stress_many_writers(spark, tmp_path):
    """The 8-writer append stress on the object-store-shaped backend:
    the conditional create must serialize every commit with no lost
    updates and a dense version chain — the 100 TB multi-writer story
    on S3 semantics, not just POSIX link."""
    vt = VersionedTable(str(tmp_path / "t"), claim_backend=ConditionalPutClaim())
    vt.write_full(_mk(spark, [(-1, "base")]))
    errors = []

    def writer(tid: int) -> None:
        try:
            w = VersionedTable(vt.path, claim_backend=ConditionalPutClaim())
            for j in range(3):
                w.append(_mk(spark, [(100 * tid + j, f"w{tid}_{j}")]))
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(t,)) for t in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []
    rows = _rows(vt.read(spark))
    assert len(rows) == 1 + 8 * 3 and len(set(rows)) == len(rows)
    vs = vt.versions()
    assert vs == list(range(len(vs)))
    counts = [h["n_rows"] for h in vt.history()]
    assert counts == sorted(counts) and counts[-1] == 25


class TornVisibilityClaim(CommitClaimBackend):
    """The atomic-visibility contract VIOLATION: creates the object
    empty, then writes the payload — the exists-but-empty window plain
    ``open(O_CREAT|O_EXCL)`` leaves, which the 8-writer stress caught
    as a flaky ``json.load`` failure in concurrent rebase reads. Kept
    as the regression fixture; ``hold_empty=True`` freezes the window
    open so the reader-side diagnosis is deterministic."""

    def __init__(self, hold_empty: bool = False):
        self.hold_empty = hold_empty

    def claim(self, final: str, payload: str) -> bool:
        import os

        try:
            fd = os.open(final, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        if self.hold_empty:
            os.close(fd)
            return True
        with os.fdopen(fd, "w") as fh:
            fh.write(payload)
        return True


def test_torn_manifest_fails_loudly(spark, tmp_path):
    """A manifest observable without its payload must raise the named
    contract error, not a bare JSON parse error."""
    vt = VersionedTable(str(tmp_path / "t"), claim_backend=TornVisibilityClaim())
    vt.write_full(_mk(spark, [(1, "a")]))
    torn = VersionedTable(
        str(tmp_path / "t"), claim_backend=TornVisibilityClaim(hold_empty=True)
    )
    torn.append(_mk(spark, [(2, "b")]))  # claims v1 but publishes no payload
    with pytest.raises(TornManifestError, match="atomic-visibility|atomically"):
        vt._manifest(1)


def test_conditional_put_visibility_is_atomic(spark, tmp_path):
    """Every manifest the ConditionalPutClaim model ever exposes under
    the log listing must parse — staged dotfiles are invisible to
    ``versions()`` and the link publishes payload+object in one
    syscall. A polling reader hammering the log during an 8-writer run
    must never observe a torn manifest (this exact loop flaked on the
    O_CREAT|O_EXCL model)."""
    vt = VersionedTable(str(tmp_path / "t"), claim_backend=ConditionalPutClaim())
    vt.write_full(_mk(spark, [(-1, "base")]))
    stop = threading.Event()
    torn: list[Exception] = []

    def reader() -> None:
        r = VersionedTable(vt.path, claim_backend=ConditionalPutClaim())
        while not stop.is_set():
            try:
                r._manifest(r.latest_version())
            except TornManifestError as exc:
                torn.append(exc)
                return

    errors: list[Exception] = []

    def writer(tid: int) -> None:
        try:
            w = VersionedTable(vt.path, claim_backend=ConditionalPutClaim())
            for j in range(3):
                w.append(_mk(spark, [(100 * tid + j, f"w{tid}_{j}")]))
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    rt = threading.Thread(target=reader)
    rt.start()
    threads = [threading.Thread(target=writer, args=(t,)) for t in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    stop.set()
    rt.join()
    assert torn == [] and errors == []
    assert vt.versions() == list(range(1 + 8 * 3))


def test_mixed_cow_append_stress_disjoint_writers(spark, tmp_path):
    """6 threads, each owning a disjoint key range living in its own
    file (range-partitioned seed), interleaving CoW merges on its own
    keys with blind appends — under the r8 WriteSerializable rules
    EVERY commit must land (merges rebase over everyone else's
    disjoint commits), the chain stays dense, and the final table holds
    every writer's last merge value plus every appended row."""
    vt = VersionedTable(str(tmp_path / "t"), claim_backend=ConditionalPutClaim())
    n_writers, per_file = 6, 10
    seed = [
        Row(k=w * 100 + i, v="seed")
        for w in range(n_writers)
        for i in range(per_file)
    ]
    vt.write_full(
        spark.createDataFrame(seed, "k int, v string").repartitionByRange(
            n_writers, "k"
        )
    )
    errors: list[Exception] = []

    def writer(w: int) -> None:
        try:
            t = VersionedTable(vt.path, claim_backend=ConditionalPutClaim())
            for j in range(2):
                # a real conflict (same file touched — possible if the
                # seed coalesced into fewer files) is retried from a
                # fresh snapshot, the documented client pattern; a
                # disjoint race rebases internally with no retry
                for attempt in range(10):
                    try:
                        t.merge_upsert(
                            spark,
                            spark.createDataFrame(
                                [Row(k=w * 100, v=f"m{w}_{j}")],
                                "k int, v string",
                            ),
                            keys=["k"],
                        )
                        break
                    except ConcurrentWriteError:
                        if attempt == 9:
                            raise
                t.append(
                    spark.createDataFrame(
                        [Row(k=1000 + w * 10 + j, v=f"a{w}_{j}")],
                        "k int, v string",
                    )
                )
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(n_writers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []
    vs = vt.versions()
    assert vs == list(range(1 + n_writers * 4))  # dense, no lost commits
    rows = {r["k"]: r["v"] for r in vt.read(spark).collect()}
    assert len(rows) == n_writers * per_file + n_writers * 2
    for w in range(n_writers):
        assert rows[w * 100] == f"m{w}_1"  # last merge won
        for j in range(2):
            assert rows[1000 + w * 10 + j] == f"a{w}_{j}"
