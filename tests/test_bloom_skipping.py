"""Per-file Bloom sidecar data skipping: scan(eq=...) point lookups
(plans/versioned.py::_write_bloom_sidecars / _bloom_prune_files)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import Row, functions as F

from aws_lakehouse_project_spark.plans.versioned import VersionedTable


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def bt(tmp_path):
    return VersionedTable(
        str(tmp_path / "t"), stats_cols=["k"], bloom_cols=["k"]
    )


def _seed(spark, bt, n=4000, parts=6):
    # k = 7*id: high-cardinality, every file spans ~the full range
    df = spark.range(n).select(
        (F.col("id") * 7).alias("k"), F.rand(7).alias("v")
    )
    bt.write_full(df.repartition(parts))
    return df


def test_sidecar_written_and_prunes_vs_minmax(spark, bt):
    _seed(spark, bt)
    assert glob.glob(os.path.join(bt.path, "data", "*", "_bloom-k.json"))
    probe = 7 * 1234
    n_all = len(bt.read(spark).inputFiles())
    n_minmax = len(bt.scan(spark, "k", lo=probe, hi=probe).inputFiles())
    pruned = bt.scan(spark, "k", eq=probe)
    assert n_minmax == n_all  # random layout: min/max cannot prune
    assert len(pruned.inputFiles()) < n_minmax
    assert _rows(pruned) == _rows(bt.read(spark).where(F.col("k") == probe))


def test_no_false_negatives_sampled_keys(spark, bt):
    _seed(spark, bt, n=2000, parts=5)
    for kk in range(0, 2000, 397):
        probe = 7 * kk
        got = bt.scan(spark, "k", eq=probe).where(F.col("k") == probe)
        assert got.count() == 1, probe


def test_missing_key_prunes_everything_or_fp(spark, bt):
    _seed(spark, bt, n=2000, parts=5)
    # 3 is never a multiple of 7: bloom may false-positive a file or
    # two, but the residual filter yields zero rows either way
    df = bt.scan(spark, "k", eq=3)
    assert df.count() == 0


def test_eq_exclusive_with_range(spark, bt):
    _seed(spark, bt, n=100, parts=2)
    with pytest.raises(ValueError, match="mutually exclusive"):
        bt.scan(spark, "k", lo=1, eq=2)


def test_string_key_type_hash_layout(spark, tmp_path):
    bt = VersionedTable(
        str(tmp_path / "s"), stats_cols=["name"], bloom_cols=["name"]
    )
    df = spark.createDataFrame(
        [Row(name=f"user-{i:05d}", v=i) for i in range(3000)]
    )
    bt.write_full(df.repartition(5))
    pruned = bt.scan(spark, "name", eq="user-01234")
    assert len(pruned.inputFiles()) < 5
    assert _rows(pruned) == [("user-01234", 1234)]


def test_cow_delete_keeps_carried_sidecars(spark, bt):
    _seed(spark, bt, n=3000, parts=6)
    bt.delete_where(spark, "k % 70 = 0")  # rewrites only touched files
    probe = 7 * 1001  # 7007 % 70 != 0 → survives
    pruned = bt.scan(spark, "k", eq=probe)
    n_all = len(bt.read(spark).inputFiles())
    assert len(pruned.inputFiles()) < n_all
    assert _rows(pruned) == _rows(bt.read(spark).where(F.col("k") == probe))


def test_rename_column_keeps_sidecars_physical(spark, bt):
    """Sidecars are keyed by PHYSICAL name: a rename must not orphan
    them, and the scan under the new logical name still prunes."""
    _seed(spark, bt, n=3000, parts=6)
    bt.rename_column("k", "key_id")
    probe = 7 * 999
    pruned = bt.scan(spark, "key_id", eq=probe)
    assert len(pruned.inputFiles()) < len(bt.read(spark).inputFiles())
    assert pruned.where(F.col("key_id") == probe).count() == 1


def test_vacuum_spares_live_sidecars_reclaims_dead(spark, bt):
    import time as _time

    _seed(spark, bt, n=2000, parts=4)
    live_sides = set(
        glob.glob(os.path.join(bt.path, "data", "*", "_bloom-k.json"))
    )
    assert live_sides
    bt.write_full(
        spark.range(100).select(F.col("id").alias("k"), F.lit(0.0).alias("v"))
    )  # v0's files (and their sidecars' dirs) now dead
    res = bt.vacuum(retain_last=1, retain_recent_s=0.0)
    assert res["removed_versions"] == 1
    for s in live_sides:
        assert not os.path.exists(s)  # dead dir's sidecar reclaimed
    new_sides = glob.glob(os.path.join(bt.path, "data", "*", "_bloom-k.json"))
    assert new_sides  # head's sidecar survived
    # second vacuum with nothing to drop must not touch the live sidecar
    bt.vacuum(retain_last=1, now=_time.time() + 10_000.0)
    assert all(os.path.exists(s) for s in new_sides)


def test_scan_eq_without_bloom_cols_still_correct(spark, tmp_path):
    vt = VersionedTable(str(tmp_path / "p"), stats_cols=["k"])
    df = spark.range(500).select(F.col("id").alias("k"))
    vt.write_full(df.repartition(3))
    assert vt.scan(spark, "k", eq=123).count() == 1


def test_bloom_cols_persist_to_fresh_handles(spark, bt):
    """bloom_cols is TABLE metadata: a fresh handle (no constructor
    arg) must keep writing sidecars on its own commits, and its point
    lookups must prune."""
    _seed(spark, bt, n=2000, parts=4)
    fresh = VersionedTable(bt.path)  # no bloom_cols passed
    extra = spark.range(2000, 4000).select(
        (F.col("id") * 7).alias("k"), F.rand(9).alias("v")
    )
    fresh.append(extra.repartition(3))
    sides = glob.glob(os.path.join(bt.path, "data", "*", "_bloom-k.json"))
    assert len(sides) == 2  # both commits carry a sidecar
    probe = 7 * 3210  # lives only in the fresh handle's commit
    pruned = fresh.scan(spark, "k", eq=probe)
    assert len(pruned.inputFiles()) < len(fresh.read(spark).inputFiles())
    assert pruned.where(F.col("k") == probe).count() == 1


def test_bloom_cols_explicit_empty_disables(spark, bt):
    _seed(spark, bt, n=1000, parts=3)
    off = VersionedTable(bt.path, bloom_cols=[])
    off.append(
        spark.range(1000, 2000).select(
            (F.col("id") * 7).alias("k"), F.rand(3).alias("v")
        )
    )
    m = off._manifest()
    assert "bloom_cols" not in m  # persisted setting cleared
    # new commit wrote no sidecar; older sidecars still prune their files
    dirs = {os.path.dirname(f) for f in m["files"]}
    newest = [
        d for d in dirs
        if not glob.glob(os.path.join(off.path, d, "_bloom-k.json"))
    ]
    assert newest  # the disabled commit's dir has no sidecar


def test_sql_equality_select_uses_bloom_skipping(spark, bt):
    """LakehouseSQL point lookups route through scan(eq=): fewer input
    files than the full view, identical rows to the Catalyst path."""
    from aws_lakehouse_project_spark.plans.lakehouse_sql import LakehouseSession

    _seed(spark, bt, n=3000, parts=6)
    lh = LakehouseSession(spark)
    lh.register("t", bt)
    probe = 7 * 1500
    fast = lh.sql(f"SELECT k, v FROM t WHERE k = {probe}")
    assert len(fast.inputFiles()) < len(bt.read(spark).inputFiles())
    slow = bt.read(spark).where(F.col("k") == probe).select("k", "v")
    assert _rows(fast) == _rows(slow)
    # filtered COUNT over the pruned view stays exact
    n = lh.sql(f"SELECT COUNT(*) AS n FROM t WHERE k = {probe}").first()["n"]
    assert n == 1
    # string-literal form parses and matches (no rows for this value)
    assert lh.sql("SELECT k FROM t WHERE k = '-1'").count() == 0


def test_optimize_rewritten_files_get_fresh_sidecars(spark, bt):
    """OPTIMIZE goes through the same commit chokepoint: packed files
    must carry a fresh sidecar and point lookups keep pruning."""
    _seed(spark, bt, n=3000, parts=6)
    bt.optimize(spark, target_rows_per_file=10_000)  # packs all 6 files
    m = bt._manifest()
    assert m["op"] == "optimize"
    for d in {os.path.dirname(f) for f in m["files"]}:
        assert glob.glob(os.path.join(bt.path, d, "_bloom-k.json")), d
    probe = 7 * 2999
    pruned = bt.scan(spark, "k", eq=probe)
    assert _rows(pruned) == _rows(bt.read(spark).where(F.col("k") == probe))


def test_reader_of_retained_head_survives_concurrent_vacuum(spark, bt):
    """A reader that resolved the HEAD manifest before vacuum ran must
    scan cleanly afterwards — vacuum never touches retained files."""
    _seed(spark, bt, n=1000, parts=3)
    bt.write_full(
        spark.range(50).select(F.col("id").alias("k"), F.lit(1.0).alias("v"))
    )
    df = bt.read(spark)  # plan resolved against the retained head
    bt.vacuum(retain_last=1, retain_recent_s=0.0)  # drops v0 and reclaims its files
    assert df.count() == 50  # the lazy plan still executes cleanly


def test_sql_create_bloom_index_with_backfill(spark, tmp_path):
    """CREATE BLOOMFILTER INDEX ... WITH BACKFILL: existing files get
    sidecars immediately and point lookups prune; DROP clears the
    persisted setting."""
    from aws_lakehouse_project_spark.plans.lakehouse_sql import (
        LakehouseSession,
    )

    vt = VersionedTable(str(tmp_path / "t"), stats_cols=["k"])
    df = spark.range(3000).select(
        (F.col("id") * 7).alias("k"), F.rand(5).alias("v")
    )
    vt.write_full(df.repartition(6))
    lh = LakehouseSession(spark)
    lh.register("t", vt)
    lh.sql("CREATE BLOOMFILTER INDEX FOR COLUMNS (k) ON t WITH BACKFILL")
    assert vt._manifest().get("bloom_cols") == ["k"]
    probe = 7 * 1500
    pruned = vt.scan(spark, "k", eq=probe)
    assert len(pruned.inputFiles()) < 6  # backfilled sidecars prune
    assert pruned.where(F.col("k") == probe).count() == 1
    # the setting persists to fresh handles through the delta log
    fresh = VersionedTable(vt.path)
    assert fresh._effective_bloom_cols() == ["k"]
    lh.sql("DROP BLOOMFILTER INDEX ON t")
    assert "bloom_cols" not in vt._manifest()


def test_set_bloom_cols_rejects_unknown_column(spark, tmp_path):
    vt = VersionedTable(str(tmp_path / "t"))
    vt.write_full(spark.range(10).select(F.col("id").alias("k")))
    with pytest.raises(ValueError, match="not in schema"):
        vt.set_bloom_cols(spark, ["nope"])


def test_bloom_with_deletion_vectors_stays_exact(spark, bt):
    """A DV'd key may still pass the (stale) sidecar — the residual
    filter + DV anti-join must yield zero rows; surviving keys keep
    pruning and return exactly their rows."""
    _seed(spark, bt, n=2000, parts=4)
    dead, alive = 7 * 500, 7 * 501
    bt.delete_where(spark, f"k = {dead}", mode="merge_on_read")
    assert bt.scan(spark, "k", eq=dead).count() == 0
    got = bt.scan(spark, "k", eq=alive)
    assert len(got.inputFiles()) < 4
    assert [r["k"] for r in got.collect()] == [alive]


def test_python_twin_matches_jvm_hash_layout(spark):
    """block_and_mask_from_hashes must agree bit-for-bit with the JVM
    bloom_block_and_mask for every key type the sidecars index — the
    invariant the driver-side probe rests on."""
    from pyspark.sql import Row

    from aws_lakehouse_project_spark.functions.bloom import (
        block_and_mask_from_hashes,
        bloom_block_and_mask,
    )

    import random

    rng = random.Random(23)
    for nblocks, df in [
        (
            1 << 10,
            spark.createDataFrame(
                [Row(k=rng.randrange(-(2**62), 2**62)) for _ in range(200)],
                "k long",
            ),
        ),
        (
            1 << 7,
            spark.createDataFrame(
                [Row(k=f"key-{rng.random()}") for _ in range(200)],
                "k string",
            ),
        ),
        (
            16,
            spark.createDataFrame(
                [Row(k=rng.randrange(-(2**31), 2**31)) for _ in range(200)],
                "k int",
            ),
        ),
    ]:
        block, mask = bloom_block_and_mask(F.col("k"), nblocks)
        rows = df.select(
            block.alias("b"),
            mask.alias("m"),
            F.xxhash64(F.col("k"), F.lit(1)).alias("h1"),
            F.xxhash64(F.col("k"), F.lit(2)).alias("h2"),
        ).collect()
        for r in rows:
            pb, pm = block_and_mask_from_hashes(r["h1"], r["h2"], nblocks)
            assert pb == r["b"], (nblocks, r)
            assert pm == r["m"] & ((1 << 64) - 1), (nblocks, r)
