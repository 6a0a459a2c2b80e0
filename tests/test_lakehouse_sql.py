"""SQL front-end over the versioned transaction layer.

Each documented statement shape is driven end-to-end; mis-parses must
raise, never silently mutate the wrong thing."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import Row

from aws_lakehouse_project_spark.plans.lakehouse_sql import (
    LakehouseSession,
    _split_top,
)
from aws_lakehouse_project_spark.plans.versioned import (
    ConstraintViolationError,
    VersionedTable,
)


def _rows(df):
    return sorted((tuple(r) for r in df.collect()), key=str)


@pytest.fixture()
def lh(spark, tmp_path):
    lh = LakehouseSession(spark)
    lh.create("t", str(tmp_path / "t"), stats_cols=["k"])
    spark.createDataFrame(
        [Row(k=i, grp="a" if i < 3 else "b", v=float(i)) for i in range(6)],
        "k int, grp string, v double",
    ).createOrReplaceTempView("seed")
    lh.sql("CREATE TABLE t AS SELECT * FROM seed")
    return lh


def test_split_top():
    assert _split_top("a = f(x, y), b = 'p,q', c = 1") == [
        "a = f(x, y)", "b = 'p,q'", "c = 1"
    ]


def test_create_and_select(lh):
    assert lh.sql("SELECT COUNT(*) AS n FROM t").first()["n"] == 6
    assert lh.table("t").history()[0]["op"] == "overwrite"


def test_insert_into(lh):
    lh.sql("INSERT INTO t SELECT 99 AS k, 'c' AS grp, 9.0 AS v")
    assert lh.sql("SELECT COUNT(*) AS n FROM t").first()["n"] == 7


def test_insert_replace_where(lh):
    lh.sql(
        "INSERT INTO t REPLACE WHERE grp = 'a' "
        "SELECT k, grp, v * 100 AS v FROM t WHERE grp = 'a'"
    )
    got = _rows(lh.sql("SELECT v FROM t WHERE grp = 'a'"))
    assert got == [(0.0,), (100.0,), (200.0,)]
    assert lh.table("t").history()[-1]["op"] == "replace_where"


def test_delete_both_modes(lh):
    lh.sql("DELETE FROM t WHERE k = 5")
    lh.sql("DELETE /*+ MERGE_ON_READ */ FROM t WHERE k = 4")
    assert lh.sql("SELECT MAX(k) AS m FROM t").first()["m"] == 3
    m = lh.table("t")._manifest()
    assert m["op"] == "delete" and m["meta"]["mode"] == "merge_on_read"


def test_update_both_modes(lh):
    lh.sql("UPDATE t SET v = v * 10 WHERE grp = 'a'")
    lh.sql("UPDATE /*+ MERGE_ON_READ */ t SET v = v + 1, grp = 'z' WHERE k = 5")
    got = dict((r["k"], r["v"]) for r in lh.sql("SELECT k, v FROM t").collect())
    assert got[0] == 0.0 and got[1] == 10.0 and got[2] == 20.0 and got[5] == 6.0
    assert lh.sql("SELECT grp FROM t WHERE k = 5").first()["grp"] == "z"


def test_update_without_where_hits_all(lh):
    lh.sql("UPDATE t SET v = 0")
    assert _rows(lh.sql("SELECT DISTINCT v FROM t")) == [(0.0,)]


def test_merge_upsert(lh, spark):
    spark.createDataFrame(
        [Row(k=1, grp="upd", v=-1.0), Row(k=50, grp="new", v=50.0)],
        "k int, grp string, v double",
    ).createOrReplaceTempView("src")
    lh.sql(
        "MERGE INTO t USING src ON t.k = src.k "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    )
    got = dict((r["k"], r["grp"]) for r in lh.sql("SELECT k, grp FROM t").collect())
    assert got[1] == "upd" and got[50] == "new" and len(got) == 7


def test_merge_delete(lh, spark):
    spark.createDataFrame([Row(k=0), Row(k=2)], "k int").createOrReplaceTempView(
        "victims"
    )
    lh.sql("MERGE INTO t USING victims ON t.k = victims.k WHEN MATCHED THEN DELETE")
    assert _rows(lh.sql("SELECT k FROM t")) == [(1,), (3,), (4,), (5,)]


def test_merge_rejects_rich_on_clause(lh, spark):
    spark.createDataFrame([Row(k=1)], "k int").createOrReplaceTempView("src2")
    with pytest.raises(ValueError, match="MERGE ON"):
        lh.sql(
            "MERGE INTO t USING src2 ON t.k > src2.k "
            "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
        )


def test_time_travel_select(lh):
    lh.sql("DELETE FROM t WHERE k >= 3")
    assert lh.sql("SELECT COUNT(*) AS n FROM t").first()["n"] == 3
    assert (
        lh.sql("SELECT COUNT(*) AS n FROM t VERSION AS OF 0").first()["n"] == 6
    )
    ts = time.time()
    lh.sql("DELETE FROM t WHERE k = 0")
    assert (
        lh.sql(f"SELECT COUNT(*) AS n FROM t TIMESTAMP AS OF {ts}").first()["n"]
        == 3
    )


def test_describe_history_and_restore(lh):
    lh.sql("DELETE FROM t WHERE k < 3")
    hist = lh.sql("DESCRIBE HISTORY t")
    assert [r["op"] for r in hist.collect()] == ["overwrite", "delete"]
    assert all(r["timestamp"] is not None for r in hist.collect())
    lh.sql("RESTORE TABLE t TO VERSION AS OF 0")
    assert lh.sql("SELECT COUNT(*) AS n FROM t").first()["n"] == 6


def test_optimize_and_vacuum(lh):
    lh.sql("INSERT INTO t SELECT 7 AS k, 'b' AS grp, 7.0 AS v")
    lh.sql("OPTIMIZE t")
    # seconds-old versions sit under the in-flight-reader floor: a
    # count-only VACUUM is a safe no-op until the floor is explicitly
    # lifted (Delta's retentionDurationCheck opt-out)
    safe = lh.sql("VACUUM t RETAIN 1 VERSIONS").first()
    assert safe["removed_versions"] == 0
    dry = lh.sql("VACUUM t RETAIN 1 VERSIONS NO RETENTION CHECK DRY RUN").first()
    assert dry["removed_versions"] >= 1
    before = lh.sql("SELECT COUNT(*) AS n FROM t").first()["n"]
    lh.sql("VACUUM t RETAIN 1 VERSIONS NO RETENTION CHECK")
    assert lh.sql("SELECT COUNT(*) AS n FROM t").first()["n"] == before


def test_optimize_zorder(lh):
    v = lh.sql("OPTIMIZE t ZORDER BY (k, v)").first()
    assert v["op"] == "optimize"
    assert lh.sql("SELECT COUNT(*) AS n FROM t").first()["n"] == 6


def test_constraints_via_sql(lh):
    lh.sql("ALTER TABLE t ADD CONSTRAINT v_ok CHECK (v >= 0)")
    with pytest.raises(ConstraintViolationError):
        lh.sql("INSERT INTO t SELECT -1 AS k, 'x' AS grp, -5.0 AS v")
    lh.sql("ALTER TABLE t DROP CONSTRAINT v_ok")
    lh.sql("INSERT INTO t SELECT -1 AS k, 'x' AS grp, -5.0 AS v")
    assert lh.sql("SELECT COUNT(*) AS n FROM t").first()["n"] == 7


def test_join_versioned_with_plain_view(lh, spark):
    spark.createDataFrame(
        [Row(grp="a", label="alpha"), Row(grp="b", label="beta")],
        "grp string, label string",
    ).createOrReplaceTempView("dim")
    got = _rows(
        lh.sql(
            "SELECT d.label, COUNT(*) AS n FROM t JOIN dim d USING (grp) "
            "GROUP BY d.label"
        )
    )
    assert got == [("alpha", 3), ("beta", 3)]


def test_unknown_statement_raises(lh):
    with pytest.raises(ValueError, match="cannot parse"):
        lh.sql("TRUNCATE TABLE t")
    with pytest.raises(KeyError, match="unknown table"):
        lh.sql("DELETE FROM nope WHERE 1 = 1")


def test_select_sees_deletion_vectors(lh):
    lh.sql("DELETE /*+ MERGE_ON_READ */ FROM t WHERE k IN (1, 2)")
    assert _rows(lh.sql("SELECT k FROM t")) == [(0,), (3,), (4,), (5,)]


def test_register_existing_table(spark, tmp_path, lh):
    other = VersionedTable(str(tmp_path / "other"))
    other.write_full(spark.createDataFrame([Row(x=1)], "x int"))
    lh.register("other", other)
    assert lh.sql("SELECT x FROM other").first()["x"] == 1


def test_ctas_on_existing_table_requires_or_replace(lh):
    """Bare CTAS on a live table must error (Delta/ANSI CREATE TABLE);
    CREATE OR REPLACE TABLE is the explicit destructive form."""
    with pytest.raises(ValueError, match="already exists"):
        lh.sql("CREATE TABLE t AS SELECT 1 AS k, 'z' AS grp, 0.0 AS v")
    assert lh.sql("SELECT COUNT(*) AS n FROM t").first()["n"] == 6
    lh.sql("CREATE OR REPLACE TABLE t AS SELECT * FROM seed WHERE k < 2")
    assert lh.sql("SELECT COUNT(*) AS n FROM t").first()["n"] == 2


def test_vacuum_retain_hours_sql(spark, tmp_path, monkeypatch):
    """VACUUM t RETAIN n HOURS — Delta's surface form routed to the
    time-horizon retention (versions younger than the window survive;
    a huge window retains everything)."""
    import aws_lakehouse_project_spark.plans.versioned as V

    lh = LakehouseSession(spark)
    lh.create("tv", str(tmp_path / "tv"), stats_cols=["k"])
    spark.createDataFrame([Row(k=1)], "k int").createOrReplaceTempView(
        "seed_tv"
    )
    monkeypatch.setattr(V.time, "time", lambda: 1_000.0)
    lh.sql("CREATE TABLE tv AS SELECT * FROM seed_tv")
    monkeypatch.setattr(V.time, "time", lambda: 9_000.0)
    lh.sql("DELETE FROM tv WHERE k = 1")
    monkeypatch.undo()
    row = lh.sql("VACUUM tv RETAIN 1000000 HOURS DRY RUN").collect()[0]
    assert row["removed_versions"] == 0
    row = lh.sql("VACUUM tv RETAIN 0.5 HOURS").collect()[0]
    assert row["removed_versions"] == 1
    assert lh.sql("SELECT k FROM tv").count() == 0


def test_describe_detail(lh):
    row = lh.sql("DESCRIBE DETAIL t").collect()[0]
    assert row["version"] == 0
    assert row["num_files"] >= 1
    assert row["size_bytes"] > 0
    assert row["num_versions"] == 1
    assert row["stats_columns"] == "k"
    lh.sql("DELETE FROM t WHERE k = 0")
    row = lh.sql("DESCRIBE DETAIL t").collect()[0]
    assert row["version"] == 1 and row["num_versions"] == 2


def test_metadata_only_count(lh, spark, tmp_path):
    """SELECT COUNT(*) FROM t answers from manifest stats: correct
    across DML (incl. deletion vectors), version-travels, and — the
    proof it never touches data — still works after the data directory
    is renamed away."""
    import os
    import shutil

    assert lh.sql("SELECT COUNT(*) FROM t").collect()[0][0] == 6
    lh.sql("DELETE /*+ MERGE_ON_READ */ FROM t WHERE k < 2")  # DV path
    assert lh.sql("SELECT COUNT(*) FROM t").collect()[0][0] == 4
    assert (
        lh.sql("SELECT COUNT(*) AS n FROM t VERSION AS OF 0").collect()[0]["n"]
        == 6
    )
    # spark.sql column-name parity
    assert lh.sql("SELECT COUNT(*) FROM t").columns == ["count(1)"]
    # a filtered count falls through to Catalyst (and scans)
    assert lh.sql("SELECT COUNT(*) FROM t WHERE k >= 4").collect()[0][0] == 2
    # zero data I/O: hide the data dir; the metadata count still answers
    vt = lh.table("t")
    data = os.path.join(vt.path, "data")
    shutil.move(data, data + ".hidden")
    try:
        assert lh.sql("SELECT COUNT(*) FROM t").collect()[0][0] == 4
    finally:
        shutil.move(data + ".hidden", data)


def test_metadata_only_min_max(spark, lh):
    """SELECT MIN/MAX/COUNT from manifest stats alone — proven by
    answering with the data dir renamed away; DV'd and non-stat
    columns fall through to Catalyst (and then need the data)."""
    import os
    import shutil

    row = lh.sql("SELECT MIN(k) AS lo, MAX(k) AS hi, COUNT(*) AS n FROM t")
    assert tuple(row.collect()[0]) == (0, 5, 6)
    # spark.sql column-name parity without aliases
    assert lh.sql("SELECT MIN(k) FROM t").columns == ["min(k)"]
    vt = lh.table("t")
    data = os.path.join(vt.path, "data")
    shutil.move(data, data + ".hidden")
    try:
        got = lh.sql("SELECT MIN(k) AS lo, MAX(k) AS hi FROM t").collect()[0]
        assert tuple(got) == (0, 5)
        # version-pinned form answers from that manifest
        v0 = lh.sql("SELECT MAX(k) AS hi FROM t VERSION AS OF 0").collect()
        assert v0[0]["hi"] == 5
    finally:
        shutil.move(data + ".hidden", data)
    # a DV at the head makes metadata MIN/MAX unsafe: falls to Catalyst,
    # which scans and returns the POST-delete extrema
    lh.sql("DELETE /*+ MERGE_ON_READ */ FROM t WHERE k = 0")
    assert lh.sql("SELECT MIN(k) AS lo FROM t").collect()[0]["lo"] == 1
    # COUNT(*) alone stays metadata-only even with DVs (dv_counts exact)
    assert lh.sql("SELECT COUNT(*) FROM t").collect()[0][0] == 5


def test_null_count_stats_and_is_null_skipping(spark, tmp_path):
    """Per-file null counts: metadata COUNT(col) + IS NULL file
    skipping, with strict refusal falling through to Catalyst."""
    import os
    import shutil

    from pyspark.sql import functions as F

    lh = LakehouseSession(spark)
    vt = lh.create("n", str(tmp_path / "n"), stats_cols=["k", "v"])
    a = spark.createDataFrame(
        [(1, "x"), (2, None), (3, None)], "k int, v string"
    ).coalesce(1)
    b = spark.createDataFrame(
        [(4, "y"), (5, "z")], "k int, v string"
    ).coalesce(1)
    vt.write_full(a)
    vt.append(b)
    assert vt.col_non_null_count("v") == 3
    assert vt.col_non_null_count("k") == 5
    # IS NULL scan prunes the all-non-null file
    got = vt.scan(spark, "v", is_null=True)
    assert len(got.inputFiles()) == 1
    assert sorted(r["k"] for r in got.collect()) == [2, 3]
    # SQL: COUNT(v) metadata-only, proven with the data dir hidden
    data = os.path.join(vt.path, "data")
    shutil.move(data, data + ".hidden")
    try:
        row = lh.sql("SELECT COUNT(v) AS nv, COUNT(*) AS n FROM n").collect()
        assert tuple(row[0]) == (3, 5)
    finally:
        shutil.move(data + ".hidden", data)
    # DV at head -> metadata COUNT(v) refuses; SQL falls to Catalyst
    lh.sql("DELETE /*+ MERGE_ON_READ */ FROM n WHERE k = 1")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="deletion vectors"):
        vt.col_non_null_count("v")
    assert lh.sql("SELECT COUNT(v) AS nv FROM n").collect()[0]["nv"] == 2
    # mutual exclusion guard
    with _pytest.raises(ValueError, match="mutually exclusive"):
        vt.scan(spark, "v", eq="x", is_null=True)


def test_point_lookup_leaves_no_temp_view_and_spares_user_views(lh, spark):
    """The equality fast path must not leak catalog state: its working
    view is uuid-named and dropped after analysis, and a user's own
    temp view — even one named like the old fixed pattern — survives."""
    spark.createDataFrame([Row(x=1)], "x int").createOrReplaceTempView(
        "t__eqscan"
    )
    before = {t.name for t in spark.catalog.listTables() if t.isTemporary}
    got = lh.sql("SELECT k, v FROM t WHERE k = 2")
    assert [tuple(r) for r in got.collect()] == [(2, 2.0)]
    after = {t.name for t in spark.catalog.listTables() if t.isTemporary}
    assert after == before
    assert [tuple(r) for r in spark.table("t__eqscan").collect()] == [(1,)]
    spark.catalog.dropTempView("t__eqscan")


def test_optimize_where_sql_scopes_compaction(lh, spark):
    """OPTIMIZE t WHERE c BETWEEN lo AND hi routes the stats-plane
    scope through the SQL surface; content is unchanged and the scope
    rides the commit meta."""
    lh.sql("INSERT INTO t SELECT 100 AS k, 'z' AS grp, 1.0 AS v")
    lh.sql("INSERT INTO t SELECT 101 AS k, 'z' AS grp, 2.0 AS v")
    before = _rows(lh.sql("SELECT k, grp, v FROM t"))
    lh.sql("OPTIMIZE t WHERE k BETWEEN 90 AND 200")
    vt = lh.table("t")
    m = vt._manifest()
    assert m["op"] == "optimize"
    assert m["meta"]["where"] == ["k", "90", "200"]
    assert _rows(lh.sql("SELECT k, grp, v FROM t")) == before


def test_restore_timestamp_as_of(lh, spark):
    import time as _t

    v0_rows = _rows(lh.sql("SELECT * FROM t"))
    ts_after_v0 = _t.time()
    _t.sleep(0.05)
    lh.sql("DELETE FROM t WHERE grp = 'a'")
    lh.sql(f"RESTORE TABLE t TO TIMESTAMP AS OF {ts_after_v0}")
    assert _rows(lh.sql("SELECT * FROM t")) == v0_rows


def test_create_table_clone_sql(lh, spark, tmp_path):
    lh.create("c", str(tmp_path / "c"))
    r = lh.sql("CREATE TABLE c SHALLOW CLONE t").first()
    assert r["op"] == "clone"
    assert _rows(lh.sql("SELECT * FROM c")) == _rows(lh.sql("SELECT * FROM t"))
    # clone evolves independently of the source
    lh.sql("DELETE FROM c WHERE grp = 'a'")
    assert len(_rows(lh.sql("SELECT * FROM c"))) < len(
        _rows(lh.sql("SELECT * FROM t"))
    )
    # cloning at a version pins the snapshot
    lh.create("c0", str(tmp_path / "c0"))
    lh.sql("DELETE FROM t WHERE grp = 'b'")
    lh.sql("CREATE TABLE c0 DEEP CLONE t VERSION AS OF 0")
    assert len(_rows(lh.sql("SELECT * FROM c0"))) == 6
    # a second clone into an existing table refuses
    with pytest.raises(ValueError, match="already has a table"):
        lh.sql("CREATE TABLE c SHALLOW CLONE t")


def test_table_changes_tvf(lh, spark):
    """Delta's table_changes TVF: SELECT over the row-level CDF with
    _change_type and _commit_version, starting version INCLUSIVE,
    version 0 = the initial snapshot as inserts."""
    lh.sql("DELETE FROM t WHERE grp = 'a'")                     # v1
    lh.sql("UPDATE t SET v = v + 10 WHERE k = 5")               # v2
    rows = _rows(
        lh.sql(
            "SELECT _change_type, k, _commit_version "
            "FROM TABLE_CHANGES('t', 1) ORDER BY _commit_version, k"
        )
    )
    # v1: three deletes (k 0..2); v2: UPDATE pairs carry Delta's full
    # CDF vocabulary (single-commit diffs tag pre/postimage)
    assert ("delete", 0, 1) in rows and ("delete", 2, 1) in rows
    assert ("update_preimage", 5, 2) in rows
    assert ("update_postimage", 5, 2) in rows
    assert all(cv in (1, 2) for _, _, cv in rows)
    # inclusive lo=0 prepends the initial snapshot as inserts
    n0 = lh.sql(
        "SELECT COUNT(*) AS n FROM TABLE_CHANGES('t', 0, 0)"
    ).first()["n"]
    assert n0 == 6
    # UPDATE pairs still isolate when a multi-commit range is sliced
    # to the merge commit alone, and the TVF composes with plain SQL
    agg = lh.sql(
        "SELECT _change_type, COUNT(*) AS n FROM TABLE_CHANGES('t', 1, 1) "
        "GROUP BY _change_type"
    ).first()
    assert (agg["_change_type"], agg["n"]) == ("delete", 3)
    with pytest.raises(ValueError, match="unknown table"):
        lh.sql("SELECT * FROM TABLE_CHANGES('nope', 0)")


def test_table_changes_range_validation(lh, spark, tmp_path):
    """Out-of-range TABLE_CHANGES requests raise a clean ValueError
    (Delta's behavior) instead of a raw missing-manifest failure; an
    empty table is named explicitly."""
    head = lh.table("t").latest_version()
    with pytest.raises(ValueError, match="out of bounds"):
        lh.sql(f"SELECT * FROM TABLE_CHANGES('t', 0, {head + 5})")
    with pytest.raises(ValueError, match="out of bounds"):
        lh.sql(f"SELECT * FROM TABLE_CHANGES('t', {head + 1})")
    with pytest.raises(ValueError, match="out of bounds"):
        lh.sql("SELECT * FROM TABLE_CHANGES('t', 2, 1)")
    lh.create("empty", str(tmp_path / "empty"))
    with pytest.raises(ValueError, match="no commits"):
        lh.sql("SELECT * FROM TABLE_CHANGES('empty', 0)")


def test_table_changes_vacuumed_range_raises(lh):
    """Review fix: a TABLE_CHANGES range whose lo falls below the
    retention horizon raises VacuumedVersionError (Delta's behavior)
    instead of silently returning only the retained versions' feed."""
    from aws_lakehouse_project_spark.plans.versioned import (
        VacuumedVersionError,
    )

    lh.sql("DELETE FROM t WHERE k = 0")                          # v1
    lh.sql("UPDATE t SET v = v + 1 WHERE k = 5")                 # v2
    lh.sql("VACUUM t RETAIN 1 VERSIONS NO RETENTION CHECK")
    oldest = lh.table("t").versions()[0]
    assert oldest > 0
    with pytest.raises(VacuumedVersionError, match="retention horizon"):
        lh.sql("SELECT * FROM TABLE_CHANGES('t', 0)")
    # lo == oldest still needs the vacuumed (oldest-1) manifest to diff
    with pytest.raises(VacuumedVersionError, match="retention horizon"):
        lh.sql(f"SELECT * FROM TABLE_CHANGES('t', {oldest})")
    # reading from the first servable version works
    lh.sql("UPDATE t SET v = v + 1 WHERE k = 4")  # ensure a live commit
    assert (
        lh.sql(
            f"SELECT COUNT(*) AS n FROM TABLE_CHANGES('t', {oldest + 1})"
        ).first()["n"]
        >= 0
    )


def test_not_null_constraint(lh, spark):
    """ALTER TABLE ... ALTER COLUMN c SET NOT NULL (r14): validated
    against existing data, enforced on every later commit through the
    CHECK channel, surfaced in DESCRIBE DETAIL, dropped via DROP NOT
    NULL; the reserved __notnull__ name is fenced from user CHECK DDL."""
    r = lh.sql("ALTER TABLE t ALTER COLUMN grp SET NOT NULL").first()
    assert r["op"] == "set_not_null"
    row = lh.sql("DESCRIBE DETAIL t").collect()[0]
    assert row["not_null_columns"] == "grp"
    # a NULL insert refuses and the head does not move
    head = lh.table("t").latest_version()
    spark.createDataFrame(
        [Row(k=77, grp=None, v=1.0)], "k int, grp string, v double"
    ).createOrReplaceTempView("nn_bad")
    with pytest.raises(ConstraintViolationError):
        lh.sql("INSERT INTO t SELECT * FROM nn_bad")
    assert lh.table("t").latest_version() == head
    # non-NULL writes still flow
    spark.createDataFrame(
        [Row(k=78, grp="c", v=2.0)], "k int, grp string, v double"
    ).createOrReplaceTempView("nn_ok")
    lh.sql("INSERT INTO t SELECT * FROM nn_ok")
    # double-SET refuses; dropping re-admits NULLs
    with pytest.raises(ValueError, match="already NOT NULL"):
        lh.sql("ALTER TABLE t ALTER COLUMN grp SET NOT NULL")
    lh.sql("ALTER TABLE t ALTER COLUMN grp DROP NOT NULL")
    lh.sql("INSERT INTO t SELECT * FROM nn_bad")
    assert lh.sql(
        "SELECT COUNT(*) AS n FROM t WHERE grp IS NULL"
    ).first()["n"] == 1
    # SET refuses while existing NULLs remain
    with pytest.raises(ConstraintViolationError, match="NULL"):
        lh.sql("ALTER TABLE t ALTER COLUMN grp SET NOT NULL")
    # unknown column / not-declared drops are named
    with pytest.raises(ValueError, match="no column"):
        lh.sql("ALTER TABLE t ALTER COLUMN nope SET NOT NULL")
    with pytest.raises(ValueError, match="not declared"):
        lh.sql("ALTER TABLE t ALTER COLUMN v DROP NOT NULL")
    # the reserved prefix is fenced from user CHECK DDL
    with pytest.raises(ValueError, match="reserved"):
        lh.sql(
            "ALTER TABLE t ADD CONSTRAINT __notnull__v CHECK (v > 0)"
        )
    with pytest.raises(ValueError, match="DROP NOT NULL"):
        lh.table("t").drop_constraint("__notnull__v")


def test_not_null_wap_integration(lh, spark):
    """NOT NULL rides the WAP staging pass: a staged write carrying a
    NULL is rejected BEFORE any audit runs and before visibility —
    the head never moves, staged files are cleaned up."""
    lh.sql("ALTER TABLE t ALTER COLUMN grp SET NOT NULL")
    head = lh.table("t").latest_version()
    bad = spark.createDataFrame(
        [Row(k=90, grp=None, v=3.0)], "k int, grp string, v double"
    )
    with pytest.raises(ConstraintViolationError):
        lh.table("t").write_audit_publish(
            spark, bad, audits=[], mode="append"
        )
    assert lh.table("t").latest_version() == head
    good = spark.createDataFrame(
        [Row(k=91, grp="d", v=4.0)], "k int, grp string, v double"
    )
    v = lh.table("t").write_audit_publish(spark, good, audits=[], mode="append")
    assert v == head + 1


def test_drop_table_and_show_tables(lh, spark, tmp_path):
    """DROP TABLE / DROP MATERIALIZED VIEW (r14): deletes the directory
    (an MV's hidden _support tables with it) and unregisters; each verb
    refuses the other's artifact kind; IF EXISTS tolerates absence;
    SHOW TABLES lists the registry."""
    import os

    rows = {r["name"]: r for r in lh.sql("SHOW TABLES").collect()}
    assert rows["t"]["exists"] and not rows["t"]["is_materialized_view"]
    # an MV with a COUNT(DISTINCT) support table
    lh.create("mv", str(tmp_path / "mv"))
    lh.sql(
        "CREATE MATERIALIZED VIEW mv AS SELECT grp, "
        "COUNT(DISTINCT k) AS nk, COUNT(*) AS n FROM t GROUP BY grp"
    )
    mv_path = lh.table("mv").path
    assert os.path.isdir(os.path.join(mv_path, "_support", "nk"))
    with pytest.raises(ValueError, match="use DROP MATERIALIZED VIEW"):
        lh.sql("DROP TABLE mv")
    with pytest.raises(ValueError, match="use DROP TABLE"):
        lh.sql("DROP MATERIALIZED VIEW t")
    r = lh.sql("DROP MATERIALIZED VIEW mv").first()
    assert r["dropped"] == 1 and not os.path.exists(mv_path)
    with pytest.raises(KeyError, match="cannot drop"):
        lh.sql("DROP MATERIALIZED VIEW mv")
    assert lh.sql("DROP TABLE IF EXISTS mv").first()["dropped"] == 0
    t_path = lh.table("t").path
    lh.sql("DROP TABLE t")
    assert not os.path.exists(t_path)
    assert "t" not in {r2["name"] for r2 in lh.sql("SHOW TABLES").collect()}
