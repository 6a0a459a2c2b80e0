"""Declarative materialized views (plans/matview.py + the SQL front
end): REFRESH must be indistinguishable from recomputation, watermarks
must survive fresh handles, retired groups must disappear, NULL group
keys must be refused loudly, and a vacuumed watermark must force FULL."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import Row, functions as F

from aws_lakehouse_project_spark.plans.lakehouse_sql import LakehouseSession
from aws_lakehouse_project_spark.plans.matview import (
    HIDDEN_COUNT,
    definition,
    refresh_materialized_view,
)
from aws_lakehouse_project_spark.plans.versioned import (
    VacuumedVersionError,
    VersionedTable,
)


def _mk(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, amt=Decimal(a)) for k, a in rows],
        "k string, amt decimal(12,2)",
    )


@pytest.fixture()
def lh(spark, tmp_path):
    s = LakehouseSession(spark)
    s.create("base", str(tmp_path / "base"))
    s.create("mv", str(tmp_path / "mv"))
    return s


def _create(spark, lh, rows):
    _mk(spark, rows).createOrReplaceTempView("src0")
    lh.sql("CREATE TABLE base AS SELECT * FROM src0")
    lh.sql(
        "CREATE MATERIALIZED VIEW mv AS "
        "SELECT k, SUM(amt) AS total, COUNT(*) AS n FROM base GROUP BY k"
    )


def _mv_rows(lh):
    return {
        (r["k"], r["total"], r["n"])
        for r in lh.sql("SELECT k, total, n FROM mv").collect()
    }


def _recompute(lh):
    return {
        (r["k"], r["total"], r["n"])
        for r in lh.sql(
            "SELECT k, SUM(amt) AS total, COUNT(*) AS n FROM base GROUP BY k"
        ).collect()
    }


def test_refresh_equals_recompute_across_commits(spark, lh):
    _create(spark, lh, [("a", "1.00"), ("a", "2.00"), ("b", "5.00")])
    lh.sql("UPDATE base SET amt = amt * 2 WHERE k = 'a'")
    _mk(spark, [("c", "9.00")]).createOrReplaceTempView("late")
    lh.sql("INSERT INTO base SELECT * FROM late")
    r = lh.sql("REFRESH MATERIALIZED VIEW mv").first()
    assert r["mode"] == "incremental"
    assert _mv_rows(lh) == _recompute(lh)


def test_group_retires_and_is_born(spark, lh):
    _create(spark, lh, [("a", "1.00"), ("b", "5.00")])
    lh.sql("DELETE FROM base WHERE k = 'a'")
    _mk(spark, [("z", "3.00")]).createOrReplaceTempView("newgrp")
    lh.sql("INSERT INTO base SELECT * FROM newgrp")
    lh.sql("REFRESH MATERIALIZED VIEW mv")
    got = _mv_rows(lh)
    assert got == _recompute(lh)
    assert {k for k, *_ in got} == {"b", "z"}


def test_noop_refresh_does_not_commit(spark, lh):
    _create(spark, lh, [("a", "1.00")])
    v0 = lh.table("mv").latest_version()
    r = lh.sql("REFRESH MATERIALIZED VIEW mv").first()
    assert r["mode"] == "noop" and r["version"] == v0
    assert lh.table("mv").latest_version() == v0


def test_watermark_survives_fresh_handles(spark, lh, tmp_path):
    """The definition + watermark ride the commit meta — a brand-new
    session over the same paths refreshes with no driver state."""
    _create(spark, lh, [("a", "1.00"), ("b", "2.00")])
    lh.sql("UPDATE base SET amt = amt + 1 WHERE k = 'b'")
    fresh = LakehouseSession(spark)
    fresh.create("base", str(tmp_path / "base"))
    fresh.create("mv", str(tmp_path / "mv"))
    r = fresh.sql("REFRESH MATERIALIZED VIEW mv").first()
    assert r["mode"] == "incremental"
    assert _mv_rows(fresh) == _recompute(fresh)
    d = definition(fresh.table("mv"))
    assert d["base_version"] == fresh.table("base").latest_version()


def test_hidden_count_when_not_selected(spark, lh):
    _mk(spark, [("a", "1.00"), ("a", "2.00")]).createOrReplaceTempView("s")
    lh.sql("CREATE TABLE base AS SELECT * FROM s")
    lh.sql(
        "CREATE MATERIALIZED VIEW mv AS "
        "SELECT k, SUM(amt) AS total FROM base GROUP BY k"
    )
    assert HIDDEN_COUNT in lh.table("mv").read(spark).columns
    lh.sql("DELETE FROM base WHERE k = 'a'")
    lh.sql("REFRESH MATERIALIZED VIEW mv")
    assert lh.sql("SELECT * FROM mv").count() == 0  # retired via hidden n


def test_sum_expression(spark, lh):
    _mk(spark, [("a", "1.00"), ("a", "2.00")]).createOrReplaceTempView("s")
    lh.sql("CREATE TABLE base AS SELECT * FROM s")
    lh.sql(
        "CREATE MATERIALIZED VIEW mv AS "
        "SELECT k, SUM(amt * 2) AS dbl FROM base GROUP BY k"
    )
    _mk(spark, [("a", "10.00")]).createOrReplaceTempView("more")
    lh.sql("INSERT INTO base SELECT * FROM more")
    lh.sql("REFRESH MATERIALIZED VIEW mv")
    [r] = lh.sql("SELECT k, dbl FROM mv").collect()
    assert (r["k"], r["dbl"]) == ("a", Decimal("26.00"))


def test_vacuumed_watermark_raises_then_full_rebuilds(spark, lh):
    _create(spark, lh, [("a", "1.00"), ("b", "2.00")])
    base = lh.table("base")
    lh.sql("UPDATE base SET amt = amt + 1 WHERE k = 'a'")
    lh.sql("DELETE FROM base WHERE k = 'b'")
    base.vacuum(retain_last=1, min_file_age_s=0.0, retain_recent_s=0.0)
    with pytest.raises(VacuumedVersionError):
        lh.sql("REFRESH MATERIALIZED VIEW mv")
    r = lh.sql("REFRESH MATERIALIZED VIEW mv FULL").first()
    assert r["mode"] == "full"
    assert _mv_rows(lh) == _recompute(lh)
    # and the watermark is re-armed: further increments fold
    _mk(spark, [("a", "5.00")]).createOrReplaceTempView("inc")
    lh.sql("INSERT INTO base SELECT * FROM inc")
    r = lh.sql("REFRESH MATERIALIZED VIEW mv").first()
    assert r["mode"] == "incremental"
    assert _mv_rows(lh) == _recompute(lh)


def test_null_group_key_rejected_at_create(spark, lh):
    spark.createDataFrame(
        [Row(k=None, amt=Decimal("1.00"))], "k string, amt decimal(12,2)"
    ).createOrReplaceTempView("nulls")
    lh.sql("CREATE TABLE base AS SELECT * FROM nulls")
    with pytest.raises(ValueError, match="NULL group key"):
        lh.sql(
            "CREATE MATERIALIZED VIEW mv AS "
            "SELECT k, SUM(amt) AS total FROM base GROUP BY k"
        )


def test_null_group_key_rejected_at_refresh(spark, lh):
    _create(spark, lh, [("a", "1.00")])
    spark.createDataFrame(
        [Row(k=None, amt=Decimal("2.00"))], "k string, amt decimal(12,2)"
    ).createOrReplaceTempView("nullrow")
    lh.sql("INSERT INTO base SELECT * FROM nullrow")
    with pytest.raises(ValueError, match="NULL group key"):
        lh.sql("REFRESH MATERIALIZED VIEW mv")


def test_parse_rejections(spark, lh):
    _mk(spark, [("a", "1.00")]).createOrReplaceTempView("s")
    lh.sql("CREATE TABLE base AS SELECT * FROM s")
    with pytest.raises(ValueError, match="items must be"):
        lh.sql(
            "CREATE MATERIALIZED VIEW mv AS "
            "SELECT k, MEDIAN(amt) AS a FROM base GROUP BY k"
        )
    with pytest.raises(ValueError, match="plain columns"):
        lh.sql(
            "CREATE MATERIALIZED VIEW mv AS "
            "SELECT k, SUM(amt) AS t FROM base GROUP BY upper(k)"
        )
    with pytest.raises(ValueError, match="exactly"):
        lh.sql(
            "CREATE MATERIALIZED VIEW mv AS "
            "SELECT SUM(amt) AS t FROM base GROUP BY k"
        )
    with pytest.raises(ValueError, match="at most one COUNT"):
        lh.sql(
            "CREATE MATERIALIZED VIEW mv AS SELECT k, COUNT(*) AS a, "
            "COUNT(*) AS b FROM base GROUP BY k"
        )
    with pytest.raises(ValueError, match="not a materialized view"):
        lh.sql("REFRESH MATERIALIZED VIEW base")


def test_refresh_python_api_mode_tuple(spark, lh):
    _create(spark, lh, [("a", "1.00")])
    lh.sql("UPDATE base SET amt = amt * 3 WHERE k = 'a'")
    v, mode = refresh_materialized_view(
        spark, lh.table("mv"), lh.table("base")
    )
    assert mode == "incremental" and v == lh.table("mv").latest_version()
    assert _mv_rows(lh) == _recompute(lh)


# ---------------------------------------------------------------------------
# MIN/MAX columns: bounded rescan-on-retraction through the SQL surface
# ---------------------------------------------------------------------------


def _create_mm(spark, lh, rows):
    _mk(spark, rows).createOrReplaceTempView("src_mm")
    lh.sql("CREATE TABLE base AS SELECT * FROM src_mm")
    lh.sql(
        "CREATE MATERIALIZED VIEW mv AS SELECT k, MIN(amt) AS lo, "
        "MAX(amt) AS hi, COUNT(*) AS n FROM base GROUP BY k"
    )


def _mm_rows(lh):
    return {
        (r["k"], r["lo"], r["hi"], r["n"])
        for r in lh.sql("SELECT k, lo, hi, n FROM mv").collect()
    }


def _mm_recompute(lh):
    return {
        (r["k"], r["lo"], r["hi"], r["n"])
        for r in lh.sql(
            "SELECT k, MIN(amt) AS lo, MAX(amt) AS hi, COUNT(*) AS n "
            "FROM base GROUP BY k"
        ).collect()
    }


def test_minmax_insert_only_folds(spark, lh):
    _create_mm(spark, lh, [("a", "5.00"), ("a", "7.00")])
    _mk(spark, [("a", "1.00"), ("b", "9.00")]).createOrReplaceTempView("i1")
    lh.sql("INSERT INTO base SELECT * FROM i1")
    lh.sql("REFRESH MATERIALIZED VIEW mv")
    assert _mm_rows(lh) == _mm_recompute(lh)


def test_minmax_retracted_extremum_rescans(spark, lh):
    _create_mm(
        spark, lh, [("a", "1.00"), ("a", "5.00"), ("b", "2.00"), ("b", "8.00")]
    )
    # delete a's MIN and b's MAX: both groups must rescan to exactness
    lh.sql("DELETE FROM base WHERE amt = 1.00 OR amt = 8.00")
    lh.sql("REFRESH MATERIALIZED VIEW mv")
    assert _mm_rows(lh) == _mm_recompute(lh)


def test_minmax_update_retraction_via_pairs(spark, lh):
    _create_mm(spark, lh, [("a", "1.00"), ("a", "5.00")])
    # the update RAISES the current min — preimage retracts 1.00
    lh.sql("UPDATE base SET amt = 3.00 WHERE amt = 1.00")
    lh.sql("REFRESH MATERIALIZED VIEW mv")
    assert _mm_rows(lh) == {("a", Decimal("3.00"), Decimal("5.00"), 2)}


def test_minmax_non_extremum_delete_no_rescan_still_exact(spark, lh):
    _create_mm(spark, lh, [("a", "1.00"), ("a", "3.00"), ("a", "5.00")])
    lh.sql("DELETE FROM base WHERE amt = 3.00")
    lh.sql("REFRESH MATERIALIZED VIEW mv")
    assert _mm_rows(lh) == {("a", Decimal("1.00"), Decimal("5.00"), 2)}


def test_minmax_group_death_and_birth(spark, lh):
    _create_mm(spark, lh, [("a", "1.00")])
    lh.sql("DELETE FROM base WHERE k = 'a'")
    _mk(spark, [("c", "4.00"), ("c", "2.00")]).createOrReplaceTempView("i2")
    lh.sql("INSERT INTO base SELECT * FROM i2")
    lh.sql("REFRESH MATERIALIZED VIEW mv")
    assert _mm_rows(lh) == {("c", Decimal("2.00"), Decimal("4.00"), 2)}


def test_minmax_mixed_with_sum_multi_commit(spark, lh):
    _mk(
        spark,
        [("a", "1.00"), ("a", "4.00"), ("b", "2.00"), ("b", "6.00")],
    ).createOrReplaceTempView("src_mix")
    lh.sql("CREATE TABLE base AS SELECT * FROM src_mix")
    lh.sql(
        "CREATE MATERIALIZED VIEW mv AS SELECT k, SUM(amt) AS total, "
        "MIN(amt) AS lo, MAX(amt) AS hi, COUNT(*) AS n "
        "FROM base GROUP BY k"
    )
    lh.sql("UPDATE base SET amt = amt * 10 WHERE amt = 1.00")
    lh.sql("DELETE FROM base WHERE amt = 6.00")
    _mk(spark, [("a", "0.50")]).createOrReplaceTempView("i3")
    lh.sql("INSERT INTO base SELECT * FROM i3")
    lh.sql("REFRESH MATERIALIZED VIEW mv")
    got = {
        (r["k"], r["total"], r["lo"], r["hi"], r["n"])
        for r in lh.sql("SELECT k, total, lo, hi, n FROM mv").collect()
    }
    want = {
        (r["k"], r["total"], r["lo"], r["hi"], r["n"])
        for r in lh.sql(
            "SELECT k, SUM(amt) AS total, MIN(amt) AS lo, MAX(amt) AS hi, "
            "COUNT(*) AS n FROM base GROUP BY k"
        ).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# JOIN-view MVs: dual watermarks, bilinear refresh
# ---------------------------------------------------------------------------


def _mk_dim(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, seg=s) for k, s in rows], "k string, seg string"
    )


@pytest.fixture()
def lhj(spark, tmp_path):
    s = LakehouseSession(spark)
    s.create("fa", str(tmp_path / "fa"))
    s.create("di", str(tmp_path / "di"))
    s.create("jmv", str(tmp_path / "jmv"))
    return s


def _jmv_create(spark, lhj):
    _mk(spark, [("a", "1.00"), ("a", "2.00"), ("b", "5.00")]).createOrReplaceTempView("jf")
    _mk_dim(spark, [("a", "s1"), ("b", "s2")]).createOrReplaceTempView("jd")
    lhj.sql("CREATE TABLE fa AS SELECT * FROM jf")
    lhj.sql("CREATE TABLE di AS SELECT * FROM jd")
    lhj.sql(
        "CREATE MATERIALIZED VIEW jmv AS SELECT seg, SUM(amt) AS total, "
        "COUNT(*) AS n FROM fa JOIN di USING (k) GROUP BY seg"
    )


def _jmv_rows(lhj):
    return {
        (r["seg"], r["total"], r["n"])
        for r in lhj.sql("SELECT seg, total, n FROM jmv").collect()
    }


def _jmv_recompute(lhj):
    return {
        (r["seg"], r["total"], r["n"])
        for r in lhj.sql(
            "SELECT seg, SUM(amt) AS total, COUNT(*) AS n "
            "FROM fa JOIN di ON fa.k = di.k GROUP BY seg"
        ).collect()
    }


def test_join_mv_fact_only_change(spark, lhj):
    _jmv_create(spark, lhj)
    lhj.sql("UPDATE fa SET amt = amt * 2 WHERE k = 'a'")
    r = lhj.sql("REFRESH MATERIALIZED VIEW jmv").first()
    assert r["mode"] == "incremental"
    assert _jmv_rows(lhj) == _jmv_recompute(lhj)


def test_join_mv_dim_only_change(spark, lhj):
    _jmv_create(spark, lhj)
    lhj.sql("UPDATE di SET seg = 's9' WHERE k = 'a'")
    lhj.sql("REFRESH MATERIALIZED VIEW jmv")
    assert _jmv_rows(lhj) == _jmv_recompute(lhj)


def test_join_mv_both_sides_one_refresh(spark, lhj):
    """All three bilinear terms incl. the ΔA⋈ΔB correction (k='a' rows
    deleted from the fact AND moved in the dim in the same window)."""
    _jmv_create(spark, lhj)
    lhj.sql("DELETE FROM fa WHERE amt = 1.00")
    _mk(spark, [("b", "7.00")]).createOrReplaceTempView("jins")
    lhj.sql("INSERT INTO fa SELECT * FROM jins")
    lhj.sql("UPDATE di SET seg = 'moved' WHERE k = 'a'")
    r = lhj.sql("REFRESH MATERIALIZED VIEW jmv").first()
    assert r["mode"] == "incremental"
    assert _jmv_rows(lhj) == _jmv_recompute(lhj)
    r2 = lhj.sql("REFRESH MATERIALIZED VIEW jmv").first()
    assert r2["mode"] == "noop"


def test_join_mv_full_rebuild(spark, lhj):
    _jmv_create(spark, lhj)
    lhj.sql("DELETE FROM fa WHERE k = 'b'")
    r = lhj.sql("REFRESH MATERIALIZED VIEW jmv FULL").first()
    assert r["mode"] == "full"
    assert _jmv_rows(lhj) == _jmv_recompute(lhj)


def test_join_mv_minmax_refused(spark, lhj):
    _mk(spark, [("a", "1.00")]).createOrReplaceTempView("jf2")
    _mk_dim(spark, [("a", "s1")]).createOrReplaceTempView("jd2")
    lhj.sql("CREATE TABLE fa AS SELECT * FROM jf2")
    lhj.sql("CREATE TABLE di AS SELECT * FROM jd2")
    with pytest.raises(ValueError, match="MIN/MAX on a JOIN"):
        lhj.sql(
            "CREATE MATERIALIZED VIEW jmv AS SELECT seg, MIN(amt) AS lo "
            "FROM fa JOIN di USING (k) GROUP BY seg"
        )


def test_null_sum_group_preserved_through_refresh(spark, lh):
    """A group whose measure values are all NULL keeps a NULL sum
    through an incremental refresh that touches it."""
    spark.createDataFrame(
        [Row(k="a", amt=None), Row(k="a", amt=None)],
        "k string, amt decimal(12,2)",
    ).createOrReplaceTempView("nullamt")
    lh.sql("CREATE TABLE base AS SELECT * FROM nullamt")
    lh.sql(
        "CREATE MATERIALIZED VIEW mv AS SELECT k, SUM(amt) AS total, "
        "COUNT(*) AS n FROM base GROUP BY k"
    )
    spark.createDataFrame(
        [Row(k="a", amt=None)], "k string, amt decimal(12,2)"
    ).createOrReplaceTempView("morenull")
    lh.sql("INSERT INTO base SELECT * FROM morenull")
    lh.sql("REFRESH MATERIALIZED VIEW mv")
    assert _mv_rows(lh) == _recompute(lh) == {("a", None, 3)}


# ---------------------------------------------------------------------------
# Interplay probes: refresh vs the rest of the transaction layer
# ---------------------------------------------------------------------------


def test_refresh_after_optimize_is_cheap_noop_fold(spark, lh):
    """OPTIMIZE is feedless — a refresh spanning it advances the
    watermark without changing MV values."""
    _create(spark, lh, [("a", "1.00"), ("a", "2.00"), ("b", "5.00")])
    before = _mv_rows(lh)
    lh.sql("OPTIMIZE base")
    r = lh.sql("REFRESH MATERIALIZED VIEW mv").first()
    assert r["mode"] == "incremental"
    assert _mv_rows(lh) == before
    from aws_lakehouse_project_spark.plans.matview import definition

    assert definition(lh.table("mv"))["base_version"] == lh.table(
        "base"
    ).latest_version()
    # and the next refresh is a pure noop
    assert lh.sql("REFRESH MATERIALIZED VIEW mv").first()["mode"] == "noop"


def test_refresh_after_mor_delete_folds_dv_changes(spark, lh):
    """A merge-on-read DELETE mutates via deletion vectors, not file
    rewrites — the CDF still feeds the fold exactly."""
    _create(spark, lh, [("a", "1.00"), ("a", "2.00"), ("b", "5.00")])
    lh.sql("DELETE /*+ MERGE_ON_READ */ FROM base WHERE amt = 2.00")
    lh.sql("REFRESH MATERIALIZED VIEW mv")
    assert _mv_rows(lh) == _recompute(lh)


def test_refresh_after_base_rename_fails_loudly(spark, lh):
    """RENAME COLUMN on the base invalidates the stored definition's
    expressions — the refresh must raise, never fold garbage."""
    _create(spark, lh, [("a", "1.00")])
    _mk(spark, [("a", "3.00")]).createOrReplaceTempView("r1")
    lh.sql("INSERT INTO base SELECT * FROM r1")
    lh.sql("ALTER TABLE base RENAME COLUMN amt TO amount")
    with pytest.raises(Exception, match="amt|UNRESOLVED|cannot be resolved"):
        lh.sql("REFRESH MATERIALIZED VIEW mv")


def test_delete_of_last_nonnull_value_yields_null_sum(spark, lh):
    """The case a (sum, count) pair cannot express: deleting a group's
    last non-NULL value must publish SUM = NULL, not 0 — the hidden
    per-column non-null count makes the fold exact."""
    spark.createDataFrame(
        [Row(k="a", amt=Decimal("5.00")), Row(k="a", amt=None)],
        "k string, amt decimal(12,2)",
    ).createOrReplaceTempView("mixed")
    lh.sql("CREATE TABLE base AS SELECT * FROM mixed")
    lh.sql(
        "CREATE MATERIALIZED VIEW mv AS SELECT k, SUM(amt) AS total, "
        "COUNT(*) AS n FROM base GROUP BY k"
    )
    lh.sql("DELETE FROM base WHERE amt = 5.00")
    lh.sql("REFRESH MATERIALIZED VIEW mv")
    assert _mv_rows(lh) == _recompute(lh) == {("a", None, 1)}


def test_refresh_survives_maintenance_commits_on_the_mv(spark, lh):
    """OPTIMIZE on the MV TABLE itself commits its own meta — the
    definition walk must look past it, not brick the refresh."""
    _create(spark, lh, [("a", "1.00"), ("b", "2.00")])
    lh.sql("OPTIMIZE mv")
    _mk(spark, [("a", "4.00")]).createOrReplaceTempView("m1")
    lh.sql("INSERT INTO base SELECT * FROM m1")
    r = lh.sql("REFRESH MATERIALIZED VIEW mv").first()
    assert r["mode"] == "incremental"
    assert _mv_rows(lh) == _recompute(lh)


def test_describe_materialized_view(spark, lh):
    _create(spark, lh, [("a", "1.00")])
    row = lh.sql("DESCRIBE MATERIALIZED VIEW mv").first()
    assert row["base"] == "base" and row["group_keys"] == "k"
    assert "SUM(amt) AS total" in row["aggregates"]
    assert row["count_col"] == "n"
    assert row["base_version"] == lh.table("base").latest_version()
    with pytest.raises(ValueError, match="not a materialized view"):
        lh.sql("DESCRIBE MATERIALIZED VIEW base")


def test_describe_materialized_join_view(spark, lhj):
    _jmv_create(spark, lhj)
    row = lhj.sql("DESCRIBE MATERIALIZED VIEW jmv").first()
    assert (row["base"], row["base_b"], row["join_on"]) == ("fa", "di", "k")


def test_avg_maintained_through_refresh(spark, lh):
    """AVG = hidden exact sum / hidden non-null count; deletes, NULL
    values, and the divide-by-non-null-count semantics all fold."""
    spark.createDataFrame(
        [
            Row(k="a", amt=Decimal("2.00")),
            Row(k="a", amt=Decimal("4.00")),
            Row(k="a", amt=None),  # AVG ignores NULLs: divisor is 2
            Row(k="b", amt=Decimal("10.00")),
        ],
        "k string, amt decimal(12,2)",
    ).createOrReplaceTempView("avgsrc")
    lh.sql("CREATE TABLE base AS SELECT * FROM avgsrc")
    lh.sql(
        "CREATE MATERIALIZED VIEW mv AS SELECT k, AVG(amt) AS mean, "
        "COUNT(*) AS n FROM base GROUP BY k"
    )
    got = {
        (r["k"], r["mean"], r["n"])
        for r in lh.sql("SELECT k, mean, n FROM mv").collect()
    }
    assert got == {("a", 3.0, 3), ("b", 10.0, 1)}
    # delete one of a's values and the last non-null makes mean exact
    lh.sql("DELETE FROM base WHERE amt = 2.00")
    lh.sql("REFRESH MATERIALIZED VIEW mv")
    got = {
        (r["k"], r["mean"], r["n"])
        for r in lh.sql("SELECT k, mean, n FROM mv").collect()
    }
    assert got == {("a", 4.0, 2), ("b", 10.0, 1)}
    lh.sql("DELETE FROM base WHERE amt = 4.00")
    lh.sql("REFRESH MATERIALIZED VIEW mv")
    got = {
        (r["k"], r["mean"], r["n"])
        for r in lh.sql("SELECT k, mean, n FROM mv").collect()
    }
    assert got == {("a", None, 1), ("b", 10.0, 1)}  # zero non-nulls → NULL


def test_avg_on_join_view(spark, lhj):
    _jmv_create(spark, lhj)
    lhj.create("jmv2", lhj.table("jmv").path + "2")
    lhj.sql(
        "CREATE MATERIALIZED VIEW jmv2 AS SELECT seg, AVG(amt) AS mean "
        "FROM fa JOIN di USING (k) GROUP BY seg"
    )
    lhj.sql("UPDATE fa SET amt = amt * 3 WHERE k = 'a'")
    lhj.sql("REFRESH MATERIALIZED VIEW jmv2")
    got = {
        (r["seg"], r["mean"])
        for r in lhj.sql("SELECT seg, mean FROM jmv2").collect()
    }
    want = {
        (r["seg"], r["mean"])
        for r in lhj.sql(
            "SELECT seg, CAST(SUM(amt) AS DOUBLE) / COUNT(amt) AS mean "
            "FROM fa JOIN di ON fa.k = di.k GROUP BY seg"
        ).collect()
    }
    assert got == want


def test_duplicate_output_aliases_rejected(spark, lh):
    _mk(spark, [("a", "1.00")]).createOrReplaceTempView("s2")
    lh.sql("CREATE TABLE base AS SELECT * FROM s2")
    with pytest.raises(ValueError, match="collide"):
        lh.sql(
            "CREATE MATERIALIZED VIEW mv AS SELECT k, SUM(amt) AS t, "
            "MIN(amt) AS t FROM base GROUP BY k"
        )
    with pytest.raises(ValueError, match="collide"):
        lh.sql(
            "CREATE MATERIALIZED VIEW mv AS SELECT k, SUM(amt) AS k "
            "FROM base GROUP BY k"
        )


# ---------------------------------------------------------------------------
# Streaming (continuous) refresh
# ---------------------------------------------------------------------------

from aws_lakehouse_project_spark.plans.matview import (  # noqa: E402
    stream_refresh_materialized_view,
)


@pytest.fixture()
def lhs(spark, tmp_path):
    s = LakehouseSession(spark)
    s.create("base", str(tmp_path / "base"), change_feed=True)
    s.create("mv", str(tmp_path / "mv"))
    return s


def test_stream_refresh_equals_recompute_and_composes(spark, lhs, tmp_path):
    _create(spark, lhs, [("a", "1.00"), ("a", "2.00"), ("b", "5.00")])
    lhs.sql("UPDATE base SET amt = amt * 2 WHERE k = 'a'")
    lhs.sql("DELETE FROM base WHERE k = 'b'")
    n = stream_refresh_materialized_view(
        spark, lhs.table("mv"), lhs.table("base"), str(tmp_path / "c1")
    )
    assert n >= 1
    assert _mv_rows(lhs) == _recompute(lhs)
    # fresh checkpoint replays the WHOLE feed: nothing may double-fold
    n2 = stream_refresh_materialized_view(
        spark, lhs.table("mv"), lhs.table("base"), str(tmp_path / "c2")
    )
    assert n2 == 0 and _mv_rows(lhs) == _recompute(lhs)
    # batch refresh after streaming: watermark already at head
    assert lhs.sql("REFRESH MATERIALIZED VIEW mv").first()["mode"] == "noop"
    # and batch → streaming also composes
    _mk(spark, [("z", "7.00")]).createOrReplaceTempView("zrow")
    lhs.sql("INSERT INTO base SELECT * FROM zrow")
    lhs.sql("REFRESH MATERIALIZED VIEW mv")
    n3 = stream_refresh_materialized_view(
        spark, lhs.table("mv"), lhs.table("base"), str(tmp_path / "c3")
    )
    assert n3 == 0  # batch already folded it; replay is below watermark
    assert _mv_rows(lhs) == _recompute(lhs)


def test_stream_refresh_refuses_minmax_and_join_views(spark, lhs, tmp_path):
    _mk(spark, [("a", "1.00")]).createOrReplaceTempView("s3")
    lhs.sql("CREATE TABLE base AS SELECT * FROM s3")
    lhs.sql(
        "CREATE MATERIALIZED VIEW mv AS SELECT k, MIN(amt) AS lo "
        "FROM base GROUP BY k"
    )
    with pytest.raises(ValueError, match="MIN/MAX"):
        stream_refresh_materialized_view(
            spark, lhs.table("mv"), lhs.table("base"), str(tmp_path / "c")
        )


def test_cascade_day_retirement_propagates(spark, tmp_path):
    """Deleting a whole day from the base retires its tier-1 (daily)
    row; that retirement is a DELETE in the daily MV's change feed, so
    the tier-2 (monthly) fold decrements n_days — composition carries
    group birth/death across tiers."""
    lh = LakehouseSession(spark)
    lh.create("fact", str(tmp_path / "f"))
    lh.create("d", str(tmp_path / "d"), change_feed=True)
    lh.create("m", str(tmp_path / "m"))
    spark.createDataFrame(
        [
            Row(mo="2024-01", day="2024-01-05", amt=Decimal("1.00")),
            Row(mo="2024-01", day="2024-01-06", amt=Decimal("2.00")),
            Row(mo="2024-02", day="2024-02-01", amt=Decimal("4.00")),
        ],
        "mo string, day string, amt decimal(12,2)",
    ).createOrReplaceTempView("cf")
    lh.sql("CREATE TABLE fact AS SELECT * FROM cf")
    lh.sql(
        "CREATE MATERIALIZED VIEW d AS SELECT mo, day, SUM(amt) AS rev, "
        "COUNT(*) AS n FROM fact GROUP BY mo, day"
    )
    lh.sql(
        "CREATE MATERIALIZED VIEW m AS SELECT mo, SUM(rev) AS rev, "
        "COUNT(*) AS n_days FROM d GROUP BY mo"
    )
    lh.sql("DELETE FROM fact WHERE day = '2024-01-05'")
    assert lh.sql("REFRESH MATERIALIZED VIEW d").first()["mode"] == "incremental"
    assert lh.sql("REFRESH MATERIALIZED VIEW m").first()["mode"] == "incremental"
    got = {
        (r["mo"], r["rev"], r["n_days"])
        for r in lh.sql("SELECT mo, rev, n_days FROM m").collect()
    }
    assert got == {
        ("2024-01", Decimal("2.00"), 1),
        ("2024-02", Decimal("4.00"), 1),
    }


def test_stream_refresh_fresh_checkpoint_folds_new_data(spark, lhs, tmp_path):
    """THE cross-run correctness case: new base commits between two
    streaming runs with DIFFERENT checkpoints must fold in run 2 —
    batch ids restart at 0 per checkpoint, so the retry guard must be
    run-scoped, never table-scoped (a table-wide id comparison would
    skip run 2's batch 0 wholesale, new data included)."""
    _create(spark, lhs, [("a", "1.00")])
    lhs.sql("UPDATE base SET amt = amt * 2 WHERE k = 'a'")
    n1 = stream_refresh_materialized_view(
        spark, lhs.table("mv"), lhs.table("base"), str(tmp_path / "cA")
    )
    assert n1 >= 1
    _mk(spark, [("b", "9.00")]).createOrReplaceTempView("newrow")
    lhs.sql("INSERT INTO base SELECT * FROM newrow")
    n2 = stream_refresh_materialized_view(
        spark, lhs.table("mv"), lhs.table("base"), str(tmp_path / "cB")
    )
    assert n2 >= 1, "fresh-checkpoint run silently skipped new data"
    assert _mv_rows(lhs) == _recompute(lhs)


def test_stream_refresh_refuses_join_views(spark, lhj, tmp_path):
    _jmv_create(spark, lhj)
    with pytest.raises(ValueError, match="JOIN view"):
        stream_refresh_materialized_view(
            spark, lhj.table("jmv"), lhj.table("fa"), str(tmp_path / "c")
        )


def test_reserved_prefix_aliases_rejected(spark, lh):
    _mk(spark, [("a", "1.00")]).createOrReplaceTempView("s4")
    lh.sql("CREATE TABLE base AS SELECT * FROM s4")
    with pytest.raises(ValueError, match="reserved"):
        lh.sql(
            "CREATE MATERIALIZED VIEW mv AS SELECT k, SUM(amt) AS total, "
            "MAX(amt) AS __nn__total FROM base GROUP BY k"
        )
    with pytest.raises(ValueError, match="reserved"):
        lh.sql(
            "CREATE MATERIALIZED VIEW mv AS SELECT k, "
            "SUM(amt) AS __ivm_count FROM base GROUP BY k"
        )
