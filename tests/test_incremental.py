"""Incremental MV maintenance (operators/incremental.py): the fold must
be indistinguishable from a full recompute — including group birth,
group retirement at count zero, NULL group keys, and schema stability
across repeated folds (the property the parquet round-trip in
q_incremental_mv depends on)."""

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from aws_lakehouse_project_spark.operators.incremental import (
    fold_changes_into_aggregate,
)

DEC = "decimal(28,2)"


def _mv(spark, rows):
    return spark.createDataFrame(
        rows, "k string, rev decimal(28,2), n bigint"
    )


def _delta(spark, rows):
    return spark.createDataFrame(
        rows, "_change_type string, k string, rev decimal(28,2)"
    )


def _fold(mv, delta):
    return fold_changes_into_aggregate(
        mv, delta, group_keys=["k"], sum_cols=["rev"], count_col="n"
    )


def _as_dict(df):
    return {r["k"]: (r["rev"], r["n"]) for r in df.collect()}


def test_insert_updates_and_new_group(spark):
    mv = _mv(spark, [("a", Decimal("10.00"), 2)])
    delta = _delta(
        spark,
        [
            ("insert", "a", Decimal("5.00")),
            ("insert", "b", Decimal("7.50")),
        ],
    )
    out = _as_dict(_fold(mv, delta))
    assert out == {
        "a": (Decimal("15.00"), 3),
        "b": (Decimal("7.50"), 1),
    }


def test_update_pair_is_net_change(spark):
    mv = _mv(spark, [("a", Decimal("10.00"), 2)])
    delta = _delta(
        spark,
        [
            ("update_preimage", "a", Decimal("4.00")),
            ("update_postimage", "a", Decimal("9.00")),
        ],
    )
    out = _as_dict(_fold(mv, delta))
    assert out == {"a": (Decimal("15.00"), 2)}  # count unchanged


def test_group_retires_at_zero_count(spark):
    mv = _mv(
        spark,
        [("a", Decimal("10.00"), 1), ("b", Decimal("3.00"), 1)],
    )
    delta = _delta(spark, [("delete", "a", Decimal("10.00"))])
    out = _as_dict(_fold(mv, delta))
    assert out == {"b": (Decimal("3.00"), 1)}


def test_null_group_key_is_a_group(spark):
    mv = _mv(spark, [(None, Decimal("1.00"), 1)])
    delta = _delta(spark, [("insert", None, Decimal("2.00"))])
    out = _as_dict(_fold(mv, delta))
    assert out == {None: (Decimal("3.00"), 2)}


def test_schema_stable_across_folds(spark):
    """Repeated folds must not widen types — the MV is persisted
    between generations and its parquet schema is its contract."""
    mv = _mv(spark, [("a", Decimal("10.00"), 2)])

    def shape(df):  # nullability is not part of the contract
        return [(f.name, f.dataType) for f in df.schema.fields]

    for i in range(3):
        delta = _delta(spark, [("insert", "a", Decimal("1.00"))])
        mv2 = _fold(mv, delta)
        assert shape(mv2) == shape(mv), f"fold {i} changed the schema"
        mv = mv2
    assert _as_dict(mv) == {"a": (Decimal("13.00"), 5)}


def test_fold_equals_recompute_random(spark):
    """Property: fold(recompute(S0), cdf(S0→S1)) == recompute(S1) on a
    generated state pair with inserts, deletes, and updates mixed."""
    base = [(f"k{i % 7}", Decimal(i)) for i in range(50)]
    s0 = spark.createDataFrame(base, "k string, rev decimal(28,2)")
    # S1: drop rows with rev % 5 == 0, double rev where rev % 3 == 0,
    # add 10 brand-new rows in new groups
    s1 = (
        s0.filter(F.col("rev") % 5 != 0)
        .withColumn(
            "rev",
            F.when(F.col("rev") % 3 == 0, F.col("rev") * 2)
            .otherwise(F.col("rev"))
            .cast(DEC),
        )
        .unionByName(
            spark.createDataFrame(
                [(f"new{i}", Decimal(100 + i)) for i in range(10)],
                "k string, rev decimal(28,2)",
            )
        )
    )

    def recompute(df):
        return df.groupBy("k").agg(
            F.sum("rev").cast(DEC).alias("rev"),
            F.count(F.lit(1)).alias("n"),
        )

    # CDF of s0→s1 as a plain multiset diff (insert/delete vocabulary)
    ins = s1.exceptAll(s0).withColumn("_change_type", F.lit("insert"))
    del_ = s0.exceptAll(s1).withColumn("_change_type", F.lit("delete"))
    delta = ins.unionByName(del_).select("_change_type", "k", "rev")

    folded = _as_dict(_fold(recompute(s0), delta))
    full = _as_dict(recompute(s1))
    assert folded == full


def test_delta_must_carry_mv_names(spark):
    mv = _mv(spark, [("a", Decimal("1.00"), 1)])
    bad = spark.createDataFrame(
        [("insert", "a", Decimal("1.00"))],
        "_change_type string, k string, amount decimal(28,2)",
    )
    with pytest.raises(Exception, match="rev|UNRESOLVED"):
        _fold(mv, bad).collect()


def test_stream_mv_equals_batch_mv(spark):
    """The streaming fold (q_stream_mv) and the batch fold
    (q_incremental_mv) must land on identical MV content — SUM/COUNT
    folds are commutative/associative, so micro-batch boundaries are
    invisible in the result."""
    from aws_lakehouse_project_spark.operators.incremental import (
        q_incremental_mv,
        q_stream_mv,
    )

    sf = "/root/testdata/sf0.001"
    batch = {tuple(r) for r in q_incremental_mv(spark, sf).collect()}
    stream = {tuple(r) for r in q_stream_mv(spark, sf).collect()}
    assert batch == stream


# -- MIN/MAX fold with bounded rescan-on-retraction --------------------------


from aws_lakehouse_project_spark.operators.incremental import (  # noqa: E402
    fold_changes_into_minmax,
)


def _mmv(spark, rows):
    return spark.createDataFrame(rows, "k string, lo int, hi int, n bigint")


def _mdelta(spark, rows):
    return spark.createDataFrame(rows, "_change_type string, k string, v int")


def _mbase(spark, rows):
    return spark.createDataFrame(rows, "k string, v int")


def _mmfold(mv, delta, base):
    return fold_changes_into_minmax(
        mv, delta, base, group_keys=["k"], val_col="v",
        min_col="lo", max_col="hi", count_col="n",
    )


def _mm_dict(df):
    return {r["k"]: (r["lo"], r["hi"], r["n"]) for r in df.collect()}


def test_minmax_insert_only_no_rescan(spark):
    mv = _mmv(spark, [("a", 5, 9, 2)])
    delta = _mdelta(spark, [("insert", "a", 3), ("insert", "b", 7)])
    base = _mbase(spark, [("a", 5), ("a", 9), ("a", 3), ("b", 7)])
    out, rescans = _mmfold(mv, delta, base)
    assert rescans.count() == 0  # inserts never rescan
    assert _mm_dict(out) == {"a": (3, 9, 3), "b": (7, 7, 1)}


def test_minmax_non_extremum_delete_no_rescan(spark):
    mv = _mmv(spark, [("a", 1, 9, 3)])  # values {1, 5, 9}
    delta = _mdelta(spark, [("delete", "a", 5)])
    base = _mbase(spark, [("a", 1), ("a", 9)])
    out, rescans = _mmfold(mv, delta, base)
    assert rescans.count() == 0  # 1 < 5 < 9: extrema untouched
    assert _mm_dict(out) == {"a": (1, 9, 2)}


def test_minmax_retracted_min_rescans_that_group_only(spark):
    mv = _mmv(spark, [("a", 1, 9, 3), ("b", 2, 4, 2)])
    delta = _mdelta(spark, [("delete", "a", 1)])
    base = _mbase(spark, [("a", 5), ("a", 9), ("b", 2), ("b", 4)])
    out, rescans = _mmfold(mv, delta, base)
    assert [r["k"] for r in rescans.collect()] == ["a"]
    assert _mm_dict(out) == {"a": (5, 9, 2), "b": (2, 4, 2)}


def test_minmax_deleted_duplicate_extremum_rescans_harmlessly(spark):
    mv = _mmv(spark, [("a", 1, 9, 3)])  # values {1, 1, 9}
    delta = _mdelta(spark, [("delete", "a", 1)])
    base = _mbase(spark, [("a", 1), ("a", 9)])
    out, rescans = _mmfold(mv, delta, base)
    assert rescans.count() == 1  # conservative: ties trigger
    assert _mm_dict(out) == {"a": (1, 9, 2)}  # duplicate min survives


def test_minmax_update_pair_retraction(spark):
    # update 9 -> 18: preimage retracts the max, postimage inserts
    mv = _mmv(spark, [("a", 1, 9, 2)])
    delta = _mdelta(
        spark,
        [("update_preimage", "a", 9), ("update_postimage", "a", 18)],
    )
    base = _mbase(spark, [("a", 1), ("a", 18)])
    out, rescans = _mmfold(mv, delta, base)
    assert rescans.count() == 1
    assert _mm_dict(out) == {"a": (1, 18, 2)}


def test_minmax_group_retires_when_fully_deleted(spark):
    mv = _mmv(spark, [("a", 1, 9, 2), ("b", 3, 3, 1)])
    delta = _mdelta(spark, [("delete", "a", 1), ("delete", "a", 9)])
    base = _mbase(spark, [("b", 3)])  # 'a' gone at the to-version
    out, rescans = _mmfold(mv, delta, base)
    assert rescans.count() == 1
    assert _mm_dict(out) == {"b": (3, 3, 1)}  # rescan finds no rows: retired


def test_minmax_null_values_never_trigger(spark):
    mv = _mmv(spark, [("a", 1, 9, 3)])  # one row has v NULL
    delta = spark.createDataFrame(
        [("delete", "a", None)], "_change_type string, k string, v int"
    )
    base = _mbase(spark, [("a", 1), ("a", 9)])
    out, rescans = _mmfold(mv, delta, base)
    assert rescans.count() == 0  # MIN/MAX ignore NULLs
    assert _mm_dict(out) == {"a": (1, 9, 2)}


def test_minmax_null_group_key(spark):
    mv = _mmv(spark, [(None, 4, 8, 2)])
    delta = _mdelta(spark, [("delete", None, 4), ("insert", None, 6)])
    base = _mbase(spark, [(None, 8), (None, 6)])
    out, rescans = _mmfold(mv, delta, base)
    assert rescans.count() == 1
    assert _mm_dict(out) == {None: (6, 8, 2)}


def test_minmax_fold_equals_recompute_random(spark):
    """End-to-end over random mutations: fold ≡ recompute, and the
    rescan set stays a strict subset of the groups (bounded)."""
    import random

    rng = random.Random(11)
    rows = [(f"g{rng.randrange(12)}", rng.randrange(1000)) for _ in range(400)]
    state = list(rows)
    base0 = _mbase(spark, state)
    mv = base0.groupBy("k").agg(
        F.min("v").alias("lo"), F.max("v").alias("hi"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    total_rescans = 0
    for _ in range(3):
        dels = rng.sample(state, 60)
        inss = [
            (f"g{rng.randrange(12)}", rng.randrange(1000)) for _ in range(40)
        ]
        # remove exactly one copy per sampled delete (the scratch list
        # is consumed by .remove; `dels` itself stays intact for the
        # delta below)
        pending = list(dels)
        state = [r for r in state if r not in pending or pending.remove(r)]
        state.extend(inss)
        delta = spark.createDataFrame(
            [("delete", k, v) for k, v in dels]
            + [("insert", k, v) for k, v in inss],
            "_change_type string, k string, v int",
        )
        base = _mbase(spark, state)
        mv, rescans = _mmfold(mv, delta, base)
        n_res = rescans.count()
        assert n_res < 12
        total_rescans += n_res
    expect = _mm_dict(
        _mbase(spark, state).groupBy("k").agg(
            F.min("v").alias("lo"), F.max("v").alias("hi"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    assert _mm_dict(mv) == expect
    assert total_rescans >= 1


# ---------------------------------------------------------------------------
# join_signed_delta: the bilinear delta rule Δ(A⋈B) = ΔA⋈B₀ + A₀⋈ΔB + ΔA⋈ΔB
# ---------------------------------------------------------------------------

from aws_lakehouse_project_spark.operators.incremental import (  # noqa: E402
    join_signed_delta,
)

A_SCHEMA = "cid bigint, amount decimal(28,2)"
B_SCHEMA = "cid bigint, nation string"


def _diff_cdf(old, new, cols):
    ins = new.exceptAll(old).withColumn("_change_type", F.lit("insert"))
    dels = old.exceptAll(new).withColumn("_change_type", F.lit("delete"))
    return ins.unionByName(dels).select("_change_type", *cols)


def _join_ms(a, b):
    """Multiset of the join as a dict for exact comparison."""
    rows = a.join(b, "cid").select("cid", "amount", "nation").collect()
    out = {}
    for r in rows:
        key = (r["cid"], r["amount"], r["nation"])
        out[key] = out.get(key, 0) + 1
    return out


def _apply_signed(base_ms, signed):
    out = dict(base_ms)
    for r in signed.collect():
        key = (r["cid"], r["amount"], r["nation"])
        s = 1 if r["_change_type"] == "insert" else -1
        out[key] = out.get(key, 0) + s
        if out[key] == 0:
            del out[key]
    return out


def _scenario(spark):
    a0 = spark.createDataFrame(
        [(i % 6, Decimal(i)) for i in range(30)], A_SCHEMA
    )
    b0 = spark.createDataFrame(
        [(c, f"n{c % 3}") for c in range(6)], B_SCHEMA
    )
    # A: delete amounts %5==0, double %3==0, insert new rows incl. a
    # key with NO dim match (cid=99) and a duplicate-row multiset case
    a1 = (
        a0.filter(F.col("amount") % 5 != 0)
        .withColumn(
            "amount",
            F.when(F.col("amount") % 3 == 0, F.col("amount") * 2)
            .otherwise(F.col("amount"))
            .cast("decimal(28,2)"),
        )
        .unionByName(
            spark.createDataFrame(
                [(1, Decimal(500)), (1, Decimal(500)), (99, Decimal(7))],
                A_SCHEMA,
            )
        )
    )
    # B: move cid%2==0 to a new nation, delete cid=5 entirely,
    # insert a dim row with NO fact match (cid=100)
    b1 = (
        b0.filter(F.col("cid") != 5)
        .withColumn(
            "nation",
            F.when(F.col("cid") % 2 == 0, F.concat(F.lit("m"), F.col("cid")))
            .otherwise(F.col("nation")),
        )
        .unionByName(
            spark.createDataFrame([(100, "x")], B_SCHEMA)
        )
    )
    return a0, a1, b0, b1


def test_join_delta_fact_only(spark):
    a0, a1, b0, _ = _scenario(spark)
    signed = join_signed_delta(
        a0, _diff_cdf(a0, a1, ["cid", "amount"]), b0, None, on=["cid"]
    )
    assert _apply_signed(_join_ms(a0, b0), signed) == _join_ms(a1, b0)


def test_join_delta_dim_only(spark):
    a0, _, b0, b1 = _scenario(spark)
    signed = join_signed_delta(
        a0, None, b0, _diff_cdf(b0, b1, ["cid", "nation"]), on=["cid"]
    )
    assert _apply_signed(_join_ms(a0, b0), signed) == _join_ms(a0, b1)


def test_join_delta_both_sides(spark):
    """All three terms fire; the ΔA⋈ΔB cross term is what keeps keys
    changed on BOTH sides (deleted fact rows of a moved dim key) from
    being double-counted."""
    a0, a1, b0, b1 = _scenario(spark)
    signed = join_signed_delta(
        a0,
        _diff_cdf(a0, a1, ["cid", "amount"]),
        b0,
        _diff_cdf(b0, b1, ["cid", "nation"]),
        on=["cid"],
    )
    assert _apply_signed(_join_ms(a0, b0), signed) == _join_ms(a1, b1)


def test_join_delta_update_vocabulary(spark):
    """update_preimage/update_postimage sign exactly like delete/insert."""
    a0 = spark.createDataFrame([(1, Decimal(10))], A_SCHEMA)
    b0 = spark.createDataFrame([(1, "n0")], B_SCHEMA)
    da = spark.createDataFrame(
        [("update_preimage", 1, Decimal(10)),
         ("update_postimage", 1, Decimal(20))],
        "_change_type string, cid bigint, amount decimal(28,2)",
    )
    signed = join_signed_delta(a0, da, b0, None, on=["cid"])
    a1 = spark.createDataFrame([(1, Decimal(20))], A_SCHEMA)
    assert _apply_signed(_join_ms(a0, b0), signed) == _join_ms(a1, b0)


def test_join_delta_rejects_column_drift(spark):
    a0, _, b0, _ = _scenario(spark)
    bad = spark.createDataFrame(
        [("insert", 1, Decimal(1))],
        "_change_type string, cid bigint, price decimal(28,2)",
    )
    with pytest.raises(ValueError, match="columns"):
        join_signed_delta(a0, bad, b0, None, on=["cid"])


def test_join_delta_rejects_payload_collision(spark):
    a0, _, b0, _ = _scenario(spark)
    b_clash = b0.withColumnRenamed("nation", "amount")
    with pytest.raises(ValueError, match="collide"):
        join_signed_delta(a0, None, b_clash, b_clash.limit(0).withColumn(
            "_change_type", F.lit("insert")), on=["cid"])


def test_join_delta_both_none_rejected(spark):
    a0, _, b0, _ = _scenario(spark)
    with pytest.raises(ValueError, match="both deltas"):
        join_signed_delta(a0, None, b0, None, on=["cid"])


# ---------------------------------------------------------------------------
# COUNT(DISTINCT) support-table maintenance (the value joins the group key)
# ---------------------------------------------------------------------------


def _support(spark, rows):
    return spark.createDataFrame(rows, "g string, v bigint, mult bigint")


def _sup_delta(spark, rows):
    return spark.createDataFrame(rows, "_change_type string, g string, v bigint")


def _fold_support(sup, delta):
    return fold_changes_into_aggregate(
        sup, delta, group_keys=["g", "v"], sum_cols=[], count_col="mult"
    )


def test_distinct_delete_decrements_only_on_last_occurrence(spark):
    sup = _support(spark, [("a", 1, 2), ("a", 2, 1)])
    # one of the two (a,1) rows goes: multiplicity 2→1, distinct stays 2
    out1 = _fold_support(sup, _sup_delta(spark, [("delete", "a", 1)]))
    assert {(r["g"], r["v"], r["mult"]) for r in out1.collect()} == {
        ("a", 1, 1), ("a", 2, 1)
    }
    # the LAST (a,2) row goes: support row retires, distinct drops to 1
    out2 = _fold_support(out1, _sup_delta(spark, [("delete", "a", 2)]))
    assert {(r["g"], r["v"]) for r in out2.collect()} == {("a", 1)}


def test_distinct_update_pair_same_value_cancels(spark):
    """A measure-only update (same group, same distinct value) must not
    move the multiplicity."""
    sup = _support(spark, [("a", 1, 3)])
    out = _fold_support(
        sup,
        _sup_delta(
            spark,
            [("update_preimage", "a", 1), ("update_postimage", "a", 1)],
        ),
    )
    assert [(r["g"], r["v"], r["mult"]) for r in out.collect()] == [
        ("a", 1, 3)
    ]


def test_distinct_update_moves_value_across_support_rows(spark):
    sup = _support(spark, [("a", 1, 1)])
    out = _fold_support(
        sup,
        _sup_delta(
            spark,
            [("update_preimage", "a", 1), ("update_postimage", "a", 9)],
        ),
    )
    assert {(r["g"], r["v"], r["mult"]) for r in out.collect()} == {
        ("a", 9, 1)
    }


# ---------------------------------------------------------------------------
# SCD2 from CDF (dimensions.scd2_apply_changes)
# ---------------------------------------------------------------------------

from aws_lakehouse_project_spark.operators.dimensions import (  # noqa: E402
    scd2_apply_changes,
)

HIST_SCHEMA = (
    "k bigint, seg string, start_v bigint, end_v bigint, is_current boolean"
)
CDF_SCHEMA = "_change_type string, k bigint, seg string"


def _hist_rows(df):
    return {
        (r["k"], r["seg"], r["start_v"], r["end_v"], r["is_current"])
        for r in df.collect()
    }


def test_scd2_update_pair_closes_and_opens(spark):
    hist = spark.createDataFrame([(1, "A", 0, None, True)], HIST_SCHEMA)
    delta = spark.createDataFrame(
        [("update_preimage", 1, "A"), ("update_postimage", 1, "B")],
        CDF_SCHEMA,
    )
    out = scd2_apply_changes(hist, delta, ["k"], ["seg"], version=1)
    assert _hist_rows(out) == {
        (1, "A", 0, 1, False),
        (1, "B", 1, None, True),
    }


def test_scd2_delete_closes_without_opening(spark):
    hist = spark.createDataFrame([(1, "A", 0, None, True)], HIST_SCHEMA)
    delta = spark.createDataFrame([("delete", 1, "A")], CDF_SCHEMA)
    out = scd2_apply_changes(hist, delta, ["k"], ["seg"], version=2)
    assert _hist_rows(out) == {(1, "A", 0, 2, False)}


def test_scd2_new_key_opens_without_closing(spark):
    hist = spark.createDataFrame([(1, "A", 0, None, True)], HIST_SCHEMA)
    delta = spark.createDataFrame([("insert", 2, "X")], CDF_SCHEMA)
    out = scd2_apply_changes(hist, delta, ["k"], ["seg"], version=1)
    assert _hist_rows(out) == {
        (1, "A", 0, None, True),
        (2, "X", 1, None, True),
    }


def test_scd2_reinsert_after_delete_reopens(spark):
    hist = spark.createDataFrame([(1, "A", 0, 1, False)], HIST_SCHEMA)
    delta = spark.createDataFrame([("insert", 1, "C")], CDF_SCHEMA)
    out = scd2_apply_changes(hist, delta, ["k"], ["seg"], version=3)
    assert _hist_rows(out) == {
        (1, "A", 0, 1, False),
        (1, "C", 3, None, True),
    }


def test_scd2_closed_rows_are_immutable(spark):
    """A later change to a key must not touch its already-closed rows."""
    hist = spark.createDataFrame(
        [(1, "A", 0, 1, False), (1, "B", 1, None, True)], HIST_SCHEMA
    )
    delta = spark.createDataFrame(
        [("update_preimage", 1, "B"), ("update_postimage", 1, "C")],
        CDF_SCHEMA,
    )
    out = scd2_apply_changes(hist, delta, ["k"], ["seg"], version=2)
    assert _hist_rows(out) == {
        (1, "A", 0, 1, False),
        (1, "B", 1, 2, False),
        (1, "C", 2, None, True),
    }


def test_scd2_rejects_column_drift(spark):
    hist = spark.createDataFrame(
        [(1, "A", 0, None, True)], HIST_SCHEMA
    ).select("k", "start_v", "seg", "end_v", "is_current")
    delta = spark.createDataFrame([("insert", 1, "A")], CDF_SCHEMA)
    with pytest.raises(ValueError, match="history columns"):
        scd2_apply_changes(hist, delta, ["k"], ["seg"], version=1)


def test_null_sum_group_stays_null(spark):
    """SQL SUM of an all-NULL group is NULL; a fold whose delta adds no
    values must not rewrite it as 0 (and a value arriving later sums
    from 0, matching SUM-ignores-NULLs)."""
    mv = spark.createDataFrame(
        [("a", None, 2), ("b", Decimal("3.00"), 1)],
        "k string, rev decimal(28,2), n bigint",
    )
    # delta touches group a with a NULL-valued insert: count moves, sum stays NULL
    out = _fold(
        mv,
        spark.createDataFrame(
            [("insert", "a", None)],
            "_change_type string, k string, rev decimal(28,2)",
        ),
    )
    assert _as_dict(out) == {"a": (None, 3), "b": (Decimal("3.00"), 1)}
    # a real value arriving later starts the sum from 0, not NULL
    out2 = _fold(
        out,
        spark.createDataFrame(
            [("insert", "a", Decimal("5.00"))],
            "_change_type string, k string, rev decimal(28,2)",
        ),
    )
    assert _as_dict(out2)["a"] == (Decimal("5.00"), 4)
