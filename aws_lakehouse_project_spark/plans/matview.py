"""Declarative materialized views over the transaction layer.

The reference's marts ARE materialized views maintained by scheduled
full/horizon merges (``dbt/models/marts/fct_daily_store_metrics.sql``);
this module gives the same artifact the maintenance story modern
lakehouses document (Databricks materialized views, pg_ivm,
Materialize): a SQL-declared aggregate whose REFRESH folds the base
table's change feed instead of recomputing — built on the pieces that
already exist here (``VersionedTable.changes`` for churn-proportional
deltas, ``operators/incremental.py``'s signed-fold algebra,
``merge_apply`` for file-granular CoW commits of only the touched
groups).

Contract:

- The MV is itself a ``VersionedTable``; its definition and the BASE
  VERSION WATERMARK it reflects ride each MV commit's manifest ``meta``
  (the same channel replication watermarks use), so a fresh handle — or
  another process — can refresh it with no driver-side state.
- ``REFRESH`` folds ``base.changes(watermark, head)`` — one churn-sized
  scan however many base commits landed since — nets it per group
  (map-side combine), joins the net against ONLY the touched groups of
  the stored MV (LEFT SEMI prune), and commits via ``merge_apply``:
  groups whose maintained count reaches zero are DELETED, others
  upserted. Refresh cost ∝ churn at any table size; the base is never
  re-aggregated.
- Supported aggregates: ``SUM(<expr>) AS alias`` / ``COUNT(*) AS
  alias`` (self-maintainable: pure fold) and ``MIN/MAX(<expr>) AS
  alias`` with the BOUNDED rescan-on-retraction doctrine of
  ``operators/incremental.py::fold_changes_into_minmax``: inserts fold
  join-free via least/greatest; only groups where a DELETED value
  ties-or-beats the maintained extremum are recomputed from the base —
  semi-joined down to exactly those keys, one rescan covering every
  MIN/MAX column of the group. A hidden ``__ivm_count`` column is
  maintained when the user didn't select COUNT(*) — retire-at-zero
  needs it (pg_ivm keeps the same hidden count).
- Exactness: folds are bit-identical to recomputes for decimal/integer
  measures (associative addition); double measures would drift exactly
  as they do in any engine's incremental plan — declare decimals.
- NULL group keys are REJECTED (at create, and at refresh if one
  appears in the delta): the churn-keyed equi-joins underneath
  (``merge_apply``) use SQL equality, where NULL never matches, so a
  NULL-key group would silently stop folding. Loud refusal beats a
  silently stale MV; the Python fold
  (``fold_changes_into_aggregate``) handles NULL keys null-safely for
  callers who need them.
- If VACUUM reclaimed the watermark version's history,
  ``VacuumedVersionError`` propagates — ``REFRESH ... FULL`` rebuilds
  from the current snapshot and re-arms the watermark.
- JOIN VIEWS: ``CREATE MATERIALIZED VIEW mv AS SELECT ... FROM a JOIN
  b USING (k) GROUP BY ...`` maintains an aggregate over a two-table
  equi-join with ONE watermark per base; REFRESH builds the join's own
  change feed from both bases' CDFs via the bilinear rule
  (``operators/incremental.py::join_signed_delta`` — Δ(A⋈B) = ΔA⋈B₀ +
  A₀⋈ΔB + ΔA⋈ΔB, mixed terms semi-pruned to the other side's delta
  keys) and folds it with the same SUM/COUNT machinery. MIN/MAX on a
  join view is refused (its retraction rescan would recompute join
  slices; declare it on a single-table view).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from .versioned import VersionedTable

#: Hidden per-group row count when the view didn't SELECT COUNT(*).
HIDDEN_COUNT = "__ivm_count"

_META_KEY = "materialized_view"
_ADDITIVE = ("insert", "update_postimage")


def definition(mv: VersionedTable) -> dict:
    """The stored MV definition (raises if the table isn't one)."""
    d = mv._manifest()["meta"].get(_META_KEY)  # noqa: SLF001
    if not d:
        raise ValueError(
            f"{mv.path}: not a materialized view (no {_META_KEY!r} "
            "entry in the head commit's meta)"
        )
    return d


def _null_key_guard(df: DataFrame, keys: list[str], where: str) -> None:
    has_null = reduce(
        lambda a, b: a | b, [F.col(k).isNull() for k in keys]
    )
    if not df.where(has_null).isEmpty():
        raise ValueError(
            f"materialized view {where}: NULL group key encountered — "
            "NULL keys don't survive the equality joins incremental "
            "maintenance uses; filter them in the base table or use "
            "fold_changes_into_aggregate directly"
        )


def _aggregate(
    snap: DataFrame,
    keys: list[str],
    sums: list[list[str]],
    count_col: str,
    mins: list[list[str]] = (),
    maxs: list[list[str]] = (),
) -> DataFrame:
    return snap.groupBy(*keys).agg(
        *[F.sum(F.expr(e)).alias(a) for e, a in sums],
        *[F.min(F.expr(e)).alias(a) for e, a in mins],
        *[F.max(F.expr(e)).alias(a) for e, a in maxs],
        F.count(F.lit(1)).cast("long").alias(count_col),
    )


def create_materialized_view(
    spark: SparkSession,
    base_name: str,
    base: VersionedTable,
    mv: VersionedTable,
    keys: list[str],
    sums: list[list[str]],
    count_col: str = HIDDEN_COUNT,
    mins: list[list[str]] = (),
    maxs: list[list[str]] = (),
) -> int:
    """Build the MV from the base's CURRENT snapshot and stamp the
    definition + watermark into the commit meta. ``sums`` / ``mins`` /
    ``maxs`` are lists of ``[expr, alias]`` pairs (expressions evaluate
    per base row)."""
    base_v = base.latest_version()
    agg = _aggregate(
        base.read(spark, base_v), keys, sums, count_col, mins, maxs
    )
    meta = {
        _META_KEY: {
            "base": base_name,
            "base_version": base_v,
            "group_keys": list(keys),
            "sums": [list(p) for p in sums],
            "mins": [list(p) for p in mins],
            "maxs": [list(p) for p in maxs],
            "count_col": count_col,
        }
    }
    v = mv.write_full(agg, meta=meta)
    # post-write so the check reads the (small) materialized parquet,
    # not a second pass over the base
    _null_key_guard(mv.read(spark, v), keys, "create")
    return v


def refresh_materialized_view(
    spark: SparkSession,
    mv: VersionedTable,
    base: VersionedTable,
    full: bool = False,
) -> tuple[int, str]:
    """Advance the MV to the base's head. Returns ``(mv_version,
    mode)`` where mode is ``noop`` (watermark already at head),
    ``incremental`` (CDF fold), or ``full`` (rebuild requested)."""
    d = definition(mv)
    keys, sums, cnt = d["group_keys"], d["sums"], d["count_col"]
    mins, maxs = d.get("mins", []), d.get("maxs", [])
    head = base.latest_version()
    if full:
        agg = _aggregate(base.read(spark, head), keys, sums, cnt, mins, maxs)
        v = mv.write_full(
            agg, meta={_META_KEY: {**d, "base_version": head}}
        )
        _null_key_guard(mv.read(spark, v), keys, "full refresh")
        return v, "full"
    wm = d["base_version"]
    if head == wm:
        return mv.latest_version(), "noop"
    delta = base.changes(spark, wm, head)
    add = F.col("_change_type").isin(*_ADDITIVE)
    nets = (
        delta.select(
            *keys,
            F.when(add, 1).otherwise(-1).alias("__s"),
            add.alias("__add"),
            *[F.expr(e).alias(a) for e, a in sums],
            *[F.expr(e).alias(a) for e, a in mins],
            *[F.expr(e).alias(a) for e, a in maxs],
        )
        .groupBy(*keys)
        .agg(
            *[F.sum(F.col(a) * F.col("__s")).alias(a) for _, a in sums],
            # insert-side fold candidates and deleted-side retraction
            # probes, per extremum column (NULL values never probe:
            # MIN/MAX ignore NULLs, so removing one retracts nothing)
            *[
                F.min(F.when(F.col("__add"), F.col(a))).alias(f"__ins__{a}")
                for _, a in mins
            ],
            *[
                F.min(F.when(~F.col("__add"), F.col(a))).alias(f"__del__{a}")
                for _, a in mins
            ],
            *[
                F.max(F.when(F.col("__add"), F.col(a))).alias(f"__ins__{a}")
                for _, a in maxs
            ],
            *[
                F.max(F.when(~F.col("__add"), F.col(a))).alias(f"__del__{a}")
                for _, a in maxs
            ],
            F.sum("__s").cast("long").alias(cnt),
        )
    )
    _null_key_guard(nets, keys, "refresh")
    mv_types = {
        f.name: f.dataType
        for f in StructType.fromJson(mv._manifest()["schema"]).fields  # noqa: SLF001
    }
    current = mv.read(spark).join(
        nets.select(*keys).distinct(), keys, "left_semi"
    )
    merged = current.alias("m").join(nets.alias("d"), keys, "full_outer")
    new_cnt = (
        F.coalesce(F.col(f"m.{cnt}"), F.lit(0))
        + F.coalesce(F.col(f"d.{cnt}"), F.lit(0))
    ).cast("long")
    # a group needs a rescan only if it SURVIVES and a deleted value
    # ties-or-beats its maintained extremum (the bounded doctrine of
    # fold_changes_into_minmax); dead groups delete, fold-only groups
    # take least/greatest against the insert candidates join-free
    probes = [
        F.coalesce(F.col(f"d.__del__{a}") <= F.col(f"m.{a}"), F.lit(False))
        for _, a in mins
    ] + [
        F.coalesce(F.col(f"d.__del__{a}") >= F.col(f"m.{a}"), F.lit(False))
        for _, a in maxs
    ]
    trigger = (
        reduce(lambda x, y: x | y, probes) if probes else F.lit(False)
    ) & (new_cnt > 0)
    pre = merged.select(
        *keys,
        *[
            # both sides NULL -> NULL: SQL SUM of an all-NULL group is
            # NULL; coalesce-to-0 alone would rewrite it as 0
            F.when(
                F.col(f"m.{a}").isNull() & F.col(f"d.{a}").isNull(),
                F.lit(None),
            )
            .otherwise(
                F.coalesce(F.col(f"m.{a}"), F.lit(0))
                + F.coalesce(F.col(f"d.{a}"), F.lit(0))
            )
            .cast(mv_types[a])
            .alias(a)
            for _, a in sums
        ],
        *[
            F.least(F.col(f"m.{a}"), F.col(f"d.__ins__{a}")).alias(a)
            for _, a in mins
        ],
        *[
            F.greatest(F.col(f"m.{a}"), F.col(f"d.__ins__{a}")).alias(a)
            for _, a in maxs
        ],
        new_cnt.alias(cnt),
        trigger.alias("__trig"),
    )
    if mins or maxs:
        trig_keys = pre.where(F.col("__trig")).select(*keys).distinct()
        rescan = (
            base.read(spark, head)
            .join(F.broadcast(trig_keys), keys, "left_semi")
            .groupBy(*keys)
            .agg(
                *[F.min(F.expr(e)).alias(f"__rs__{a}") for e, a in mins],
                *[F.max(F.expr(e)).alias(f"__rs__{a}") for e, a in maxs],
            )
        )
        pre = pre.join(rescan, keys, "left").select(
            *keys,
            *[F.col(a) for _, a in sums],
            *[
                F.when(F.col("__trig"), F.col(f"__rs__{a}"))
                .otherwise(F.col(a))
                .cast(mv_types[a])
                .alias(a)
                for _, a in mins + maxs
            ],
            F.col(cnt),
            F.col("__trig"),
        )
    changes_df = pre.select(
        *keys,
        *[F.col(a) for _, a in sums],
        *[F.col(a) for _, a in mins + maxs],
        F.col(cnt),
        F.when(F.col(cnt) > 0, F.lit("upsert"))
        .otherwise(F.lit("delete"))
        .alias("__op"),
    )
    v = mv.merge_apply(
        spark,
        changes_df,
        keys,
        op_col="__op",
        meta={_META_KEY: {**d, "base_version": head}},
    )
    return v, "incremental"


def create_materialized_join_view(
    spark: SparkSession,
    a_name: str,
    a: VersionedTable,
    b_name: str,
    b: VersionedTable,
    on: list[str],
    mv: VersionedTable,
    keys: list[str],
    sums: list[list[str]],
    count_col: str = HIDDEN_COUNT,
) -> int:
    """Build an aggregate MV over ``a ⋈ b`` (equi-join USING ``on``)
    and stamp the two-watermark definition into the commit meta."""
    va, vb = a.latest_version(), b.latest_version()
    joined = a.read(spark, va).join(b.read(spark, vb), on)
    agg = _aggregate(joined, keys, sums, count_col)
    meta = {
        _META_KEY: {
            "base": a_name,
            "base_version": va,
            "base_b": b_name,
            "base_b_version": vb,
            "join_on": list(on),
            "group_keys": list(keys),
            "sums": [list(p) for p in sums],
            "count_col": count_col,
        }
    }
    v = mv.write_full(agg, meta=meta)
    _null_key_guard(mv.read(spark, v), keys, "create")
    return v


def refresh_materialized_join_view(
    spark: SparkSession,
    mv: VersionedTable,
    a: VersionedTable,
    b: VersionedTable,
    full: bool = False,
) -> tuple[int, str]:
    """Advance a JOIN-view MV to both bases' heads: the join's own
    change feed comes from the bilinear delta rule over the two CDFs,
    then folds exactly like a single-table refresh. Returns
    ``(mv_version, mode)``."""
    from ..operators.incremental import join_signed_delta

    d = definition(mv)
    keys, sums, cnt = d["group_keys"], d["sums"], d["count_col"]
    on = d["join_on"]
    ha, hb = a.latest_version(), b.latest_version()
    if full:
        joined = a.read(spark, ha).join(b.read(spark, hb), on)
        v = mv.write_full(
            _aggregate(joined, keys, sums, cnt),
            meta={
                _META_KEY: {**d, "base_version": ha, "base_b_version": hb}
            },
        )
        _null_key_guard(mv.read(spark, v), keys, "full refresh")
        return v, "full"
    wa, wb = d["base_version"], d["base_b_version"]
    if (ha, hb) == (wa, wb):
        return mv.latest_version(), "noop"
    da = a.changes(spark, wa, ha) if ha != wa else None
    db = b.changes(spark, wb, hb) if hb != wb else None
    delta = join_signed_delta(
        a.read(spark, wa), da, b.read(spark, wb), db, on=on
    )
    sign = F.when(F.col("_change_type").isin(*_ADDITIVE), 1).otherwise(-1)
    nets = (
        delta.select(
            *keys, sign.alias("__s"), *[F.expr(e).alias(al) for e, al in sums]
        )
        .groupBy(*keys)
        .agg(
            *[F.sum(F.col(al) * F.col("__s")).alias(al) for _, al in sums],
            F.sum("__s").cast("long").alias(cnt),
        )
    )
    _null_key_guard(nets, keys, "refresh")
    mv_types = {
        f.name: f.dataType
        for f in StructType.fromJson(mv._manifest()["schema"]).fields  # noqa: SLF001
    }
    current = mv.read(spark).join(
        nets.select(*keys).distinct(), keys, "left_semi"
    )
    merged = current.alias("m").join(nets.alias("d"), keys, "full_outer")
    new_cnt = (
        F.coalesce(F.col(f"m.{cnt}"), F.lit(0))
        + F.coalesce(F.col(f"d.{cnt}"), F.lit(0))
    ).cast("long")
    changes_df = merged.select(
        *keys,
        *[
            # both sides NULL -> NULL: SQL SUM of an all-NULL group is
            # NULL; coalesce-to-0 alone would rewrite it as 0
            F.when(
                F.col(f"m.{al}").isNull() & F.col(f"d.{al}").isNull(),
                F.lit(None),
            )
            .otherwise(
                F.coalesce(F.col(f"m.{al}"), F.lit(0))
                + F.coalesce(F.col(f"d.{al}"), F.lit(0))
            )
            .cast(mv_types[al])
            .alias(al)
            for _, al in sums
        ],
        new_cnt.alias(cnt),
        F.when(new_cnt > 0, F.lit("upsert"))
        .otherwise(F.lit("delete"))
        .alias("__op"),
    )
    v = mv.merge_apply(
        spark,
        changes_df,
        keys,
        op_col="__op",
        meta={_META_KEY: {**d, "base_version": ha, "base_b_version": hb}},
    )
    return v, "incremental"
