"""SQL front-end for the versioned transaction layer — the Delta-SQL
DML/utility dialect re-expressed over ``VersionedTable``.

The reference's users speak SQL (Athena DDL + dbt models,
``/root/reference/dbt/models`` at large); the transaction layer is a
Python API. ``LakehouseSession.sql`` closes that gap for the statement
shapes Delta Lake documents:

    CREATE [OR REPLACE] TABLE t AS SELECT ...
    INSERT INTO t SELECT ...
    INSERT INTO t REPLACE WHERE <pred> SELECT ...
    DELETE FROM t WHERE <pred>
    UPDATE t SET c = e, ... [WHERE <pred>]
    MERGE INTO t USING s ON t.k = s.k [AND ...]
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
    MERGE INTO t USING s ON ... WHEN MATCHED THEN DELETE
    OPTIMIZE t [WHERE c BETWEEN lo AND hi] [ZORDER BY (c1, c2)]
    VACUUM t [RETAIN n VERSIONS | RETAIN n HOURS] [NO RETENTION CHECK] [DRY RUN]
    DESCRIBE HISTORY t | DESCRIBE DETAIL t
    RESTORE TABLE t TO VERSION AS OF n | TO TIMESTAMP AS OF epoch
    CREATE TABLE c [SHALLOW|DEEP] CLONE s [VERSION AS OF n]
    ALTER TABLE t ADD CONSTRAINT name CHECK (expr)
    ALTER TABLE t DROP CONSTRAINT name
    SELECT ... FROM t [VERSION AS OF n | TIMESTAMP AS OF <epoch>] ...
    SELECT COUNT(*) FROM t [VERSION AS OF n]   -- metadata-only
    CREATE MATERIALIZED VIEW mv AS SELECT ... FROM base GROUP BY ...
    REFRESH MATERIALIZED VIEW mv [FULL]        -- CDF fold (plans/matview.py)

Design decisions, each load-bearing:

- **SELECT delegates to Spark SQL.** Registered tables become temp
  views of their head snapshots (deletion vectors applied); time-travel
  clauses are rewritten to per-version views BEFORE handing the text to
  ``spark.sql`` — Catalyst does everything else, so the full SQL
  surface (joins, windows, CTEs) works against versioned snapshots with
  zero new query-engine code.
- **DML parses with anchored regexes, not a grammar.** Each statement
  form is matched whole; anything that doesn't match raises with the
  supported-grammar list. A front-end that silently mis-parses DML into
  the wrong mutation is worse than none.
- **Expressions are never interpreted here.** Predicates, SET values
  and CHECK bodies pass through verbatim to ``F.expr``/Spark SQL, so
  the expression language is exactly Spark's.
- **Execution-mode hints.** ``DELETE /*+ MERGE_ON_READ */`` and
  ``UPDATE /*+ MERGE_ON_READ */`` pick the deletion-vector path
  (Delta governs this via a table property; a hint keeps the choice
  per-statement and visible in the statement text).

Every statement returns a DataFrame (DML returns a one-row summary
with the committed version), matching ``spark.sql``'s contract so a
caller can treat the session uniformly.
"""

from __future__ import annotations

import os
import re
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.localrows import local_rows

from .versioned import _FEEDLESS_OPS, VacuumedVersionError, VersionedTable

_GRAMMAR = """supported statements:
  CREATE [OR REPLACE] TABLE t AS SELECT ... | INSERT INTO t [REPLACE WHERE p] SELECT ...
  DELETE [/*+ MERGE_ON_READ */] FROM t WHERE p
  UPDATE [/*+ MERGE_ON_READ */] t SET c=e[, ...] [WHERE p]
  MERGE INTO t USING s ON t.k=s.k [AND ...] WHEN MATCHED THEN UPDATE SET *
    WHEN NOT MATCHED THEN INSERT * | ... WHEN MATCHED THEN DELETE
  OPTIMIZE t [WHERE c BETWEEN lo AND hi] [ZORDER BY (c1, c2)] | VACUUM t [RETAIN n VERSIONS | RETAIN n HOURS] [NO RETENTION CHECK] [DRY RUN]
  DESCRIBE HISTORY t | DESCRIBE DETAIL t | DESCRIBE MATERIALIZED VIEW mv
  RESTORE TABLE t TO VERSION AS OF n | RESTORE TABLE t TO TIMESTAMP AS OF epoch
  CREATE TABLE c [SHALLOW|DEEP] CLONE s [VERSION AS OF n]
    (c pre-registered; SHALLOW is metadata-only — source files by
    reference, independent history from the clone commit on)
  ALTER TABLE t ADD CONSTRAINT name CHECK (expr) | ALTER TABLE t DROP CONSTRAINT name
  ALTER TABLE t ALTER COLUMN c SET NOT NULL | ... DROP NOT NULL
    (validated against existing data, enforced on every later commit
    through the CHECK channel; surfaced in DESCRIBE DETAIL)
  DROP TABLE [IF EXISTS] t | DROP MATERIALIZED VIEW [IF EXISTS] mv
    (deletes the directory — an MV's hidden support tables go with
    it — and unregisters; each verb refuses the other's kind)
  SHOW TABLES   (registered names, locations, head versions)
  ALTER TABLE t RENAME COLUMN a TO b | ALTER TABLE t DROP COLUMN c
  ALTER TABLE t SET CHANGE FEED = true|false [WITH BACKFILL]
    (persisted table property — every later handle materializes each
    commit's row-level feed; WITH BACKFILL also materializes retained
    earlier commits so streams can start from version 0)
  SELECT ... FROM t [VERSION AS OF n | TIMESTAMP AS OF epoch] ...
  SELECT COUNT(*) | MIN(c) | MAX(c) [, ...] FROM t [VERSION AS OF n]
    (metadata-only from manifest stats; Catalyst fallthrough whenever
     metadata cannot guarantee the answer — DVs, decimals, no stat)
  SELECT ... FROM t WHERE c = <lit>  (plan-time file skipping:
    manifest min/max stats + per-file bloom sidecar when present)
  SELECT ... FROM TABLE_CHANGES('t', lo[, hi]) ...  (Delta's CDF TVF:
    row-level changes with _change_type + _commit_version; lo
    INCLUSIVE, version 0 = initial snapshot as inserts; manifest-diff
    per commit — churn-proportional, never a snapshot pair)
  CREATE BLOOMFILTER INDEX FOR COLUMNS (c1[, c2]) ON t [WITH BACKFILL]
  DROP BLOOMFILTER INDEX ON t
  CREATE MATERIALIZED VIEW mv [WITH CHANGE FEED] AS
    SELECT [key | key_expr AS alias, ...] SUM|MIN|MAX|AVG(e) AS a
    [, SUM|MIN|MAX|AVG(e)|COUNT(*)|COUNT(DISTINCT e)
       FILTER (WHERE p) AS a]
    [, ...] [, COUNT(DISTINCT e) AS a] [, COUNT(*) AS c]
    FROM base [VERSION AS OF n] [JOIN b [VERSION AS OF n] USING (k[, ...])]
    (VERSION AS OF creates the view — watermark included — at a
     historical snapshot; the first REFRESH folds everything since)
    [WHERE p]   (view-level predicate over base columns — the
    filter-then-aggregate staging shape as ONE maintained view;
    selection is linear, so every maintenance path filters by p)
    GROUP BY keys   (keys may be expressions — GROUP BY the alias or
    the exact expression text, e.g. GROUP BY date_trunc('month', dt);
    on JOIN views each expression must be computable from ONE side's
    columns; mv pre-registered; definition + per-base
    watermarks ride the commit meta; MIN/MAX refresh with bounded
    rescan-on-retraction — on JOIN views the rescan is the triggered
    groups' JOIN SLICE; COUNT(DISTINCT) via a hidden support table
    fed by the base CDF (single-table) or the bilinear join delta
    (JOIN views); JOIN views refresh via the bilinear delta rule
    over both bases' CDFs)
  REFRESH MATERIALIZED VIEW mv [FULL]   (folds base CDF since the
    watermark via merge_apply — churn-proportional; FULL rebuilds)
  COPY INTO t FROM 'src' [FILEFORMAT = PARQUET] [PATTERN = 'glob']
    (idempotent: each source file loads exactly once; the ledger
    rides the commit meta — plans/ingest.py)
  APPLY CHANGES INTO dim FROM CHANGES(src)|SNAPSHOT src KEYS (k[, ...])
    [IGNORE NULL UPDATES] [APPLY AS DELETE WHEN cond] [SEQUENCE BY c]
    [COLUMNS * EXCEPT (c[, ...])]
    [TRACK HISTORY ON * EXCEPT (c[, ...])] SCD TYPE 1|2
    (DLT's declarative verb: TYPE 2 keeps [start,end) ordinal history,
    TYPE 1 keeps only each key's latest row; first APPLY loads the
    source snapshot, each later data commit folds its change feed —
    churned keys' current rows close/replace, additive rows open;
    IGNORE NULL UPDATES merges partial-column feeds column-wise (a
    NULL attr keeps the key's current value); APPLY AS DELETE WHEN
    treats matching additive changes as soft
    deletes (and drops matching snapshot rows at init); SEQUENCE BY
    collapses multi-row keys to their highest-sequence row and drops
    out-of-order (late) changes — NULL sequence values are rejected;
    COLUMNS * EXCEPT keeps the named source columns out of the target
    (the delete condition may still reference them — the CDC op-marker
    pattern); TRACK HISTORY ON * EXCEPT updates the current row in
    place when only the named untracked columns changed (TYPE 2 only);
    FROM SNAPSHOT treats each source data commit as a FULL re-ingested
    snapshot and folds the key-level diff of consecutive snapshots —
    absence closes/deletes, a re-appearing key opens a new row;
    snapshots must be key-unique; CDC-only clauses refused;
    the watermark rides the target's commit meta —
    plans/apply_changes.py)"""

_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"
_HINT = r"(?:/\*\+\s*(?P<hint>MERGE_ON_READ)\s*\*/\s*)?"


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at paren/quote depth zero (SET lists and ZORDER
    column lists may contain function calls and string literals)."""
    out, buf, depth, quote = [], [], 0, None
    for ch in s:
        if quote:
            if ch == quote:
                quote = None
            buf.append(ch)
            continue
        if ch in "'\"":
            quote = ch
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif ch == sep and depth == 0:
            out.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    if "".join(buf).strip():
        out.append("".join(buf).strip())
    return out


class LakehouseSession:
    """A named-table registry + SQL dispatcher over VersionedTable."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._tables: dict[str, VersionedTable] = {}

    # -- registry -----------------------------------------------------------

    def register(self, name: str, table: VersionedTable) -> VersionedTable:
        if not re.fullmatch(_IDENT, name):
            raise ValueError(f"table name must be an identifier: {name!r}")
        self._tables[name] = table
        return table

    def create(self, name: str, path: str, **kw) -> VersionedTable:
        return self.register(name, VersionedTable(path, **kw))

    def table(self, name: str) -> VersionedTable:
        if name not in self._tables:
            raise KeyError(
                f"unknown table {name!r} (registered: {sorted(self._tables)})"
            )
        return self._tables[name]

    # -- helpers --------------------------------------------------------------

    def _row(self, **cols) -> DataFrame:
        # Literal projection over range(1), NOT createDataFrame([tuple]):
        # a python-list frame is RDD-backed, so every .first()/collect on
        # a statement's 1-row result paid a Python-worker round trip
        # (~1 s on local[32]; the APPLY/REFRESH demo queries read 2-3
        # such results each — measured in OPTIMIZATION_r14.md). The
        # literal plan is a JVM-local relation; same names, same types
        # (string for str, bigint for ints and None).
        return self.spark.range(1).select(
            *[
                (
                    F.lit(v) if isinstance(v, str)
                    else F.lit(v).cast("bigint")
                ).alias(n)
                for n, v in cols.items()
            ]
        )

    def _register_views(self) -> None:
        for name, vt in self._tables.items():
            if vt.exists():
                vt.read(self.spark).createOrReplaceTempView(name)

    def _run_select(self, statement: str) -> DataFrame:
        """Rewrite time-travel clauses and ``table_changes(...)`` TVF
        calls into per-version temp views, then delegate to Spark SQL
        with all registered tables as views."""
        self._register_views()
        text = statement

        def _tc(mm: re.Match) -> str:
            # Delta's CDF table-valued function: table_changes('t', lo
            # [, hi]) — rewritten to a temp view over the manifest-diff
            # change feed (VersionedTable.changes; churn-proportional,
            # _commit_version carried for multi-commit ranges via
            # per-version union like the stream source's contract)
            name = mm.group("t")
            if name not in self._tables:
                raise ValueError(
                    f"table_changes: unknown table {name!r} (registered: "
                    f"{sorted(self._tables)})"
                )
            vt = self._tables[name]
            head = vt.latest_version()
            if head is None:
                raise ValueError(
                    f"table_changes: table {name!r} has no commits — "
                    "TABLE_CHANGES('t', lo[, hi]) needs at least one "
                    "version to read changes from"
                )
            lo = int(mm.group("lo"))
            hi = int(mm.group("hi")) if mm.group("hi") else head
            # Delta raises a clean out-of-range error rather than a raw
            # missing-manifest failure; mirror that (versionAsOf-style
            # VERSION_NOT_FOUND semantics)
            if hi > head or lo > hi:
                raise ValueError(
                    f"table_changes: requested range [{lo}, {hi}] is out "
                    f"of bounds for {name!r} (versions 0..{head}); "
                    "TABLE_CHANGES('t', lo[, hi]) with lo <= hi <= "
                    "latest version"
                )
            oldest = vt.versions()[0]
            if oldest > 0 and lo <= oldest:
                # Delta raises for CDF ranges below the retention
                # horizon rather than returning a silently partial
                # feed (the loop below iterates retained versions
                # only). Version v's changes diff against v-1's
                # manifest, so the earliest servable start is
                # oldest+1 once the log head was pruned.
                raise VacuumedVersionError(
                    f"table_changes: requested range [{lo}, {hi}] "
                    f"starts below {name!r}'s retention horizon — "
                    f"manifests before {oldest} were vacuumed, so "
                    f"changes are readable from {oldest + 1}; rebuild "
                    "downstream state or start there"
                )
            feed = None
            for v in vt.versions():
                # Delta's contract: starting version INCLUSIVE, version
                # 0's "changes" being the initial snapshot as inserts
                if not (lo <= v <= hi):
                    continue
                if vt._manifest(v)["op"] in _FEEDLESS_OPS:  # noqa: SLF001
                    continue
                if v == 0:
                    part = vt.read(self.spark, 0).select(
                        F.lit("insert").alias("_change_type"), "*"
                    )
                else:
                    part = vt.changes(self.spark, v - 1, v)
                part = part.withColumn(
                    "_commit_version", F.lit(v).cast("long")
                )
                feed = part if feed is None else feed.unionByName(part)
            if feed is None:
                feed = self.spark.createDataFrame(
                    [], vt.changes_schema(hi)
                )
            view = f"{name}__changes_{lo}_{hi}"
            feed.createOrReplaceTempView(view)
            return view

        text = re.sub(
            rf"TABLE_CHANGES\s*\(\s*'(?P<t>{_IDENT})'\s*,\s*(?P<lo>\d+)"
            r"(?:\s*,\s*(?P<hi>\d+))?\s*\)",
            _tc,
            text,
            flags=re.IGNORECASE,
        )

        def _tt(mm: re.Match) -> str:
            name = mm.group("t")
            if name not in self._tables:
                return mm.group(0)  # not ours — leave for Catalyst
            vt = self._tables[name]
            if mm.group("kind").upper().startswith("VERSION"):
                v = int(mm.group("val"))
            else:
                v = vt.version_at(float(mm.group("val")))
            view = f"{name}__v{v}"
            vt.read(self.spark, version=v).createOrReplaceTempView(view)
            return view

        text = re.sub(
            rf"(?P<t>{_IDENT})\s+(?P<kind>VERSION\s+AS\s+OF|TIMESTAMP\s+AS\s+OF)"
            r"\s+(?P<val>[0-9.]+)",
            _tt,
            text,
            flags=re.IGNORECASE,
        )
        return self.spark.sql(text)

    def _merge_keys(self, cond: str, target: str, source: str) -> list[str]:
        """An ON clause restricted to AND-ed same-column equalities
        (``t.k = s.k``) — the canonical upsert join. Anything richer
        raises: a mis-read merge condition corrupts the target."""
        keys = []
        for part in re.split(r"\s+AND\s+", cond.strip(), flags=re.IGNORECASE):
            mm = re.fullmatch(
                rf"\s*({_IDENT})\.({_IDENT})\s*=\s*({_IDENT})\.({_IDENT})\s*",
                part,
            )
            if not mm:
                raise ValueError(
                    f"MERGE ON clause must be AND-ed qualified equalities, "
                    f"got: {part!r}"
                )
            qa, ca, qb, cb = mm.groups()
            if {qa, qb} != {target, source} or ca != cb:
                raise ValueError(
                    f"MERGE ON equality must pair target and source on the "
                    f"same column name, got: {part!r}"
                )
            keys.append(ca)
        return keys

    def _create_mv(
        self,
        mm: re.Match,
        base_name: str,
        mv_vt: VersionedTable,
        keys: list[str],
        sums: list[list[str]],
        mins: list[list[str]],
        maxs: list[list[str]],
        avgs: list[list[str]],
        distincts: list[list[str]],
        count_col: str | None,
        key_exprs: list[list[str]] | None = None,
    ) -> int:
        """Dispatch a parsed CREATE MATERIALIZED VIEW to the single-
        table or JOIN-view constructor (validation already ran)."""
        from .matview import (
            HIDDEN_COUNT,
            create_materialized_join_view,
            create_materialized_view,
        )

        if mm.group("b2"):
            on = []
            for c in _split_top(mm.group("on")):
                if not re.fullmatch(_IDENT, c):
                    raise ValueError(
                        f"USING entries must be plain columns: {c!r}"
                        f"\n{_GRAMMAR}"
                    )
                on.append(c)
            return create_materialized_join_view(
                self.spark,
                base_name,
                self.table(base_name),
                mm.group("b2"),
                self.table(mm.group("b2")),
                on=on,
                mv=mv_vt,
                keys=keys,
                sums=sums,
                count_col=count_col or HIDDEN_COUNT,
                avgs=avgs,
                mins=mins,
                maxs=maxs,
                distincts=distincts,
                at_version=int(mm.group("bv")) if mm.group("bv") else None,
                at_version_b=(
                    int(mm.group("b2v")) if mm.group("b2v") else None
                ),
                where=(mm.group("w") or "").strip() or None,
                key_exprs=key_exprs,
            )
        return create_materialized_view(
            self.spark,
            base_name,
            self.table(base_name),
            mv_vt,
            keys=keys,
            sums=sums,
            count_col=count_col or HIDDEN_COUNT,
            mins=mins,
            maxs=maxs,
            avgs=avgs,
            distincts=distincts,
            at_version=int(mm.group("bv")) if mm.group("bv") else None,
            key_exprs=key_exprs,
            where=(mm.group("w") or "").strip() or None,
        )

    # -- dispatcher -----------------------------------------------------------

    def sql(self, statement: str) -> DataFrame:
        s = statement.strip().rstrip(";").strip()

        mm = re.fullmatch(
            rf"CREATE\s+MATERIALIZED\s+VIEW\s+(?P<mv>{_IDENT})\s+"
            r"(?:(?P<cf>WITH\s+CHANGE\s+FEED)\s+)?AS\s+"
            rf"SELECT\s+(?P<items>.+?)\s+FROM\s+(?P<b>{_IDENT})"
            r"(?:\s+VERSION\s+AS\s+OF\s+(?P<bv>\d+))?"
            rf"(?:\s+JOIN\s+(?P<b2>{_IDENT})"
            r"(?:\s+VERSION\s+AS\s+OF\s+(?P<b2v>\d+))?"
            r"\s+USING\s+\((?P<on>[^)]+)\))?"
            r"(?:\s+WHERE\s+(?P<w>.+?))?"
            r"\s+GROUP\s+BY\s+(?P<keys>.+)",
            s, flags=re.IGNORECASE | re.DOTALL,
        )
        if mm:
            from .matview import HIDDEN_COUNT, _validate_output_names

            mv_name, base_name = mm.group("mv"), mm.group("b")
            raw_keys = _split_top(mm.group("keys"))
            sums: list[list[str]] = []
            mins: list[list[str]] = []
            maxs: list[list[str]] = []
            avgs: list[list[str]] = []
            distincts: list[list[str]] = []
            count_col = None
            selected_keys = []
            expr_keys: list[list[str]] = []
            for item in _split_top(mm.group("items")):
                # FILTER-clause sugar FIRST (the generic agg pattern's
                # greedy expr would swallow a trailing FILTER clause).
                # Both desugar onto the existing SUM fold with EXACT
                # semantics: COUNT(*) FILTER counts predicate-true rows
                # (never NULL while the group lives); SUM(e) FILTER
                # sums predicate-true rows and the hidden non-null
                # count makes it NULL when none match — precisely
                # standard FILTER behavior, so the fold is maintenance-
                # free sugar, not a new aggregate kind.
                im = re.fullmatch(
                    r"COUNT\s*\(\s*\*\s*\)\s+FILTER\s*\(\s*WHERE\s+"
                    r"(?P<p>.+)\)\s+AS\s+(?P<a>" + _IDENT + ")",
                    item, flags=re.IGNORECASE | re.DOTALL,
                )
                if im:
                    sums.append([
                        f"CASE WHEN ({im.group('p').strip()}) THEN "
                        "CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END",
                        im.group("a"),
                    ])
                    continue
                im = re.fullmatch(
                    r"(?P<f>SUM|MIN|MAX|AVG)\s*\((?P<e>.+?)\)\s+FILTER"
                    r"\s*\(\s*WHERE\s+(?P<p>.+)\)\s+AS\s+(?P<a>"
                    + _IDENT + ")",
                    item, flags=re.IGNORECASE | re.DOTALL,
                )
                if im:
                    # AGG(e) FILTER (WHERE p) ≡ AGG(CASE WHEN p THEN e
                    # END) exactly: SUM/AVG ignore the NULLs via the
                    # hidden non-null counts, MIN/MAX ignore NULLs by
                    # definition — every kind rides its existing fold
                    {"SUM": sums, "MIN": mins, "MAX": maxs, "AVG": avgs}[
                        im.group("f").upper()
                    ].append([
                        f"CASE WHEN ({im.group('p').strip()}) THEN "
                        f"({im.group('e').strip()}) END",
                        im.group("a"),
                    ])
                    continue
                im = re.fullmatch(
                    r"COUNT\s*\(\s*DISTINCT\s+(?P<e>.+?)\)\s+FILTER"
                    r"\s*\(\s*WHERE\s+(?P<p>.+)\)\s+AS\s+(?P<a>"
                    + _IDENT + ")",
                    item, flags=re.IGNORECASE | re.DOTALL,
                )
                if im:
                    distincts.append([
                        f"CASE WHEN ({im.group('p').strip()}) THEN "
                        f"({im.group('e').strip()}) END",
                        im.group("a"),
                    ])
                    continue
                if re.search(r"\)\s+FILTER\s*\(", item, flags=re.IGNORECASE):
                    # keep the generic agg pattern's greedy expr from
                    # silently swallowing a malformed FILTER clause
                    raise ValueError(
                        "could not parse FILTER clause item — expected "
                        "COUNT(*)|SUM|MIN|MAX|AVG|COUNT(DISTINCT e) "
                        f"FILTER (WHERE p) AS alias, got: {item!r}"
                        f"\n{_GRAMMAR}"
                    )
                im = re.fullmatch(
                    r"COUNT\s*\(\s*DISTINCT\s+(?P<e>.+)\)\s+AS\s+(?P<a>"
                    + _IDENT + ")",
                    item, flags=re.IGNORECASE | re.DOTALL,
                )
                if im:
                    distincts.append([im.group("e").strip(), im.group("a")])
                    continue
                im = re.fullmatch(
                    r"(?P<f>SUM|MIN|MAX|AVG)\s*\((?P<e>.+)\)\s+AS\s+(?P<a>"
                    + _IDENT + ")",
                    item, flags=re.IGNORECASE | re.DOTALL,
                )
                if im:
                    {"SUM": sums, "MIN": mins, "MAX": maxs, "AVG": avgs}[
                        im.group("f").upper()
                    ].append([im.group("e").strip(), im.group("a")])
                    continue
                im = re.fullmatch(
                    r"COUNT\s*\(\s*\*\s*\)\s+AS\s+(?P<a>" + _IDENT + ")",
                    item, flags=re.IGNORECASE,
                )
                if im:
                    if count_col is not None:
                        raise ValueError(
                            "at most one COUNT(*) item in a materialized "
                            f"view\n{_GRAMMAR}"
                        )
                    count_col = im.group("a")
                    continue
                if re.fullmatch(_IDENT, item):
                    selected_keys.append(item)
                    continue
                im = re.fullmatch(
                    r"(?P<e>.+)\s+AS\s+(?P<a>" + _IDENT + ")",
                    item, flags=re.IGNORECASE | re.DOTALL,
                )
                if im and not re.match(
                    r"(?:SUM|MIN|MAX|AVG|COUNT)\s*\(",
                    im.group("e").strip(),
                    flags=re.IGNORECASE,
                ):
                    # EXPRESSION group key candidate (GROUP BY
                    # date_trunc('month', dt) — the canonical rollup):
                    # resolved against the GROUP BY entries below. An
                    # aggregate-shaped expr that reached here is an
                    # UNSUPPORTED aggregate item (e.g. COUNT(col)) —
                    # let it fall to the precise item error instead of
                    # silently absorbing it as a key and failing later
                    # with a raw AnalysisException inside withColumn.
                    expr_keys.append([im.group("e").strip(), im.group("a")])
                    continue
                raise ValueError(
                    "materialized view items must be group keys "
                    "(column or expr AS alias), "
                    f"SUM/MIN/MAX/AVG(expr) AS alias, COUNT(DISTINCT "
                    f"expr) AS alias, or COUNT(*) AS alias — got: "
                    f"{item!r}\n{_GRAMMAR}"
                )
            # resolve GROUP BY entries: a selected plain column, a
            # selected expression's alias, or its exact expression text
            by_alias = {a: [e, a] for e, a in expr_keys}
            by_expr = {e: [e, a] for e, a in expr_keys}
            key_exprs: list[list[str]] = []
            for g in raw_keys:
                if re.fullmatch(_IDENT, g):
                    if g in selected_keys:
                        key_exprs.append([g, g])
                    elif g in by_alias:
                        key_exprs.append(by_alias[g])
                    else:
                        raise ValueError(
                            f"GROUP BY entry {g!r} is not a selected "
                            f"column or expression alias\n{_GRAMMAR}"
                        )
                elif g in by_expr:
                    key_exprs.append(by_expr[g])
                else:
                    raise ValueError(
                        f"GROUP BY entry {g!r} must be a selected "
                        "column, a selected expression's alias, or "
                        f"that expression's exact text\n{_GRAMMAR}"
                    )
            keys = [a for _, a in key_exprs]
            # an expr item no GROUP BY entry references is either an
            # unsupported aggregate (MEDIAN(x) AS a) or a stray
            # projection — name it with the items error, not a
            # confusing key-set mismatch
            unref = [
                f"{e} AS {a}"
                for e, a in expr_keys
                if [e, a] not in key_exprs
            ]
            if unref:
                raise ValueError(
                    f"selected items {unref} are not GROUP BY keys — "
                    "materialized view items must be group keys "
                    "(column or expr AS alias), SUM/MIN/MAX/AVG(expr) "
                    "AS alias, COUNT(DISTINCT expr) AS alias, or "
                    f"COUNT(*) AS alias\n{_GRAMMAR}"
                )
            sel_out = set(selected_keys) | {a for _, a in expr_keys}
            if sel_out != set(keys):
                raise ValueError(
                    f"selected key columns {sorted(sel_out)} must be "
                    f"exactly the GROUP BY keys {keys}\n{_GRAMMAR}"
                )
            # ONE implementation of the duplicate-alias / reserved-
            # __-prefix rules (shared with direct Python callers):
            # create_* re-runs it, but failing HERE keeps the grammar
            # help attached and nothing armed on any handle
            try:
                _validate_output_names(
                    keys, sums, mins, maxs, avgs,
                    count_col or HIDDEN_COUNT, distincts,
                )
            except ValueError as exc:
                raise ValueError(f"{exc}\n{_GRAMMAR}") from None
            mv_vt = self.table(mv_name)
            prev_cf = mv_vt._change_feed  # noqa: SLF001
            if mm.group("cf"):
                # the MV itself emits a change feed — a tier-2 MV can
                # then fold THIS view's CDF (cascading tiers). Set just
                # before the create and rolled back on ANY failure, so
                # a rejected statement never leaves the flag armed for
                # a later plain CREATE to silently persist.
                mv_vt.change_feed = True
            try:
                v = self._create_mv(mm, base_name, mv_vt, keys, sums,
                                    mins, maxs, avgs, distincts, count_col,
                                    key_exprs=key_exprs)
            except BaseException:
                mv_vt.change_feed = prev_cf
                raise
            return self._row(op="create_materialized_view", version=v)


        mm = re.fullmatch(
            rf"DESCRIBE\s+MATERIALIZED\s+VIEW\s+(?P<mv>{_IDENT})",
            s, flags=re.IGNORECASE,
        )
        if mm:
            from .matview import definition

            d = definition(self.table(mm.group("mv")))
            aggs = [f"SUM({e}) AS {a}" for e, a in d["sums"]]
            aggs += [f"MIN({e}) AS {a}" for e, a in d.get("mins", [])]
            aggs += [f"MAX({e}) AS {a}" for e, a in d.get("maxs", [])]
            aggs += [f"AVG({e}) AS {a}" for e, a in d.get("avgs", [])]
            aggs += [
                f"COUNT(DISTINCT {e}) AS {a}"
                for e, a in d.get("distincts", [])
            ]
            row = {
                "base": d["base"],
                "base_version": d["base_version"],
                "group_keys": ", ".join(
                    a if e == a else f"{e} AS {a}"
                    for e, a in d.get(
                        "key_exprs", [[k, k] for k in d["group_keys"]]
                    )
                ),
                "aggregates": "; ".join(aggs),
                "count_col": d["count_col"],
            }
            if d.get("where"):
                row["where"] = d["where"]
            if "base_b" in d:
                row["base_b"] = d["base_b"]
                row["base_b_version"] = d["base_b_version"]
                row["join_on"] = ", ".join(d["join_on"])
            return self._row(**row)

        mm = re.fullmatch(
            rf"COPY\s+INTO\s+(?P<t>{_IDENT})\s+FROM\s+'(?P<src>[^']+)'"
            r"(?:\s+FILEFORMAT\s*=\s*(?P<fmt>PARQUET))?"
            r"(?:\s+PATTERN\s*=\s*'(?P<pat>[^']+)')?",
            s, flags=re.IGNORECASE,
        )
        if mm:
            from .ingest import copy_into

            out = copy_into(
                self.spark,
                self.table(mm.group("t")),
                mm.group("src"),
                pattern=mm.group("pat") or "*.parquet",
            )
            return self._row(op="copy_into", **out)

        mm = re.fullmatch(
            rf"REFRESH\s+MATERIALIZED\s+VIEW\s+(?P<mv>{_IDENT})"
            r"(?:\s+(?P<full>FULL))?",
            s, flags=re.IGNORECASE,
        )
        if mm:
            from .matview import (
                definition,
                refresh_materialized_join_view,
                refresh_materialized_view,
            )

            mv = self.table(mm.group("mv"))
            d = definition(mv)
            if "base_b" in d:
                v, mode = refresh_materialized_join_view(
                    self.spark,
                    mv,
                    self.table(d["base"]),
                    self.table(d["base_b"]),
                    full=bool(mm.group("full")),
                )
            else:
                v, mode = refresh_materialized_view(
                    self.spark,
                    mv,
                    self.table(d["base"]),
                    full=bool(mm.group("full")),
                )
            return self._row(op="refresh", mode=mode, version=v)

        mm = re.fullmatch(
            rf"APPLY\s+CHANGES\s+INTO\s+(?P<dim>{_IDENT})\s+FROM\s+"
            rf"(?:CHANGES\s*\(\s*(?P<src>{_IDENT})\s*\)"
            rf"|SNAPSHOT\s+(?P<snap>{_IDENT}))\s+"
            r"KEYS\s*\((?P<keys>[^)]+)\)\s+"
            r"(?:(?P<inu>IGNORE\s+NULL\s+UPDATES)\s+)?"
            r"(?:APPLY\s+AS\s+DELETE\s+WHEN\s+(?P<del>.+?)\s+)?"
            rf"(?:SEQUENCE\s+BY\s+(?P<seq>{_IDENT})\s+)?"
            r"(?:COLUMNS\s+\*\s+EXCEPT\s*\((?P<ex>[^)]+)\)\s+)?"
            r"(?:TRACK\s+HISTORY\s+ON\s+\*\s+EXCEPT\s*"
            r"\((?P<th>[^)]+)\)\s+)?"
            r"SCD\s+TYPE\s+(?P<ty>[12])",
            s, flags=re.IGNORECASE | re.DOTALL,
        )
        if mm:
            from .apply_changes import (
                apply_changes_scd1,
                apply_changes_scd2,
            )

            keys = []
            for k in _split_top(mm.group("keys")):
                if not re.fullmatch(_IDENT, k):
                    raise ValueError(
                        f"KEYS entries must be plain columns, got: {k!r}"
                        f"\n{_GRAMMAR}"
                    )
                keys.append(k)
            except_cols = []
            for c in _split_top(mm.group("ex") or ""):
                if not re.fullmatch(_IDENT, c):
                    raise ValueError(
                        f"COLUMNS * EXCEPT entries must be plain "
                        f"columns, got: {c!r}\n{_GRAMMAR}"
                    )
                except_cols.append(c)
            track_except = []
            for c in _split_top(mm.group("th") or ""):
                if not re.fullmatch(_IDENT, c):
                    raise ValueError(
                        f"TRACK HISTORY ON * EXCEPT entries must be "
                        f"plain columns, got: {c!r}\n{_GRAMMAR}"
                    )
                track_except.append(c)
            src_name = mm.group("src") or mm.group("snap")
            kw: dict = {
                "seq_col": mm.group("seq"),
                "delete_when": (
                    mm.group("del").strip() if mm.group("del") else None
                ),
                "except_cols": except_cols,
                "ignore_null_updates": bool(mm.group("inu")),
                "from_snapshot": bool(mm.group("snap")),
            }
            if mm.group("ty") == "2":
                fn = apply_changes_scd2
                kw["track_except"] = track_except
            else:
                if track_except:
                    raise ValueError(
                        "TRACK HISTORY ON * EXCEPT applies to SCD TYPE "
                        f"2 only (TYPE 1 keeps no history)\n{_GRAMMAR}"
                    )
                fn = apply_changes_scd1
            out = fn(
                self.spark,
                self.table(mm.group("dim")),
                self.table(src_name),
                src_name,
                keys,
                **kw,
            )
            return self._row(
                op="apply_changes",
                mode=out["mode"],
                version=out["version"],
                ordinals_applied=out["ordinals_applied"],
            )

        mm = re.fullmatch(
            rf"CREATE\s+(?P<orr>OR\s+REPLACE\s+)?TABLE\s+(?P<t>{_IDENT})"
            r"\s+AS\s+(?P<q>SELECT\b.*)",
            s, flags=re.IGNORECASE | re.DOTALL,
        )
        if mm:
            vt = self.table(mm.group("t"))
            if vt.exists() and not mm.group("orr"):
                # Delta/ANSI CREATE TABLE errors on existence — a bare
                # CTAS silently replacing a live head would make an
                # accidental name reuse destructive (r8 ADVICE)
                raise ValueError(
                    f"table {mm.group('t')!r} already exists (head "
                    f"version {vt.latest_version()}); use CREATE OR "
                    "REPLACE TABLE to overwrite it"
                )
            v = vt.write_full(self._run_select(mm.group("q")))
            return self._row(op="create", version=v)

        mm = re.fullmatch(
            rf"INSERT\s+INTO\s+(?P<t>{_IDENT})"
            r"(?:\s+REPLACE\s+WHERE\s+(?P<p>.+?))?\s+(?P<q>SELECT\b.*)",
            s, flags=re.IGNORECASE | re.DOTALL,
        )
        if mm:
            vt = self.table(mm.group("t"))
            df = self._run_select(mm.group("q"))
            if mm.group("p"):
                v = vt.replace_where(self.spark, mm.group("p"), df)
                return self._row(op="replace_where", version=v)
            v = vt.append(df)
            return self._row(op="append", version=v)

        mm = re.fullmatch(
            rf"DELETE\s+{_HINT}FROM\s+(?P<t>{_IDENT})\s+WHERE\s+(?P<p>.+)",
            s, flags=re.IGNORECASE | re.DOTALL,
        )
        if mm:
            vt = self.table(mm.group("t"))
            mode = "merge_on_read" if mm.group("hint") else "copy_on_write"
            v = vt.delete_where(self.spark, mm.group("p"), mode=mode)
            return self._row(op="delete", version=v)

        mm = re.fullmatch(
            rf"UPDATE\s+{_HINT}(?P<t>{_IDENT})\s+SET\s+(?P<sets>.+?)"
            r"(?:\s+WHERE\s+(?P<p>.+))?",
            s, flags=re.IGNORECASE | re.DOTALL,
        )
        if mm:
            vt = self.table(mm.group("t"))
            sets = {}
            for a in _split_top(mm.group("sets")):
                am = re.fullmatch(rf"({_IDENT})\s*=\s*(.+)", a, flags=re.DOTALL)
                if not am:
                    raise ValueError(f"bad SET assignment: {a!r}\n{_GRAMMAR}")
                sets[am.group(1)] = am.group(2)
            mode = "merge_on_read" if mm.group("hint") else "copy_on_write"
            v = vt.update_where(
                self.spark, mm.group("p") or "true", sets, mode=mode
            )
            return self._row(op="update", version=v)

        mm = re.fullmatch(
            rf"MERGE\s+INTO\s+(?P<t>{_IDENT})\s+USING\s+(?P<s>{_IDENT})\s+"
            r"ON\s+(?P<on>.+?)\s+"
            r"(?:WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*\s+"
            r"WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*"
            r"|(?P<del>WHEN\s+MATCHED\s+THEN\s+DELETE))",
            s, flags=re.IGNORECASE | re.DOTALL,
        )
        if mm:
            vt = self.table(mm.group("t"))
            self._register_views()
            src = self.spark.table(mm.group("s"))
            keys = self._merge_keys(mm.group("on"), mm.group("t"), mm.group("s"))
            if mm.group("del"):
                changes = src.withColumn("__op", F.lit("delete"))
                v = vt.merge_apply(self.spark, changes, keys, op_col="__op")
            else:
                v = vt.merge_upsert(self.spark, src, keys)
            return self._row(op="merge", version=-1 if v is None else v)

        mm = re.fullmatch(
            rf"OPTIMIZE\s+(?P<t>{_IDENT})"
            rf"(?:\s+WHERE\s+(?P<wc>{_IDENT})\s+BETWEEN\s+"
            r"(?P<wlo>'[^']*'|-?\d+(?:\.\d+)?)\s+AND\s+"
            r"(?P<whi>'[^']*'|-?\d+(?:\.\d+)?))?"
            r"(?:\s+ZORDER\s+BY\s+\((?P<z>[^)]+)\))?",
            s, flags=re.IGNORECASE,
        )
        if mm:
            vt = self.table(mm.group("t"))

            def _wlit(raw: str):
                return (
                    raw[1:-1]
                    if raw.startswith("'")
                    else (float(raw) if "." in raw else int(raw))
                )

            # Delta's OPTIMIZE ... WHERE, stats-plane form: only files
            # whose manifest [min,max] for the column could intersect
            # the range are rewritten (compact the hot day, never touch
            # the cold files)
            scope = (
                (mm.group("wc"), _wlit(mm.group("wlo")), _wlit(mm.group("whi")))
                if mm.group("wc")
                else None
            )
            if mm.group("z"):
                from ..sources.writers import zorder_value

                cols = [c.strip() for c in _split_top(mm.group("z"))]
                aggs = []
                for c in cols:
                    aggs += [F.min(c).cast("double"), F.max(c).cast("double")]
                row = vt.read(self.spark).agg(*aggs).first()
                los = [row[i * 2] for i in range(len(cols))]
                his = [row[i * 2 + 1] for i in range(len(cols))]
                n = sum(
                    st.get("rows", 0)
                    for st in vt._manifest()["stats"].values()
                )
                v = vt.optimize(
                    self.spark,
                    target_rows_per_file=max(1, n // 8 + 1),
                    sort_within=[zorder_value(cols, los, his)],
                    rewrite_all=True,
                    where=scope,
                )
            else:
                v = vt.optimize(
                    self.spark, target_rows_per_file=10_000_000, where=scope
                )
            if not scope and not mm.group("z"):
                # plain OPTIMIZE on a materialized view also bin-packs
                # its hidden COUNT(DISTINCT) support tables (one merge
                # commit per REFRESH accretes small files there, and
                # users can't name the tables themselves). WHERE/ZORDER
                # forms don't cascade: their columns target the MV's
                # schema, not the support tables'.
                from .matview import support_tables

                for sup in support_tables(vt):
                    sup.optimize(self.spark, target_rows_per_file=10_000_000)
            return self._row(op="optimize", version=v)

        mm = re.fullmatch(
            rf"VACUUM\s+(?P<t>{_IDENT})"
            r"(?:\s+RETAIN\s+(?:(?P<n>\d+)\s+VERSIONS"
            r"|(?P<h>\d+(?:\.\d+)?)\s+HOURS))?"
            r"(?P<nocheck>\s+NO\s+RETENTION\s+CHECK)?(?P<dry>\s+DRY\s+RUN)?",
            s, flags=re.IGNORECASE,
        )
        if mm:
            # RETAIN n HOURS is Delta's surface form; the engine unions
            # the time horizon with retain_last=1 (head always kept).
            # The stated retention also sets the in-flight-reader floor
            # (retain_recent_s): one duration governs both, as Delta's
            # retention does. Every other form — including RETAIN n
            # VERSIONS — keeps the safe default floor; lifting it takes
            # the explicit NO RETENTION CHECK suffix (Delta's
            # retentionDurationCheck.enabled=false), because a count
            # request alone is not consent to yank files from under an
            # in-flight reader.
            kw = dict(
                retain_last=int(mm.group("n") or 1),
                retain_hours=(
                    float(mm.group("h")) if mm.group("h") else None
                ),
                dry_run=bool(mm.group("dry")),
                retain_recent_s=(
                    0.0
                    if mm.group("nocheck")
                    else (
                        float(mm.group("h")) * 3600.0
                        if mm.group("h")
                        else None
                    )
                ),
            )
            vt = self.table(mm.group("t"))
            rep = vt.vacuum(**kw)
            removed_f = rep["removed_data_files"]
            removed_v = rep["removed_versions"]
            # VACUUM on a materialized view covers its hidden
            # COUNT(DISTINCT) support tables (same retention terms):
            # they take one commit per REFRESH and the user cannot name
            # them directly, so skipping them would grow their logs and
            # dead files without bound.
            from .matview import support_tables

            for sup in support_tables(vt):
                srep = sup.vacuum(**kw)
                removed_f += srep["removed_data_files"]
                removed_v += srep["removed_versions"]
            return self._row(
                op="vacuum",
                removed_data_files=removed_f,
                removed_versions=removed_v,
            )

        mm = re.fullmatch(
            rf"DESCRIBE\s+HISTORY\s+(?P<t>{_IDENT})", s, flags=re.IGNORECASE
        )
        if mm:
            hist = self.table(mm.group("t")).history()
            return local_rows(
                self.spark,
                [
                    (h["version"], h["op"], h["n_files"], h["n_rows"],
                     float(h["ts"]) if h.get("ts") else None)
                    for h in hist
                ],
                "version bigint, op string, n_files bigint, n_rows bigint, "
                "timestamp double",
            )

        mm = re.fullmatch(
            rf"DESCRIBE\s+DETAIL\s+(?P<t>{_IDENT})", s, flags=re.IGNORECASE
        )
        if mm:
            # Delta's DESCRIBE DETAIL: one row of head-snapshot facts.
            # All metadata-only (manifest + log listing + on-disk sizes
            # of referenced files) — no data scan at any table size.
            vt = self.table(mm.group("t"))
            m = vt._manifest()
            # loud like row_count: a referenced-but-missing file means
            # corrupt metadata — under-reporting size silently would
            # mask exactly the corruption DESCRIBE DETAIL should surface
            size = 0
            for f in m["files"]:
                p = os.path.join(vt.path, f)
                try:
                    size += os.path.getsize(p)
                except OSError as exc:
                    raise FileNotFoundError(
                        f"DESCRIBE DETAIL: manifest v{m['version']} "
                        f"references a missing data file: {f}"
                    ) from exc
            from .versioned import _NOTNULL_PREFIX

            return local_rows(
                self.spark,
                [(
                    vt.path,
                    int(m["version"]),
                    len(m["files"]),
                    int(size),
                    len(vt.versions()),
                    float(m["ts"]) if m.get("ts") else None,
                    ",".join(sorted(vt.stats_cols or [])),
                    ",".join(vt.not_null_cols()),
                    "; ".join(
                        f"{n} CHECK ({e})"
                        for n, e in sorted(m.get("constraints", {}).items())
                        if not n.startswith(_NOTNULL_PREFIX)
                    ),
                )],
                "location string, version bigint, num_files bigint, "
                "size_bytes bigint, num_versions bigint, "
                "last_modified double, stats_columns string, "
                "not_null_columns string, check_constraints string",
            )

        mm = re.fullmatch(
            rf"RESTORE\s+TABLE\s+(?P<t>{_IDENT})\s+TO\s+"
            r"(?:VERSION\s+AS\s+OF\s+(?P<v>\d+)"
            r"|TIMESTAMP\s+AS\s+OF\s+(?P<ts>\d+(?:\.\d+)?))",
            s, flags=re.IGNORECASE,
        )
        if mm:
            vt = self.table(mm.group("t"))
            target = (
                int(mm.group("v"))
                if mm.group("v")
                else vt.version_at(float(mm.group("ts")))
            )
            v = vt.restore(target, spark=self.spark)
            return self._row(op="restore", version=v)

        mm = re.fullmatch(
            rf"CREATE\s+TABLE\s+(?P<c>{_IDENT})\s+"
            r"(?:(?P<kind>SHALLOW|DEEP)\s+)?CLONE\s+"
            rf"(?P<src>{_IDENT})"
            r"(?:\s+VERSION\s+AS\s+OF\s+(?P<v>\d+))?",
            s, flags=re.IGNORECASE,
        )
        if mm:
            # Delta's CREATE TABLE ... [SHALLOW|DEEP] CLONE. The clone
            # target must be pre-registered (it carries the path, like
            # every table here); the statement materializes it.
            dest = self.table(mm.group("c"))
            if dest.exists():
                raise ValueError(
                    f"clone target {mm.group('c')!r} already has a table "
                    f"(head version {dest.latest_version()})"
                )
            cloned = self.table(mm.group("src")).clone(
                dest.path,
                shallow=(mm.group("kind") or "SHALLOW").upper() == "SHALLOW",
                version=int(mm.group("v")) if mm.group("v") else None,
            )
            self.register(mm.group("c"), cloned)
            return self._row(op="clone", version=0)

        mm = re.fullmatch(
            rf"ALTER\s+TABLE\s+(?P<t>{_IDENT})\s+ADD\s+CONSTRAINT\s+"
            rf"(?P<n>{_IDENT})\s+CHECK\s*\((?P<e>.+)\)",
            s, flags=re.IGNORECASE | re.DOTALL,
        )
        if mm:
            v = self.table(mm.group("t")).add_constraint(
                self.spark, mm.group("n"), mm.group("e")
            )
            return self._row(op="set_constraint", version=v)

        mm = re.fullmatch(
            rf"ALTER\s+TABLE\s+(?P<t>{_IDENT})\s+DROP\s+CONSTRAINT\s+"
            rf"(?P<n>{_IDENT})",
            s, flags=re.IGNORECASE,
        )
        if mm:
            v = self.table(mm.group("t")).drop_constraint(mm.group("n"))
            return self._row(op="drop_constraint", version=v)

        mm = re.fullmatch(
            rf"ALTER\s+TABLE\s+(?P<t>{_IDENT})\s+ALTER\s+COLUMN\s+"
            rf"(?P<c>{_IDENT})\s+(?P<k>SET|DROP)\s+NOT\s+NULL",
            s, flags=re.IGNORECASE,
        )
        if mm:
            vt = self.table(mm.group("t"))
            if mm.group("k").upper() == "SET":
                v = vt.set_not_null(self.spark, mm.group("c"))
                return self._row(op="set_not_null", version=v)
            v = vt.drop_not_null(mm.group("c"))
            return self._row(op="drop_not_null", version=v)

        mm = re.fullmatch(
            r"DROP\s+(?P<mv>MATERIALIZED\s+VIEW|TABLE)"
            rf"(?:\s+(?P<ie>IF\s+EXISTS))?\s+(?P<t>{_IDENT})",
            s, flags=re.IGNORECASE,
        )
        if mm:
            # Delta's DROP TABLE / Databricks' DROP MATERIALIZED VIEW:
            # deletes the table directory (an MV's hidden _support/
            # tables live inside it and go with it) and unregisters the
            # name. Each verb refuses the other's artifact kind — a
            # DROP TABLE that silently destroyed a maintained view (or
            # vice versa) would be the destructive form of a typo.
            name = mm.group("t")
            if name not in self._tables or not self._tables[name].exists():
                if mm.group("ie"):
                    return self._row(op="drop", dropped=0)
                raise KeyError(
                    f"cannot drop unknown/empty table {name!r} "
                    "(DROP ... IF EXISTS to tolerate)"
                )
            vt = self._tables[name]
            is_mv = vt.latest_meta("materialized_view") is not None
            want_mv = mm.group("mv").upper().startswith("MATERIALIZED")
            if want_mv and not is_mv:
                raise ValueError(
                    f"{name!r} is a plain table, not a materialized "
                    "view — use DROP TABLE"
                )
            if not want_mv and is_mv:
                raise ValueError(
                    f"{name!r} is a materialized view — use DROP "
                    "MATERIALIZED VIEW (its hidden support tables drop "
                    "with it)"
                )
            import shutil

            shutil.rmtree(vt.path, ignore_errors=True)
            del self._tables[name]
            self.spark.catalog.dropTempView(name)
            return self._row(op="drop", dropped=1)

        if re.fullmatch(r"SHOW\s+TABLES", s, flags=re.IGNORECASE):
            rows = [
                (
                    n,
                    vt.path,
                    bool(vt.exists()),
                    -1 if vt.latest_version() is None else vt.latest_version(),
                    vt.latest_meta("materialized_view") is not None
                    if vt.exists()
                    else False,
                )
                for n, vt in sorted(self._tables.items())
            ]
            return local_rows(
                self.spark,
                rows,
                "name string, location string, exists boolean, "
                "version bigint, is_materialized_view boolean",
            )

        mm = re.fullmatch(
            rf"ALTER\s+TABLE\s+(?P<t>{_IDENT})\s+SET\s+CHANGE\s+FEED\s*"
            r"=\s*(?P<v>TRUE|FALSE)(?P<bf>\s+WITH\s+BACKFILL)?",
            s, flags=re.IGNORECASE,
        )
        if mm:
            v = self.table(mm.group("t")).set_change_feed(
                self.spark,
                mm.group("v").upper() == "TRUE",
                backfill=bool(mm.group("bf")),
            )
            return self._row(op="set_change_feed", version=v)

        mm = re.fullmatch(
            rf"ALTER\s+TABLE\s+(?P<t>{_IDENT})\s+RENAME\s+COLUMN\s+"
            rf"(?P<a>{_IDENT})\s+TO\s+(?P<b>{_IDENT})",
            s, flags=re.IGNORECASE,
        )
        if mm:
            v = self.table(mm.group("t")).rename_column(
                mm.group("a"), mm.group("b")
            )
            return self._row(op="rename_column", version=v)

        mm = re.fullmatch(
            rf"ALTER\s+TABLE\s+(?P<t>{_IDENT})\s+DROP\s+COLUMN\s+"
            rf"(?P<c>{_IDENT})",
            s, flags=re.IGNORECASE,
        )
        if mm:
            v = self.table(mm.group("t")).drop_column(mm.group("c"))
            return self._row(op="drop_column", version=v)

        mm = re.fullmatch(
            r"CREATE\s+BLOOMFILTER\s+INDEX\s+FOR\s+COLUMNS\s*"
            rf"\((?P<cols>[^)]+)\)\s+ON\s+(?P<t>{_IDENT})"
            r"(?P<bf>\s+WITH\s+BACKFILL)?",
            s, flags=re.IGNORECASE,
        )
        if mm:
            cols = [c.strip() for c in mm.group("cols").split(",")]
            v = self.table(mm.group("t")).set_bloom_cols(
                self.spark, cols, backfill=bool(mm.group("bf"))
            )
            return self._row(op="set_bloom_index", version=v)

        mm = re.fullmatch(
            rf"DROP\s+BLOOMFILTER\s+INDEX\s+ON\s+(?P<t>{_IDENT})",
            s, flags=re.IGNORECASE,
        )
        if mm:
            v = self.table(mm.group("t")).set_bloom_cols(self.spark, [])
            return self._row(op="drop_bloom_index", version=v)

        mm = re.fullmatch(
            rf"SELECT\s+(?P<cols>.+?)\s+FROM\s+(?P<t>{_IDENT})\s+"
            rf"WHERE\s+(?P<c>{_IDENT})\s*=\s*"
            r"(?P<val>'[^']*'|-?\d+(?:\.\d+)?)"
            r"(?P<rest>(?:\s+ORDER\s+BY\s+[^;]+?)?(?:\s+LIMIT\s+\d+)?)",
            s, flags=re.IGNORECASE | re.DOTALL,
        )
        if (
            mm
            and mm.group("t") in self._tables
            and not re.search(
                r"\b(JOIN|GROUP|UNION|SELECT)\b",
                mm.group("cols"),
                flags=re.IGNORECASE,
            )
        ):
            # point-lookup fast path: a single-table equality SELECT
            # routes through scan(eq=...) so manifest min/max stats AND
            # any per-file bloom sidecar prune the file list at plan
            # time (Delta's data-skipping-on-read). The residual
            # equality filter still applies row-level inside scan(), so
            # results are identical to the Catalyst fallthrough.
            raw = mm.group("val")
            value = (
                raw[1:-1]
                if raw.startswith("'")
                else (float(raw) if "." in raw else int(raw))
            )
            vt = self.table(mm.group("t"))
            pruned = vt.scan(self.spark, mm.group("c"), eq=value)
            # a throwaway uuid view, dropped once the statement is
            # analyzed (spark.sql analyzes eagerly, so the returned
            # DataFrame keeps its resolved plan): a fixed name would be
            # a session-global that clobbers any user view of the same
            # name and races concurrent point lookups on one table
            view = f"__eqscan_{uuid.uuid4().hex}"
            pruned.createOrReplaceTempView(view)
            try:
                return self.spark.sql(
                    f"SELECT {mm.group('cols')} FROM {view}{mm.group('rest')}"
                )
            finally:
                self.spark.catalog.dropTempView(view)

        mm = re.fullmatch(
            rf"SELECT\s+(?P<items>.+?)\s+FROM\s+(?P<t>{_IDENT})"
            r"(?:\s+VERSION\s+AS\s+OF\s+(?P<v>\d+))?",
            s, flags=re.IGNORECASE,
        )
        if mm and mm.group("t") in self._tables:
            # Delta's metadata-only aggregates: a select list made
            # entirely of COUNT(*) / MIN(c) / MAX(c) over one table (or
            # one version) is answered from manifest stats — zero data
            # I/O at any table size. Falls through to Catalyst whenever
            # metadata cannot GUARANTEE the answer (deletion vectors,
            # missing stats, decimal stats are pruning-grade) or the
            # list holds anything else (WHERE/GROUP BY never match).
            item_re = re.compile(
                r"(?:(?P<cnt>COUNT\s*\(\s*\*\s*\))|"
                rf"COUNT\s*\(\s*(?P<cc>{_IDENT})\s*\)|"
                rf"(?P<fn>MIN|MAX)\s*\(\s*(?P<c>{_IDENT})\s*\))"
                rf"(?:\s+AS\s+(?P<a>{_IDENT}))?",
                re.IGNORECASE,
            )
            parsed = [
                item_re.fullmatch(it.strip())
                for it in _split_top(mm.group("items"))
            ]
            if parsed and all(parsed):
                vt = self.table(mm.group("t"))
                ver = int(mm.group("v")) if mm.group("v") else None
                try:
                    from pyspark.sql.types import StructType

                    schema = StructType.fromJson(vt._manifest(ver)["schema"])
                    out = []
                    for m2 in parsed:
                        if m2.group("cnt"):
                            out.append(
                                F.lit(vt.row_count(ver))
                                .cast("bigint")
                                .alias(m2.group("a") or "count(1)")
                            )
                        elif m2.group("cc"):
                            c = m2.group("cc")
                            out.append(
                                F.lit(vt.col_non_null_count(c, ver))
                                .cast("bigint")
                                .alias(m2.group("a") or f"count({c})")
                            )
                        else:
                            fn = m2.group("fn").lower()
                            c = m2.group("c")
                            mn, mx = vt.col_min_max(c, ver)
                            dtype = next(
                                f.dataType
                                for f in schema.fields
                                if f.name == c
                            )
                            out.append(
                                F.lit(mn if fn == "min" else mx)
                                .cast(dtype)
                                .alias(m2.group("a") or f"{fn}({c})")
                            )
                    return self.spark.range(1).select(*out)
                except ValueError:
                    pass  # not metadata-answerable → Catalyst scans

        if re.match(r"(SELECT|WITH)\b", s, flags=re.IGNORECASE):
            return self._run_select(s)

        raise ValueError(f"cannot parse statement: {statement!r}\n{_GRAMMAR}")
