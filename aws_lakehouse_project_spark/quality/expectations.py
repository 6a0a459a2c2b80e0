"""Expectation compiler — the reference's data-quality DSL, Spark-native.

The reference interprets 4 expectation types row-by-row in pandas
(reference ``local_runner.py:62-104``; suites
``great_expectations/expectations/*.json``) and aborts the pipeline on the
first violation (``local_runner.py:43-44``). Here every *column*
expectation in a suite compiles to a violation-count aggregate and the
whole suite runs as ONE single-pass Spark aggregation — one job, one scan,
no per-row Python. The schema expectation (ordered columns) is a
driver-side metadata check, free of any job.

Expectation types (same IDs as the reference's suites):
- ``expect_table_columns_to_match_ordered_list``
- ``expect_column_values_to_not_be_null``
- ``expect_column_values_to_be_between`` (min bound)
- ``expect_column_values_to_match_regex``
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..errors import ExpectationFailure
from ..sources.readers import CORRUPT_COL


@dataclass(frozen=True)
class Expectation:
    """One expectation: a type id plus its kwargs (GE-suite shaped)."""

    expectation_type: str
    kwargs: dict

    def violation_condition(self) -> Column | None:
        """Compile to a per-row violation predicate (None for the
        schema-level expectation, which has no row scope)."""
        t, kw = self.expectation_type, self.kwargs
        if t == "expect_table_columns_to_match_ordered_list":
            return None
        col = F.col(kw["column"])
        if t == "expect_column_values_to_not_be_null":
            return col.isNull()
        if t == "expect_column_values_to_be_between":
            # raw-zone columns are strings (crawler-typed in the
            # reference); try_cast keeps ANSI mode from aborting on
            # non-numeric garbage — those rows yield NULL, which the
            # not-null expectation owns
            num = col.try_cast("double")
            cond = F.lit(False)
            if kw.get("min_value") is not None:
                cond = cond | (num < F.lit(float(kw["min_value"])))
            if kw.get("max_value") is not None:
                cond = cond | (num > F.lit(float(kw["max_value"])))
            return cond
        if t == "expect_column_values_to_match_regex":
            # null or non-matching both violate, like the reference's
            # .str.match(...).all() over stringified values
            return col.isNull() | ~col.cast("string").rlike(kw["regex"])
        raise ValueError(f"unknown expectation type: {t}")

    def label(self) -> str:
        c = self.kwargs.get("column", "<table>")
        return f"{self.expectation_type}({c})"


def suite_from_ge_json(doc: dict) -> list[Expectation]:
    """Load a Great-Expectations-style suite document
    ({"expectations": [{"expectation_type": ..., "kwargs": {...}}]})."""
    return [
        Expectation(e["expectation_type"], dict(e.get("kwargs", {})))
        for e in doc["expectations"]
    ]


def check_constraints(
    suite: list[Expectation], columns: list[str] | None = None
) -> dict[str, str]:
    """Compile a GE suite's row-level expectations into CHECK-constraint
    SQL for ``plans.versioned.VersionedTable`` (SQL CHECK semantics:
    NULL passes, only FALSE violates — so between/regex pair with an
    explicit not_null exactly as GE suites do). ``columns`` restricts
    the compilation to expectations whose column survived the staging
    projection; schema-level expectations have no row scope and are
    skipped (they gate at validate/WAP-audit time instead)."""
    out: dict[str, str] = {}
    for e in suite:
        t, kw = e.expectation_type, e.kwargs
        col = kw.get("column")
        if col is None or (columns is not None and col not in columns):
            continue
        if t == "expect_column_values_to_not_be_null":
            out[f"nn_{col}"] = f"{col} IS NOT NULL"
        elif t == "expect_column_values_to_be_between":
            parts = []
            if kw.get("min_value") is not None:
                parts.append(f"{col} >= {float(kw['min_value'])}")
            if kw.get("max_value") is not None:
                parts.append(f"{col} <= {float(kw['max_value'])}")
            if parts:
                out[f"bounds_{col}"] = " AND ".join(parts)
        elif t == "expect_column_values_to_match_regex":
            # double the backslashes: Spark SQL string literals treat \
            # as an escape, and the pattern must survive one parse
            pat = kw["regex"].replace("\\", "\\\\").replace("'", "\\'")
            out[f"regex_{col}"] = f"{col} RLIKE '{pat}'"
    return out


QUARANTINE_KEY = "quarantined_corrupt_rows"


def validate(
    df: DataFrame,
    suite: list[Expectation],
    name: str = "",
    count_quarantined: bool = False,
) -> dict[str, int]:
    """Run a whole suite; raise ExpectationFailure on any violation.

    Returns per-expectation violation counts on success (all zeros).
    Ordered-column expectations check driver-side; all row expectations
    fold into a single agg() — one pass over the data regardless of suite
    size.

    ``count_quarantined=True`` (for frames still carrying the raw-scan
    corrupt-record column): corrupt rows are excluded from every row
    expectation — they are quarantined, not violations — and their count
    rides the same single aggregation under ``QUARANTINE_KEY`` (never
    raises). This is how the pipeline avoids a second scan just to count
    the quarantine.
    """
    quarantine = count_quarantined and CORRUPT_COL in df.columns
    row_exps: list[Expectation] = []
    for exp in suite:
        if exp.expectation_type == "expect_table_columns_to_match_ordered_list":
            expected = list(exp.kwargs["column_list"])
            actual = [c for c in df.columns if c != CORRUPT_COL]
            if actual != expected:
                raise ExpectationFailure(
                    f"{name}: {exp.label()}: expected {expected}, got {actual}"
                )
        else:
            row_exps.append(exp)

    counts: dict[str, int] = {
        exp.label(): 0 for exp in suite if exp.violation_condition() is None
    }
    if row_exps or quarantine:
        clean_gate = F.col(CORRUPT_COL).isNull() if quarantine else F.lit(True)
        aggs = [
            F.count_if(exp.violation_condition() & clean_gate).alias(f"v{i}")
            for i, exp in enumerate(row_exps)
        ]
        if quarantine:
            aggs.append(F.count_if(~clean_gate).alias("q"))
        row = df.agg(*aggs).collect()[0]
        if quarantine:
            counts[QUARANTINE_KEY] = row["q"]
        for i, exp in enumerate(row_exps):
            n = row[f"v{i}"]
            counts[exp.label()] = n
            if n > 0:
                raise ExpectationFailure(f"{name}: {exp.label()}: {n} violating rows")
    return counts


# ---------------------------------------------------------------------------
# The four domain suites (reference great_expectations/expectations/*.json)
# ---------------------------------------------------------------------------

DOMAIN_SUITES: dict[str, list[Expectation]] = {
    "erp_orders": [
        Expectation(
            "expect_table_columns_to_match_ordered_list",
            {
                "column_list": [
                    "order_id",
                    "customer_id",
                    "store_id",
                    "dt",
                    "order_value",
                    "status",
                ]
            },
        ),
        Expectation("expect_column_values_to_not_be_null", {"column": "order_id"}),
        Expectation(
            "expect_column_values_to_be_between",
            {"column": "order_value", "min_value": 0},
        ),
    ],
    "crm_leads": [
        Expectation(
            "expect_table_columns_to_match_ordered_list",
            {
                "column_list": [
                    "lead_id",
                    "name",
                    "email",
                    "source",
                    "status",
                    "store_id",
                    "dt",
                ]
            },
        ),
        Expectation(
            "expect_column_values_to_match_regex",
            {"column": "email", "regex": r"^.+@.+\..+$"},
        ),
    ],
    "web_events": [
        Expectation(
            "expect_table_columns_to_match_ordered_list",
            {
                "column_list": [
                    "event_id",
                    "visitor_id",
                    "store_id",
                    "dt",
                    "page",
                    "event_type",
                    "metadata",
                ]
            },
        ),
        Expectation("expect_column_values_to_not_be_null", {"column": "event_id"}),
        Expectation("expect_column_values_to_not_be_null", {"column": "store_id"}),
    ],
    "products": [
        Expectation(
            "expect_table_columns_to_match_ordered_list",
            {
                "column_list": [
                    "product_id",
                    "name",
                    "category",
                    "price",
                    "active",
                    "store_id",
                    "dt",
                ]
            },
        ),
        Expectation(
            "expect_column_values_to_be_between",
            {"column": "price", "min_value": 0},
        ),
    ],
}
