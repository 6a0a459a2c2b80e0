"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship fact-build query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with its DuckDB oracle (rows-only ops omit the oracle).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from aws_lakehouse_project_spark.operators.fact import build_fact_daily

    return build_fact_daily(spark, "/root/testdata/sf0.001")


# The driver verifies the FIRST 50 registered queries per round, so the
# registry is emitted priority-first: queries broken-then-fixed this
# round come first (their green must be re-earned on the current data),
# then queries added this round, then the stalest green rows (rotation:
# no query's latest driver row should age past two rounds).
#
# Ledger after r1-r3: all 117 have rows; 30 queries' latest row is r1,
# 37 are r2, 50 are r3. Round 4 re-verifies the 6 ts-regression fixes +
# new queries + the 30 r1-stale rows.
_VERIFY_FIRST = [
    # TIMESTAMP_NTZ regression fixes (catalog.normalize_ts + streaming
    # schema inference) — r3 err/mismatch rows and stale greens on the
    # regenerated data; all six must re-earn green in r4
    "q_stream_daily", "q_stream_sliding", "q_stream_join",
    "q_stream_enrich", "q_asof_join", "q_sessionize",
    # new queries added in round 4 (appended as they land)
    "q_freshness", "q_dedup_anti_join", "q_lang_mix",
    "q_length_histogram", "q_tpch_q1", "q_stream_dedup",
    "q_tpch_q9", "q_tpch_q11", "q_tpch_q16", "q_tpch_q20",
    "q_stream_sessions", "q_similarity_ivf_pruned", "q_lang_temperature",
    # thresholded levenshtein this round — re-verify
    "q_fuzzy_match",
    # stalest rows: latest driver row is r1 — rotate through the window
    "q_agg_count", "q_agg_count_filter", "q_agg_sum", "q_bool_agg",
    "q_bound_check", "q_except", "q_expectation_suite", "q_fact_daily",
    "q_filter_eq", "q_filter_range", "q_intersect", "q_join_full_outer",
    "q_monthly_trunc", "q_notnull_check", "q_regex", "q_scalar_subquery",
    "q_scan_csv", "q_scan_json", "q_scan_parquet", "q_similarity_ivf",
    "q_similarity_lsh", "q_similarity_pairs", "q_similarity_topk",
    "q_sort_topk", "q_sql_fact", "q_stage_orders", "q_topk_per_group",
    "q_union", "q_window_rank", "q_window_rolling",
]


def _registry():
    # Import for registration side effects (module order no longer
    # matters — _VERIFY_FIRST controls emission order).
    from aws_lakehouse_project_spark.operators import (  # noqa: F401
        analytics,
        corpus,
        dedup,
        dimensions,
        evolution,
        fact,
        grouped,
        joins,
        multimodal,
        relational,
        similarity,
        stats,
        text,
        tpch,
    )
    from aws_lakehouse_project_spark.streaming import (  # noqa: F401
        events_stream,
        stateful,
    )
    from aws_lakehouse_project_spark.operators.registry import ORACLES, QUERIES

    ordered = [n for n in _VERIFY_FIRST if n in QUERIES] + [
        n for n in QUERIES if n not in _VERIFY_FIRST
    ]
    queries = {n: QUERIES[n] for n in ordered}
    oracles = {n: ORACLES[n] for n in ordered if n in ORACLES}
    return queries, oracles


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_registry()[0])


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted keys are rows-only."""
    return dict(_registry()[1])
