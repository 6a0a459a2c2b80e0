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
# registry is emitted priority-first: queries changed this round come
# first (their green must be re-earned), then the stalest green rows
# (rotation: no query's latest driver row should age past two rounds).
#
# ROUND-11 WINDOW (this list), honoring the r10 rotation note
# verbatim: the 4 queries ADDED in round 10 lead (judge-verified MATCH
# is not a driver row — they must earn one), then the queries ADDED in
# round 11 (vacuum-OCC guard, per-file bloom skipping, MIN/MAX
# incremental MV, metadata-only COUNT(*)), then the r5/r6-stale
# remainder (q_dedup_simhash last-green r5; q_dedup_minhash and the 35
# rows the r10 note lists, all last-green r6), with the leftover slots
# going to the alphabetically-first r7-stale rows. Ledger entering r11
# (CORRECTNESS union): latest-green r10: 50, r9: 47, r7: 48, r6: 37,
# r5: 1.
#
# ROUND-12 ROTATION NOTE: queries ADDED after this window was frozen
# lead the r12 window (added in r11: q_stats_minmax,
# q_scan_null_skipping, q_auto_compact, q_convert_parquet,
# q_dedup_substring, q_dedup_substring_scrub,
# q_dedup_substring_rewrite, q_quantile_rollup, q_pq_adc_topk,
# q_vacuum_restore, q_incremental_mv_var, q_optimize_where,
# q_incremental_mv_join, q_incremental_mv_distinct, q_scd2_from_cdf,
# q_materialized_view, q_materialized_view_join,
# q_materialized_view_stream, q_materialized_view_cascade,
# q_copy_into; plus anything newer), then the
# r7-stale rows that did NOT fit
# here: q_embedding_quantize, q_explode_pos, q_fact_daily,
# q_first_last, q_funnel, q_grouped_ols, q_mixture,
# q_multimodal_features, q_ntile, q_nullsafe_join, q_percentile,
# q_ratio_to_report, q_retention, q_scan_csv, q_scan_json,
# q_scan_parquet, q_scd2_lookup, q_semantic_decontam_scaled,
# q_sessionize, q_similarity_pairs_banded, q_similarity_pairs_scaled,
# q_sql_fact, q_stage_orders, q_stream_daily, q_stream_dedup,
# q_stream_enrich, q_stream_join, q_stream_merge, q_stream_sessions,
# q_stream_sliding, q_tpch_q10, q_tpch_q14, q_tpch_q15, q_tpch_q19,
# q_tpch_q21, q_tpch_q22, q_tpch_q5, q_tpch_q6, q_tpch_q8, q_unpivot,
# q_vocab_encode, q_window_cumsum, q_zipf (43 rows); remaining slots
# to the then-stalest r9 rows (alphabetical).
_VERIFY_FIRST = [
    # ROUND-13 WINDOW, honoring the r12 rotation note. NEW in round 13
    # lead: the four remaining TPC-H shapes, COUNT(DISTINCT) on
    # JOIN-view MVs, FILTER-clause MV aggregates, streaming MIN/MAX MV:
    "q_tpch_q4", "q_tpch_q13", "q_tpch_q17", "q_tpch_q18",
    "q_materialized_view_join_distinct", "q_materialized_view_filter",
    "q_materialized_view_stream_minmax", "q_scd1_cdc",
    "q_materialized_view_exprkey",
    # CHANGED in r12/r13 (re-earn green): q_scd1_sql (r12-added, judge
    # MATCH, still rowless) + q_scd2_sql (r13: _sequence_filter NULL
    # rejection + churn-key prune), q_table_changes (r12 SQL-first
    # rewrite + r13 range validation), q_table_clone (r13: clone
    # inherits change_feed), and the MV family (r13: restore guard on
    # every refresh path; join refresh grew the distinct support fold):
    "q_scd1_sql", "q_scd2_sql", "q_table_changes", "q_table_clone",
    "q_materialized_view", "q_materialized_view_join",
    "q_materialized_view_stream", "q_materialized_view_cascade",
    "q_materialized_view_distinct", "q_materialized_view_join_minmax",
    # r7-stale rows (the 16 the r12 note rolled to this window):
    "q_stream_merge", "q_stream_sessions", "q_stream_sliding",
    "q_tpch_q10", "q_tpch_q14", "q_tpch_q15", "q_tpch_q19",
    "q_tpch_q21", "q_tpch_q22", "q_tpch_q5", "q_tpch_q6", "q_tpch_q8",
    "q_unpivot", "q_vocab_encode", "q_window_cumsum", "q_zipf",
    # stalest r9 rows (alphabetical fill; q_table_changes/_clone are
    # r9-stale too but already above as changed):
    "q_agg_count", "q_agg_count_filter", "q_agg_sum",
    "q_approx_distinct", "q_approx_quantile", "q_asof_join",
    "q_bool_agg", "q_bound_check", "q_column_mapping",
    "q_dedup_anti_join", "q_dedup_exact", "q_delete_vectors",
    "q_distinct_agg", "q_domain_fact_versioned", "q_except",
]
# ROUND-14 ROTATION NOTE: queries ADDED OR CHANGED in r13 or later
# lead the r14 window, then the r9-stale remainder that did NOT fit
# here (alphabetical from q_expectation_suite:
# q_expectation_suite, q_filter_eq, q_filter_range,
# q_intersect, q_join_full_outer, q_lakehouse_sql, q_lang_mix,
# q_lang_temperature, q_length_histogram, q_monthly_trunc,
# q_notnull_check, q_optimize_zorder, q_regex, q_replace_where,
# q_scalar_subquery, q_similarity_pairs, q_sort_topk, q_stream_cdf,
# q_table_history, q_topk_per_group, q_tpch_q1, q_tpch_q16,
# q_tpch_q9, q_union, q_update_where, q_versioned_merge,
# q_wap_constraint, q_window_rank, q_window_rolling,
# q_writer_isolation — 30 rows), then the then-stalest r10 rows
# (alphabetical) to fill 50.


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
        incremental,
        joins,
        lakehouse,
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
