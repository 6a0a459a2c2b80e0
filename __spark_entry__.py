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
    # ROUND-14 WINDOW, honoring the r13 rotation note. NEW in round 14
    # lead: view-level WHERE in declarative MVs, APPLY CHANGES FROM
    # SNAPSHOT, expression group keys on JOIN views, NOT NULL columns:
    "q_materialized_view_where", "q_scd2_from_snapshot",
    "q_materialized_view_join_exprkey", "q_notnull_constraint",
    # CHANGED in r14 (re-earn green): the APPLY CHANGES family
    # (restore guard + delete-routing fix in _split_track_history +
    # FROM-SNAPSHOT plumbing), TABLE_CHANGES (vacuumed-horizon
    # validation), WAP/constraints (reserved __notnull__ fence), and
    # the whole MV family (matview.py: _with_where threading on every
    # maintenance frame, create-time key-expr validation, join
    # _stamp_side prunes, and the phantom-pair new-group MIN/MAX
    # trigger fix):
    "q_scd1_sql", "q_scd2_sql", "q_scd1_cdc", "q_table_changes",
    "q_wap_constraint",
    "q_materialized_view", "q_materialized_view_join",
    "q_materialized_view_stream", "q_materialized_view_cascade",
    "q_materialized_view_distinct", "q_materialized_view_join_minmax",
    "q_materialized_view_join_distinct", "q_materialized_view_filter",
    "q_materialized_view_stream_minmax", "q_materialized_view_exprkey",
    # the 30 r9-stale rows the r13 note scheduled (q_wap_constraint is
    # above as changed; 29 here):
    "q_expectation_suite", "q_filter_eq", "q_filter_range",
    "q_intersect", "q_join_full_outer", "q_lakehouse_sql",
    "q_lang_mix", "q_lang_temperature", "q_length_histogram",
    "q_monthly_trunc", "q_notnull_check", "q_optimize_zorder",
    "q_regex", "q_replace_where", "q_scalar_subquery",
    "q_similarity_pairs", "q_sort_topk", "q_stream_cdf",
    "q_table_history", "q_topk_per_group", "q_tpch_q1", "q_tpch_q16",
    "q_tpch_q9", "q_union", "q_update_where", "q_versioned_merge",
    "q_window_rank", "q_window_rolling", "q_writer_isolation",
    # then-stalest r10 rows (alphabetical fill):
    "q_ann_join_docs", "q_anti_join",
]
# ROUND-15 ROTATION NOTE: queries ADDED OR CHANGED in r14 or later
# lead the r15 window, then the r10-stale remainder that did NOT fit
# here (alphabetical from q_array_stats: q_array_stats, q_bm25,
# q_bpe_pairs, q_bucketed_join, q_calendar_fill, q_chunk_dedup,
# q_chunk_windows, q_corpus_prep, q_corr_regression,
# q_correlated_subquery, q_dedup_clusters, q_dedup_containment,
# q_dedup_simhash_portable, q_dedup_simhash_recall,
# q_embedding_centroids, q_freshness, q_fuzzy_match, q_grouping_sets,
# q_having, q_hybrid_rrf, q_interpolate, q_json_flatten,
# q_kmeans_assign, and the rest of the r10 cohort alphabetically),
# then the then-stalest r11 rows to fill 50.


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
