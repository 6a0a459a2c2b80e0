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
    # NEW in round 10 — must earn driver rows (r10 rotation note)
    "q_incremental_mv", "q_stream_mv", "q_hll_rollup", "q_bloom_join",
    # NEW in round 11 — vacuum OCC safety, bloom data skipping,
    # MIN/MAX MV maintenance, metadata-only COUNT(*)
    "q_vacuum_concurrent", "q_scan_bloom_skipping",
    "q_incremental_mv_minmax", "q_count_stats",
    # r5-stale (1 row) + r6-stale remainder (36 rows: q_dedup_minhash
    # plus the 35 the r10 note lists)
    "q_dedup_simhash", "q_dedup_minhash",
    "q_dedup_minhash_portable", "q_dedup_minhash_recall",
    "q_fingerprint", "q_histogram", "q_join_inner", "q_lang_id",
    "q_left_join_hist", "q_merge_delete", "q_merge_upsert",
    "q_multimodal_resize", "q_ngram_jaccard", "q_pack_sequences",
    "q_pii_scrub", "q_pivot", "q_quantile_filter", "q_range_join",
    "q_rank_eval", "q_repetition", "q_rollup", "q_salted_agg",
    "q_semi_join", "q_similarity_batch_ivf", "q_similarity_ivf",
    "q_similarity_ivf_pruned", "q_similarity_lsh", "q_similarity_topk",
    "q_sink_partitioned", "q_skew_salted_join", "q_stratified_sample",
    "q_table_diff", "q_text_quality", "q_tfidf", "q_token_count",
    "q_tpch_q3", "q_tpch_q7",
    # stalest r7 rows, alphabetical, to fill the 50-slot window
    "q_collect_sorted", "q_contamination", "q_cube",
    "q_dedup_clusters_semantic_scaled", "q_dedup_keep_first",
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
