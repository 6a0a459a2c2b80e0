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
# ROUND-8 WINDOW (this list): 1 NEW query leads — the whole domain DAG
# published through the transaction layer (ingest → GE-validate →
# stage → WAP-publish with the suite as CHECK constraints → horizon
# CoW MERGE; q_domain_fact_versioned, the r7 verdict's item 2). Then
# the 5 queries whose code changed this round and must re-earn green:
# q_similarity_pairs (re-pointed at the occupancy-corrected planes_for
# config — the fixed 4-plane form is retired; q_dedup_clusters_semantic
# is DEREGISTERED in favor of its _scaled twin), the three NULL-correct
# two-level distinct rewrites (q_dedup_exact, q_distinct_agg,
# q_approx_distinct), and q_versioned_merge (merge commits now record
# merge_keys). Then the NINE late-r7 lakehouse queries with no driver
# row yet (q_table_changes — whose oracle now emits Delta CDF's
# update_preimage/update_postimage vocabulary — q_table_restore,
# q_scan_skipping, q_stream_cdf, q_table_clone, q_wap_constraint,
# q_table_replicate — now folding whole commits with a replication
# watermark — q_optimize_zorder, q_table_history). Then the ENTIRE
# 28-row r4-stale cohort (per the r7 rotation note), then the 7
# stalest r5 rows that fit. Ledger entering r8 (CORRECTNESS union):
# latest-green r7: 50, r6: 49, r5: 36, r4: 28.
#
# ROUND-9 ROTATION NOTE: the r5-stale rows that did NOT fit this
# window MUST head the r9 window: q_stream_quarantine,
# q_dedup_simhash_recall, q_dedup_simhash_portable, q_chunk_windows,
# q_bucketed_join, q_bm25, q_calendar_fill, q_embedding_
# centroids, q_freshness, q_fuzzy_match, q_grouping_sets, q_having,
# q_hybrid_rrf, q_interpolate, q_json_flatten, q_kmeans_assign,
# q_multimodal_frames, q_pq_encode, q_quarantine, q_ri_audit,
# q_sample_hash, q_scan_binaryfile, q_scan_orc, q_scd2,
# q_schema_evolution, q_semantic_decontam, q_stats_exact,
# q_token_entropy, q_tpch_q11, q_tpch_q12, q_tpch_q2, q_tpch_q20,
# q_unigram_logprob, q_window_lag (28 rows); the remaining ~22 slots
# go to the then-stalest r6 rows.
_VERIFY_FIRST = [
    # NEW in round 8 — domain pipeline on the transaction layer
    # (pipeline.py versioned_publish, operators/lakehouse.py) and
    # merge-on-read DELETE via deletion vectors (plans/versioned.py
    # _delete_mor; Delta DV / REORG APPLY PURGE semantics)
    "q_domain_fact_versioned", "q_delete_vectors", "q_update_where",
    "q_replace_where", "q_lakehouse_sql", "q_column_mapping",
    "q_writer_isolation",
    # CHANGED in round 8 — must re-earn green
    "q_similarity_pairs", "q_dedup_exact", "q_distinct_agg",
    "q_approx_distinct", "q_versioned_merge",
    # late-r7 lakehouse queries, first driver rows (q_table_changes /
    # q_stream_cdf / q_table_replicate also changed this round: CDF
    # update vocabulary + commit-atomic replication fold)
    "q_table_changes", "q_table_restore", "q_scan_skipping",
    "q_stream_cdf", "q_table_clone", "q_wap_constraint",
    "q_table_replicate", "q_optimize_zorder", "q_table_history",
    # full r4-stale cohort (28 rows, per the r7 rotation note)
    "q_agg_count", "q_agg_count_filter", "q_agg_sum", "q_asof_join",
    "q_bool_agg", "q_bound_check", "q_dedup_anti_join", "q_except",
    "q_expectation_suite", "q_filter_eq", "q_filter_range",
    "q_intersect", "q_join_full_outer", "q_lang_mix",
    "q_lang_temperature", "q_length_histogram", "q_monthly_trunc",
    "q_notnull_check", "q_regex", "q_scalar_subquery", "q_sort_topk",
    "q_topk_per_group", "q_tpch_q1", "q_tpch_q9", "q_tpch_q16",
    "q_union", "q_window_rank", "q_window_rolling",
    # stalest r5 row that fits (1 slot; q_stream_quarantine,
    # q_dedup_simhash_recall, q_dedup_simhash_portable, q_chunk_windows,
    # q_bucketed_join and q_bm25 bumped by the six new lakehouse
    # registrations — they join the r9 list below)
    "q_approx_quantile",
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
