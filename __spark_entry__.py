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
# registry is emitted priority-first: queries with no green CORRECTNESS
# row yet (round-1 positions 51+, the round-1 `err` row, and everything
# added in round 2) precede the round-1-verified ones. Rotate this list
# each round as rows come back green.
#
# ROUND-3 ROTATION QUEUE — registered after the 50-slot window filled,
# so they have no driver row yet; promote them to the top next round:
# q_stream_enrich, q_funnel, q_retention, q_tpch_q14, q_tpch_q22,
# q_grouped_ols, q_embedding_quantize, q_nullsafe_join,
# q_ratio_to_report, q_merge_delete, q_table_diff, q_scd2_lookup,
# q_tpch_q8, q_tpch_q21, q_tpch_q6, q_tpch_q15, q_vocab_encode, q_mixture
# (all verified vs oracles at sf0.001/sf0.01/sf0.1 by
# scripts/oracle_sweep.py and tests/test_oracle_diff.py this round).
_VERIFY_FIRST = [
    # round-1 unverified (registry positions 51+ last round)
    "q_stats_exact", "q_window_lag", "q_window_cumsum", "q_grouping_sets",
    "q_sample_hash", "q_calendar_fill", "q_array_stats", "q_collect_sorted",
    "q_quantile_filter", "q_stratified_sample",
    "q_text_quality", "q_token_count", "q_lang_id", "q_tfidf",
    "q_fingerprint", "q_corpus_prep", "q_pack_sequences",
    "q_tpch_q5", "q_semi_join", "q_anti_join", "q_distinct_agg",
    "q_left_join_hist", "q_having", "q_correlated_subquery",
    "q_stream_daily", "q_ann_join_docs",
    # round-1 err row (array output fixed)
    "q_dedup_clusters",
    # new in round 2 — no driver row yet
    "q_embedding_centroids", "q_corr_regression", "q_repetition",
    "q_pii_scrub", "q_tpch_q3", "q_tpch_q10", "q_stream_sliding",
    "q_scan_orc", "q_schema_evolution",
    "q_contamination", "q_chunk_dedup", "q_zipf",
    "q_ntile", "q_first_last", "q_explode_pos",
    "q_stream_join", "q_scan_binaryfile",
    "q_scd2", "q_ri_audit", "q_tpch_q7", "q_tpch_q19",
    "q_histogram", "q_fuzzy_match",
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
    from aws_lakehouse_project_spark.streaming import events_stream  # noqa: F401
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
