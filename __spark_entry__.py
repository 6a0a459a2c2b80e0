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
# ROUND-10 WINDOW (this list): 2 NEW queries lead — the delta-manifest
# checkpoint guard (q_manifest_checkpoint: 70+-commit history, bytes
# per commit ∝ churn, fresh-instance resolution ≤ K raw reads) and
# q_table_vacuum (vacuum + fresh-reader + VacuumedVersionError guards
# — the gap that let r9's vacuum breakage ship unseen). Then the 4
# queries whose code paths changed this round and must re-earn green
# (vacuum checkpoint backfill, manifest-cache horizon guard, raw-
# manifest replication watermark: q_table_restore, q_table_replicate,
# q_time_travel, q_scan_skipping). Then the ENTIRE 34-row r5-stale
# cohort (5 rounds stale; the r8/r9 rotation note, finally honored),
# then the 10 alphabetically-first r6-stale rows that fit. Ledger
# entering r10 (CORRECTNESS union): latest-green r9: 50, r7: 49,
# r6: 46 (45 still registered), r5: 34.
#
# ROUND-11 ROTATION NOTE: queries ADDED after this round's window was
# frozen lead the r11 window (new queries must earn a driver row):
# q_incremental_mv, q_stream_mv, q_hll_rollup, q_bloom_join. Then
# the r6-stale rows
# that did NOT fit this window: q_dedup_minhash_portable,
# q_dedup_minhash_recall, q_fingerprint, q_histogram, q_join_inner,
# q_lang_id, q_left_join_hist, q_merge_delete, q_merge_upsert,
# q_multimodal_resize, q_ngram_jaccard, q_pack_sequences, q_pii_scrub,
# q_pivot, q_quantile_filter, q_range_join, q_rank_eval, q_repetition,
# q_rollup, q_salted_agg, q_semi_join, q_similarity_batch_ivf,
# q_similarity_ivf, q_similarity_ivf_pruned, q_similarity_lsh,
# q_similarity_topk, q_sink_partitioned, q_skew_salted_join,
# q_stratified_sample, q_table_diff, q_text_quality, q_tfidf,
# q_token_count, q_tpch_q3, q_tpch_q7 (35 rows); the remaining ~15
# slots go to the then-stalest r7 rows.
_VERIFY_FIRST = [
    # NEW in round 10 — delta-manifest log guards (operators/
    # lakehouse.py q_manifest_checkpoint / q_table_vacuum over
    # plans/versioned.py's checkpointed delta log + vacuum backfill)
    "q_manifest_checkpoint", "q_table_vacuum",
    # CHANGED code paths in round 10 — must re-earn green
    "q_table_restore", "q_table_replicate", "q_time_travel",
    "q_scan_skipping",
    # full r5-stale cohort (34 rows, per the r8/r9 rotation notes)
    "q_bm25", "q_bucketed_join", "q_calendar_fill", "q_chunk_windows",
    "q_dedup_simhash_portable", "q_dedup_simhash_recall",
    "q_embedding_centroids", "q_freshness", "q_fuzzy_match",
    "q_grouping_sets", "q_having", "q_hybrid_rrf", "q_interpolate",
    "q_json_flatten", "q_kmeans_assign", "q_multimodal_frames",
    "q_pq_encode", "q_quarantine", "q_ri_audit", "q_sample_hash",
    "q_scan_binaryfile", "q_scan_orc", "q_scd2", "q_schema_evolution",
    "q_semantic_decontam", "q_stats_exact", "q_stream_quarantine",
    "q_token_entropy", "q_tpch_q11", "q_tpch_q12", "q_tpch_q2",
    "q_tpch_q20", "q_unigram_logprob", "q_window_lag",
    # stalest r6 rows that fit (10 slots, alphabetical; the rest head
    # the r11 window per the note above)
    "q_ann_join_docs", "q_anti_join", "q_array_stats", "q_bpe_pairs",
    "q_chunk_dedup", "q_corpus_prep", "q_corr_regression",
    "q_correlated_subquery", "q_dedup_clusters", "q_dedup_containment",
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
