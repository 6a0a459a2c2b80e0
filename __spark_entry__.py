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
# Ledger after r1-r5 (CORRECTNESS union): 158 queries, latest-green
# counts r5: 48, r4: 45, r3: 42, r2: 21, plus the 2 rows-only-by-design
# (q_dedup_minhash / q_dedup_simhash, re-rowed each round they appear).
#
# ROUND-6 WINDOW (this list): 22 queries changed by the r6 fixes (ANSI
# short-doc guards in the shingle/pair transforms, resize empty-payload
# skip, skew-join build side, bucket-local CC, chunk-dedup re-plan,
# ANN norm hoisting) lead; then ALL 21 r2-stale rows; then the head of
# the r3 cohort, merge-writer core first (q_merge_upsert/q_merge_delete/
# q_table_diff/q_sink_partitioned/q_join_inner guard SURVEY §2's
# S6/S8/J1 machinery).
#
# ROUND-7 ROTATION NOTE: 31 r3-green rows did NOT fit this window
# (q_contamination, q_zipf, q_ntile, q_first_last, q_explode_pos,
# q_tpch_q19, q_funnel, q_retention, q_tpch_q14, q_tpch_q22, q_tpch_q6,
# q_tpch_q8, q_tpch_q15, q_tpch_q21, q_grouped_ols,
# q_embedding_quantize, q_nullsafe_join, q_ratio_to_report,
# q_scd2_lookup, q_vocab_encode, q_mixture, q_tpch_q10, q_unpivot, q_cube,
# q_percentile,
# q_dedup_exact, q_dedup_keep_first, q_multimodal_features,
# q_window_cumsum, q_collect_sorted, q_tpch_q5) — they MUST head the
# r7 window together with the r4 cohort (45 rows, green since r4);
# budget all 50 slots for rotation unless r7 changes queries.
_VERIFY_FIRST = [
    # changed in round 6 — re-earn green (ANSI guards touched the
    # shingle/gram transforms these build on; clusters_semantic moved
    # to bucket-local CC; resize drops empty payloads; skew join build
    # side flipped; minhash stays rows-only by design)
    "q_bpe_pairs", "q_multimodal_resize", "q_skew_salted_join",
    "q_ngram_jaccard", "q_dedup_clusters", "q_dedup_clusters_semantic",
    "q_dedup_minhash", "q_dedup_minhash_recall",
    "q_dedup_minhash_portable", "q_dedup_containment", "q_repetition",
    # changed in round 6 (registry-soak follow-up): chunk dedup
    # re-planned to the (chunk, source)-grain aggregate join, and the
    # whole ANN family got per-vector/query norm hoisting
    # (bit-identical cosines, fresh-process re-verified)
    "q_chunk_dedup", "q_similarity_topk", "q_similarity_lsh",
    "q_similarity_ivf", "q_similarity_ivf_pruned",
    "q_similarity_batch_ivf", "q_ann_join_docs", "q_rank_eval",
    # changed in round 6: Expand-free re-plans (mixed-distinct
    # aggregates planned a stream-doubling Expand; q_approx_distinct
    # 104s -> 10s, q_distinct_agg -22%, q_dedup_exact -19% at sf10).
    # q_distinct_agg already sits in the r2-stale block below.
    "q_approx_distinct", "q_dedup_exact",
    # all 20 remaining r2-stale rows (q_repetition above is the 21st)
    "q_array_stats", "q_quantile_filter", "q_stratified_sample",
    "q_corr_regression", "q_histogram", "q_text_quality",
    "q_token_count", "q_lang_id", "q_tfidf", "q_fingerprint",
    "q_corpus_prep", "q_pack_sequences", "q_pii_scrub", "q_semi_join",
    "q_anti_join", "q_distinct_agg", "q_left_join_hist",
    "q_correlated_subquery", "q_tpch_q3", "q_tpch_q7",
    # r3 cohort head (10 slots): merge-writer core first, then the
    # heaviest-traffic relational r3 rows
    "q_merge_upsert", "q_merge_delete", "q_table_diff",
    "q_sink_partitioned", "q_join_inner", "q_rollup", "q_pivot",
    "q_range_join", "q_salted_agg",
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
