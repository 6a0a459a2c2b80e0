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
# registry is emitted priority-first: queries with no driver CORRECTNESS
# row yet come first, then queries whose implementation changed this
# round (re-verify), then slots for queries added this round. Rotate
# this list each round as rows come back green.
#
# Ledger after r1+r2: 91 green rows, 7 rows-only, 1 err
# (q_collect_sorted — array output, fixed this round), 18 never windowed.
_VERIFY_FIRST = [
    # the r2 err row, fixed (array_join'd output)
    "q_collect_sorted",
    # never driver-windowed (r2 rotation queue, __spark_entry__ r2:29-35)
    "q_stream_enrich", "q_funnel", "q_retention",
    "q_tpch_q14", "q_tpch_q22", "q_tpch_q6", "q_tpch_q8",
    "q_tpch_q15", "q_tpch_q21",
    "q_grouped_ols", "q_embedding_quantize", "q_nullsafe_join",
    "q_ratio_to_report", "q_merge_delete", "q_table_diff",
    "q_scd2_lookup", "q_vocab_encode", "q_mixture",
    # r1 rows-only, oracle-upgraded in r2 — first oracle-checked row
    "q_multimodal_features", "q_sink_partitioned",
    # implementation changed this round — re-verify green rows:
    # broadcast hints dropped (AQE decides now)
    "q_join_inner", "q_window_cumsum", "q_tpch_q5", "q_tpch_q10",
    "q_tpch_q19",
    # short-document sequence() guard in corpus.py
    "q_contamination", "q_chunk_dedup", "q_zipf",
    # second (suffix, length) block key
    "q_fuzzy_match",
    # merge writer rework (static overwrite on full refresh)
    "q_merge_upsert",
    # new queries added in round 3 are appended here as they land
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
