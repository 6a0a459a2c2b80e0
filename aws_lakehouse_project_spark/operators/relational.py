"""Core relational operators (SURVEY.md §2.1–§2.6) as oracle-checked
demo queries over the driver testdata.

Each query cites the reference operator it re-expresses. All money/float
aggregates use the exact-decimal pattern (``functions.money``) so Spark and
the DuckDB oracle produce bit-identical doubles regardless of partial-agg
ordering — which is also the right posture at 100 TB, where partial/final
aggregation order is nondeterministic by design.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.money import money, money_avg, money_sum
from ..functions.scratch import scratch_dir as _scratch_dir
from .registry import demo_query

# ---------------------------------------------------------------------------
# §2.1 scans / sources / sinks
# ---------------------------------------------------------------------------


@demo_query(
    "q_scan_parquet",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS row_cnt,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS order_cnt,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM lineitem
    """,
)
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 parquet scan (curated-zone read, reference README.md:12).

    Count + distinct + exact sum over the largest table; `.explain` shows
    ReadSchema pruned to (l_orderkey, l_quantity) only.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("row_cnt"),
        F.countDistinct("l_orderkey").alias("order_cnt"),
        money_sum("l_quantity", "total_qty"),
    )


@demo_query(
    "q_scan_csv",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS row_cnt,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 CSV scan + S5 CSV sink (reference local_runner.py:52, :159-166).

    Round-trips a lineitem projection through a headered CSV with an
    explicit read schema (no inference — the engine's contract-first
    posture, SURVEY.md §1.1) and aggregates the re-read frame; doubles
    survive the trip exactly (shortest-roundtrip formatting).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity"
    )
    # per-process dir: concurrent drivers must not clobber each other
    out = _scratch_dir("spark_graft_csv_roundtrip")
    li.write.mode("overwrite").option("header", True).csv(out)
    back = (
        spark.read.option("header", True)
        .schema("l_orderkey BIGINT, l_returnflag STRING, l_quantity DOUBLE")
        .csv(out)
    )
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("row_cnt"),
        money_sum("l_quantity", "total_qty"),
    )


@demo_query(
    "q_scan_json",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q_scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 JSON scan + JSON projection (reference local_runner.py:49-51;
    metadata map carried opaque at stg_web_events.sql:10 — here we go one
    step further and project into it with get_json_object)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


@demo_query(
    "q_sink_partitioned",
    # the round trip must preserve CONTENT exactly, and the pruned-month
    # aggregate is SQL-derivable from the source — so the sink demo is
    # value-verified, not just rows-counted; the layout properties
    # (sorted-within-files, partition dirs) stay covered by test_writers
    oracle="""
    SELECT CAST(o_orderdate AS DATE) AS dt,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM orders
    WHERE strftime(o_orderdate, '%Y-%m') = '1995-03'
    GROUP BY 1
    """,
)
def q_sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 partitioned parquet sink + S7 Z-order-approx layout (reference
    README.md:12: curated zone partitioned by dt/store_id with Z-order).

    Writes daily order metrics partitioned by order-month with
    range-cluster + sort-within-partitions (Z-order approximation for the
    2-column case: gives parquet row-group min/max pruning on the sorted
    keys), re-reads, and returns the aggregate — proving the round trip
    preserves content while enabling partition pruning on read.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.withColumn("order_month", F.date_format("o_orderdate", "yyyy-MM"))
        .withColumn("dt", F.col("o_orderdate").cast("date"))
        .select("order_month", "dt", "o_custkey", money("o_totalprice").alias("price"))
    )
    out = _scratch_dir("spark_graft_curated_orders")
    (
        daily.repartition("order_month")
        .sortWithinPartitions("dt", "o_custkey")
        .write.mode("overwrite")
        .partitionBy("order_month")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    # partition-pruned read: only one month's directories are scanned
    return (
        back.filter(F.col("order_month") == "1995-03")
        .groupBy("dt")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("price").cast("double").alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# §2.2 projection / filters / scalar expressions
# ---------------------------------------------------------------------------


@demo_query(
    "q_stage_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CAST(o_orderdate AS DATE) AS dt,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS total_price,
           o_orderpriority
    FROM orders
    """,
)
def q_stage_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P4: staging projection with ordered columns, int casts, decimal
    money cast, date cast — the stg_erp_orders.sql:3-9 pattern applied to
    the testdata orders table."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        F.col("o_orderkey"),
        F.col("o_custkey"),
        F.col("o_orderstatus"),
        F.col("o_orderdate").cast("date").alias("dt"),
        money("o_totalprice").cast("double").alias("total_price"),
        F.col("o_orderpriority"),
    )


@demo_query(
    "q_filter_eq",
    oracle="""
    SELECT event_id, user_id, CAST(ts AS DATE) AS dt, value
    FROM events
    WHERE event_type = 'purchase'
    """,
)
def q_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 equality predicate (reference fct_daily_store_metrics.sql:13
    status='converted'; analog events.event_type='purchase')."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == F.lit("purchase")).select(
        "event_id", "user_id", F.col("ts").cast("date").alias("dt"), "value"
    )


@demo_query(
    "q_filter_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_dt,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) AS price
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1998-06-01'
      AND CAST(l_shipdate AS DATE) <  DATE '1998-09-01'
    """,
)
def q_filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/P9 date-horizon predicate (reference
    fct_daily_store_metrics.sql:34-36 — the 7-day incremental window;
    pinned literal dates for determinism per SURVEY.md §7.3)."""
    li = load_table(spark, sf_dir, "lineitem")
    ship = F.col("l_shipdate").cast("date")
    return li.filter(
        (ship >= F.lit("1998-06-01")) & (ship < F.lit("1998-09-01"))
    ).select(
        "l_orderkey",
        "l_linenumber",
        ship.alias("ship_dt"),
        money("l_extendedprice").cast("double").alias("price"),
    )


@demo_query(
    "q_regex",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) FILTER (WHERE regexp_matches(text, 'merge.*(join|scan)')) AS BIGINT)
               AS n_match,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents
    GROUP BY lang
    """,
)
def q_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 regex match (reference email regex, local_runner.py:94-99;
    crm_leads.json:4)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count_if(F.col("text").rlike("merge.*(join|scan)")).alias("n_match"),
        F.count(F.lit(1)).alias("n_docs"),
    )


@demo_query(
    "q_notnull_check",
    oracle="""
    SELECT CAST(COUNT(*) FILTER (WHERE event_id IS NULL) AS BIGINT) AS null_event_id,
           CAST(COUNT(*) FILTER (WHERE user_id IS NULL) AS BIGINT) AS null_user_id,
           CAST(COUNT(*) FILTER (WHERE props IS NULL) AS BIGINT) AS null_props,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM events
    """,
)
def q_notnull_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11 not-null validation as a single-pass aggregation (reference
    local_runner.py:81-85; erp_orders.json:4, web_events.json:4-5)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.count_if(F.col("event_id").isNull()).alias("null_event_id"),
        F.count_if(F.col("user_id").isNull()).alias("null_user_id"),
        F.count_if(F.col("props").isNull()).alias("null_props"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@demo_query(
    "q_bound_check",
    oracle="""
    SELECT CAST(COUNT(*) FILTER (WHERE l_quantity < 0) AS BIGINT) AS neg_qty,
           CAST(COUNT(*) FILTER (WHERE l_extendedprice < 0) AS BIGINT) AS neg_price,
           CAST(MIN(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS min_qty,
           CAST(MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS min_price
    FROM lineitem
    """,
)
def q_bound_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12 min-bound validation (reference local_runner.py:87-92;
    erp_orders.json:5 order_value>=0, products.json:4 price>=0)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count_if(F.col("l_quantity") < 0).alias("neg_qty"),
        F.count_if(F.col("l_extendedprice") < 0).alias("neg_price"),
        F.min(money("l_quantity")).cast("double").alias("min_qty"),
        F.min(money("l_extendedprice")).cast("double").alias("min_price"),
    )


# ---------------------------------------------------------------------------
# §2.3 aggregations
# ---------------------------------------------------------------------------


@demo_query(
    "q_expectation_suite",
    oracle="""
    SELECT CAST(COUNT(*) FILTER (WHERE event_id IS NULL) AS BIGINT)
             AS "expect_column_values_to_not_be_null(event_id)",
           CAST(COUNT(*) FILTER (WHERE TRY_CAST(value AS DOUBLE) < 0) AS BIGINT)
             AS "expect_column_values_to_be_between(value)",
           CAST(COUNT(*) FILTER (
               WHERE props IS NULL OR NOT regexp_matches(props, '^\\{.*\\}$')
           ) AS BIGINT)
             AS "expect_column_values_to_match_regex(props)"
    FROM events
    """,
)
def q_expectation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 end-to-end: a GE-style suite compiled by quality/expectations
    into ONE aggregation pass, surfaced as a query so the driver gate
    exercises the actual compiler (violation counts per expectation,
    all zero on the clean testdata)."""
    from ..quality.expectations import Expectation

    suite = [
        Expectation("expect_column_values_to_not_be_null", {"column": "event_id"}),
        Expectation(
            "expect_column_values_to_be_between", {"column": "value", "min_value": 0}
        ),
        Expectation(
            "expect_column_values_to_match_regex",
            {"column": "props", "regex": r"^\{.*\}$"},
        ),
    ]
    ev = load_table(spark, sf_dir, "events")
    aggs = [
        F.count_if(exp.violation_condition()).alias(exp.label()) for exp in suite
    ]
    return ev.agg(*aggs)


@demo_query(
    "q_agg_sum",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(12,2))
                    * CAST(1 + l_tax AS DECIMAL(12,2))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A4 grouped multi-aggregate — TPC-H Q1 shape (reference revenue
    aggregation, fct_daily_store_metrics.sql:8; local_runner.py:137-140).

    Catalyst plans this as partial (map-side) + final hash aggregation —
    the shape that scales: per-executor combine before the single shuffle
    on the 6-value group key.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = money("l_extendedprice") * money(F.lit(1) - F.col("l_discount"))
    charge = disc_price * money(F.lit(1) + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate").cast("date") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_quantity", "sum_qty"),
            money_sum("l_extendedprice", "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            money_avg("l_quantity", "avg_qty"),
            money_avg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@demo_query(
    "q_agg_count",
    oracle="""
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_agg_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 group-by count(*) (reference order_count / sessions,
    fct_daily_store_metrics.sql:8, :18)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@demo_query(
    "q_agg_count_filter",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchases,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY user_id
    """,
)
def q_agg_count_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 filtered count (reference `count(*) filter (where
    status='converted')`, fct_daily_store_metrics.sql:13; pandas lambda
    local_runner.py:143 — here a built-in count_if, no UDF)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count_if(F.col("event_type") == "purchase").alias("purchases"),
        F.count(F.lit(1)).alias("n_events"),
    )


@demo_query(
    "q_bool_agg",
    oracle="""
    SELECT lang,
           bool_or(n_chars > 900) AS any_long,
           bool_and(n_chars > 10) AS all_nonempty,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY lang
    """,
)
def q_bool_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 boolean reductions (reference validation any()/all(),
    local_runner.py:84, :90, :97)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.bool_or(F.col("n_chars") > 900).alias("any_long"),
        F.bool_and(F.col("n_chars") > 10).alias("all_nonempty"),
        F.max("n_chars").alias("max_chars"),
    )


@demo_query(
    "q_scan_orc",
    # DuckDB reads no ORC, but the round trip must preserve CONTENT —
    # the aggregate is derivable from the parquet source, so a content
    # mismatch anywhere in the ORC write/read path fails the hash
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink round trip (columnar-format breadth beyond
    parquet/CSV/JSON): write order metrics as ORC, re-read, aggregate.
    Spark's native ORC reader gives the same predicate pushdown and
    column pruning as parquet; the oracle recomputes the aggregate from
    the parquet source, so the ORC round trip is value-verified."""
    orders = load_table(spark, sf_dir, "orders")
    out = _scratch_dir("spark_graft_orc_roundtrip")
    orders.select(
        "o_orderkey", "o_orderstatus", money("o_totalprice").alias("price")
    ).write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("price").cast("double").alias("revenue"),
    )


@demo_query(
    "q_freshness",
    oracle="""
    WITH f AS (
      SELECT 'events' AS src, max(ts) AS loaded_at FROM events
      UNION ALL
      SELECT 'orders' AS src, max(o_orderdate) AS loaded_at FROM orders
    ),
    lagged AS (
      SELECT src,
             (epoch_us(TIMESTAMP '2024-01-31 06:00:00') - epoch_us(loaded_at))
               / 3600000000.0 AS lag_h
      FROM f
    )
    SELECT src,
           CAST(ROUND(lag_h, 3) AS DOUBLE) AS lag_hours,
           CASE WHEN lag_h > 24 THEN 'error'
                WHEN lag_h > 12 THEN 'warn'
                ELSE 'ok' END AS status
    FROM lagged
    """,
)
def q_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3 source freshness AS A QUERY (reference ``dbt/models/staging/
    schema.yml:10-13`` — ``loaded_at_field`` with warn_after 12h /
    error_after 24h): per-source max(loaded_at) lag against a fixed
    as-of instant, classified ok/warn/error.

    The pipeline twin (``pipeline.check_freshness``) returns the status
    driver-side; this form keeps it relational so it can join into a
    health dashboard. Each source is a 1-row MAX aggregate (partial+
    final, no groupBy shuffle at any scale); the union is 2 rows."""
    from ..catalog import normalize_ts

    ev = load_table(spark, sf_dir, "events")
    orders = normalize_ts(load_table(spark, sf_dir, "orders"), "o_orderdate")
    now_us = F.unix_micros(F.lit("2024-01-31 06:00:00").cast("timestamp"))

    def lagged(df: DataFrame, src: str, col: str) -> DataFrame:
        return df.agg(F.max(col).alias("loaded_at")).select(
            F.lit(src).alias("src"),
            ((now_us - F.unix_micros("loaded_at")) / 3600000000.0).alias("lag_h"),
        )

    f = lagged(ev, "events", "ts").unionAll(lagged(orders, "orders", "o_orderdate"))
    return f.select(
        "src",
        F.round(F.col("lag_h"), 3).cast("double").alias("lag_hours"),
        F.when(F.col("lag_h") > 24, "error")
        .when(F.col("lag_h") > 12, "warn")
        .otherwise("ok")
        .alias("status"),
    )


@demo_query(
    "q_quarantine",
    oracle="""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM documents WHERE doc_id < 40 AND doc_id % 5 <> 0
    GROUP BY lang
    UNION ALL
    SELECT '__quarantined__' AS lang, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM documents WHERE doc_id < 40 AND doc_id % 5 = 0
    """,
)
def q_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-record quarantine ingest (the lakehouse bad-records
    pattern): stage a JSON-lines batch where every 5th record is
    malformed, read it PERMISSIVE with a corrupt-record column
    (``read_jsonl``), route rows via ``split_corrupt``, and report
    clean counts per lang beside the quarantined count. No row is
    dropped silently — clean + quarantined = staged, and the oracle
    pins both sides from the same deterministic corruption rule.

    Scale shape: quarantine is a column-null predicate on the parsed
    scan (map-side, no extra pass); the corrupt payload retains the
    raw line for replay. The staged slice is bounded (40 rows
    driver-side); production reads the same reader against the lake
    path."""
    import os

    from ..functions.scratch import scratch_dir
    from ..sources.readers import read_jsonl, split_corrupt
    from pyspark.sql import types as T

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 40)
        .select("doc_id", "lang")
    )
    work = scratch_dir("spark_graft_quarantine", unique=True)
    path = os.path.join(work, "batch.jsonl")
    with open(path, "w") as fh:
        for row in docs.collect():  # bounded slice: 40 rows staged
            if row["doc_id"] % 5 == 0:
                fh.write('{"doc_id": %d, "lang": oops-not-json\n' % row["doc_id"])
            else:
                fh.write(
                    '{"doc_id": %d, "lang": "%s"}\n' % (row["doc_id"], row["lang"])
                )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    clean, bad = split_corrupt(read_jsonl(spark, path, schema))
    per_lang = clean.groupBy("lang").agg(F.count(F.lit(1)).alias("n_rows"))
    quarantined = bad.agg(
        F.lit("__quarantined__").alias("lang"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return per_lang.unionByName(quarantined)


@demo_query(
    "q_json_flatten",
    oracle="""
    SELECT lang, tag_k,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(tag_v) AS BIGINT) AS sum_v
    FROM (
      SELECT lang, 'len' AS tag_k, n_chars AS tag_v
      FROM documents WHERE doc_id < 30
      UNION ALL
      SELECT lang, 'id' AS tag_k, doc_id AS tag_v
      FROM documents WHERE doc_id < 30
    )
    GROUP BY lang, tag_k
    """,
)
def q_json_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-JSON flattening: a staged JSONL batch with an object field
    containing an ARRAY OF STRUCTS (`meta.tags[]`) is read with an
    explicit nested schema, exploded, and projected by dot-path — the
    semi-structured ingest shape (S2's nested-metadata claim, one level
    deeper). The oracle reconstructs the same (lang, tag, value) rows
    relationally from the source table, so the nested read + explode +
    dot-path pipeline is value-verified.

    Scale shape: explode is a map-side generator; the aggregation is
    one partial+final pass keyed on (lang, tag). Schema-first parsing
    (no inference pass) is what makes streaming/batch JSON ingest
    single-scan at any volume."""
    import json as _json
    import os

    from ..functions.scratch import scratch_dir
    from pyspark.sql import types as T

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 30)
        .select("doc_id", "lang", "n_chars")
    )
    work = scratch_dir("spark_graft_json_flatten", unique=True)
    path = os.path.join(work, "batch.jsonl")
    with open(path, "w") as fh:
        for row in docs.collect():  # bounded slice: 30 rows staged
            fh.write(
                _json.dumps(
                    {
                        "doc_id": row["doc_id"],
                        "meta": {
                            "lang": row["lang"],
                            "tags": [
                                {"k": "len", "v": row["n_chars"]},
                                {"k": "id", "v": row["doc_id"]},
                            ],
                        },
                    }
                )
                + "\n"
            )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField(
                "meta",
                T.StructType(
                    [
                        T.StructField("lang", T.StringType()),
                        T.StructField(
                            "tags",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("k", T.StringType()),
                                        T.StructField("v", T.LongType()),
                                    ]
                                )
                            ),
                        ),
                    ]
                ),
            ),
        ]
    )
    nested = spark.read.schema(schema).json(path)
    flat = nested.select(
        F.col("meta.lang").alias("lang"), F.explode("meta.tags").alias("tag")
    ).select("lang", F.col("tag.k").alias("tag_k"), F.col("tag.v").alias("tag_v"))
    return flat.groupBy("lang", "tag_k").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("tag_v").alias("sum_v"),
    )
