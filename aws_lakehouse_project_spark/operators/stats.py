"""Statistics, window-analytics, sampling, and densification operators.

Extension surface (SURVEY.md §2.3/§2.7 note the reference has no distinct
aggs, window functions, or stats beyond SUM/COUNT — reference
``dbt/models/marts/fct_daily_store_metrics.sql:8``; Athena/Presto could run
all of these, its models just never did). Everything here follows the
engine's cross-engine determinism discipline: float results are derived
from exact integer/decimal sums with an identical IEEE operation order on
both the Spark and DuckDB sides, never from engine-native float
accumulators whose partial-aggregation order differs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table, register_views
from ..functions.money import money, money_sum
from .registry import demo_query
from .similarity import as_double, dot

_STATS_ORACLE = """
    WITH sums AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s_q,
             CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s_q2,
             CAST(SUM(CAST(ROUND(l_discount * 100, 0) AS BIGINT)) AS BIGINT) AS s_d,
             CAST(SUM(CAST(ROUND(l_discount * 100, 0) AS BIGINT)
                      * CAST(ROUND(l_discount * 100, 0) AS BIGINT)) AS BIGINT) AS s_d2,
             CAST(SUM(CAST(l_quantity AS BIGINT)
                      * CAST(ROUND(l_discount * 100, 0) AS BIGINT)) AS BIGINT) AS s_qd
      FROM lineitem GROUP BY l_returnflag
    ), casted AS (
      SELECT l_returnflag, n_rows,
             CAST(n_rows AS DOUBLE) AS nd,
             CAST(s_q AS DOUBLE) AS q1, CAST(s_q2 AS DOUBLE) AS q2,
             CAST(s_d AS DOUBLE) AS d1, CAST(s_d2 AS DOUBLE) AS d2,
             CAST(s_qd AS DOUBLE) AS qd
      FROM sums
    )
    SELECT l_returnflag, n_rows,
           q1 / nd AS mean_qty,
           (nd * q2 - q1 * q1) / (nd * (nd - 1)) AS var_qty,
           SQRT((nd * q2 - q1 * q1) / (nd * (nd - 1))) AS stddev_qty,
           (nd * qd - q1 * d1)
             / (SQRT(nd * q2 - q1 * q1) * SQRT(nd * d2 - d1 * d1)) AS corr_qty_disc
    FROM casted
"""


@demo_query("q_stats_exact", oracle=_STATS_ORACLE)
def q_stats_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates — mean / sample variance / stddev / Pearson
    correlation — per group, computed from exact integer sums.

    Engine-native ``stddev``/``corr`` accumulate floats in partition order
    and differ across engines in the last ulps; here every moment is an
    exact BIGINT sum (quantity is integral, discount is exact cents), and
    the float formulas are applied once, in the same operation order as
    the oracle — bit-identical output, still one distributed partial+final
    hash aggregate at 100 TB.
    """
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("bigint")
    d = F.round(F.col("l_discount") * 100, 0).cast("bigint")
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(q).alias("s_q"),
        F.sum(q * q).alias("s_q2"),
        F.sum(d).alias("s_d"),
        F.sum(d * d).alias("s_d2"),
        F.sum(q * d).alias("s_qd"),
    )
    casted = sums.select(
        "l_returnflag",
        "n_rows",
        F.col("n_rows").cast("double").alias("nd"),
        F.col("s_q").cast("double").alias("q1"),
        F.col("s_q2").cast("double").alias("q2"),
        F.col("s_d").cast("double").alias("d1"),
        F.col("s_d2").cast("double").alias("d2"),
        F.col("s_qd").cast("double").alias("qd"),
    )
    nd, q1, q2 = F.col("nd"), F.col("q1"), F.col("q2")
    d1, d2, qd = F.col("d1"), F.col("d2"), F.col("qd")
    var = (nd * q2 - q1 * q1) / (nd * (nd - F.lit(1)))
    return casted.select(
        "l_returnflag",
        "n_rows",
        (q1 / nd).alias("mean_qty"),
        var.alias("var_qty"),
        F.sqrt(var).alias("stddev_qty"),
        (
            (nd * qd - q1 * d1)
            / (F.sqrt(nd * q2 - q1 * q1) * F.sqrt(nd * d2 - d1 * d1))
        ).alias("corr_qty_disc"),
    )


@demo_query(
    "q_window_lag",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS dt,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT dt, revenue,
           LAG(revenue) OVER (ORDER BY dt) AS prev_revenue,
           revenue - LAG(revenue) OVER (ORDER BY dt) AS delta
    FROM daily
    """,
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG window: day-over-day revenue delta.

    The global-order window runs on the *post-aggregation* frame (one row
    per calendar day — ~2.4k rows even at 100 TB), so the single-partition
    sort is trivially cheap; the distributed work is the upstream
    revenue aggregation.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("dt")
    ).agg(money_sum("o_totalprice", "revenue"))
    # the frame is calendar-bounded (~2.4k rows at any SF), so a global
    # order is safe; the partition key is a non-foldable constant (""
    # for every row) making the bounded single partition explicit
    w = Window.partitionBy(F.substring(F.col("dt").cast("string"), 1, 0)).orderBy("dt")
    prev = F.lag("revenue").over(w)
    return daily.select(
        "dt",
        "revenue",
        prev.alias("prev_revenue"),
        (F.col("revenue") - prev).alias("delta"),
    )


@demo_query(
    "q_window_cumsum",
    oracle="""
    WITH monthly AS (
      SELECT c_mktsegment,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev_dec
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2
    )
    SELECT c_mktsegment, month,
           CAST(rev_dec AS DOUBLE) AS revenue,
           CAST(SUM(rev_dec) OVER (
                  PARTITION BY c_mktsegment ORDER BY month) AS DOUBLE)
             AS cum_revenue
    FROM monthly
    """,
)
def q_window_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative (running-total) window: month-to-date revenue per
    market segment.

    The running sum stays in DECIMAL inside the window and is cast to
    double per-row afterwards — exact at any partition order. The window
    partitions by segment, so state is distributed; (segment, month) keys
    are unique post-aggregation, making the default RANGE frame
    deterministic.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    monthly = (
        # customer scales with SF — AQE chooses the join strategy
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(
            "c_mktsegment",
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        )
        .agg(F.sum(money("o_totalprice")).alias("rev_dec"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy("month")
    return monthly.select(
        "c_mktsegment",
        "month",
        F.col("rev_dec").cast("double").alias("revenue"),
        F.sum("rev_dec").over(w).cast("double").alias("cum_revenue"),
    )


_GROUPING_SETS_SQL = """
    SELECT n_name, c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name), (c_mktsegment))
"""


@demo_query("q_grouping_sets", oracle=_GROUPING_SETS_SQL)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS: two independent aggregation grains (by nation, by
    segment) in one pass — Catalyst plans an Expand + single shuffle
    rather than two scans, exactly what a 100 TB rollup wants. The SQL
    text is identical on both engines (SQL-surface parity, like
    ``q_sql_fact``)."""
    register_views(spark, sf_dir)
    return spark.sql(_GROUPING_SETS_SQL)


@demo_query(
    "q_sample_hash",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM orders
    WHERE md5(CAST(o_orderkey AS VARCHAR)) LIKE '0%'
    GROUP BY o_orderpriority
    """,
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash sampling: keep rows whose key's md5 starts with
    '0' (a reproducible ~1/16 sample), then aggregate.

    Unlike ``df.sample()`` (seeded RNG, engine-specific), hash sampling is
    stable across engines, runs, and partitionings — the property a
    training-data pipeline needs for held-out splits. The predicate is a
    per-row map-side filter: no shuffle until the aggregation.
    """
    orders = load_table(spark, sf_dir, "orders")
    sampled = orders.filter(
        F.md5(F.col("o_orderkey").cast("string")).startswith("0")
    )
    return sampled.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        money_sum("o_totalprice", "revenue"),
    )


@demo_query(
    "q_calendar_fill",
    oracle="""
    WITH spine AS (
      SELECT CAST(d AS DATE) AS dt
      FROM (SELECT UNNEST(generate_series(DATE '1995-01-01', DATE '1995-03-31',
                                          INTERVAL 1 DAY)) AS d)
    ), daily AS (
      SELECT CAST(o_orderdate AS DATE) AS dt,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS rev
      FROM orders GROUP BY 1
    )
    SELECT spine.dt,
           COALESCE(n, 0) AS n_orders,
           COALESCE(rev, 0.0) AS revenue
    FROM spine LEFT JOIN daily ON spine.dt = daily.dt
    """,
)
def q_calendar_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification: generate a date spine with ``sequence`` +
    ``explode`` and left-join daily metrics, filling gaps with zeros —
    the standard time-series gap-fill. The joined side is *post-
    aggregation* daily metrics (one row per calendar day even at 100 TB),
    so it broadcasts to the spine — no shuffle join at any scale.

    Uses ``explode_outer`` per the engine's generator discipline
    (plain ``explode`` re-evaluates the generator child through an
    implicit ``size(...) > 0`` filter).
    """
    spine = spark.range(1).select(
        F.explode_outer(
            F.expr("sequence(DATE'1995-01-01', DATE'1995-03-31', interval 1 day)")
        ).alias("dt")
    )
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("dt")).agg(
        F.count(F.lit(1)).alias("n"),
        money_sum("o_totalprice", "rev"),
    )
    return (
        spine.join(F.broadcast(daily), "dt", "left")
        .select(
            "dt",
            F.coalesce(F.col("n"), F.lit(0).cast("bigint")).alias("n_orders"),
            F.coalesce(F.col("rev"), F.lit(0.0)).alias("revenue"),
        )
    )


@demo_query(
    "q_array_stats",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           SQRT(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))
             AS l2_norm,
           CAST(len(list_filter(embedding::DOUBLE[], x -> x > 0)) AS BIGINT)
             AS n_pos
    FROM embeddings
    """,
)
def q_array_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions over the embedding column: dimension,
    L2 norm (sequential-fold dot, ≡ DuckDB ``list_inner_product``), and
    positive-component count via ``filter``. All JVM-side array
    built-ins — no Python in the loop, so the hot path whole-stage
    codegens even on a 100 TB embedding table."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = as_double("embedding")
    return emb.select(
        "vec_id",
        F.size(v).cast("bigint").alias("dim"),
        F.sqrt(dot(v, v)).alias("l2_norm"),
        F.size(F.filter(v, lambda x: x > 0)).cast("bigint").alias("n_pos"),
    )


@demo_query(
    "q_collect_sorted",
    oracle="""
    SELECT c_mktsegment,
           array_to_string(list_sort(list_distinct(list(o_orderpriority))), ',')
             AS priorities,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: the sorted distinct set of order priorities per
    segment (``collect_set`` + ``sort_array``), serialized to a CSV
    string so the result is hashable by any downstream canonicalizer
    (array outputs crash pandas-side dedup/sort — same class as the
    round-1 q_dedup_clusters bug). Safe at scale only because the
    collected domain is bounded (5 priorities) — the docstring is the
    contract: never collect_set an unbounded column. The customer join
    is left to AQE: customer scales with SF, so no broadcast hint."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.array_join(
                F.sort_array(F.collect_set("o_orderpriority")), ","
            ).alias("priorities"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@demo_query(
    "q_quantile_filter",
    oracle="""
    WITH cutoff AS (
      SELECT lang, quantile_cont(n_chars, 0.25) AS p25
      FROM documents GROUP BY lang
    )
    SELECT d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(CAST(d.n_chars AS BIGINT)) AS BIGINT) AS total_chars
    FROM documents d JOIN cutoff c ON d.lang = c.lang
    WHERE d.n_chars >= c.p25
    GROUP BY d.lang
    """,
)
def q_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive quality filter: drop each language's shortest quartile
    (documents below the per-language p25 of n_chars) — thresholds that
    track the corpus instead of hand-tuned constants.

    The per-language cutoff is a tiny aggregate (one row per language)
    broadcast back into the scan, so the filter costs one pass; exact
    ``percentile`` ≡ DuckDB ``quantile_cont`` bitwise, making the
    boundary deterministic. At 100 TB swap in percentile_approx and the
    plan is unchanged.
    """
    docs = load_table(spark, sf_dir, "documents")
    cutoff = docs.groupBy(F.col("lang").alias("c_lang")).agg(
        F.percentile("n_chars", 0.25).alias("p25")
    )
    return (
        docs.join(F.broadcast(cutoff), docs.lang == F.col("c_lang"))
        .filter(F.col("n_chars") >= F.col("p25"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum(F.col("n_chars").cast("bigint")).alias("total_chars"),
        )
    )


@demo_query(
    "q_stratified_sample",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars
    FROM documents
    WHERE (lang = 'en'  AND md5(CAST(doc_id AS VARCHAR)) LIKE '0%')
       OR (lang <> 'en' AND (md5(CAST(doc_id AS VARCHAR)) LIKE '0%'
                             OR md5(CAST(doc_id AS VARCHAR)) LIKE '1%'
                             OR md5(CAST(doc_id AS VARCHAR)) LIKE '2%'
                             OR md5(CAST(doc_id AS VARCHAR)) LIKE '3%'))
    GROUP BY source
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: rebalance a corpus by keeping
    ~1/16 of the dominant language and ~1/4 of the rest, both via md5
    prefix splits (reproducible across engines, runs, and partitionings
    — the property ``df.sample``'s seeded RNG does not give).

    Pure per-row map-side predicate: no shuffle until the per-source
    aggregation, and the strata rates are data-independent so the plan
    is identical at any scale.
    """
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string")).substr(1, 1)
    keep = (
        (F.col("lang") == "en") & (h == "0")
    ) | ((F.col("lang") != "en") & h.isin("0", "1", "2", "3"))
    return (
        docs.filter(keep)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_chars").cast("bigint")).alias("total_chars"),
        )
    )


@demo_query(
    "q_corr_regression",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
                      * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
                      * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n_rows,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
             AS intercept,
           ROUND((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr_xy
    FROM s
    """,
)
def q_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group Pearson correlation + OLS fit (extendedprice ~ quantity)
    from closed-form moment sums.

    Built-in corr()/covar_samp() accumulate doubles in partition order —
    not reproducible across engines or even across runs with different
    partitioning. Here the five moments are EXACT decimal sums (single
    partial+final aggregate, one lineitem scan) and the slope/intercept/
    correlation are derived in double arithmetic from those identical
    scalars — bit-equal on any engine, any partitioning. This is the
    deterministic-statistics discipline of functions/money.py applied to
    second moments.
    """
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(12,2)")
    y = F.col("l_extendedprice").cast("decimal(12,2)")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "l_returnflag",
        n.cast("bigint").alias("n_rows"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("corr_xy"),
    )


@demo_query(
    "q_histogram",
    oracle="""
    WITH binned AS (
      SELECT LEAST(CAST(floor(o_totalprice / 60000.0) AS INTEGER), 9) AS bin,
             o_totalprice
      FROM orders
    )
    SELECT CAST(bin AS INT) AS bin,
           CAST(bin * 60000.0 AS DOUBLE) AS lo,
           CAST(CASE WHEN bin = 9 THEN 'inf' ELSE CAST((bin+1) * 60000.0 AS VARCHAR)
                END AS VARCHAR) AS hi,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM binned GROUP BY bin
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width numeric histogram (width_bucket shape): order values
    binned into ten 60k-wide buckets with an overflow top bin.

    Binning is one map-side integer expression on the scan; the shuffle
    carries ten partial-aggregate rows per task regardless of data size —
    the plan that holds at any scale. Fixed bounds (not data-dependent
    min/max) keep it one pass; an adaptive variant composes this with the
    broadcast-quantile pattern of q_quantile_filter."""
    orders = load_table(spark, sf_dir, "orders")
    bin_ = F.least(F.floor(F.col("o_totalprice") / 60000.0).cast("int"), F.lit(9))
    binned = orders.select(bin_.alias("bin"), "o_totalprice")
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(money("o_totalprice")).cast("double").alias("total"),
    ).select(
        F.col("bin").cast("int").alias("bin"),
        (F.col("bin") * 60000.0).cast("double").alias("lo"),
        F.when(F.col("bin") == 9, F.lit("inf"))
        .otherwise(((F.col("bin") + 1) * 60000.0).cast("string"))
        .alias("hi"),
        "n_orders",
        "total",
    )


@demo_query(
    "q_ratio_to_report",
    oracle="""
    WITH rev AS (
      SELECT l_returnflag, l_linestatus,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS revenue
      FROM lineitem GROUP BY 1, 2
    )
    SELECT l_returnflag, l_linestatus,
           CAST(revenue AS DOUBLE) AS revenue,
           ROUND(CAST(revenue AS DOUBLE) / CAST(SUM(revenue) OVER () AS DOUBLE), 8)
             AS share
    FROM rev
    """,
)
def q_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total (RATIO_TO_REPORT): each (returnflag, linestatus)
    group's share of total revenue. The global window runs over the
    POST-aggregation table (six rows — group-key cardinality, not data
    size), so the single-partition window is free at any scale; both
    numerator and denominator are exact decimal sums."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(money("l_extendedprice")).alias("revenue")
    )
    return rev.select(
        "l_returnflag",
        "l_linestatus",
        F.col("revenue").cast("double").alias("revenue"),
        F.round(
            F.col("revenue").cast("double")
            / F.sum("revenue").over(Window.partitionBy()).cast("double"),
            8,
        ).alias("share"),
    )


@demo_query(
    "q_interpolate",
    oracle="""
    WITH spine AS (
      SELECT CAST(d AS DATE) AS dt
      FROM (SELECT UNNEST(generate_series(DATE '1995-01-01', DATE '1995-03-31',
                                          INTERVAL 1 DAY)) AS d)
    ), daily AS (
      SELECT CAST(o_orderdate AS DATE) AS dt,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS rev
      FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1
    ), grid AS (
      SELECT spine.dt, rev FROM spine LEFT JOIN daily ON spine.dt = daily.dt
    ), ctx AS (
      SELECT dt, rev,
             last_value(rev IGNORE NULLS) OVER w_prev AS pv,
             last_value(CASE WHEN rev IS NOT NULL THEN dt END IGNORE NULLS)
               OVER w_prev AS pd,
             first_value(rev IGNORE NULLS) OVER w_next AS nv,
             first_value(CASE WHEN rev IS NOT NULL THEN dt END IGNORE NULLS)
               OVER w_next AS nd
      FROM grid
      WINDOW
        w_prev AS (ORDER BY dt ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_next AS (ORDER BY dt ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT dt,
           ROUND(CASE
             WHEN rev IS NOT NULL THEN rev
             WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
               pv + (nv - pv) * CAST(dt - pd AS DOUBLE) / CAST(nd - pd AS DOUBLE)
             ELSE COALESCE(pv, nv)
           END, 6) AS revenue,
           rev IS NULL AS interpolated
    FROM ctx
    """,
)
def q_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over calendar gaps: days with no urgent-order
    revenue get the straight line between the nearest known neighbors
    (constant extrapolation at the edges) — the time-series repair step
    after q_calendar_fill's zero-fill, for metrics where zero is wrong.

    The carry-forward/carry-backward pair is two IGNORE NULLS window
    scans over the POST-AGGREGATION daily grid (≤ one row per calendar
    day at any corpus scale — the documented free-at-scale post-agg
    window class; partition by a series key for the multi-series
    variant). Interpolation weights are exact day differences; the
    result rounds identically on both engines."""
    spine = spark.range(1).select(
        F.explode_outer(
            F.expr("sequence(DATE'1995-01-01', DATE'1995-03-31', interval 1 day)")
        ).alias("dt")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("dt")).agg(
        money_sum("o_totalprice", "rev")
    )
    grid = spine.join(F.broadcast(daily), "dt", "left").select(
        "dt", F.col("rev").cast("double").alias("rev")
    )
    w_prev = Window.orderBy("dt").rowsBetween(Window.unboundedPreceding, 0)
    w_next = Window.orderBy("dt").rowsBetween(0, Window.unboundedFollowing)
    known_dt = F.when(F.col("rev").isNotNull(), F.col("dt"))
    ctx = grid.select(
        "dt",
        "rev",
        F.last("rev", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(known_dt, ignorenulls=True).over(w_prev).alias("pd"),
        F.first("rev", ignorenulls=True).over(w_next).alias("nv"),
        F.first(known_dt, ignorenulls=True).over(w_next).alias("nd"),
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        F.datediff(F.col("dt"), F.col("pd")).cast("double")
        / F.datediff(F.col("nd"), F.col("pd")).cast("double")
    )
    return ctx.select(
        "dt",
        F.round(
            F.when(F.col("rev").isNotNull(), F.col("rev"))
            .when(
                F.col("pv").isNotNull() & F.col("nv").isNotNull(), interp
            )
            .otherwise(F.coalesce("pv", "nv")),
            6,
        ).alias("revenue"),
        F.col("rev").isNull().alias("interpolated"),
    )
