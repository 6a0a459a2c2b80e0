"""Advanced analytics operators (SURVEY.md §2.4/§2.7 extensions): as-of
join, sessionization, rollup, pivot, approximate distinct.

These are the operators the reference's Athena/Presto surface could
express but its models never used — mandated extensions, cleanly
separated. Spark lacks a native as-of join; it is built here as a
union-tag + window composition (option (a) of the custom-operator
ladder: composition of existing DataFrame ops — no UDFs, no
applyInPandas needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.money import money, money_sum
from .registry import demo_query

# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------

_ASOF_ORACLE = """
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), views AS (
      SELECT user_id, ts FROM events WHERE event_type = 'view'
    )
    SELECT p.event_id, p.user_id,
           p.ts AS purchase_ts,
           v.ts AS last_view_ts,
           CAST(epoch_us(p.ts) - epoch_us(v.ts) AS BIGINT) AS gap_us
    FROM purchases p
    ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND v.ts <= p.ts
"""


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value: str = "ts",
) -> DataFrame:
    """ASOF LEFT JOIN: for each left row, the right row with the largest
    ``right_ts`` <= ``left_ts`` within the same ``on`` key.

    Implementation: tag both sides, union, one window pass per key
    ordered by (ts, side) with a running ``last(right value ignorenulls)``
    — views at the same timestamp sort before purchases so ties are
    inclusive, matching ASOF semantics. Cost: one shuffle on the key +
    one sort — same complexity as a sort-merge join, no range explosion;
    this is the scalable shape (``pd.merge_asof`` per group via
    applyInPandas would serialize every partition through Python).
    """
    lt = left.select(
        F.lit(1).alias("_side"),
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(right.schema[right_value].dataType).alias("_rv"),
    )
    rt = right.select(
        F.lit(0).alias("_side"),
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(None).cast(lt.schema["_l"].dataType).alias("_l"),
        F.col(right_value).alias("_rv"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tagged = lt.unionByName(rt).withColumn(
        "_asof", F.last("_rv", ignorenulls=True).over(w)
    )
    return tagged.filter(F.col("_side") == 1).select("_l.*", F.col("_asof"))


@demo_query("q_asof_join", oracle=_ASOF_ORACLE)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the user's most recent prior (or simultaneous)
    view — the canonical event-attribution as-of join."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    joined = asof_join(purchases, views, on="user_id")
    return joined.select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("_asof").alias("last_view_ts"),
        (
            F.unix_micros(F.col("ts")) - F.unix_micros(F.col("_asof"))
        ).alias("gap_us"),
    )


# ---------------------------------------------------------------------------
# sessionization
# ---------------------------------------------------------------------------

_SESSION_GAP_MIN = 30

_SESSION_ORACLE = f"""
    WITH ordered AS (
      SELECT user_id, event_id, ts,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL {_SESSION_GAP_MIN} MINUTE
                    OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, event_id, ts,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end
    FROM sess GROUP BY user_id, session_id
"""


@demo_query("q_sessionize", oracle=_SESSION_ORACLE)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: a 30-minute inactivity gap starts a new session.
    lag → gap flag → running sum = session id, then one aggregation —
    two window passes over the same (user, ts) sort, one shuffle total."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (gap > _SESSION_GAP_MIN * 60 * 1_000_000),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


# ---------------------------------------------------------------------------
# rollup / pivot / approx
# ---------------------------------------------------------------------------


@demo_query(
    "q_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals via ROLLUP (status → status+priority → grand
    total) — subtotal levels carry NULL group keys in both engines."""
    return (
        load_table(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.sum(money("o_totalprice")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


_EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]

_PIVOT_ORACLE = f"""
    SELECT CAST(ts AS DATE) AS dt,
           {", ".join(
               f"CAST(COUNT(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS {t}"
               for t in _EVENT_TYPES
           )}
    FROM events GROUP BY 1
"""


@demo_query("q_pivot", oracle=_PIVOT_ORACLE)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event types into daily count columns. The pivot value list
    is fixed, so Spark needs no discovery pass and the plan is a single
    hash aggregation (identical to the FILTER-aggregate oracle)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(F.col("ts").cast("date").alias("dt"), "event_type")
        .groupBy("dt")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _EVENT_TYPES)
    )


_RANGE_ORACLE = """
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), views AS (
      SELECT user_id, ts FROM events WHERE event_type = 'view'
    )
    SELECT p.event_id, p.user_id,
           CAST(COUNT(v.ts) AS BIGINT) AS views_prev_hour
    FROM purchases p
    LEFT JOIN views v
      ON p.user_id = v.user_id
     AND v.ts > p.ts - INTERVAL 1 HOUR
     AND v.ts <= p.ts
    GROUP BY p.event_id, p.user_id
"""


@demo_query("q_range_join", oracle=_RANGE_ORACLE)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (SURVEY.md §2.4 extension): views within the hour
    before each purchase, per user.

    The equi-key (user_id) bounds the range probe, so Catalyst plans a
    sort-merge join on user_id with the interval as a post-join filter —
    no cross product. For range joins WITHOUT an equi-key, bucketize the
    time axis (join on floor(ts/width) ± 1, then filter) to get the same
    bounded shape; that variant is exercised in tests/test_analytics.py.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("p_ts")
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )
    joined = p.join(
        v,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("v_ts") > F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("v_ts") <= F.col("p_ts")),
        "left",
    )
    return joined.groupBy("event_id", "user_id").agg(
        F.count("v_ts").alias("views_prev_hour")
    )


_SALT_BUCKETS = 16

_SALTED_ORACLE = """
    SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY event_type
"""


@demo_query("q_salted_agg", oracle=_SALTED_ORACLE)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted two-phase aggregation: a hot group key (event_type
    has only 5 values — every row hits 5 reducers) is salted into
    key×16 sub-groups, partially aggregated, then re-aggregated on the
    true key. Decimal sums make the two-phase result identical to the
    direct aggregation, which is the oracle. (AQE's skew handling covers
    joins; aggregation skew is handled by this explicit pattern.)"""
    ev = load_table(spark, sf_dir, "events")
    salted = ev.withColumn(
        "_salt", F.pmod(F.xxhash64("event_id"), F.lit(_SALT_BUCKETS))
    )
    partial = salted.groupBy("event_type", "_salt").agg(
        F.sum(money("value")).alias("pv"),
        F.count(F.lit(1)).alias("pc"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pv").cast("double").alias("total_value"),
        F.sum("pc").alias("n_events"),
    )


@demo_query(
    "q_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^n grouping-set combinations in one pass (rollup's
    sibling — §2.6 extension)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        money_sum("l_quantity", "sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


_UNPIVOT_ORACLE = """
    WITH wide AS (
      SELECT l_returnflag,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS price,
             CAST(SUM(CAST(l_tax AS DECIMAL(12,2))) AS DOUBLE) AS tax
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, metric, amount
    FROM wide
    UNPIVOT (amount FOR metric IN (qty, price, tax))
"""


@demo_query("q_unpivot", oracle=_UNPIVOT_ORACLE)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide per-flag metric columns → long
    (flag, metric, amount) rows — pivot's inverse (§2.6 extension).
    Spark's ``unpivot`` is a zero-shuffle projection (each input row
    expands in place)."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        money_sum("l_quantity", "qty"),
        money_sum("l_extendedprice", "price"),
        money_sum("l_tax", "tax"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["qty", "price", "tax"],
        variableColumnName="metric",
        valueColumnName="amount",
    )


@demo_query(
    "q_percentile",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.5) AS p50,
           quantile_cont(l_extendedprice, 0.95) AS p95,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``, bit-identical on the same doubles). The scale
    path for quantiles is ``percentile_approx`` (t-digest, mergeable,
    constant memory) — exact percentile materializes each group's
    values and is for modest group cardinalities."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", 0.5).alias("p50"),
        F.percentile("l_extendedprice", 0.95).alias("p95"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@demo_query(
    "q_approx_quantile",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.5) AS p50,
           quantile_cont(l_extendedprice, 0.95) AS p95,
           TRUE AS approx_within_1pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile sketch (``percentile_approx``, Greenwald-Khanna at
    accuracy 10000) beside the exact interpolated percentile — the
    mergeable constant-memory scale path for quantiles, verified the
    same way as q_approx_distinct: sketch estimates are engine-specific,
    so the published columns are the exact values plus a bound check on
    the sketch (observed relative error ≤0.08% at every SF; the 1%
    bound has >10× headroom). Spark's exact ``percentile`` ≡ DuckDB
    ``quantile_cont`` bit-identically on the same doubles."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", 0.5).alias("p50"),
        F.percentile("l_extendedprice", 0.95).alias("p95"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("a50"),
        F.percentile_approx("l_extendedprice", 0.95, 10000).alias("a95"),
    )
    ok = (F.abs(F.col("a50") - F.col("p50")) / F.col("p50") <= 0.01) & (
        F.abs(F.col("a95") - F.col("p95")) / F.col("p95") <= 0.01
    )
    return agg.select(
        "l_returnflag", "p50", "p95", ok.alias("approx_within_1pct")
    )


@demo_query(
    "q_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimation next to the exact count — the
    scale path for cardinality metrics (constant memory per group vs a
    distinct shuffle).

    Raw HLL sketch values differ across engines by design, so the output
    carries the exact count plus a ``within_5pct`` bound check on the
    engine's estimate (HLL++ at rsd=0.02 — 2.5σ of headroom against the
    5% bound — stays well inside it at these cardinalities) —
    deterministic and oracle-checkable while still exercising the sketch
    aggregate end-to-end."""
    li = load_table(spark, sf_dir, "lineitem")
    # Mixing countDistinct with other aggregates makes Catalyst plan an
    # Expand that DOUBLES the fact stream before the partial aggregate
    # (measured 104 s at the 100× soak scale). Split instead: the exact
    # side is a two-level aggregate — (flag, orderkey) partial counts
    # collapse ~4 lineitems/order map-side, then one tiny rollup — and
    # the HLL sketch aggregates the scan directly; the flag-level join
    # is a handful of rows. Same values, one Expand-free pass each
    # (measured 104 s → ~9 s at sf10). NULL-correct by construction:
    # the rollup counts count_if(l_orderkey IS NOT NULL), matching
    # COUNT(DISTINCT)'s NULL-dropping semantics (and HLL's, which also
    # ignores NULLs) while n_rows keeps every row — see
    # dedup.py::q_dedup_exact; pinned by tests/test_nullkey_distinct.py.
    per_order = li.groupBy("l_returnflag", "l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines")
    )
    exact = per_order.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_orderkey").isNotNull()).alias("exact_orders"),
        F.sum("n_lines").alias("n_rows"),
    )
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders")
    )
    agg = exact.join(approx, "l_returnflag")
    err = F.abs(F.col("approx_orders") - F.col("exact_orders")) / F.col(
        "exact_orders"
    )
    return agg.select(
        "l_returnflag",
        "exact_orders",
        "n_rows",
        (err <= 0.05).alias("within_5pct"),
    )


@demo_query(
    "q_hll_rollup",
    oracle="""
    SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)
             AS month,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact,
           TRUE AS union_tracks_direct,
           TRUE AS within_5pct
    FROM orders GROUP BY 1
    """,
)
def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: DataSketches HLL sketches built per DAY
    are UNIONED into monthly distinct-customer estimates — the 100 TB
    pattern for cardinality over any time range: materialize one ~4 KB
    sketch per partition once (``hll_sketch_agg``, a partial-aggregable
    JVM built-in), answer every rollup window by unioning sketches
    (``hll_union_agg``) instead of re-scanning raw keys. Two properties
    are pinned: (1) MERGEABILITY — the union-of-daily-sketches estimate
    tracks the sketch built directly over the month within 4%. Once
    both paths promote to dense HLL the register arrays are IDENTICAL
    (union is register-wise max — order- and partitioning-independent;
    measured gap exactly 0 at sf1's ~12k-per-month cardinalities). In
    the sparse→dense transition zone the two sides may sit in different
    internal modes (exact coupon list vs estimated registers) and the
    estimates differ by at most the combined estimator error — measured
    ≤1.9% at sf0.1, bounded at 4% ≈ 2.5σ of two rsd-1.6% estimators.
    (2) ACCURACY — the rolled-up estimate sits within 5% of the exact
    count (lgK=12 → rsd 1.6%, ~3σ headroom; small months stay in the
    sketch's exact coupon-list mode anyway). Estimates are
    engine-specific, so as in q_approx_distinct the published columns
    are the exact count plus the two bound checks. The exact side uses
    the Expand-free two-level aggregate (see q_approx_distinct's plan
    note)."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.date_trunc("month", F.col("o_orderdate").cast("date"))
        .cast("date")
        .alias("month"),
        F.col("o_orderdate").cast("date").alias("dt"),
        "o_custkey",
    )
    daily = orders.groupBy("month", "dt").agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    rolled = daily.groupBy("month").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_union")
    )
    direct = orders.groupBy("month").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias(
            "est_direct"
        )
    )
    per_cust = orders.groupBy("month", "o_custkey").agg(
        F.count(F.lit(1)).alias("__n")
    )
    exact = per_cust.groupBy("month").agg(
        F.count_if(F.col("o_custkey").isNotNull()).alias("n_exact")
    )
    agg = exact.join(rolled, "month").join(direct, "month")
    err = F.abs(F.col("est_union") - F.col("n_exact")) / F.col("n_exact")
    gap = F.abs(F.col("est_union") - F.col("est_direct")) / F.col(
        "est_direct"
    )
    return agg.select(
        "month",
        F.col("n_exact").cast("bigint").alias("n_exact"),
        (gap <= 0.04).alias("union_tracks_direct"),
        (err <= 0.05).alias("within_5pct"),
    )


# ---------------------------------------------------------------------------
# window-function breadth: distribution ranks, frame navigation, lateral
# explode — §2.7 extensions beyond rank/lag/cumsum
# ---------------------------------------------------------------------------


@demo_query(
    "q_ntile",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority,
             o_totalprice,
             NTILE(4) OVER w AS quartile,
             PERCENT_RANK() OVER w AS pr,
             CUME_DIST() OVER w AS cd
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice, o_orderkey)
    )
    SELECT o_orderpriority, CAST(quartile AS INT) AS quartile,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(MIN(o_totalprice), 2) AS min_price,
           ROUND(MAX(o_totalprice), 2) AS max_price,
           ROUND(AVG(pr), 6) AS avg_pct_rank,
           ROUND(AVG(cd), 6) AS avg_cume_dist
    FROM ranked GROUP BY o_orderpriority, quartile
    """,
)
def q_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows (NTILE quartiles, PERCENT_RANK, CUME_DIST)
    partitioned by order priority — the value-banding shape used for
    price-tier assignment. The window partitions on a bounded key so no
    global sort exists; ties broken by o_orderkey make every rank
    deterministic. The follow-up aggregation reuses the window's
    (priority) hash partitioning."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    ranked = orders.select(
        "o_orderpriority",
        "o_totalprice",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    return ranked.groupBy("o_orderpriority", "quartile").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.avg("pr"), 6).alias("avg_pct_rank"),
        F.round(F.avg("cd"), 6).alias("avg_cume_dist"),
    )


@demo_query(
    "q_first_last",
    oracle="""
    WITH nav AS (
      SELECT o_custkey,
             FIRST_VALUE(o_totalprice) OVER w AS first_price,
             LAST_VALUE(o_totalprice) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS last_price,
             NTH_VALUE(o_totalprice, 2) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS second_price,
             COUNT(*) OVER (PARTITION BY o_custkey) AS n_orders,
             ROW_NUMBER() OVER w AS rn
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    )
    SELECT o_custkey,
           ROUND(first_price, 2) AS first_price,
           ROUND(last_price, 2) AS last_price,
           ROUND(second_price, 2) AS second_price,
           CAST(n_orders AS BIGINT) AS n_orders
    FROM nav WHERE rn = 1
    """,
)
def q_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-navigation windows: each customer's first, last, and second
    order value (FIRST_VALUE / LAST_VALUE / NTH_VALUE with an explicit
    unbounded frame — the default frame would stop at CURRENT ROW and
    silently return the running last). One shuffle on o_custkey serves
    all five window expressions plus the rn=1 collapse."""
    orders = load_table(spark, sf_dir, "orders")
    order_w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    full_w = order_w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    nav = orders.select(
        "o_custkey",
        F.first("o_totalprice").over(order_w).alias("first_raw"),
        F.last("o_totalprice").over(full_w).alias("last_raw"),
        F.nth_value("o_totalprice", 2).over(full_w).alias("second_raw"),
        F.count(F.lit(1)).over(Window.partitionBy("o_custkey")).alias("n_orders"),
        F.row_number().over(order_w).alias("rn"),
    )
    return nav.filter(F.col("rn") == 1).select(
        "o_custkey",
        F.round("first_raw", 2).alias("first_price"),
        F.round("last_raw", 2).alias("last_price"),
        F.round("second_raw", 2).alias("second_price"),
        F.col("n_orders").cast("bigint").alias("n_orders"),
    )


@demo_query(
    "q_explode_pos",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS w
      FROM documents WHERE doc_id < 5
    )
    SELECT doc_id, CAST(i AS INT) AS pos, w[i] AS token
    FROM (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS i FROM toks)
    """,
)
def q_explode_pos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional lateral explode (LATERAL VIEW posexplode): token stream
    with 1-based positions for a bounded document slice — the
    tokenize-with-offsets shape used to build training-example index
    tables. Generation is map-side on the scan (one output row per array
    element, no shuffle at all)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 5)
    w = F.split(F.lower(F.col("text")), " ")
    return docs.select("doc_id", F.posexplode(w).alias("pos0", "token")).select(
        "doc_id",
        (F.col("pos0") + 1).cast("int").alias("pos"),
        "token",
    )


@demo_query(
    "q_funnel",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MIN(ts) FILTER (WHERE event_type = 'view') AS t_view,
             MIN(ts) FILTER (WHERE event_type = 'click') AS t_click,
             MIN(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(t_view) AS BIGINT) AS step_view,
           CAST(COUNT(CASE WHEN t_click > t_view THEN 1 END) AS BIGINT)
             AS step_click,
           CAST(COUNT(CASE WHEN t_purchase > t_click AND t_click > t_view
                      THEN 1 END) AS BIGINT) AS step_purchase
    FROM per_user
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase): a user
    advances a step only if the step's FIRST occurrence is strictly after
    the previous step's first occurrence — the sequential-pattern shape
    behind product funnels.

    One aggregation computes all three first-occurrence timestamps
    (conditional MIN, map-side partial), one more row-level expression
    ranks the funnel; no joins, no window, one shuffle on user_id.
    """
    ev = load_table(spark, sf_dir, "events")
    first = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))  # noqa: E731
    per_user = ev.groupBy("user_id").agg(
        first("view").alias("t_view"),
        first("click").alias("t_click"),
        first("purchase").alias("t_purchase"),
    )
    did_click = F.col("t_click") > F.col("t_view")
    did_purchase = (F.col("t_purchase") > F.col("t_click")) & did_click
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("step_view"),
        F.count(F.when(did_click, 1)).alias("step_click"),
        F.count(F.when(did_purchase, 1)).alias("step_purchase"),
    )


@demo_query(
    "q_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id,
             date_trunc('week', f.first_day) AS cohort_week,
             CAST(floor(date_diff('day', date_trunc('week', f.first_day),
                                  CAST(e.ts AS DATE)) / 7) AS INT) AS week_offset
      FROM events e JOIN firsts f USING (user_id)
    )
    SELECT CAST(cohort_week AS DATE) AS cohort_week, week_offset,
           CAST(COUNT(*) AS BIGINT) AS active_users
    FROM activity
    WHERE week_offset BETWEEN 0 AND 8
    GROUP BY 1, 2
    """,
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week, counted
    once per (cohort, week-offset) they were active in — the
    week-N-retention table behind every growth dashboard.

    Two shuffles on user_id (first-seen aggregation, then the
    distinct-activity dedup reuses the same key partitioning) plus the
    final small (cohort × offset) rollup. The first-seen side is
    per-user — dimension-sized — so AQE broadcasts it back onto events.
    """
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day")
    )
    cohort = F.date_trunc("week", F.col("first_day")).cast("date")
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            cohort.alias("cohort_week"),
            F.floor(
                F.datediff(F.col("ts").cast("date"), cohort) / 7
            ).cast("int").alias("week_offset"),
        )
        .filter(F.col("week_offset").between(0, 8))
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("active_users")
    )


# -- mergeable quantile-histogram rollup (the quantile twin of
# -- q_hll_rollup's sketch pattern) ------------------------------------------

_QH_WIDTH = 110.0  # bin width: l_extendedprice < 110_000 at every SF
_QH_BINS = 1000


@demo_query(
    "q_quantile_rollup",
    oracle=f"""
    WITH pr AS (
      SELECT l_returnflag AS flag, CAST(l_extendedprice AS DOUBLE) AS p
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ),
    b AS (
      SELECT flag,
             LEAST(CAST(FLOOR(p / {_QH_WIDTH}) AS BIGINT),
                   {_QH_BINS - 1}) AS bin,
             COUNT(*) AS c
      FROM pr GROUP BY 1, 2
    ),
    tot AS (SELECT flag, SUM(c) AS n FROM b GROUP BY 1),
    cum AS (
      SELECT flag, bin,
             SUM(c) OVER (PARTITION BY flag ORDER BY bin) AS cum
      FROM b
    ),
    p50 AS (
      SELECT cum.flag, MIN(bin) AS b50
      FROM cum JOIN tot USING (flag)
      WHERE CAST(cum.cum AS DOUBLE) >= 0.5 * CAST(tot.n AS DOUBLE)
      GROUP BY 1
    ),
    p95 AS (
      SELECT cum.flag, MIN(bin) AS b95
      FROM cum JOIN tot USING (flag)
      WHERE CAST(cum.cum AS DOUBLE) >= 0.95 * CAST(tot.n AS DOUBLE)
      GROUP BY 1
    )
    SELECT flag AS l_returnflag,
           CAST(n AS BIGINT) AS n,
           (b50 + 0.5) * {_QH_WIDTH} AS p50_est,
           (b95 + 0.5) * {_QH_WIDTH} AS p95_est,
           TRUE AS rollup_equals_direct
    FROM tot JOIN p50 USING (flag) JOIN p95 USING (flag)
    """,
)
def q_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketches: fixed-bin histograms (1000 bins ×
    width 110 over l_extendedprice's domain) built per FINE group
    (returnflag × ship month) are MERGED into per-returnflag sketches
    by summing bin counts — the 100 TB pattern for quantiles over any
    group hierarchy: materialize one ~8 KB count vector per partition
    once, answer every rollup window by vector addition instead of
    re-scanning raw values. Spark's ``percentile_approx`` (GK) is NOT
    rollup-mergeable — two GK summaries for sibling groups cannot be
    combined after the fact — which is exactly what the histogram form
    buys: merge is exact by construction (integer addition commutes),
    pinned here by comparing the merged vectors against histograms
    built directly over the coarse groups (``rollup_equals_direct``
    uses ``bool_and`` over a full-outer bin join — any count drift
    fails the row). Quantile estimates are bin midpoints at the first
    bin whose cumulative count crosses q·n — deterministic, so the
    DuckDB oracle reproduces them bit-for-bit; estimation error is
    bounded by the bin width (110 ≈ 0.1% of the domain), unlike a
    sketch whose error grows with merges."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_returnflag").alias("flag"),
            F.date_trunc(
                "month", F.col("l_shipdate").cast("date")
            ).alias("fine"),
            F.col("l_extendedprice").cast("double").alias("p"),
        )
        .where(F.col("p").isNotNull())
    )
    bin_col = F.least(
        F.floor(F.col("p") / _QH_WIDTH).cast("long"), F.lit(_QH_BINS - 1)
    )
    fine = li.groupBy("flag", "fine", bin_col.alias("bin")).agg(
        F.count(F.lit(1)).alias("c")
    )
    merged = fine.groupBy("flag", "bin").agg(F.sum("c").alias("c"))
    direct = li.groupBy("flag", bin_col.alias("bin")).agg(
        F.count(F.lit(1)).alias("cd")
    )
    eqchk = (
        merged.join(direct, ["flag", "bin"], "full_outer")
        .groupBy("flag")
        .agg(
            F.bool_and(
                F.coalesce(F.col("c"), F.lit(0))
                == F.coalesce(F.col("cd"), F.lit(0))
            ).alias("rollup_equals_direct")
        )
    )
    w = Window.partitionBy("flag").orderBy("bin")
    cum = merged.withColumn("cum", F.sum("c").over(w))
    tot = merged.groupBy("flag").agg(F.sum("c").alias("n"))
    j = cum.join(tot, "flag")
    b50 = (
        j.where(F.col("cum").cast("double") >= 0.5 * F.col("n").cast("double"))
        .groupBy("flag")
        .agg(F.min("bin").alias("b50"))
    )
    b95 = (
        j.where(
            F.col("cum").cast("double") >= 0.95 * F.col("n").cast("double")
        )
        .groupBy("flag")
        .agg(F.min("bin").alias("b95"))
    )
    return (
        tot.join(b50, "flag")
        .join(b95, "flag")
        .join(eqchk, "flag")
        .select(
            F.col("flag").alias("l_returnflag"),
            F.col("n").cast("long").alias("n"),
            ((F.col("b50") + 0.5) * _QH_WIDTH).alias("p50_est"),
            ((F.col("b95") + 0.5) * _QH_WIDTH).alias("p95_est"),
            "rollup_equals_direct",
        )
    )
