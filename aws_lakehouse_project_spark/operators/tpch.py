"""TPC-H-shape relational queries (SURVEY.md §2.4 extension surface).

The reference's SQL engine (Athena/Presto) could run all of these; its
models just never did. They exercise the join/agg semantics a lakehouse
user would actually run: star-schema multi-joins, EXISTS/NOT EXISTS as
semi/anti joins, distinct aggregates, and outer-join distributions —
each with a DuckDB oracle and exact-decimal money math.
"""

from __future__ import annotations

import decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.money import money
from .registry import demo_query


@demo_query(
    "q_tpch_q5",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND CAST(o_orderdate AS DATE) >= DATE '1995-01-01'
      AND CAST(o_orderdate AS DATE) <  DATE '1996-01-01'
    GROUP BY n_name
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star join → revenue per nation.

    Scale plan: region/nation are genuinely bounded (5/25 rows) and get
    broadcast hints; customer and supplier SCALE WITH SF (150k/10k rows
    per SF — multi-TB at the 100 TB design point), so no hint — AQE
    broadcasts them at runtime when they fit and shuffle-joins when they
    don't. The only unavoidable shuffle is lineitem↔orders + the final
    aggregation — the plan a 100 TB star schema needs.
    """
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate").cast("date") < F.lit("1996-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = money("l_extendedprice") * money(F.lit(1) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(
            supplier,
            (li.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(disc_price).cast("double").alias("revenue"))
    )


@demo_query(
    "q_semi_join",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.08
    )
    GROUP BY o_orderpriority
    """,
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as LEFT SEMI join (TPC-H Q4 shape): orders with at least
    one deeply-discounted line, counted by priority. Semi join ships
    only the key column of the probe side — no row duplication."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_discount") > 0.08)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@demo_query(
    "q_anti_join",
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    GROUP BY c_mktsegment
    """,
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as LEFT ANTI join: customers with no urgent orders
    (scoped to the urgent subset so the result is non-degenerate — every
    testdata customer has at least one order)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@demo_query(
    "q_distinct_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple distinct aggregates over one group key (TPC-H Q16
    shape). The naive one-agg form makes Catalyst plan a 3-way Expand
    (one duplicated stream per distinct column plus one for the plain
    count — BASELINE.md r6); instead each distinct column gets its own
    two-level aggregate (map-side-combined (flag, key) partials → tiny
    rollup) and the flag-level results join on the handful of group
    rows. At scale prefer approx_count_distinct (q_approx_distinct)
    where exactness isn't required.

    NULL-correct by construction (shared by every two-level distinct
    re-plan, see dedup.py::q_dedup_exact): a NULL key forms its own
    inner group, so the rollup counts count_if(key IS NOT NULL) —
    COUNT(DISTINCT)'s NULL-dropping semantics — while n_rows keeps
    every row; pinned by tests/test_nullkey_distinct.py."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = (
        li.groupBy("l_returnflag", "l_suppkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("l_returnflag")
        .agg(
            F.count_if(F.col("l_suppkey").isNotNull()).alias("n_suppliers"),
            F.sum("n").alias("n_rows"),
        )
    )
    parts = (
        li.groupBy("l_returnflag", "l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("l_returnflag")
        .agg(F.count_if(F.col("l_partkey").isNotNull()).alias("n_parts"))
    )
    return supp.join(parts, "l_returnflag").select(
        "l_returnflag", "n_suppliers", "n_parts", "n_rows"
    )


@demo_query(
    "q_left_join_hist",
    oracle="""
    WITH per_cust AS (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM per_cust GROUP BY n_orders
    """,
)
def q_left_join_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: orders-per-customer distribution via LEFT OUTER
    join (zero-order customers kept) → two-level aggregation."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count(F.lit(1)).alias("n_customers")
    )

@demo_query(
    "q_having",
    oracle="""
    WITH big AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(FLOOR(l_quantity) AS BIGINT)) > 200
    )
    SELECT c_name, o_orderkey,
           CAST(o_orderdate AS DATE) AS dt,
           CAST(o_totalprice AS DOUBLE) AS totalprice,
           total_qty
    FROM big
    JOIN orders   ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING over an aggregated group (orders whose
    total line quantity exceeds a threshold), joined back to the order
    and customer rows.

    The HAVING filter is just a post-aggregation ``filter`` — Catalyst
    evaluates it on the aggregate's output before the joins, so only the
    qualifying ~0.1% of orders ever reach the join. The surviving side is
    small at any scale, but its size tracks the data (not a fixed dim),
    so no broadcast hint — AQE picks broadcast at runtime when it fits.
    """
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        # floor() pins the double→bigint semantics on both engines (see
        # q_tpch_q20): Spark truncates, DuckDB rounds half-even
        .agg(F.sum(F.floor("l_quantity").cast("bigint")).alias("total_qty"))
        .filter(F.col("total_qty") > 200)
    )
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("dt"),
            F.col("o_totalprice").cast("double").alias("totalprice"),
            "total_qty",
        )
    )


@demo_query(
    "q_correlated_subquery",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
             AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#4'
      AND l.l_quantity < (
        SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS BIGINT)) AS DOUBLE)
                      / CAST(COUNT(*) AS DOUBLE))
        FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
)
def q_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: per-group correlated scalar subquery (lines below
    20% of their part's average quantity), decorrelated into a self-join
    on the per-part aggregate.

    Scale plan: the brand filter reduces part 25× and joins into
    lineitem FIRST, so the per-part average is computed over only the
    selected parts' lines — identical semantics (the average is per
    part, and part determines brand) at a fraction of the aggregation
    input. The filtered key set still scales with SF, so no forced
    broadcast — AQE picks broadcast when the filtered side fits and
    falls back to a shuffle join at 100 TB. The average is a ratio of
    exact integer sums, so the 20% threshold compares bit-identical
    doubles on both engines.
    """
    part_keys = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#4")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    fli = li.join(part_keys, li.l_partkey == F.col("p_partkey"))
    avg_q = fli.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (
            F.sum(F.col("l_quantity").cast("bigint")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_qty")
    )
    return (
        fli.join(avg_q, fli.l_partkey == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            (F.sum(money("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


@demo_query(
    "q_tpch_q3",
    oracle="""
    SELECT l_orderkey, o_orderdate,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND CAST(o_orderdate AS DATE) < DATE '1995-03-15'
      AND CAST(l_shipdate  AS DATE) > DATE '1995-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): unshipped BUILDING-segment
    orders ranked by open revenue, top 10.

    The segment filter semi-joins customer into orders before the
    lineitem join, so only qualifying orders' lines aggregate; the
    top-10 compiles to TakeOrderedAndProject (per-partition heaps, no
    global sort). No broadcast hints: customer and the filtered orders
    both grow with scale — AQE promotes either side to broadcast when
    its measured size actually fits. Tie-break on l_orderkey keeps LIMIT
    deterministic for the oracle. (Testdata orders carry no
    o_shippriority column — the grouping drops that key, otherwise the
    classic query.)
    """
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("date") < F.lit("1995-03-15")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date") > F.lit("1995-03-15")
    )
    disc_price = money("l_extendedprice") * money(F.lit(1) - F.col("l_discount"))
    return (
        li.join(
            orders.join(cust, orders.o_custkey == cust.c_custkey, "left_semi"),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(disc_price).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@demo_query(
    "q_tpch_q10",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE CAST(o_orderdate AS DATE) >= DATE '1995-01-01'
      AND CAST(o_orderdate AS DATE) <  DATE '1995-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): customers who returned
    goods in 1995Q1, ranked by lost revenue, top 20.

    lineitem is pre-filtered to returned lines map-side; orders
    pre-filtered to the quarter. Only nation (25 rows, scale-constant)
    gets a broadcast hint — customer grows with the corpus, so its join
    is left to the planner/AQE. The shuffles are the lineitem↔orders
    and customer joins plus the final per-customer aggregation; the
    top-20 is TakeOrderedAndProject.
    """
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate").cast("date") < F.lit("1995-04-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    disc_price = money("l_extendedprice") * money(F.lit(1) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(disc_price).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@demo_query(
    "q_tpch_q7",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS volume
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY 1, 2, 3
    """,
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): bilateral trade volume between
    two nations by ship year.

    The nation pair predicate lands on the two broadcast nation joins —
    customer/supplier rows from other nations die at the map side of
    their joins, so the big lineitem↔orders shuffle carries only the
    surviving fraction. Disjunctive cross-nation condition is evaluated
    post-join on broadcast-joined columns (no shuffle added)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
    )
    return joined.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("int").alias("l_year"),
    ).agg(
        F.sum(money("l_extendedprice") * money(F.lit(1) - F.col("l_discount")))
        .cast("double")
        .alias("volume")
    )


@demo_query(
    "q_tpch_q19",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 35)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 50)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates): an
    OR of brand/size/quantity conjunctions spanning both join sides.

    Catalyst extracts the single-side implications of the disjunction
    (p_brand IN (...), p_size range, l_quantity range) and pushes them
    below the join as scan filters, so the join sees pre-filtered
    inputs and only the cross-side residual runs post-join — the
    pattern that matters when the OR arms would otherwise force a full
    lineitem scan through the join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    arm = lambda brand, s_lo, s_hi, q_lo, q_hi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(s_lo, s_hi)
        & F.col("l_quantity").between(q_lo, q_hi)
    )
    cond = (
        arm("Brand#1", 1, 15, 1, 20)
        | arm("Brand#2", 10, 30, 10, 35)
        | arm("Brand#3", 20, 50, 20, 50)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.sum(money("l_extendedprice") * money(F.lit(1) - F.col("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@demo_query(
    "q_tpch_q14",
    oracle="""
    SELECT CAST(EXTRACT(month FROM l_shipdate) AS INT) AS ship_month,
           CAST(ROUND(100.00 * SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(1 - l_discount AS DECIMAL(12,2))
                 ELSE 0 END)
               / SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                     * CAST(1 - l_discount AS DECIMAL(12,2))), 4) AS DOUBLE)
             AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): promo revenue share per ship
    month — the conditional-aggregation-ratio pattern.

    part is dimension-sized relative to lineitem but still scales with
    SF (200k rows/SF), so no forced broadcast — AQE broadcasts it when
    it fits and shuffle-joins at the 100 TB design point. Both the
    conditional and total sums ride ONE aggregation pass (map-side
    partials), and the ratio of two exact decimal sums is a
    deterministic double on any engine."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = money("l_extendedprice") * money(F.lit(1) - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.month("l_shipdate").cast("int").alias("ship_month"))
        .agg(
            F.round(
                (F.lit(100.00) * F.sum(promo) / F.sum(rev)).cast("double"), 4
            ).alias("promo_revenue_pct")
        )
    )


@demo_query(
    "q_tpch_q22",
    oracle="""
    WITH avg_bal AS (
      SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.00
    )
    SELECT substr(c_name, 10, 2) AS cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE)
             AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > a
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY 1
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): customers with
    above-average positive balance and NO orders, grouped by a name-
    derived country code — scalar subquery + anti join + substring
    grouping in one query.

    The average is a 1-row broadcast; the anti join keys on o_custkey
    (orders' key projection only crosses the exchange). Customers that
    survive both gates are a small fraction, so the final rollup is
    cheap at any scale."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.00).agg(
        F.avg("c_acctbal").alias("a")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(orders.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti")
        .groupBy(F.substring("c_name", 10, 2).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(money("c_acctbal")), 2).cast("double").alias("totacctbal"),
        )
    )


@demo_query(
    "q_tpch_q8",
    oracle="""
    WITH all_nations AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             CAST(l_extendedprice AS DECIMAL(12,2))
               * CAST(1 - l_discount AS DECIMAL(12,2)) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN part     ON l_partkey = p_partkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    )
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_1'
                               THEN volume ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 8) AS mkt_share
    FROM all_nations GROUP BY o_year
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): one nation's share of the
    yearly promo-part volume sold into one region's market — an
    8-table join feeding a conditional-ratio aggregation.

    nation/region predicates ride bounded broadcast joins; the PROMO
    part filter prunes map-side but part scales with SF so its join is
    left to AQE. The big lineitem↔orders exchange carries only the
    region+type survivors;
    the share is a ratio of two exact decimal sums from ONE aggregation
    pass (no second scan, no join-back)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")

    n1 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    vol = money("l_extendedprice") * money(F.lit(1) - F.col("l_discount"))
    all_nations = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("c_rk") == F.col("r_regionkey"),
        )
        .join(
            part.filter(F.col("p_type") == "PROMO"),
            li.l_partkey == part.p_partkey,
        )
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    nat_vol = F.when(F.col("supp_nation") == "NATION_1", F.col("volume")).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    # divide as doubles: Spark's decimal-division scale rules would
    # truncate the ratio below the 8 decimals the report keeps; both
    # operands are exact decimal sums, so the double quotient is
    # deterministic on any engine
    return all_nations.groupBy("o_year").agg(
        F.round(
            F.sum(nat_vol).cast("double") / F.sum("volume").cast("double"), 8
        ).alias("mkt_share")
    )


@demo_query(
    "q_tpch_q21",
    oracle="""
    SELECT s_name,
           CAST(COUNT(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN supplier ON l1.l_suppkey = s_suppkey
    JOIN orders   ON l1.l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate >= l1.l_shipdate
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): in finished
    multi-supplier orders, the supplier who shipped strictly last —
    EXISTS (another supplier participated) + NOT EXISTS (anyone else
    shipped as late), the chained semi/anti self-join pattern.
    (l_shipdate stands in for the reference benchmark's receipt/commit
    lateness columns, which this testdata does not carry.)

    Both subqueries key on l_orderkey, so Spark evaluates them as a
    LeftSemi and a LeftAnti join sharing the lineitem exchange; orders'
    status filter prunes before its join; the final top-20 compiles to
    TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")

    l1 = li.select("l_orderkey", "l_suppkey", "l_shipdate")
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("o3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("d3"),
    )
    waiting = (
        l1.join(
            orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
            l1.l_orderkey == F.col("o_orderkey"),
        )
        .join(
            l2,
            (F.col("o2") == l1.l_orderkey) & (F.col("s2") != l1.l_suppkey),
            "left_semi",
        )
        .join(
            l3,
            (F.col("o3") == l1.l_orderkey)
            & (F.col("s3") != l1.l_suppkey)
            & (F.col("d3") >= l1.l_shipdate),
            "left_anti",
        )
    )
    return (
        waiting.join(supp, waiting.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


@demo_query(
    "q_tpch_q6",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.04
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecasting revenue change): the all-filter
    single-aggregate scan. Every predicate reaches the parquet reader as
    a pushed filter (date range through the cast, discount range,
    quantity bound) so row groups outside the year never decompress; the
    aggregation is one partial+final pass with no grouping key."""
    li = load_table(spark, sf_dir, "lineitem")
    sel = li.filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01"))
        & F.col("l_discount").between(0.02, 0.04)
        & (F.col("l_quantity") < 24)
    )
    return sel.agg(
        F.sum(money("l_extendedprice") * money("l_discount"))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@demo_query(
    "q_tpch_q15",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE)
               AS total_revenue
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): quarterly per-supplier revenue
    compared against its own maximum — the view + scalar-subquery
    pattern. The revenue aggregation runs ONCE and is reused for both
    the max (1-row broadcast) and the equality filter; the one-or-few
    surviving revenue rows join to supplier with no forced hint — AQE
    broadcasts the tiny filtered side, whatever SF supplier reaches."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate").cast("date") < F.lit("1996-04-01"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(money("l_extendedprice") * money(F.lit(1) - F.col("l_discount")))
            .cast("double")
            .alias("total_revenue")
        )
        # reused by the max subquery AND the filter — materialize once
        .localCheckpoint(eager=True)
    )
    top = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@demo_query(
    "q_tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
             AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE)
             AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(12,2))
                    * CAST(1 + l_tax AS DECIMAL(12,2))) AS DOUBLE)
             AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
             AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
             AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
             AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary report): THE canonical scan-heavy
    aggregation — one pushed date filter, eight aggregates over two
    low-cardinality grouping keys, computed in a single partial+final
    hash-aggregate pass (map-side combine collapses each task to ~6
    groups before the shuffle, so shuffle volume is O(groups), not
    O(rows) — the shape that holds at 100 TB). Averages are derived
    from the exact-decimal sums divided as double (bit-identical to the
    oracle, immune to float summation order)."""
    li = load_table(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    disc_price = money("l_extendedprice") * money(F.lit(1) - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate").cast("date") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(money("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(money("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(disc_price * money(F.lit(1) + F.col("l_tax")))
            .cast("double")
            .alias("sum_charge"),
            (F.sum(money("l_quantity")).cast("double") / n).alias("avg_qty"),
            (F.sum(money("l_extendedprice")).cast("double") / n).alias("avg_price"),
            (F.sum(money("l_discount")).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@demo_query(
    "q_tpch_q9",
    oracle="""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE)
             AS revenue
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit, adapted: the testdata has no
    partsupp, so profit is discounted revenue): five-way join rolled up
    by supplier nation × order year for one product family.

    Scale plan: the p_name LIKE filter prunes part BEFORE the join (the
    only predicate in the query — Catalyst pushes it to the part scan),
    lineitem joins the filtered part keys first so the fact is cut
    ~10× before the orders join (the widest side), and nation is a
    25-row broadcast. Year extraction happens post-join on the
    surviving rows only."""
    li = load_table(spark, sf_dir, "lineitem")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            F.sum(money("l_extendedprice") * money(F.lit(1) - F.col("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


@demo_query(
    "q_tpch_q11",
    oracle="""
    WITH per_part AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * CAST(1 - l_discount AS DECIMAL(12,2))) AS value
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT SUM(value) AS total FROM per_part)
    SELECT l_partkey, CAST(value AS DOUBLE) AS value
    FROM per_part, tot
    WHERE value > 0.001 * total
    """,
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock, adapted to lineitem value):
    per-part revenue filtered against a FRACTION OF THE GLOBAL TOTAL —
    the nested-aggregate-threshold pattern.

    The global total re-aggregates the per-part aggregate (tiny), then
    rejoins as a 1-row broadcast cross join — the same
    scalar-broadcast discipline as the engine's other global
    comparisons; the per-part table is never shuffled twice. Exact
    decimal on both sums so the > comparison is engine-identical."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(money("l_extendedprice") * money(F.lit(1) - F.col("l_discount"))).alias(
            "value"
        )
    )
    # reused by the total AND the filter — materialize once
    per_part = per_part.localCheckpoint(eager=True)
    total = per_part.agg(F.sum("value").alias("total"))
    # Decimal literal, not 0.001 (a double): keeps the threshold product
    # in exact decimal arithmetic like the oracle's 0.001 * total, so a
    # part value landing near the 0.1% boundary classifies identically.
    frac = F.lit(decimal.Decimal("0.001"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value") > frac * F.col("total"))
        .select("l_partkey", F.col("value").cast("double").alias("value"))
    )


@demo_query(
    "q_tpch_q2",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS cost
      FROM lineitem GROUP BY 1, 2
    ),
    elig AS (
      SELECT c.l_partkey, c.cost, s.s_acctbal, s.s_name, n.n_name
      FROM cost c
      JOIN supplier s ON s.s_suppkey = c.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    min_c AS (SELECT l_partkey, MIN(cost) AS min_cost FROM elig GROUP BY 1)
    SELECT CAST(e.s_acctbal AS DOUBLE) AS s_acctbal, e.s_name, e.n_name,
           e.l_partkey AS p_partkey, CAST(e.cost AS DOUBLE) AS cost
    FROM elig e
    JOIN min_c m ON m.l_partkey = e.l_partkey AND e.cost = m.min_cost
    JOIN part p ON p.p_partkey = e.l_partkey
    WHERE p.p_size <= 15 AND p.p_type IN ('ECONOMY', 'SMALL')
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for each qualifying part,
    the supplier(s) in one region offering the minimum cost — the
    correlated-MIN-subquery pattern, decorrelated into a per-part
    aggregate rejoined on equality. Adapted: there is no partsupp table
    in the testdata, so supply cost derives from lineitem as
    MIN(l_extendedprice) per (part, supplier) — same shape, same
    correlated-min semantics (reference has no TPC-H either; this is
    the engine's standard-suite evidence).

    The MIN is over raw doubles (no arithmetic), so the cost = min_cost
    equality is engine-identical. Region/nation are fixed-size dims →
    broadcast; the per-(part,supplier) aggregate is the only data-sized
    shuffle and is keyed exactly like the downstream joins."""
    li = load_table(spark, sf_dir, "lineitem")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("cost")
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    # reused by the per-part min AND the final rejoin — materialize once
    # (same discipline as q_tpch_q11's per_part; without this, a session
    # without AQE exchange reuse recomputes the lineitem aggregate twice)
    elig = cost.join(supp, cost.l_suppkey == supp.s_suppkey).localCheckpoint(
        eager=True
    )
    min_c = elig.groupBy(F.col("l_partkey").alias("mp_partkey")).agg(
        F.min("cost").alias("min_cost")
    )
    parts = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 15) & F.col("p_type").isin("ECONOMY", "SMALL"))
        .select("p_partkey")
    )
    return (
        elig.join(min_c, elig.l_partkey == F.col("mp_partkey"))
        .filter(F.col("cost") == F.col("min_cost"))
        .join(parts, elig.l_partkey == F.col("p_partkey"))
        .select(
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            F.col("cost").cast("double").alias("cost"),
        )
    )


@demo_query(
    "q_tpch_q12",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
    GROUP BY l_returnflag
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode priority split): join orders into
    a date-bounded lineitem slice, then conditionally count urgent vs
    non-urgent order priorities per category — the CASE-inside-SUM
    pivot aggregation. Adapted: the testdata has no l_shipmode, so
    l_returnflag is the grouping dimension; the conditional-aggregation
    shape is identical.

    The date range reaches the lineitem scan as a pushed predicate; the
    join carries only (orderkey, priority) against the pruned slice and
    the CASE counts fold map-side."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@demo_query(
    "q_tpch_q16",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#13' AND p_size IN (1, 2, 3, 4, 5)
    GROUP BY 1, 2, 3
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (supplier-part relationship count): DISTINCT
    supplier count per part attribute group, with an exclusion predicate
    (<>) and an IN-list — both pushed to the part scan.

    countDistinct expands to a two-phase aggregate (partial distinct on
    (group, suppkey), then count) — Catalyst plans the expansion; the
    filtered part side is dimension-small so AQE broadcasts it into
    lineitem and only surviving lines reach the distinct."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13") & F.col("p_size").isin(1, 2, 3, 4, 5)
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        part.join(li, part.p_partkey == li.l_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@demo_query(
    "q_tpch_q20",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE '%bolt%'
        AND CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
      GROUP BY l_suppkey
      HAVING SUM(CAST(FLOOR(l_quantity) AS BIGINT)) > 50
    )
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (excess-inventory suppliers, adapted): IN against
    an aggregate-filtered subquery — suppliers who shipped more than a
    threshold volume of one product family in one year — as a LEFT SEMI
    join on the aggregated keys.

    The subquery side collapses to qualifying supplier keys before the
    semi join (keys-only shuffle); part prunes via the LIKE filter and
    the date range reaches the lineitem scan as pushed predicates."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%bolt%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01"))
    )
    qualifying = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        # floor() before the integer cast on BOTH engines: Spark's bare
        # double→bigint cast truncates while DuckDB's rounds half-even,
        # so the semantics are pinned rather than relying on integral
        # testdata quantities.
        .agg(F.sum(F.floor("l_quantity").cast("bigint")).alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    return supp.join(
        qualifying, supp.s_suppkey == qualifying.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


@demo_query(
    "q_tpch_q4",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE CAST(o_orderdate AS DATE) >= DATE '1996-07-01'
      AND CAST(o_orderdate AS DATE) <  DATE '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order-priority checking, adapted to this schema): one
    quarter's orders having at least one line shipped AFTER the order
    date (the testdata has no commit/receipt dates, so the lateness
    predicate correlates l_shipdate against o_orderdate), counted by
    priority.

    The correlated EXISTS compiles to a LEFT SEMI join whose condition
    carries the non-equi lateness predicate alongside the key equality
    — the probe side ships only (l_orderkey, l_shipdate), orders prune
    to the quarter at the scan (pushed date filter), and no row ever
    duplicates (EXISTS, not IN-join)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate").cast("date") < F.lit("1996-10-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@demo_query(
    "q_tpch_q13",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): LEFT OUTER join so customers
    with ZERO qualifying orders survive with c_count = 0, then a
    second aggregation histograms customers by order count.

    Skew note for 100 TB: the first aggregation keys on c_custkey
    (high cardinality, uniform — the shuffle spreads); the second keys
    on c_count (few dozen values) but its input is already one row per
    customer, partially aggregated map-side, so the skewed key carries
    counts, not rows. The orders-side predicate is pushed INTO the
    join (not a post-filter), preserving outer-join row preservation
    exactly as the SQL form does."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    per_cust = (
        customer.join(
            orders,
            (customer.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("bigint").alias("custdist")
    )


@demo_query(
    "q_tpch_q17",
    oracle="""
    SELECT CAST(
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
             / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < (
        SELECT 0.2 * AVG(l2.l_quantity)
        FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
      )
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): revenue lost to orders
    below 20% of each part's average quantity, for one brand.

    The correlated scalar-AVG subquery decorrelates into a per-part
    aggregate JOINED back to the same slice — and because the
    correlation key (l_partkey) is also the brand filter's join key,
    the average is computed over the brand's slice only (grouping by
    part makes the slice's per-part average identical to the whole
    table's): lineitem is semi-pruned by the bounded brand-part list
    (broadcast), scanned ONCE, and the per-part thresholds re-join a
    churn-free aggregate of ~1 row per part. Determinism: l_quantity
    is integral, so the double AVG is an exact sum/count on both
    engines; the revenue SUM is exact decimal cast to double once."""
    bp = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    brand_li = li.join(
        F.broadcast(bp), li.l_partkey == bp.p_partkey
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    thr = brand_li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("__thr")
    )
    return (
        brand_li.join(thr, "l_partkey")
        .where(F.col("l_quantity") < F.col("__thr"))
        .agg(
            (
                F.sum(money("l_extendedprice")).cast("double") / F.lit(7.0)
            )
            .cast("double")
            .alias("avg_yearly")
        )
    )


@demo_query(
    "q_tpch_q18",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(SUM(l.l_quantity) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 250
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
             o.o_totalprice
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total quantity
    exceeds a threshold, with their customer and the quantity itself.

    The IN-subquery over a grouped HAVING compiles to: aggregate
    lineitem ONCE by order key (map-side partials — l_orderkey is the
    natural clustering), filter the aggregate (keys-only survivor
    set), then LEFT SEMI join orders to the qualifying keys before the
    customer join, so the expensive joins see only the ~1% qualifying
    slice. The final per-order quantity REUSES the same aggregate via
    an equi-join instead of re-scanning lineitem (the classic Q18
    rewrite). Quantities are integral doubles — sums are exact on both
    engines."""
    li_agg = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
    )
    big = li_agg.filter(F.col("total_qty") > 250)
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )
