"""Joins, sorts, set ops, and window functions (SURVEY.md §2.4–§2.7).

The reference's only joins are FULL OUTER equi-joins on (store_id, dt)
with USING-style key coalescing (fct_daily_store_metrics.sql:30-32); the
inner join, top-k, union, and window queries are the mandated extension
surface (§2.4 note, §2.5, §2.7). Spark's list-of-names join form
reproduces SQL USING key coalescing exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.money import money
from .registry import demo_query


def daily_order_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(customer, day) order metrics — the erp_orders aggregation twin
    (reference fct_daily_store_metrics.sql:7-9). Revenue stays decimal
    until the caller casts, so downstream sums remain exact."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.col("o_custkey").alias("cust_id"),
            F.col("o_orderdate").cast("date").alias("dt"),
            money("o_totalprice").alias("price"),
        )
        .groupBy("cust_id", "dt")
        .agg(
            F.sum("price").alias("revenue_dec"),
            F.count(F.lit(1)).alias("order_count"),
        )
    )


def daily_event_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(user, day) event metrics — the web_events sessions twin
    (reference fct_daily_store_metrics.sql:16-19) with the filtered
    purchase count (crm 'converted' twin, :11-14)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.col("user_id").alias("cust_id"),
            F.col("ts").cast("date").alias("dt"),
            "event_type",
        )
        .groupBy("cust_id", "dt")
        .agg(
            F.count_if(F.col("event_type") == "purchase").alias("purchases"),
            F.count(F.lit(1)).alias("sessions"),
        )
    )


@demo_query(
    "q_join_full_outer",
    oracle="""
    WITH o AS (
      SELECT o_custkey AS cust_id, CAST(o_orderdate AS DATE) AS dt,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
             CAST(COUNT(*) AS BIGINT) AS order_count
      FROM orders GROUP BY 1, 2
    ), e AS (
      SELECT user_id AS cust_id, CAST(ts AS DATE) AS dt,
             CAST(COUNT(*) AS BIGINT) AS sessions
      FROM events GROUP BY 1, 2
    )
    SELECT COALESCE(o.cust_id, e.cust_id) AS cust_id,
           COALESCE(o.dt, e.dt) AS dt,
           COALESCE(o.revenue, 0) AS revenue,
           COALESCE(o.order_count, 0) AS order_count,
           COALESCE(e.sessions, 0) AS sessions
    FROM o FULL OUTER JOIN e ON o.cust_id = e.cust_id AND o.dt = e.dt
    """,
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: FULL OUTER equi-join on composite key with USING coalescing +
    P7/P8 null defaulting (reference fct_daily_store_metrics.sql:24-31).

    Both sides are pre-aggregated on the join key, so the shuffle for the
    aggregation is reused for the join (same hash partitioning) — at scale
    this is one shuffle per side, not two.
    """
    o = daily_order_metrics(spark, sf_dir).select(
        "cust_id", "dt", F.col("revenue_dec").cast("double").alias("revenue"), "order_count"
    )
    e = daily_event_metrics(spark, sf_dir).select("cust_id", "dt", "sessions")
    return o.join(e, ["cust_id", "dt"], "full_outer").na.fill(
        0, ["revenue", "order_count", "sessions"]
    )


@demo_query(
    "q_join_inner",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           CAST(o_orderdate AS DATE) AS order_dt,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND CAST(o_orderdate AS DATE) < DATE '1996-03-15'
      AND CAST(l_shipdate AS DATE) > DATE '1996-03-15'
    GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension inner equi-join chain, TPC-H Q3 shape (SURVEY.md §2.4:
    fact↔dimension join is the mandated extension beyond the reference's
    outer joins).

    customer scales with SF, so no forced broadcast — AQE promotes the
    filtered segment slice to broadcast when it fits and shuffle-joins
    at 100 TB; lineitem⋈orders is the real shuffle either way. Filters
    sit below the join so parquet gets them pushed down. Deterministic
    top-k: exact-decimal revenue + orderkey tie-break.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("date") < F.lit("1996-03-15")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date") > F.lit("1996-03-15")
    )
    disc_price = money("l_extendedprice") * money(F.lit(1) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("order_dt"),
            "o_orderpriority",
        )
        .agg(F.sum(disc_price).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "order_dt", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@demo_query(
    "q_sort_topk",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal, c_mktsegment
    FROM customer
    ORDER BY c_acctbal DESC, c_custkey
    LIMIT 25
    """,
)
def q_sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 multi-column sort (reference local_runner.py:155) + extension
    LIMIT top-k (SURVEY.md §2.5). Spark executes orderBy+limit as a
    TakeOrderedAndProject — per-partition top-k then driver merge, no full
    sort — exactly what you want at scale."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select("c_custkey", "c_name", "c_acctbal", "c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    ).limit(25)


@demo_query(
    "q_topk_per_group",
    oracle="""
    SELECT p_brand, p_partkey, p_name, p_retailprice
    FROM part
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (the guide's canonical window pattern): 3 priciest
    parts per brand via row_number — one shuffle on the group key, no
    global sort. Deterministic tie-break on the key."""
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        part.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_name", "p_retailprice")
    )


@demo_query(
    "q_union",
    oracle="""
    SELECT c_custkey AS cust_id FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT o_custkey AS cust_id FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 set op (extension — explicitly absent from the reference):
    unionByName + distinct == SQL UNION."""
    a = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("cust_id"))
    )
    b = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("cust_id"))
    )
    return a.unionByName(b).distinct()


@demo_query(
    "q_intersect",
    oracle="""
    SELECT c_custkey AS cust_id FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 INTERSECT: building-segment customers who placed urgent
    orders. Catalyst plans this as a left-semi join over distinct sets."""
    a = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("cust_id"))
    )
    b = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("cust_id"))
    )
    return a.intersect(b)


@demo_query(
    "q_except",
    oracle="""
    SELECT c_custkey AS cust_id FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 EXCEPT: building-segment customers with no urgent orders
    (set difference ≡ distinct + left-anti join)."""
    a = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("cust_id"))
    )
    b = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("cust_id"))
    )
    return a.exceptAll(b).distinct()


@demo_query(
    "q_scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS total_price
    FROM orders
    WHERE CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) >
          (SELECT 1.5 * CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                 / COUNT(*)
           FROM orders)
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery comparison: orders above 1.5x the average price
    (max/avg ≈ 2.0 in the testdata, so 2x would select ~nothing).
    The aggregate is a one-row broadcast cross join — the DataFrame
    equivalent of an uncorrelated scalar subquery. The threshold is
    2·(exact decimal sum as double)/count — NOT AVG(decimal), whose
    result scale is engine-specific — so the comparison boundary is
    bit-identical in both engines."""
    orders = load_table(spark, sf_dir, "orders")
    avg_price = orders.agg(
        (
            F.lit(1.5)
            * F.sum(money("o_totalprice")).cast("double")
            / F.count(F.lit(1))
        ).alias("threshold")
    )
    return (
        orders.crossJoin(F.broadcast(avg_price))
        .filter(money("o_totalprice").cast("double") > F.col("threshold"))
        .select(
            "o_orderkey",
            "o_custkey",
            money("o_totalprice").cast("double").alias("total_price"),
        )
    )


@demo_query(
    "q_monthly_trunc",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY 1
    """,
)
def q_monthly_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar rollup via date_trunc: monthly revenue — the standard
    time-dimension aggregation (partition-pruning key at scale)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("month")
        )
        .agg(
            F.sum(money("o_totalprice")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@demo_query(
    "q_window_rank",
    oracle="""
    SELECT user_id, event_id, event_type, CAST(ts AS DATE) AS dt
    FROM events
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 window extension: dedup-keep-latest via row_number (SURVEY.md
    §2.7 — makes the reference's implicit last-write-wins merge a
    first-class query). Deterministic tie-break on event_id."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", F.col("ts").cast("date").alias("dt"))
    )


@demo_query(
    "q_window_rolling",
    oracle="""
    WITH daily AS (
      SELECT o_custkey AS cust_id, CAST(o_orderdate AS DATE) AS dt,
             SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS day_rev
      FROM orders GROUP BY 1, 2
    )
    SELECT cust_id, dt,
           CAST(SUM(day_rev) OVER (
               PARTITION BY cust_id ORDER BY dt
               RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rev_7d,
           CAST(day_rev AS DOUBLE) AS day_rev
    FROM daily
    """,
)
def q_window_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 window extension: the reference's 7-day incremental horizon
    (fct_daily_store_metrics.sql:34-36, README.md:84) as a first-class
    rolling window — 7-day revenue per customer via rangeBetween over
    day numbers. Decimal sums keep the window exact."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("cust_id"),
            F.col("o_orderdate").cast("date").alias("dt"),
            money("o_totalprice").alias("price"),
        )
        .groupBy("cust_id", "dt")
        .agg(F.sum("price").alias("day_rev"))
    )
    w = (
        Window.partitionBy("cust_id")
        .orderBy(F.datediff(F.col("dt"), F.lit("1970-01-01")))
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "cust_id",
        "dt",
        F.sum("day_rev").over(w).cast("double").alias("rev_7d"),
        F.col("day_rev").cast("double").alias("day_rev"),
    )


@demo_query(
    "q_nullsafe_join",
    oracle="""
    WITH a AS (
      SELECT n_nationkey AS k1, nullif(n_regionkey, 1) AS r1 FROM nation
    ), b AS (
      SELECT n_nationkey AS k2, nullif(n_regionkey, 1) AS r2 FROM nation
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(*) FILTER (WHERE r1 IS NULL) AS BIGINT) AS null_pairs
    FROM a JOIN b ON r1 IS NOT DISTINCT FROM r2 AND k1 < k2
    """,
)
def q_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` ≡ IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — the semantics needed when a
    'not yet assigned' bucket must still co-group. Spark plans `<=>` as
    an ordinary equi-join key (hash on a null-aware wrapper), so the
    strategy/shuffle story is identical to `=`."""
    nation = load_table(spark, sf_dir, "nation")
    r = F.nullif(F.col("n_regionkey"), F.lit(1))
    a = nation.select(F.col("n_nationkey").alias("k1"), r.alias("r1"))
    b = nation.select(F.col("n_nationkey").alias("k2"), r.alias("r2"))
    joined = a.join(
        b, F.col("r1").eqNullSafe(F.col("r2")) & (F.col("k1") < F.col("k2"))
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.count_if(F.col("r1").isNull()).alias("null_pairs"),
    )


@demo_query(
    "q_bucketed_join",
    # the oracle recomputes the same result straight from the parquet
    # sources, so any corruption in the bucketed write/read/join path
    # fails the hash — same content-parity discipline as q_scan_orc
    oracle="""
    WITH per_o AS (
      SELECT o.o_orderkey,
             COUNT(l.l_orderkey) AS n_lines,
             SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS rev
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
      GROUP BY o.o_orderkey
    )
    SELECT CAST(n_lines AS INT) AS n_lines,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(rev) AS DOUBLE) AS revenue
    FROM per_o GROUP BY n_lines
    """,
)
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located fact-to-fact join via bucketing (the §2.1/S6 scale
    technique as a QUERY): both sides are written ``bucketBy`` the join
    key, so the join AND the per-key aggregation read bucket-aligned
    files with no data-sized exchange — at 100 TB this is how the big
    fact↔fact joins drop their shuffles entirely (bucket count sized to
    cluster parallelism at ingest, amortized over every later join).
    The plan guard (tests/test_plans.py) pins the zero-exchange shape;
    only the final few-row histogram aggregate exchanges."""
    import os
    import zlib

    from ..functions.scratch import scratch_dir
    from ..sources.writers import write_bucketed

    orders_f = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", money("l_extendedprice").alias("rev")
    )
    # table names carry an sf_dir fingerprint: the catalog entry is
    # session-global, so a fixed name would let a later call with a
    # different sf_dir clobber the tables under an earlier (lazy)
    # DataFrame that still references them
    tag = zlib.crc32(sf_dir.encode()) & 0xFFFFFFFF
    t_orders = f"q_bucketed_orders_{tag:08x}"
    t_lineitem = f"q_bucketed_lineitem_{tag:08x}"
    base = scratch_dir(f"spark_graft_bucketed_join_{tag:08x}")
    write_bucketed(orders_f, t_orders, 8, ["o_orderkey"],
                   os.path.join(base, "orders"))
    write_bucketed(li, t_lineitem, 8, ["l_orderkey"],
                   os.path.join(base, "lineitem"))
    bo = spark.table(t_orders)
    bl = spark.table(t_lineitem)
    per_o = (
        bo.join(bl, bo.o_orderkey == bl.l_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("rev").alias("rev"),
        )
    )
    return per_o.groupBy(F.col("n_lines").cast("int").alias("n_lines")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("rev").cast("double").alias("revenue"),
    )


_SALT_FANOUT = 8

_SKEW_JOIN_ORACLE = """
    SELECT s_nationkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
             AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey
"""


@demo_query("q_skew_salted_join", oracle=_SKEW_JOIN_ORACLE)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted shuffle join: the fact side's join key is salted into
    ``key × _SALT_FANOUT`` sub-keys and the dimension side is replicated
    once per salt, so a hot supplier's rows land on _SALT_FANOUT
    reducers instead of one.

    This is the manual pattern for when AQE's skew-join splitting can't
    help: the dimension is too big to broadcast at the target scale and
    the skew lives in the JOIN itself (e.g. streaming microbatches or a
    non-AQE engine). The ``shuffle_hash`` hint pins the shuffle-join
    shape the pattern exists for — with a broadcast the salt would be
    dead weight (that regime is q_join_inner's). Replication cost is
    |dim| × fanout rows of KEYS ONLY payload (here 2 columns), traded
    against the hot key's single-reducer wall-clock. Decimal sums make
    the salted two-phase result bit-identical to the unsalted oracle
    join. Companion: q_salted_agg (aggregation-side skew), AQE skew
    handling (tests/test_plans.py)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    salted_li = li.withColumn(
        "_salt",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(_SALT_FANOUT)).cast(
            "int"
        ),
    )
    replicated = supp.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(_SALT_FANOUT)]))
    )
    # The shuffle_hash hint goes on the REPLICATED DIMENSION so Spark
    # builds the hash table from the |dim|×fanout side, never from a
    # fact partition — at 100 TB the fact side must stream, not build.
    joined = salted_li.join(
        replicated.hint("shuffle_hash"),
        (salted_li.l_suppkey == replicated.s_suppkey)
        & (salted_li._salt == replicated._salt),
    )
    return joined.groupBy("s_nationkey").agg(
        F.sum(money("l_extendedprice")).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# bloom-filter pruned semi join — the compact-filter pushdown pattern
# ---------------------------------------------------------------------------

# the split-block primitive is shared with the per-file bloom
# data-skipping sidecars (plans/versioned.py) — see functions/bloom.py
from ..functions.bloom import (  # noqa: E402
    bloom_block_and_mask as _bloom_block_and_mask,
)


def build_bloom_blocks(
    keys_df: DataFrame, key_col: str, bits_per_key: int = 16
) -> tuple[DataFrame, int]:
    """Build a split-block Bloom filter over ``keys_df[key_col]`` as a
    DATAFRAME of (block, bits) — nblocks ≈ bits_per_key·n/64 rows, 12 B
    each, built by one map-side-combining ``bit_or`` aggregate. Nothing
    is ever collected to the driver; the filter is consumed by
    broadcast-joining it (``bloom_prune``).

    Why not a literal bitmap in the probe expression: Catalyst
    evaluates an array literal by CONSTRUCTING it per row (measured
    7.8 s/600 k rows for 8 k words), and a one-row broadcast side
    copies the whole array into every joined UnsafeRow. A blocks TABLE
    joined on block index ships exactly one long per probe row.

    Why this beats broadcasting the raw key set at 100 TB: the filter
    is ~4 B/key as (block, bits) rows regardless of key width (a 100 B URL key compresses
    ~25×), so build sides far past the broadcast threshold still fit,
    and the probe side shrinks by ~500× (measured FP 0.3%, design
    bound ≈1e-3 at 16 bits/key × 6 bits/block) BEFORE any shuffle —
    this is ``spark.sql.optimizer.runtime.bloomFilter.*``'s shape made
    explicit, deterministic, and reusable across probe scans."""
    n = max(keys_df.count(), 1)
    nblocks = 1 << max((n * bits_per_key // 64).bit_length(), 4)
    key = F.col(key_col)
    block, mask = _bloom_block_and_mask(key, nblocks)
    blocks = (
        keys_df.where(key.isNotNull())
        .select(block.alias("__bb_block"), mask.alias("__bb_mask"))
        .groupBy("__bb_block")
        .agg(F.bit_or("__bb_mask").alias("__bb_bits"))
    )
    return blocks, nblocks


def bloom_prune(
    df: DataFrame, col: str, blocks: DataFrame, nblocks: int
) -> DataFrame:
    """Keep only rows whose ``col`` MIGHT be in the Bloom filter — no
    false negatives, so an exact semi join downstream sees every true
    match; NULL keys are dropped (semi-join semantics — enforced here,
    not left to the hash: xxhash64(NULL) is a seed-derived constant, so
    an unfiltered NULL key would otherwise get a deterministic
    (block, mask) and could pass membership). One broadcast hash join
    on the block index (empty blocks reject by the join itself), then
    a bit-mask test — all JVM built-ins."""
    df = df.where(F.col(col).isNotNull())
    key = F.col(col)
    block, mask = _bloom_block_and_mask(key, nblocks)
    probe = df.withColumn("__bb_block", block).withColumn(
        "__bb_mask", mask
    )
    return (
        probe.join(F.broadcast(blocks), "__bb_block")
        .where(
            F.col("__bb_bits").bitwiseAND(F.col("__bb_mask"))
            == F.col("__bb_mask")
        )
        .drop("__bb_block", "__bb_mask", "__bb_bits")
    )


BLOOM_JOIN_ORACLE = """
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
             AS revenue
    FROM lineitem
    WHERE l_orderkey IN (
      SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    GROUP BY l_returnflag
"""


@demo_query("q_bloom_join", oracle=BLOOM_JOIN_ORACLE)
def q_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned exact semi join: the urgent-order key set builds a
    split-block Bloom filter (build_bloom_blocks), the lineitem scan
    is pre-filtered by it (bloom_prune), and a broadcast semi join
    against the true key set removes the ~0.3% false positives — the
    result is EXACT (the oracle is the plain IN-subquery). At 100 TB
    the win is shuffle volume: the probe side shrinks by the filter's
    selectivity before any exchange, and the filter costs one tiny
    aggregate over the build side (~4 B/key, so it stays
    broadcast-able long after the raw key set would not)."""
    orders = load_table(spark, sf_dir, "orders")
    keys = orders.where(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey")
    blocks, nblocks = build_bloom_blocks(keys, "o_orderkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", money("l_extendedprice").alias("px")
    )
    pruned = bloom_prune(li, "l_orderkey", blocks, nblocks)
    exact = pruned.join(
        F.broadcast(keys),
        pruned["l_orderkey"] == keys["o_orderkey"],
        "left_semi",
    )
    return exact.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("px").cast("double").alias("revenue"),
    )
