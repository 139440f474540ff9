"""Core relational analytics queries (SURVEY §2.A).

Each query is declared with the DataFrame API so Catalyst plans it:
filters and projections reach the parquet scan, dimension joins become
broadcast hash joins, and aggregates use map-side partial aggregation.
The paired DuckDB oracle uses the same decimal conventions
(``plans.numeric``) so values hash-match bit-for-bit.

Scale notes (100 TB):
- ``lineitem``/``orders`` are the unbounded fact tables — they are only
  ever shuffled on their join/group keys, never broadcast or collected.
- ``region/nation/supplier/part/customer`` are dimension-sided here and
  broadcast (explicitly hinted where the filter makes them small).
- Top-k queries sort only the aggregated (small) side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import read_table, read_tables
from .numeric import davg, dcount, dec, dsum
from .registry import query

# Revenue measure used throughout TPC-H-style queries; computed in
# exact decimal (see plans.numeric for why).
REVENUE_SQL = (
    "CAST(CAST(l_extendedprice AS DECIMAL(18,4))"
    " * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))"
)


def _revenue() -> F.Column:
    return (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).cast(
        "decimal(18,4)"
    )


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: single-pass multi-aggregate scan.

    Reference parity: the per-indicator summary aggregation pattern of
    dfx pipelines; plan-wise a pushdown filter + partial agg over the
    fact table (no shuffle until the 6-group combine).
    """
    lineitem = read_table(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(_revenue()).cast("double").alias("sum_disc_price"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            dcount("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS revenue,
           CAST(o_orderdate AS DATE) AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: filtered dim broadcast into two fact joins + top-k.

    The filtered ``customer`` side is broadcast so ``orders`` and
    ``lineitem`` join without a dim-side shuffle; the final sort runs on
    the aggregated (small) result only. Tie-break on l_orderkey makes
    the LIMIT deterministic.
    """
    customer, orders, lineitem = read_tables(
        spark, sf_dir, "customer", "orders", "lineitem"
    )
    cutoff = F.lit("1998-03-15").cast("timestamp")
    return (
        F.broadcast(customer.filter(F.col("c_mktsegment") == "BUILDING"))
        .join(orders.filter(F.col("o_orderdate") < cutoff), F.col("c_custkey") == F.col("o_custkey"))
        .join(
            lineitem.filter(F.col("l_shipdate") > cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.to_date("o_orderdate").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier",
    oracle=f"""
    SELECT n_name, CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style six-way star join.

    All dimension tables broadcast (region→nation→supplier chain
    collapses to one small broadcast side); the only shuffles are the
    fact-fact orders⋈lineitem on orderkey and the final 5-group agg.
    """
    customer, orders, lineitem, supplier, nation, region = read_tables(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    orders = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


@query(
    "q10_returned_item",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_item(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style returned-item ranking (join + agg + top-k)."""
    customer, orders, lineitem, nation = read_tables(
        spark, sf_dir, "customer", "orders", "lineitem", "nation"
    )
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q_top_suppliers",
    oracle=f"""
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier
    JOIN (
        SELECT l_suppkey, SUM({REVENUE_SQL}) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    ) r ON s_suppkey = l_suppkey
    WHERE total_revenue > 100000
    """,
)
def q_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style: aggregate subquery + HAVING-style filter + dim join."""
    supplier, lineitem = read_tables(spark, sf_dir, "supplier", "lineitem")
    revenue = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_revenue()).alias("total_revenue_dec"))
        .filter(F.col("total_revenue_dec") > 100000)
    )
    return (
        revenue.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue_dec").cast("double").alias("total_revenue"),
        )
    )


@query(
    "q_window_topk",
    oracle=f"""
    SELECT p_brand, p_partkey, part_revenue, brand_rank
    FROM (
        SELECT p_brand, p_partkey,
               CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS part_revenue,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY p_brand
                   ORDER BY CAST(SUM({REVENUE_SQL}) AS DOUBLE) DESC, p_partkey
               ) AS INTEGER) AS brand_rank
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand, p_partkey
    )
    WHERE brand_rank <= 3
    """,
)
def q_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by revenue within each brand (window rank).

    The window re-uses the groupBy output partitioning where possible;
    row_number with an explicit tie-break keeps results deterministic.
    """
    lineitem, part = read_tables(spark, sf_dir, "lineitem", "part")
    per_part = (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_partkey")
        .agg(F.sum(_revenue()).cast("double").alias("part_revenue"))
    )
    w = Window.partitionBy("p_brand").orderBy(
        F.col("part_revenue").desc(), F.col("p_partkey")
    )
    return (
        per_part.withColumn("brand_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("brand_rank") <= 3)
        .select("p_brand", "p_partkey", "part_revenue", "brand_rank")
    )


@query(
    "q_rollup",
    oracle="""
    SELECT r_name, n_name,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP aggregation over the geo dimension chain."""
    customer, nation, region = read_tables(spark, sf_dir, "customer", "nation", "region")
    return (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(dcount("n_customers"), dsum("c_acctbal", "total_acctbal"))
    )


@query(
    "q_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation across order status × priority."""
    orders = read_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        dcount("n_orders"), dsum("o_totalprice", "total_price")
    )


EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


@query(
    "q_pivot",
    oracle="""
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS click,
           CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS view,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS purchase,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS signup,
           CAST(SUM(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS error
    FROM events
    GROUP BY user_id
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot of event values per user.

    The pivot value list is fixed so the plan is static (no extra
    distinct-scan job) — required at scale where a runtime distinct on
    the fact table would be a full extra pass.
    """
    events = read_table(spark, sf_dir, "events")
    piv = (
        events.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.sum(dec("value")))
    )
    return piv.select(
        "user_id", *[F.col(t).cast("double").alias(t) for t in EVENT_TYPES]
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT measure,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
    FROM (
        SELECT 'l_quantity' AS measure, l_quantity AS value FROM lineitem
        UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        UNION ALL SELECT 'l_tax', l_tax FROM lineitem
    )
    GROUP BY measure
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt (reference: sipri_milex.py:118-121 wide-year melt)."""
    lineitem = read_table(spark, sf_dir, "lineitem")
    melted = lineitem.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    )
    return melted.groupBy("measure").agg(dcount("n"), dsum("value", "total"))


@query(
    "q_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_totalprice > 200000
    )
    """,
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join: customers having a large order (EXISTS)."""
    customer, orders = read_tables(spark, sf_dir, "customer", "orders")
    big = orders.filter(F.col("o_totalprice") > 200000)
    return customer.join(
        big, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "q_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (
        SELECT 1 FROM orders WHERE o_custkey = c_custkey
    )
    """,
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join: customers with no orders (NOT EXISTS)."""
    customer, orders = read_tables(spark, sf_dir, "customer", "orders")
    return customer.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "q_distinct_agg",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column COUNT(DISTINCT) (expand + two-phase agg)."""
    lineitem = read_table(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").cast("bigint").alias("n_parts"),
        F.count_distinct("l_suppkey").cast("bigint").alias("n_suppliers"),
        dcount("n_rows"),
    )


@query("q_approx_distinct")  # rows-only: HLL estimate is engine-specific
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog approximate distinct — the 100 TB path where exact
    distinct would shuffle every key."""
    lineitem = read_table(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02)
        .cast("bigint")
        .alias("approx_parts"),
        dcount("n_rows"),
    )


@query(
    "q_union_dedup",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 250000
    """,
)
def q_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION with dedup (hash-distinct after union)."""
    customer, orders = read_tables(spark, sf_dir, "customer", "orders")
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big = (
        orders.filter(F.col("o_totalprice") > 250000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return building.union(big).distinct()


@query(
    "q_orders_enriched",
    oracle="""
    SELECT r_name, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, o_orderpriority
    """,
)
def q_orders_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact enrichment through a broadcast dim chain, then aggregate.

    This is the observation-view pattern of the reference database
    (entities.py:98-132) applied to the order fact table.
    """
    orders, customer, nation, region = read_tables(
        spark, sf_dir, "orders", "customer", "nation", "region"
    )
    return (
        orders.join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "o_orderpriority")
        .agg(dcount("n_orders"), dsum("o_totalprice", "total_price"))
    )


@query(
    "q_correlated_scalar",
    oracle="""
    SELECT p_partkey, p_name, p_brand,
           CAST(p_retailprice AS DOUBLE) AS p_retailprice
    FROM part
    JOIN (
        SELECT p_brand AS b_brand,
               CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE)
                   / COUNT(p_retailprice) AS brand_avg
        FROM part GROUP BY p_brand
    ) ON p_brand = b_brand
    WHERE CAST(p_retailprice AS DOUBLE) > brand_avg
    """,
)
def q_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decorrelated scalar subquery: parts priced above their brand average.

    Written as an explicit aggregate-join (what Catalyst decorrelates a
    correlated subquery into); the per-brand aggregate side is tiny and
    broadcast.
    """
    part = read_table(spark, sf_dir, "part")
    brand_avg = part.groupBy(F.col("p_brand").alias("b_brand")).agg(
        davg("p_retailprice", "brand_avg")
    )
    return (
        part.join(F.broadcast(brand_avg), F.col("p_brand") == F.col("b_brand"))
        .filter(F.col("p_retailprice").cast("double") > F.col("brand_avg"))
        .select(
            "p_partkey",
            "p_name",
            "p_brand",
            F.col("p_retailprice").cast("double").alias("p_retailprice"),
        )
    )


@query(
    "q_events_daily",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
)
def q_events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed event aggregation (daily tumbling buckets, batch)."""
    events = read_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
            "event_type",
        )
        .agg(
            dcount("n_events"),
            dsum("value", "total_value"),
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
        )
    )


@query(
    "q_events_sessionize",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_id,
               CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                    OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, event_id,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS session_id
        FROM flagged
    )
    SELECT user_id,
           CAST(MAX(session_id) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id
    """,
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization (30-min inactivity gap).

    One shuffle on user_id serves both window passes and the final
    aggregate — the canonical scalable sessionization plan, and since
    round 11 runtime-adaptive end to end (``_sessionized``): above the
    probed threshold the gap detection rides ``grouped_lag`` and the
    session-id cumsum rides ``grouped_running_sum``, so a single hot
    user's stream never becomes one window task's sort. (The
    streaming twin is ``stream_events_windowed`` with session
    windows.)
    """
    events = read_table(spark, sf_dir, "events")
    sessions = _sessionized(events)
    return sessions.groupBy("user_id").agg(
        F.max("session_id").cast("bigint").alias("n_sessions"),
        dcount("n_events"),
    )


def _sessionized(events: DataFrame, window_max_rows: int = 2_000_000) -> DataFrame:
    """Per-row session ids, runtime-adaptive on BOTH windows: the
    gap-detection lag and the flag cumsum each route through the
    windows-at-scale primitives (``grouped_lag`` /
    ``grouped_running_sum``) above ``window_max_rows`` — a plain
    two-window plan below it. The frame feeds both passes, so it is
    counted once. Both paths pytest-pinned bit-identical including a
    hot-user shape (tests/test_round11b_ops.py)."""
    from ..operators.scale import fast_row_count, grouped_lag, grouped_running_sum

    n_rows = fast_row_count(events)
    # Interval arithmetic is timestamp-type-agnostic (works on both
    # TIMESTAMP and TIMESTAMP_NTZ), unlike a long cast — the physical
    # type of the source files must never decide whether this plan
    # analyzes (it broke once when the testdata regenerated as NTZ).
    gap = F.expr("INTERVAL 30 MINUTES")
    if n_rows <= window_max_rows:
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        flagged = events.withColumn(
            "new_session",
            F.when(F.col("ts") - F.lag("ts").over(w) > gap, 1)
            .when(F.lag("ts").over(w).isNull(), 1)
            .otherwise(0),
        )
        w_cum = (
            Window.partitionBy("user_id")
            .orderBy("event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return flagged.withColumn(
            "session_id", F.sum("new_session").over(w_cum)
        )
    lagged = grouped_lag(
        events,
        ["user_id"],
        "ts",
        [F.col("ts"), F.col("event_id")],
        "__prev_ts",
        n_rows=n_rows,
        small_rows_threshold=window_max_rows,
    )
    flagged = lagged.withColumn(
        "new_session",
        F.when(F.col("ts") - F.col("__prev_ts") > gap, 1)
        .when(F.col("__prev_ts").isNull(), 1)
        .otherwise(0),
    ).drop("__prev_ts")
    return grouped_running_sum(
        flagged,
        ["user_id"],
        "new_session",
        [F.col("event_id")],
        "session_id",
        n_rows=n_rows,
        small_rows_threshold=window_max_rows,
    )


def _asof_last_click(events: DataFrame, window_max_rows: int = 2_000_000) -> DataFrame:
    """The q_asof_join tagging stage, runtime-adaptive on its per-user
    window: the prior-click running MAX rides
    ``operators.scale.grouped_running_carry`` — a plain partitioned
    window while the frame is window-sized, the range-partition monoid
    offsets algebra above ``window_max_rows``, so one HOT user's event
    stream (a bot hammering one user_id) never becomes one task's
    sort. Both paths pytest-pinned bit-identical
    (tests/test_round11b_ops.py)."""
    from ..operators.scale import grouped_running_carry

    both = events.filter(
        F.col("event_type").isin("click", "purchase")
    ).withColumn(
        "__click_ts",
        F.when(F.col("event_type") == "click", F.col("ts")),
    )
    return grouped_running_carry(
        both,
        ["user_id"],
        "__click_ts",
        [F.col("ts"), F.col("event_id")],
        "last_click_ts",
        kind="max",
        frame_end=-1,
        small_rows_threshold=window_max_rows,
    ).drop("__click_ts")


@query(
    "q_asof_join",
    oracle="""
    WITH tagged AS (
        SELECT user_id, event_id, ts, event_type,
               MAX(CASE WHEN event_type = 'click' THEN ts END) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS last_click_ts
        FROM events WHERE event_type IN ('click', 'purchase')
    )
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           strftime(last_click_ts, '%Y-%m-%d %H:%M:%S') AS last_click_ts
    FROM tagged WHERE event_type = 'purchase'
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest prior click for each purchase, per user.

    Implemented as the scalable union-sort pattern: one shuffle on the
    entity key, a running MAX over the time-ordered stream, then filter
    to the probe side — no per-row range join, no O(n²) blow-up. The
    running max is runtime-adaptive (``_asof_last_click``): above the
    probed threshold it switches to the boundary-offsets algebra so a
    hot user never funnels through one window task.
    """
    events = read_table(spark, sf_dir, "events")
    tagged = _asof_last_click(events)
    return tagged.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.date_format("last_click_ts", "yyyy-MM-dd HH:mm:ss").alias("last_click_ts"),
    )


@query(
    "q_percentile",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.9), 6) AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type
    """,
)
def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group percentiles (continuous interpolation).

    ``percentile`` is exact (sort-based within groups) and matches
    DuckDB's ``quantile_cont`` bit-for-bit after rounding; the
    RUNTIME-ADAPTIVE ``_event_percentiles`` picker keeps that single
    aggregate while the fact is provably small and swaps to
    ``operators.scale.histogram_percentiles`` — the same values
    BIT-IDENTICALLY from a distributed (group, value) histogram with
    O(1) task state — above the threshold. (``percentile_approx``
    remains the registered sketch twin, ``q_approx_percentile``.)
    """
    events = read_table(spark, sf_dir, "events")
    return _event_percentiles(events)


# Above this fact row count the ``F.percentile`` agg state (a
# per-group value→count map concentrated in ONE task) is an OOM risk;
# the distributed histogram produces bit-identical percentiles at any
# group size (the q_winsorize swap, applied to the original exact-
# percentile key).
PERCENTILE_EXACT_MAX_ROWS = 2_000_000  # measured crossover ~1M rows (SCALE.md §adaptive-crossover)

_PERCENTILE_PROBS = (("p50", 0.5), ("p90", 0.9), ("p99", 0.99))


def _event_percentiles(
    events: DataFrame, exact_max_rows: int = PERCENTILE_EXACT_MAX_ROWS
) -> DataFrame:
    """Runtime-adaptive per-event-type percentile report. Both paths
    are pinned identical in tests/test_round10_ops.py; the large
    path's plan is asserted free of exact-percentile aggregates."""
    from ..operators.scale import fast_row_count, histogram_percentiles

    if fast_row_count(events) <= exact_max_rows:
        return events.groupBy("event_type").agg(
            *[
                F.round(F.percentile("value", q), 6).alias(name)
                for name, q in _PERCENTILE_PROBS
            ]
        )
    # F.percentile ignores NULL measures but keeps the group; mirror
    # that by building the histogram on non-null rows and re-attaching
    # all-null groups via the (tiny, combinable) distinct-group frame.
    groups = events.select("event_type").distinct()
    pct = histogram_percentiles(
        events.filter(F.col("value").isNotNull()),
        ["event_type"],
        "value",
        dict((name, q) for name, q in _PERCENTILE_PROBS),
    )
    return groups.join(pct, "event_type", "left").select(
        "event_type",
        *[F.round(name, 6).alias(name) for name, _ in _PERCENTILE_PROBS],
    )


@query("q_hll_sketch")  # rows-only: sketch binary is engine-specific
def q_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable cardinality sketches (Apache DataSketches HLL).

    Unlike ``approx_count_distinct`` (a scalar), ``hll_sketch_agg``
    materializes a *mergeable* sketch: per-partition/day sketches can
    be stored and unioned later without re-reading the data — the
    incremental-cardinality pattern for 100 TB pipelines. Estimates
    are checked against exact counts in the test suite (±5%).
    """
    events = read_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sketch"))
    return (
        daily.groupBy("event_type")
        .agg(F.hll_union_agg("sketch").alias("merged"))
        .select(
            "event_type",
            F.hll_sketch_estimate("merged").cast("bigint").alias("approx_users"),
        )
    )


@query(
    "q_skew_salted_agg",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total,
           CAST(MIN(value) AS DOUBLE) AS min_value,
           CAST(MAX(value) AS DOUBLE) AS max_value
    FROM events GROUP BY event_type
    """,
)
def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation over a skewed key (5 event types ×
    ~150k rows each: every key is 'hot' relative to reducer count).

    The oracle is the PLAIN group-by — salting must be semantically
    invisible; only the shuffle distribution changes.
    """
    from ..operators.scale import salted_agg

    events = read_table(spark, sf_dir, "events").withColumn(
        "value_dec", F.col("value").cast("decimal(18,4)")
    )
    out = salted_agg(
        events,
        keys=["event_type"],
        aggs={
            "n": ("count", "value"),
            "total_dec": ("sum", "value_dec"),
            "min_value": ("min", "value"),
            "max_value": ("max", "value"),
        },
        salt_buckets=16,
        salt_on="event_id",
    )
    return out.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.col("total_dec").cast("double").alias("total"),
        "min_value",
        "max_value",
    )


@query(
    "q_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind rollup/cube):
    detail, per-status subtotal, and grand total in one pass. Spark
    plans this as a single Expand + aggregate — the fact table is
    scanned once, not once per set."""
    orders = read_table(spark, sf_dir, "orders")
    return orders.groupingSets(
        [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(dcount("n_orders"), dsum("o_totalprice", "total_price"))


@query(
    "q_range_join",
    oracle="""
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           COUNT(*) AS n_pairs
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 1 HOUR
    GROUP BY 1, 2
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) self-join: co-occurring event pairs within one
    hour per user. The user_id equality makes this a partitioned
    equi-join with a range residual — each user's events meet on one
    reducer, so there is no O(n²) cross product at scale; skewed users
    would use the operators.scale salting path."""
    events = read_table(spark, sf_dir, "events")
    a, b = events.alias("a"), events.alias("b")
    within_hour = (
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 1 HOUR"))
    )
    return (
        a.join(b, within_hour)
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(dcount("n_pairs"))
    )


@query(
    "q_window_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_sum,
           CAST(COUNT(*) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_window
    FROM events
    """,
)
def q_window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window frame (ROWS BETWEEN): 4-event rolling sum per
    user in event-time order. Frame aggregation is computed within the
    user partition after one shuffle — no self-join, no re-sort beyond
    the partition-local ordering."""
    events = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        F.sum(dec("value")).over(w).cast("double").alias("rolling_sum"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_window"),
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style: order-count distribution over customers.

    Left-outer join (customers with zero orders must survive as
    c_count = 0) followed by a two-level aggregation. The second
    aggregate's input is one row per customer, and the histogram
    output is tiny — the only full-size shuffle is the first groupBy.
    """
    customer, orders = read_tables(spark, sf_dir, "customer", "orders")
    per_cust = (
        customer.join(
            orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(dcount("custdist"))


@query(
    "q18_large_orders",
    oracle="""
    SELECT c_name, o_orderkey,
           CAST(o_orderdate AS DATE) AS orderdate,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 300
    )
    GROUP BY c_name, o_orderkey, o_orderdate
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style: orders whose total quantity exceeds a threshold.

    The HAVING subquery becomes an aggregate + left-semi join: lineitem
    pre-aggregates per order (map-side combinable), the small surviving
    key set semi-joins the fact, and customer broadcasts into the
    result. No correlated execution — one extra agg pass instead.
    """
    customer, orders, lineitem = read_tables(
        spark, sf_dir, "customer", "orders", "lineitem"
    )
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("__q"))
        .filter(F.col("__q") > 300)
        .select("l_orderkey")
    )
    return (
        orders.join(big, F.col("o_orderkey") == big["l_orderkey"], "left_semi")
        .join(F.broadcast(customer), F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("o_orderkey") == lineitem["l_orderkey"])
        .groupBy("c_name", "o_orderkey", "o_orderdate")
        .agg(dsum("l_quantity", "total_qty"))
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "total_qty",
        )
    )


@query(
    "q7_bilateral_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, yr,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               EXTRACT(year FROM l_shipdate) AS yr,
               {REVENUE_SQL} AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    ) GROUP BY supp_nation, cust_nation, yr
    """,
)
def q7_bilateral_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style: trade volume between two nations by year
    (testdata nation names NATION_1/NATION_2 stand in for the spec's
    FRANCE/GERMANY pair).

    Both nation filters broadcast into their dimension sides
    (supplier→n1, customer→n2) so the fact tables are pre-pruned
    before the orders⋈lineitem shuffle — the pair predicate never
    runs on the joined fact."""
    supplier, lineitem, orders, customer, nation = read_tables(
        spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation"
    )
    pair = nation.filter(F.col("n_name").isin("NATION_1", "NATION_2"))
    supp = F.broadcast(
        supplier.join(pair, F.col("s_nationkey") == F.col("n_nationkey")).select(
            "s_suppkey", F.col("n_name").alias("supp_nation")
        )
    )
    cust = F.broadcast(
        customer.join(pair, F.col("c_nationkey") == F.col("n_nationkey")).select(
            "c_custkey", F.col("n_name").alias("cust_nation")
        )
    )
    return (
        lineitem.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("yr"),
        )
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


@query(
    "q22_idle_customers",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_custs,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
    FROM customer
    WHERE c_acctbal > (
        SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0
    )
    AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
    GROUP BY c_mktsegment
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style: well-funded customers with no urgent orders.

    The scalar subquery (global average balance) computes once and
    joins in as a broadcast literal-free cross of a 1-row frame; the
    NOT EXISTS becomes a left-anti join against the orders keys.
    """
    customer, orders = read_tables(spark, sf_dir, "customer", "orders")
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__avg_bal")
    )
    return (
        customer.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(
            orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(dcount("n_custs"), dsum("c_acctbal", "total_bal"))
    )
