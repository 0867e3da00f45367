"""Breadth operator surface over the driver's star schema (SURVEY.md §7
Phase 3): joins (broadcast/shuffle/semi/anti/outer), distinct, rollup/cube/
grouping sets, window functions, top-k, set operations, subqueries, and the
scalar-function families (string/date/math/JSON/conditional).

The reference itself needs none of these (its analytics run on one
denormalized table — SURVEY §2.3), but a user switching engines gets the
full relational surface, and the driver's correctness gate exercises it
against DuckDB. Every query aliases computed columns identically to its
oracle and casts to stable types (bigint/double) so hashes align.

Scale notes per query are inline: broadcast hints on dimension tables,
single-shuffle aggregations, rank-pushdown windows. Double-valued
aggregates are rounded (2 dp) on both sides — floating summation order
differs between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table, register_views


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- filters / arithmetic / single-row aggregate --------------------------

def q5_tpch_q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: range predicates + arithmetic, one-row result.
    All predicates push down to the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 25)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
            .alias("revenue")
        )
    )


def q6_tpch_q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1: the classic wide aggregate — partial+final hash agg over a
    pruned scan; the canonical 100-TB scan-heavy benchmark query."""
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "2001-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- joins ----------------------------------------------------------------

def q7_join_broadcast_dim(spark, sf_dir):
    """Fact⋈dim with an explicit broadcast hint — no shuffle of orders at
    any scale (customer is the small side; at 100 TB it still broadcasts
    after projection to 2 columns)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
        )
        .orderBy("c_mktsegment")
    )


def q8_join_multiway_revenue_by_nation(spark, sf_dir):
    """lineitem ⋈ supplier ⋈ nation ⋈ region chain (TPC-H Q5 shape): one
    shuffle join on the fact, broadcast the dim chain."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dims = F.broadcast(
        sup.join(nat, sup.s_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "n_name")
    )
    return (
        li.join(dims, li.l_suppkey == dims.s_suppkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


def q9_semi_join(spark, sf_dir):
    """LEFT SEMI: customers that have at least one urgent order."""
    cust = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("customer_count"))
        .orderBy("c_mktsegment")
    )


def q10_anti_join(spark, sf_dir):
    """LEFT ANTI: customers with no orders at all."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


def q11_outer_join_null_handling(spark, sf_dir):
    """LEFT OUTER + coalesce over the null side: per-customer order stats
    including order-less customers."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = _t(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("spend")
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(
            "c_custkey",
            F.coalesce(F.col("n"), F.lit(0)).alias("order_count"),
            F.round(F.coalesce(F.col("spend"), F.lit(0.0)), 2).alias("total_spend"),
        )
        .orderBy("c_custkey")
    )


# --- distinct / set ops / grouping sets -----------------------------------

def q12_distinct(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    )


def q13_set_operations(spark, sf_dir):
    """UNION (distinct) ∪ INTERSECT ∪ EXCEPT over nation keys."""
    cust_nations = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("long").alias("nationkey")
    )
    supp_nations = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("long").alias("nationkey")
    )
    union = cust_nations.union(supp_nations).distinct().withColumn(
        "src", F.lit("union")
    )
    intersect = cust_nations.intersect(supp_nations).withColumn(
        "src", F.lit("intersect")
    )
    # subtract == EXCEPT (set semantics); exceptAll would keep surplus dups
    except_ = cust_nations.subtract(supp_nations).withColumn(
        "src", F.lit("except")
    )
    return union.union(intersect).union(except_).orderBy("src", "nationkey")


def q14_rollup(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


def q15_cube(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


def q16_grouping_sets(spark, sf_dir):
    """GROUPING SETS via SQL (exact set list, not rollup/cube sugar)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(1) AS order_count
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST,
                 o_orderpriority ASC NULLS FIRST
        """
    )


def q17_having(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .filter(F.col("order_count") >= 15)
        .orderBy("o_custkey")
    )


# --- window functions ------------------------------------------------------

def q18_window_rank(spark, sf_dir):
    """rank + dense_rank + row_number per partition; row_number's order key
    is made unique (totalprice, orderkey) for determinism."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.col("o_totalprice"),
            F.rank().over(w).cast("long").alias("price_rank"),
            F.dense_rank().over(w).cast("long").alias("price_dense_rank"),
            F.row_number().over(w).cast("long").alias("price_row_number"),
        )
        .filter(F.col("price_row_number") <= 5)
        .orderBy("o_orderpriority", "price_row_number")
    )


def q19_window_running_sum(spark, sf_dir):
    """Cumulative frame: running spend per user over event time."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        _t(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            F.round(F.sum("value").over(w), 2).alias("running_value"),
        )
        .orderBy("event_id")
    )


def q20_window_lag_lead(spark, sf_dir):
    """lag/lead navigation: per-user deltas between consecutive events."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        _t(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            F.round(
                F.col("value") - F.lag("value", 1).over(w), 2
            ).alias("delta_prev"),
            F.lead("event_id", 1).over(w).alias("next_event_id"),
        )
        .orderBy("event_id")
    )


def q21_topk(spark, sf_dir):
    """Global top-k: ORDER BY ... LIMIT compiles to TakeOrderedAndProject
    (no full sort at scale)."""
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


# --- subqueries ------------------------------------------------------------

def q22_scalar_subquery(spark, sf_dir):
    """Uncorrelated scalar subquery: customers above the mean balance."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, ROUND(c_acctbal, 2) AS acctbal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
        ORDER BY c_custkey
        """
    )


def q23_correlated_subquery(spark, sf_dir):
    """Correlated subquery (decorrelated by Catalyst into a join)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS totalprice
        FROM orders o
        WHERE o_totalprice > 2 * (
            SELECT AVG(o2.o_totalprice) FROM orders o2
            WHERE o2.o_custkey = o.o_custkey
        )
        ORDER BY o_orderkey
        """
    )


# --- scalar function families ---------------------------------------------

def q24_string_functions(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_name").like("%1%"))
        .select(
            "c_custkey",
            F.upper("c_name").alias("upper_name"),
            F.lower("c_mktsegment").alias("lower_segment"),
            F.substring("c_name", 1, 8).alias("name_prefix"),
            F.length("c_name").cast("long").alias("name_len"),
            F.concat_ws("-", "c_mktsegment", "c_name").alias("seg_name"),
            F.regexp_replace("c_name", "[0-9]+", "#").alias("name_masked"),
            F.trim(F.lpad("c_name", 20, " ")).alias("name_trimmed"),
        )
        .orderBy("c_custkey")
    )


def q25_date_functions(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            # to_date: Spark's date_trunc yields timestamp, DuckDB's a date
            F.to_date(F.date_trunc("month", "o_orderdate")).alias("order_month"),
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.month("o_orderdate").cast("long").alias("order_monthnum"),
            F.quarter("o_orderdate").cast("long").alias("order_quarter"),
        )
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("order_month")
    )


def q26_datediff_join(spark, sf_dir):
    """Ship latency: join lineitem→orders, day difference distribution."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
            .cast("long")
            .alias("ship_delay_days")
        )
        .groupBy("ship_delay_days")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("ship_delay_days")
    )


def q27_math_functions(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("linenumber"),
        F.round(F.abs(-F.col("l_extendedprice")), 2).alias("abs_price"),
        F.ceil("l_discount").cast("long").alias("ceil_disc"),
        F.floor("l_tax").cast("long").alias("floor_tax"),
        F.round(F.sqrt("l_quantity"), 4).alias("sqrt_qty"),
        F.round(F.pow(F.col("l_quantity"), F.lit(2)), 2).alias("qty_squared"),
        F.round(F.ln(F.col("l_extendedprice") + 1), 4).alias("ln_price"),
        (F.col("l_partkey") % 7).cast("long").alias("partkey_mod7"),
    ).orderBy("l_orderkey", "linenumber")


def q28_case_and_null_functions(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.when(F.col("o_totalprice") > 300000, "high")
            .when(F.col("o_totalprice") > 100000, "mid")
            .otherwise("low")
            .alias("price_band"),
            F.coalesce(
                F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("NOT_P")
            ).alias("status_np"),
        )
        .groupBy("price_band", "status_np")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("price_band", "status_np")
    )


def q29_json_functions(spark, sf_dir):
    """JSON extraction from the events props column (get_json_object)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            F.get_json_object("props", "$.k").cast("long").alias("k")
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("k")
    )


def q30_distinct_count(spark, sf_dir):
    """Exact COUNT(DISTINCT) — the oracle-checkable cardinality query."""
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.countDistinct("user_id").alias("distinct_users"),
        F.countDistinct("event_type").alias("distinct_types"),
    )


def q31_approx_count_distinct(spark, sf_dir):
    """HLL approximate distinct (rows-only check: estimates are
    engine-specific, SURVEY §7; exact twin is q30)."""
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users")
    )


def q32_array_functions(spark, sf_dir):
    """Array construction/explode round trip: tokenize document text,
    explode, count tokens — the array-function family plus a lateral view."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "token")
        .limit(20)
    )


QUERIES = {
    "q5_tpch_q6_forecast_revenue": q5_tpch_q6_forecast_revenue,
    "q6_tpch_q1_pricing_summary": q6_tpch_q1_pricing_summary,
    "q7_join_broadcast_dim": q7_join_broadcast_dim,
    "q8_join_multiway_revenue_by_nation": q8_join_multiway_revenue_by_nation,
    "q9_semi_join": q9_semi_join,
    "q10_anti_join": q10_anti_join,
    "q11_outer_join_null_handling": q11_outer_join_null_handling,
    "q12_distinct": q12_distinct,
    "q13_set_operations": q13_set_operations,
    "q14_rollup": q14_rollup,
    "q15_cube": q15_cube,
    "q16_grouping_sets": q16_grouping_sets,
    "q17_having": q17_having,
    "q18_window_rank": q18_window_rank,
    "q19_window_running_sum": q19_window_running_sum,
    "q20_window_lag_lead": q20_window_lag_lead,
    "q21_topk": q21_topk,
    "q22_scalar_subquery": q22_scalar_subquery,
    "q23_correlated_subquery": q23_correlated_subquery,
    "q24_string_functions": q24_string_functions,
    "q25_date_functions": q25_date_functions,
    "q26_datediff_join": q26_datediff_join,
    "q27_math_functions": q27_math_functions,
    "q28_case_and_null_functions": q28_case_and_null_functions,
    "q29_json_functions": q29_json_functions,
    "q30_distinct_count": q30_distinct_count,
    "q31_approx_count_distinct": q31_approx_count_distinct,
    "q32_array_functions": q32_array_functions,
}

ORACLE = {
    "q5_tpch_q6_forecast_revenue": """
        SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 25
    """,
    "q6_tpch_q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               ROUND(AVG(l_quantity), 2) AS avg_qty,
               ROUND(AVG(l_extendedprice), 2) AS avg_price,
               ROUND(AVG(l_discount), 4) AS avg_disc,
               COUNT(1) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q7_join_broadcast_dim": """
        SELECT c_mktsegment,
               COUNT(1) AS order_count,
               ROUND(SUM(o_totalprice), 2) AS total_revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    "q8_join_multiway_revenue_by_nation": """
        SELECT n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    "q9_semi_join": """
        SELECT c_mktsegment, COUNT(1) AS customer_count
        FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
        )
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    "q10_anti_join": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE NOT EXISTS (
            SELECT 1 FROM orders WHERE o_custkey = c_custkey
        )
        ORDER BY c_custkey
    """,
    "q11_outer_join_null_handling": """
        SELECT c_custkey,
               COALESCE(n, 0) AS order_count,
               ROUND(COALESCE(spend, 0.0), 2) AS total_spend
        FROM customer
        LEFT JOIN (
            SELECT o_custkey, COUNT(1) AS n, SUM(o_totalprice) AS spend
            FROM orders GROUP BY o_custkey
        ) ON c_custkey = o_custkey
        ORDER BY c_custkey
    """,
    "q12_distinct": """
        SELECT DISTINCT l_returnflag, l_linestatus
        FROM lineitem
        ORDER BY l_returnflag, l_linestatus
    """,
    "q13_set_operations": """
        WITH c AS (SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer),
             s AS (SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier)
        SELECT nationkey, 'union' AS src FROM (SELECT nationkey FROM c UNION SELECT nationkey FROM s)
        UNION ALL
        SELECT nationkey, 'intersect' AS src FROM (SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s)
        UNION ALL
        SELECT nationkey, 'except' AS src FROM (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s)
        ORDER BY src, nationkey
    """,
    "q14_rollup": """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(1) AS order_count,
               ROUND(SUM(o_totalprice), 2) AS total_price
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus ASC NULLS FIRST,
                 o_orderpriority ASC NULLS FIRST
    """,
    "q15_cube": """
        SELECT l_returnflag, l_linestatus, COUNT(1) AS cnt
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
    """,
    "q16_grouping_sets": """
        SELECT o_orderstatus, o_orderpriority, COUNT(1) AS order_count
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST,
                 o_orderpriority ASC NULLS FIRST
    """,
    "q17_having": """
        SELECT o_custkey, COUNT(1) AS order_count
        FROM orders
        GROUP BY o_custkey
        HAVING COUNT(1) >= 15
        ORDER BY o_custkey
    """,
    "q18_window_rank": """
        SELECT * FROM (
            SELECT o_orderkey, o_orderpriority, o_totalprice,
                   RANK() OVER w AS price_rank,
                   DENSE_RANK() OVER w AS price_dense_rank,
                   ROW_NUMBER() OVER w AS price_row_number
            FROM orders
            WINDOW w AS (PARTITION BY o_orderpriority
                         ORDER BY o_totalprice DESC, o_orderkey ASC)
        )
        WHERE price_row_number <= 5
        ORDER BY o_orderpriority, price_row_number
    """,
    "q19_window_running_sum": """
        SELECT event_id, user_id,
               ROUND(SUM(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), 2) AS running_value
        FROM events
        ORDER BY event_id
    """,
    "q20_window_lag_lead": """
        SELECT event_id, user_id,
               ROUND(value - LAG(value, 1) OVER w, 2) AS delta_prev,
               LEAD(event_id, 1) OVER w AS next_event_id
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY event_id
    """,
    "q21_topk": """
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 10
    """,
    "q22_scalar_subquery": """
        SELECT c_custkey, ROUND(c_acctbal, 2) AS acctbal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
        ORDER BY c_custkey
    """,
    "q23_correlated_subquery": """
        SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS totalprice
        FROM orders o
        WHERE o_totalprice > 2 * (
            SELECT AVG(o2.o_totalprice) FROM orders o2
            WHERE o2.o_custkey = o.o_custkey
        )
        ORDER BY o_orderkey
    """,
    "q24_string_functions": """
        SELECT c_custkey,
               UPPER(c_name) AS upper_name,
               LOWER(c_mktsegment) AS lower_segment,
               SUBSTRING(c_name, 1, 8) AS name_prefix,
               CAST(LENGTH(c_name) AS BIGINT) AS name_len,
               CONCAT_WS('-', c_mktsegment, c_name) AS seg_name,
               REGEXP_REPLACE(c_name, '[0-9]+', '#', 'g') AS name_masked,
               TRIM(LPAD(c_name, 20, ' ')) AS name_trimmed
        FROM customer
        WHERE c_name LIKE '%1%'
        ORDER BY c_custkey
    """,
    "q25_date_functions": """
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
               CAST(year(o_orderdate) AS BIGINT) AS order_year,
               CAST(month(o_orderdate) AS BIGINT) AS order_monthnum,
               CAST(quarter(o_orderdate) AS BIGINT) AS order_quarter,
               COUNT(1) AS order_count
        FROM orders
        GROUP BY 1, 2, 3, 4
        ORDER BY order_month
    """,
    "q26_datediff_join": """
        SELECT CAST(date_diff('day', CAST(o_orderdate AS DATE),
                              CAST(l_shipdate AS DATE)) AS BIGINT)
                   AS ship_delay_days,
               COUNT(1) AS cnt
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1
        ORDER BY ship_delay_days
    """,
    "q27_math_functions": """
        SELECT l_orderkey,
               CAST(l_linenumber AS BIGINT) AS linenumber,
               ROUND(ABS(-l_extendedprice), 2) AS abs_price,
               CAST(CEIL(l_discount) AS BIGINT) AS ceil_disc,
               CAST(FLOOR(l_tax) AS BIGINT) AS floor_tax,
               ROUND(SQRT(l_quantity), 4) AS sqrt_qty,
               ROUND(POW(l_quantity, 2), 2) AS qty_squared,
               ROUND(LN(l_extendedprice + 1), 4) AS ln_price,
               CAST(l_partkey % 7 AS BIGINT) AS partkey_mod7
        FROM lineitem
        WHERE l_orderkey % 100 = 0
        ORDER BY l_orderkey, linenumber
    """,
    "q28_case_and_null_functions": """
        SELECT CASE WHEN o_totalprice > 300000 THEN 'high'
                    WHEN o_totalprice > 100000 THEN 'mid'
                    ELSE 'low' END AS price_band,
               COALESCE(NULLIF(o_orderstatus, 'P'), 'NOT_P') AS status_np,
               COUNT(1) AS cnt
        FROM orders
        GROUP BY 1, 2
        ORDER BY price_band, status_np
    """,
    "q29_json_functions": """
        SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
               COUNT(1) AS cnt
        FROM events
        GROUP BY 1
        ORDER BY k
    """,
    "q30_distinct_count": """
        SELECT COUNT(DISTINCT user_id) AS distinct_users,
               COUNT(DISTINCT event_type) AS distinct_types
        FROM events
    """,
    # q31_approx_count_distinct: intentionally no oracle (HLL estimates are
    # engine-specific); rows-only check.
    "q32_array_functions": """
        SELECT token, COUNT(1) AS cnt
        FROM (
            SELECT doc_id, UNNEST(string_split(text, ' ')) AS token
            FROM documents
        )
        WHERE token <> ''
        GROUP BY token
        ORDER BY cnt DESC, token
        LIMIT 20
    """,
}
