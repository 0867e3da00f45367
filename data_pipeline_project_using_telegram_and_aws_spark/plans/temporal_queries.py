"""Temporal-join and analytics-breadth queries: as-of join, binned range
join, hypertable-style time-bucket rollup, pivot, exact percentiles, and
deterministic hash sampling — each with a DuckDB oracle.

The as-of oracle uses DuckDB's native ``ASOF LEFT JOIN``, which pins the
semantics our union-window implementation (operators/asof.py) must match:
latest right row with ``right_ts <= left_ts`` per key, null if none.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.exact import SCALE, exact_sum, scaled, sql_sum
from ..operators import asof as A
from ..sources.tables import load_table

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q33_asof_join_last_order(spark, sf_dir):
    """For every event, the customer's most recent order at-or-before the
    event time (as-of backward join on user_id = o_custkey). Orders are
    pre-aggregated to one row per (custkey, orderdate) so ties are
    deterministic."""
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    ords = orders.groupBy("o_custkey", "o_orderdate").agg(
        F.max("o_orderkey").alias("last_orderkey")
    )
    joined = A.asof_join(
        events.select("event_id", "user_id", "ts"),
        ords.withColumnRenamed("o_orderdate", "last_order_date"),
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="last_order_date",
        right_cols=["last_orderkey", "last_order_date"],
    )
    return joined.select(
        "event_id", "user_id", "last_orderkey", "last_order_date"
    ).orderBy("event_id")


def q34_range_join_bins(spark, sf_dir):
    """Histogram by value band: join events to band intervals
    [p*50, p*50+50) — executed as a binned equi-join, checked against the
    oracle's true inequality join."""
    events = load_table(spark, sf_dir, "events")
    bands = (
        spark.range(10)
        .select(
            F.col("id").alias("band_id"),
            (F.col("id") * 50.0).alias("lo"),
            (F.col("id") * 50.0 + 50.0).alias("hi"),
        )
    )
    joined = A.binned_range_join(events, "value", bands, "lo", "hi", 50.0)
    return (
        joined.groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum("value").alias("sum_value"),
        )
        .orderBy("band_id")
    )


def q35_time_bucket_rollup(spark, sf_dir):
    """Hypertable-style hierarchical rollup: events → 15-minute buckets →
    daily summary re-aggregated *from the bucket aggregates* (counts and
    sums compose; the bucket level is what a continuous aggregate would
    materialize).

    The two-level sum runs in exact fixed-point (functions/exact.py):
    summing doubles twice lets Spark-vs-oracle accumulation order flip
    the final 2-dp rounding (driver red in round 1); scaled-long
    addition is exact and order-independent on both engines.

    Output contract (round 4): after three rounds where this row hashed
    red in the driver while every locally reproducible probe was green
    (TZ matrix, epoch() invariance, rounding-tie scan — VERDICT r3), the
    failure surface itself is removed. The output carries no timestamp
    and no double: ``day`` is a DATE computed by pure epoch arithmetic
    (``floor(epoch/86400)`` days since 1970-01-01 — no session-TZ
    truncation on either engine) and ``sum_value`` stays the raw scaled
    BIGINT (value·10⁶, no divide, no round). Ints and dates have a
    single representation everywhere; with rows and schema already
    matching for three rounds, this row can no longer hash-diverge."""
    events = load_table(spark, sf_dir, "events")
    bucketed = (
        events.withColumn("bucket", A.time_bucket(F.col("ts"), 900))
        .groupBy("bucket", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(scaled("value")).alias("v"),
        )
    )
    epoch_day = F.floor(F.unix_timestamp(F.col("bucket")) / 86400).cast("int")
    return (
        bucketed.withColumn(
            "day", F.date_add(F.to_date(F.lit("1970-01-01")), epoch_day)
        )
        .groupBy("day", "event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("v").alias("sum_value"),
            F.count(F.lit(1)).alias("n_active_buckets"),
        )
        .orderBy("day", "event_type")
    )


def q36_pivot_event_types(spark, sf_dir):
    """Pivot: per user cohort (user_id % 10), total value by event type as
    columns. Pivot values are pinned so the output schema is static."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn("cohort", F.col("user_id") % 10)
        .groupBy("cohort")
        .pivot("event_type", EVENT_TYPES)
        .agg(exact_sum("value"))
        .orderBy("cohort")
    )


def q37_percentiles(spark, sf_dir):
    """Exact interpolated percentiles (p25/p50/p75) of l_quantity per
    return flag — Spark ``percentile`` vs DuckDB ``quantile_cont``."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_quantity, 0.25)"), 4).alias("p25"),
            F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(l_quantity, 0.75)"), 4).alias("p75"),
            # approximate-percentile sketches are engine-specific (Spark
            # KLL-ish vs DuckDB t-digest), so — like q31's HLL — each
            # engine checks its OWN estimate against its exact median and
            # only the deterministic tolerance boolean is hashed
            F.expr("approx_percentile(l_quantity, 0.5)").alias("__ap50"),
        )
        .select(
            "l_returnflag",
            "p25",
            "p50",
            "p75",
            (
                F.abs(F.col("__ap50") - F.col("p50")) <= F.lit(1.0)
            ).alias("approx_p50_close"),
        )
        .orderBy("l_returnflag")
    )


def q38_hash_sample(spark, sf_dir):
    """Deterministic ~10% sample via md5 prefix of the row key — the
    reproducible, engine-independent alternative to TABLESAMPLE (which is
    seeded differently per engine). Aggregates prove the sample is stable."""
    li = load_table(spark, sf_dir, "lineitem")
    key = F.md5(
        F.concat_ws("_", F.col("l_orderkey"), F.col("l_linenumber")).cast("binary")
    )
    return (
        li.filter(F.substring(key, 1, 2) < "1a")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            exact_sum("l_extendedprice").alias("sum_price"),
        )
        .orderBy("l_returnflag")
    )


def q39_session_windows(spark, sf_dir):
    """Gap-based sessionization (30-minute inactivity) per user via
    Spark's engine-merged ``session_window`` — checked against the classic
    gaps-and-islands SQL formulation. Session end = last event + gap."""
    from ..streaming.windows import session_aggregate

    events = load_table(spark, sf_dir, "events")
    return session_aggregate(events, "30 minutes").orderBy(
        "user_id", "session_start"
    )


QUERIES = {
    "q33_asof_join_last_order": q33_asof_join_last_order,
    "q34_range_join_bins": q34_range_join_bins,
    "q35_time_bucket_rollup": q35_time_bucket_rollup,
    "q36_pivot_event_types": q36_pivot_event_types,
    "q37_percentiles": q37_percentiles,
    # q38_hash_sample left the 50-row registry in round 11 (funding
    # wc1_warc_html_extract): its md5-prefix sampling dice is the same
    # deterministic-hash-fraction machinery sp1_split_mixture
    # hash-checks every round; q38 stays callable and is pinned against
    # a Python-recomputed expectation in
    # tests/test_registry_consolidation.py.
    "q39_session_windows": q39_session_windows,
}

ORACLE = {
    "q33_asof_join_last_order": """
        WITH ords AS (
            SELECT o_custkey, o_orderdate AS last_order_date,
                   MAX(o_orderkey) AS last_orderkey
            FROM orders GROUP BY 1, 2
        )
        SELECT e.event_id, e.user_id, o.last_orderkey, o.last_order_date
        FROM events e
        ASOF LEFT JOIN ords o
          ON e.user_id = o.o_custkey AND e.ts >= o.last_order_date
        ORDER BY e.event_id
    """,
    "q34_range_join_bins": f"""
        WITH bands AS (
            SELECT p AS band_id, p * 50.0 AS lo, p * 50.0 + 50.0 AS hi
            FROM UNNEST(generate_series(0, 9)) t(p)
        )
        SELECT band_id, COUNT(1) AS n_events,
               {sql_sum('value')} AS sum_value
        FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
        GROUP BY band_id
        ORDER BY band_id
    """,
    "q35_time_bucket_rollup": f"""
        WITH bucketed AS (
            -- bucket kept as a raw epoch-seconds BIGINT: every derived
            -- column is then pure integer arithmetic, immune to either
            -- engine's session TimeZone (the round-1..3 red-row family)
            SELECT CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) AS bucket_s,
                   event_type, COUNT(1) AS n,
                   SUM(CAST(round(value * {SCALE}) AS BIGINT)) AS v
            FROM events GROUP BY 1, 2
        )
        SELECT DATE '1970-01-01'
                   + CAST(floor(bucket_s / 86400) AS INT) AS day,
               event_type,
               CAST(SUM(n) AS BIGINT) AS n_events,
               CAST(SUM(v) AS BIGINT) AS sum_value,
               COUNT(1) AS n_active_buckets
        FROM bucketed
        GROUP BY 1, 2
        ORDER BY day, event_type
    """,
    "q36_pivot_event_types": f"""
        SELECT user_id % 10 AS cohort,
               {sql_sum("CASE WHEN event_type = 'click' THEN value END")} AS click,
               {sql_sum("CASE WHEN event_type = 'error' THEN value END")} AS error,
               {sql_sum("CASE WHEN event_type = 'purchase' THEN value END")} AS purchase,
               {sql_sum("CASE WHEN event_type = 'signup' THEN value END")} AS signup,
               {sql_sum("CASE WHEN event_type = 'view' THEN value END")} AS view
        FROM events
        GROUP BY 1
        ORDER BY cohort
    """,
    "q37_percentiles": """
        SELECT l_returnflag, p25, p50, p75,
               ABS(ap50 - p50) <= 1.0 AS approx_p50_close
        FROM (
            SELECT l_returnflag,
                   ROUND(quantile_cont(l_quantity, 0.25), 4) AS p25,
                   ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50,
                   ROUND(quantile_cont(l_quantity, 0.75), 4) AS p75,
                   approx_quantile(l_quantity, 0.5) AS ap50
            FROM lineitem
            GROUP BY l_returnflag
        )
        ORDER BY l_returnflag
    """,
    # q38's oracle retired with its registry row (round 11, see
    # QUERIES); the sampling dice stays pinned by sp1 + the
    # consolidation test.
    "q39_session_windows": f"""
        WITH flagged AS (
            SELECT user_id, ts, value,
                   CASE WHEN ts - LAG(ts) OVER (
                            PARTITION BY user_id ORDER BY ts
                        ) > INTERVAL 30 MINUTE
                        OR LAG(ts) OVER (
                            PARTITION BY user_id ORDER BY ts
                        ) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ),
        islands AS (
            SELECT user_id, ts, value,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING
                   ) AS session_id
            FROM flagged
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 30 MINUTE AS session_end,
               COUNT(1) AS n_events,
               {sql_sum('value')} AS sum_value
        FROM islands
        GROUP BY user_id, session_id
        ORDER BY user_id, session_start
    """,
}
