"""Window functions + time-window aggregations + sessionization.

The reference's only time-shaping operators are `groupedWithin` (count/time
batching, SURVEY §2.C) and timestamp-positioned reads (`AtTimestamp`,
KinesisSource.scala:31-35). Their batch analogs — tumbling-window
aggregation and event-time sessionization — live here, alongside the ANSI
window-function family the reference lacks (SURVEY §2.D).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions import div_round4
from ..io import table
from ..registry import query


@query(
    "events_hourly_rollup",
    oracle="""
    SELECT DATE_TRUNC('hour', ts)  AS hour,
           event_type,
           COUNT(*)                AS n,
           ROUND(SUM(value), 2)    AS total_value,
           FLOOR(ROUND(SUM(value), 2) * 10000.0 / COUNT(*) + 0.5) / 10000.0 AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP (SURVEY §7 phase 0): tumbling 1-hour window per event type —
    the batch-mode analog of the reference's whole purpose: time-positioned,
    partitioned event consumption (KinesisSource.scala:31-35) composed with
    `groupedWithin` batching (KinesisSourceTest.scala:245).

    date_trunc keeps the key a scalar (not a struct) so the oracle hash
    lines up; the aggregation is a single hash-agg shuffle on
    (hour, event_type) — ~720 × 5 groups per month regardless of input
    scale, so the reduce side is trivially small even at 100 TB.
    """
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
            # round(sum,2)/count: boundary-safe avg (see relational.tpch_q1)
            div_round4(F.round(F.sum("value"), 2), F.count("*")).alias("avg_value"),
        )
    )


@query(
    "window_topk_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS total_price, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    )
    WHERE rn <= 3
    """,
)
def window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number — the scale-correct top-k (no global
    sort; one shuffle on the partition key, then a per-partition sort that
    AQE sizes). Tie-broken by orderkey for determinism."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            "rn",
        )
    )


@query(
    "window_running_totals",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_spend,
           ROUND(COALESCE(LAG(o_totalprice) OVER (PARTITION BY o_custkey
                                                  ORDER BY o_orderdate, o_orderkey), 0), 2)
               AS prev_price,
           ROUND(AVG(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
               AS moving_avg3
    FROM orders
    """,
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window frames: running sum, lag, 3-row moving average —
    one shuffle on o_custkey shared by all three frames (same window spec)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = w.rowsBetween(-2, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(cum), 2).alias("running_spend"),
        F.round(F.coalesce(F.lag("o_totalprice").over(w), F.lit(0.0)), 2).alias("prev_price"),
        F.round(F.avg("o_totalprice").over(mov), 4).alias("moving_avg3"),
    )


@query(
    "window_rank_dense_ntile",
    oracle="""
    SELECT c_mktsegment, c_custkey,
           RANK()       OVER w AS bal_rank,
           DENSE_RANK() OVER w AS bal_dense_rank,
           NTILE(4)     OVER w AS bal_quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family: rank / dense_rank / ntile over one shared window."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select(
        "c_mktsegment",
        "c_custkey",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        F.ntile(4).over(w).alias("bal_quartile"),
    )


@query(
    "events_sessionize",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL THEN 1
                    WHEN EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > 1800000000 THEN 1
                    ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts, event_id,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id,
           COUNT(*)  AS n_events,
           MIN(ts)   AS session_start,
           MAX(ts)   AS session_end
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization with a 30-minute inactivity gap: lag → new-session
    flag → running sum = session id → per-session aggregate. The gap compare
    uses integer microseconds (unix_micros / EPOCH_US) on both sides so there
    is no float-epoch boundary noise. Streaming twin: F.session_window (see
    streaming/windows.py)."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = e.withColumn(
        "new_session",
        F.when(F.lag("ts").over(w).isNull(), 1).when(gap_us > 1800 * 1000 * 1000, 1).otherwise(0),
    )
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(cum))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@query(
    "events_sliding_windows",
    oracle="""
    WITH expanded AS (
        SELECT UNNEST([TIME_BUCKET(INTERVAL '30 minutes', ts),
                       TIME_BUCKET(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'])
                   AS win_start,
               event_type, value
        FROM events
    )
    SELECT win_start, event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total_value
    FROM expanded
    GROUP BY win_start, event_type
    """,
)
def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h length, 30 min slide): every event lands in
    exactly two windows. Spark expands via the built-in window() generator;
    the oracle expands the same two starts per event with time_bucket.
    At scale the expansion factor is length/slide — bounded and explicit."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("window.start").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "window_range_frame_trailing_spend",
    oracle="""
    SELECT o_orderkey, o_custkey,
           COUNT(*) OVER w                     AS n_trailing_orders,
           ROUND(SUM(o_totalprice) OVER w, 2)  AS trailing_90d_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY CAST(EPOCH(o_orderdate) AS BIGINT)
                 RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW)
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed window: each order's trailing-90-day spend for its
    customer — a value-based frame (7776000 s = 90 days on an epoch-seconds
    ordering), unlike the row-counted frames elsewhere in this module.
    One shuffle on o_custkey; the frame scan is a sliding two-pointer over
    each sorted partition, linear per customer at any scale."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-90 * 86400, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.count("*").over(w).alias("n_trailing_orders"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("trailing_90d_spend"),
    )


@query(
    "unpivot_nation_balances",
    oracle="""
    WITH cb AS (SELECT c_nationkey AS nk, ROUND(SUM(c_acctbal), 2) AS v
                FROM customer GROUP BY 1),
         sb AS (SELECT s_nationkey AS nk, ROUND(SUM(s_acctbal), 2) AS v
                FROM supplier GROUP BY 1)
    SELECT nk AS nationkey, 'customer_balance' AS metric, v AS balance FROM cb
    UNION ALL
    SELECT nk AS nationkey, 'supplier_balance' AS metric, v AS balance FROM sb
    """,
)
def unpivot_nation_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt): per-nation customer/supplier balance
    columns become (metric, balance) rows — the inverse of
    pivot_user_event_matrix. Spark's unpivot is a zero-shuffle Expand over
    the (tiny) aggregated input; at scale the aggregation before the
    unpivot is what keeps the expanded row count bounded."""
    cb = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.round(F.sum("c_acctbal"), 2).alias("customer_balance"))
    )
    sb = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("s_nk"))
        .agg(F.round(F.sum("s_acctbal"), 2).alias("supplier_balance"))
    )
    wide = cb.join(sb, F.col("nationkey") == F.col("s_nk"), "full").select(
        F.coalesce(F.col("nationkey"), F.col("s_nk")).alias("nationkey"),
        "customer_balance",
        "supplier_balance",
    )
    long = wide.unpivot(
        ids=["nationkey"],
        values=["customer_balance", "supplier_balance"],
        variableColumnName="metric",
        valueColumnName="balance",
    )
    # UNION ALL oracle emits no row for a missing side; unpivot emits NULL
    return long.filter(F.col("balance").isNotNull())


@query(
    "window_first_last_nth",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey)  OVER w AS latest_order,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_order,
           LEAD(o_orderkey) OVER w AS next_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional window analytics: first/last/nth/lead over each
    customer's order history. The UNBOUNDED..UNBOUNDED frame makes
    last_value the true latest order (the default frame would stop at the
    current row); the (date, key) ordering breaks same-day ties so both
    engines pick identical rows. LEAD ignores the frame by definition —
    included to pin that contract too."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_lead = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("latest_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
        F.lead("o_orderkey").over(w_lead).alias("next_order"),
    )


@query(
    "window_rows_frame_moving_avg",
    oracle="""
    SELECT user_id, event_id,
           ROUND(AVG(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
           ), 4) AS ma4,
           CAST(COUNT(*) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_in_frame
    FROM events WHERE event_type = 'purchase'
    """,
)
def window_rows_frame_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-based sliding frame (ROWS BETWEEN 3 PRECEDING AND CURRENT):
    4-point trailing moving average of purchase values per user — the
    row-count frame family, complementing the value-range frame
    (window_range_frame_trailing_spend) and the unbounded running frame
    (window_running_totals). One per-user ordered window, frame state is
    4 rows regardless of history length."""
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 4).alias("ma4"),
        F.count("*").over(w).alias("n_in_frame"),
    )


@query(
    "events_session_conversion_by_depth",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN LAG(ts) OVER w IS NULL THEN 1
                    WHEN EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > 1800000000 THEN 1
                    ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, event_type,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS session_id
        FROM flagged
    ), per_session AS (
        SELECT user_id, session_id,
               COUNT(*) AS depth,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM sessions GROUP BY user_id, session_id
    ), bucketed AS (
        SELECT CASE WHEN depth <= 2 THEN '01-02'
                    WHEN depth <= 5 THEN '03-05'
                    WHEN depth <= 10 THEN '06-10'
                    ELSE '11+' END AS depth_bucket,
               converted
        FROM per_session
    )
    SELECT depth_bucket,
           COUNT(*) AS n_sessions,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           ROUND(SUM(converted) * 1.0 / COUNT(*), 4) AS conversion_rate
    FROM bucketed GROUP BY depth_bucket
    """,
)
def events_session_conversion_by_depth(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Conversion rate by session depth: sessions (30-min inactivity gap,
    same construction as events_sessionize) bucketed by event count, with
    the share that contain a purchase — the engagement-vs-conversion
    curve a funnel team reads before deciding where sessions die.

    Plan: the sessionization windows share one (user_id) sort; the
    per-session reduce and the 4-bucket rollup are plain hash aggregates
    — everything after the first window is proportional to sessions,
    then buckets."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = e.withColumn(
        "new_session",
        F.when(F.lag("ts").over(w).isNull(), 1)
        .when(gap_us > 1800 * 1000 * 1000, 1)
        .otherwise(0),
    )
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = flagged.withColumn(
        "session_id", F.sum("new_session").over(cum)
    )
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("depth"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    bucket = (
        F.when(F.col("depth") <= 2, "01-02")
        .when(F.col("depth") <= 5, "03-05")
        .when(F.col("depth") <= 10, "06-10")
        .otherwise("11+")
    )
    return (
        per_session.select(bucket.alias("depth_bucket"), "converted")
        .groupBy("depth_bucket")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("converted").alias("n_converted"),
            F.round(
                F.sum("converted") * 1.0 / F.count("*"), 4
            ).alias("conversion_rate"),
        )
    )


# ---------------------------------------------------------------------------
# events_session_concurrency — interval-occupancy rollup over session spans
# ---------------------------------------------------------------------------


@query(
    "events_session_concurrency",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL THEN 1
                    WHEN EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > 1800000000 THEN 1
                    ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS session_id,
               ts
        FROM flagged
    ), spans AS (
        SELECT user_id, session_id,
               DATE_TRUNC('hour', MIN(ts)) AS h_start,
               DATE_TRUNC('hour', MAX(ts)) AS h_end
        FROM sess GROUP BY user_id, session_id
    ), occupied AS (
        SELECT user_id, session_id, h_start, h_end,
               UNNEST(GENERATE_SERIES(h_start, h_end, INTERVAL 1 HOUR)) AS hour
        FROM spans
    )
    SELECT hour,
           COUNT(*) AS n_active,
           CAST(SUM(CASE WHEN hour = h_start THEN 1 ELSE 0 END) AS BIGINT)
               AS n_starting,
           CAST(SUM(CASE WHEN hour = h_end THEN 1 ELSE 0 END) AS BIGINT)
               AS n_ending
    FROM occupied
    GROUP BY hour
    """,
)
def events_session_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrent-session load profile: how many sessions are ACTIVE in
    each hour (plus how many start and end there) — the interval-
    occupancy rollup behind capacity planning and concurrency SLO
    dashboards. An interval query answered WITHOUT an interval self-join:
    each session span explodes to its covered hour cells (a primitive
    timestamp sequence, bounded by span length) and a plain hash-agg
    counts occupancy per cell — linear in sessions x span-hours, where
    the naive pairwise-overlap formulation is quadratic in concurrency.

    Scale shape: one user_id shuffle (sessionize), one hour-cell
    shuffle (occupancy agg); both partial+final. Sessions are 30-min-gap
    bounded so spans are short — the explode factor is small and even a
    very long-lived session only emits one row per hour of life."""
    sessions = events_sessionize(spark, sf_dir).select(
        F.date_trunc("hour", "session_start").alias("h_start"),
        F.date_trunc("hour", "session_end").alias("h_end"),
    )
    occupied = sessions.select(
        "h_start",
        "h_end",
        F.explode(
            F.sequence("h_start", "h_end", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    return occupied.groupBy("hour").agg(
        F.count("*").alias("n_active"),
        F.sum((F.col("hour") == F.col("h_start")).cast("long")).alias("n_starting"),
        F.sum((F.col("hour") == F.col("h_end")).cast("long")).alias("n_ending"),
    )


# ---------------------------------------------------------------------------
# window_cumulative_distinct_users — audience accumulation curve
# ---------------------------------------------------------------------------


@query(
    "window_cumulative_distinct_users",
    oracle="""
    WITH first_seen AS (
        SELECT event_type, user_id,
               MIN(CAST(DATE_TRUNC('day', ts) AS TIMESTAMP)) AS first_day
        FROM events GROUP BY 1, 2
    ), per_day AS (
        SELECT event_type, first_day AS day, COUNT(*) AS new_users
        FROM first_seen GROUP BY 1, 2
    )
    SELECT event_type, day, new_users,
           CAST(SUM(new_users) OVER (PARTITION BY event_type ORDER BY day)
                AS BIGINT) AS cum_users
    FROM per_day
    """,
)
def window_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative DISTINCT users per event type by day — the audience
    accumulation / growth-accounting curve. A running COUNT(DISTINCT) is
    not a window frame any engine supports directly; the scalable
    identity is: distinct-so-far(t) = Σ new-at(t'), t' ≤ t, where "new"
    is each user's FIRST day. So: min-day per (type,user) (one hash-agg
    that also dedups map-side), count firsts per day, cumulative-sum the
    counts — the heavy distinct state never enters the window, which
    runs over |types|×|days| rows only. Days with no first-time users
    simply don't appear (the curve is defined at change points)."""
    e = table(spark, sf_dir, "events")
    first_seen = e.groupBy("event_type", "user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("first_day")
    )
    per_day = first_seen.groupBy(
        "event_type", F.col("first_day").alias("day")
    ).agg(F.count("*").alias("new_users"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per_day.select(
        "event_type",
        "day",
        "new_users",
        F.sum("new_users").over(w).alias("cum_users"),
    )


# ---------------------------------------------------------------------------
# window_session_funnel_paths — top session-opening paths (path analysis)
# ---------------------------------------------------------------------------

_SFP_DEPTH = 3     # path prefix length
_SFP_TOPK = 20


@query(
    "window_session_funnel_paths",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN LAG(ts) OVER w IS NULL THEN 1
                    WHEN EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > 1800000000 THEN 1
                    ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts, event_id, event_type,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS session_id
        FROM flagged
    ), paths AS (
        SELECT user_id, session_id,
               ARRAY_TO_STRING(LIST(event_type ORDER BY ts, event_id)[1:{_SFP_DEPTH}], '>')
                   AS path,
               COUNT(*) AS depth
        FROM sessions
        GROUP BY user_id, session_id
    ), ranked AS (
        SELECT path,
               COUNT(*) AS n_sessions,
               FLOOR(CAST(SUM(CASE WHEN depth >= {_SFP_DEPTH} THEN {_SFP_DEPTH}
                                   ELSE depth END) AS DOUBLE) * 10000.0
                     / COUNT(*) + 0.5) / 10000.0 AS avg_prefix_len,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, path) AS rnk
        FROM paths
        GROUP BY path
    )
    SELECT path, n_sessions, avg_prefix_len, rnk
    FROM ranked WHERE rnk <= {_SFP_TOPK}
    """,
)
def window_session_funnel_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path exploration: the most common session-opening event sequences
    (first {_SFP_DEPTH} event types per 30-min session) with session
    counts — the 'what do users actually do first' table behind every
    product-analytics path/Sankey view.

    Scale shape: sessionization reuses the events_sessionize construction
    (both windows share ONE user-partitioned sort). The per-session path
    is built with collect_list over the SAME partitioning (sessions never
    span users) + array_sort on a (µs, event_id, type) struct — a
    deterministic per-group ordering without a second exchange — then
    truncated to {_SFP_DEPTH}, so collected state per session is bounded.
    The final rollup is |distinct paths| ≤ |types|^{_SFP_DEPTH} rows, and
    the top-k is a TakeOrdered, not a global sort."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = e.withColumn(
        "new_session",
        F.when(F.lag("ts").over(w).isNull(), 1)
        .when(gap_us > 1800 * 1000 * 1000, 1)
        .otherwise(0),
    )
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(cum))
    paths = (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.expr(
                "array_join(slice(transform(array_sort(collect_list("
                "struct(unix_micros(ts) AS t, event_id, event_type AS et))), "
                f"x -> x.et), 1, {_SFP_DEPTH}), '>')"
            ).alias("path"),
            F.count("*").alias("depth"),
        )
    )
    ranked = (
        paths.groupBy("path")
        .agg(
            F.count("*").alias("n_sessions"),
            div_round4(
                F.sum(F.least(F.col("depth"), F.lit(_SFP_DEPTH))).cast("double"),
                F.count("*"),
            ).alias("avg_prefix_len"),
        )
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.orderBy(F.col("n_sessions").desc(), "path")
            ),
        )
        .filter(F.col("rnk") <= _SFP_TOPK)
    )
    return ranked.select("path", "n_sessions", "avg_prefix_len", "rnk")


# ---------------------------------------------------------------------------
# events_pattern_match_sequence — MATCH_RECOGNIZE-style regex over sessions
# ---------------------------------------------------------------------------

# Event-type alphabet maps to its (distinct) first letter: click->c,
# error->e, purchase->p, signup->s, view->v. The conversion pattern is a
# view followed by a purchase with only clicks/errors in between.
_SEQ_PATTERN = "v[ce]*p"


@query(
    "events_pattern_match_sequence",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN LAG(ts) OVER w IS NULL THEN 1
                    WHEN EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > 1800000000 THEN 1
                    ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts, event_id, event_type,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS session_id
        FROM flagged
    ), sym AS (
        SELECT user_id, session_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               STRING_AGG(SUBSTR(event_type, 1, 1), '' ORDER BY ts, event_id)
                   AS symbols
        FROM sessions
        GROUP BY user_id, session_id
    )
    SELECT user_id, session_id, n_events, symbols,
           CAST(LEN(REGEXP_EXTRACT_ALL(symbols, '{_SEQ_PATTERN}')) AS BIGINT)
               AS n_matches,
           LEN(REGEXP_EXTRACT_ALL(symbols, '{_SEQ_PATTERN}')) > 0 AS converted
    FROM sym
    """,
)
def events_pattern_match_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE for Spark, the compile-to-regex strategy: Spark has
    no row-pattern matching clause (Flink/Trino's MATCH_RECOGNIZE), so the
    engine sessionizes, folds each session's ordered event types into a
    compact symbol string, and runs the row pattern as a REGEX over that
    string — here ``{_SEQ_PATTERN}`` = "a view converting to a purchase
    with only clicks/errors between" — reporting per-session match counts.
    Non-overlapping leftmost-match counting is the same contract in Java
    regex and RE2, and greedy quantifiers agree on this backtracking-free
    pattern, so the count is engine-portable.

    Determinism: the symbol fold is array_sort over (ts, event_id, sym)
    structs collected per session — collect_list order is partition-
    nondeterministic, the sort makes the string exact (the oracle's
    STRING_AGG ... ORDER BY twin).

    Scale shape: ONE shuffle on user_id covers sessionize lag, session-id
    running sum, and the per-session collect (Catalyst reuses the
    Exchange); per-session state is bounded by session length (30-min gap
    caps it), never by user history. The pattern evaluation is a JVM
    regexp over a session-sized string — no Python, no second shuffle."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = e.withColumn(
        "new_session",
        F.when(F.lag("ts").over(w).isNull(), 1)
        .when(gap_us > 1800 * 1000 * 1000, 1)
        .otherwise(0),
    )
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(cum))
    sym = sessions.groupBy("user_id", "session_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.array_sort(
            F.collect_list(
                F.struct("ts", "event_id", F.substring("event_type", 1, 1).alias("sym"))
            )
        ).alias("seq"),
    )
    symbols = F.concat_ws("", F.expr("transform(seq, x -> x.sym)"))
    n_matches = F.regexp_count(symbols, F.lit(_SEQ_PATTERN))
    return sym.select(
        "user_id",
        "session_id",
        "n_events",
        symbols.alias("symbols"),
        n_matches.cast("long").alias("n_matches"),
        (n_matches > 0).alias("converted"),
    )
