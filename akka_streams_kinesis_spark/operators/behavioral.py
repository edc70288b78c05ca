"""Behavioral analytics over the event stream: conversion funnels and
cohort retention — the queries an events pipeline (the reference's whole
reason to exist: partitioned, time-ordered event delivery,
KinesisSource.scala:59-63) feeds downstream.

Both are pure DataFrame plans: per-user aggregates + broadcast-or-shuffle
joins on user_id, no window state, no Python. At 100 TB the per-user
aggregates partial-aggregate map-side and every join shares the user_id
shuffle key.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions import DIV_ROUND4_DUCK, MONEY_CENTS_DUCK, div_round4, money_cents
from ..io import table
from ..registry import query
from ..shared import transient_persist


@query(
    "behavior_funnel_view_click_purchase",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, MIN(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view
        WHERE e.event_type = 'click'
        GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, MIN(e.ts) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t_click
        WHERE e.event_type = 'purchase'
        GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_viewed,
           (SELECT COUNT(*) FROM c) AS n_clicked_after_view,
           (SELECT COUNT(*) FROM p) AS n_purchased_after_click
    """,
)
def funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users who viewed, then clicked strictly
    after their first view, then purchased strictly after that first
    qualifying click. Each stage is MIN-timestamp per user joined to the
    previous stage with a time inequality — three aggregates and two joins,
    all sharing the user_id key, so the whole funnel is one shuffle
    partitioning reused across stages."""
    e = table(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v.select(F.col("user_id").alias("v_uid"), "t_view"),
              (F.col("user_id") == F.col("v_uid")) & (F.col("ts") > F.col("t_view")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c.select(F.col("user_id").alias("c_uid"), "t_click"),
              (F.col("user_id") == F.col("c_uid")) & (F.col("ts") > F.col("t_click")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count("*").alias("n_viewed"))
        .crossJoin(c.agg(F.count("*").alias("n_clicked_after_view")))
        .crossJoin(p.agg(F.count("*").alias("n_purchased_after_click")))
    )


@query(
    "behavior_weekly_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, CAST(DATE_TRUNC('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
        FROM events GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT e.user_id, f.cohort_week,
               CAST(DATE_DIFF('week', f.cohort_week, DATE_TRUNC('week', e.ts)) AS BIGINT)
                   AS week_offset
        FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort_week, week_offset, COUNT(*) AS n_active_users
    FROM activity
    GROUP BY cohort_week, week_offset
    """,
)
def weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first-activity week, counted in
    each later week they return. first-week per user + a user_id join +
    distinct — the distinct rides the same (user, cohort, offset) hash
    aggregate, map-side deduped. DATE_TRUNC('week') is ISO-Monday on both
    engines, and week_offset is integer week arithmetic on the truncated
    dates, so the bucketing is engine-stable."""
    e = table(spark, sf_dir, "events")
    firsts = e.groupBy(F.col("user_id").alias("f_uid")).agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        e.join(firsts, F.col("user_id") == F.col("f_uid"))
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week")) / 7
            ).cast("long").alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count("*").alias("n_active_users")
    )


@query(
    "behavior_dau_wau_stickiness",
    oracle="""
    WITH user_days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), dau AS (
        SELECT day, COUNT(*) AS dau FROM user_days GROUP BY day
    ), contrib AS (
        -- a user active on day d counts toward WAU of days d .. d+6
        SELECT DISTINCT user_id, day + CAST(o.i AS INTEGER) AS wau_day
        FROM user_days CROSS JOIN UNNEST(RANGE(0, 7)) AS o(i)
    ), wau AS (
        SELECT wau_day AS day, COUNT(*) AS wau FROM contrib GROUP BY wau_day
    )
    SELECT d.day, d.dau, w.wau,
           ROUND(d.dau * 1.0 / w.wau, 4) AS stickiness
    FROM dau d JOIN wau w USING (day)
    """,
)
def behavior_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness (DAU÷WAU), the product
    engagement headline. The trailing-window distinct count does NOT
    re-scan 7 days per day: each (user, active-day) pair fans out to the
    7 window days it contributes to, and one distinct+count aggregate
    yields every day's WAU — O(7·|user-days|) work total, versus
    O(7·days·users) for a per-day band self-join. Same shape at any
    window length; the fan-out constant IS the window."""
    e = table(spark, sf_dir, "events")
    user_days = transient_persist(
        e.select("user_id", F.to_date("ts").alias("day")).distinct()
    )
    dau = user_days.groupBy("day").agg(F.count("*").alias("dau"))
    contrib = (
        user_days.select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
            "day",
        )
        .select("user_id", F.date_add("day", F.col("i")).alias("day"))
        .distinct()
    )
    wau = contrib.groupBy("day").agg(F.count("*").alias("wau"))
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.round(F.col("dau") * 1.0 / F.col("wau"), 4).alias("stickiness"),
        )
    )


@query(
    "behavior_longest_streak",
    oracle="""
    WITH user_days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), islands AS (
        SELECT user_id, day,
               day - CAST(ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY day
               ) AS INTEGER) AS grp
        FROM user_days
    ), streaks AS (
        SELECT user_id, COUNT(*) AS streak_len, MIN(day) AS streak_start
        FROM islands GROUP BY user_id, grp
    )
    SELECT user_id,
           MAX(streak_len) AS longest_streak,
           ARG_MIN(streak_start, CONCAT(
               LPAD(CAST(100000 - streak_len AS VARCHAR), 6, '0'),
               CAST(streak_start AS VARCHAR))) AS longest_streak_start,
           COUNT(*) AS n_streaks
    FROM streaks
    GROUP BY user_id
    """,
)
def behavior_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the
    gaps-and-islands idiom: within each user, ``day − row_number(day)``
    is constant exactly along runs of consecutive dates, so one window
    plus two aggregates finds every streak. The earliest longest streak
    is picked via an order-key argmin (length desc, start asc) encoded
    portably, keeping the tiebreak engine-deterministic.

    Plan: per-user window (high-cardinality key) → two hash aggregates;
    everything after the distinct-day reduction is proportional to
    active user-days, not events."""
    e = table(spark, sf_dir, "events")
    user_days = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    islands = user_days.withColumn(
        "grp", F.date_sub("day", F.row_number().over(w))
    )
    streaks = islands.groupBy("user_id", "grp").agg(
        F.count("*").alias("streak_len"), F.min("day").alias("streak_start")
    )
    order_key = F.concat(
        F.lpad((F.lit(100000) - F.col("streak_len")).cast("string"), 6, "0"),
        F.col("streak_start").cast("string"),
    )
    return streaks.groupBy("user_id").agg(
        F.max("streak_len").alias("longest_streak"),
        F.expr(
            "min_by(streak_start, concat(lpad(cast(100000 - streak_len as string), 6, '0'), cast(streak_start as string)))"
        ).alias("longest_streak_start"),
        F.count("*").alias("n_streaks"),
    )


@query(
    "behavior_spend_pareto",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               SUM({MONEY_CENTS_DUCK.format(col="value")}) AS spend_cents
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    ), ranked AS (
        SELECT spend_cents,
               NTILE(10) OVER (ORDER BY spend_cents DESC, user_id) AS decile
        FROM per_user
    )
    SELECT decile,
           COUNT(*) AS n_users,
           CAST(SUM(spend_cents) AS DOUBLE) / 100.0 AS decile_spend,
           {DIV_ROUND4_DUCK.format(
               num="SUM(SUM(spend_cents)) OVER (ORDER BY decile)",
               den="SUM(SUM(spend_cents)) OVER ()")} AS cum_share
    FROM ranked
    GROUP BY decile
    """,
)
def behavior_spend_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/Lorenz concentration of purchase value: users ranked by
    total spend, cut into deciles, with each decile's spend and the
    cumulative share — the "top 10% of users drive X% of revenue"
    number. Spend rides exact BIGINT cents end to end (money_cents — a
    double→DECIMAL cast is engine-version-defined at the half-cent), so
    the ranking and the shares are exact and engine-identical; the share
    rounds through the div_round4 IEEE idiom.

    Plan: the ONLY per-event work is the per-user aggregate (map-side
    partials on a high-cardinality key); the NTILE window then sorts the
    per-USER aggregate — |users|, orders of magnitude below |events| —
    and the decile rollup plus share windows run over 10 rows."""
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    per_user = e.groupBy("user_id").agg(
        F.sum(money_cents(F.col("value"))).alias("spend_cents")
    )
    w = Window.orderBy(F.col("spend_cents").desc(), "user_id")
    ranked = per_user.withColumn("decile", F.ntile(10).over(w))
    deciles = ranked.groupBy("decile").agg(
        F.count("*").alias("n_users"),
        F.sum("spend_cents").alias("dec_cents"),
    )
    wcum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    return deciles.select(
        "decile",
        "n_users",
        (F.col("dec_cents").cast("double") / F.lit(100.0)).alias("decile_spend"),
        div_round4(
            F.sum("dec_cents").over(wcum), F.sum("dec_cents").over(wall)
        ).alias("cum_share"),
    )


# ---------------------------------------------------------------------------
# behavior_rfm_segments — recency/frequency/monetary quartile segmentation
# ---------------------------------------------------------------------------


@query(
    "behavior_rfm_segments",
    oracle="""
    WITH p AS (
        SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    ), per_user AS (
        SELECT user_id,
               MAX(ts) AS last_ts,
               COUNT(*) AS frequency,
               ROUND(SUM(value), 2) AS monetary
        FROM p GROUP BY user_id
    ), anchored AS (
        SELECT u.user_id, u.frequency, u.monetary,
               CAST(FLOOR((EPOCH_US((SELECT MAX(ts) FROM p)) - EPOCH_US(u.last_ts))
                          / 86400000000.0) AS BIGINT) AS recency_days
        FROM per_user u
    )
    SELECT user_id, recency_days, frequency, monetary,
           NTILE(4) OVER (ORDER BY recency_days, user_id)        AS r_quartile,
           NTILE(4) OVER (ORDER BY frequency DESC, user_id)      AS f_quartile,
           NTILE(4) OVER (ORDER BY monetary DESC, user_id)       AS m_quartile
    FROM anchored
    """,
)
def behavior_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per purchasing user, days since last purchase
    (anchored to the dataset's latest purchase so the metric is
    reproducible), purchase count, and 2dp-rounded spend, each cut into
    quartiles — the classic lifecycle-marketing segmentation, and the
    canonical "three rankings of one aggregate" workload.

    Scale notes: the per-user aggregate is one user_id shuffle; the
    anchor timestamp is a broadcast single row. The three NTILEs are
    global rankings — fine at per-user-aggregate cardinality (they rank
    users, not events), and each orders by (metric, user_id) with
    monetary pre-rounded so the quartile boundaries are engine-exact.
    Recency is integer microseconds floor-divided to days — no float
    date math."""
    e = table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase")
    per_user = p.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count("*").alias("frequency"),
        F.round(F.sum("value"), 2).alias("monetary"),
    )
    anchor = p.agg(F.max("ts").alias("anchor_ts"))
    anchored = per_user.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        "frequency",
        "monetary",
        F.floor(
            (F.unix_micros("anchor_ts") - F.unix_micros("last_ts"))
            / F.lit(86400000000.0)
        )
        .cast("bigint")
        .alias("recency_days"),
    )
    return anchored.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(4).over(Window.orderBy("recency_days", "user_id")).alias("r_quartile"),
        F.ntile(4)
        .over(Window.orderBy(F.col("frequency").desc(), "user_id"))
        .alias("f_quartile"),
        F.ntile(4)
        .over(Window.orderBy(F.col("monetary").desc(), "user_id"))
        .alias("m_quartile"),
    )


# ---------------------------------------------------------------------------
# behavior_cohort_ltv_triangle — acquisition-cohort cumulative LTV curves
# ---------------------------------------------------------------------------


@query(
    "behavior_cohort_ltv_triangle",
    oracle="""
    WITH cohorts AS (
        SELECT o_custkey,
               CAST(DATE_TRUNC('month', MIN(o_orderdate)) AS TIMESTAMP) AS cohort_month
        FROM orders GROUP BY o_custkey
    ), sized AS (
        SELECT cohort_month, COUNT(*) AS cohort_size FROM cohorts GROUP BY 1
    ), aged AS (
        SELECT c.cohort_month,
               (year(o.o_orderdate) - year(c.cohort_month)) * 12
                 + (month(o.o_orderdate) - month(c.cohort_month)) AS age_months,
               ROUND(SUM(o.o_totalprice), 2) AS revenue,
               COUNT(DISTINCT o.o_custkey)   AS active_customers
        FROM orders o JOIN cohorts c ON o.o_custkey = c.o_custkey
        GROUP BY 1, 2
    )
    SELECT a.cohort_month,
           CAST(a.age_months AS BIGINT) AS age_months,
           s.cohort_size,
           a.active_customers,
           a.revenue,
           FLOOR(CAST(SUM(a.revenue) OVER (
                    PARTITION BY a.cohort_month ORDER BY a.age_months
                ) AS DOUBLE) * 10000.0 / s.cohort_size + 0.5) / 10000.0
             AS cum_ltv_per_customer
    FROM aged a JOIN sized s USING (cohort_month)
    """,
)
def behavior_cohort_ltv_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV triangle: customers grouped by acquisition month, and
    for each cohort × age-in-months cell the period revenue, active
    customers, and the cumulative lifetime value per acquired customer —
    the table every growth team reads diagonally (same calendar month)
    and horizontally (cohort quality over time).

    Scale shape: the cohort assignment is a co-partitioned self-join on
    o_custkey (one shuffle each side, AQE picks the strategy); the
    triangle itself is |months|² cells, so the cumulative window runs
    over a dimension-sized frame, never the fact table. Age is computed
    with exact integer year/month arithmetic (identical in both engines,
    no months_between float edge cases); cumulative LTV divides the
    running sum of 2dp-rounded revenues — identical accumulation order
    per cohort — by the cohort size."""
    o = table(spark, sf_dir, "orders")
    cohorts = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort_month")
    )
    sized = cohorts.groupBy("cohort_month").agg(
        F.count("*").alias("cohort_size")
    )
    aged = (
        o.join(cohorts, "o_custkey")
        .groupBy(
            "cohort_month",
            (
                (F.year("o_orderdate") - F.year("cohort_month")) * 12
                + (F.month("o_orderdate") - F.month("cohort_month"))
            ).cast("bigint").alias("age_months"),
        )
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.countDistinct("o_custkey").alias("active_customers"),
        )
    )
    w_cum = (
        Window.partitionBy("cohort_month")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        aged.join(F.broadcast(sized), "cohort_month")
        .select(
            "cohort_month",
            "age_months",
            "cohort_size",
            "active_customers",
            "revenue",
            div_round4(
                F.sum("revenue").over(w_cum).cast("double"), F.col("cohort_size")
            ).alias("cum_ltv_per_customer"),
        )
    )


# ---------------------------------------------------------------------------
# behavior_growth_accounting — weekly new / retained / resurrected / churned
# ---------------------------------------------------------------------------


@query(
    "behavior_growth_accounting",
    oracle="""
    WITH weekly AS (
        SELECT DISTINCT user_id,
               CAST(DATE_TRUNC('week', ts) AS TIMESTAMP) AS week
        FROM events
    ), classified AS (
        SELECT user_id, week,
               LAG(week)  OVER (PARTITION BY user_id ORDER BY week) AS prev_week,
               LEAD(week) OVER (PARTITION BY user_id ORDER BY week) AS next_week
        FROM weekly
    ), flows AS (
        SELECT week,
               CAST(SUM(CASE WHEN prev_week IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
               CAST(SUM(CASE WHEN prev_week = week - INTERVAL 7 DAY THEN 1 ELSE 0 END) AS BIGINT) AS retained,
               CAST(SUM(CASE WHEN prev_week IS NOT NULL
                         AND prev_week < week - INTERVAL 7 DAY THEN 1 ELSE 0 END) AS BIGINT) AS resurrected
        FROM classified GROUP BY week
    ), churn AS (
        SELECT week + INTERVAL 7 DAY AS week, COUNT(*) AS churned
        FROM classified
        WHERE next_week IS NULL OR next_week > week + INTERVAL 7 DAY
        GROUP BY 1
    )
    SELECT f.week, f.new_users, f.retained, f.resurrected,
           COALESCE(c.churned, 0) AS churned
    FROM flows f LEFT JOIN churn c USING (week)
    """,
)
def behavior_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting: every active user classified as NEW
    (first week ever), RETAINED (also active the week before), or
    RESURRECTED (returning after a gap), plus CHURNED (active last week,
    absent this week, attributed to the week they went missing). The
    four flows reconcile to the active-user delta — the standard
    startup growth-accounting identity.

    Scale shape: the fact table collapses to DISTINCT (user, week) in
    one shuffle; LAG and LEAD share one user-partitioned sort; the
    per-week rollup is a second shuffle on |weeks| groups. Churn is
    derived from the SAME windowed pass (a user churns after their last
    week, or across any gap) — no week-vs-week self-join of activity
    sets. Week arithmetic is exact timestamp + 7-day intervals on
    Monday-truncated weeks, identical in both engines."""
    e = table(spark, sf_dir, "events")
    weekly = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    w_u = Window.partitionBy("user_id").orderBy("week")
    classified = weekly.select(
        "user_id",
        "week",
        F.lag("week").over(w_u).alias("prev_week"),
        F.lead("week").over(w_u).alias("next_week"),
    )
    week_len = F.expr("INTERVAL 7 DAY")
    flows = classified.groupBy("week").agg(
        F.sum(F.when(F.col("prev_week").isNull(), 1).otherwise(0)).alias("new_users"),
        F.sum(
            F.when(F.col("prev_week") == F.col("week") - week_len, 1).otherwise(0)
        ).alias("retained"),
        F.sum(
            F.when(
                F.col("prev_week").isNotNull()
                & (F.col("prev_week") < F.col("week") - week_len),
                1,
            ).otherwise(0)
        ).alias("resurrected"),
    )
    churn = (
        classified.filter(
            F.col("next_week").isNull()
            | (F.col("next_week") > F.col("week") + week_len)
        )
        .groupBy((F.col("week") + week_len).alias("week"))
        .agg(F.count("*").alias("churned"))
    )
    return flows.join(churn, "week", "left").select(
        "week",
        "new_users",
        "retained",
        "resurrected",
        F.coalesce(F.col("churned"), F.lit(0)).alias("churned"),
    )


# ---------------------------------------------------------------------------
# events_funnel_time_bounded — funnel with per-step time windows
# ---------------------------------------------------------------------------

# step deadlines: click within 1h of a view; purchase within 24h of a
# QUALIFYING click — exact integer microseconds on both engines
_FTB_CLICK_US = 3_600_000_000
_FTB_PURCHASE_US = 86_400_000_000


@query(
    "events_funnel_time_bounded",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, event_id, event_type, EPOCH_US(ts) AS t
        FROM events
        WHERE event_type IN ('view', 'click', 'purchase')
    ), s1 AS (
        SELECT *,
               MAX(CASE WHEN event_type = 'view' THEN t END) OVER (
                   PARTITION BY user_id ORDER BY t, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS last_view_t
        FROM ordered
    ), s2 AS (
        SELECT *,
               CASE WHEN event_type = 'click'
                     AND last_view_t IS NOT NULL
                     AND t - last_view_t <= {_FTB_CLICK_US}
                    THEN TRUE ELSE FALSE END AS q_click
        FROM s1
    ), s3 AS (
        SELECT *,
               MAX(CASE WHEN q_click THEN t END) OVER (
                   PARTITION BY user_id ORDER BY t, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS last_qclick_t
        FROM s2
    )
    SELECT CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_views,
           CAST(SUM(CASE WHEN q_click THEN 1 ELSE 0 END) AS BIGINT)
               AS n_qualified_clicks,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                          AND last_qclick_t IS NOT NULL
                          AND t - last_qclick_t <= {_FTB_PURCHASE_US}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_qualified_purchases
    FROM s3
    """,
)
def events_funnel_time_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded conversion funnel: a click only counts if it follows a
    view by ≤1 h, and a purchase only if it follows a QUALIFYING click by
    ≤24 h. The unbounded funnel (behavior_funnel_view_click_purchase)
    overstates conversion by crediting week-later purchases; bounded
    steps are how marketing attribution actually defines conversion.

    Scale shape: the classic formulation is two time-band self-joins
    (events×events within Δt) — quadratic in per-user activity. Here both
    step gates are conditional running MAXes over ONE user-partitioned
    sort (Catalyst plans a single Exchange+Sort feeding both Window
    nodes — the strictly-prior frame also makes same-instant events
    non-self-matching), then a single global rollup. Linear, one
    shuffle, exact integer-microsecond deadlines."""
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    t = F.unix_micros("ts")
    w_prior = (
        Window.partitionBy("user_id")
        .orderBy(t, "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    s1 = e.select(
        "user_id",
        "event_id",
        "event_type",
        t.alias("t"),
        F.max(F.when(F.col("event_type") == "view", t)).over(w_prior).alias(
            "last_view_t"
        ),
    )
    s2 = s1.withColumn(
        "q_click",
        (F.col("event_type") == "click")
        & F.col("last_view_t").isNotNull()
        & (F.col("t") - F.col("last_view_t") <= _FTB_CLICK_US),
    )
    w_prior2 = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    s3 = s2.withColumn(
        "last_qclick_t",
        F.max(F.when(F.col("q_click"), F.col("t"))).over(w_prior2),
    )
    return s3.agg(
        F.sum((F.col("event_type") == "view").cast("int"))
        .cast("bigint")
        .alias("n_views"),
        F.sum(F.col("q_click").cast("int")).cast("bigint").alias("n_qualified_clicks"),
        F.sum(
            (
                (F.col("event_type") == "purchase")
                & F.col("last_qclick_t").isNotNull()
                & (F.col("t") - F.col("last_qclick_t") <= _FTB_PURCHASE_US)
            ).cast("int")
        )
        .cast("bigint")
        .alias("n_qualified_purchases"),
    )


# ---------------------------------------------------------------------------
# behavior_segment_migration_matrix — period-over-period segment transitions
# ---------------------------------------------------------------------------

_SMM_SPLIT = "2024-01-16"   # events span 2024-01-01 .. 2024-01-30
_SMM_TILES = 3              # spend tertiles: high / mid / low


@query(
    "behavior_segment_migration_matrix",
    oracle=f"""
    WITH spend AS (
        SELECT user_id,
               CASE WHEN ts < TIMESTAMP '{_SMM_SPLIT}' THEN 'p1' ELSE 'p2' END AS period,
               ROUND(SUM(value), 2) AS spend
        FROM events
        GROUP BY 1, 2
    ), seg AS (
        SELECT user_id, period,
               'T' || NTILE({_SMM_TILES}) OVER (
                   PARTITION BY period ORDER BY spend DESC, user_id
               ) AS segment
        FROM spend
    ), p1 AS (SELECT user_id, segment FROM seg WHERE period = 'p1'),
       p2 AS (SELECT user_id, segment FROM seg WHERE period = 'p2')
    SELECT COALESCE(p1.segment, 'absent') AS seg_from,
           COALESCE(p2.segment, 'absent') AS seg_to,
           COUNT(*) AS n_users
    FROM p1 FULL OUTER JOIN p2 USING (user_id)
    GROUP BY 1, 2
    """,
)
def behavior_segment_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment migration matrix: users bucketed into spend tertiles
    (T1=top) independently in each half of the observation window, plus
    'absent' for users active in only one half; the (from, to) transition
    counts are the churn/upsell dashboard every CRM review starts from —
    the off-diagonal cells ARE the story.

    Scale shape: ONE pass collapses events to (user, period, spend); the
    NTILE windows sort that per-user aggregate (never events) with
    engine-exact boundaries (2dp-rounded spend, user_id tiebreak — the
    behavior_rfm_segments discipline); the period self-alignment is a
    full-outer join of two projections of the SAME aggregate, and the
    matrix output is ≤ (tiles+1)² rows."""
    e = table(spark, sf_dir, "events")
    spend = (
        e.groupBy(
            "user_id",
            F.when(
                F.col("ts") < F.lit(_SMM_SPLIT).cast("timestamp"), "p1"
            ).otherwise("p2").alias("period"),
        )
        .agg(F.round(F.sum("value"), 2).alias("spend"))
    )
    w = Window.partitionBy("period").orderBy(F.col("spend").desc(), "user_id")
    seg = spend.select(
        "user_id",
        "period",
        F.concat(F.lit("T"), F.ntile(_SMM_TILES).over(w).cast("string")).alias(
            "segment"
        ),
    )
    p1 = seg.filter(F.col("period") == "p1").select(
        "user_id", F.col("segment").alias("_s1")
    )
    p2 = seg.filter(F.col("period") == "p2").select(
        "user_id", F.col("segment").alias("_s2")
    )
    return (
        p1.join(p2, "user_id", "full_outer")
        .groupBy(
            F.coalesce("_s1", F.lit("absent")).alias("seg_from"),
            F.coalesce("_s2", F.lit("absent")).alias("seg_to"),
        )
        .agg(F.count("*").alias("n_users"))
    )


# ---------------------------------------------------------------------------
# behavior_ab_test_lift — deterministic assignment + exact-integer lift
# ---------------------------------------------------------------------------

# Deterministic 50/50 arm assignment from a salted md5 of the user id —
# the same stateless-predicate discipline as split_train_valid_test
# (importance.py): no assignment table, no shuffle, reproducible across
# engines and reruns. Conversion = the user has at least one purchase.
_AB_SALT = "exp42"


@query(
    "behavior_ab_test_lift",
    oracle=f"""
    WITH assigned AS (
        SELECT user_id,
               CASE WHEN SUBSTR(MD5('{_AB_SALT}|' || CAST(user_id AS VARCHAR)), 1, 2) < '80'
                    THEN 'control' ELSE 'treatment' END AS arm,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM events
        GROUP BY user_id
    ), arms AS (
        SELECT arm,
               CAST(COUNT(*) AS BIGINT)       AS n_users,
               CAST(SUM(converted) AS BIGINT) AS n_converted,
               CAST((10000 * SUM(converted)) // COUNT(*) AS BIGINT)
                   AS conv_rate4
        FROM assigned
        GROUP BY arm
    )
    SELECT a.arm, a.n_users, a.n_converted, a.conv_rate4,
           a.conv_rate4
             - (SELECT conv_rate4 FROM arms WHERE arm = 'control')
               AS lift_vs_control4
    FROM arms a
    """,
)
def behavior_ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout over the event log: deterministic salted-md5
    50/50 arm assignment (the same stateless hash-predicate discipline as
    the train/valid/test splits — no assignment table, no membership
    join, reproducible across engines, reruns and backfills), per-arm
    user counts, purchase-conversion rates, and the treatment-vs-control
    lift — all in exact 1e4-scale integer arithmetic so the readout is
    bit-identical regardless of aggregation order.

    Scale shape: ONE hash-agg collapses the event log to per-user
    (arm, converted) rows — the shuffle carries users, not events, and
    the arm hash is computed map-side; the per-arm aggregate is 2 rows
    and the control rate joins back as a broadcast scalar. At 100 TB
    this is the cheapest possible experiment readout: no event ever
    crosses the wire twice."""
    e = table(spark, sf_dir, "events")
    # first md5 byte < 0x80 → control: the hex-string lexicographic
    # compare (the split_train_valid_test idiom, curation.py) needs no
    # hex→int conversion and behaves identically in both engines
    arm = F.when(
        F.substring(
            F.md5(F.concat(F.lit(_AB_SALT + "|"), F.col("user_id").cast("string"))),
            1,
            2,
        )
        < "80",
        F.lit("control"),
    ).otherwise(F.lit("treatment"))
    assigned = (
        e.groupBy("user_id")
        .agg(
            F.max(
                (F.col("event_type") == "purchase").cast("int")
            ).alias("converted"),
        )
        .withColumn("arm", arm)
    )
    arms = assigned.groupBy("arm").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("converted").cast("long").alias("n_converted"),
        F.expr("CAST((10000 * sum(converted)) DIV count(*) AS BIGINT)").alias(
            "conv_rate4"
        ),
    )
    # 1-row aggregate (never 0 rows): if the control arm were empty the
    # oracle's scalar subquery yields NULL lift while a crossJoin against
    # an EMPTY control frame would drop both arm rows — max() over the
    # filtered frame returns the rate or NULL, matching the subquery in
    # the degenerate case too
    control = arms.filter(F.col("arm") == "control").agg(
        F.max("conv_rate4").alias("_ctl4")
    )
    return (
        arms.crossJoin(F.broadcast(control))
        .select(
            "arm",
            "n_users",
            "n_converted",
            "conv_rate4",
            (F.col("conv_rate4") - F.col("_ctl4")).alias("lift_vs_control4"),
        )
    )


# ---------------------------------------------------------------------------
# behavior_next_event_prediction — Markov argmax baseline with holdout eval
# ---------------------------------------------------------------------------


@query(
    "behavior_next_event_prediction",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type, ts, event_id,
               LAG(event_type) OVER w AS prev_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rdesc
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), train_pairs AS (
        SELECT prev_type, event_type
        FROM seq WHERE prev_type IS NOT NULL AND rdesc > 1
    ), model AS (
        SELECT prev_type, event_type AS predicted, cnt FROM (
            SELECT prev_type, event_type, COUNT(*) AS cnt,
                   ROW_NUMBER() OVER (PARTITION BY prev_type
                                      ORDER BY COUNT(*) DESC, event_type) AS rn
            FROM train_pairs GROUP BY prev_type, event_type
        ) WHERE rn = 1
    ), eval_rows AS (
        SELECT s.prev_type, s.event_type AS actual, m.predicted
        FROM seq s JOIN model m ON m.prev_type = s.prev_type
        WHERE s.rdesc = 1 AND s.prev_type IS NOT NULL
    )
    SELECT prev_type, predicted,
           CAST(COUNT(*) AS BIGINT) AS n_eval,
           CAST(SUM(CASE WHEN actual = predicted THEN 1 ELSE 0 END) AS BIGINT)
               AS n_correct,
           FLOOR(SUM(CASE WHEN actual = predicted THEN 1 ELSE 0 END) * 10000.0
                 / COUNT(*) + 0.5) / 10000.0 AS accuracy4
    FROM eval_rows
    GROUP BY prev_type, predicted
    """,
)
def behavior_next_event_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-correct Markov next-event baseline with a per-user holdout:
    every user's LAST event (by ts, event_id) is held out; the transition
    model (argmax next-type per previous-type, ties broken by lexical min)
    is fit on the REMAINING consecutive pairs only — the held-out target
    never trains the model that predicts it, the temporal-split
    discipline every sequence-model eval needs. Emits per-context
    prediction, eval support, and accuracy.

    Plan: ONE per-user ordered window pass produces both the lag pairs
    and the holdout flag (no self-join, no second shuffle of events);
    the model is a |types|²-row aggregate broadcast back onto the
    |users|-row eval frame. At 100 TB the only event-scale work is the
    window, which shares the user_id exchange with every other
    behavioral operator.

    Determinism: counts are exact integers, the argmax tie-break is
    total, accuracy rounds through the FLOOR-1e4 idiom."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wdesc = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    seq = e.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.row_number().over(wdesc).alias("rdesc"),
    )
    train_pairs = seq.filter(
        F.col("prev_type").isNotNull() & (F.col("rdesc") > 1)
    )
    wrank = Window.partitionBy("prev_type").orderBy(
        F.col("cnt").desc(), "event_type"
    )
    model = (
        train_pairs.groupBy("prev_type", "event_type")
        .agg(F.count("*").alias("cnt"))
        .withColumn("rn", F.row_number().over(wrank))
        .filter(F.col("rn") == 1)
        .select("prev_type", F.col("event_type").alias("predicted"))
    )
    eval_rows = seq.filter(
        (F.col("rdesc") == 1) & F.col("prev_type").isNotNull()
    ).join(F.broadcast(model), "prev_type")
    correct = (F.col("event_type") == F.col("predicted")).cast("int")
    return eval_rows.groupBy("prev_type", "predicted").agg(
        F.count("*").cast("long").alias("n_eval"),
        F.sum(correct).cast("long").alias("n_correct"),
        (F.floor(F.sum(correct) * 10000.0 / F.count("*") + 0.5) / 10000.0).alias(
            "accuracy4"
        ),
    )
