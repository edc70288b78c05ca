"""As-of (point-in-time) join — the union+window algorithm that scales.

Spark has no ASOF JOIN operator (DuckDB does). The naive expression —
inequality join + row_number — explodes quadratically per key at 100 TB.
The scale-correct algorithm used here:

1. tag both sides and UNION them (left rows carry NULL right-payload),
2. one shuffle on (key), sort by (ts, side-order),
3. ``last(right_payload, ignorenulls)`` over rows-unbounded-preceding ≡
   "most recent right row at or before my timestamp",
4. keep left rows.

One shuffle + one sort, linear in input — the same cost profile as a
sort-merge join, and skew is handled by AQE.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions import MONEY_CENTS_DUCK, cents_to_money_str, money_cents, money_str_duck
from ..io import table
from ..registry import query


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    strict: bool = False,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the nearest right row matching ``on``:
    ``backward`` (default) takes the most recent right row with
    ``right[right_ts] <= left[left_ts]`` (``<`` when strict); ``forward``
    takes the earliest right row with ``right[right_ts] >= left[left_ts]``
    (``>`` when strict) — the same union+window pass over the opposite sort
    order.

    Returns the left columns + the requested right payload columns
    (NULL when no prior/next right row exists).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = left.columns
    # side ordering: right rows sort before left rows at equal timestamps so
    # a non-strict as-of sees same-instant right rows; strict flips that.
    right_order = 1 if strict else 0
    left_order = 0 if strict else 1

    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(left_order).alias("_side"),
        F.struct(*lcols).alias("_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_payload],
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(right_order).alias("_side"),
        F.lit(None).cast(l_tagged.schema["_left"].dataType).alias("_left"),
        *[F.col(c).alias(f"_r_{c}") for c in right_payload],
    )
    unioned = l_tagged.unionByName(r_tagged)
    ts_order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    w = (
        Window.partitionBy("_k")
        .orderBy(ts_order, F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "_side",
        "_left",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}") for c in right_payload],
    )
    out = filled.filter(F.col("_side") == left_order).select(
        *[F.col(f"_left.{c}").alias(c) for c in lcols],
        *[F.col(f"_r_{c}").alias(f"last_{c}") for c in right_payload],
    )
    return out


@query(
    "asof_join_last_login",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           ROUND(p.value, 2) AS purchase_value,
           l.ts              AS last_login_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') l
      ON p.user_id = l.user_id AND p.ts >= l.ts
    """,
)
def asof_last_login(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the most recent signup event of the same user at
    or before the purchase. Oracle uses DuckDB's native ASOF JOIN; our side
    uses the union+window algorithm above (one shuffle, no inequality-join
    blow-up)."""
    e = table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase")
    logins = e.filter(F.col("event_type") == "signup").select("user_id", "ts")
    joined = asof_join(
        purchases,
        logins.withColumnRenamed("ts", "login_ts"),
        on="user_id",
        left_ts="ts",
        right_ts="login_ts",
        right_payload=["login_ts"],
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.round("value", 2).alias("purchase_value"),
        F.col("last_login_ts"),
    )


@query(
    "asof_forward_time_to_purchase",
    oracle="""
    SELECT c.event_id, c.user_id, c.ts,
           (SELECT MIN(p.ts) FROM events p
            WHERE p.event_type = 'purchase'
              AND p.user_id = c.user_id
              AND p.ts >= c.ts) AS next_purchase_ts
    FROM events c
    WHERE c.event_type = 'click'
    """,
)
def asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: for every click, the user's NEXT purchase at or after
    it (the time-to-convert primitive). Same union+window algorithm as the
    backward join, run over the descending timestamp order — still one
    shuffle on user_id, no inequality-join blow-up. The oracle states the
    semantics directly as a correlated MIN."""
    e = table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("purchase_ts"))
    )
    joined = asof_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="purchase_ts",
        right_payload=["purchase_ts"],
        direction="forward",
    )
    return joined.select(
        "event_id", "user_id", "ts", F.col("last_purchase_ts").alias("next_purchase_ts")
    )


# ---------------------------------------------------------------------------
# asof_feature_snapshot — point-in-time-correct training-set assembly
# ---------------------------------------------------------------------------


@query(
    "asof_feature_snapshot",
    oracle=f"""
    WITH labeled AS (
        SELECT event_id, user_id, ts,
               {MONEY_CENTS_DUCK.format(col="value")} AS label_cents
        FROM events WHERE event_type = 'purchase'
    )
    SELECT l.event_id, l.user_id,
           l.label_cents AS label_value_cents,
           {money_str_duck("l.label_cents")} AS label_value,
           (SELECT COUNT(*) FROM events e
             WHERE e.user_id = l.user_id
               AND (e.ts < l.ts OR (e.ts = l.ts AND e.event_id < l.event_id)))
               AS f_n_prior_events,
           (SELECT CAST(COALESCE(SUM({MONEY_CENTS_DUCK.format(col="e.value")}), 0)
                        AS DOUBLE) / 100.0
              FROM events e
             WHERE e.user_id = l.user_id AND e.event_type = 'purchase'
               AND (e.ts < l.ts OR (e.ts = l.ts AND e.event_id < l.event_id)))
               AS f_prior_spend,
           (SELECT COUNT(*) FROM events e
             WHERE e.user_id = l.user_id AND e.event_type = 'click'
               AND (e.ts < l.ts OR (e.ts = l.ts AND e.event_id < l.event_id)))
               AS f_prior_clicks
    FROM labeled l
    """,
)
def asof_feature_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct feature snapshot — the feature-store join
    that assembles a training set WITHOUT label leakage: for every label
    event (purchase), every feature is computed over STRICTLY-PRIOR
    events only (prior event count, prior purchase spend, prior clicks).
    The classic bug this operator exists to prevent is a feature window
    that includes the label row itself or later rows; the oracle states
    the strictly-before semantics as correlated subqueries, so any
    off-by-one in the frame breaks the hash.

    The label money value is gated as BIGINT cents + the canonical
    VARCHAR rendering (cents_to_money_str) — DecimalType is banned from
    gated schemas (tests/test_oracle_types.py; VERDICT r07 ask #2).

    Plan: NO correlated subqueries and NO as-of self-join per feature —
    one per-user ordered window pass (rowsBetween unbounded-preceding →
    -1) computes all three features in the same frame, then the label
    filter keeps purchase rows. Linear in events, one user_id shuffle
    shared by every feature; adding a feature is one more aggregate over
    the SAME window, not another join."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cents = money_cents(F.col("value"))
    snap = e.select(
        "event_id",
        "user_id",
        "event_type",
        cents.alias("label_value_cents"),
        cents_to_money_str(cents).alias("label_value"),
        F.count("*").over(w).alias("f_n_prior_events"),
        (
            F.coalesce(
                F.sum(F.when(F.col("event_type") == "purchase", cents)).over(w),
                F.lit(0).cast("long"),
            ).cast("double")
            / F.lit(100.0)
        ).alias("f_prior_spend"),
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        )
        .over(w)
        .alias("f_prior_clicks"),
    )
    return snap.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "label_value_cents",
        "label_value",
        F.coalesce("f_n_prior_events", F.lit(0)).alias("f_n_prior_events"),
        "f_prior_spend",
        F.coalesce("f_prior_clicks", F.lit(0)).alias("f_prior_clicks"),
    )


# ---------------------------------------------------------------------------
# asof_join_tolerance — as-of with a staleness bound
# ---------------------------------------------------------------------------

_ASOF_TOL_S = 86400  # 1 day: matches older than this are too stale to use


@query(
    "asof_join_tolerance",
    oracle=f"""
    WITH matched AS (
        SELECT p.event_id, p.user_id, p.ts,
               (SELECT MAX(c.ts) FROM events c
                 WHERE c.event_type = 'click'
                   AND c.user_id = p.user_id
                   AND c.ts <= p.ts) AS last_click_ts
        FROM events p WHERE p.event_type = 'purchase'
    )
    SELECT event_id, user_id, ts,
           CASE WHEN last_click_ts IS NOT NULL
                 AND epoch_us(ts) - epoch_us(last_click_ts)
                     <= CAST({_ASOF_TOL_S} AS BIGINT) * 1000000
                THEN last_click_ts END AS last_click_ts,
           (last_click_ts IS NOT NULL
            AND epoch_us(ts) - epoch_us(last_click_ts)
                > CAST({_ASOF_TOL_S} AS BIGINT) * 1000000) AS dropped_stale
    FROM matched
    """,
)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a TOLERANCE: each purchase gets the user's most
    recent click only if it is at most 1 day old — older matches are
    nulled and flagged stale. This is the feature-store staleness bound
    (pandas ``merge_asof(tolerance=...)``): serving a feature computed
    from week-old activity is usually worse than serving none.

    Same linear union+window as-of core (one user_id shuffle, no
    inequality join); the tolerance is a post-window row-local predicate
    on the matched timestamp, so it adds zero shuffles."""
    e = table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="click_ts",
        right_payload=["click_ts"],
    )
    age_us = F.unix_micros("ts") - F.unix_micros("last_click_ts")
    fresh = F.col("last_click_ts").isNotNull() & (
        age_us <= _ASOF_TOL_S * 1_000_000
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.when(fresh, F.col("last_click_ts")).alias("last_click_ts"),
        (
            F.col("last_click_ts").isNotNull()
            & (age_us > _ASOF_TOL_S * 1_000_000)
        ).alias("dropped_stale"),
    )


# ---------------------------------------------------------------------------
# asof_join_nearest — bidirectional as-of (nearest match in either direction)
# ---------------------------------------------------------------------------

_NEAREST_CASE = """
    CASE
        WHEN prev_ts IS NULL AND next_ts IS NULL THEN {none}
        WHEN prev_ts IS NULL THEN {fwd}
        WHEN next_ts IS NULL THEN {bwd}
        WHEN EPOCH_US(ts) - EPOCH_US(prev_ts)
             <= EPOCH_US(next_ts) - EPOCH_US(ts) THEN {bwd}
        ELSE {fwd}
    END"""


@query(
    "asof_join_nearest",
    oracle=f"""
    SELECT event_id, user_id, ts,
           {_NEAREST_CASE.format(none="NULL", bwd="prev_ts", fwd="next_ts")}
               AS nearest_purchase_ts,
           {_NEAREST_CASE.format(none="CAST(NULL AS VARCHAR)",
                                 bwd="'backward'", fwd="'forward'")}
               AS direction
    FROM (
        SELECT c.event_id, c.user_id, c.ts,
               (SELECT MAX(p.ts) FROM events p
                WHERE p.event_type = 'purchase'
                  AND p.user_id = c.user_id AND p.ts <= c.ts) AS prev_ts,
               (SELECT MIN(p.ts) FROM events p
                WHERE p.event_type = 'purchase'
                  AND p.user_id = c.user_id AND p.ts >= c.ts) AS next_ts
        FROM events c
        WHERE c.event_type = 'click'
    )
    """,
)
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidirectional (nearest) as-of join — pandas ``merge_asof(
    direction='nearest')``: for every click, the same user's purchase with
    the smallest absolute time distance, ties to the earlier (backward)
    match. Completes the as-of family (backward / forward / tolerance /
    nearest).

    Scale shape: the backward and forward candidates are computed in ONE
    union of the two sides and ONE shuffle on user_id — two window passes
    over opposite sort orders of the same exchange (Catalyst plans a
    single Exchange feeding two Sort+Window nodes), so there is still no
    inequality-join blow-up. The nearest pick is then a row-local CASE on
    microsecond deltas (integer math, no float-epoch noise)."""
    e = table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    joined = asof_join_nearest_frame(
        clicks, purchases, on="user_id", left_ts="ts", right_ts="ts"
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("nearest_ts").alias("nearest_purchase_ts"),
        "direction",
    )


def asof_join_nearest_frame(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
) -> DataFrame:
    """Nearest-direction as-of core (property-tested vs brute force in
    tests/test_asof_property.py): returns the left columns plus
    ``nearest_ts`` (the right timestamp with the smallest absolute
    distance, ties to the earlier/backward match, NULL if the key has no
    right rows) and ``direction`` ('backward' | 'forward' | NULL).

    Both direction candidates come from ONE union and ONE shuffle on the
    key — an ascending and a descending Sort+Window pass over the same
    exchange output (see the asof_join_nearest plan in PLANS.md)."""
    lcols = left.columns
    # SQL/pandas as-of semantics: NULL never matches NULL. Drop NULL-key
    # right rows so a NULL-key left row (grouped into the NULL window
    # partition) can only see an empty right side and yields NULL
    # nearest_ts, exactly like merge_asof / an equi-join.
    right = right.filter(F.col(on).isNotNull())
    # right rows carry a NULL left payload with the left side's exact types
    tagged_r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
        F.col(right_ts).alias("_p"),
    )
    tagged_l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
        F.lit(None).cast(left.schema[left_ts].dataType).alias("_p"),
    )
    tagged = tagged_r.unionByName(tagged_l)
    # ascending pass: most recent right row at-or-before (right rows sort
    # before left rows at equal ts, so same-instant matches count)
    w_back = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # descending pass over the SAME exchange: walking ts downward, the last
    # non-null right row seen at-or-above the left ts is the earliest one >= it
    w_fwd = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").desc(), "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    both = tagged.select(
        "_side",
        *[f"_l_{c}" for c in lcols],
        F.col("_ts"),
        F.last("_p", ignorenulls=True).over(w_back).alias("prev_ts"),
        F.last("_p", ignorenulls=True).over(w_fwd).alias("next_ts"),
    ).filter(F.col("_side") == 1)
    d_back = F.unix_micros("_ts") - F.unix_micros("prev_ts")
    d_fwd = F.unix_micros("next_ts") - F.unix_micros("_ts")
    pick_back = F.col("prev_ts").isNotNull() & (
        F.col("next_ts").isNull() | (d_back <= d_fwd)
    )
    return both.select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        F.when(pick_back, F.col("prev_ts"))
        .otherwise(F.col("next_ts"))
        .alias("nearest_ts"),
        F.when(pick_back, F.lit("backward"))
        .when(F.col("next_ts").isNotNull(), F.lit("forward"))
        .alias("direction"),
    )


# ---------------------------------------------------------------------------
# join_interval_overlap_surge — interval×interval overlap join (banded)
# ---------------------------------------------------------------------------

_IOV_GAP_US = 1_800_000_000        # 30-min sessionization gap (house rule)
_IOV_MAX_SESSION_US = 172_800_000_000  # 48 h cap bounds the bucket explode
_IOV_HOUR_US = 3_600_000_000


@query(
    "join_interval_overlap_surge",
    oracle=f"""
    WITH ses AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL THEN 1
                    WHEN EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > {_IOV_GAP_US} THEN 1
                    ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sid AS (
        SELECT user_id, ts,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
        FROM ses
    ), sessions AS (
        SELECT user_id, session_id,
               EPOCH_US(MIN(ts)) AS s_us, EPOCH_US(MAX(ts)) AS e_us
        FROM sid GROUP BY 1, 2
        HAVING EPOCH_US(MAX(ts)) - EPOCH_US(MIN(ts)) <= {_IOV_MAX_SESSION_US}
    ), hours AS (
        SELECT DATE_TRUNC('hour', ts) AS h, COUNT(*) AS cnt FROM events GROUP BY 1
    ), meta AS (
        SELECT COUNT(*) AS n_hours, SUM(cnt) AS total FROM hours
    ), hot AS (
        SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
        FROM hours, meta WHERE 4 * cnt * n_hours > 5 * total
    ), surges AS (
        SELECT MIN(EPOCH_US(h)) AS a_us,
               MAX(EPOCH_US(h)) + {_IOV_HOUR_US} AS b_us
        FROM (SELECT h, rn, EPOCH_US(h) // {_IOV_HOUR_US} - rn AS grp FROM hot)
        GROUP BY grp
    ), pairs AS (
        SELECT s.user_id, s.session_id,
               LEAST(s.e_us + 1, g.b_us) - GREATEST(s.s_us, g.a_us) AS ov_us
        FROM sessions s JOIN surges g
          ON s.s_us < g.b_us AND s.e_us >= g.a_us
    )
    SELECT user_id,
           CAST(COUNT(DISTINCT session_id) AS BIGINT) AS n_surge_sessions,
           CAST(COUNT(*) AS BIGINT)                   AS n_pairs,
           CAST(SUM(ov_us) // 1000000 AS BIGINT)      AS total_overlap_sec
    FROM pairs GROUP BY user_id
    """,
)
def join_interval_overlap_surge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval × interval OVERLAP join — the join class the family still
    lacked (as-of = point×interval; range bands = value×interval): user
    sessions (30-min-gap sessionization, ≤48 h) against global traffic
    surge windows (maximal runs of consecutive hours whose event count
    exceeds 1.25× the hourly mean — the strict integer cross-multiplied
    compare 4·cnt·n_hours > 5·total, no float threshold). Per user:
    sessions that hit a surge, overlapping (session, surge) pairs, and
    the exact total overlap seconds — "how much of each user's activity
    happened inside platform-wide load peaks".

    Scale shape — the generic interval-overlap recipe: a naive overlap
    join is an inequality-only theta join (BNLJ / cartesian at corpus
    scale). Here both sides are BANDED to hour buckets: sessions explode
    to ≤49 covered hours each (the 48 h cap makes the fan-out constant;
    longer sessions are excluded in BOTH engines), surge windows are
    already unions of whole hot hours, so the join is a plain EQUI join
    on hour index followed by a (session, surge) dedup — linear in
    covered hours, never pairs×pairs. The hot-hour ranking window is
    unpartitioned but CALENDAR-bounded (|hours|, 720 at any SF — time,
    not rows, is its scale axis), and overlap lengths are exact integer
    microsecond arithmetic (half-open surge [a,b), closed session
    [s,e] ⇒ min(e+1,b) − max(s,a)); seconds via integer DIV. Bucket-join
    equivalence to the oracle's interval predicate holds because surges
    are hour-aligned runs: two hour-aligned ranges overlap iff they
    share an hour bucket.

    Reference parity: none (SURVEY §2.D north-star; completes the
    point/value/interval join triad)."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_us = F.unix_micros(F.lag("ts").over(w))
    new_s = (
        F.when(lag_us.isNull(), 1)
        .when(F.unix_micros("ts") - lag_us > _IOV_GAP_US, 1)
        .otherwise(0)
    )
    sid = e.select(
        "user_id",
        "ts",
        F.sum(new_s).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("session_id"),
    )
    sessions = (
        sid.groupBy("user_id", "session_id")
        .agg(
            F.min(F.unix_micros("ts")).alias("s_us"),
            F.max(F.unix_micros("ts")).alias("e_us"),
        )
        .filter(F.col("e_us") - F.col("s_us") <= _IOV_MAX_SESSION_US)
    )
    hours = e.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count("*").alias("cnt")
    )
    meta = hours.agg(F.count("*").alias("n_hours"), F.sum("cnt").alias("total"))
    # |hours| is calendar-bounded, so the unpartitioned ranking window and
    # the surge islands frame are dimension-sized at every data scale
    hot = (
        hours.crossJoin(F.broadcast(meta))
        .filter(4 * F.col("cnt") * F.col("n_hours") > 5 * F.col("total"))
        .select("h", F.row_number().over(Window.orderBy("h")).alias("rn"))
        .select(
            "h",
            "rn",
            F.expr(f"unix_micros(h) DIV {_IOV_HOUR_US}").alias("h_idx"),
        )
        .withColumn("grp", F.col("h_idx") - F.col("rn"))
    )
    surges = hot.groupBy("grp").agg(
        F.min(F.unix_micros("h")).alias("a_us"),
        (F.max(F.unix_micros("h")) + _IOV_HOUR_US).alias("b_us"),
    )
    hot_map = hot.join(surges, "grp").select("h_idx", "grp", "a_us", "b_us")
    ses_hours = sessions.select(
        "user_id",
        "session_id",
        "s_us",
        "e_us",
        F.explode(
            F.sequence(
                F.expr(f"s_us DIV {_IOV_HOUR_US}"),
                F.expr(f"e_us DIV {_IOV_HOUR_US}"),
            )
        ).alias("h_idx"),
    )
    pairs = (
        ses_hours.join(F.broadcast(hot_map), "h_idx")
        .dropDuplicates(["user_id", "session_id", "grp"])
        .select(
            "user_id",
            "session_id",
            (
                F.least(F.col("e_us") + 1, F.col("b_us"))
                - F.greatest(F.col("s_us"), F.col("a_us"))
            ).alias("ov_us"),
        )
    )
    return pairs.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_surge_sessions"),
        F.count("*").alias("n_pairs"),
        F.expr("CAST(sum(ov_us) DIV 1000000 AS BIGINT)").alias("total_overlap_sec"),
    )
