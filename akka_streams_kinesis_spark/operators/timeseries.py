"""Time-series operators over the events stream table: gap-filled
resampling onto a fixed grid, and z-score outlier detection.

The reference's whole domain is time-positioned event streams
(KinesisSource.scala:31-35 — AtTimestamp/TrimHorizon positioning); these are
the batch analytics a consumer of that stream runs once the events land:
regularize the series (gaps = hours where a shard produced nothing) and
screen for anomalous values.

Scale notes (100 TB stance):
- The only fact-table work in either query is one hash-aggregate shuffle to
  (hour, event_type) / (event_type) — thousands of groups regardless of
  input size.
- The time grid is generated with sequence()+explode from a 1-row bounds
  aggregate — never a driver-side loop — and stays [hours × types] rows, so
  the gap-fill join is a broadcast of the *aggregated* side, not the grid.
- Outlier moments (n, Σv, Σv²) are computed in one pass and rounded to
  fixed decimals BEFORE deriving mean/std, so both engines (and any
  partition order) derive bit-identical thresholds: values are 2-decimal
  money, so Σv at 2dp and Σv² at 4dp are exact reconstructions of the
  mathematical sums.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions import div_round4
from ..io import table
from ..registry import query


@query(
    "events_gap_fill_resample",
    oracle="""
    WITH hourly AS (
        SELECT DATE_TRUNC('hour', ts) AS hour, event_type,
               COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT MIN(DATE_TRUNC('hour', ts)) AS tmin,
               MAX(DATE_TRUNC('hour', ts)) AS tmax
        FROM events
    ),
    grid AS (
        SELECT UNNEST(GENERATE_SERIES(tmin, tmax, INTERVAL 1 HOUR)) AS hour
        FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events)
    SELECT g.hour, t.event_type,
           COALESCE(h.n, 0) AS n,
           COALESCE(h.total_value, 0.0) AS total_value
    FROM grid g
    CROSS JOIN types t
    LEFT JOIN hourly h ON h.hour = g.hour AND h.event_type = t.event_type
    """,
)
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample events onto a dense hourly grid per event type, zero-filling
    hours with no traffic.

    The grid is sequence(min_hour, max_hour, 1h) exploded from the 1-row
    bounds aggregate crossed with the distinct types — [hours × types] rows
    total, independent of fact size, so the cross join and the gap-fill
    left join both broadcast. The fact table is touched exactly twice-ish
    cheap: one (hour, type) hash-agg and one min/max + distinct-type pass
    (both trivially combinable map-side)."""
    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h_hour"),
        F.col("event_type").alias("h_type"),
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    bounds = e.agg(
        F.min(F.date_trunc("hour", F.col("ts"))).alias("tmin"),
        F.max(F.date_trunc("hour", F.col("ts"))).alias("tmax"),
    )
    grid = bounds.select(
        F.explode(F.expr("sequence(tmin, tmax, interval 1 hour)")).alias("hour")
    )
    types = e.select("event_type").distinct()
    return (
        grid.crossJoin(F.broadcast(types))
        .join(
            F.broadcast(hourly),
            (F.col("h_hour") == F.col("hour"))
            & (F.col("h_type") == F.col("event_type")),
            "left",
        )
        .select(
            "hour",
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            F.coalesce(F.col("total_value"), F.lit(0.0)).alias("total_value"),
        )
    )


@query(
    "events_zscore_outliers",
    oracle="""
    WITH moments AS (
        SELECT event_type AS m_type,
               COUNT(*) AS n,
               ROUND(SUM(value), 2) AS s1,
               ROUND(SUM(value * value), 4) AS s2
        FROM events GROUP BY 1
    ),
    stats AS (
        SELECT m_type, s1 / n AS mean,
               SQRT((s2 - n * (s1 / n) * (s1 / n)) / (n - 1)) AS std
        FROM moments
    )
    SELECT e.event_id, e.event_type, e.value,
           ROUND((e.value - s.mean) / s.std, 4) AS zscore
    FROM events e
    JOIN stats s ON s.m_type = e.event_type
    WHERE ABS((e.value - s.mean) / s.std) > 3.0
    """,
)
def events_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outlier screen: events more than 3 sample standard
    deviations from their type's mean.

    mean/std are derived from (n, Σv@2dp, Σv²@4dp) — exact for 2-decimal
    inputs — instead of avg()/stddev(), so the threshold compare is
    bit-identical across engines and partition orders (see the
    oracle-parity notes on summation-order rounding flips). The moments
    aggregate is one map-side-combinable pass; stats broadcast back onto
    the fact scan, so the screen itself is a broadcast join + filter —
    no second shuffle."""
    e = table(spark, sf_dir, "events")
    moments = e.groupBy(F.col("event_type").alias("m_type")).agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("s1"),
        F.round(F.sum(F.col("value") * F.col("value")), 4).alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    stats = moments.select(
        "m_type",
        mean.alias("mean"),
        F.sqrt((F.col("s2") - F.col("n") * mean * mean) / (F.col("n") - 1)).alias("std"),
    )
    z = (F.col("value") - F.col("mean")) / F.col("std")
    return (
        e.join(F.broadcast(stats), F.col("m_type") == F.col("event_type"))
        .filter(F.abs(z) > 3.0)
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(z, 4).alias("zscore"),
        )
    )


_EWMA_BETA = 0.9      # decay: weight of an observation halves every ~6.6 steps
_EWMA_USERS = 100     # bound the per-event output to a fixed user cohort


@query(
    "events_ewma_value",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS i
        FROM events
        WHERE user_id < {_EWMA_USERS}
    ), sums AS (
        SELECT user_id, event_id, i,
               SUM(value * POW({_EWMA_BETA}, -i)) OVER w AS num,
               SUM(POW({_EWMA_BETA}, -i)) OVER w AS den
        FROM seq
        WINDOW w AS (PARTITION BY user_id ORDER BY i
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id,
           ROUND(POW({_EWMA_BETA}, i) * num / (POW({_EWMA_BETA}, i) * den), 4) AS ewma
    FROM sums
    """,
)
def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of `value` per user (the
    adjust=True form: ewma_i = Σ β^(i-j) x_j / Σ β^(i-j)), expressed as two
    cumulative window sums — ewma_i = β^i·Σ(x_j β^(-j)) / β^i·Σ(β^(-j)) —
    so a recurrence becomes a plain running sum Catalyst executes in one
    window pass, no UDF and no iteration.

    Numerics: the β^(-j) rescaling grows like 1.11^j, so the trick is safe
    for bounded per-key runs (double overflows past j≈7000); a 100 TB
    deployment would segment longer series (restart the weights every N
    rows and stitch with the carry term) — same plan shape. All terms are
    positive (no cancellation) and both engines compute the identical
    formula, so 4-dp rounding is stable.
    """
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events").filter(F.col("user_id") < _EWMA_USERS)
    seq = e.select(
        "user_id",
        "event_id",
        "value",
        (
            F.row_number().over(
                Window.partitionBy("user_id").orderBy("ts", "event_id")
            )
            - 1
        ).alias("i"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    beta = F.lit(float(_EWMA_BETA))
    scaled = seq.select(
        "user_id",
        "event_id",
        "i",
        F.sum(F.col("value") * F.pow(beta, -F.col("i"))).over(w).alias("num"),
        F.sum(F.pow(beta, -F.col("i"))).over(w).alias("den"),
    )
    bi = F.pow(beta, F.col("i"))
    return scaled.select(
        "user_id",
        "event_id",
        F.round((bi * F.col("num")) / (bi * F.col("den")), 4).alias("ewma"),
    )


@query(
    "events_robust_outliers_mad",
    oracle="""
    WITH med AS (
        SELECT event_type AS m_type, ROUND(MEDIAN(value), 4) AS med
        FROM events GROUP BY 1
    ), dev AS (
        SELECT e.event_type, m.med, ABS(e.value - m.med) AS adev
        FROM events e JOIN med m ON m.m_type = e.event_type
    ), mad AS (
        SELECT event_type AS d_type, ROUND(MEDIAN(adev), 4) AS mad
        FROM dev GROUP BY 1
    )
    SELECT d.event_type, d.med, m.mad,
           CAST(SUM(CASE WHEN d.adev > 3 * 1.4826 * m.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m ON m.d_type = d.event_type
    GROUP BY 1, 2, 3
    """,
)
def events_robust_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier screen via median absolute deviation: events whose
    |value − median| exceeds 3 scaled MADs of their type (1.4826 makes MAD
    a consistent σ estimator under normality). The robust complement of
    events_zscore_outliers — heavy-tailed value distributions wreck a
    mean/σ screen but barely move the median/MAD.

    Two exact-percentile aggregates (median, then median of deviations),
    each a single shuffle on the bounded event_type key; the per-type
    medians broadcast back onto the fact scan both times, so the screen
    itself never reshuffles the facts. Medians are rounded to 4dp BEFORE
    the deviation step on both engines, so every downstream float compare
    sees bit-identical inputs."""
    e = table(spark, sf_dir, "events")
    med = e.groupBy(F.col("event_type").alias("m_type")).agg(
        F.round(F.percentile("value", 0.5), 4).alias("med")
    )
    dev = e.join(F.broadcast(med), F.col("m_type") == F.col("event_type")).select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy(F.col("event_type").alias("d_type")).agg(
        F.round(F.percentile("adev", 0.5), 4).alias("mad")
    )
    out = F.when(F.col("adev") > 3 * 1.4826 * F.col("mad"), 1).otherwise(0)
    return (
        dev.join(F.broadcast(mad), F.col("d_type") == F.col("event_type"))
        .groupBy("event_type", "med", "mad")
        .agg(F.sum(out).cast("long").alias("n_outliers"))
    )


@query(
    "events_scd2_user_state",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               LAG(event_type) OVER w AS prev_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), changes AS (
        SELECT user_id, event_type, ts, event_id
        FROM ordered
        WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type,
           ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           CASE WHEN LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     IS NULL THEN 1 ELSE 0 END AS is_current
    FROM changes
    """,
)
def events_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing dimension built from an event stream: per
    user, collapse consecutive repeats of the same event_type, then stamp
    each surviving state change with [valid_from, valid_to) from the next
    change's timestamp — the standard CDC→warehouse history-table shape
    (MERGE-free: the whole history derives from the log in one pass).

    Two windows over the same (user_id, ts) partitioning — Spark plans ONE
    sort+shuffle and reuses it for both (no second exchange); the change
    filter collapses the data between them. Deterministic total order via
    the (ts, event_id) tiebreak."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select("user_id", "event_type", "ts", "event_id")
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
        F.when(F.lead("ts").over(w2).isNull(), 1).otherwise(0).alias("is_current"),
    )


# ---------------------------------------------------------------------------
# join_scd2_point_in_time — facts joined to the dimension state valid at
# event time (the warehouse temporal join)
# ---------------------------------------------------------------------------


@query(
    "join_scd2_point_in_time",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               LAG(event_type) OVER w AS prev_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), changes AS (
        SELECT user_id, event_type AS state, ts, event_id
        FROM ordered
        WHERE prev_type IS NULL OR prev_type <> event_type
    ), unioned AS (
        SELECT user_id, ts, event_id, 0 AS kind, state,
               NULL::BIGINT AS fact_id
        FROM changes
        UNION ALL
        SELECT user_id, ts, event_id, 1 AS kind, NULL AS state,
               event_id AS fact_id
        FROM events WHERE event_type = 'purchase'
    ), carried AS (
        SELECT user_id, ts, kind, fact_id,
               LAST_VALUE(state IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id, kind
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS state_at_ts
        FROM unioned
    )
    SELECT fact_id AS event_id, user_id, ts, state_at_ts
    FROM carried WHERE kind = 1
    """,
)
def join_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The warehouse temporal join: each fact (purchase) picks up the
    SCD2 dimension state that was valid AT its event time — here the
    user's state-change history built by events_scd2_user_state. A change
    landing at the same instant as the fact is visible to it exactly
    when it precedes the fact in log order (ts, then event_id — the same
    total order the SCD2 build uses), so the lookup is deterministic
    even under timestamp ties.

    Plan: NOT a range join against [valid_from, valid_to) intervals
    (whose inequality pairs blow up on chatty users) — the linear as-of
    algorithm instead: union state-starts with facts, ONE per-user
    ordered window carries the last-seen state forward, facts filter
    out. One user_id shuffle for any number of facts and any history
    depth; valid_to never needs materializing because segment starts
    partition the timeline."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select(
            "user_id",
            "ts",
            "event_id",
            F.lit(0).alias("kind"),
            F.col("event_type").alias("state"),
            F.lit(None).cast("long").alias("fact_id"),
        )
    )
    facts = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(1).alias("kind"),
        F.lit(None).cast("string").alias("state"),
        F.col("event_id").alias("fact_id"),
    )
    carried = changes.unionByName(facts).withColumn(
        "state_at_ts",
        F.last("state", ignorenulls=True).over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id", "kind")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return carried.filter(F.col("kind") == 1).select(
        F.col("fact_id").alias("event_id"), "user_id", "ts", "state_at_ts"
    )


# ---------------------------------------------------------------------------
# events_inter_arrival_stats — per-type inter-arrival time distribution
# ---------------------------------------------------------------------------


@query(
    "events_inter_arrival_stats",
    oracle="""
    WITH gaps AS (
        SELECT event_type,
               epoch_us(ts) - epoch_us(LAG(ts) OVER (
                   PARTITION BY user_id, event_type ORDER BY ts, event_id
               )) AS gap_us
        FROM events
    )
    SELECT event_type,
           COUNT(gap_us) AS n_gaps,
           ROUND(AVG(gap_us) / 1000000, 4) AS mean_gap_s,
           ROUND(QUANTILE_CONT(gap_us, 0.5) / 1000000, 4) AS p50_gap_s,
           ROUND(QUANTILE_CONT(gap_us, 0.95) / 1000000, 4) AS p95_gap_s,
           ROUND(MAX(gap_us) / 1000000.0, 4) AS max_gap_s
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY event_type
    """,
)
def events_inter_arrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival time distribution per event type (per-user gaps):
    mean, median, p95, and max of the time between a user's consecutive
    events of the same type — the rate/burstiness profile capacity
    planning and anomaly baselines read. Gaps in exact integer
    microseconds (engine-parity), reported in seconds.

    Plan: one (user_id, event_type)-partitioned lag window — high
    cardinality, skew-free — then a 5-group aggregate; the exact
    percentiles run over per-type gap sets, which an approx_percentile
    swap makes O(1)-state at 100 TB without changing the plan."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = e.select(
        "event_type",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias(
            "gap_us"
        ),
    ).filter(F.col("gap_us").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count("gap_us").alias("n_gaps"),
        F.round(F.avg("gap_us") / 1_000_000, 4).alias("mean_gap_s"),
        F.round(
            F.expr("percentile(gap_us, 0.5D)") / 1_000_000, 4
        ).alias("p50_gap_s"),
        F.round(
            F.expr("percentile(gap_us, 0.95D)") / 1_000_000, 4
        ).alias("p95_gap_s"),
        F.round(F.max("gap_us") / 1_000_000.0, 4).alias("max_gap_s"),
    )


# ---------------------------------------------------------------------------
# events_burst_detection — rate-anomaly flags over the hourly profile
# ---------------------------------------------------------------------------


@query(
    "events_burst_detection",
    oracle="""
    WITH hourly AS (
        SELECT event_type, DATE_TRUNC('hour', ts) AS hour, COUNT(*) AS n
        FROM events GROUP BY event_type, hour
    ), stats AS (
        SELECT event_type,
               AVG(n) AS mu,
               STDDEV_SAMP(n) AS sigma
        FROM hourly GROUP BY event_type
    )
    SELECT h.event_type, h.hour, h.n,
           ROUND((h.n - s.mu) / s.sigma, 4) AS z,
           (h.n > s.mu + 3 * s.sigma) AS is_burst
    FROM hourly h JOIN stats s USING (event_type)
    WHERE h.n > s.mu + 2 * s.sigma
    """,
)
def events_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-burst detection: hours where an event type's volume exceeds
    its own mean by 2σ (reported with z-scores; ≥3σ flagged as bursts) —
    the traffic-anomaly monitor an ingest pipeline alarms on. Two
    aggregates: the hourly profile (map-side partials over the raw
    stream), then per-type moments over the SMALL profile table; the
    flag join broadcasts |event_type| rows. At 100 TB only the first
    aggregate ever sees the data."""
    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count("*").alias("n"))
    stats = hourly.groupBy("event_type").agg(
        F.avg("n").alias("mu"), F.stddev_samp("n").alias("sigma")
    )
    flagged = hourly.join(F.broadcast(stats), "event_type")
    return flagged.filter(
        F.col("n") > F.col("mu") + 2 * F.col("sigma")
    ).select(
        "event_type",
        "hour",
        "n",
        F.round((F.col("n") - F.col("mu")) / F.col("sigma"), 4).alias("z"),
        (F.col("n") > F.col("mu") + 3 * F.col("sigma")).alias("is_burst"),
    )


# ---------------------------------------------------------------------------
# events_velocity_features — multi-horizon rolling activity counts
# ---------------------------------------------------------------------------


@query(
    "events_velocity_features",
    oracle="""
    WITH base AS (
        SELECT event_id, user_id, epoch_us(ts) AS t FROM events
    ), feats AS (
        SELECT event_id, user_id,
               CAST(COUNT(*) OVER (
                   PARTITION BY user_id ORDER BY t
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
               ) - 1 AS BIGINT) AS n_prior_1h,
               CAST(COUNT(*) OVER (
                   PARTITION BY user_id ORDER BY t
                   RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW
               ) - 1 AS BIGINT) AS n_prior_24h
        FROM base
    )
    SELECT * FROM feats WHERE event_id % 20 = 0
    """,
)
def events_velocity_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Velocity features — rolling 1-hour and 24-hour activity counts per
    user at every event (self excluded): the fraud/abuse staple ("how
    many actions did this account take in the last hour?"). Both
    horizons are RANGE frames over the SAME per-user epoch-microsecond
    ordering, so Spark plans ONE sort+exchange and evaluates both frames
    in the same Window pass; frame state is a sliding pointer pair, not
    the window contents.

    Same-instant events: RANGE at CURRENT ROW includes ties on both
    engines, and self-exclusion is the −1 — identical tie semantics by
    construction."""
    e = table(spark, sf_dir, "events")
    base = e.select(
        "event_id", "user_id", F.unix_micros("ts").alias("t")
    )
    w1h = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rangeBetween(-3_600_000_000, 0)
    )
    w24h = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rangeBetween(-86_400_000_000, 0)
    )
    return (
        base.select(
            "event_id",
            "user_id",
            (F.count("*").over(w1h) - 1).alias("n_prior_1h"),
            (F.count("*").over(w24h) - 1).alias("n_prior_24h"),
        )
        .filter(F.col("event_id") % 20 == 0)
    )


# ---------------------------------------------------------------------------
# events_change_point_cusum — CUSUM change-point detection per event type
# ---------------------------------------------------------------------------


@query(
    "events_change_point_cusum",
    oracle="""
    WITH hourly AS (
        SELECT event_type,
               CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS hour,
               COUNT(*) AS cnt
        FROM events GROUP BY 1, 2
    ), stats AS (
        SELECT event_type, AVG(cnt) AS mean_cnt, COUNT(*) AS n_hours
        FROM hourly GROUP BY 1
    ), cus AS (
        SELECT h.event_type, h.hour, s.n_hours,
               SUM(h.cnt - s.mean_cnt)
                   OVER (PARTITION BY h.event_type ORDER BY h.hour) AS cusum
        FROM hourly h JOIN stats s USING (event_type)
    ), ranked AS (
        SELECT event_type, hour, cusum, n_hours,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY ROUND(ABS(cusum), 6) DESC, hour) AS rn
        FROM cus
    )
    SELECT event_type,
           hour                  AS change_hour,
           ROUND(ABS(cusum), 4)  AS max_abs_cusum,
           n_hours
    FROM ranked WHERE rn = 1
    """,
)
def events_change_point_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection over each event type's hourly rate:
    the hour where the cumulative sum of deviations from the mean peaks
    in magnitude is the single most likely level-shift point (the
    classic offline CUSUM estimator). This is the "when did the metric
    change" primitive behind incident timelines and drift alarms.

    Scale shape: the raw stream collapses to |types|x|hours| rows in one
    partial+final count, and everything after runs on that tiny series —
    mean per type, one ordered cumulative-sum window, one top-1 rank.
    Cross-engine float parity is structural: the mean divides an exact
    integer sum by an exact count, and the running sum adds the same
    doubles in the same hour order in both engines; ranking compares the
    6dp-rounded magnitude with the hour as tiebreak."""
    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count("*").alias("cnt"))
    stats = hourly.groupBy("event_type").agg(
        F.avg("cnt").alias("mean_cnt"), F.count("*").alias("n_hours")
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cus = hourly.join(stats, "event_type").select(
        "event_type",
        "hour",
        "n_hours",
        F.sum(F.col("cnt") - F.col("mean_cnt")).over(w_cum).alias("cusum"),
    )
    w_rank = Window.partitionBy("event_type").orderBy(
        F.round(F.abs("cusum"), 6).desc(), "hour"
    )
    return (
        cus.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("hour").alias("change_hour"),
            F.round(F.abs("cusum"), 4).alias("max_abs_cusum"),
            "n_hours",
        )
    )


# ---------------------------------------------------------------------------
# events_time_weighted_avg — TWAP per user (step-function integral)
# ---------------------------------------------------------------------------


@query(
    "events_time_weighted_avg",
    oracle="""
    WITH stepped AS (
        SELECT user_id,
               CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents,
               epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                 - epoch_us(ts) AS dt_us
        FROM events
    )
    SELECT user_id,
           CAST(SUM(dt_us) AS BIGINT) AS observed_us,
           FLOOR(CAST(SUM(cents * dt_us) AS DOUBLE) * 10000.0
                 / (100.0 * CAST(SUM(dt_us) AS DOUBLE)) + 0.5) / 10000.0 AS twap
    FROM stepped
    WHERE dt_us IS NOT NULL
    GROUP BY user_id
    """,
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (TWAP): treat each user's
    ``value`` as a step function that holds until the next event, and
    integrate — Σ value·Δt / Σ Δt. The difference from a plain AVG is the
    whole point: a value held for 6 hours weighs 360× one held for a
    minute. This is the standard metric for position/price/queue-depth
    series where sampling is event-driven, not uniform.

    Scale shape: ONE shuffle on user_id serves both the LEAD window and
    the per-user aggregate (same partitioning, Catalyst reuses the
    exchange). Determinism: 2-decimal money is quantized to integer
    cents (FLOOR(v·100 + .5) — exact for the nonnegative 2dp grid), and
    Σ cents·Δtµs accumulates in int64 (per-user magnitude ≲ 2e16, well
    under 2⁶³), so the sum is order-independent — double products of
    non-dyadic 2dp values would carry partial-aggregation-order ulp
    error. The final ratio uses the FLOOR-based 4dp idiom
    (:func:`div_round4` shape) so both engines round identical bits.
    The last event per user has no successor and is excluded."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dt = F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")
    stepped = e.select(
        "user_id",
        F.floor(F.col("value") * 100.0 + 0.5).cast("bigint").alias("cents"),
        dt.alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull())
    return stepped.groupBy("user_id").agg(
        F.sum("dt_us").cast("bigint").alias("observed_us"),
        div_round4(
            F.sum(F.col("cents") * F.col("dt_us")).cast("double"),
            F.lit(100.0) * F.sum("dt_us").cast("double"),
        ).alias("twap"),
    )


# ---------------------------------------------------------------------------
# events_seasonality_profile — hour-of-day × day-of-week baseline + deviation
# ---------------------------------------------------------------------------


@query(
    "events_seasonality_profile",
    oracle="""
    WITH cells AS (
        SELECT event_type,
               isodow(ts) - 1                 AS dow,
               CAST(hour(ts) AS BIGINT)       AS hod,
               COUNT(*)                       AS n,
               ROUND(SUM(value), 2)           AS sum_v
        FROM events
        GROUP BY 1, 2, 3
    ), typed AS (
        -- 4dp averages via FLOOR(x*1e4 + .5)/1e4: pure IEEE double ops,
        -- bit-identical in both engines even at exact .00005 ties (where
        -- Spark's HALF_UP-on-decimal and DuckDB's double ROUND disagree;
        -- tiny per-cell counts make such ties actually occur)
        SELECT *,
               FLOOR(sum_v * 10000.0 / n + 0.5) / 10000.0 AS cell_avg,
               FLOOR(CAST(SUM(sum_v) OVER (PARTITION BY event_type) AS DOUBLE)
                     * 10000.0 / SUM(n) OVER (PARTITION BY event_type) + 0.5)
                 / 10000.0 AS type_avg
        FROM cells
    )
    SELECT event_type, CAST(dow AS BIGINT) AS dow, hod, n, cell_avg,
           ROUND(cell_avg - type_avg, 4) AS deviation
    FROM typed
    """,
)
def events_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality baseline: mean value per (event_type, day-of-week,
    hour-of-day) cell plus each cell's deviation from its type's overall
    mean — the profile a forecaster subtracts before looking for real
    anomalies, and the load curve a capacity planner reads directly.

    Scale shape: one hash-aggregate shuffle to at most
    |types| × 7 × 24 cells regardless of input size; the type-level
    baseline is a window over those few hundred cell rows, not a second
    pass over the facts. Determinism: cell sums are rounded to the
    2-decimal money grid first, and both cell and type averages are
    derived from those exact sums with FLOOR-based 4dp rounding (pure
    IEEE ops — immune to the round-half-tie divergence that per-cell
    counts this small actually hit), so the 4dp deviations are
    bit-identical in both engines. dow is 0=Monday (Spark ``weekday`` ≡
    DuckDB ``isodow - 1``)."""
    e = table(spark, sf_dir, "events")
    cells = e.groupBy(
        "event_type",
        F.weekday("ts").cast("bigint").alias("dow"),
        F.hour("ts").cast("bigint").alias("hod"),
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("sum_v"),
    )
    w_type = Window.partitionBy("event_type")
    # 4dp averages via FLOOR(x*1e4 + .5)/1e4 — see the oracle comment:
    # identical IEEE ops on identical doubles, so no round-half ties
    typed = cells.select(
        "event_type",
        "dow",
        "hod",
        "n",
        (F.floor(F.col("sum_v") * 10000.0 / F.col("n") + 0.5) / 10000.0).alias(
            "cell_avg"
        ),
        (
            F.floor(
                F.sum("sum_v").over(w_type).cast("double")
                * 10000.0
                / F.sum("n").over(w_type)
                + 0.5
            )
            / 10000.0
        ).alias("type_avg"),
    )
    return typed.select(
        "event_type",
        "dow",
        "hod",
        "n",
        "cell_avg",
        F.round(F.col("cell_avg") - F.col("type_avg"), 4).alias("deviation"),
    )


# ---------------------------------------------------------------------------
# agg_regression_value_trend — closed-form OLS per event_type, exact sums
# ---------------------------------------------------------------------------


@query(
    "agg_regression_value_trend",
    oracle="""
    WITH anchor AS (
        SELECT MIN(epoch_us(ts)) AS min_us FROM events
    ), pts AS (
        SELECT event_type,
               (epoch_us(ts) - (SELECT min_us FROM anchor)) // 3600000000 AS x,
               CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)                AS y
        FROM events
    ), sums AS (
        SELECT event_type,
               COUNT(*)     AS n,
               SUM(x)       AS sx,
               SUM(y)       AS sy,
               SUM(x * y)   AS sxy,
               SUM(x * x)   AS sxx
        FROM pts GROUP BY event_type
    )
    SELECT event_type, n,
           FLOOR((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) * 1000000.0
                 / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 100.0)
                 + 0.5) / 1000000.0 AS slope_per_hour,
           FLOOR((CAST(sy AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sxy AS DOUBLE)) * 1000000.0
                 / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 100.0)
                 + 0.5) / 1000000.0 AS intercept
    FROM sums
    """,
)
def agg_regression_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form OLS trend line of event value over time, per event_type:
    slope (dollars/hour) and intercept — 'is spend drifting up or down' as
    one aggregate pass, the distributed equivalent of REGR_SLOPE/
    REGR_INTERCEPT.

    Determinism (the reason NOT to use the built-in regr_* functions):
    those accumulate doubles whose partial-aggregation order varies run to
    run. Here x is integer hours since the global min timestamp and y is
    integer cents, so ALL five sufficient statistics (n, Σx, Σy, Σxy, Σx²)
    are exact int64 sums — order-independent — and the closed-form slope/
    intercept are a fixed IEEE expression over those exact integers,
    bit-identical in both engines, FLOOR-rounded at 6dp. Magnitudes: each
    sum stays < 2⁵³ through sf1, so the int→double casts are exact; at a
    true 100 TB you'd rebase x per group and widen the sums to
    DECIMAL(38,0), same shape.

    Scale: one scalar MIN (broadcast), one hash-agg by event_type — the
    minimum possible plan for any regression."""
    e = table(spark, sf_dir, "events")
    anchor = e.agg(F.min(F.unix_micros("ts")).alias("min_us"))
    pts = e.crossJoin(F.broadcast(anchor)).select(
        "event_type",
        F.expr("(unix_micros(ts) - min_us) DIV 3600000000").alias("x"),
        F.floor(F.col("value") * 100.0 + 0.5).cast("bigint").alias("y"),
    )
    sums = pts.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    den = (
        F.col("n").cast("double") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    ) * 100.0
    slope_num = (
        F.col("n").cast("double") * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    )
    icept_num = (
        F.col("sy").cast("double") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sxy").cast("double")
    )
    return sums.select(
        "event_type",
        "n",
        (F.floor(slope_num * 1000000.0 / den + 0.5) / 1000000.0).alias(
            "slope_per_hour"
        ),
        (F.floor(icept_num * 1000000.0 / den + 0.5) / 1000000.0).alias(
            "intercept"
        ),
    )


# ---------------------------------------------------------------------------
# events_mann_kendall_trend — nonparametric trend test per user (bounded)
# ---------------------------------------------------------------------------

_MK_CAP = 32  # most-recent events per user entering the pairwise statistic


@query(
    "events_mann_kendall_trend",
    oracle=f"""
    WITH capped AS (
        SELECT user_id, ts, event_id,
               CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
        ) WHERE rn <= {_MK_CAP}
    )
    SELECT a.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN b.cents > a.cents THEN 1
                         WHEN b.cents < a.cents THEN -1 ELSE 0 END)
                AS BIGINT)          AS s_stat,
           CASE WHEN SUM(CASE WHEN b.cents > a.cents THEN 1
                              WHEN b.cents < a.cents THEN -1 ELSE 0 END) > 0
                THEN 'up'
                WHEN SUM(CASE WHEN b.cents > a.cents THEN 1
                              WHEN b.cents < a.cents THEN -1 ELSE 0 END) < 0
                THEN 'down' ELSE 'flat' END AS trend
    FROM capped a JOIN capped b
      ON a.user_id = b.user_id
     AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id))
    GROUP BY a.user_id
    """,
)
def events_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend statistic per user: S = Σ_(i<j) sign(vⱼ − vᵢ)
    over each user's recent events — the standard nonparametric 'is this
    series trending' test (robust to outliers, no distribution assumed).

    Scale shape: the pairwise statistic is quadratic per user, so the
    series is CAPPED to the {_MK_CAP} most recent events per user first
    (one user-partitioned window pass) — per-user work is then ≤
    {_MK_CAP}·({_MK_CAP}−1)/2 pairs regardless of history length, and the
    self-join shuffles both sides on user_id once. The sign comparisons
    are on integer cents, so S is exact integer arithmetic end-to-end."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    capped = (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _MK_CAP)
        .select(
            "user_id",
            "ts",
            "event_id",
            F.floor(F.col("value") * 100.0 + 0.5).cast("bigint").alias("cents"),
        )
    )
    a, b = capped.alias("a"), capped.alias("b")
    pairs = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (
            (F.col("a.ts") < F.col("b.ts"))
            | (
                (F.col("a.ts") == F.col("b.ts"))
                & (F.col("a.event_id") < F.col("b.event_id"))
            )
        ),
    )
    sign = (
        F.when(F.col("b.cents") > F.col("a.cents"), 1)
        .when(F.col("b.cents") < F.col("a.cents"), -1)
        .otherwise(0)
    )
    return (
        pairs.groupBy(F.col("a.user_id").alias("user_id"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(sign).cast("bigint").alias("s_stat"),
        )
        .select(
            "user_id",
            "n_pairs",
            "s_stat",
            F.when(F.col("s_stat") > 0, "up")
            .when(F.col("s_stat") < 0, "down")
            .otherwise("flat")
            .alias("trend"),
        )
    )


# ---------------------------------------------------------------------------
# events_sliding_distinct_users — trailing-window DISTINCT via contribution
# ---------------------------------------------------------------------------

_SDW_DAYS = 7  # trailing window length in days


@query(
    "events_sliding_distinct_users",
    oracle=f"""
    WITH du AS (
        SELECT DISTINCT CAST(DATE_TRUNC('day', ts) AS DATE) AS day, user_id
        FROM events
    ), days AS (
        SELECT DISTINCT day FROM du
    ), expanded AS (
        SELECT d.day AS day, du.user_id, du.day AS origin_day
        FROM du JOIN days d
          ON d.day >= du.day
         AND d.day < du.day + INTERVAL {_SDW_DAYS} DAY
    )
    SELECT day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS trailing_{_SDW_DAYS}d_users,
           CAST(COUNT(DISTINCT CASE WHEN day = origin_day THEN user_id END)
                AS BIGINT) AS dau
    FROM expanded
    GROUP BY day
    """,
)
def events_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-{_SDW_DAYS}-day DISTINCT active users per day (plus same-day
    DAU) — the rolling reach metric behind every WAU panel. COUNT(DISTINCT)
    over a RANGE window frame is not supported by Spark (or any engine,
    efficiently), so the engine uses the contribution-expansion identity:
    collapse to distinct (day, user) pairs FIRST (one hash-agg — after it,
    each user contributes at most once per day), explode each pair into
    the ≤ {_SDW_DAYS} later days it keeps the user 'active' for, semi-join
    to days that actually exist, and count distinct per target day. DAU
    rides the SAME expansion (the contribution whose target day equals its
    origin day), so both metrics share one distinct-aggregate pipeline —
    no second pass, no join of two aggregates.

    Scale shape: the expensive dedup runs BEFORE the {_SDW_DAYS}× fan-out,
    so the expanded shuffle carries {_SDW_DAYS}×|user-days| rows (user-days
    ≪ events), not {_SDW_DAYS}×|events|; the day list is a broadcast
    dimension. The window length is a bounded multiplier, exactly like the
    sliding-window expansion in events_sliding_windows. All-integer; no
    approximate sketch — this is the exact twin of a per-day HLL union."""
    e = table(spark, sf_dir, "events")
    du = e.select(
        F.to_date("ts").alias("origin_day"), "user_id"
    ).distinct()
    days = du.select(F.col("origin_day").alias("day")).distinct()
    expanded = du.select(
        F.explode(
            F.expr(f"sequence(origin_day, date_add(origin_day, {_SDW_DAYS - 1}))")
        ).alias("day"),
        "user_id",
        "origin_day",
    ).join(F.broadcast(days), "day", "left_semi")
    return expanded.groupBy("day").agg(
        F.countDistinct("user_id")
        .cast("long")
        .alias(f"trailing_{_SDW_DAYS}d_users"),
        F.countDistinct(
            F.when(F.col("day") == F.col("origin_day"), F.col("user_id"))
        )
        .cast("long")
        .alias("dau"),
    )


# ---------------------------------------------------------------------------
# events_holt_linear_forecast — Holt's double exponential smoothing
# ---------------------------------------------------------------------------

# smoothing constants as literal STRINGS so both engines parse the same
# double (the BM25/EWMA discipline); every recurrence subexpression below
# is textually identical in the Spark fold and the DuckDB recursive CTE,
# so the IEEE arithmetic is bit-identical step by step.
_HOLT_A = "0.3"   # level smoothing α
_HOLT_B = "0.1"   # trend smoothing β

_HOLT_L_STEP = (
    f"CAST({_HOLT_A} AS DOUBLE) * {{x}} "
    f"+ (1 - CAST({_HOLT_A} AS DOUBLE)) * ({{l}} + {{b}})"
)
_HOLT_B_STEP = (
    f"CAST({_HOLT_B} AS DOUBLE) * (({_HOLT_L_STEP}) - {{l}}) "
    f"+ (1 - CAST({_HOLT_B} AS DOUBLE)) * {{b}}"
)


@query(
    "events_holt_linear_forecast",
    oracle=f"""
    WITH RECURSIVE daily AS (
        SELECT event_type, DATE_TRUNC('day', ts) AS d,
               ROUND(SUM(value), 2) AS v
        FROM events GROUP BY 1, 2
    ), seq AS (
        SELECT event_type, v,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS i
        FROM daily
    ), holt AS (
        SELECT event_type, i, v AS l, CAST(0 AS DOUBLE) AS b
        FROM seq WHERE i = 1
        UNION ALL
        SELECT h.event_type, s.i,
               {_HOLT_L_STEP.format(x="s.v", l="h.l", b="h.b")},
               {_HOLT_B_STEP.format(x="s.v", l="h.l", b="h.b")}
        FROM holt h
        JOIN seq s ON s.event_type = h.event_type AND s.i = h.i + 1
    ), last AS (
        SELECT h.event_type, h.i AS n_days, h.l, h.b
        FROM holt h
        JOIN (SELECT event_type, MAX(i) AS n FROM seq GROUP BY 1) m
          ON m.event_type = h.event_type AND m.n = h.i
    )
    SELECT event_type,
           CAST(n_days AS BIGINT) AS n_days,
           ROUND(l, 4)            AS level4,
           ROUND(b, 4)            AS trend4,
           ROUND(l + 1 * b, 4)    AS fc_1,
           ROUND(l + 3 * b, 4)    AS fc_3,
           ROUND(l + 7 * b, 4)    AS fc_7
    FROM last
    """,
)
def events_holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's double exponential smoothing (level + linear trend) over the
    per-type daily value series, with 1/3/7-day-ahead forecasts — the
    classic capacity-planning forecaster, and the missing member of the
    events family next to EWMA (level only) and the seasonality profile
    (no trend): l_i = αx_i + (1−α)(l₋+b₋); b_i = β(l_i−l₋) + (1−β)b₋;
    f_h = l_n + h·b_n, α={_HOLT_A}, β={_HOLT_B}.

    Plan shape: the daily aggregate is one map-side-combinable pass over
    the facts; the recurrence then folds a DAYS-BOUNDED array per type
    (sort_array + aggregate(), a JVM lambda inside codegen — no Python,
    no driver loop, no iteration over jobs). At 100 TB the fold input is
    still |types| × |days| — the collect_list is calendar-bounded, never
    row-bounded. A linear recurrence cannot be a window cumulative sum
    (the EWMA rescaling trick has no stable 2-state analog: the state
    matrix's eigenvalues are complex for most α/β), so the fold IS the
    scale-correct formulation.

    Determinism: daily inputs are the repo-standard ROUND(SUM,2); the
    fold and the oracle's recursive CTE evaluate TEXTUALLY IDENTICAL
    double expressions in the same order (shared format strings, see
    _HOLT_L_STEP/_HOLT_B_STEP), so every step is IEEE-bit-identical
    across engines; 4-dp rounding at the end only.

    Reference parity: none (SURVEY §2.D north-star; forecasting gap in
    the events family)."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(F.round(F.sum("value"), 2).alias("v"))
    arr = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("d", "v"))).alias("dv")
    )
    l_step = _HOLT_L_STEP.format(x="x.v", l="acc.l", b="acc.b")
    b_step = _HOLT_B_STEP.format(x="x.v", l="acc.l", b="acc.b")
    fold = F.expr(
        f"""
        aggregate(
          dv,
          named_struct('l', CAST(0 AS DOUBLE), 'b', CAST(0 AS DOUBLE), 'i', 0),
          (acc, x) -> IF(acc.i = 0,
              named_struct('l', x.v, 'b', CAST(0 AS DOUBLE), 'i', 1),
              named_struct('l', {l_step},
                           'b', {b_step},
                           'i', acc.i + 1))
        )"""
    ).alias("st")
    return arr.select("event_type", fold).select(
        "event_type",
        F.col("st.i").cast("long").alias("n_days"),
        F.expr("round(st.l, 4)").alias("level4"),
        F.expr("round(st.b, 4)").alias("trend4"),
        F.expr("round(st.l + 1 * st.b, 4)").alias("fc_1"),
        F.expr("round(st.l + 3 * st.b, 4)").alias("fc_3"),
        F.expr("round(st.l + 7 * st.b, 4)").alias("fc_7"),
    )
