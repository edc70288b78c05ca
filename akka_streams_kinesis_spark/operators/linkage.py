"""Record linkage & change-tracking operators: blocked fuzzy entity
resolution, snapshot diffing, and marketing-style last-touch attribution.

- ``join_fuzzy_entity_resolution``: the classic ER shape — dirty records
  matched against a canonical catalog with *blocking* (cheap equality
  keys bound the candidate set) followed by an edit-distance verify and
  a deterministic best-match pick. The catalog side is bounded (distinct
  entity names), so at 100 TB it broadcasts and the dirty side never
  shuffles: block + levenshtein + top-1 all run map-side inside
  whole-stage codegen (``levenshtein`` is a JVM built-in, no Python).
- ``maintenance_snapshot_diff``: CDC-style diff of two keyed snapshots
  (added / removed / changed), the audit step behind incremental
  publishes. One full-outer join on the key — single co-partitioned
  shuffle; change detection compares md5 digests so wide payloads
  diff on a 32-byte column.
- ``behavior_attribution_last_touch``: attribute each purchase to the
  user's most recent preceding click within a horizon — per-user ordered
  window (``last(..., ignorenulls)`` over strictly-preceding rows), then
  a date-keyed rollup. Per-user state is bounded; the window partitions
  by user_id (high cardinality, skew-free), so no whole-table sort.

Reference parity: none — the reference is a Kinesis connector with no
relational surface (SURVEY.md §2.D); driver-mandated north-star
extensions supplied Spark-first. All three DuckDB-oracle-gated.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions import MONEY_CENTS_DUCK, money_cents
from ..io import table
from ..registry import query

# ---------------------------------------------------------------------------
# join_fuzzy_entity_resolution
# ---------------------------------------------------------------------------

# Deterministic corruption of part names, expressible identically in both
# engines (the "dirty feed" a real ER pipeline receives):
#   key % 4 = 0 → drop the 2nd character        (edit distance 1)
#   key % 4 = 1 → append an 'x'                 (edit distance 1)
#   key % 4 = 2 → every 'o' becomes '0'         (distance = #o's)
#   key % 4 = 3 → unchanged                     (distance 0)
_DIRTY_CASE = (
    "CASE p_partkey % 4 "
    "WHEN 0 THEN SUBSTR(p_name, 1, 1) || SUBSTR(p_name, 3) "
    "WHEN 1 THEN p_name || 'x' "
    "WHEN 2 THEN REPLACE(p_name, 'o', '0') "
    "ELSE p_name END"
)
_FUZZY_MAX_DIST = 2
_FUZZY_LEN_BAND = 2


@query(
    "join_fuzzy_entity_resolution",
    oracle=f"""
    WITH dirty AS (
        SELECT p_partkey, {_DIRTY_CASE} AS dirty_name FROM part
    ), catalog AS (
        SELECT DISTINCT p_name AS canon_name FROM part
    ), cand AS (
        SELECT d.p_partkey, d.dirty_name, c.canon_name,
               levenshtein(d.dirty_name, c.canon_name) AS edit_dist
        FROM dirty d JOIN catalog c
          ON SUBSTR(d.dirty_name, 1, 1) = SUBSTR(c.canon_name, 1, 1)
         AND ABS(LENGTH(d.dirty_name) - LENGTH(c.canon_name)) <= {_FUZZY_LEN_BAND}
        WHERE levenshtein(d.dirty_name, c.canon_name) <= {_FUZZY_MAX_DIST}
    ), best AS (
        SELECT p_partkey, dirty_name, canon_name, edit_dist,
               ROW_NUMBER() OVER (
                   PARTITION BY p_partkey
                   ORDER BY edit_dist, canon_name
               ) AS rn
        FROM cand
    )
    SELECT p_partkey, dirty_name, canon_name, edit_dist
    FROM best WHERE rn = 1
    """,
)
def join_fuzzy_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy entity resolution: a deterministically-corrupted
    "dirty" feed of part names is matched back to the canonical name
    catalog. Blocking keys (shared first character + length band) bound
    the candidate pairs; ``levenshtein <= 2`` verifies; the best match
    per record is the (distance, name) minimum, picked with a
    per-record window.

    Scale shape: the catalog is DISTINCT entity names — bounded and tiny
    relative to the record feed — so Spark broadcasts it and the dirty
    side is a single map-side pass (block filter, JVM levenshtein, and
    the top-1 window all keyed by p_partkey, which the feed is already
    effectively partitioned by). No all-pairs product: blocking is part
    of the operator contract, mirrored exactly in the oracle."""
    p = table(spark, sf_dir, "part")
    dirty = p.select(
        "p_partkey", F.expr(_DIRTY_CASE).alias("dirty_name")
    )
    catalog = p.select(F.col("p_name").alias("canon_name")).distinct()
    cand = dirty.join(
        F.broadcast(catalog),
        (F.substring("dirty_name", 1, 1) == F.substring("canon_name", 1, 1))
        & (
            F.abs(F.length("dirty_name") - F.length("canon_name"))
            <= _FUZZY_LEN_BAND
        )
        & (F.levenshtein("dirty_name", "canon_name") <= _FUZZY_MAX_DIST),
    ).withColumn("edit_dist", F.levenshtein("dirty_name", "canon_name"))
    w = Window.partitionBy("p_partkey").orderBy("edit_dist", "canon_name")
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "p_partkey",
            "dirty_name",
            "canon_name",
            F.col("edit_dist").cast("long").alias("edit_dist"),
        )
    )


# ---------------------------------------------------------------------------
# maintenance_snapshot_diff
# ---------------------------------------------------------------------------

# Two latest-state-per-user snapshots built from overlapping event-id
# slices plus disjoint excluded user cohorts (simulating account creates
# and deletes between the snapshots), so the diff exercises all three
# change types: cohort 1 exists only in NEW (added), cohort 2 only in
# OLD (removed), and users whose latest event differs between the
# slices are CHANGED.
_SNAP_OLD_PRED = "event_id % 10 < 8 AND user_id % 23 <> 1"
_SNAP_NEW_PRED = "event_id % 10 >= 2 AND user_id % 23 <> 2"


def _snapshot_sql(pred: str) -> str:
    return f"""
        SELECT user_id, event_id, event_type,
               MD5(CAST(event_id AS VARCHAR) || ':' || event_type) AS digest
        FROM (
            SELECT user_id, event_id, event_type,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events WHERE {pred}
        ) WHERE rn = 1
    """


def _snapshot_df(e: DataFrame, pred: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.filter(F.expr(pred))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.md5(
                F.concat_ws(":", F.col("event_id").cast("string"), "event_type")
            ).alias("digest"),
        )
    )


@query(
    "maintenance_snapshot_diff",
    oracle=f"""
    WITH old_snap AS ({_snapshot_sql(_SNAP_OLD_PRED)}),
    new_snap AS ({_snapshot_sql(_SNAP_NEW_PRED)})
    SELECT COALESCE(o.user_id, n.user_id) AS user_id,
           CASE WHEN o.user_id IS NULL THEN 'added'
                WHEN n.user_id IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type,
           o.event_id  AS old_event_id,
           n.event_id  AS new_event_id,
           o.event_type AS old_event_type,
           n.event_type AS new_event_type
    FROM old_snap o FULL OUTER JOIN new_snap n ON o.user_id = n.user_id
    WHERE o.user_id IS NULL OR n.user_id IS NULL OR o.digest <> n.digest
    """,
)
def maintenance_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style diff of two keyed snapshots: rows added, removed, or
    changed between the OLD and NEW latest-state-per-user tables.
    Unchanged keys (digest-equal) are filtered out, so the output is the
    change feed an incremental publish would ship.

    Plan: both snapshots reduce per-user (row_number window on user_id —
    high-cardinality, skew-free), then ONE full-outer sort-merge join on
    user_id; both sides arrive already hash-partitioned by user_id from
    their windows, so AQE reuses the partitioning. Change detection
    compares 32-byte md5 digests — at 100 TB with wide payloads the
    shuffle carries digests, not row bodies."""
    e = table(spark, sf_dir, "events")
    old_snap = _snapshot_df(e, _SNAP_OLD_PRED)
    new_snap = _snapshot_df(e, _SNAP_NEW_PRED)
    o = old_snap.select(
        F.col("user_id").alias("o_uid"),
        F.col("event_id").alias("old_event_id"),
        F.col("event_type").alias("old_event_type"),
        F.col("digest").alias("o_digest"),
    )
    n = new_snap.select(
        F.col("user_id").alias("n_uid"),
        F.col("event_id").alias("new_event_id"),
        F.col("event_type").alias("new_event_type"),
        F.col("digest").alias("n_digest"),
    )
    joined = o.join(n, o.o_uid == n.n_uid, "full_outer")
    return joined.filter(
        F.col("o_uid").isNull()
        | F.col("n_uid").isNull()
        | (F.col("o_digest") != F.col("n_digest"))
    ).select(
        F.coalesce("o_uid", "n_uid").alias("user_id"),
        F.when(F.col("o_uid").isNull(), "added")
        .when(F.col("n_uid").isNull(), "removed")
        .otherwise("changed")
        .alias("change_type"),
        "old_event_id",
        "new_event_id",
        "old_event_type",
        "new_event_type",
    )


# ---------------------------------------------------------------------------
# behavior_attribution_last_touch
# ---------------------------------------------------------------------------

_ATTR_HORIZON_S = 259200  # 3 days


@query(
    "behavior_attribution_last_touch",
    oracle=f"""
    WITH tagged AS (
        SELECT user_id, ts, event_id, event_type, value,
               LAST_VALUE(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS last_click_ts
        FROM events
    ), purchases AS (
        SELECT CAST(ts AS DATE) AS day,
               {MONEY_CENTS_DUCK.format(col="value")} AS cents,
               (last_click_ts IS NOT NULL
                AND epoch_us(ts) - epoch_us(last_click_ts)
                    <= CAST({_ATTR_HORIZON_S} AS BIGINT) * 1000000)
                   AS attributed,
               epoch_us(ts) - epoch_us(last_click_ts) AS latency_us
        FROM tagged WHERE event_type = 'purchase'
    )
    SELECT day,
           COUNT(*) AS n_purchases,
           CAST(SUM(CASE WHEN attributed THEN 1 ELSE 0 END) AS BIGINT)
               AS n_attributed,
           CAST(SUM(CASE WHEN attributed THEN cents ELSE 0 END) AS DOUBLE)
               / 100.0 AS attributed_value,
           CAST(SUM(CASE WHEN NOT attributed THEN cents ELSE 0 END) AS DOUBLE)
               / 100.0 AS organic_value,
           ROUND(AVG(CASE WHEN attributed THEN latency_us END) / 1000000, 4)
               AS avg_latency_s
    FROM purchases
    GROUP BY day
    """,
)
def behavior_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the user's
    most recent strictly-preceding click if it happened within a 3-day
    horizon; purchases with no qualifying click are organic. Daily
    rollup of purchase counts, attributed vs organic value, and mean
    click→purchase latency.

    Plan: ONE per-user ordered window (``last(..., ignorenulls=True)``
    over strictly-preceding rows) tags every event with its latest click
    timestamp — user_id is high-cardinality so the window shuffle is
    skew-free and per-partition state is one timestamp. The daily rollup
    is a plain hash aggregate with map-side partials. No joins at all:
    the self-join formulation (purchases × clicks with a time band)
    would shuffle twice and explode on chatty users; the window form is
    linear in events."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tagged = e.withColumn(
        "last_click_ts",
        F.last(
            F.when(F.col("event_type") == "click", F.col("ts")),
            ignorenulls=True,
        ).over(w),
    )
    # integer microseconds: DuckDB's epoch() is fractional while Spark's
    # unix_timestamp() truncates — epoch_us/unix_micros agree exactly
    latency = F.unix_micros("ts") - F.unix_micros("last_click_ts")
    purchases = tagged.filter(F.col("event_type") == "purchase").select(
        F.to_date("ts").alias("day"),
        # integer-cents sum: exact, order-independent — no float drift
        # between Spark's partial aggregates and the oracle, and no
        # engine-version-defined double→DECIMAL cast (money_cents)
        money_cents(F.col("value")).alias("cents"),
        (
            F.col("last_click_ts").isNotNull()
            & (latency <= _ATTR_HORIZON_S * 1_000_000)
        ).alias("attributed"),
        latency.alias("latency_us"),
    )
    return purchases.groupBy("day").agg(
        F.count("*").alias("n_purchases"),
        F.sum(F.col("attributed").cast("long")).alias("n_attributed"),
        (
            F.sum(
                F.when(F.col("attributed"), F.col("cents")).otherwise(F.lit(0))
            ).cast("double")
            / F.lit(100.0)
        ).alias("attributed_value"),
        (
            F.sum(
                F.when(~F.col("attributed"), F.col("cents")).otherwise(F.lit(0))
            ).cast("double")
            / F.lit(100.0)
        ).alias("organic_value"),
        F.round(
            F.avg(F.when(F.col("attributed"), F.col("latency_us"))) / 1_000_000,
            4,
        ).alias("avg_latency_s"),
    )
