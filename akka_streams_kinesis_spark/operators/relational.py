"""Relational operators: scans, filters, joins, aggregations, set ops, scalars.

The reference (``/root/reference``) has NONE of these — it is a Kinesis
connector (SURVEY.md §2.D cites the evidence of absence). This module
supplies the full relational surface on Spark built-ins, expressed
declaratively so Catalyst provides pushdown, pruning, join selection,
whole-stage codegen and AQE without any custom rules.

Scale notes (100 TB stance):
- Small dimensions (region/nation/supplier) are explicitly ``broadcast()``
  so the fact-side scan never shuffles for them.
- Fact-fact joins (orders⋈lineitem) shuffle on the join key once; AQE
  handles skew at runtime.
- Every aggregate is expressed via ``groupBy().agg()`` → Catalyst emits
  partial (map-side) + final aggregation automatically.
- Floats that cross the DuckDB-oracle hash are rounded identically on both
  sides (sum→2dp, avg/ratio→4dp) so IEEE summation-order noise cannot flip
  the hash.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions import (
    MONEY_CENTS_DUCK,
    cents_to_money_str,
    money_cents,
    money_str_duck,
)
from ..io import table
from ..registry import query


# --------------------------------------------------------------------------
# Scans / filter / projection / simple aggregate
# --------------------------------------------------------------------------

@query(
    "tpch_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                       AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                  AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)               AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(ROUND(SUM(l_quantity), 2) / COUNT(*), 4)                  AS avg_qty,
           ROUND(ROUND(SUM(l_extendedprice), 2) / COUNT(*), 4)             AS avg_price,
           ROUND(ROUND(SUM(l_discount), 2) / COUNT(*), 4)                  AS avg_disc,
           COUNT(*)                                                        AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: filter → partial+final hash aggregate.

    The filter is pushed into the parquet scan (PushedFilters on
    l_shipdate); the groupBy keys have tiny cardinality (≤6 groups) so the
    shuffle after partial aggregation moves ~nothing at any scale.
    """
    l = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            # avg = round(sum,2)/count: the division inputs are then
            # bit-identical on both engines, so no summation-order noise can
            # flip the 4dp rounding at a tie boundary (money data ties often)
            F.round(F.round(F.sum("l_quantity"), 2) / F.count("*"), 4).alias("avg_qty"),
            F.round(F.round(F.sum("l_extendedprice"), 2) / F.count("*"), 4).alias("avg_price"),
            F.round(F.round(F.sum("l_discount"), 2) / F.count("*"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan+filter+agg — every predicate reaches the parquet
    reader as a pushed filter; zero shuffle beyond the single-row final agg."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.02, 0.06))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Joins: inner equi (fact⋈fact⋈dim), left outer, semi, anti, theta/range
# --------------------------------------------------------------------------

@query(
    "tpch_q3_top_orders",
    oracle="""
    SELECT o.o_orderkey,
           o.o_orderdate,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate  > TIMESTAMP '1996-06-30'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: 3-way join + agg + top-k.

    customer (filtered to one segment) is orders-of-magnitude smaller than
    lineitem, so we broadcast it; orders⋈lineitem is the one real shuffle,
    on the orderkey both sides. ORDER BY ... LIMIT compiles to TakeOrdered
    (per-partition top-k + driver merge) — no global sort at scale.
    """
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-06-30").cast("timestamp")
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q5_region_revenue",
    oracle="""
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY n.n_name
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style star join: every dimension (region→nation→customer)
    broadcast; the single shuffle is orders⋈lineitem on orderkey."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    l = table(spark, sf_dir, "lineitem")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    dim = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name")
    )
    return (
        o.join(l, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dim), o.o_custkey == dim.c_custkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@query(
    "join_left_outer_order_counts",
    oracle="""
    SELECT c.c_custkey,
           COUNT(o.o_orderkey)                        AS order_cnt,
           ROUND(COALESCE(SUM(o.o_totalprice), 0), 2) AS total_spend
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("order_cnt"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spend"),
        )
    )


@query(
    "join_semi_big_spenders",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS). The same shape as the reference's
    shard-lineage membership checks (SURVEY §2.A S4/S5 map to semi/anti
    joins over a shards relation)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti_inactive_customers",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS) — the DataFrame expression of the
    reference's root-shard discovery (`findOldestPossibleShards`,
    KinesisSource.scala:115-125: shards whose parent is absent)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_mktsegment")


@query(
    "join_range_price_bands",
    oracle="""
    SELECT p.p_brand,
           COUNT(*)                      AS n_cheaper_pairs,
           FLOOR(ROUND(SUM(p2.p_retailprice - p.p_retailprice), 2) * 10000.0
                 / COUNT(*) + 0.5) / 10000.0 AS avg_gap
    FROM part p
    JOIN part p2 ON p.p_brand = p2.p_brand AND p.p_retailprice < p2.p_retailprice
    GROUP BY p.p_brand
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range statement — per brand, the number of (cheaper, dearer)
    part pairs and their mean price gap — WITHOUT the pairwise join the
    statement naively implies (the oracle runs that naive O(n²) form;
    the round-5 full-registry scaling sweep measured it at 143× wall at
    10× data — 1.6 B pair evaluations at sf1). The engine instead uses
    the order-statistics identity: with per-(brand, price) counts c_k
    sorted by price, Σ_pairs (x_j − x_i) = Σ_k c_k·(p_k·C_k − S_k)
    where C_k / S_k are the strictly-preceding cumulative count / price
    mass — one hash-agg plus one per-brand sort, O(n log n), and ties
    (equal prices) pair with nothing, exactly like the strict < join.

    Parity: prices become exact integer CENTS before any arithmetic, so
    both the pair count and the gap mass are exact int64 sums
    (order-independent; magnitudes stay < 2⁵³ per brand even at sf1,
    ~9e18 headroom beyond); the 4dp average uses the FLOOR idiom on
    identical doubles in both engines."""
    p = table(spark, sf_dir, "part").select(
        "p_brand",
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("pc"),
    )
    per_price = p.groupBy("p_brand", "pc").agg(F.count("*").alias("c"))
    w_prior = (
        Window.partitionBy("p_brand")
        .orderBy("pc")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    k = per_price.select(
        "p_brand",
        "pc",
        "c",
        F.coalesce(F.sum("c").over(w_prior), F.lit(0)).alias("cum_c"),
        F.coalesce(F.sum(F.col("c") * F.col("pc")).over(w_prior), F.lit(0)).alias(
            "cum_cp"
        ),
    )
    per_brand = k.groupBy("p_brand").agg(
        F.sum(F.col("c") * F.col("cum_c")).alias("n_cheaper_pairs"),
        F.sum(
            F.col("c") * (F.col("pc") * F.col("cum_c") - F.col("cum_cp"))
        ).alias("gap_cents"),
    )
    return per_brand.filter(F.col("n_cheaper_pairs") > 0).select(
        "p_brand",
        "n_cheaper_pairs",
        (
            F.floor(
                F.col("gap_cents").cast("double") * 100.0 / F.col("n_cheaper_pairs")
                + 0.5
            )
            / 10000.0
        ).alias("avg_gap"),
    )


# --------------------------------------------------------------------------
# Aggregation variants: distinct, rollup, cube, grouping sets
# --------------------------------------------------------------------------

@query(
    "agg_distinct_users_per_type",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id)     AS distinct_users,
           COUNT(*)                    AS n_events,
           ROUND(SUM(value), 2)        AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation — Catalyst expands count(distinct) into a
    two-phase aggregate (expand + partial + final) automatically."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("distinct_users"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@query(
    "agg_approx_distinct_users",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE                    AS within_tolerance
    FROM events
    GROUP BY event_type
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++). The 100 TB path: a fixed-size
    sketch mergeable map-side, instead of the shuffle-heavy exact expand.

    The HLL estimate itself is implementation-specific, so it can't be
    value-hashed against DuckDB. Gate it instead by emitting the exact count
    plus a boolean asserting the sketch landed within 5% (2.5x the
    configured 2% rsd): the oracle emits the exact count and literal TRUE,
    so any sketch regression beyond tolerance hash-fails. rsd is 2%, not
    1% — register width scales 1/rsd² and the update runs per input row,
    so 1% sketches cost ~4x the rest of the aggregate (the same at-scale
    tradeoff as agg_hll_intersection_estimate)."""
    e = table(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    tol = (
        F.abs(F.col("approx_users") - F.col("exact_users"))
        / F.col("exact_users")
    ) <= 0.05
    return agg.select("event_type", "exact_users", tol.alias("within_tolerance"))


@query(
    "agg_rollup_region_nation",
    oracle="""
    SELECT r.r_name, n.n_name,
           COUNT(*)                   AS n_customers,
           ROUND(SUM(c.c_acctbal), 2) AS total_balance,
           GROUPING(r.r_name)  AS g_region,
           GROUPING(n.n_name)  AS g_nation
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over the region→nation hierarchy with GROUPING markers."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count("*").alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
        F.grouping("r_name").cast("long").alias("g_region"),
        F.grouping("n_name").cast("long").alias("g_nation"),
    )


@query(
    "agg_cube_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*)                    AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two independent dimensions."""
    o = table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL (same ANSI text as the oracle)."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# --------------------------------------------------------------------------
# Sort / limit / set operations
# --------------------------------------------------------------------------

@query(
    "sort_limit_top_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS total_price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: compiles to TakeOrderedAndProject — each partition
    keeps its local top-10, the driver merges; no full sort ever happens."""
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("total_price"))
    )


@query(
    "setops_segment_overlap",
    oracle="""
    SELECT 'both' AS tag, k FROM (
        SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT o_custkey AS k FROM orders WHERE o_totalprice > 200000
    )
    UNION ALL
    SELECT 'building_only' AS tag, k FROM (
        SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        EXCEPT
        SELECT o_custkey AS k FROM orders WHERE o_totalprice > 200000
    )
    """,
)
def setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL in one result, tagged."""
    building = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("k"))
    )
    spenders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 200000)
        .select(F.col("o_custkey").alias("k"))
    )
    both = building.intersect(spenders).select(F.lit("both").alias("tag"), "k")
    only = building.subtract(spenders).select(F.lit("building_only").alias("tag"), "k")
    return both.unionByName(only)


# --------------------------------------------------------------------------
# Scalar function families: string, date, JSON, math/case
# --------------------------------------------------------------------------

@query(
    "scalar_string_functions",
    oracle="""
    SELECT p_partkey,
           UPPER(SUBSTR(p_name, 1, 12))             AS name_prefix,
           CONCAT(p_brand, '-', p_type)             AS brand_type,
           LENGTH(p_name)                           AS name_len,
           REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g') AS devoweled
    FROM part
    WHERE p_type LIKE 'ECO%'
    """,
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: substring/upper/concat/length/regexp_replace/LIKE.
    (DuckDB regexp_replace needs the 'g' flag to match Spark's replace-all.)"""
    p = table(spark, sf_dir, "part")
    return p.filter(F.col("p_type").like("ECO%")).select(
        "p_partkey",
        F.upper(F.substring("p_name", 1, 12)).alias("name_prefix"),
        F.concat(F.col("p_brand"), F.lit("-"), F.col("p_type")).alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
    )


@query(
    "scalar_date_functions",
    oracle="""
    SELECT EXTRACT(year FROM o_orderdate)    AS order_year,
           EXTRACT(quarter FROM o_orderdate) AS order_quarter,
           COUNT(*)                          AS n_orders,
           ROUND(AVG(DATE_DIFF('day', DATE '1995-01-01', o_orderdate)), 4) AS avg_days_since_epoch
    FROM orders
    GROUP BY 1, 2
    """,
)
def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date family: year/quarter extraction + day arithmetic."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.quarter("o_orderdate").cast("long").alias("order_quarter"),
            F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias("days"),
        )
        .groupBy("order_year", "order_quarter")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.avg("days"), 4).alias("avg_days_since_epoch"),
        )
    )


@query(
    "scalar_json_extraction",
    oracle="""
    SELECT event_type,
           COUNT(*)                                              AS n,
           CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           ROUND(AVG(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)), 4) AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: get_json_object over the events.props payload — the
    decode step a ByteBuffer-stream consumer performs after the reference's
    schema-free source hands back raw bytes (KinesisSource.scala:68-69)."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.round(F.avg(k), 4).alias("avg_k"),
    )


@query(
    "scalar_math_case_tiers",
    oracle="""
    SELECT CASE WHEN l_quantity < 10 THEN 'low'
                WHEN l_quantity < 30 THEN 'mid'
                ELSE 'high' END AS qty_tier,
           COUNT(*)                                   AS n,
           ROUND(SUM(SQRT(l_extendedprice)), 2)       AS sum_sqrt_price,
           ROUND(AVG(LN(l_extendedprice + 1)), 4)     AS avg_log_price,
           ROUND(MAX(ABS(l_extendedprice - 1000)), 2) AS max_abs_dev
    FROM lineitem
    GROUP BY 1
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math + CASE family: sqrt/ln/abs with tiered grouping."""
    l = table(spark, sf_dir, "lineitem")
    tier = (
        F.when(F.col("l_quantity") < 10, "low")
        .when(F.col("l_quantity") < 30, "mid")
        .otherwise("high")
        .alias("qty_tier")
    )
    return l.groupBy(tier).agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.sqrt("l_extendedprice")), 2).alias("sum_sqrt_price"),
        F.round(F.avg(F.log(F.col("l_extendedprice") + 1)), 4).alias("avg_log_price"),
        F.round(F.max(F.abs(F.col("l_extendedprice") - 1000)), 2).alias("max_abs_dev"),
    )


@query(
    "scalar_null_handling",
    oracle="""
    SELECT c.c_custkey,
           COALESCE(o.o_orderstatus, 'NONE')            AS status_or_none,
           CASE WHEN o.o_orderkey IS NULL THEN 0 ELSE 1 END AS has_order,
           NULLIF(c.c_mktsegment, 'BUILDING')           AS seg_unless_building,
           ROUND(IFNULL(o.o_totalprice, 0.0), 2)        AS price_or_zero
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey AND o.o_totalprice > 450000
    WHERE c.c_custkey % 20 = 0
    """,
)
def scalar_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling scalar family over an outer join's null-extended rows:
    coalesce / nullif / ifnull / IS NULL — the functions every pipeline uses
    to normalize missing data after outer joins and sparse decodes."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 20 == 0)
    o = table(spark, sf_dir, "orders")
    return (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey")) & (F.col("o_totalprice") > 450000),
            "left",
        )
        .select(
            "c_custkey",
            F.coalesce(F.col("o_orderstatus"), F.lit("NONE")).alias("status_or_none"),
            F.when(F.col("o_orderkey").isNull(), 0).otherwise(1).alias("has_order"),
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_unless_building"),
            F.round(F.ifnull(F.col("o_totalprice"), F.lit(0.0)), 2).alias("price_or_zero"),
        )
    )


@query(
    "agg_hll_sketch_union",
    oracle="""
    SELECT COUNT(DISTINCT user_id) AS exact_users,
           TRUE                    AS within_tolerance
    FROM events
    """,
)
def agg_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch architecture (DataSketches HLL, Spark 3.5+): build
    one HLL sketch PER GROUP (event_type), then hll_union_agg the five
    binary sketches into a corpus-wide distinct estimate — the shape that
    lets 1000 executors sketch locally and merge kilobytes, and lets a
    rollup table answer distinct-users for any group combination without
    re-scanning facts. HLL register merge is a max — associative,
    commutative, order-insensitive — so the estimate is deterministic.
    Gated like agg_approx_distinct_users: exact count plus a boolean that
    the estimate landed within 5%; the oracle emits the exact count and
    literal TRUE."""
    e = table(spark, sf_dir, "events")
    per_type = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    unioned = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = e.agg(F.count_distinct("user_id").alias("exact_users"))
    tol = (
        F.abs(F.col("est") - F.col("exact_users")) / F.col("exact_users")
    ) <= 0.05
    return exact.crossJoin(unioned).select(
        "exact_users", tol.alias("within_tolerance")
    )


@query(
    "scalar_bitwise_functions",
    oracle="""
    SELECT event_id,
           event_id & 255                      AS low_byte,
           event_id | 4096                     AS with_flag,
           xor(event_id, 1431655765)           AS toggled,
           CAST(event_id << 3 AS BIGINT)       AS shifted_up,
           CAST(event_id >> 2 AS BIGINT)       AS shifted_down,
           bit_count(event_id)                 AS popcount
    FROM events WHERE event_id % 97 = 0
    """,
)
def scalar_bitwise_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar family (AND/OR/XOR/shifts/popcount) — the bit-math
    surface flag fields, bloom/bitmap indexes, and the Z-order operator
    lean on. Pure row-local projection in whole-stage codegen."""
    e = table(spark, sf_dir, "events").filter(F.col("event_id") % 97 == 0)
    return e.select(
        "event_id",
        F.col("event_id").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("event_id").bitwiseOR(F.lit(4096)).alias("with_flag"),
        F.col("event_id").bitwiseXOR(F.lit(1431655765)).alias("toggled"),
        F.expr("shiftleft(event_id, 3)").cast("long").alias("shifted_up"),
        F.expr("shiftright(event_id, 2)").cast("long").alias("shifted_down"),
        F.expr("bit_count(event_id)").alias("popcount"),
    )


@query(
    "agg_argmin_argmax_by",
    oracle="""
    WITH ext AS (
        SELECT o_orderpriority,
               MAX(o_totalprice) AS maxp,
               MIN(o_totalprice) AS minp
        FROM orders GROUP BY o_orderpriority
    )
    SELECT e.o_orderpriority,
           (SELECT MIN(o.o_orderkey) FROM orders o
             WHERE o.o_orderpriority = e.o_orderpriority
               AND o.o_totalprice = e.maxp)   AS biggest_order,
           ROUND(e.maxp, 2)                   AS biggest_price,
           (SELECT MIN(o.o_orderkey) FROM orders o
             WHERE o.o_orderpriority = e.o_orderpriority
               AND o.o_totalprice = e.minp)   AS smallest_order,
           ROUND(e.minp, 2)                   AS smallest_price
    FROM ext e
    """,
)
def agg_argmin_argmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmin/argmax aggregates (``max_by``/``min_by``): per priority
    class, WHICH order carries the extreme price, not just the extreme —
    the single-pass answer to the classic "row of the max" question that
    otherwise costs a join-back or a window. The pick is tie-PINNED with
    the struct-ordering idiom (max_by over (price, -key) / min_by over
    (price, key) → smallest orderkey among the extreme rows): the round-8
    sf1 canary proved bare arg_max engine-dependent the moment the data
    carried duplicate prices (sf1 is 10 key-shifted payload-verbatim
    copies, so every price ties 10 ways). The oracle states the same
    tiebreak as correlated MIN-where-extreme subqueries."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.expr(
            "max_by(o_orderkey, struct(o_totalprice, -o_orderkey))"
        ).alias("biggest_order"),
        F.round(F.max("o_totalprice"), 2).alias("biggest_price"),
        F.expr(
            "min_by(o_orderkey, struct(o_totalprice, o_orderkey))"
        ).alias("smallest_order"),
        F.round(F.min("o_totalprice"), 2).alias("smallest_price"),
    )


# ---------------------------------------------------------------------------
# join_bloom_prefilter_reduction — runtime-filter join reduction
# ---------------------------------------------------------------------------

# Bloom geometry: 2^17 bits (16 KiB) x 3 hashes. At the ~2.5% order
# selectivity this query targets, the false-positive rate is <<1%, and
# the filter size is CONSTANT in the key count — that is the point vs
# shipping the key set itself.
_JBF_M = 1 << 17
_JBF_K = 3
_JBF_LO, _JBF_HI = "1996-01-01", "1996-04-01"


@query(
    "join_bloom_prefilter_reduction",
    oracle=f"""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= '{_JBF_LO}' AND o.o_orderdate < '{_JBF_HI}'
    GROUP BY o.o_orderpriority
    """,
)
def join_bloom_prefilter_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter join reduction (the manual form of Spark's runtime
    bloom-filter injection, engine-independent and oracle-exact): revenue
    by priority for one quarter's orders, where the ~97% of lineitem rows
    that cannot join are dropped BEFORE the join by a 16 KiB Bloom filter
    built from the filtered orders' keys.

    Mechanics: the K bit positions per key are computed JVM-side
    (xxhash64(key, seed) — the same expression on build and probe sides;
    r12: was md5→hex→conv, 6× slower per row for identical semantics
    since ANY deterministic hash family works — false positives are
    removed by the exact join that follows, so the result provably
    equals the plain join, which is what the oracle runs). The build
    side collects only the DISTINCT set positions (bounded by M, not by
    key count); the probe is an Arrow-batched numpy bit-test over
    pre-computed position columns — no per-row Python, no hashing in
    Python. The probe UDF is marked nondeterministic so the optimizer
    neither duplicates it nor infers it onto the orders side of the
    confirm join (guide §4.4 — the r12 before-plan shows a second
    ArrowEvalPython on orders from exactly that inference).

    At 100 TB: the orders side of a quarter exceeds any broadcast
    threshold, so the plain plan shuffles ALL of lineitem; the bloom is
    16 KiB regardless of scale and cuts the fact-side exchange by the
    join selectivity. This is exactly Spark's
    ``spark.sql.optimizer.runtime.bloomFilter`` rewrite — done by hand so
    the filter geometry and parity are explicit."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    sel = o.filter(
        (F.col("o_orderdate") >= F.lit(_JBF_LO))
        & (F.col("o_orderdate") < F.lit(_JBF_HI))
    ).select("o_orderkey", "o_orderpriority")

    def _positions(key: F.Column) -> list[F.Column]:
        return [
            F.pmod(F.xxhash64(key, F.lit(i)), F.lit(_JBF_M)) for i in range(_JBF_K)
        ]

    set_bits = (
        sel.select(
            F.explode(F.array(*_positions(F.col("o_orderkey")))).alias("pos")
        )
        .distinct()
        .collect()
    )
    bits = bytearray(_JBF_M // 8)
    for row in set_bits:
        bits[row.pos >> 3] |= 1 << (row.pos & 7)
    bloom_bc = spark.sparkContext.broadcast(bytes(bits))

    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def _might_contain(p0: pd.Series, p1: pd.Series, p2: pd.Series) -> pd.Series:
        arr = np.frombuffer(bloom_bc.value, dtype=np.uint8)
        ok = np.ones(len(p0), dtype=bool)
        for pc in (p0, p1, p2):
            p = pc.to_numpy()
            ok &= (arr[p >> 3] & (1 << (p & 7)).astype(np.uint8)) != 0
        return pd.Series(ok)

    # nondeterministic pin (guide §4.4): without it, constraint inference
    # copies this predicate across the equi-join onto the orders side — a
    # second ArrowEvalPython evaluating the bloom over rows the bloom was
    # BUILT from (see plans/r12/join_bloom_prefilter_reduction_before.txt
    # nodes 3 and 8)
    _might_contain = _might_contain.asNondeterministic()

    probed = li.select(
        "l_orderkey",
        "l_extendedprice",
        "l_discount",
        *[
            p.alias(f"_p{i}")
            for i, p in enumerate(_positions(F.col("l_orderkey")))
        ],
    )
    candidates = probed.filter(
        _might_contain(*[F.col(f"_p{i}") for i in range(_JBF_K)])
    ).drop(*[f"_p{i}" for i in range(_JBF_K)])
    return (
        candidates.join(sel, candidates.l_orderkey == sel.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# agg_weighted_median — exact weighted median via cumulative-weight window
# ---------------------------------------------------------------------------


@query(
    "agg_weighted_median",
    oracle="""
    WITH byval AS (
        SELECT l_returnflag, l_linestatus, l_extendedprice AS v,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
        FROM lineitem
        GROUP BY 1, 2, 3
    ), cum AS (
        SELECT l_returnflag, l_linestatus, v, w,
               CAST(SUM(w) OVER (PARTITION BY l_returnflag, l_linestatus
                                 ORDER BY v
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cw,
               CAST(SUM(w) OVER (PARTITION BY l_returnflag, l_linestatus)
                    AS BIGINT) AS tw
        FROM byval
    )
    SELECT l_returnflag, l_linestatus,
           MIN(v)  AS weighted_median,
           MIN(tw) AS total_weight
    FROM cum
    WHERE 2 * cw >= tw
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact WEIGHTED median per group (here: extendedprice weighted by
    quantity per returnflag×linestatus — 'the price a median shipped UNIT
    carries', not the median line). Spark has percentile/median but no
    weighted variant; the engine derives it exactly: collapse to distinct
    values with integer total weights (one hash-agg — the shuffle carries
    |distinct values| rows, not the fact table), cumulative-weight window
    per group, then the smallest value whose cumulative weight reaches
    half the total (lower weighted median; 2*cw >= tw in exact integer
    arithmetic — no float fraction).

    Scale shape (r12 — bucket-then-refine): the old plan windowed the
    ENTIRE collapsed value table partitioned only by the 6 groups — six
    single-task sorts of the whole value table, a genuine straggler at
    scale (guide §2.5: windows get no AQE skew handling). Now a
    fixed-width value bucketing aggregates per-(group, bucket) weights
    in one parallel pass (shuffle carries groups × buckets rows), a
    window over that TINY bucket table locates each group's median
    bucket exactly (2·cum ≥ tot in int64), and only the median bucket's
    values are re-aggregated and windowed — per-group work is one bucket
    of values, never the value table. floor(v / width) is monotone in v
    (IEEE division is monotone, floor is monotone), so bucket order
    respects value order and the refined minimum equals the global
    lower weighted median; all boundary compares stay int64."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_linestatus",
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    bkt = F.floor(F.col("v") / F.lit(64.0)).cast("long")
    bw = li.groupBy(
        "l_returnflag", "l_linestatus", bkt.alias("bkt")
    ).agg(F.sum("q").cast("long").alias("bw"))
    grp = Window.partitionBy("l_returnflag", "l_linestatus")
    bcum = grp.orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    marked = bw.select(
        "l_returnflag",
        "l_linestatus",
        "bkt",
        "bw",
        F.sum("bw").over(bcum).cast("long").alias("bcw"),
        F.sum("bw").over(grp).cast("long").alias("tw"),
    )
    # first bucket whose cumulative weight clears half the total; carry
    # the cumulative weight BEFORE it so the in-bucket refine continues
    # the same running sum
    med_bkt = (
        marked.filter(F.lit(2) * F.col("bcw") >= F.col("tw"))
        .groupBy(
            F.col("l_returnflag").alias("m_rf"),
            F.col("l_linestatus").alias("m_ls"),
        )
        .agg(
            F.min_by(F.col("bkt"), F.col("bkt")).alias("m_bkt"),
            F.min_by(F.col("bcw") - F.col("bw"), F.col("bkt")).alias("cum_before"),
            F.min("tw").alias("tw"),
        )
    )
    in_bucket = li.join(
        F.broadcast(med_bkt),
        (F.col("l_returnflag") == F.col("m_rf"))
        & (F.col("l_linestatus") == F.col("m_ls"))
        & (bkt == F.col("m_bkt")),
    ).select(
        "l_returnflag",
        "l_linestatus",
        "v",
        "q",
        "cum_before",
        "tw",
    )
    byval = in_bucket.groupBy(
        "l_returnflag", "l_linestatus", "v", "cum_before", "tw"
    ).agg(F.sum("q").cast("long").alias("w"))
    vcum = grp.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    refined = byval.select(
        "l_returnflag",
        "l_linestatus",
        "v",
        "tw",
        (F.col("cum_before") + F.sum("w").over(vcum)).cast("long").alias("cw"),
    )
    return (
        refined.filter(F.lit(2) * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.min("v").alias("weighted_median"),
            F.min("tw").alias("total_weight"),
        )
    )


# ---------------------------------------------------------------------------
# scalar_decimal_money_arithmetic — exact DECIMAL money semantics
# ---------------------------------------------------------------------------


_MONEY_AGG_ORACLE = f"""
    WITH money AS (
        SELECT o_orderpriority,
               {MONEY_CENTS_DUCK.format(col="o_totalprice")} AS cents
        FROM orders
    ), agg AS (
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT)   AS n,
               CAST(SUM(cents) AS BIGINT) AS total_cents,
               CAST(MIN(cents) AS BIGINT) AS min_cents,
               CAST(MAX(cents) AS BIGINT) AS max_cents
        FROM money
        GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, n, total_cents, min_cents, max_cents,
           {money_str_duck("total_cents")} AS total_money,
           {money_str_duck("min_cents")}   AS min_money,
           {money_str_duck("max_cents")}   AS max_money
    FROM agg
"""


def _money_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    money = o.select(
        "o_orderpriority",
        money_cents(F.col("o_totalprice")).alias("cents"),
    )
    agg = money.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.min("cents").cast("long").alias("min_cents"),
        F.max("cents").cast("long").alias("max_cents"),
    )
    return agg.select(
        "o_orderpriority",
        "n",
        "total_cents",
        "min_cents",
        "max_cents",
        cents_to_money_str(F.col("total_cents")).alias("total_money"),
        cents_to_money_str(F.col("min_cents")).alias("min_money"),
        cents_to_money_str(F.col("max_cents")).alias("max_money"),
    )


@query("scalar_decimal_money_arithmetic", oracle=_MONEY_AGG_ORACLE)
def scalar_decimal_money_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact fixed-point money arithmetic — the semantics every financial
    aggregate actually requires (doubles drift with aggregation order).
    Cents are derived ONCE from the parquet DOUBLE with the FLOOR idiom
    (`money_cents`: pure IEEE ops, bit-identical across engines and
    versions — a double→DECIMAL cast is engine-defined at the half-cent
    boundary and actually diverged between DuckDB versions). All
    aggregation runs in BIGINT cents.

    DRIVER-GATE TYPE DISCIPLINE (round-8 fix for the two-round driver-red
    hash): the gated projection carries ONLY driver-proven-safe types —
    BIGINT cents plus a canonical VARCHAR rendering built by pure digit
    slicing (`cents_to_money_str` / `money_str_duck`). No DECIMAL-typed
    and no cross-engine-computed BOOLEAN column ever reaches the hash;
    the DECIMAL rendering semantics stay audited in
    tests/test_money_cents.py, and tests/test_oracle_types.py bans
    DecimalType from every gated schema (the HUGEINT ban's twin).
    Single-column debug twins (`..._dbg_*`) are registered so a
    CORRECTNESS row can isolate the offending column if red persists.

    Scale shape: one partial+final hash aggregate over int64 — exactness
    costs no extra shuffle, no UDF, and no 128-bit decimal accumulator.

    Reference semantics preserved: exact integer accumulation, the analog
    of the reference's integer sequence-number ordering discipline
    (KinesisSource.scala:59-63)."""
    return _money_agg(spark, sf_dir)


def _money_dbg(col: str):
    oracle = f"""
    SELECT o_orderpriority, {col}
    FROM ({_MONEY_AGG_ORACLE})
    """

    @query(f"scalar_decimal_money_dbg_{col}", oracle=oracle)
    def dbg(spark: SparkSession, sf_dir: str, _col=col) -> DataFrame:
        """Single-column debug twin of scalar_decimal_money_arithmetic:
        isolates WHICH gated column diverges if the driver row is ever
        red again (VERDICT r07 ask #1b). Same plan, one value column."""
        return _money_agg(spark, sf_dir).select("o_orderpriority", _col)

    return dbg


for _c in ("n", "total_cents", "total_money"):
    _money_dbg(_c)


# ---------------------------------------------------------------------------
# scalar_variant_json_shredding — Spark 4 VARIANT ingestion of JSON props
# ---------------------------------------------------------------------------


@query(
    "scalar_variant_json_shredding",
    oracle="""
    WITH shredded AS (
        SELECT event_type,
               CAST(props -> '$.k' AS BIGINT) AS k
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT)         AS n,
           CAST(COUNT(k) AS BIGINT)         AS n_with_k,
           CAST(MIN(k) AS BIGINT)           AS min_k,
           CAST(MAX(k) AS BIGINT)           AS max_k,
           CAST(SUM(k) AS BIGINT)           AS sum_k,
           FLOOR(SUM(k) * 10000.0 / COUNT(k) + 0.5) / 10000.0 AS avg_k4
    FROM shredded
    GROUP BY event_type
    """,
)
def scalar_variant_json_shredding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ingestion through Spark 4's VARIANT type: the JSON
    props payload is parsed ONCE into a binary variant (`parse_json`) and
    fields are shredded out with typed `variant_get` paths — the
    schema-on-read path that replaces per-query JSON string re-parsing
    (get_json_object re-tokenizes the text on every extraction; variant
    parses once and field access is a binary offset walk, the same
    open-format design Parquet variant shredding standardizes). The
    oracle is DuckDB's native JSON extraction over the same column —
    typed field values must agree exactly.

    Scale shape: parse + shred are row-local projections inside
    whole-stage codegen; the rollup is one partial+final hash-agg. At
    100 TB the variant parse happens at INGEST and the shredded column is
    stored; this operator is that ingest step, gated.

    Determinism: integer field sums; the mean rounds through the
    FLOOR-1e4 idiom."""
    e = table(spark, sf_dir, "events")
    v = F.parse_json("props")
    shredded = e.select(
        "event_type",
        F.variant_get(v, "$.k", "bigint").alias("k"),
    )
    return shredded.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.count("k").cast("long").alias("n_with_k"),
        F.min("k").cast("long").alias("min_k"),
        F.max("k").cast("long").alias("max_k"),
        F.sum("k").cast("long").alias("sum_k"),
        (F.floor(F.sum("k") * 10000.0 / F.count("k") + 0.5) / 10000.0).alias(
            "avg_k4"
        ),
    )
