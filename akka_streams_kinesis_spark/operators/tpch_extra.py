"""Extended TPC-H-derived query suite (Q4/Q7/Q8/Q10/Q13/Q14/Q17/Q18/Q19/Q21/Q22
shapes) plus the remaining outer-join kinds (FULL, RIGHT).

The reference (``/root/reference``) has no relational surface at all
(SURVEY.md §2.D) — these queries pin the join/agg/subquery coverage a user
of a real analytics engine expects, adapted to the driver's slimmed TPC-H
schema (no partsupp table; lineitem has no commitdate/receiptdate/shipmode,
so the Q4/Q21 "late delivery" predicates are re-expressed against
``l_shipdate - o_orderdate``).

Scale notes (100 TB stance):
- nation/region (25/5 rows at every SF) are always broadcast.
- supplier is broadcast where it joins the lineitem fact: it is 1/10th of
  customer and two orders of magnitude under the fact tables.
- part⋈lineitem and orders⋈lineitem shuffle on their keys — these are the
  unavoidable fact-fact exchanges; AQE coalesces/skew-splits at runtime.
- Correlated EXISTS / scalar subqueries are expressed as semi joins and
  broadcast single-row aggregates in the DataFrame plans — the shapes
  Catalyst would rewrite them to anyway — so nothing relies on a
  driver-side loop.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..io import table
from ..registry import query


# --------------------------------------------------------------------------
# Q4: priority check via correlated EXISTS (late-shipment adaptation)
# --------------------------------------------------------------------------

@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS with an inequality against the
    outer row → left-semi join with a compound condition. The date filter
    prunes orders at the scan; the semi join shuffles both sides on
    orderkey once and keeps no lineitem payload columns."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAY")
    )
    return (
        o.join(l, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# --------------------------------------------------------------------------
# Q7: volume shipping between two nations
# --------------------------------------------------------------------------

@query(
    "tpch_q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               EXTRACT(year FROM l.l_shipdate) AS l_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bidirectional nation-pair trade volume by ship year.

    supplier+nation collapse to a broadcast map keyed by suppkey; the
    customer side rides the orders⋈lineitem shuffle. The nation-pair
    disjunction is applied after both nation names are attached — Catalyst
    pushes the n1/n2 IN-filters into the broadcast build sides."""
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pair = F.col("n_name").isin("NATION_1", "NATION_2")
    s = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(n.filter(pair)), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(n.filter(pair)), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
        )
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# Q8: national market share within a region
# --------------------------------------------------------------------------

@query(
    "tpch_q8_market_share",
    oracle="""
    SELECT o_year,
           ROUND(ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END), 2)
                 / ROUND(SUM(volume), 2), 4) AS mkt_share
    FROM (
        SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n2.n_name AS nation
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
        JOIN region r   ON n1.n_regionkey = r.r_regionkey
        JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'ASIA' AND p.p_type LIKE 'ECONOMY%'
    ) all_nations
    GROUP BY o_year
    """,
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_3's share of ECONOMY-part revenue sold into ASIA.

    Two star arms: (part filter) joins the lineitem fact on partkey;
    (customer→nation→region) restricts the order side. Only part⋈lineitem
    and orders⋈lineitem are real shuffles; every nation/region hop is a
    broadcast. The share is a conditional-sum / sum ratio — one aggregate
    pass, no self-join."""
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_type").like("ECONOMY%"))
        .select("p_partkey")
    )
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("nation"))),
            F.col("s_nationkey") == F.col("nk2"),
        )
        .select("s_suppkey", "nation")
    )
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.round(F.sum(F.when(F.col("nation") == "NATION_3", volume).otherwise(0.0)), 2)
                / F.round(F.sum(volume), 2),
                4,
            ).alias("mkt_share")
        )
    )


# --------------------------------------------------------------------------
# Q10: returned-item reporting (top 20 lossy customers)
# --------------------------------------------------------------------------

@query(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           ROUND(c.c_acctbal, 2) AS acctbal,
           n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: revenue lost to returns per customer, top 20.

    The returnflag filter prunes lineitem at the scan; orders carries the
    quarter filter. ORDER BY + LIMIT compiles to TakeOrdered — per-partition
    top-20 then driver merge, no global sort. The tiebreak on c_custkey
    makes the cut deterministic for the oracle hash."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q13: customer order-count distribution (outer join + double aggregate)
# --------------------------------------------------------------------------

@query(
    "tpch_q13_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                          AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: histogram of per-customer order counts. The left join
    keeps zero-order customers (count 0 bucket); the second aggregate is a
    tiny shuffle (distinct count values ~ tens)."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --------------------------------------------------------------------------
# Q14: promotion revenue share
# --------------------------------------------------------------------------

@query(
    "tpch_q14_promo_effect",
    oracle="""
    SELECT ROUND(100.0 * ROUND(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                                        THEN l.l_extendedprice * (1 - l.l_discount)
                                        ELSE 0 END), 2)
                 / ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2), 4) AS promo_revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01'
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: percent of one month's revenue from PROMO parts.
    Conditional-sum ratio in a single aggregate pass; the month filter
    prunes lineitem at the scan so the part join sees ~1/70th of the
    fact table."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.round(
                100.0
                * F.round(F.sum(F.when(F.col("p_type").like("PROMO%"), rev).otherwise(0.0)), 2)
                / F.round(F.sum(rev), 2),
                4,
            ).alias("promo_revenue")
        )
    )


# --------------------------------------------------------------------------
# Q17: small-quantity-order revenue (correlated scalar subquery per part)
# --------------------------------------------------------------------------

@query(
    "tpch_q17_small_qty_revenue",
    oracle="""
    SELECT ROUND(ROUND(SUM(l.l_extendedprice), 2) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                          FROM lineitem l2
                          WHERE l2.l_partkey = l.l_partkey)
    """,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from orders far below a part's average quantity.

    The correlated per-part AVG is decorrelated into a groupBy(l_partkey)
    aggregate joined back on partkey — the exact rewrite Catalyst applies
    to the SQL form, made explicit. At scale the avg side is a map-side
    partial aggregate over the same shuffle key as the join, and the
    Brand#23 filter shrinks the probe side to ~1/50 of part first."""
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    l = table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    part_avg = l.groupBy(F.col("l_partkey").alias("avg_pk")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(part_avg, F.col("avg_pk") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.round(F.sum("l_extendedprice"), 2) / 7.0, 2).alias("avg_yearly"))
    )


# --------------------------------------------------------------------------
# Q18: large-volume customers (HAVING over a join aggregate)
# --------------------------------------------------------------------------

@query(
    "tpch_q18_large_volume_customers",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           ROUND(o.o_totalprice, 2) AS total_price,
           ROUND(SUM(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    HAVING SUM(l.l_quantity) > 250
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds 250 (threshold scaled
    to the driver's data). Aggregate-then-filter (HAVING); the heavy
    groupBy rides the same orderkey partitioning as the join, and quantity
    sums over integers are order-insensitive so the HAVING threshold is
    engine-stable."""
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    return (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 250)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("total_price"),
            F.round("qty", 2).alias("total_qty"),
        )
    )


# --------------------------------------------------------------------------
# Q19: disjunctive multi-predicate join (brand × size × quantity bands)
# --------------------------------------------------------------------------

@query(
    "tpch_q19_disjunctive_revenue",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#33' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs spanning both join sides. Catalyst
    derives the single-side implications (brand IN (...), quantity ≤ 30)
    and pushes them below the join; the full disjunction evaluates as the
    post-join residual."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    band = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#22")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#33")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(band)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# Q21: suppliers who alone shipped late on multi-supplier orders
# --------------------------------------------------------------------------

@query(
    "tpch_q21_waiting_suppliers",
    oracle="""
    WITH late AS (
        SELECT DISTINCT l.l_orderkey, l.l_suppkey
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    ),
    per_order AS (
        SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_supp
        FROM lineitem GROUP BY l_orderkey
    ),
    late_per_order AS (
        SELECT l_orderkey, COUNT(*) AS n_late, MIN(l_suppkey) AS only_supp
        FROM late GROUP BY l_orderkey
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM late_per_order lp
    JOIN per_order po ON lp.l_orderkey = po.l_orderkey
    JOIN supplier s   ON s.s_suppkey = lp.only_supp
    WHERE lp.n_late = 1 AND po.n_supp > 1
    GROUP BY s.s_name
    """,
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the classic EXISTS/NOT-EXISTS pair ("another
    supplier on the order; no OTHER supplier was late") decorrelated into
    per-order counts — n_supp > 1 replaces EXISTS, n_late = 1 replaces
    NOT EXISTS. All three aggregates and the joins share the orderkey
    shuffle key, so the whole query is one exchange of lineitem plus
    map-side work. Late = shipped >90 days after the order date (this
    schema has no commit/receipt dates; SURVEY.md §1 notes the slimming)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late = (
        l.join(o.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 90 DAY"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    per_order = l.groupBy(F.col("l_orderkey").alias("po_ok")).agg(
        F.countDistinct("l_suppkey").alias("n_supp")
    )
    late_per_order = late.groupBy("l_orderkey").agg(
        F.count("*").alias("n_late"), F.min("l_suppkey").alias("only_supp")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        late_per_order.join(per_order, F.col("po_ok") == F.col("l_orderkey"))
        .filter((F.col("n_late") == 1) & (F.col("n_supp") > 1))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("only_supp"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


# --------------------------------------------------------------------------
# Q22: dormant high-balance customers (scalar subquery + anti join)
# --------------------------------------------------------------------------

@query(
    "tpch_q22_dormant_customers",
    oracle="""
    SELECT CAST(c.c_custkey % 10 AS BIGINT) AS cntrycode,
           COUNT(*) AS numcust,
           ROUND(SUM(c.c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c.c_custkey % 10 IN (1, 2, 3, 4, 5)
      AND c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_acctbal > 0.0
                           AND c2.c_custkey % 10 IN (1, 2, 3, 4, 5))
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY 1
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers in selected "country codes" (custkey mod
    10 stands in for the phone prefix this schema lacks) with above-average
    balance and no recent orders (dormant since 2000). The scalar AVG
    broadcasts as a 1-row build side; NOT EXISTS is a left-anti join
    against the date-pruned orders scan."""
    code = (F.col("c_custkey") % 10).cast("long")
    c = table(spark, sf_dir, "customer").filter(code.isin(1, 2, 3, 4, 5))
    threshold = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("bal_threshold")
    )
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("bal_threshold"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(code.alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


# --------------------------------------------------------------------------
# Remaining outer-join kinds: FULL and RIGHT
# --------------------------------------------------------------------------

@query(
    "join_full_outer_nation_wealth",
    oracle="""
    SELECT COALESCE(cn.nk, sn.nk) AS nationkey,
           COALESCE(cn.n_rich_cust, 0) AS n_rich_cust,
           COALESCE(sn.n_supp, 0)      AS n_supp
    FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_rich_cust
          FROM customer WHERE c_acctbal > 8000 GROUP BY 1) cn
    FULL JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
               FROM supplier GROUP BY 1) sn
    ON cn.nk = sn.nk
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two sparse per-nation aggregates — nations with
    rich customers but no suppliers (and vice versa) survive with NULLs
    coalesced to 0. Both inputs are post-aggregate (≤25 rows), so the
    full-outer itself is trivially broadcastable at any SF."""
    cn = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 8000)
        .groupBy(F.col("c_nationkey").alias("c_nk"))
        .agg(F.count("*").alias("n_rich_cust"))
    )
    sn = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("s_nk"))
        .agg(F.count("*").alias("n_supp"))
    )
    return cn.join(sn, F.col("c_nk") == F.col("s_nk"), "full").select(
        F.coalesce(F.col("c_nk"), F.col("s_nk")).alias("nationkey"),
        F.coalesce(F.col("n_rich_cust"), F.lit(0)).alias("n_rich_cust"),
        F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_supp"),
    )


@query(
    "join_right_outer_sampled_customers",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, ROUND(o.o_totalprice, 2) AS big_price
    FROM orders o
    RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
                         AND o.o_totalprice > 400000
    WHERE c.c_custkey % 50 = 0
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join with a join-side filter: every 50th customer
    appears; o_orderkey is NULL unless they placed a >400k order. The
    residual price predicate lives in the join condition (not WHERE), which
    is exactly what distinguishes outer-join semantics — rows failing it
    still emit the right side."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 50 == 0)
    return (
        o.join(
            c,
            (F.col("o_custkey") == F.col("c_custkey")) & (F.col("o_totalprice") > 400000),
            "right",
        )
        .select(
            "c_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("big_price"),
        )
    )


@query(
    "join_band_lookup_nested_loop",
    oracle="""
    WITH bands(band, lo, hi) AS (VALUES
        ('tiny',   0.0,      100000.0),
        ('small',  100000.0, 200000.0),
        ('mid',    200000.0, 300000.0),
        ('large',  300000.0, 400000.0),
        ('jumbo',  400000.0, 1000000000.0))
    SELECT b.band, COUNT(*) AS n_orders, ROUND(SUM(o.o_totalprice), 2) AS band_total
    FROM orders o
    JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band
    """,
)
def join_band_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure theta join (no equi component): every order matched to its
    price band by a range-only condition. This is the ONE join shape where
    BroadcastNestedLoopJoin is the right plan — the band table is tiny by
    construction (banding tables always are), so each task scans its order
    rows against 5 broadcast rows; cost is linear in the fact side at any
    scale. A non-broadcastable build side here would be a design error,
    not a planner one."""
    bands = spark.createDataFrame(
        [
            ("tiny", 0.0, 100000.0),
            ("small", 100000.0, 200000.0),
            ("mid", 200000.0, 300000.0),
            ("large", 300000.0, 400000.0),
            ("jumbo", 400000.0, 1000000000.0),
        ],
        "band string, lo double, hi double",
    )
    o = table(spark, sf_dir, "orders").select("o_totalprice")
    return (
        o.join(
            F.broadcast(bands),
            (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("band_total"),
        )
    )
