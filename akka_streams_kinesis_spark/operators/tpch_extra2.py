"""Remaining TPC-H query shapes (Q2/Q9/Q11/Q12/Q15/Q16/Q20), completing the
22-query suite started in ``tpch_extra.py``.

The reference (``/root/reference``) has no relational surface (SURVEY.md
§2.D); these queries pin the decorrelation / argmin-join / scalar-threshold
shapes the original TPC-H spec exercises, adapted to the driver's slimmed
schema. The biggest adaptation: there is **no partsupp table**, so the
part↔supplier relation and "supply cost" are derived from lineitem itself —
``MIN(l_extendedprice / l_quantity)`` per (part, supplier) is the supply-cost
stand-in (MIN of identically-computed doubles is order-insensitive, so it is
exactly reproducible across engines — see the oracle-parity notes).

Scale notes (100 TB stance):
- Every derived part↔supplier aggregate rides ONE shuffle of lineitem keyed
  on (l_partkey, l_suppkey); per-part reductions reuse that output with a
  map-side partial (the second shuffle moves only the already-aggregated
  rows, orders of magnitude smaller than the fact table).
- Argmin-per-group (Q2, Q15) is expressed as aggregate-then-equijoin-back,
  the decorrelated form Catalyst rewrites correlated MIN/MAX subqueries to —
  never a driver-side collect.
- Scalar thresholds (Q11's SUM fraction, Q15's MAX) broadcast as 1-row
  build sides.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..io import table
from ..registry import query


def _reused(df: DataFrame) -> DataFrame:
    """Persist a small derived aggregate that feeds two plan branches.

    Without this, Spark re-computes the whole subtree (a full fact-table
    scan + shuffle) once per consumer — ReusedExchange only kicks in for
    bit-identical exchanges, which aggregate-then-reaggregate branches are
    not. The persisted relations here are post-aggregation (≤ |part| ×
    |supplier-in-filter| rows), orders of magnitude under the fact table,
    so MEMORY_AND_DISK is safe at any SF while the scan happens exactly
    once. Registered with shared.py so release_shared() bounds memory."""
    from ..shared import transient_persist

    return transient_persist(df)


# --------------------------------------------------------------------------
# Q2: minimum-cost supplier per part (correlated MIN subquery → argmin join)
# --------------------------------------------------------------------------

@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
        SELECT l_partkey, l_suppkey,
               MIN(l_extendedprice / l_quantity) AS supply_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    best AS (
        SELECT c.l_partkey, MIN(c.supply_cost) AS min_cost
        FROM cost c GROUP BY c.l_partkey
    ),
    pick AS (
        SELECT c.l_partkey, MIN(c.l_suppkey) AS best_supp, b.min_cost
        FROM cost c JOIN best b
          ON c.l_partkey = b.l_partkey AND c.supply_cost = b.min_cost
        GROUP BY c.l_partkey, b.min_cost
    )
    SELECT p.p_partkey, p.p_name, s.s_name, n.n_name,
           ROUND(s.s_acctbal, 2) AS acctbal,
           ROUND(pk.min_cost, 4) AS min_cost
    FROM pick pk
    JOIN part p     ON p.p_partkey = pk.l_partkey
    JOIN supplier s ON s.s_suppkey = pk.best_supp
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_size BETWEEN 10 AND 14 AND p.p_type = 'LARGE'
    ORDER BY acctbal DESC, p.p_partkey
    LIMIT 100
    """,
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the supplier offering the
    minimum supply cost (derived from lineitem — no partsupp in this
    schema), with a MIN(suppkey) tiebreak so the pick is deterministic.

    The correlated ``cost = (SELECT MIN(..) WHERE partkey = outer)`` is a
    per-part-independent reduction, so two rewrites beat the oracle's
    literal join-back shape with identical results:
    (1) the part filter pushes BELOW the aggregate — the broadcast join
    against the ~2.5%-selective part dim prunes lineitem before any
    shuffle; (2) argmin-with-tiebreak collapses to one
    ``MIN(struct(cost, suppkey))`` aggregation — lexicographic struct min
    IS "min cost, then min suppkey", removing the join-back, its
    double-equality, and the need to persist the cost relation. One fact
    shuffle on (partkey, suppkey), one tiny struct-min shuffle, broadcast
    dims, TakeOrdered top-100."""
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_size").between(10, 14) & (F.col("p_type") == "LARGE"))
        .select("p_partkey", "p_name")
    )
    l = table(spark, sf_dir, "lineitem")
    cost = (
        l.join(F.broadcast(p.select("p_partkey")), F.col("p_partkey") == F.col("l_partkey"))
        .select(
            "l_partkey",
            "l_suppkey",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("unit_price").alias("supply_cost"))
    )
    pick = (
        cost.groupBy("l_partkey")
        .agg(F.min(F.struct("supply_cost", "l_suppkey")).alias("m"))
        .select(
            "l_partkey",
            F.col("m.supply_cost").alias("min_cost"),
            F.col("m.l_suppkey").alias("best_supp"),
        )
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        pick.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("best_supp"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            F.round("s_acctbal", 2).alias("acctbal"),
            F.round("min_cost", 4).alias("min_cost"),
        )
        .orderBy(F.col("acctbal").desc(), F.col("p_partkey"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q9: product-type profit by nation and year
# --------------------------------------------------------------------------

@query(
    "tpch_q9_product_profit",
    oracle="""
    SELECT n.n_name AS nation,
           EXTRACT(year FROM o.o_orderdate) AS o_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                     - 0.1 * p.p_retailprice * l.l_quantity), 2) AS sum_profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year
    """,
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit (revenue minus a cost proxy — 10% of retail
    price per unit, standing in for ps_supplycost) on 'red' parts, by
    supplier nation and order year.

    part (name-filtered) and supplier⋈nation broadcast onto the fact scan;
    the only real shuffle is orders⋈lineitem on orderkey, then a small
    post-join aggregate on (nation, year) — 25×7 groups at any scale."""
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    n = table(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    s = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "nation")
    )
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.1 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
    )


# --------------------------------------------------------------------------
# Q11: important stock — per-part value above a global-fraction threshold
# --------------------------------------------------------------------------

@query(
    "tpch_q11_important_stock",
    oracle="""
    WITH val AS (
        SELECT l.l_partkey, SUM(l.l_extendedprice) AS value
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_7'
        GROUP BY l.l_partkey
    )
    SELECT l_partkey, ROUND(value, 2) AS part_value
    FROM val
    WHERE value > (SELECT 0.001 * SUM(value) FROM val)
    """,
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose traded value through NATION_7 suppliers
    exceeds 0.1% of that nation's total. The HAVING-against-global-scalar is
    a 1-row broadcast cross join; the nation filter reaches lineitem as a
    broadcast semi on ~1/25 of suppliers, so the per-part aggregate sees a
    pre-pruned fact scan."""
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    s = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    l = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    val = _reused(
        l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("value"))
    )
    threshold = val.agg((0.001 * F.sum("value")).alias("cutoff"))
    return (
        val.join(F.broadcast(threshold))
        .filter(F.col("value") > F.col("cutoff"))
        .select("l_partkey", F.round("value", 2).alias("part_value"))
    )


# --------------------------------------------------------------------------
# Q12: shipping-speed tiers vs order priority (no shipmode in this schema)
# --------------------------------------------------------------------------

@query(
    "tpch_q12_ship_speed_priority",
    oracle="""
    SELECT CASE WHEN DATE_DIFF('day', o.o_orderdate, l.l_shipdate) <= 15 THEN 'fast'
                WHEN DATE_DIFF('day', o.o_orderdate, l.l_shipdate) <= 45 THEN 'normal'
                ELSE 'slow' END AS ship_speed,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY ship_speed
    """,
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: line counts by urgency class per shipping tier. The
    schema has no l_shipmode, so the grouping dimension is a derived
    ship-speed tier from the order→ship delay (the same join-then-bucket
    structure). One orderkey shuffle; conditional counts fold into a single
    aggregate pass over 3 groups."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    speed = (
        F.when(delay <= 15, "fast").when(delay <= 45, "normal").otherwise("slow")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(speed.alias("ship_speed"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# Q15: top supplier by quarterly revenue (view + scalar MAX)
# --------------------------------------------------------------------------

@query(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with maximum revenue for 1996Q1. The
    revenue view aggregates the date-pruned fact scan per supplier (≤ |supplier|
    rows); the scalar MAX broadcasts back as a 1-row build side. Revenue is
    rounded to 2dp *inside the view* on both engines so the equality compare
    is on identically-derived values."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = _reused(
        l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    top = revenue.agg(F.max("total_revenue").alias("max_rev"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# Q16: parts/supplier relationship count (anti-join supplier exclusion)
# --------------------------------------------------------------------------

@query(
    "tpch_q16_part_supplier_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#11'
      AND p.p_type <> 'MEDIUM'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers can supply each
    (brand, type, size) combination, excluding one brand/type, a size list,
    and blacklisted suppliers (negative account balance stands in for the
    original's complaint-comment filter). The part↔supplier relation is the
    DISTINCT pair projection of lineitem; the supplier blacklist is a
    broadcast left-anti join (NOT IN with non-nullable keys).

    Both broadcast joins sit BELOW the distinct: the ~13%-selective part
    filter and the supplier blacklist prune lineitem rows before the
    (partkey, suppkey) dedup shuffle — distinct-then-filter and
    filter-then-distinct commute, and the cheap side of a dedup is always
    the pruned one."""
    p = (
        table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#11")
            & (F.col("p_type") != "MEDIUM")
            & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    ps = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(bad), F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .select("l_partkey", "l_suppkey", "p_brand", "p_type", "p_size")
        .distinct()
    )
    return (
        ps.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q20: suppliers with an outsized share of a part's shipped quantity
# --------------------------------------------------------------------------

@query(
    "tpch_q20_excess_share_suppliers",
    oracle="""
    WITH sq AS (
        SELECT l.l_partkey, l.l_suppkey, SUM(l.l_quantity) AS supp_qty
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE '%bolt%'
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l.l_partkey, l.l_suppkey
    ),
    pq AS (
        SELECT l_partkey, SUM(supp_qty) AS part_qty
        FROM sq GROUP BY l_partkey
    )
    SELECT DISTINCT s.s_suppkey, s.s_name, n.n_name
    FROM sq
    JOIN pq ON sq.l_partkey = pq.l_partkey
    JOIN supplier s ON s.s_suppkey = sq.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE sq.supp_qty > 0.3 * pq.part_qty
    """,
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped more than 30% of a bolt
    part's 1996 volume (availqty-vs-half-demand rewritten against lineitem
    — no partsupp). Both aggregates share the (partkey, suppkey) shuffle;
    the per-part total is a map-side rollup of the first aggregate's
    output. Quantities are whole-number doubles, so the 0.3× threshold
    compare is exact on both engines. DISTINCT collapses a supplier that
    dominates several parts to one row."""
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%bolt%"))
        .select("p_partkey")
    )
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    sq = _reused(
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
    )
    pq = sq.groupBy(F.col("l_partkey").alias("pq_pk")).agg(
        F.sum("supp_qty").alias("part_qty")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        sq.join(pq, F.col("pq_pk") == F.col("l_partkey"))
        .filter(F.col("supp_qty") > 0.3 * F.col("part_qty"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
        .distinct()
    )
