"""Subquery forms: scalar subqueries and IN-subqueries.

Catalyst rewrites these into joins (scalar → cross-joined single-row
aggregate broadcast; IN → left-semi join), so the physical cost model is
the same as the explicit-join queries — these entries pin the SQL surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import table
from ..registry import query

_SCALAR_SQL = """
    SELECT o_orderstatus,
           COUNT(*) AS n_above_avg,
           ROUND(SUM(o_totalprice), 2) AS total_above
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    GROUP BY o_orderstatus
"""

_IN_SQL = """
    SELECT c_mktsegment, COUNT(*) AS n_recent_customers
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders
                        WHERE o_orderdate >= TIMESTAMP '2001-01-01')
    GROUP BY c_mktsegment
"""


@query("subquery_scalar_above_avg", oracle=_SCALAR_SQL)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders above the global average price. The
    subquery's single-row result broadcasts into the filter — one extra
    tiny job, no per-row recomputation."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_SCALAR_SQL)


@query("subquery_in_recent_buyers", oracle=_IN_SQL)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery → left-semi join (same plan family as
    join_semi_big_spenders, reached through the SQL surface)."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_IN_SQL)


@query(
    "subquery_lateral_recent_orders",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment,
           r.o_orderkey, r.o_totalprice, r.rn
    FROM customer c,
    LATERAL (
        SELECT o.o_orderkey, o.o_totalprice,
               ROW_NUMBER() OVER (ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        FROM orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
        LIMIT 2
    ) r
    WHERE c.c_custkey % 10 = 0
    """,
)
def subquery_lateral_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery: for each sampled customer, their two
    most recent orders — the per-row-parameterized-subquery surface SQL
    users reach for before learning window functions. Spark decorrelates
    the lateral into a window-limited join (DomainJoin rewrite), so the
    executed plan is the same rank≤2-per-key shape as
    window_topk_orders_per_customer — per-key LIMIT pushes into the sort
    (WindowGroupLimit), no per-customer re-execution."""
    from ..io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment,
               r.o_orderkey, r.o_totalprice, r.rn
        FROM customer c,
        LATERAL (
            SELECT o.o_orderkey, o.o_totalprice,
                   ROW_NUMBER() OVER (ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
            FROM orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
            LIMIT 2
        ) r
        WHERE c.c_custkey % 10 = 0
        """
    )
