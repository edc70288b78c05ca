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
