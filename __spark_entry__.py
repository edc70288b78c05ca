"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``akka_streams_kinesis_spark``; this module just
exposes the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from akka_streams_kinesis_spark import registry
from akka_streams_kinesis_spark.registry import ORACLES, QUERIES

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7 phase 0): hourly tumbling-window event
    rollup at sf0.001 — the batch analog of the reference's
    time-positioned partitioned event consumption."""
    return QUERIES["events_hourly_rollup"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checkable query."""
    return dict(ORACLES)
