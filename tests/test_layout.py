"""Plan-level pins for the data-layout operators: the whole point of
bucketing/partitioning is what the physical plan does NOT contain
(exchanges; scans of excluded partitions), so these tests assert on the
executed plan, not just the values (value parity is test_oracle_parity).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from akka_streams_kinesis_spark import registry
from akka_streams_kinesis_spark.operators.layout import (
    bucketed_join_frame,
    partitioned_events_path,
)
from akka_streams_kinesis_spark.plans import num_shuffles, physical_plan

registry.load_all()


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    j = bucketed_join_frame(spark, sf_dir)
    assert "SortMergeJoin" in physical_plan(j)
    assert num_shuffles(j) == 0, physical_plan(j)


def test_bucketed_join_matches_plain_join(spark, sf_dir):
    from akka_streams_kinesis_spark.io import table

    got = {
        r["c_mktsegment"]: (r["n_orders"], r["total_spend"])
        for r in registry.QUERIES["layout_bucketed_join"](spark, sf_dir).collect()
    }
    want = {
        r["c_mktsegment"]: (r["n"], r["t"])
        for r in (
            table(spark, sf_dir, "orders")
            .join(table(spark, sf_dir, "customer"),
                  F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("t"))
            .collect()
        )
    }
    assert got == want


def test_partition_pruning_reaches_scan(spark, sf_dir):
    df = registry.QUERIES["layout_partition_pruning"](spark, sf_dir)
    plan = physical_plan(df)
    scan = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert scan, plan
    assert any("event_date" in ln.split("PartitionFilters", 1)[1] for ln in scan), plan


def test_partitioned_copy_layout(spark, sf_dir):
    import os

    path = partitioned_events_path(spark, sf_dir)
    parts = [d for d in os.listdir(path) if d.startswith("event_date=")]
    assert len(parts) > 7, "need more partitions than the queried week"
