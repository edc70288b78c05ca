"""Tests for the table-maintenance operators: dynamic-partition-overwrite
mechanism pin, merge self-consistency against an independent plan, and
expectations-report invariants."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from akka_streams_kinesis_spark import registry
from akka_streams_kinesis_spark.io import table
from akka_streams_kinesis_spark.operators.maintenance import (
    _CDC_PRED,
    maintenance_merge_upsert,
    quality_expectations_report,
)

registry.load_all()


def _files(root: str, part: str) -> dict[str, float]:
    d = os.path.join(root, part)
    return {
        f: os.path.getmtime(os.path.join(d, f))
        for f in os.listdir(d)
        if f.endswith(".parquet")
    }


def test_dynamic_overwrite_leaves_untouched_partitions_alone(spark, tmp_path):
    """The mechanism merge_upsert_path relies on: overwriting a partitioned
    table in dynamic mode with a frame containing only SOME partition
    values must rewrite those partitions and leave the others'
    files physically untouched (same names, same mtimes)."""
    out = str(tmp_path / "dyn")
    base = spark.createDataFrame(
        [(i, i % 4, f"v{i}") for i in range(40)], "id long, bucket int, val string"
    )
    base.write.mode("overwrite").partitionBy("bucket").parquet(out)
    before = {b: _files(out, f"bucket={b}") for b in range(4)}

    patch = spark.createDataFrame(
        [(100 + i, i % 2, "patched") for i in range(10)],
        "id long, bucket int, val string",
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        patch.write.mode("overwrite").partitionBy("bucket").parquet(out)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    after = {b: _files(out, f"bucket={b}") for b in range(4)}
    for b in (2, 3):  # untouched: identical file set and mtimes
        assert after[b] == before[b]
    for b in (0, 1):  # rewritten
        assert set(after[b]) != set(before[b]) or after[b] != before[b]
    got = spark.read.parquet(out)
    assert got.filter("bucket >= 2").count() == 20        # preserved
    assert got.filter("bucket < 2").count() == 10         # replaced
    assert got.filter("val = 'patched'").count() == 10


def test_merge_equals_independent_latest_per_user(spark, sf_dir):
    """The merged table must equal latest-per-user computed directly over
    the raw log with a different plan (max_by aggregate instead of the
    operator's window + two-phase merge)."""
    e = table(spark, sf_dir, "events")
    want = {
        (r["user_id"], r["last_event_id"])
        for r in e.groupBy("user_id")
        .agg(
            F.max_by(
                "event_id", F.struct(F.col("ts"), F.col("event_id"))
            ).alias("last_event_id")
        )
        .collect()
    }
    got = {
        (r["user_id"], r["last_event_id"])
        for r in maintenance_merge_upsert(spark, sf_dir).collect()
    }
    assert got == want
    assert len(_CDC_PRED) > 0


def test_expectations_report_invariants(spark, sf_dir):
    rows = quality_expectations_report(spark, sf_dir).collect()
    assert len(rows) == 9
    for r in rows:
        assert r["n_rows"] > 0
        assert 0 <= r["n_violations"] <= r["n_rows"]
        assert 0.0 <= r["violation_rate"] <= 1.0
        assert r["passed"] == (r["n_violations"] == 0)
