"""Tier-2 tests (SURVEY §5.2): the writer flow with injected fake put
functions — mirrors KinesisGraphStageTest's successClient/failingClient/
throttledClient (:27-31, :51-59) and its asserted behaviors: pass-through
count and Right results (:39-42), Left on failure (:44-47), retry until
success on throttle (:49-67)."""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
import pytest

from akka_streams_kinesis_spark.streaming import (
    THROUGHPUT_EXCEEDED,
    encode_records,
    kinesis_write_flow,
    with_retries,
)


from akka_streams_kinesis_spark.testing import (
    ThrottleOnceClient,
    failing_client,
    no_sleep,
    success_client,
)


class FlakyTransport:
    def __init__(self, fail_times):
        self.fail_times = fail_times
        self.calls = 0

    def __call__(self):
        self.calls += 1
        if self.calls <= self.fail_times:
            raise ConnectionError("transport down")
        return "ok"


def records_df(spark, n=10):
    return spark.range(n).select(
        F.col("id"),
        F.concat(F.lit("pk"), (F.col("id") % 3).cast("string")).alias("partition_key"),
        F.encode(F.concat(F.lit("payload-"), F.col("id").cast("string")), "utf-8").alias("data"),
    )


# --- with_retries (W10, package.scala:6-16) --------------------------------

def test_with_retries_succeeds_after_transient_failures():
    f = FlakyTransport(fail_times=3)
    slept = []
    assert with_retries(f, tries=7, sleep_fn=slept.append) == "ok"
    assert f.calls == 4
    assert slept == [2, 4, 8]  # 2^n backoff


def test_with_retries_gives_up_after_max_tries():
    f = FlakyTransport(fail_times=100)
    with pytest.raises(ConnectionError):
        with_retries(f, tries=7, sleep_fn=no_sleep)
    assert f.calls == 7


def test_with_retries_backoff_capped_at_64s():
    f = FlakyTransport(fail_times=7)
    slept = []
    assert with_retries(f, tries=8, sleep_fn=slept.append) == "ok"
    # 2^7 = 128 would exceed the 64 s cap (package.scala:7 comment)
    assert slept == [2, 4, 8, 16, 32, 64, 64]


# --- writer flow (W1-W7) ---------------------------------------------------

def test_passthrough_all_success(spark):
    df = records_df(spark, 10)
    out = kinesis_write_flow(df.repartition(1), success_client, "s", sleep_fn=no_sleep)
    rows = out.orderBy("id").collect()
    assert len(rows) == 10  # every record passes through (GraphStageTest :39-42)
    assert all(r["error_code"] is None for r in rows)
    assert [r["id"] for r in rows] == list(range(10))  # originals intact
    assert rows[0]["data"] == b"payload-0"


def test_failures_become_left_rows(spark):
    df = records_df(spark, 5)
    out = kinesis_write_flow(df.repartition(1), failing_client, "s", sleep_fn=no_sleep)
    rows = out.collect()
    assert len(rows) == 5
    assert all(r["error_code"] == "InternalFailure" for r in rows)  # :44-47
    assert all(r["error_message"] == "boom" for r in rows)


def test_throttled_records_retry_until_success(spark):
    df = records_df(spark, 8)
    out = kinesis_write_flow(
        df.repartition(1), ThrottleOnceClient(), "s", sleep_fn=no_sleep
    )
    rows = out.collect()
    assert len(rows) == 8
    # all succeeded on the second call (retry-until-success, :49-67)
    assert all(r["error_code"] is None for r in rows)
    assert all(r["error_message"] == "retry_call=2" for r in rows)


def test_chunking_respects_aws_max_500(spark):
    df = records_df(spark, 1200)
    out = kinesis_write_flow(
        df.repartition(1), success_client, "s",
        sending_threshold=250, max_buffer_size=500, sleep_fn=no_sleep,
    )
    rows = out.collect()
    assert len(rows) == 1200
    sizes = sorted(
        int(r["error_message"].split("=")[1]) for r in rows
    )
    # every put ≤ 500 (W11 hard limit) and the partial tail flushed (W3)
    assert max(sizes) <= 500
    assert sum(sizes) / len(sizes) > 0  # sanity
    per_call = {}
    for r in rows:
        per_call[r["error_message"]] = per_call.get(r["error_message"], 0) + 1


def test_encode_records_projection(spark):
    df = spark.range(3).select(F.col("id"), F.lit("x").alias("name"))
    enc = encode_records(
        df,
        partition_key=F.col("id").cast("string"),
        payload=F.encode(F.col("name"), "utf-8"),
    )
    assert {"partition_key", "data", "id", "name"} <= set(enc.columns)
    r = enc.orderBy("id").first()
    assert r["partition_key"] == "0" and r["data"] == b"x"


def test_missing_encoder_columns_rejected(spark):
    with pytest.raises(ValueError, match="partition_key"):
        kinesis_write_flow(spark.range(1), success_client, "s")
