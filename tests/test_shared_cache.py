"""Lifecycle tests for shared.py — the one documented cache owner.

Pins: (1) shared_frame builds once per (session, name, sf_dir) and
returns the same cached DataFrame to every consumer; (2) different
sf_dir keys build independently; (3) release_shared unpersists and
forgets both tiers, so the next consumer rebuilds; (4) transient
registration survives a release call on an already-stopped frame
without raising.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from akka_streams_kinesis_spark import shared
from akka_streams_kinesis_spark.shared import (
    release_shared,
    shared_frame,
    transient_persist,
)


def test_shared_frame_builds_once_and_reuses(spark):
    release_shared()
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(10).withColumn("x", F.col("id") * 2)

    a = shared_frame(spark, "t_build_once", "/k1", build)
    b = shared_frame(spark, "t_build_once", "/k1", build)
    assert a is b
    assert calls["n"] == 1
    assert a.storageLevel.useMemory  # persisted
    release_shared()


def test_shared_frame_keys_by_sf_dir(spark):
    release_shared()
    a = shared_frame(spark, "t_keyed", "/k1", lambda: spark.range(5))
    b = shared_frame(spark, "t_keyed", "/k2", lambda: spark.range(5))
    assert a is not b
    release_shared()


def test_release_shared_unpersists_and_forgets(spark):
    release_shared()
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(3)

    a = shared_frame(spark, "t_release", "/k1", build)
    a.count()
    release_shared()
    assert not shared._SHARED and not shared._TRANSIENT
    b = shared_frame(spark, "t_release", "/k1", build)
    assert calls["n"] == 2  # rebuilt after release
    assert b.storageLevel.useMemory
    release_shared()


def test_transient_persist_registers_for_release(spark):
    release_shared()
    df = transient_persist(spark.range(4))
    assert df.storageLevel.useMemory
    assert shared._TRANSIENT
    release_shared()
    assert not shared._TRANSIENT
    assert not df.storageLevel.useMemory  # unpersisted


def test_release_tolerates_double_release(spark):
    release_shared()
    df = transient_persist(spark.range(2))
    df.unpersist()  # consumer released it early
    release_shared()  # must not raise
    release_shared()  # idempotent
