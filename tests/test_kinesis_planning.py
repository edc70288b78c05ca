"""Tier-1 tests (SURVEY §5.1): pure planning functions with fixed clock and
hand-built shard-lineage fixtures — mirrors KinesisSourceTest.scala's
unit tier (shardIteratorRequests clamp :36-60, iteratorForReshard :96-106,
DAG discovery :123-179)."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from akka_streams_kinesis_spark.sources import (
    AtTimestamp,
    Latest,
    TrimHorizon,
    find_child_shards,
    find_newest_possible_shards,
    find_oldest_possible_shards,
    iterator_for_reshard,
    shard_iterator_requests,
)

FIXED_NOW = datetime(2024, 6, 1, 12, 0, 0, tzinfo=timezone.utc)

SHARD_SCHEMA = (
    "shard_id string, parent_shard_id string, adjacent_parent_shard_id string, "
    "starting_hash_key string, ending_hash_key string, closed boolean"
)


def shards_df(spark, rows):
    return spark.createDataFrame(rows, SHARD_SCHEMA)


def ids(df):
    return sorted(r["shard_id"] for r in df.collect())


def test_clamp_future_timestamp_to_now():
    future = datetime(2030, 1, 1, tzinfo=timezone.utc)
    reqs = shard_iterator_requests(AtTimestamp(future), ["s1", "s2"], now=FIXED_NOW)
    assert [r[0] for r in reqs] == ["s1", "s2"]
    assert all(r[1] == AtTimestamp(FIXED_NOW) for r in reqs)


def test_past_timestamp_not_clamped():
    past = datetime(2020, 1, 1, tzinfo=timezone.utc)
    reqs = shard_iterator_requests(AtTimestamp(past), ["s1"], now=FIXED_NOW)
    assert reqs == [("s1", AtTimestamp(past))]


def test_non_timestamp_iterators_pass_through():
    assert shard_iterator_requests(TrimHorizon(), ["a"], now=FIXED_NOW) == [("a", TrimHorizon())]
    assert shard_iterator_requests(Latest(), ["a"], now=FIXED_NOW) == [("a", Latest())]


def test_iterator_for_reshard_rewrites_latest_only():
    # KinesisSource.scala:160-163
    assert iterator_for_reshard(Latest()) == TrimHorizon()
    assert iterator_for_reshard(TrimHorizon()) == TrimHorizon()
    at = AtTimestamp(FIXED_NOW)
    assert iterator_for_reshard(at) == at


def test_oldest_shards_simple_parent_child(spark):
    # parent→child lineage: the root is the parent (KinesisSourceTest.scala:123-140)
    df = shards_df(
        spark,
        [
            ("p", None, None, "0", "100", True),
            ("c1", "p", None, "0", "50", False),
            ("c2", "p", None, "51", "100", False),
        ],
    )
    assert ids(find_oldest_possible_shards(df)) == ["p"]


def test_oldest_shards_orphan_treated_as_root(spark):
    # parent expired/absent from the set ⇒ child is a root (KinesisSourceTest.scala:142-159)
    df = shards_df(
        spark,
        [
            ("c1", "expired-parent", None, "0", "50", False),
            ("c2", "expired-parent", None, "51", "100", False),
        ],
    )
    assert ids(find_oldest_possible_shards(df)) == ["c1", "c2"]


def test_newest_shards_after_split_then_merge(spark):
    # split s0 → (a, b); then merge (a, b) → m: only m is a leaf
    # (KinesisSourceTest.scala:161-179)
    df = shards_df(
        spark,
        [
            ("s0", None, None, "0", "100", True),
            ("a", "s0", None, "0", "50", True),
            ("b", "s0", None, "51", "100", True),
            ("m", "a", "b", "0", "100", False),
        ],
    )
    assert ids(find_newest_possible_shards(df)) == ["m"]


def test_find_children_ignores_adjacent_parent(spark):
    # a merge child is found once, under its primary parent only
    # (KinesisSource.scala:147-154)
    df = shards_df(
        spark,
        [
            ("a", None, None, "0", "50", True),
            ("b", None, None, "51", "100", True),
            ("m", "a", "b", "0", "100", False),
        ],
    )
    assert ids(find_child_shards(df, "a")) == ["m"]
    assert ids(find_child_shards(df, "b")) == []
