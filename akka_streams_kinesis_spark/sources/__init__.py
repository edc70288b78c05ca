"""Streaming sources: the file-backed simulated sharded stream (Kinesis-shaped)."""

from .kinesis_sim import (  # noqa: F401
    AtTimestamp,
    IteratorType,
    Latest,
    SimStream,
    TrimHorizon,
    find_child_shards,
    find_newest_possible_shards,
    find_oldest_possible_shards,
    iterator_for_reshard,
    shard_iterator_requests,
)
