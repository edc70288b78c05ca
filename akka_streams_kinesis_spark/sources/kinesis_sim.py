"""File-backed simulated sharded stream — the reference's source, Spark-first.

The reference's ``KinesisSource`` (KinesisSource.scala:71-79) is a
backpressured unbounded scan of a sharded stream: shard discovery over a
lineage DAG, per-shard positioned iterators, cursor advance by sequence
number, reshard-following. This module re-expresses each piece on Spark:

================================================================  =========
reference operator (SURVEY §2.A)                                   here
================================================================  =========
S1  KinesisSource.apply                                            SimStream.read_stream / read_batch
S2  IteratorType ADT (AtTimestamp/TrimHorizon/Latest)              IteratorType classes
S3  shardIteratorRequests (+ min(since, now) clamp)                shard_iterator_requests
S4  findOldestPossibleShards (DAG roots)                           find_oldest_possible_shards (left-anti join)
S5  findNewestPossibleShards (DAG leaves)                          find_newest_possible_shards (left-anti join)
S6  findChildShards (ignores adjacent parent)                      find_child_shards (equi-filter)
S7  iteratorForReshard (Latest→TrimHorizon on children)            iterator_for_reshard + per-shard floor map
S8  nextIterator (resume AFTER_SEQUENCE_NUMBER)                    after-sequence floors / streaming checkpoint
S9  ShardId/ShardIterator value classes                            shard_id column + floors dict
S11 preStart bootstrap (describe → pick shards)                    describe() + resolve_start_shards
S12 one read loop per shard                                        one input partition per shard dir
S13 handleReshard (follow children)                                re-plan: children have no floor ⇒ read from start
S15 emitThenGetRecords (demand-driven emit)                        micro-batch rate cap (maxFilesPerTrigger)
S16 reissueThenGetRecords (expired-cursor recovery)                pyds._read_partition reissue (resume AFTER last seq)
S17 handleResult error dispatch (KinesisSource.scala:290-302)      pyds._read_partition fault policy (typed faults, injectable client)
S18 EagerTerminateOutput (cancel ⇒ stop)                           query.stop()
================================================================  =========

Data layout: ``<path>/shards.json`` holds the shard lineage DAG (the
describe-stream result); ``<path>/data/shard_id=<id>/*.parquet`` holds
records ``(sequence_number, partition_key, data, ts)``. Hive partitioning by
shard_id means Spark plans one file-scan partition per shard — the exact
analog of "one poll loop per shard" (KinesisSource.scala:211-223) — and
shard-pruning filters never touch other shards' files.

At real scale this layout IS the standard pattern (a Kafka/Kinesis landing
zone in object storage, partitioned by shard/partition-id); every operator
downstream is ordinary Structured Streaming.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from datetime import datetime, timezone
from hashlib import md5

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

MAX_HASH = (1 << 128) - 1

RECORD_SCHEMA = StructType(
    [
        StructField("sequence_number", LongType()),
        StructField("partition_key", StringType()),
        StructField("data", BinaryType()),
        StructField("ts", TimestampType()),
    ]
)


# ---------------------------------------------------------------------------
# Iterator types (S2) — start-position ADT, KinesisSource.scala:29-35
# ---------------------------------------------------------------------------

class IteratorType:
    pass


@dataclass(frozen=True)
class TrimHorizon(IteratorType):
    """Read from the oldest retained record."""


@dataclass(frozen=True)
class Latest(IteratorType):
    """Read only records produced after the query starts."""


@dataclass(frozen=True)
class AtTimestamp(IteratorType):
    """Read from a wall-clock position; clamped to now (S3 clamp)."""

    since: datetime


# ---------------------------------------------------------------------------
# Shard-DAG planning (S3-S7) — pure DataFrame logic, tier-1 testable
# ---------------------------------------------------------------------------

def find_oldest_possible_shards(shards: DataFrame) -> DataFrame:
    """DAG roots: shards whose parent is absent from the shard set (expired
    or never existed) — the reference treats those as earliest read points
    (KinesisSource.scala:115-125). Left-anti join on parent_shard_id."""
    ids = shards.select(F.col("shard_id").alias("_pid"))
    return shards.join(
        ids, shards["parent_shard_id"] == ids["_pid"], "left_anti"
    ).select("shard_id")


def find_newest_possible_shards(shards: DataFrame) -> DataFrame:
    """DAG leaves: shards that are nobody's parent or adjacent parent —
    where `Latest` begins reading (KinesisSource.scala:131-141)."""
    parents = (
        shards.select(F.col("parent_shard_id").alias("_ref"))
        .unionByName(shards.select(F.col("adjacent_parent_shard_id").alias("_ref")))
        .filter(F.col("_ref").isNotNull())
        .distinct()
    )
    return shards.join(
        parents, shards["shard_id"] == parents["_ref"], "left_anti"
    ).select("shard_id")


def find_child_shards(shards: DataFrame, parent: str) -> DataFrame:
    """Children of a closed shard. Deliberately ignores the adjacent parent
    so a merge yields its single child once (KinesisSource.scala:147-154)."""
    return shards.filter(F.col("parent_shard_id") == F.lit(parent)).select("shard_id")


def iterator_for_reshard(iterator: IteratorType) -> IteratorType:
    """After a reshard, `Latest` must become `TrimHorizon` on child shards or
    records written between close and reopen would be skipped
    (KinesisSource.scala:160-163)."""
    if isinstance(iterator, Latest):
        return TrimHorizon()
    return iterator


def shard_iterator_requests(
    iterator: IteratorType,
    shard_ids: list[str],
    now: datetime | None = None,
) -> list[tuple[str, IteratorType]]:
    """One positioned read request per shard; AtTimestamp is clamped to
    min(since, now) so a future timestamp still reads (work-conserving
    clamp, KinesisSource.scala:100-102). ``now`` is injected like the
    reference's Clock (KinesisSource.scala:77) for deterministic tests."""
    if isinstance(iterator, AtTimestamp):
        now = now or datetime.now(timezone.utc)
        clamped = AtTimestamp(min(iterator.since, now))
        return [(s, clamped) for s in shard_ids]
    return [(s, iterator) for s in shard_ids]


def _as_utc_naive(ts: datetime) -> datetime:
    """Normalize a datetime to naive-UTC. Naive input is TREATED as UTC —
    calling astimezone() on a naive value would interpret it in the
    machine's local zone and silently shift arrival timestamps, while the
    read side (_parse_iso, AtTimestamp) treats naive as UTC."""
    if ts.tzinfo is None:
        return ts
    return ts.astimezone(timezone.utc).replace(tzinfo=None)


def hash_key_for_partition_key(pk: str) -> int:
    """Kinesis-style placement: md5(partition_key) as a 128-bit int mapped
    into a shard's [starting_hash_key, ending_hash_key] range."""
    return int(md5(pk.encode("utf-8")).hexdigest(), 16)


# ---------------------------------------------------------------------------
# The simulated stream
# ---------------------------------------------------------------------------

class SimStream:
    """A file-backed sharded stream with Kinesis semantics: shard lineage,
    partition-key hash placement, per-shard monotonic sequence numbers,
    split/merge resharding."""

    def __init__(self, path: str):
        self.path = path
        self.data_dir = os.path.join(path, "data")

    # -- admin (driver-side; the analog of the AWS control-plane calls) ----

    @classmethod
    def create(cls, path: str, n_shards: int = 2) -> "SimStream":
        os.makedirs(os.path.join(path, "data"), exist_ok=True)
        width = (MAX_HASH + 1) // n_shards
        shards = []
        for i in range(n_shards):
            lo = i * width
            hi = MAX_HASH if i == n_shards - 1 else (i + 1) * width - 1
            shards.append(
                {
                    "shard_id": f"shardId-{i:012d}",
                    "parent_shard_id": None,
                    "adjacent_parent_shard_id": None,
                    "starting_hash_key": str(lo),
                    "ending_hash_key": str(hi),
                    "closed": False,
                    "next_seq": 0,
                }
            )
        stream = cls(path)
        stream._write_meta({"shards": shards, "next_shard": n_shards})
        return stream

    def _meta(self) -> dict:
        with open(os.path.join(self.path, "shards.json")) as f:
            return json.load(f)

    def _write_meta(self, meta: dict) -> None:
        tmp = os.path.join(self.path, "shards.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(tmp, os.path.join(self.path, "shards.json"))

    def describe(self, spark: SparkSession) -> DataFrame:
        """The describe-stream result as a DataFrame (shard lineage DAG)."""
        meta = self._meta()
        schema = (
            "shard_id string, parent_shard_id string, adjacent_parent_shard_id string, "
            "starting_hash_key string, ending_hash_key string, closed boolean"
        )
        rows = [
            (
                s["shard_id"],
                s["parent_shard_id"],
                s["adjacent_parent_shard_id"],
                s["starting_hash_key"],
                s["ending_hash_key"],
                s["closed"],
            )
            for s in meta["shards"]
        ]
        return spark.createDataFrame(rows, schema)

    def open_shards(self) -> list[dict]:
        return [s for s in self._meta()["shards"] if not s["closed"]]

    # -- produce (test harness / FilePut sink target) ----------------------

    def put_records(self, records: list[tuple[str, bytes]], ts: datetime | None = None) -> list[dict]:
        """Append (partition_key, data) records: hash each key into an open
        shard's hash range, assign the shard's next sequence numbers, write
        one parquet file per touched shard. Returns per-record placement
        (shard_id, sequence_number) like PutRecords result entries."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        meta = self._meta()
        open_shards = [s for s in meta["shards"] if not s["closed"]]
        ts = ts or datetime.now(timezone.utc)
        placed: dict[str, list[tuple[int, str, bytes]]] = {}
        results = []
        for pk, data in records:
            h = hash_key_for_partition_key(pk)
            shard = next(
                s
                for s in open_shards
                if int(s["starting_hash_key"]) <= h <= int(s["ending_hash_key"])
            )
            seq = shard["next_seq"]
            shard["next_seq"] = seq + 1
            placed.setdefault(shard["shard_id"], []).append((seq, pk, data))
            results.append({"shard_id": shard["shard_id"], "sequence_number": seq})
        for shard_id, rows in placed.items():
            d = os.path.join(self.data_dir, f"shard_id={shard_id}")
            os.makedirs(d, exist_ok=True)
            naive_ts = _as_utc_naive(ts)
            tbl = pa.table(
                {
                    "sequence_number": pa.array([r[0] for r in rows], pa.int64()),
                    "partition_key": pa.array([r[1] for r in rows], pa.string()),
                    "data": pa.array([r[2] for r in rows], pa.binary()),
                    "ts": pa.array([naive_ts] * len(rows), pa.timestamp("us")),
                }
            )
            pq.write_table(tbl, os.path.join(d, f"put-{uuid.uuid4().hex}.parquet"))
        self._write_meta(meta)
        return results

    def put_records_distributed(
        self, df: DataFrame, ts: datetime | None = None
    ) -> None:
        """Distributed produce of a ``(partition_key string, data binary)``
        DataFrame — the scale path for backfilling a stream from a table,
        replacing the driver-side collect-and-put loop (which at corpus
        scale makes the harness, not the engine, the bottleneck and a
        driver-memory risk).

        Three phases, honoring the same per-shard monotonic sequence
        contract as put_records:
        1. executors assign each record its shard via the identical
           partition-key hash (Arrow-batched);
        2. the driver reserves one contiguous sequence range per shard in
           the control-plane metadata (a per-shard count is the only thing
           collected);
        3. executors number records inside their reserved range
           (row_number per shard, deterministic order) and write the shard
           parquet files directly.
        """
        import pandas as pd
        from pyspark.sql import Window
        from typing import Iterator

        meta = self._meta()
        ranges = [
            (s["shard_id"], int(s["starting_hash_key"]), int(s["ending_hash_key"]))
            for s in meta["shards"]
            if not s["closed"]
        ]
        ts = ts or datetime.now(timezone.utc)
        naive_ts = _as_utc_naive(ts)
        data_dir = self.data_dir

        def _assign(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
            for b in batches:
                shard_ids = []
                for pk in b["partition_key"]:
                    h = hash_key_for_partition_key(pk)
                    shard_ids.append(
                        next(sid for sid, lo, hi in ranges if lo <= h <= hi)
                    )
                yield pd.DataFrame(
                    {
                        "partition_key": b["partition_key"],
                        "data": b["data"],
                        "shard_id": shard_ids,
                    }
                )

        assigned = df.select("partition_key", "data").mapInPandas(
            _assign, "partition_key string, data binary, shard_id string"
        ).persist()
        counts = {
            r["shard_id"]: r["count"]
            for r in assigned.groupBy("shard_id").count().collect()
        }
        bases: dict[str, int] = {}
        for s in meta["shards"]:
            if s["shard_id"] in counts:
                bases[s["shard_id"]] = s["next_seq"]
                s["next_seq"] += counts[s["shard_id"]]

        w = Window.partitionBy("shard_id").orderBy("partition_key", "data")
        seqd = assigned.withColumn("rn", F.row_number().over(w) - 1)

        def _write(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
            import pyarrow as pa
            import pyarrow.parquet as pq

            for b in batches:
                for shard_id, g in b.groupby("shard_id"):
                    d = os.path.join(data_dir, f"shard_id={shard_id}")
                    os.makedirs(d, exist_ok=True)
                    tbl = pa.table(
                        {
                            "sequence_number": pa.array(
                                bases[shard_id] + g["rn"].to_numpy(), pa.int64()
                            ),
                            "partition_key": pa.array(g["partition_key"], pa.string()),
                            "data": pa.array(
                                [bytes(x) for x in g["data"]], pa.binary()
                            ),
                            "ts": pa.array([naive_ts] * len(g), pa.timestamp("us")),
                        }
                    )
                    pq.write_table(tbl, os.path.join(d, f"put-{uuid.uuid4().hex}.parquet"))
                    yield pd.DataFrame({"n": [len(g)]})

        written = (
            seqd.repartition("shard_id")
            .mapInPandas(_write, "n long")
            .agg(F.sum("n"))
            .first()[0]
        )
        assigned.unpersist()
        total = sum(counts.values())
        if (written or 0) != total:
            raise RuntimeError(
                f"distributed put wrote {written} records, expected {total}"
            )
        self._write_meta(meta)

    # -- reshard (split/merge, KinesaliteTest.scala:70-81 scenarios) -------

    def split_shard(self, shard_id: str) -> tuple[str, str]:
        """Split at the midpoint of the hash range: parent closes, two
        children each inherit half (KinesaliteTest.scala:74-78)."""
        meta = self._meta()
        parent = next(s for s in meta["shards"] if s["shard_id"] == shard_id)
        if parent["closed"]:
            raise ValueError(f"shard {shard_id} already closed")
        lo, hi = int(parent["starting_hash_key"]), int(parent["ending_hash_key"])
        mid = (lo + hi) // 2
        parent["closed"] = True
        kids = []
        for lo_, hi_ in ((lo, mid), (mid + 1, hi)):
            kid_id = f"shardId-{meta['next_shard']:012d}"
            meta["next_shard"] += 1
            kids.append(kid_id)
            meta["shards"].append(
                {
                    "shard_id": kid_id,
                    "parent_shard_id": shard_id,
                    "adjacent_parent_shard_id": None,
                    "starting_hash_key": str(lo_),
                    "ending_hash_key": str(hi_),
                    "closed": False,
                    "next_seq": 0,
                }
            )
        self._write_meta(meta)
        return kids[0], kids[1]

    def merge_shards(self, a: str, b: str) -> str:
        """Merge two adjacent shards: both close; the child carries
        parent=a, adjacent_parent=b (KinesisSourceTest.scala:161-172)."""
        meta = self._meta()
        sa = next(s for s in meta["shards"] if s["shard_id"] == a)
        sb = next(s for s in meta["shards"] if s["shard_id"] == b)
        sa["closed"] = True
        sb["closed"] = True
        kid_id = f"shardId-{meta['next_shard']:012d}"
        meta["next_shard"] += 1
        meta["shards"].append(
            {
                "shard_id": kid_id,
                "parent_shard_id": a,
                "adjacent_parent_shard_id": b,
                "starting_hash_key": str(
                    min(int(sa["starting_hash_key"]), int(sb["starting_hash_key"]))
                ),
                "ending_hash_key": str(
                    max(int(sa["ending_hash_key"]), int(sb["ending_hash_key"]))
                ),
                "closed": False,
                "next_seq": 0,
            }
        )
        self._write_meta(meta)
        return kid_id

    # -- consume (S1): batch + streaming scans -----------------------------

    def _scan(self, spark: SparkSession, streaming: bool, max_files: int | None) -> DataFrame:
        # fresh StructType: .add() would mutate the module-level schema
        schema = StructType(list(RECORD_SCHEMA.fields) + [StructField("shard_id", StringType())])
        if streaming:
            reader = spark.readStream.schema(schema)
            if max_files:
                reader = reader.option("maxFilesPerTrigger", max_files)
        else:
            reader = spark.read.schema(schema)
        return reader.option("basePath", self.data_dir).parquet(
            os.path.join(self.data_dir, "shard_id=*")
        )

    def _start_filter(
        self,
        spark: SparkSession,
        df: DataFrame,
        iterator: IteratorType,
        now: datetime | None,
    ) -> DataFrame:
        """Apply the start position. For Latest we snapshot the current
        per-shard max sequence number (the reference's cursor, S8) and keep
        only later records; shards created afterwards have no floor, so they
        read from their beginning — exactly the Latest→TrimHorizon rewrite
        on resharding (S7, KinesisSource.scala:160-163)."""
        if isinstance(iterator, TrimHorizon):
            return df
        if isinstance(iterator, AtTimestamp):
            now = now or datetime.now(timezone.utc)
            since = min(iterator.since, now)
            naive = _as_utc_naive(since)
            return df.filter(F.col("ts") >= F.lit(naive))
        if isinstance(iterator, Latest):
            floors = self.sequence_floors(spark)
            if not floors:
                return df
            floor_df = spark.createDataFrame(
                list(floors.items()), "shard_id string, _floor long"
            )
            return (
                df.join(F.broadcast(floor_df), "shard_id", "left")
                .filter(F.col("_floor").isNull() | (F.col("sequence_number") > F.col("_floor")))
                .drop("_floor")
            )
        raise TypeError(f"unknown iterator type {iterator!r}")

    def sequence_floors(self, spark: SparkSession) -> dict[str, int]:
        """Current max sequence number per shard — the checkpointable cursor
        (S8/S9: ShardIterator's reissue token is exactly this)."""
        if not os.path.isdir(self.data_dir) or not os.listdir(self.data_dir):
            return {}
        rows = (
            self._scan(spark, streaming=False, max_files=None)
            .groupBy("shard_id")
            .agg(F.max("sequence_number").alias("m"))
            .collect()
        )
        return {r["shard_id"]: r["m"] for r in rows}

    def read_batch(
        self,
        spark: SparkSession,
        iterator: IteratorType | None = None,
        now: datetime | None = None,
    ) -> DataFrame:
        """Bounded scan of the stream at a start position (the batch analog
        of S1's unbounded source)."""
        iterator = iterator or TrimHorizon()
        df = self._scan(spark, streaming=False, max_files=None)
        return self._start_filter(spark, df, iterator, now)

    def read_stream(
        self,
        spark: SparkSession,
        iterator: IteratorType | None = None,
        max_files_per_trigger: int | None = None,
        now: datetime | None = None,
    ) -> DataFrame:
        """Unbounded scan (S1): a streaming DataFrame of
        (shard_id, sequence_number, partition_key, data, ts).

        Micro-batch planning discovers new shard directories each batch —
        the reshard-follow path (S13) without bespoke code; the rate cap
        (maxFilesPerTrigger) plays the role of demand-driven backpressure
        (S15). Offsets live in the checkpoint WAL (S8's reissue token)."""
        df = self._scan(spark, streaming=True, max_files=max_files_per_trigger)
        return self._start_filter(spark, df, iterator or TrimHorizon(), now)
