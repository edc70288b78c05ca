"""Python DataSource V2 (`pyspark.sql.datasource`, Spark 4) for the
file-backed simulated Kinesis stream — the reference's source surface
(`KinesisSource.scala:71-79`) expressed at the DataSource level instead of
as a wrapper over the file source.

Why this exists alongside ``kinesis_sim.SimStream``: the wrapper proves the
semantics on Spark's built-in parquet source; this module proves the same
semantics where a *real* connector would live — a ``DataSource`` with a
batch reader (one InputPartition per shard = "one poll loop per shard",
`KinesisSource.scala:211-223`), planner-side shard pruning via
``pushFilters``, and a ``DataSourceStreamReader`` whose offsets are the
per-shard next-sequence-number cursor (`KinesisSource.scala:55-65` — the
reissue token IS the checkpointed offset, SURVEY §2.A S8/S9). Reads go
through a fault-injectable client with the reference's four-way
handleResult error dispatch (S17, `KinesisSource.scala:290-302`): expired
cursor → reissue from the sequence floor; throughput exceeded → 800 ms
backoff + repoll; service error → bounded retry; client error → fail
fast. See the S17 section below and tests/test_pyds_errors.py.

Usage::

    from akka_streams_kinesis_spark.sources.pyds import register
    register(spark)
    df = (spark.read.format("kinesis_sim_py")
          .option("path", stream_dir)
          .option("starting_position", "at_timestamp:2024-01-01T00:00:00")
          .load())
    sdf = spark.readStream.format("kinesis_sim_py").option(...).load()

Options:
  path               stream directory (shards.json + data/shard_id=*/)
  starting_position  trim_horizon (default) | latest | at_timestamp:<ISO>
  now                <ISO> clock injection for the AtTimestamp clamp
                     min(since, now) (`KinesisSource.scala:100-102`; the
                     reference injects java.time.Clock the same way)

Scale notes: partition planning lists shard directories only (no data
read); `latest`/`at_timestamp` offset resolution reads just the
sequence_number/ts columns of the affected shard (column-pruned parquet
scan); all record bytes flow executor-side as Arrow batches, never through
the driver.
"""

from __future__ import annotations

import glob
import json
import os
from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Iterable, Iterator, List

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
)
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

FORMAT_NAME = "kinesis_sim_py"

SCHEMA = StructType(
    [
        StructField("sequence_number", LongType()),
        StructField("partition_key", StringType()),
        StructField("data", BinaryType()),
        StructField("ts", TimestampType()),
        StructField("shard_id", StringType()),
    ]
)

_COLS = [f.name for f in SCHEMA.fields]


def _parse_iso(s: str) -> datetime:
    dt = datetime.fromisoformat(s)
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def _shard_dirs(path: str) -> dict[str, str]:
    """shard_id → data directory, from the on-disk layout."""
    out = {}
    for d in sorted(glob.glob(os.path.join(path, "data", "shard_id=*"))):
        out[os.path.basename(d).split("=", 1)[1]] = d
    return out


def _shard_files(shard_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(shard_dir, "*.parquet")))


def _max_seq(shard_dir: str) -> int | None:
    """Max sequence number in a shard, reading only the seq column."""
    import pyarrow.parquet as pq

    best: int | None = None
    for f in _shard_files(shard_dir):
        col = pq.read_table(f, columns=["sequence_number"])["sequence_number"]
        if len(col):
            m = max(col.to_pylist())
            best = m if best is None else max(best, m)
    return best


def _first_seq_at_or_after(shard_dir: str, since: datetime) -> int | None:
    """Smallest sequence number whose ts >= since (arrival-time positioning:
    AT_TIMESTAMP reads from the first record that arrived at/after t)."""
    import pyarrow.parquet as pq

    best: int | None = None
    for f in _shard_files(shard_dir):
        t = pq.read_table(f, columns=["sequence_number", "ts"])
        for seq, ts in zip(
            t["sequence_number"].to_pylist(), t["ts"].to_pylist()
        ):
            if ts is not None and ts >= since and (best is None or seq < best):
                best = seq
    return best


@dataclass
class ShardPartition(InputPartition):
    """One scan unit per shard — the analog of the reference's per-shard
    poll loop (S12). ``lo``/``hi`` bound sequence numbers [lo, hi);
    ``since`` is an optional event-time floor applied executor-side."""

    shard_id: str
    files: List[str] = field(default_factory=list)
    lo: int = 0
    hi: int | None = None
    since: datetime | None = None


# -- S17: handleResult error-dispatch policy (KinesisSource.scala:290-302) --
#
# The reference's read loop dispatches each getRecords failure four ways:
#   ExpiredIteratorException        → reissue the iterator from the stored
#                                     AFTER_SEQUENCE_NUMBER token and repoll
#   ProvisionedThroughputExceeded   → back off 800 ms, repoll same position
#   AmazonServiceException (5xx)    → log, bounded retry with backoff
#   AmazonClientException (4xx)     → fail the stage fast
# The simulated reader exposes the same seam: reads go through an
# injectable ``read_file`` client that may raise the typed faults below,
# and ``_read_partition`` applies the identical policy. Tests drive it
# with fake clients exactly like the reference's fake-AmazonKinesisAsync
# tests (KinesisSourceTest.scala, KinesisGraphStageTest.scala:27-59).


class ExpiredIteratorError(Exception):
    """Cursor outlived its 5-minute validity (KinesisSource.scala:40-42)."""


class ThroughputExceededError(Exception):
    """ProvisionedThroughputExceededException — throttle, then repoll."""


class ServiceError(Exception):
    """Amazon-side 5xx — retryable with backoff, bounded attempts."""


class ClientError(Exception):
    """Caller-side 4xx — not retryable; fail fast."""


_THROTTLE_BACKOFF_S = 0.8   # reference's 800 ms backoff constant
_MAX_SERVICE_RETRIES = 7    # reference's withRetries budget (package.scala)
_BACKOFF_CAP_S = 64.0       # 2^n capped at 64 s
# The reference repolls throttle/expired unboundedly (a live service
# eventually recovers); here a buggy or fault-stuck injected client would
# hang the executor task forever, so both paths get a generous consecutive-
# failure budget and then fail loudly. 150 throttle repolls ≈ 2 min of
# continuous ProvisionedThroughputExceeded on one file.
_MAX_THROTTLE_RETRIES = 150
_MAX_REISSUE_RETRIES = 150


def _default_read_file(path: str):
    import pyarrow.parquet as pq

    return pq.read_table(path)


def _read_partition(
    part: ShardPartition,
    read_file=None,
    sleep_fn=None,
) -> Iterator:
    """Executor-side scan of one shard: parquet → Arrow batches with the
    positioned-read bounds applied. Yields Arrow RecordBatches (the fast
    path — record bytes never pass through Python row objects).

    Faults raised by ``read_file`` are dispatched per the reference's
    handleResult policy (S17, see above). Expired-cursor recovery is the
    reissue of S8/S16 translated to file granularity: re-resolve the
    shard's file list (new files may have landed during the outage) and
    continue from the not-yet-drained ones — a file is drained atomically,
    so records are neither lost nor duplicated."""
    import time

    import pyarrow as pa
    import pyarrow.compute as pc

    client = read_file or _default_read_file
    sleep = sleep_fn or time.sleep

    pending = list(part.files)
    drained: set[str] = set()
    service_tries = 0
    throttle_tries = 0
    reissue_tries = 0
    while pending:
        f = pending[0]
        try:
            t = client(f)
            service_tries = throttle_tries = reissue_tries = 0
        except ExpiredIteratorError as e:
            reissue_tries += 1
            if reissue_tries > _MAX_REISSUE_RETRIES:
                raise RuntimeError(
                    f"shard {part.shard_id}: iterator still expired after "
                    f"{_MAX_REISSUE_RETRIES} consecutive reissues on {f}"
                ) from e
            # reissue: re-list the shard dir but restrict to the PLANNED
            # file set — a file written after planning must not leak into a
            # bounded scan's fault-retry path (results would then differ
            # between faulting and non-faulting runs of the same scan)
            planned = set(part.files)
            pending = [
                x
                for x in _shard_files(os.path.dirname(f))
                if x in planned and x not in drained
            ]
            continue
        except ThroughputExceededError as e:
            throttle_tries += 1
            if throttle_tries > _MAX_THROTTLE_RETRIES:
                raise RuntimeError(
                    f"shard {part.shard_id}: still throttled after "
                    f"{_MAX_THROTTLE_RETRIES} consecutive repolls on {f}"
                ) from e
            sleep(_THROTTLE_BACKOFF_S)   # repoll same position
            continue
        except ServiceError:
            service_tries += 1
            if service_tries > _MAX_SERVICE_RETRIES:
                raise
            sleep(min(2.0 ** service_tries, _BACKOFF_CAP_S))
            continue
        # ClientError (and anything unknown) propagates: fail fast.
        pending.pop(0)
        drained.add(f)
        t = t.append_column("shard_id", pa.array([part.shard_id] * len(t)))
        mask = None

        def _and(m, cond):
            return cond if m is None else pc.and_(m, cond)

        if part.lo > 0:
            mask = _and(mask, pc.greater_equal(t["sequence_number"], part.lo))
        if part.hi is not None:
            mask = _and(mask, pc.less(t["sequence_number"], part.hi))
        if part.since is not None:
            mask = _and(mask, pc.greater_equal(t["ts"], part.since))
        if mask is not None:
            t = t.filter(mask)
        t = t.select(_COLS)
        if len(t):
            yield from t.to_batches()


class KinesisSimBatchReader(DataSourceReader):
    """Bounded positioned scan (the batch analog of S1), with shard pruning
    pushed to partition planning via ``pushFilters`` — the DataSource-level
    equivalent of the wrapper's Hive-partition pruning."""

    def __init__(self, options: dict, read_file=None, sleep_fn=None):
        self.path = options["path"]
        self.position = options.get("starting_position", "trim_horizon").lower()
        self.now = _parse_iso(options["now"]) if "now" in options else None
        self.wanted_shards: set[str] | None = None
        # S17 seam: fault-injectable read client (fake-client tests)
        self.read_file = read_file
        self.sleep_fn = sleep_fn

    def pushFilters(self, filters: List[Filter]) -> Iterable[Filter]:
        for f in filters:
            if isinstance(f, (EqualTo, In)) and f.attribute == ("shard_id",):
                # conjunctive semantics: multiple pushed shard_id predicates
                # (e.g. IN ('a','b') AND = 'a', which Catalyst does not
                # always fold) must INTERSECT, not overwrite — consuming a
                # filter promises Spark it has been fully applied
                s = {f.value} if isinstance(f, EqualTo) else set(f.value)
                self.wanted_shards = (
                    s if self.wanted_shards is None else self.wanted_shards & s
                )
            else:
                yield f  # everything else stays in Spark's Filter node

    def partitions(self) -> list[ShardPartition]:
        dirs = _shard_dirs(self.path)
        if self.wanted_shards is not None:
            dirs = {s: d for s, d in dirs.items() if s in self.wanted_shards}
        parts = []
        for shard_id, d in dirs.items():
            p = ShardPartition(shard_id=shard_id, files=_shard_files(d))
            if self.position == "latest":
                m = _max_seq(d)
                p.lo = 0 if m is None else m + 1  # nothing newer yet
            elif self.position.startswith("at_timestamp:"):
                since = _parse_iso(self.position.split(":", 1)[1])
                now = self.now or datetime.utcnow()
                p.since = min(since, now)  # S3 work-conserving clamp
            if p.files:
                parts.append(p)
        return parts

    def read(self, partition: ShardPartition) -> Iterator:
        yield from _read_partition(partition, self.read_file, self.sleep_fn)


class KinesisSimStreamReader(DataSourceStreamReader):
    """Unbounded scan: offset = {shard_id: next sequence number} — exactly
    the reference's resume-AFTER_SEQUENCE_NUMBER cursor (S8), checkpointed
    by Spark's offset WAL. Shards that appear after the query starts (a
    reshard's children) get floor 0: the Latest→TrimHorizon rewrite (S7)."""

    def __init__(self, options: dict, read_file=None, sleep_fn=None):
        self.path = options["path"]
        self.position = options.get("starting_position", "trim_horizon").lower()
        self.now = _parse_iso(options["now"]) if "now" in options else None
        # S17 seam: fault-injectable read client (fake-client tests)
        self.read_file = read_file
        self.sleep_fn = sleep_fn

    def initialOffset(self) -> dict:
        dirs = _shard_dirs(self.path)
        if self.position == "latest":
            out = {}
            for s, d in dirs.items():
                m = _max_seq(d)
                out[s] = (m if m is not None else -1) + 1
            return out
        if self.position.startswith("at_timestamp:"):
            since = _parse_iso(self.position.split(":", 1)[1])
            now = self.now or datetime.utcnow()
            since = min(since, now)
            out = {}
            for s, d in dirs.items():
                first = _first_seq_at_or_after(d, since)
                if first is None:
                    m = _max_seq(d)
                    first = (m if m is not None else -1) + 1
                out[s] = first
            return out
        return {s: 0 for s in dirs}  # trim_horizon

    def latestOffset(self) -> dict:
        out = {}
        for s, d in _shard_dirs(self.path).items():
            m = _max_seq(d)
            out[s] = (m if m is not None else -1) + 1
        return out

    def partitions(self, start: dict, end: dict) -> list[ShardPartition]:
        parts = []
        dirs = _shard_dirs(self.path)
        for shard_id, hi in end.items():
            lo = int(start.get(shard_id, 0))  # unseen shard ⇒ from its start (S7)
            hi = int(hi)
            if hi > lo and shard_id in dirs:
                parts.append(
                    ShardPartition(
                        shard_id=shard_id,
                        files=_shard_files(dirs[shard_id]),
                        lo=lo,
                        hi=hi,
                    )
                )
        return parts

    def read(self, partition: ShardPartition) -> Iterator:
        yield from _read_partition(partition, self.read_file, self.sleep_fn)

    def commit(self, end: dict) -> None:
        pass  # progress lives in Spark's checkpoint WAL


class KinesisSimDataSource(DataSource):
    """`spark.read/readStream.format("kinesis_sim_py")` — see module doc."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> KinesisSimBatchReader:
        return KinesisSimBatchReader(self.options)

    def streamReader(self, schema: StructType) -> KinesisSimStreamReader:
        return KinesisSimStreamReader(self.options)

    @staticmethod
    def _check_write(schema: StructType, overwrite: bool) -> None:
        names = {f.name for f in schema.fields}
        if not {"partition_key", "data"} <= names:
            raise ValueError(
                "kinesis_sim_py sink requires (partition_key string, "
                f"data binary) columns; got {sorted(names)}"
            )
        if overwrite:
            raise ValueError(
                "kinesis_sim_py is append-only (PutRecords has no overwrite); "
                "use mode('append')"
            )

    def writer(self, schema: StructType, overwrite: bool):
        self._check_write(schema, overwrite)
        return KinesisSimBatchWriter(self.options)

    def streamWriter(self, schema: StructType, overwrite: bool):
        self._check_write(schema, overwrite)
        return KinesisSimStreamWriter(self.options)


def register(spark) -> None:
    """Idempotently register the format with a SparkSession.

    Sets `spark.sql.python.filterPushdown.enabled` at RUNTIME (it's a
    regular SQL conf): Spark refuses to instantiate a reader that
    implements pushFilters() while the flag is off, and the external
    driver's session is vanilla — session-build confs would not reach it
    (same pattern as the parquet-nanos conf in io.table)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(KinesisSimDataSource)


# ---------------------------------------------------------------------------
# Write path: df.write / writeStream .format("kinesis_sim_py")
# ---------------------------------------------------------------------------
#
# The reference's SINK is a Kinesis PutRecords writer (KinesisGraphStage:
# buffered ≤500-record chunks, withRetries 7×2^n≤64 s, 800 ms throttle
# backoff with per-record requeue — W1-W11). This is that surface at the
# DataSource level: `df.write.format("kinesis_sim_py")` appends records
# to the simulated stream with the SAME chunking/retry/throttle policy
# (reused verbatim from streaming/writer.py), and
# `df.writeStream.format(...)` is the streaming sink (one commit per
# micro-batch).
#
# Sequence contract: tasks snapshot the control-plane next_seq and number
# their records next_seq + (taskPartitionId << 28) + i; commit() advances
# next_seq past the batch max. Within a job all tasks share one snapshot
# (unique, ordered-within-task), and later jobs/batches always start
# above earlier ones (monotone per shard — what the reader's resume
# cursor requires). Like Kinesis itself, sequence numbers are opaque
# increasing tokens, not dense.
#
# Delivery semantics: PutRecords is not transactional — the sink is
# at-least-once. abort() best-effort deletes files acked by completed
# tasks, but a task that dies after its put cannot be unwound (exactly
# the reference's failure envelope; dedup belongs downstream, see
# stream_dedup_* / dedup_incremental_digest).

from dataclasses import dataclass as _dataclass

from pyspark.sql.datasource import (
    DataSourceArrowWriter,
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)

_SEQ_TASK_SHIFT = 28  # per-task capacity 2^28 records per put job


@_dataclass
class SimWriteCommit(WriterCommitMessage):
    files: list        # paths written by this task
    max_seqs: dict     # shard_id -> max sequence number written
    n_rows: int


def _stream_meta(path: str) -> dict:
    with open(os.path.join(path, "shards.json")) as f:
        return json.load(f)


def _write_stream_meta(path: str, meta: dict) -> None:
    tmp = os.path.join(path, "shards.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, os.path.join(path, "shards.json"))


def _success_put(stream_name: str, batch: list) -> list:
    """Default client: the simulated service accepts every record."""
    return [{"error_code": None, "error_message": None} for _ in batch]


def _task_put(
    arrow_batches,
    path: str,
    arrival_ts: datetime,
    put_client=None,
    sleep_fn=None,
) -> SimWriteCommit:
    """Executor-side put: assign shards by partition-key hash, chunk per
    shard to the AWS 500-record limit, push every chunk through the
    reference retry/throttle policy, then persist acked records as one
    parquet file per shard."""
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark import TaskContext

    from ..streaming.writer import AWS_MAX_BUFFER_SIZE, _flush_chunk
    from .kinesis_sim import hash_key_for_partition_key

    put_fn = put_client or _success_put
    sleep = sleep_fn or _time.sleep

    meta = _stream_meta(path)
    ranges = [
        (s["shard_id"], int(s["starting_hash_key"]), int(s["ending_hash_key"]), int(s["next_seq"]))
        for s in meta["shards"]
        if not s["closed"]
    ]
    pid = TaskContext.get().partitionId() if TaskContext.get() else 0

    per_shard: dict[str, list[tuple[str, bytes]]] = {}
    for batch in arrow_batches:
        pks = batch.column("partition_key").to_pylist()
        datas = batch.column("data").to_pylist()
        for pk, data in zip(pks, datas):
            h = hash_key_for_partition_key(pk)
            sid = next((s for s, lo, hi, _ in ranges if lo <= h <= hi), None)
            if sid is None:
                # e.g. hand-edited shards.json or a reshard that left a
                # hash-range gap: fail with a diagnosable message instead
                # of an opaque executor StopIteration
                raise RuntimeError(
                    f"no open shard covers hash key {h} for partition key "
                    f"{pk!r}; open ranges: "
                    f"{[(s, lo, hi) for s, lo, hi, _ in ranges]}"
                )
            per_shard.setdefault(sid, []).append((pk, bytes(data)))

    naive_ts = arrival_ts
    if naive_ts.tzinfo is not None:
        naive_ts = naive_ts.astimezone(timezone.utc).replace(tzinfo=None)

    files: list[str] = []
    max_seqs: dict[str, int] = {}
    n_rows = 0
    next_seq_by_shard = {s: ns for s, _, _, ns in ranges}
    for sid, records in per_shard.items():
        acked: list[tuple[str, bytes]] = []
        for i in range(0, len(records), AWS_MAX_BUFFER_SIZE):
            chunk = records[i : i + AWS_MAX_BUFFER_SIZE]
            results = _flush_chunk(
                chunk,
                put_fn,
                stream_name=os.path.basename(path.rstrip("/")),
                max_retries=7,
                throttle_sleep=0.8,
                sleep_fn=sleep,
            )
            failed = [r for r in results if r["error_code"] is not None]
            if failed:
                # fail fast: undeliverable after the full retry budget
                raise RuntimeError(
                    f"shard {sid}: {len(failed)} records failed: "
                    f"{failed[0]['error_code']}"
                )
            acked.extend(chunk)
        base = next_seq_by_shard[sid] + (pid << _SEQ_TASK_SHIFT)
        seqs = [base + i for i in range(len(acked))]
        d = os.path.join(path, "data", f"shard_id={sid}")
        os.makedirs(d, exist_ok=True)
        import uuid as _uuid

        fname = os.path.join(d, f"put-{_uuid.uuid4().hex}.parquet")
        tbl = pa.table(
            {
                "sequence_number": pa.array(seqs, pa.int64()),
                "partition_key": pa.array([r[0] for r in acked], pa.string()),
                "data": pa.array([r[1] for r in acked], pa.binary()),
                "ts": pa.array([naive_ts] * len(acked), pa.timestamp("us")),
            }
        )
        pq.write_table(tbl, fname)
        files.append(fname)
        max_seqs[sid] = seqs[-1]
        n_rows += len(acked)
    return SimWriteCommit(files=files, max_seqs=max_seqs, n_rows=n_rows)


def _advance_meta(path: str, messages) -> None:
    """Driver-side commit: bump each shard's next_seq past everything the
    job wrote, so the next put job (or micro-batch) starts above it."""
    meta = _stream_meta(path)
    for m in messages:
        if m is None:
            continue
        for sid, mx in m.max_seqs.items():
            for s in meta["shards"]:
                if s["shard_id"] == sid:
                    s["next_seq"] = max(int(s["next_seq"]), mx + 1)
    _write_stream_meta(path, meta)


def _abort_cleanup(messages) -> None:
    for m in messages:
        if m is None:
            continue
        for f in m.files:
            try:
                os.remove(f)
            except OSError:
                pass


class KinesisSimBatchWriter(DataSourceArrowWriter):
    """Bounded put job (`df.write.format("kinesis_sim_py").mode("append")`).
    Arrow batches stream through the executor put loop; the driver commit
    advances the per-shard sequence floor."""

    def __init__(self, options: dict, put_client=None, sleep_fn=None):
        self.path = options["path"]
        self.arrival_ts = (
            _parse_iso(options["arrival_ts"])
            if "arrival_ts" in options
            else datetime.utcnow()
        )
        self.put_client = put_client
        self.sleep_fn = sleep_fn

    def write(self, iterator) -> SimWriteCommit:
        return _task_put(
            iterator, self.path, self.arrival_ts, self.put_client, self.sleep_fn
        )

    def commit(self, messages) -> None:
        _advance_meta(self.path, messages)

    def abort(self, messages) -> None:
        _abort_cleanup(messages)


class KinesisSimStreamWriter(DataSourceStreamArrowWriter):
    """Streaming sink (`df.writeStream.format("kinesis_sim_py")`): each
    micro-batch is one put job over Arrow RecordBatches (the same
    zero-row-object fast path as the batch writer); commit(batchId)
    advances the sequence floor so the NEXT batch's snapshot starts
    above this one (the monotone-per-shard contract the stream reader's
    resume cursor needs). At-least-once, like PutRecords: a batch
    retried after a crash between task success and commit re-puts its
    records."""

    def __init__(self, options: dict, put_client=None, sleep_fn=None):
        self.path = options["path"]
        self.arrival_ts = (
            _parse_iso(options["arrival_ts"])
            if "arrival_ts" in options
            else datetime.utcnow()
        )
        self.put_client = put_client
        self.sleep_fn = sleep_fn

    def write(self, iterator) -> SimWriteCommit:
        return _task_put(
            iterator, self.path, self.arrival_ts, self.put_client, self.sleep_fn
        )

    def commit(self, messages, batchId: int) -> None:
        _advance_meta(self.path, messages)

    def abort(self, messages, batchId: int) -> None:
        _abort_cleanup(messages)
