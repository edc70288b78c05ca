"""Tier-3 tests (SURVEY §5.3): integration against the file-backed simulated
stream — replaces the reference's kinesalite emulator scenarios
(KinesaliteTest.scala / KinesisSourceTest.scala:62-231): ordered read-back
per key, AtTimestamp positioning + clamp, Latest isolation, reshard
(split/merge) with no record loss, and the source→sink round trip."""

from __future__ import annotations

import os
from datetime import datetime, timedelta, timezone

import pyspark.sql.functions as F
import pytest

from akka_streams_kinesis_spark.sources import (
    AtTimestamp,
    Latest,
    SimStream,
    TrimHorizon,
    find_newest_possible_shards,
    find_oldest_possible_shards,
)
from akka_streams_kinesis_spark.streaming import kinesis_write_flow
from akka_streams_kinesis_spark.testing import SimStreamPut, no_sleep

T0 = datetime(2024, 1, 1, 0, 0, 0, tzinfo=timezone.utc)


def make_records(prefix, n):
    return [(f"{prefix}", f"{prefix}-{i:04d}".encode()) for i in range(n)]


@pytest.fixture()
def stream(tmp_path):
    return SimStream.create(str(tmp_path / "stream"), n_shards=2)


def test_create_and_describe(spark, stream):
    df = stream.describe(spark)
    rows = df.collect()
    assert len(rows) == 2
    assert all(not r["closed"] for r in rows)
    # hash ranges tile the keyspace
    los = sorted(int(r["starting_hash_key"]) for r in rows)
    assert los[0] == 0


def test_put_places_by_partition_key_hash(spark, stream):
    res = stream.put_records(make_records("alpha", 5) + make_records("beta", 5))
    shards_used = {r["shard_id"] for r in res}
    # same key → same shard, always
    alpha_shards = {r["shard_id"] for r in res[:5]}
    beta_shards = {r["shard_id"] for r in res[5:]}
    assert len(alpha_shards) == 1 and len(beta_shards) == 1
    df = stream.read_batch(spark, TrimHorizon())
    assert df.count() == 10


def test_per_shard_ordering_preserved(spark, stream):
    # KinesisSourceTest.scala:62-75: in-order delivery for one partition key
    stream.put_records(make_records("k1", 20))
    df = stream.read_batch(spark, TrimHorizon()).filter(F.col("partition_key") == "k1")
    rows = df.orderBy("sequence_number").collect()
    payloads = [bytes(r["data"]).decode() for r in rows]
    assert payloads == [f"k1-{i:04d}" for i in range(20)]
    seqs = [r["sequence_number"] for r in rows]
    assert seqs == sorted(seqs)


def test_at_timestamp_positioning_and_clamp(spark, stream):
    stream.put_records(make_records("old", 5), ts=T0)
    stream.put_records(make_records("new", 5), ts=T0 + timedelta(hours=2))
    # position after the old batch
    mid = AtTimestamp(T0 + timedelta(hours=1))
    got = stream.read_batch(spark, mid).collect()
    assert {bytes(r["data"]).decode()[:3] for r in got} == {"new"}
    # future timestamp clamps to now ⇒ reads nothing... unless clock says otherwise:
    future = AtTimestamp(T0 + timedelta(days=400))
    got2 = stream.read_batch(spark, future, now=T0 + timedelta(hours=3))
    assert got2.count() == 0  # clamped to "now", which is after all records? no —
    # clamp = min(future, now) = now = T0+3h, all records are older ⇒ filtered out
    # records AT or after the position are included:
    got3 = stream.read_batch(spark, AtTimestamp(T0 + timedelta(hours=2)))
    assert got3.count() == 5


def test_latest_ignores_existing_records(spark, stream):
    stream.put_records(make_records("before", 10))
    df_latest = stream.read_batch(spark, Latest())
    assert df_latest.count() == 0
    # records arriving after the position resolve ARE seen
    floors = stream.sequence_floors(spark)
    stream.put_records(make_records("after", 3))
    seen = stream.read_batch(spark, Latest())  # new resolve — only for this assert
    # a fresh Latest ignores those too; use the captured floors to emulate a
    # running query's cursor:
    df = stream.read_batch(spark, TrimHorizon())
    floor_rows = []
    for shard_id, m in floors.items():
        floor_rows.append((shard_id, m))
    after = df.join(
        spark.createDataFrame(floor_rows, "shard_id string, f long"), "shard_id", "left"
    ).filter(F.col("f").isNull() | (F.col("sequence_number") > F.col("f")))
    assert after.count() == 3


def test_split_shard_lineage_and_no_loss(spark, stream):
    # KinesisSourceTest reshard scenarios (:77-93, :184-195)
    stream.put_records(make_records("pre", 10))
    open_before = [s["shard_id"] for s in stream.open_shards()]
    kid_a, kid_b = stream.split_shard(open_before[0])
    shards = stream.describe(spark)
    roots = {r["shard_id"] for r in find_oldest_possible_shards(shards).collect()}
    leaves = {r["shard_id"] for r in find_newest_possible_shards(shards).collect()}
    assert open_before[0] in roots  # closed parent still a root (history)
    assert kid_a in leaves and kid_b in leaves and open_before[0] not in leaves
    # writes after the split land in children; trim_horizon sees everything
    stream.put_records(make_records("post", 10))
    assert stream.read_batch(spark, TrimHorizon()).count() == 20


def test_merge_shards_single_child(spark, stream):
    a, b = [s["shard_id"] for s in stream.open_shards()]
    stream.put_records(make_records("x", 6))
    kid = stream.merge_shards(a, b)
    shards = stream.describe(spark)
    leaves = {r["shard_id"] for r in find_newest_possible_shards(shards).collect()}
    assert leaves == {kid}
    stream.put_records(make_records("y", 4))
    df = stream.read_batch(spark, TrimHorizon())
    assert df.count() == 10
    by_shard = {r["shard_id"]: r["n"] for r in df.groupBy("shard_id").agg(F.count("*").alias("n")).collect()}
    assert by_shard.get(kid) == 4  # post-merge records in the child


def test_streaming_read_available_now(spark, stream, tmp_path):
    stream.put_records(make_records("s1", 25))
    stream.put_records(make_records("s2", 25))
    sdf = stream.read_stream(spark, TrimHorizon(), max_files_per_trigger=1)
    q = (
        sdf.writeStream.format("memory")
        .queryName("simstream_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    out = spark.table("simstream_out")
    assert out.count() == 50
    # per-shard ordering survives the streaming path
    rows = out.filter(F.col("partition_key") == "s1").orderBy("sequence_number").collect()
    assert [bytes(r["data"]).decode() for r in rows] == [f"s1-{i:04d}" for i in range(25)]


def test_streaming_resume_from_checkpoint_after_reshard(spark, stream, tmp_path):
    """Stop → split (reshard) → more records → resume from checkpoint:
    nothing lost, nothing reread — the S7/S8/S13 follow-the-children path."""
    ckpt = str(tmp_path / "ckpt2")
    out_dir = str(tmp_path / "out2")
    stream.put_records(make_records("gen1", 10))

    def drain():
        # file sink: the checkpoint-recoverable sink (memory sink is not)
        sdf = stream.read_stream(spark, TrimHorizon())
        q = (
            sdf.writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out_dir)

    assert drain().count() == 10
    parent = [s["shard_id"] for s in stream.open_shards()][0]
    stream.split_shard(parent)
    stream.put_records(make_records("gen2", 10))
    got = drain()
    # resumed query appends ONLY the new records (no loss, no re-read):
    assert got.count() == 20
    payloads = sorted(bytes(r["data"]).decode() for r in got.collect())
    expected = sorted(
        [f"gen1-{i:04d}" for i in range(10)] + [f"gen2-{i:04d}" for i in range(10)]
    )
    assert payloads == expected


def test_sink_to_source_round_trip(spark, stream):
    """The full loop: DataFrame → writer flow (chunking/retry semantics) →
    SimStream put → positioned read-back. Single partition: the simulated
    control plane (shards.json) is a local file, not a service."""
    df = spark.range(100).select(
        F.col("id"),
        F.concat(F.lit("user"), (F.col("id") % 7).cast("string")).alias("partition_key"),
        F.encode(F.concat(F.lit("msg-"), F.col("id").cast("string")), "utf-8").alias("data"),
    )
    put = SimStreamPut(stream.path)
    out = kinesis_write_flow(df.coalesce(1), put, "sim", sleep_fn=no_sleep)
    # ONE action: the flow has a side effect, and each Spark action would
    # re-execute it (at-least-once, same as the reference's whole-request
    # retry, SURVEY §4) — production use goes through foreachBatch which
    # persists before fan-out (see write_stream_to_kinesis).
    rows = out.collect()
    assert len(rows) == 100
    assert all(r["error_code"] is None for r in rows)
    back = stream.read_batch(spark, TrimHorizon())
    assert back.count() == 100
    payloads = {bytes(r["data"]).decode() for r in back.collect()}
    assert payloads == {f"msg-{i}" for i in range(100)}



def test_distributed_put_equivalent_to_driver_put(spark, tmp_path):
    """put_records_distributed must place every record in the SAME shard as
    the driver-side put path (identical partition-key hashing), keep
    per-shard sequence numbers contiguous from the reserved base, and lose/
    duplicate nothing."""
    rows = [(f"user{i % 13}", f"rec-{i:04d}".encode()) for i in range(300)]

    a = SimStream.create(str(tmp_path / "driver"), n_shards=2)
    for i in range(0, len(rows), 100):
        a.put_records(rows[i : i + 100])

    b = SimStream.create(str(tmp_path / "dist"), n_shards=2)
    df = spark.createDataFrame(rows, "partition_key string, data binary")
    b.put_records_distributed(df.repartition(8))

    da = a.read_batch(spark, TrimHorizon()).collect()
    db = b.read_batch(spark, TrimHorizon()).collect()

    def placement(rows_):
        return sorted((r["shard_id"], bytes(r["data"])) for r in rows_)

    assert placement(da) == placement(db)  # identical shard routing, no loss

    per_shard = {}
    for r in db:
        per_shard.setdefault(r["shard_id"], []).append(r["sequence_number"])
    for shard_id, seqs in per_shard.items():
        assert sorted(seqs) == list(range(len(seqs))), shard_id

    # a second distributed put continues each shard's sequence from its base
    b.put_records_distributed(df.limit(50))
    total = b.read_batch(spark, TrimHorizon())
    assert total.count() == 350
    again = {}
    for r in total.collect():
        again.setdefault(r["shard_id"], []).append(r["sequence_number"])
    for shard_id, seqs in again.items():
        assert sorted(seqs) == list(range(len(seqs))), shard_id


def test_naive_put_timestamp_treated_as_utc(tmp_path):
    """A naive ts passed to put_records must be stored verbatim (naive ==
    UTC, mirroring _parse_iso), never shifted through the machine's local
    zone — an AtTimestamp read at the same wall-clock must see the rows."""
    from datetime import datetime, timezone

    from akka_streams_kinesis_spark.sources.kinesis_sim import _as_utc_naive

    naive = datetime(2024, 6, 1, 12, 0, 0)
    aware = datetime(2024, 6, 1, 12, 0, 0, tzinfo=timezone.utc)
    assert _as_utc_naive(naive) == naive
    assert _as_utc_naive(aware) == naive

    s = SimStream.create(str(tmp_path / "s"), n_shards=1)
    s.put_records(make_records("k", 3), ts=naive)
    import pyarrow.parquet as pq
    import glob as _glob

    files = _glob.glob(os.path.join(s.data_dir, "shard_id=*", "*.parquet"))
    stored = {v.as_py() for f in files for v in pq.read_table(f)["ts"]}
    assert stored == {naive}
