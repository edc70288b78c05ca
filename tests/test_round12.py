"""Round-12 invariants: snapshot isolation for the standing ANN index,
the pyarrow.fs object-store write path, vacuum, and payload-schema
widening (round-11 VERDICT asks #1-#3 + all four ADVICE items).

The headline contract (VERDICT ask #1 "Done" criterion): a search that
runs BETWEEN an in-flight batch's data writes and its manifest commit
returns the PRE-batch answer — readers resolve committed manifests, and
committed data files are immutable.
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pyspark.sql.functions as F
import pytest

from akka_streams_kinesis_spark.streaming.ann_index import (
    DELETED_COL,
    MAX_BITS,
    _commit_manifest,
    _fs_write_atomic,
    _resolve_fs,
    _write_partition_files,
    assign_cells,
    compact_markers,
    current_version,
    index_merger,
    load_snapshot,
    read_directory,
    read_idmap,
    read_store,
    register_fs_factory,
    vacuum,
)


def _upserts(spark, rows, schema="vec_id long, seq long, code string"):
    return spark.createDataFrame(rows, schema)


def _dir_set(spark, root):
    return {
        (r["cell"], r["depth"], r["n_vecs"])
        for r in read_directory(spark, root).collect()
    }


def _rebuild_set(spark, final_rows):
    df = assign_cells(
        _upserts(spark, final_rows).select("vec_id", "code")
    ).groupBy("cell", "depth").agg(F.count("*").alias("n_vecs"))
    return {(r["cell"], r["depth"], r["n_vecs"]) for r in df.collect()}


@pytest.fixture
def root(tmp_path):
    return str(tmp_path / "annidx")


class TestSnapshotIsolation:
    def test_search_mid_batch_reads_pre_batch_snapshot(
        self, spark, sf_dir, tmp_path
    ):
        """THE round-11 ask-#1 criterion: `_standing_search` executed
        between index_merger's data writes and its manifest commit gets
        the PRE-batch answer; after the commit it sees the batch. The
        injected batch inserts a clone of query 0's embedding under a
        fresh vec_id — guaranteed to enter query 0's top-k (cosine 1.0)
        — so 'pre-batch answer' and 'post-batch answer' differ
        provably."""
        from akka_streams_kinesis_spark.operators.streaming_queries import (
            _ensure_standing_index,
            _standing_search,
        )

        src = _ensure_standing_index(spark, sf_dir)
        root = str(tmp_path / "iso_index")
        shutil.copytree(src, root)

        pre_rows = sorted(
            (
                (r["query_id"], r["rnk"], r["vec_id"])
                for r in _standing_search(spark, root).collect()
            )
        )
        clone_src = (
            read_store(spark, root).filter(F.col("vec_id") == 0).collect()
        )
        assert len(clone_src) == 1
        clone = clone_src[0]
        new_id = 10**6
        batch = spark.createDataFrame(
            [(new_id, 99, clone["code"], clone["embedding"])],
            "vec_id long, seq long, code string, embedding array<float>",
        )

        observed_mid_batch = {}

        def _hook(version):
            rows = _standing_search(spark, root).collect()
            observed_mid_batch["rows"] = sorted(
                (r["query_id"], r["rnk"], r["vec_id"]) for r in rows
            )
            observed_mid_batch["ids"] = {r["vec_id"] for r in rows}

        index_merger(spark, root, pre_commit_hook=_hook)(batch, 1)

        # mid-batch (data written, manifest not): the PRE-batch answer
        assert observed_mid_batch["rows"] == pre_rows
        assert new_id not in observed_mid_batch["ids"]
        # post-commit: the clone is query 0's new near-identical hit
        post = _standing_search(spark, root).collect()
        q0_hits = {r["vec_id"] for r in post if r["query_id"] == 0}
        assert new_id in q0_hits

    def test_pinned_snapshot_survives_later_commits(self, spark, root):
        merge = index_merger(spark, root)
        rows = [(i, 0, format(i * 7, f"0{MAX_BITS}b")) for i in range(12)]
        merge(_upserts(spark, rows), 0)
        pinned = load_snapshot(root)
        moved = [(i, 1, "1" * MAX_BITS) for i in range(0, 12, 2)]
        merge(_upserts(spark, moved), 1)
        # the pinned v1 view is unchanged: committed files are immutable
        assert read_store(spark, root, snapshot=pinned).count() == 12
        assert (
            read_store(spark, root, snapshot=pinned)
            .agg(F.max("seq"))
            .collect()[0][0]
            == 0
        )
        assert read_store(spark, root).agg(F.max("seq")).collect()[0][0] == 1
        # idmap/directory of the pinned snapshot agree with its store
        assert (
            read_idmap(spark, root, snapshot=pinned)
            .agg(F.max("seq"))
            .collect()[0][0]
            == 0
        )


class TestObjectStoreBranch:
    """The non-local `_resolve_fs` branch, exercised against pyarrow's
    in-memory mock filesystem (no network): parquet writes via the
    filesystem handle, manifest commit via direct PUT, vacuum traversal
    — and NO local junk directories like 's3a:/…' (the round-11 ADVICE
    failure mode)."""

    @pytest.fixture
    def mockfs(self):
        from pyarrow.fs import _MockFileSystem

        fs = _MockFileSystem()
        register_fs_factory("mock", lambda: fs)
        yield fs
        from akka_streams_kinesis_spark.streaming import ann_index

        ann_index._FS_FACTORIES.pop("mock", None)

    def test_resolve_fs_dispatch(self, mockfs, tmp_path):
        fs, base, local = _resolve_fs("mock://idx")
        assert fs is mockfs and base == "idx" and not local
        fs2, base2, local2 = _resolve_fs("file:" + str(tmp_path))
        assert local2 and base2 == str(tmp_path)
        fs3, base3, local3 = _resolve_fs(str(tmp_path))
        assert local3 and base3 == str(tmp_path)

    def test_partition_writer_on_mock_fs(self, mockfs):
        """Drive the task body directly (in-process, the same function
        mapInArrow runs) against a mock object store: files land under
        the right partition dirs, tomb-only partitions are registered
        with zero rows and create NO file, and nothing touches the
        local filesystem."""
        batch = pa.record_batch(
            {
                "vec_id": pa.array([1, 2, None], pa.int64()),
                "seq": pa.array([0, 0, None], pa.int64()),
                "__pkey": pa.array(
                    ["c8=b01/sb=0", "c8=b01/sb=0", "c8=b10/sb=1"]
                ),
                "_tomb": pa.array([False, False, True]),
            }
        )
        reports = list(
            _write_partition_files(
                [batch], "mock://idx/store", "part-v00000001.parquet",
                ("__pkey", "_tomb"),
            )
        )
        assert len(reports) == 1
        rep = {
            k: n
            for k, n in zip(
                reports[0]["part"].to_pylist(),
                reports[0]["n_rows"].to_pylist(),
            )
        }
        assert rep == {"c8=b01/sb=0": 2, "c8=b10/sb=1": 0}
        written = pq.read_table(
            "idx/store/c8=b01/sb=0/part-v00000001.parquet",
            filesystem=mockfs,
        )
        assert written.num_rows == 2
        assert written.column_names == ["vec_id", "seq"]
        from pyarrow.fs import FileType

        # tomb-only partition: registered, but no file created
        assert (
            mockfs.get_file_info(
                "idx/store/c8=b10/sb=1/part-v00000001.parquet"
            ).type
            == FileType.NotFound
        )
        # and no local 's3a:'-style junk directory materialized
        assert not os.path.exists("mock:")
        assert not os.path.exists("mock://idx")

    def test_manifest_protocol_on_mock_fs(self, mockfs):
        manifest = {
            "version": 1,
            "store_buckets": 2,
            "store_payload": {"type": "struct", "fields": []},
            "tables": {"store": {}, "idmap": {}, "directory": {}},
        }
        _commit_manifest("mock://idx", manifest)
        assert current_version("mock://idx") == 1
        snap = load_snapshot("mock://idx")
        assert snap.version == 1 and snap.store_buckets == 2
        manifest["version"] = 2
        _commit_manifest("mock://idx", manifest)
        assert current_version("mock://idx") == 2
        # pinned older version still loadable
        assert load_snapshot("mock://idx", 1).version == 1

    def test_atomic_write_and_vacuum_on_mock_fs(self, mockfs):
        _fs_write_atomic(mockfs, False, "idx/x/data", b"payload")
        with mockfs.open_input_stream("idx/x/data") as f:
            assert f.read() == b"payload"
        # a two-version index whose v1 store file gets superseded
        for v, files in ((1, {"c8=b01/sb=0": "part-v00000001.parquet"}),
                         (2, {"c8=b01/sb=0": "part-v00000002.parquet"})):
            for fname in files.values():
                _fs_write_atomic(
                    mockfs, False, f"idx2/store/c8=b01/sb=0/{fname}", b"x"
                )
            _commit_manifest(
                "mock://idx2",
                {
                    "version": v,
                    "store_buckets": 2,
                    "store_payload": {"type": "struct", "fields": []},
                    "tables": {"store": files, "idmap": {}, "directory": {}},
                },
            )
        stats = vacuum("mock://idx2", retain=1)
        assert stats["files_deleted"] == 1
        assert stats["retained_versions"] == [2]
        from pyarrow.fs import FileType

        assert (
            mockfs.get_file_info(
                "idx2/store/c8=b01/sb=0/part-v00000001.parquet"
            ).type
            == FileType.NotFound
        )
        assert (
            mockfs.get_file_info(
                "idx2/store/c8=b01/sb=0/part-v00000002.parquet"
            ).type
            == FileType.File
        )


class TestVacuum:
    def test_vacuum_reclaims_superseded_files_only(self, spark, root):
        merge = index_merger(spark, root)
        hot = "1" * MAX_BITS
        merge(_upserts(spark, [(1, 0, hot), (2, 0, "0" * MAX_BITS)]), 0)
        merge(_upserts(spark, [(1, 1, hot)]), 1)
        merge(_upserts(spark, [(1, 2, hot)]), 2)
        # an orphaned task temp file (crashed attempt debris)
        tmp_orphan = os.path.join(
            root, "store", f"c8=b{'1' * 8}", "sb=0", ".tmp-deadbeef"
        )
        os.makedirs(os.path.dirname(tmp_orphan), exist_ok=True)
        open(tmp_orphan, "w").write("junk")
        pinned_prev = load_snapshot(root, 2)
        stats = vacuum(root, retain=2)
        assert stats["retained_versions"] == [2, 3]
        assert not os.path.exists(tmp_orphan)
        # both retained snapshots remain fully readable
        assert read_store(spark, root).count() == 2
        assert read_store(spark, root, snapshot=pinned_prev).count() == 2
        assert (
            read_store(spark, root, snapshot=pinned_prev)
            .filter(F.col("vec_id") == 1)
            .collect()[0]["seq"]
            == 1
        )
        # manifests outside the window are gone
        mdir = os.path.join(root, "_manifest")
        assert sorted(os.listdir(mdir)) == [
            "LATEST",
            "v00000002.json",
            "v00000003.json",
        ]
        # every file still on disk is referenced by a retained manifest
        kept = set()
        for v in (2, 3):
            snap = load_snapshot(root, v)
            for tbl in ("store", "idmap", "directory"):
                for key, fname in snap.files(tbl).items():
                    kept.add(os.path.join(root, tbl, key, fname))
        on_disk = {
            os.path.join(dp, f)
            for tbl in ("store", "idmap", "directory")
            for dp, _, fs in os.walk(os.path.join(root, tbl))
            for f in fs
        }
        assert on_disk <= kept

    def test_vacuum_rejects_bad_retain(self, root):
        with pytest.raises(ValueError):
            vacuum(root, retain=0)


class TestForeignRootGuard:
    def test_unversioned_data_without_manifest_raises(self, spark, root):
        """Pointing the merger at a table a plain Spark writer produced
        must fail LOUDLY instead of silently shadowing it (round-11
        ADVICE: the old code double-counted part-00000-<uuid> files)."""
        spark.createDataFrame(
            [(1, 0, "x")], "vec_id long, seq long, code string"
        ).write.partitionBy("code").parquet(os.path.join(root, "store"))
        with pytest.raises(RuntimeError, match="foreign|unversioned"):
            index_merger(spark, root)(
                _upserts(spark, [(1, 0, "0" * MAX_BITS)]), 0
            )


class TestSchemaWidening:
    """Round-11 ADVICE medium: a store holding CDC delete markers merged
    with a batch that lacks the `deleted` column must PRESERVE the
    markers (union schemas, null-fill), not resurrect the dead ids."""

    def test_marker_survives_markerless_batch(self, spark, root):
        merge = index_merger(spark, root)
        code = "1" * MAX_BITS
        cdc = "vec_id long, seq long, code string, deleted boolean"
        merge(
            _upserts(spark, [(1, 0, code, False), (2, 0, code, False)], cdc), 0
        )
        merge(_upserts(spark, [(1, 1, code, True)], cdc), 1)  # delete vec 1
        assert read_store(spark, root).count() == 1
        # a PLAIN batch (no deleted column) rewrites the same cell
        merge(_upserts(spark, [(3, 2, code)]), 2)
        live = read_store(spark, root)
        assert {r["vec_id"] for r in live.collect()} == {2, 3}
        markers = read_store(spark, root, markers=True).filter(
            F.coalesce(F.col(DELETED_COL), F.lit(False))
        )
        assert [r["vec_id"] for r in markers.collect()] == [1]
        # and a REPLAY of vec 1's original insert still cannot resurrect
        merge(_upserts(spark, [(1, 0, code, False)], cdc), 0)
        assert read_store(spark, root).filter("vec_id = 1").count() == 0
        # the widened payload schema is recorded in the manifest
        payload = load_snapshot(root).store_payload()
        assert [f.name for f in payload.fields] == [DELETED_COL]

    def test_payload_type_conflict_raises(self, spark, root):
        merge = index_merger(spark, root)
        merge(
            _upserts(
                spark,
                [(1, 0, "0" * MAX_BITS, 1.5)],
                "vec_id long, seq long, code string, score double",
            ),
            0,
        )
        with pytest.raises(RuntimeError, match="type conflict"):
            merge(
                _upserts(
                    spark,
                    [(2, 1, "0" * MAX_BITS, "high")],
                    "vec_id long, seq long, code string, score string",
                ),
                1,
            )

    def test_compaction_keeps_null_deleted_rows(self, spark, root):
        """Round-11 ADVICE low: rows whose `deleted` is NULL (written
        before the column existed, read through the widened schema) are
        LIVE and must survive a compaction of the same cell."""
        merge = index_merger(spark, root)
        code = "1" * MAX_BITS
        # vec 1 inserted BEFORE the deleted column existed
        merge(_upserts(spark, [(1, 0, code)]), 0)
        cdc = "vec_id long, seq long, code string, deleted boolean"
        merge(
            _upserts(spark, [(2, 1, code, False), (3, 1, code, True)], cdc), 1
        )
        # vec 1's stored row now reads deleted = NULL
        raw = read_store(spark, root, markers=True)
        assert (
            raw.filter(F.col("vec_id") == 1).collect()[0][DELETED_COL] is None
        )
        report = compact_markers(spark, root, horizon_seq=2)
        assert report["n_markers_dropped"] == 1
        live = read_store(spark, root)
        assert {r["vec_id"] for r in live.collect()} == {1, 2}


class TestBucketLayout:
    def test_store_buckets_recorded_and_spread(self, spark, root):
        merge = index_merger(spark, root, store_buckets=4)
        hot = "1" * MAX_BITS
        rows = [(i, 0, hot) for i in range(64)]
        merge(_upserts(spark, rows), 0)
        snap = load_snapshot(root)
        assert snap.store_buckets == 4
        keys = [
            k for k in snap.files("store") if k.startswith(f"c8=b{'1' * 8}/")
        ]
        # 64 ids hash across all 4 buckets of the hot cell
        assert sorted(keys) == [f"c8=b{'1' * 8}/sb={b}" for b in range(4)]
        assert read_store(spark, root).count() == 64
        got = read_store(spark, root).groupBy("sb").count().collect()
        assert {r["sb"] for r in got} == {0, 1, 2, 3}
        # a later merger call's store_buckets param is ignored in favor
        # of the manifest's creation-time value (layout stability)
        index_merger(spark, root, store_buckets=16)(
            _upserts(spark, [(100, 1, hot)]), 1
        )
        assert load_snapshot(root).store_buckets == 4
        assert read_store(spark, root).count() == 65

    def test_rebuild_equivalence_holds_across_bucket_counts(
        self, spark, root
    ):
        rows = [(i, 0, format(i * 13 % (1 << MAX_BITS), f"0{MAX_BITS}b"))
                for i in range(40)]
        upd = [(i, 1, format(i * 29 % (1 << MAX_BITS), f"0{MAX_BITS}b"))
               for i in range(0, 40, 5)]
        final = {v: (v, s, c) for v, s, c in rows}
        final.update({v: (v, s, c) for v, s, c in upd})
        expected = _rebuild_set(spark, list(final.values()))
        for buckets in (1, 3):
            r = f"{root}_b{buckets}"
            merge = index_merger(spark, r, store_buckets=buckets)
            merge(_upserts(spark, rows), 0)
            merge(_upserts(spark, upd), 1)
            assert _dir_set(spark, r) == expected, f"buckets={buckets}"
            assert read_store(spark, r).count() == 40


class TestManifestCommitOrder:
    def test_latest_flip_is_the_commit_point(self, spark, root):
        """The version JSON may exist while LATEST still names the old
        version (a crash between the two writes): readers must stay on
        the old version, and the replay must overwrite the orphan."""
        merge = index_merger(spark, root)
        merge(_upserts(spark, [(1, 0, "0" * MAX_BITS)]), 0)
        snap = load_snapshot(root)
        orphan = dict(snap.manifest)
        orphan["version"] = 2
        mdir = os.path.join(root, "_manifest")
        with open(os.path.join(mdir, "v00000002.json"), "w") as f:
            json.dump(orphan, f)
        # LATEST untouched -> still version 1
        assert current_version(root) == 1
        assert load_snapshot(root).version == 1
        # replay/next batch claims version 2 cleanly
        merge(_upserts(spark, [(2, 1, "1" * MAX_BITS)]), 1)
        assert load_snapshot(root).version == 2
        assert read_store(spark, root).count() == 2


class TestServeDuringDrain:
    """Round-12 second wave: the serving path runs INSIDE the drain's
    foreachBatch against the last committed snapshot, and time travel
    replays any committed version after the fact."""

    def test_drain_commits_two_seq_aligned_versions(self, spark, sf_dir):
        from akka_streams_kinesis_spark.operators.streaming_queries import (
            _ensure_tt_index,
        )

        root, served = _ensure_tt_index(spark, sf_dir)
        assert current_version(root) == 2
        rec = spark.read.parquet(served)
        # only batch 1 served (batch 0 had no committed snapshot), and it
        # read pinned v1
        assert {
            (r["batch_id"], r["version"])
            for r in rec.select("batch_id", "version").distinct().collect()
        } == {(1, 1)}

    def test_first_put_file_count_is_a_proper_prefix(self, spark, sf_dir):
        import os as _os

        from akka_streams_kinesis_spark.operators.streaming_queries import (
            _ann_upsert_stream,
            _first_put_file_count,
        )

        stream = _ann_upsert_stream(spark, sf_dir)
        total = sum(
            1
            for _, _, files in _os.walk(stream.data_dir)
            for f in files
            if f.endswith(".parquet")
        )
        n0 = _first_put_file_count(stream)
        assert 0 < n0 < total

    def test_anchorless_search_schema(self, spark, sf_dir):
        from akka_streams_kinesis_spark.operators.streaming_queries import (
            _TT_SEARCH_COLS,
            _ensure_standing_index,
            _standing_search,
        )

        root = _ensure_standing_index(spark, sf_dir)
        df = _standing_search(spark, root, anchor=False)
        assert tuple(df.columns) == _TT_SEARCH_COLS

    def test_time_travel_versions_differ_on_flipped_queries(
        self, spark, sf_dir
    ):
        """Queries 0 and 7 are vec_id % 7 == 0, so their vectors flip
        between v1 and v2 — the two versions' rankings must not be
        identical, and unflipped queries' CANDIDATE CELLS (their own c8)
        stay put."""
        from akka_streams_kinesis_spark.operators.streaming_queries import (
            similarity_standing_index_time_travel,
        )

        rows = similarity_standing_index_time_travel(spark, sf_dir).collect()
        assert len(rows) > 0
        by_v = {
            v: sorted(
                (r["query_id"], r["rnk"], r["vec_id"])
                for r in rows
                if r["version"] == v
            )
            for v in (1, 2)
        }
        assert set(by_v) == {1, 2} and by_v[1] != by_v[2]

    def test_time_travel_raises_on_tampered_serving_record(
        self, spark, sf_dir, tmp_path, monkeypatch
    ):
        """The replay-equals-served raise is armed: corrupt one served
        row (on a COPY of the cached build) and the query must refuse."""
        import pyarrow.parquet as _pq

        from akka_streams_kinesis_spark.operators import streaming_queries as sq

        src_root, _src_served = sq._ensure_tt_index(spark, sf_dir)
        base = str(tmp_path / "tt_tampered")
        shutil.copytree(os.path.dirname(src_root), base)
        served = os.path.join(base, "served")
        p = next(
            os.path.join(d, f)
            for d, _, files in os.walk(served)
            for f in files
            if f.endswith(".parquet")
        )
        t = _pq.read_table(p)
        vec = t["vec_id"].to_pylist()
        vec[0] = -12345
        idx = t.schema.get_field_index("vec_id")
        t = t.set_column(
            idx, "vec_id", pa.array(vec, t.schema.field("vec_id").type)
        )
        _pq.write_table(t, p)
        for d, _, files in os.walk(served):
            # stale Hadoop checksum sidecars from the copy would turn the
            # tamper into a read error instead of a divergence
            for crc in files:
                if crc.endswith(".crc"):
                    os.remove(os.path.join(d, crc))

        real = sq._stream_cache_dir

        def _redirect(sf, flavor):
            if flavor == "annidx_timetravel_v2":
                return base
            return real(sf, flavor)

        monkeypatch.setattr(sq, "_stream_cache_dir", _redirect)
        with pytest.raises(RuntimeError, match="diverges"):
            sq.similarity_standing_index_time_travel(spark, sf_dir).collect()

    def test_serving_record_is_replay_idempotent(
        self, spark, sf_dir, tmp_path
    ):
        """At-least-once foreachBatch redelivery: a crash between the
        serve and the merge commit replays the batch — the replayed
        serve reads the SAME committed snapshot (the merge hadn't
        committed) and must overwrite, not duplicate, its record."""
        from akka_streams_kinesis_spark.operators.streaming_queries import (
            _ensure_tt_index,
            _read_served,
            _serve_and_record,
        )

        src_root, src_served = _ensure_tt_index(spark, sf_dir)
        root = str(tmp_path / "replay_index")
        served = str(tmp_path / "replay_served")
        shutil.copytree(src_root, root)
        shutil.copytree(src_served, served)
        # pin the index back to v1 (what batch 1 saw mid-drain): replays
        # of batch 1 re-read v1 because v2's commit never happened
        mdir = os.path.join(root, "_manifest")
        with open(os.path.join(mdir, "LATEST"), "w") as f:
            f.write("1")
        before = sorted(map(tuple, _read_served(spark, served).collect()))
        _serve_and_record(spark, root, served, 1)  # replay once
        _serve_and_record(spark, root, served, 1)  # and again
        after = sorted(map(tuple, _read_served(spark, served).collect()))
        assert after == before

    def test_time_travel_outside_retention_raises(self, spark, sf_dir, tmp_path):
        """vacuum(retain=1) reclaims v1's manifest and superseded files:
        a reader pinning the vacuumed version must get the explicit
        missing-manifest raise (never a partial read), while the
        retained latest stays fully readable."""
        from akka_streams_kinesis_spark.operators.streaming_queries import (
            _ensure_tt_index,
        )

        src_root, _ = _ensure_tt_index(spark, sf_dir)
        root = str(tmp_path / "vacuumed_tt")
        shutil.copytree(src_root, root)
        stats = vacuum(root, retain=1)
        assert stats["retained_versions"] == [2]
        with pytest.raises(RuntimeError, match="manifest v1 missing"):
            load_snapshot(root, 1)
        assert load_snapshot(root).version == 2
        assert read_store(spark, root).count() > 0
