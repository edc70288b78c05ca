"""Manifest-committed snapshot storage — the generic layer under every
standing index this engine maintains (`ann_index` for vectors,
`dedup_index` for MinHash-LSH signatures).

One standing index = a set of parquet TABLES under a common ``root``,
each partitioned by key columns, plus a ``_manifest`` directory of tiny
JSON files. The contract (established for the ANN index in round 12 and
factored out here so the dedup index shares it verbatim):

- Data files are VERSIONED: a batch at version N writes
  ``part-v{N}.parquet`` into each touched partition directory and never
  mutates a committed file.
- A single JSON manifest ``_manifest/v{N}.json`` maps every live
  partition of every table to its current file; the ``LATEST`` pointer
  flip is the batch's one atomic commit point. Readers resolve
  LATEST → manifest → explicit file list, so a reader concurrent with
  an in-flight batch sees the mutually-consistent pre-batch snapshot,
  and a crash before the pointer flip leaves the committed snapshot
  untouched (the replay re-derives the version and overwrites orphans).
- A partition drained of its last row is REMOVED from the manifest (no
  zero-row files, no rmtree); superseded files wait for a VACUUM pass.
- All filesystem access routes through ``pyarrow.fs`` resolved from the
  root URI — bare paths and ``file:`` use LocalFileSystem with
  same-directory temp+rename, object-store schemes write final keys
  directly (PUT-on-close is atomic there; renames are copies).

Single-writer, many-reader: one foreachBatch drain (or maintenance
pass) commits at a time — the streaming runtime serializes
micro-batches — while readers never block it.

Reference parity: none (SURVEY §2.D north-star infrastructure); the
read-while-write contract mirrors the reference source's rule that
maintenance never blocks reads (KinesisSource.scala:229-235 keeps
emitting during reshard).
"""

from __future__ import annotations

import json
import posixpath

import pyspark.sql.functions as F  # noqa: F401  (re-export convenience)
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

MANIFEST_DIR = "_manifest"
PKEY = "__pkey"
TOMB = "_tomb"


# ---------------------------------------------------------------------------
# filesystem layer — everything routes through pyarrow.fs
# ---------------------------------------------------------------------------

_FS_FACTORIES: dict[str, object] = {}


def register_fs_factory(scheme: str, factory) -> None:
    """Register ``factory() -> pyarrow.fs.FileSystem`` for a URI scheme —
    the test seam that lets the object-store branch run against pyarrow's
    in-memory mock filesystem without network. In-process only (Spark
    python workers import the module fresh), which is fine: the mock
    branch is exercised by driving the writer/manifest functions
    directly."""
    _FS_FACTORIES[scheme] = factory


def resolve_fs(root: str):
    """(filesystem, path-within-filesystem, is_local) for a root that is
    a bare path, a ``file:`` URI, or an object-store URI. ``s3a``/``s3n``
    (Hadoop spellings) map to pyarrow's ``s3``."""
    from pyarrow import fs as pafs

    if "://" in root:
        scheme, rest = root.split("://", 1)
        if scheme in _FS_FACTORIES:
            return _FS_FACTORIES[scheme](), rest, False
        if scheme in ("s3a", "s3n"):
            root = "s3://" + rest
        fs, path = pafs.FileSystem.from_uri(root)
        return fs, path, isinstance(fs, pafs.LocalFileSystem)
    if root.startswith("file:"):
        return pafs.LocalFileSystem(), root[len("file:"):], True
    return pafs.LocalFileSystem(), root, True


def fs_write_atomic(fs, local: bool, path: str, data: bytes) -> None:
    """Atomically publish ``data`` at ``path``: same-directory temp +
    rename on a local filesystem (rename replaces), direct PUT elsewhere
    (object-store writes are atomic on close and renames are copies)."""
    import uuid

    parent = posixpath.dirname(path)
    fs.create_dir(parent, recursive=True)
    if local:
        tmp = posixpath.join(parent, ".tmp-" + uuid.uuid4().hex)
        with fs.open_output_stream(tmp) as out:
            out.write(data)
        fs.move(tmp, path)
    else:
        with fs.open_output_stream(path) as out:
            out.write(data)


def fs_read(fs, path: str) -> bytes | None:
    from pyarrow import fs as pafs

    if fs.get_file_info(path).type == pafs.FileType.NotFound:
        return None
    with fs.open_input_stream(path) as f:
        return f.read()


# ---------------------------------------------------------------------------
# manifest — one tiny JSON per committed version + a LATEST pointer
# ---------------------------------------------------------------------------


def current_version(root: str) -> int | None:
    """Newest committed manifest version, or None for a virgin root."""
    fs, base, _ = resolve_fs(root)
    raw = fs_read(fs, posixpath.join(base, MANIFEST_DIR, "LATEST"))
    return None if raw is None else int(raw.decode())


def commit_manifest(root: str, manifest: dict) -> None:
    """Publish ``manifest`` as version ``manifest['version']`` — the
    batch's single atomic commit point: the version file lands first,
    the LATEST pointer flip is what makes it visible. A crash between
    the two leaves LATEST on the old version; the replay rewrites the
    orphaned version file."""
    fs, base, local = resolve_fs(root)
    v = manifest["version"]
    data = json.dumps(manifest, sort_keys=True).encode()
    mdir = posixpath.join(base, MANIFEST_DIR)
    fs_write_atomic(fs, local, posixpath.join(mdir, f"v{v:08d}.json"), data)
    fs_write_atomic(fs, local, posixpath.join(mdir, "LATEST"), str(v).encode())


def load_manifest(root: str, version: int | None = None) -> dict | None:
    """The newest committed manifest dict (or a pinned older
    ``version``), None for a virgin root. Two tiny reads (LATEST + one
    JSON) — cheap enough to call per query. RAISES if a pinned version
    is named but its manifest file is gone (vacuumed past, or not an
    index root)."""
    fs, base, _ = resolve_fs(root)
    if version is None:
        version = current_version(root)
        if version is None:
            return None
    raw = fs_read(
        fs, posixpath.join(base, MANIFEST_DIR, f"v{version:08d}.json")
    )
    if raw is None:
        raise RuntimeError(
            f"index manifest v{version} missing under {root!r}"
        )
    return json.loads(raw.decode())


def assert_virgin_root(root: str, tables: tuple[str, ...]) -> None:
    """Fail LOUDLY when pointed at a directory that already holds
    FOREIGN data but no manifest (e.g. a table written by a plain Spark
    writer): silently treating it as empty would shadow the existing
    rows forever. Orphaned ``part-v*``/``.tmp-*`` files from a crashed
    FIRST batch are ours and allowed — the replay overwrites them."""
    import re as _re

    from pyarrow import fs as pafs

    fs, base, _ = resolve_fs(root)
    ours = _re.compile(r"(part-v\d{8}\.parquet|\.tmp-[0-9a-f]+)$")
    for tbl in tables:
        sel = pafs.FileSelector(
            posixpath.join(base, tbl), recursive=True, allow_not_found=True
        )
        for info in fs.get_file_info(sel):
            if info.type == pafs.FileType.File and not ours.search(info.path):
                raise RuntimeError(
                    f"{root!r} contains unversioned file {info.path!r} but "
                    f"no manifest — refusing to shadow foreign data"
                )


def manifest_read(
    spark: SparkSession,
    root: str,
    manifest: dict,
    tbl: str,
    schema: StructType,
    keep=None,
) -> DataFrame:
    """Explicit-file-list read of one table of a committed manifest,
    with an EXPLICIT schema: partition columns come from directory
    names, data columns from the files, and a file written before a
    column existed yields nulls for it — deterministic under schema
    evolution, no mergeSchema footer sweep, no partition-discovery job
    (the manifest IS the file index). ``keep(relative_partition_dir)``
    prunes partitions before any filesystem touch."""
    base = posixpath.join(root, tbl)
    paths = [
        posixpath.join(base, key, fname)
        for key, fname in sorted(manifest["tables"][tbl].items())
        if keep is None or keep(key)
    ]
    if not paths:
        # pruned to nothing (or an empty table): an empty frame of the
        # right schema, no filesystem touch
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).option("basePath", base).parquet(*paths)


# ---------------------------------------------------------------------------
# versioned per-partition writer (task-side, pyarrow.fs)
# ---------------------------------------------------------------------------


def write_partition_files(
    batches, root: str, fname: str, drop_cols: tuple[str, ...]
):
    """Task body of :func:`versioned_write` (module-level so the
    object-store branch is unit-testable in-process against a mock
    filesystem): stream Arrow batches into one ``fname`` parquet file
    per distinct ``__pkey`` (the relative partition directory), then
    publish — temp+rename on local filesystems, direct write elsewhere.
    Rows flagged ``_tomb`` register their partition in the report
    WITHOUT contributing data (and without creating a file if nothing
    live lands there): that is how a drained partition gets REMOVED
    from the manifest. Yields one (part, n_rows) report batch."""
    import uuid as _uuid

    import pyarrow as _pa
    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq

    fs, base, local = resolve_fs(root)
    # key -> [writer|None, tmp, final, n_rows, part_dir, schema]
    state: dict[str, list] = {}
    for batch in batches:
        tbl = _pa.Table.from_batches([batch])
        for key in _pc.unique(tbl[PKEY]).to_pylist():
            sub = tbl.filter(_pc.equal(tbl[PKEY], key))
            live = sub.filter(_pc.equal(sub[TOMB], False)).drop_columns(
                list(drop_cols)
            )
            if key not in state:
                part_dir = f"{base}/{key}"
                final = f"{part_dir}/{fname}"
                tmp = (
                    f"{part_dir}/.tmp-{_uuid.uuid4().hex}" if local else final
                )
                state[key] = [None, tmp, final, 0, part_dir, live.schema]
            if live.num_rows:
                st = state[key]
                if st[0] is None:
                    fs.create_dir(st[4], recursive=True)
                    st[0] = _pq.ParquetWriter(st[1], st[5], filesystem=fs)
                st[0].write_table(live)
                st[3] += live.num_rows
    keys, rows = [], []
    for key, (w, tmp, final, n, _pd, _sc) in sorted(state.items()):
        if w is not None:
            w.close()
            if tmp != final:
                fs.move(tmp, final)  # same-directory atomic replace
        keys.append(key)
        rows.append(n)
    if keys:
        yield _pa.RecordBatch.from_arrays(
            [_pa.array(keys, _pa.string()), _pa.array(rows, _pa.int64())],
            names=["part", "n_rows"],
        )


def versioned_write(
    df: DataFrame, table_root: str, part_cols: list[str], version: int
) -> dict[str, int]:
    """Write ``df`` (carrying a ``_tomb`` registration flag) as ONE
    ``part-v{version}.parquet`` file per partition value of
    ``part_cols`` under ``table_root``, via executor-side pyarrow — and
    return {relative partition dir: live row count} for the manifest
    update (bounded: one row per touched partition).

    Why not ``partitionOverwriteMode=dynamic``: its job commit renames
    one staged directory per touched partition, sequentially, on the
    driver — ~15-20 ms each on a local FS (a round-trip on an object
    store); an upsert batch touching all 256 coarse cells paid ~4-5 s of
    pure commit per write in round 10. Here the repartition-by-key
    shuffle gives every partition value to exactly one task, tasks write
    and publish in parallel, and the MANIFEST (not the filesystem
    listing) is the committed file index — so a crashed task's partial
    file is invisible and a retry simply rewrites it.
    """
    fname = f"part-v{version:08d}.parquet"
    pkey = F.concat_ws(
        "/", *[F.concat(F.lit(f"{c}="), F.col(c).cast("string")) for c in part_cols]
    )
    drop = tuple([PKEY, TOMB, *part_cols])
    prepared = df.withColumn(PKEY, pkey)
    reports = (
        prepared.repartition(F.col(PKEY))
        .mapInArrow(
            lambda it: write_partition_files(it, table_root, fname, drop),
            "part string, n_rows long",
        )
        .collect()
    )
    return {r["part"]: r["n_rows"] for r in reports}


def apply_updates(
    manifest: dict, tbl: str, report: dict[str, int], fname: str
) -> None:
    entries = manifest["tables"][tbl]
    for key, n in report.items():
        if n > 0:
            entries[key] = fname
        else:
            entries.pop(key, None)
