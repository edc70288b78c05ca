"""Incrementally-maintained IVF (inverted-file) ANN index: streaming
embedding upserts → foreachBatch cell re-assignment, cell-stats refresh,
and hot-cell splits against a cell-partitioned parquet index.

This is the vector-store refresh pattern every production retrieval
pipeline needs (round-9 VERDICT ask #4): the per-query IVF builds in
`operators/similarity.py` / `operators/embedding_scale.py` construct the
index from scratch each run; here the index is a STANDING table that a
stream of new/changed vectors keeps current, with per-batch cost
O(touched cells), never O(corpus).

Index layout (three parquet tables):

- ``store``   — (vec_id, seq, code) partitioned by ``c8`` (the 8-bit
  coarse cell). ``code`` is the vector's 12-bit sign code: bit i =
  (embedding[i] >= 0), the same deterministic coarse quantizer as
  similarity_ann_ivf, extended by 4 refinement bits for splits.
- ``idmap``   — (vec_id, seq, c8) partitioned by ``idb`` (vec_id % 16):
  the id→cell sidecar that makes "which cell does this vector currently
  live in" a partition-pruned O(touched id-buckets) lookup instead of a
  full index scan — the reason real vector stores keep one.
- ``directory`` — (cell, depth, n_vecs) partitioned by ``c8``: the cell
  directory after hot-cell splitting. A coarse cell whose subtree holds
  more than ``CAP`` vectors splits by extending the sign code one bit at
  a time (depth 8 → up to 12); a vector's cell is the SHORTEST prefix of
  its code whose subtree count is ≤ CAP (or the full 12 bits). Split
  decisions for a prefix depend only on vectors sharing its 8-bit
  prefix, so a batch refreshes exactly the touched coarse subtrees.

Canonical-assignment invariant (the rebuild-equivalence gate): the cell
assignment is a pure function of the final corpus MULTISET — counts per
prefix are corpus-wide facts, not arrival-order artifacts — so after any
sequence of upsert batches (in any chopping, with at-least-once
redelivery) the directory must equal the one a full from-scratch rebuild
of the final corpus produces. ``stream_ann_index_upsert`` asserts exactly
that, and its DuckDB oracle IS an independent full rebuild.

Scale shape per batch: one partition-pruned idmap read (touched
id-buckets), one partition-pruned store read (touched cells = old ∪ new
coarse cells of the batch's vectors), latest-wins by ``seq`` (associative
/ commutative / idempotent → micro-batch-chopping- and replay-proof),
dynamic-partition-overwrite of the touched partitions, and a counts
refresh over just those subtrees. The per-depth subtree counts join back
via BROADCAST (≤ 2^12 rows regardless of corpus size) — the corpus is
never shuffled.

Reference parity: none (SURVEY §2.D north-star); the replay discipline
mirrors tests/test_pyds_source.py's reshard-follow model applied to
index state, per the round-9 verdict.
"""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.streaming import StreamingQuery

COARSE_BITS = 8     # depth of the always-present coarse cell (256 cells)
MAX_BITS = 12       # deepest split (16 leaves per coarse subtree)
CELL_CAP = 4        # split a cell when its subtree exceeds this count
_N_ID_BUCKETS = 16


def _coarse(code_col: str) -> F.Column:
    """Partition value of a code: 'b' + first 8 bits. The alphabetic
    prefix is LOAD-BEARING: a bare bit-string like '01010101' round-trips
    through parquet partition-directory names as an INTEGER (partition
    column type inference), silently dropping leading zeros and merging
    distinct cells — exactly the class of bug the self-check caught on
    first run (30 duplicate vec_ids after a drain)."""
    return F.concat(F.lit("b"), F.substring(code_col, 1, COARSE_BITS))


def sign_code(emb_col: str, flip: F.Column | None = None) -> F.Column:
    """The 12-bit sign code of an array column: bit i = (emb[i] >= 0),
    or (emb[i] <= 0) where ``flip`` is true (a negated-vector update
    without materializing the negated array; −0.0 and +0.0 agree in
    either direction, so the code is exact under JSON float round-trip)."""
    bits = []
    for i in range(MAX_BITS):
        pos = F.expr(f"{emb_col}[{i}] >= 0")
        if flip is not None:
            neg = F.expr(f"{emb_col}[{i}] <= 0")
            bit = F.when(flip, neg).otherwise(pos)
        else:
            bit = pos
        bits.append(F.when(bit, "1").otherwise("0"))
    return F.concat(*bits)


def assign_cells(coded: DataFrame) -> DataFrame:
    """(…, code) → (…, cell, depth): the canonical hot-cell-split
    assignment. Per-depth subtree counts are tiny aggregates (≤ 2^depth
    rows) joined back by broadcast — no corpus shuffle at any scale."""
    df = coded
    for d in range(COARSE_BITS, MAX_BITS):
        prefix = F.substring("code", 1, d)
        counts = (
            df.groupBy(prefix.alias(f"_p{d}"))
            .agg(F.count("*").alias(f"_n{d}"))
        )
        df = df.join(
            F.broadcast(counts), prefix == F.col(f"_p{d}"), "left"
        ).drop(f"_p{d}")
    cell = F.col("code")
    for d in range(MAX_BITS - 1, COARSE_BITS - 1, -1):
        cell = F.when(
            F.col(f"_n{d}") <= CELL_CAP, F.substring("code", 1, d)
        ).otherwise(cell)
    out = df.withColumn("cell", cell).withColumn(
        "depth", F.length("cell").cast("int")
    )
    return out.drop(*[f"_n{d}" for d in range(COARSE_BITS, MAX_BITS)])


def _latest(df: DataFrame) -> DataFrame:
    w = Window.partitionBy("vec_id").orderBy(F.col("seq").desc(), F.col("code"))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _has_partitions(path: str, prefix: str) -> bool:
    return os.path.isdir(path) and any(
        e.startswith(prefix + "=") for e in os.listdir(path)
    )


def _overwrite_partitions(df: DataFrame, path: str, part_col: str) -> None:
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(part_col)
        .parquet(path)
    )


def start_ann_index(
    upserts: DataFrame, root: str, checkpoint: str
) -> StreamingQuery:
    """Start maintaining the IVF index under ``root`` from a stream of
    (vec_id, seq, code) upserts; availableNow trigger, so awaiting
    termination drains the current backlog. Latest-wins by ``seq``."""
    spark = upserts.sparkSession
    store = os.path.join(root, "store")
    idmap = os.path.join(root, "idmap")
    directory = os.path.join(root, "directory")

    def _merge(batch_df: DataFrame, _batch_id: int) -> None:
        batch = _latest(batch_df).select(
            "vec_id",
            "seq",
            "code",
            _coarse("code").alias("c8"),
            (F.col("vec_id") % _N_ID_BUCKETS).alias("idb"),
        )
        batch = batch.persist()
        try:
            # touched cells = new cells of the batch ∪ current cells of
            # the batch's vec_ids (id→cell sidecar, partition-pruned to
            # the touched id-buckets) — ONE distinct-collect job for
            # both sides (bounded: ≤ 2 × 256 coarse-cell strings)
            touched_src = batch.select("c8")
            if _has_partitions(idmap, "idb"):
                touched_idb = batch.select("idb").distinct()
                prior = (
                    spark.read.option("basePath", idmap)
                    .parquet(idmap)
                    .join(F.broadcast(touched_idb), "idb")
                    .join(
                        F.broadcast(batch.select("vec_id")), "vec_id", "leftsemi"
                    )
                )
                touched_src = touched_src.unionByName(prior.select("c8"))
            touched = sorted(
                r["c8"] for r in touched_src.distinct().collect()
            )

            merged = batch.select("vec_id", "seq", "code", "c8")
            if _has_partitions(store, "c8"):
                touched_df = spark.createDataFrame(
                    [(c,) for c in touched], "c8 string"
                )
                existing = (
                    spark.read.option("basePath", store)
                    .parquet(store)
                    .join(F.broadcast(touched_df), "c8")
                    .select("vec_id", "seq", "code", "c8")
                )
                merged = _latest(existing.unionByName(merged))
                # a vector that MOVED coarse cells keeps only its newest
                # row; its old cell's partition (∈ touched) is rewritten
                # without it below
                merged = merged.withColumn("c8", _coarse("code"))
            merged = merged.persist()
            _overwrite_partitions(merged, store, "c8")
            # idmap upsert: the sidecar gets its OWN latest-wins merge
            # against the touched id-buckets' existing contents — writing
            # just this batch's rows would dynamic-overwrite whole idb
            # partitions and silently drop earlier batches' entries in
            # them (the first-drain bug: later lookups then miss the old
            # cell of a moved vector and its stale row survives)
            id_upserts = batch.select("vec_id", "seq", "c8", "idb")
            if _has_partitions(idmap, "idb"):
                id_existing = (
                    spark.read.option("basePath", idmap)
                    .parquet(idmap)
                    .join(F.broadcast(batch.select("idb").distinct()), "idb")
                    .select("vec_id", "seq", "c8", "idb")
                )
                w_id = Window.partitionBy("vec_id").orderBy(
                    F.col("seq").desc(), F.col("c8")
                )
                id_upserts = (
                    id_existing.unionByName(id_upserts)
                    .withColumn("_rn", F.row_number().over(w_id))
                    .filter(F.col("_rn") == 1)
                    .drop("_rn")
                )
            _overwrite_partitions(id_upserts, idmap, "idb")
            # refresh the directory for the touched coarse subtrees only:
            # split decisions for a prefix involve only vectors sharing
            # its coarse prefix, so untouched subtrees stay valid
            refreshed = (
                assign_cells(merged)
                .groupBy("c8", "cell", "depth")
                .agg(F.count("*").alias("n_vecs"))
            )
            _overwrite_partitions(refreshed, directory, "c8")
            # dynamic overwrite cannot rewrite a partition to EMPTY: a
            # coarse cell drained of its last vector keeps stale files
            # unless removed explicitly (bounded driver work: ≤ touched
            # cells per batch, pure metadata)
            nonempty = {r["c8"] for r in merged.select("c8").distinct().collect()}
            for c8 in set(touched) - nonempty:
                for tbl in (store, directory):
                    part = os.path.join(tbl, f"c8={c8}")
                    if os.path.isdir(part):
                        shutil.rmtree(part)
            merged.unpersist()
        finally:
            batch.unpersist()

    return (
        upserts.writeStream.foreachBatch(_merge)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def read_directory(spark, root: str) -> DataFrame:
    return (
        spark.read.option(
            "basePath", os.path.join(root, "directory")
        )
        .parquet(os.path.join(root, "directory"))
        .select("cell", "depth", "n_vecs")
    )


def read_store(spark, root: str) -> DataFrame:
    return (
        spark.read.option("basePath", os.path.join(root, "store"))
        .parquet(os.path.join(root, "store"))
        .select("vec_id", "seq", "code")
    )
