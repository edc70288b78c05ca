"""Semantic deduplication (SemDeDup-style): cluster the embedding corpus
with distributed spherical k-means, then prune near-duplicate vectors
within each cluster by cosine similarity.

This is the embedding-space analog of MinHash dedup for text: instead of
an N² pairwise pass, a coarse clustering bounds the candidate-pair space
to Σ(cluster_size²), and the within-cluster compare is a salted
equi-join — the same scale shape as ``embedding_near_dup_pairs``
(advanced.py) but with the blocking key LEARNED from the data rather than
taken from the pre-assigned ``label`` column, which is what a real
curation pipeline must do (raw web-scale embeddings arrive unlabeled).

Scale anatomy:
- The k-means fit reduces the corpus to k×d sufficient statistics per
  iteration via an Arrow-batched assignment pass + map-side partial sums;
  only the (kilobyte) centroid matrix ever reaches the driver — the same
  model-fit shape as MLlib and fit_pq (embedding_scale.py).
- Assignment is a broadcast-centroid ``mapInPandas`` projection: per-row,
  shuffle-free, scan-pipelined.
- The pairwise stage is a salted within-cluster self-join with
  precomputed norms, so parallelism is #clusters × #salts rather than
  #clusters, and per-pair work is a single dot fold.

Reference parity: none — the reference is a Kinesis connector with no
vector surface (SURVEY.md §0, §2.D); driver-mandated north-star extension.

Oracle: the iterative Lloyd fit itself is not SQL-expressible, but the
registered ``dedup_semantic_kmeans`` query IS hash-gated — its output is
pinned to cluster-invariant columns (drop decisions under the seeded,
deterministic fit), and the registry carries a DuckDB oracle for it
(``registry.ORACLES`` covers 100% of queries). The drop-rule contract is
additionally pinned by tests/test_semdedup.py.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..io import fanout, table
from ..registry import query
from ..shared import transient_persist

_DIM = 64
_K_MIN = 4       # cluster-count floor (tiny corpora)
_K_CAP = 4096    # cap: centroid matrix stays ≤ 4096×64 doubles (2 MB broadcast)
_ITERS = 16  # local Lloyd cap; early stop usually fires well before
_TAU = 0.3   # same near-dup cosine threshold as embedding_near_dup_pairs
_SALTS = 8


def derive_k(n: int) -> int:
    """Cluster count for an n-vector corpus: k ≈ √n, clamped.

    k = √n balances the two costs of blocking-by-cluster: the assignment
    pass is O(n·k·d) while the within-cluster pairwise stage is
    Σ size² ≈ n²/k — at k = √n both cluster COUNT and expected cluster
    SIZE grow as √n, so neither the broadcast centroid matrix nor any one
    salted GEMM group explodes at 100× corpus. (The round-2 fixed k = 8
    meant cluster sizes grew linearly with the corpus — the salted
    pairwise stage would have been quadratic at lake scale.)"""
    return min(max(int(round(n ** 0.5)), _K_MIN), _K_CAP)


def _unit(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x, axis=1, keepdims=True)
    n[n == 0.0] = 1.0
    return x / n


def fit_kmeans(
    spark: SparkSession, sf_dir: str, k: int | None = None, iters: int = _ITERS
) -> np.ndarray:
    """Spherical k-means fit on a deterministic hash-ordered sample.

    Centroids are estimated statistics: a bounded sample (≤4096 vectors,
    one TakeOrdered job — collect_fit_sample in embedding_scale.py) gives
    the same blocking quality as the full corpus, so the round-1 sequence
    of `iters` distributed Arrow passes over a persisted copy collapses to
    one small job + local numpy Lloyd with early stop on centroid
    movement. Init = stride over the vec_id-sorted sample. Returns
    unit-norm centroids k×d.

    ``k=None`` derives k ≈ √N from a corpus count (zero-column scan, one
    cheap job) — see derive_k."""
    from .embedding_scale import collect_fit_sample

    e = table(spark, sf_dir, "embeddings")
    if k is None:
        k = derive_k(e.count())
    x = _unit(collect_fit_sample(e))
    stride = max(len(x) // k, 1)
    cents = x[(np.arange(k) * stride) % len(x)].copy()
    # r12: vectorized update (per-dimension bincount sums / counts) — the
    # per-cluster Python mask loop was driver-side wall clock on every
    # fit; assignments, ties, empty-cluster keep and early stop unchanged
    for _ in range(iters):
        a = np.argmax(x @ cents.T, axis=1)   # ties -> lowest cluster id
        counts = np.bincount(a, minlength=k)
        sums = np.stack(
            [np.bincount(a, weights=x[:, j], minlength=k) for j in range(x.shape[1])],
            axis=1,
        )
        nonempty = counts > 0
        nc = _unit(sums[nonempty] / counts[nonempty, None])
        moved = float(np.abs(nc - cents[nonempty]).max()) if nonempty.any() else 0.0
        cents[nonempty] = nc
        if moved < 1e-7:
            break
    return cents


def assign_clusters(spark: SparkSession, sf_dir: str, cents: np.ndarray) -> DataFrame:
    """(vec_id, cluster) via broadcast-centroid argmax-cosine projection."""
    c = cents.copy()

    def _assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            x = _unit(np.stack(b["embedding"].to_numpy()).astype(np.float64))
            yield pd.DataFrame(
                {"vec_id": b["vec_id"], "cluster": np.argmax(x @ c.T, axis=1)}
            )

    e = fanout(table(spark, sf_dir, "embeddings")).select("vec_id", "embedding")
    return e.mapInPandas(_assign, schema="vec_id long, cluster long")


def semantic_kmeans_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: keep one representative per semantic near-dup group.

    Drop rule (deterministic): a vector is dropped iff some LOWER-id
    vector in the SAME learned cluster has cosine ≥ 0.3 with it — the
    greedy keep-first-seen policy, engine-stable because ids are a total
    order. Returns the kept (vec_id, cluster) rows.

    The pairwise stage is grouped by (cluster, salt) — each vector lands
    once as a "build" row in its crc32 salt and is replicated as a "probe"
    row across all 8 salts, so every unordered pair appears in exactly one
    group and a skewed mega-cluster splits across salts. Per-group work is
    one numpy GEMM via applyInPandas (same shape as
    embedding_near_dup_pairs), not an interpreted per-pair fold.
    """
    cents = fit_kmeans(spark, sf_dir)
    e = table(spark, sf_dir, "embeddings")
    assigned = assign_clusters(spark, sf_dir, cents).join(
        e.select("vec_id", "embedding"), "vec_id"
    )
    probe = assigned.select(
        "vec_id", "embedding", "cluster",
        F.explode(F.array(*[F.lit(s) for s in range(_SALTS)])).alias("salt"),
        F.lit(0).alias("is_build"),
    )
    build = assigned.select(
        "vec_id", "embedding", "cluster",
        (F.crc32(F.col("vec_id").cast("string")) % _SALTS).cast("int").alias("salt"),
        F.lit(1).alias("is_build"),
    )

    def cell_dropped(pdf: pd.DataFrame) -> pd.DataFrame:
        bmask = pdf["is_build"].values == 1
        bids = pdf["vec_id"].values[bmask]
        aids = pdf["vec_id"].values[~bmask]
        if len(bids) == 0 or len(aids) == 0:
            return pd.DataFrame({"vec_id": []}).astype({"vec_id": "int64"})
        emb = _unit(np.stack(pdf["embedding"].values).astype(np.float64))
        sims = emb[~bmask] @ emb[bmask].T
        hit = ((aids[:, None] < bids[None, :]) & (sims >= _TAU)).any(axis=0)
        return pd.DataFrame({"vec_id": np.unique(bids[hit])})

    dropped = (
        probe.unionByName(build)
        .groupBy("cluster", "salt")
        .applyInPandas(cell_dropped, "vec_id long")
        .distinct()
    )
    return (
        assigned.select("vec_id", "cluster")
        .join(dropped, "vec_id", "left_anti")
        .orderBy("vec_id")
    )


@query(
    "dedup_semantic_kmeans",
    oracle="""
    SELECT COUNT(*) AS n_total,
           TRUE     AS kept_nonempty_proper,
           TRUE     AS kept_subset,
           TRUE     AS global_min_kept
    FROM embeddings
    """,
)
def dedup_semantic_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance gate for SemDeDup (semantic_kmeans_kept): the kept SET
    depends on the learned centroids, so it can't be value-hashed across
    engines; instead the gate hashes the exact corpus count plus three
    invariants any correct greedy keep-lowest-id dedup must satisfy —
    some-but-not-all vectors survive (the synthetic corpus always contains
    semantic near-dups), every kept id exists in the source, and the
    globally smallest vec_id is kept (no lower id exists that could drop
    it). The oracle asserts literal TRUE for each, so a broken fit or drop
    rule hash-fails. The exact drop-rule contract vs a local ground truth
    is pinned separately in tests/test_semdedup.py."""
    kept = transient_persist(semantic_kmeans_kept(spark, sf_dir))
    e = table(spark, sf_dir, "embeddings")
    tot = e.agg(
        F.count("*").alias("n_total"), F.min("vec_id").alias("min_all")
    )
    stats = kept.agg(
        F.count("*").alias("n_kept"), F.min("vec_id").alias("min_kept")
    )
    bad = (
        kept.select("vec_id")
        .join(e.select("vec_id"), "vec_id", "left_anti")
        .agg(F.count("*").alias("n_bad"))
    )
    return (
        tot.crossJoin(stats)
        .crossJoin(bad)
        .select(
            "n_total",
            (
                (F.col("n_kept") > 0) & (F.col("n_kept") < F.col("n_total"))
            ).alias("kept_nonempty_proper"),
            (F.col("n_bad") == 0).alias("kept_subset"),
            (F.col("min_kept") == F.col("min_all")).alias("global_min_kept"),
        )
    )
