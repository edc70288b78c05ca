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

No DuckDB oracle (iterative Lloyd fit is not SQL-expressible); the driver
records the rows-only check and the drop-rule contract is pinned exactly
by tests/test_semdedup.py.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..io import fanout, table
from ..registry import query

_DIM = 64
_K = 8
_ITERS = 4
_TAU = 0.3   # same near-dup cosine threshold as embedding_near_dup_pairs
_SALTS = 8


def _unit(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x, axis=1, keepdims=True)
    n[n == 0.0] = 1.0
    return x / n


def fit_kmeans(
    spark: SparkSession, sf_dir: str, k: int = _K, iters: int = _ITERS
) -> np.ndarray:
    """Distributed spherical k-means on L2-normalized embeddings.

    Deterministic stride init (k vectors spread across the id range);
    each Lloyd iteration is one Arrow-batched assignment + partial-sum
    pass whose output is #tasks rows of (cluster, n, Σx) — the k×d update
    happens driver-side on kilobytes. Returns unit-norm centroids k×d.
    """
    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n_vecs = e.count()
    stride = max(n_vecs // k, 1)
    init = (
        e.filter((F.col("vec_id") % stride == 0) & (F.col("vec_id") < stride * k))
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )[:k]
    cents = _unit(np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in init]))

    schema = "cluster long, n long, s array<double>"

    def _partials(c: np.ndarray):
        def _f(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for b in batches:
                if len(b) == 0:
                    continue
                x = _unit(np.stack(b["embedding"].to_numpy()).astype(np.float64))
                a = np.argmax(x @ c.T, axis=1)   # ties -> lowest cluster id
                out = {"cluster": [], "n": [], "s": []}
                for j in np.unique(a):
                    m = a == j
                    out["cluster"].append(int(j))
                    out["n"].append(int(m.sum()))
                    out["s"].append(x[m].sum(axis=0))
                yield pd.DataFrame(out)

        return _f

    ef = fanout(e).select("embedding").persist()
    try:
        # first iteration materializes the cache; later ones reuse it
        for _ in range(iters):
            parts = ef.mapInPandas(_partials(cents.copy()), schema=schema).collect()
            n = np.zeros(k)
            s = np.zeros((k, _DIM))
            for r in parts:
                n[r["cluster"]] += r["n"]
                s[r["cluster"]] += np.asarray(r["s"])
            nonempty = n > 0
            cents[nonempty] = _unit(s[nonempty] / n[nonempty][:, None])
    finally:
        ef.unpersist()
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


@query("dedup_semantic_kmeans")  # no oracle: iterative k-means model fit
def dedup_semantic_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: keep one representative per semantic near-dup group.

    Drop rule (deterministic): a vector is dropped iff some LOWER-id
    vector in the SAME learned cluster has cosine ≥ 0.3 with it — the
    greedy keep-first-seen policy, engine-stable because ids are a total
    order. Returns the kept (vec_id, cluster) rows.

    The pairwise stage joins only within clusters, salted ×8 so task
    parallelism is clusters×salts and a skewed mega-cluster splits across
    salts; norms are folded once per vector, not per pair.
    """
    from .similarity import _fold

    cents = fit_kmeans(spark, sf_dir)
    e = table(spark, sf_dir, "embeddings")
    assigned = (
        assign_clusters(spark, sf_dir, cents)
        .join(e.select("vec_id", "embedding"), "vec_id")
        .select(
            "vec_id", "cluster", "embedding",
            _fold("embedding", "embedding").alias("nrm2"),
        )
    )
    a = assigned.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"),
        "cluster", F.col("nrm2").alias("nrm2_a"),
        F.explode(F.array(*[F.lit(s) for s in range(_SALTS)])).alias("salt"),
    )
    b = assigned.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"),
        F.col("cluster").alias("cluster_b"), F.col("nrm2").alias("nrm2_b"),
        (F.crc32(F.col("vec_id").cast("string")) % _SALTS).cast("int").alias("salt_b"),
    )
    sim = _fold("emb_a", "emb_b") / (F.sqrt(F.col("nrm2_a")) * F.sqrt(F.col("nrm2_b")))
    dropped = (
        a.join(
            b,
            (F.col("cluster") == F.col("cluster_b"))
            & (F.col("salt") == F.col("salt_b"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .filter(sim >= _TAU)
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
    )
    return (
        assigned.select("vec_id", "cluster")
        .join(dropped, "vec_id", "left_anti")
        .orderBy("vec_id")
    )
