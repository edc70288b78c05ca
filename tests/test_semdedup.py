"""Property tests for SemDeDup (no SQL oracle — iterative k-means fit).
The drop-rule contract is recomputed exactly in numpy from the same
cluster assignments and compared set-for-set.
"""

from __future__ import annotations

import numpy as np

from akka_streams_kinesis_spark import registry
from akka_streams_kinesis_spark.io import table
from akka_streams_kinesis_spark.operators.semdedup import (
    _TAU,
    assign_clusters,
    derive_k,
    fit_kmeans,
    semantic_kmeans_kept,
)

registry.load_all()


def test_derive_k_scales_as_sqrt_with_clamps():
    assert derive_k(1) == 4          # floor
    assert derive_k(10_000) == 100
    assert derive_k(10**9) == 4096   # cap
    # monotone non-decreasing across scales
    ks = [derive_k(n) for n in (100, 10_000, 1_000_000, 10**8)]
    assert ks == sorted(ks)


def test_centroids_unit_norm_and_deterministic(spark, sf_dir):
    c1 = fit_kmeans(spark, sf_dir)
    c2 = fit_kmeans(spark, sf_dir)
    n = table(spark, sf_dir, "embeddings").count()
    assert c1.shape == (derive_k(n), 64)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0, atol=1e-9)
    assert np.allclose(c1, c2, atol=1e-9), "fit must be run-to-run deterministic"


def test_kept_set_matches_numpy_recompute(spark, sf_dir):
    cents = fit_kmeans(spark, sf_dir)
    clusters = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters(spark, sf_dir, cents).collect()
    }
    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in table(spark, sf_dir, "embeddings").collect()
    }
    # exact drop rule: dropped iff a lower-id same-cluster vec has cos >= TAU
    dropped = set()
    ids = sorted(emb)
    x = np.stack([emb[i] for i in ids])
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    cos = xn @ xn.T
    for bi, b in enumerate(ids):
        for ai, a in enumerate(ids[:bi]):
            if clusters[a] == clusters[b] and cos[ai, bi] >= _TAU:
                dropped.add(b)
                break
    want_kept = {i for i in ids if i not in dropped}

    rows = semantic_kmeans_kept(spark, sf_dir).collect()
    got_kept = {r["vec_id"] for r in rows}
    assert got_kept == want_kept
    assert all(clusters[r["vec_id"]] == r["cluster"] for r in rows)
    assert 0 < len(got_kept) < len(ids), "some but not all vectors deduped"
