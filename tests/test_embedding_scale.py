"""Property tests for the PCA / product-quantization scale path.

These operators have no SQL oracle (eigendecomposition and Lloyd
iterations aren't SQL-expressible), so their contracts are pinned here:
PCA by the algebraic invariants of the fit, PQ by recall against the
exact brute-force neighbors.
"""

from __future__ import annotations

import numpy as np
import pytest

from akka_streams_kinesis_spark import registry
from akka_streams_kinesis_spark.io import table
from akka_streams_kinesis_spark.operators.embedding_scale import (
    _PCA_K,
    _PQ_K,
    _PQ_M,
    _PQ_QUERIES,
    _PQ_TOPK,
    _assign_codes,
    _codes_for,
    derive_ivf_cells,
    derive_ivf_nprobe,
    fit_pca,
    fit_pq,
    ivf_pq_topk,
    pca_projections,
    pq_topk,
)

registry.load_all()


def test_ivf_cells_scale_as_sqrt_with_clamps():
    assert derive_ivf_cells(1) == 16            # floor
    assert derive_ivf_cells(1_000_000) == 1000
    assert derive_ivf_cells(10**12) == 65536    # cap
    ks = [derive_ivf_cells(n) for n in (500, 10_000, 10**6, 10**10)]
    assert ks == sorted(ks)
    # nprobe tracks the cell count at the pinned recall fraction
    assert derive_ivf_nprobe(16) == 6           # round-2 recall-calibrated point
    assert 0 < derive_ivf_nprobe(1000) <= 1000


def test_pca_components_orthonormal_and_sorted(spark, sf_dir):
    mean, comps, eigvals, total_var = fit_pca(spark, sf_dir)
    gram = comps @ comps.T
    assert np.allclose(gram, np.eye(comps.shape[0]), atol=1e-8)
    assert np.all(np.diff(eigvals) <= 1e-12), "eigenvalues must be descending"
    assert np.all(eigvals >= -1e-10), "covariance eigenvalues must be >= 0"
    # sign canonicalization: largest-|x| coordinate of each component > 0
    for row in comps:
        assert row[int(np.argmax(np.abs(row)))] > 0


def test_pca_projection_variance_matches_eigvals(spark, sf_dir):
    mean, comps, eigvals, total_var = fit_pca(spark, sf_dir)
    df = pca_projections(spark, sf_dir)
    rows = df.collect()
    n_src = table(spark, sf_dir, "embeddings").count()
    assert len(rows) == n_src
    proj = np.array([[r[f"p{i}"] for i in range(_PCA_K)] for r in rows])
    # population variance of each projected coordinate == its eigenvalue
    var = proj.var(axis=0)
    assert np.allclose(var, eigvals, rtol=1e-3, atol=1e-4)
    # projections are centered
    assert np.allclose(proj.mean(axis=0), 0.0, atol=1e-3)


def test_pq_codebook_shape_and_determinism(spark, sf_dir):
    cb1 = fit_pq(spark, sf_dir, iters=1)
    assert cb1.shape == (16, 64, 4)
    assert np.isfinite(cb1).all()


def test_pq_encode_matches_local_reference(spark, sf_dir):
    """_assign_codes (the persistable PQ index encode) must agree exactly
    with the local _codes_for on every vector, and cover the full corpus
    with M codes per vector in [0, K)."""
    cb = fit_pq(spark, sf_dir)
    e = table(spark, sf_dir, "embeddings")
    rows = _assign_codes(e.select("vec_id", "embedding"), cb).collect()
    n_src = e.count()
    assert len(rows) == n_src * _PQ_M
    got = {}
    for r in rows:
        assert 0 <= r["code"] < _PQ_K
        got.setdefault(r["vec_id"], {})[r["sub"]] = r["code"]
    emb = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
           for r in e.collect()}
    ids = sorted(emb)
    local = _codes_for(np.stack([emb[i] for i in ids]), cb)
    for row_idx, vid in enumerate(ids):
        assert [got[vid][m] for m in range(_PQ_M)] == local[row_idx].tolist()


def _recall_vs_bruteforce(spark, sf_dir, rows):
    """Mean recall@k of (query_id, vec_id, rnk) rows vs exact L2 top-k."""
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(_PQ_QUERIES))
    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in table(spark, sf_dir, "embeddings").collect()
    }
    ids = np.array(sorted(emb))
    x = np.stack([emb[i] for i in ids])
    recalls = []
    for q in range(_PQ_QUERIES):
        d = np.linalg.norm(x - emb[q], axis=1)
        d[ids == q] = np.inf
        exact = set(ids[np.argsort(d, kind="stable")[:_PQ_TOPK]].tolist())
        approx = {r["vec_id"] for r in by_q[q]}
        recalls.append(len(exact & approx) / _PQ_TOPK)
    return float(np.mean(recalls)), by_q


def test_ivf_pq_topk_shape_and_recall(spark, sf_dir):
    rows = ivf_pq_topk(spark, sf_dir).collect()
    recall, by_q = _recall_vs_bruteforce(spark, sf_dir, rows)
    for q, rs in by_q.items():
        assert sorted(r["rnk"] for r in rs) == list(range(1, len(rs) + 1))
        assert len(rs) <= _PQ_TOPK
        assert all(r["vec_id"] != q for r in rs)
    # nprobe=4 of 16 cells scans ~1/4 of the corpus; residual PQ + exact
    # rerank keeps most true neighbors — recall floor set accordingly
    assert recall >= 0.6, f"IVF-PQ mean recall@5 too low: {recall}"


def test_pq_topk_shape_and_recall(spark, sf_dir):
    df = pq_topk(spark, sf_dir)
    rows = df.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(_PQ_QUERIES))
    for q, rs in by_q.items():
        assert sorted(r["rnk"] for r in rs) == list(range(1, _PQ_TOPK + 1))
        assert all(r["vec_id"] != q for r in rs)

    # exact brute-force L2 neighbors for recall
    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in table(spark, sf_dir, "embeddings").collect()
    }
    ids = np.array(sorted(emb))
    x = np.stack([emb[i] for i in ids])
    recalls = []
    for q in range(_PQ_QUERIES):
        d = np.linalg.norm(x - emb[q], axis=1)
        d[ids == q] = np.inf
        exact = set(ids[np.argsort(d, kind="stable")[:_PQ_TOPK]].tolist())
        approx = {r["vec_id"] for r in by_q[q]}
        recalls.append(len(exact & approx) / _PQ_TOPK)
    assert np.mean(recalls) >= 0.7, f"mean recall@5 too low: {recalls}"
