"""_MAX_BAND_DF bucket cap on the MinHash-LSH band self-join.

The scale contract: a band bucket with k members must contribute O(k)
candidate rows (star edges), never k·(k-1)/2 — the difference between a
10⁵-copy boilerplate cluster costing 10⁵ rows and 5·10⁹. Three layers:

1. Unit: _capped_band_pairs on synthetic band rows — exact row counts,
   star shape, small-bucket all-pairs untouched.
2. Engine parity when the cap BINDS: a synthetic corpus with a 100-copy
   duplicate cluster (> _MAX_BAND_DF = 64) run through the real
   dedup_minhash_lsh / dedup_minhash_similarity / dedup_cluster_components
   Spark plans AND their DuckDB oracles — both engines must agree on the
   thinned pair set, proving the oracle mirror is exact where it matters.
3. Connectivity: the star-collapsed mega-cluster still resolves to ONE
   connected component of all 100 members.
"""

from __future__ import annotations

import math

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import pyspark.sql.functions as F

from akka_streams_kinesis_spark.operators.dedup import (
    _MAX_BAND_DF,
    _capped_band_pairs,
    dedup_minhash,
    dedup_minhash_similarity,
)
from akka_streams_kinesis_spark.operators.curation import dedup_cluster_components
from akka_streams_kinesis_spark import registry

registry.load_all()


def _bands_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, band_idx int, band_hash string")


def test_mega_bucket_emits_star_not_pairs(spark):
    k = 3 * _MAX_BAND_DF  # 192 members, well over the cap
    rows = [(i, 0, "megabucket") for i in range(10, 10 + k)]
    out = _capped_band_pairs(_bands_df(spark, rows)).collect()
    # linear, not quadratic: exactly k-1 star edges from the min doc_id
    assert len(out) == k - 1
    assert {r.doc_a for r in out} == {10}
    assert {r.doc_b for r in out} == set(range(11, 10 + k))


def test_small_buckets_keep_all_pairs(spark):
    rows = [(i, 1, "smallbucket") for i in range(4)]
    out = _capped_band_pairs(_bands_df(spark, rows)).collect()
    assert len(out) == 6  # C(4,2) — cap does not bind
    assert {(r.doc_a, r.doc_b) for r in out} == {
        (a, b) for a in range(4) for b in range(4) if a < b
    }


def test_mixed_buckets_and_distinct_across_bands(spark):
    k = _MAX_BAND_DF + 10
    rows = [(i, 0, "big") for i in range(k)]
    rows += [(i, 1, "alsobig") for i in range(k)]  # same docs, second band
    rows += [(100_000, 2, "pair"), (100_001, 2, "pair")]
    out = _capped_band_pairs(_bands_df(spark, rows)).collect()
    # both mega-buckets produce the SAME k-1 star edges (min doc is 0 in
    # each) — distinct collapses them; plus the one small-bucket pair
    assert len(out) == (k - 1) + 1
    pairs = {(r.doc_a, r.doc_b) for r in out}
    assert (100_000, 100_001) in pairs
    assert all(a < b for a, b in pairs)


@pytest.fixture(scope="module")
def megadup_dir(tmp_path_factory):
    """Synthetic documents table whose duplicate cluster (100 copies) is
    larger than _MAX_BAND_DF, so the cap binds in every band."""
    assert _MAX_BAND_DF < 100
    n_dup, n_uniq = 100, 20
    texts, ids = [], []
    boiler = (
        "click here to subscribe to our newsletter and never miss an update "
        "from our award winning editorial team every single week"
    )
    for i in range(n_dup):
        ids.append(i)
        texts.append(boiler)
    for j in range(n_uniq):
        ids.append(1000 + j)
        texts.append(
            f"unique document {j} about topic {j * 7} with its own words "
            f"alpha{j} beta{j} gamma{j} delta{j} epsilon{j} zeta{j} eta{j}"
        )
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(ids)),
            "source": pa.array(["web"] * len(ids)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    d = tmp_path_factory.mktemp("megadup")
    pq.write_table(tbl, d / "documents.parquet")
    return str(d)


def _oracle_rows(sf_dir: str, sql: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    return cols, res.fetchall()


def _canon(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.6g}"
    return str(v)


@pytest.mark.parametrize(
    "name", ["dedup_minhash_lsh", "dedup_minhash_similarity", "dedup_cluster_components"]
)
def test_cap_binding_engine_parity(spark, megadup_dir, name):
    sdf = registry.QUERIES[name](spark, megadup_dir)
    srows = sorted(tuple(_canon(v) for v in r) for r in sdf.collect())
    cols, drows_raw = _oracle_rows(megadup_dir, registry.ORACLES[name])
    assert sorted(sdf.columns) == sorted(cols)
    # align column order by name before comparing values
    sorder = sorted(range(len(sdf.columns)), key=lambda i: sdf.columns[i])
    dorder = sorted(range(len(cols)), key=lambda i: cols[i])
    srows = sorted(
        tuple(_canon(r[i]) for i in sorder) for r in sdf.collect()
    )
    drows = sorted(tuple(_canon(r[i]) for i in dorder) for r in drows_raw)
    assert srows == drows, f"{name}: engines disagree when the cap binds"


def test_cap_binding_row_counts_linear(spark, megadup_dir):
    out = dedup_minhash(spark, megadup_dir).collect()
    # 100 identical docs, 4 bands all colliding → star edges only for the
    # dup cluster: 99 rows (not C(100,2)=4950). LSH may also emit a few
    # small-bucket pairs among the unique docs — those are capless by
    # design; the invariant is that NO pair has both ends inside the
    # mega-cluster except the 99 hub edges from doc 0.
    cluster_pairs = [r for r in out if r.doc_a < 100 and r.doc_b < 100]
    assert len(cluster_pairs) == 99
    assert all(r.doc_a == 0 for r in cluster_pairs)


def test_cap_preserves_connectivity(spark, megadup_dir):
    res = dedup_cluster_components(spark, megadup_dir)
    rows = [r for r in res.collect() if r.doc_id < 100]
    # all 100 duplicates in ONE cluster rooted at doc 0, despite the star
    # collapse (hub edges keep every member reachable from every other)
    assert len(rows) == 100
    assert {r.cluster_rep for r in rows} == {0}
    assert {r.cluster_size for r in rows} == {100}
    assert {r.doc_id for r in rows} == set(range(100))
