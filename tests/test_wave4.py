"""Invariant tests for the wave-4 operators (cluster-size histogram,
classifier-agreement kappa, IVF cell-balance report, backfill∪live).
Value parity vs DuckDB is covered by the oracle gate; these pin the
structural invariants."""

from __future__ import annotations

import pyspark.sql.functions as F

from akka_streams_kinesis_spark.io import table
from akka_streams_kinesis_spark.operators.curation import (
    dedup_cluster_size_histogram,
)
from akka_streams_kinesis_spark.operators.similarity import (
    similarity_ivf_cell_balance_report,
)
from akka_streams_kinesis_spark.operators.textquality import (
    quality_classifier_agreement_kappa,
)


def test_cluster_size_histogram_conserves_docs(spark, sf_dir):
    rows = dedup_cluster_size_histogram(spark, sf_dir).collect()
    n_docs = table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs, "every doc in exactly one bin"
    for r in rows:
        assert r.n_clusters > 0
        # removable = docs minus one survivor per cluster
        assert r.n_removable == r.n_docs - r.n_clusters
        if r.size_bin == 1:
            assert r.n_removable == 0, "singletons have nothing to remove"
        else:
            # bin b holds clusters of size [2^(b-1), 2^b)
            assert r.n_docs >= r.n_clusters * (1 << (r.size_bin - 1))
            assert r.n_docs <= r.n_clusters * ((1 << r.size_bin) - 1)


def test_kappa_contingency_consistent(spark, sf_dir):
    (r,) = quality_classifier_agreement_kappa(spark, sf_dir).collect()
    assert r.n11 + r.n10 + r.n01 + r.n00 == r.n_docs
    assert 0.0 <= float(r.po4) <= 1.0
    assert -1.0 <= float(r.kappa4) <= 1.0
    # kappa can never exceed raw agreement
    assert float(r.kappa4) <= float(r.po4) + 1e-9


def test_cell_balance_report_shares(spark, sf_dir):
    rows = similarity_ivf_cell_balance_report(spark, sf_dir).collect()
    total = table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vectors for r in rows) == total
    assert len(rows) <= 256, "at most 2^8 sign cells"
    n_cells = len(rows)
    for r in rows:
        assert 0 <= r.share4 <= 10000
        assert r.hot == (n_cells * r.n_vectors > 2 * total)
