"""Invariant tests for the wave-3 operators (graph link prediction /
degree histogram, diversified top-k, multi-probe sweep, compaction
planner). Value-level parity vs DuckDB is covered by the oracle gate
(scripts/driver_sim.py / tests/test_oracle_parity.py); these pin the
structural invariants a hash can't explain when it breaks."""

from __future__ import annotations

import pyspark.sql.functions as F

from akka_streams_kinesis_spark.operators.graph import (
    _purchase_edges,
    graph_degree_distribution,
    graph_jaccard_link_prediction,
)
from akka_streams_kinesis_spark.operators.maintenance import (
    _COMPACT_TARGET,
    maintenance_compaction_planner,
)
from akka_streams_kinesis_spark.operators.similarity import (
    _DIV_QUOTA,
    _DIV_TOPK,
    similarity_diversified_topk,
    similarity_multiprobe_recall_sweep,
)


def test_jaccard_link_prediction_bounds(spark, sf_dir):
    rows = graph_jaccard_link_prediction(spark, sf_dir).collect()
    assert 0 < len(rows) <= 25
    for r in rows:
        assert r.u < r.v, "pairs must be oriented"
        assert 0 < r.shared <= min(r.deg_u, r.deg_v)
        assert 0 <= r.jacc4 <= 10000
        # exact integer definition
        assert r.jacc4 == (10000 * r.shared) // (r.deg_u + r.deg_v - r.shared)
    # ranked by the documented sort key
    keys = [(-r.jacc4, -r.shared, r.u, r.v) for r in rows]
    assert keys == sorted(keys)


def test_degree_distribution_conserves_edges(spark, sf_dir):
    hist = graph_degree_distribution(spark, sf_dir).collect()
    edges = _purchase_edges(spark, sf_dir)
    n_edges = edges.count()
    n_cust = edges.select("custkey").distinct().count()
    n_supp = edges.select("suppkey").distinct().count()
    by_side: dict[str, list] = {}
    for r in hist:
        by_side.setdefault(r.side, []).append(r)
        # bin covers [2^(bin-1), 2^bin)
        assert r.deg_lo == 1 << (r.bin_id - 1)
    assert sum(r.n_nodes for r in by_side["customer"]) == n_cust
    assert sum(r.n_nodes for r in by_side["supplier"]) == n_supp
    # every edge contributes exactly one degree unit to each side
    assert sum(r.total_degree for r in by_side["customer"]) == n_edges
    assert sum(r.total_degree for r in by_side["supplier"]) == n_edges


def test_diversified_topk_quota(spark, sf_dir):
    rows = similarity_diversified_topk(spark, sf_dir).collect()
    per_q: dict[int, list] = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
    for q, rs in per_q.items():
        assert len(rs) <= _DIV_TOPK
        # label quota
        per_label: dict[int, int] = {}
        for r in rs:
            per_label[r.label] = per_label.get(r.label, 0) + 1
        assert max(per_label.values()) <= _DIV_QUOTA, f"quota broken for query {q}"
        # rnk consistent with sim-desc ordering
        rs = sorted(rs, key=lambda r: r.rnk)
        sims = [r.sim for r in rs]
        assert sims == sorted(sims, reverse=True)


def test_multiprobe_sweep_monotone(spark, sf_dir):
    rows = sorted(
        similarity_multiprobe_recall_sweep(spark, sf_dir).collect(),
        key=lambda r: r.probe_h,
    )
    assert [r.probe_h for r in rows] == [0, 1, 2]
    # widening the probe radius can only add candidates and recall
    for a, b in zip(rows, rows[1:]):
        assert a.n_candidate_pairs <= b.n_candidate_pairs
        assert a.n_hits <= b.n_hits
    for r in rows:
        assert 0 <= r.recall4 <= 10000


def test_compaction_planner_partitions_files(spark, sf_dir):
    from akka_streams_kinesis_spark.io import table

    plan = maintenance_compaction_planner(spark, sf_dir).collect()
    docs = (
        table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("bytes"))
        .collect()
    )
    totals = {r.source: (r.n, r.bytes) for r in docs}
    by_source: dict[str, list] = {}
    for r in plan:
        by_source.setdefault(r.source, []).append(r)
    for source, groups in by_source.items():
        groups = sorted(groups, key=lambda r: r.group_id)
        n, byts = totals[source]
        assert sum(g.n_files for g in groups) == n, "every file planned exactly once"
        assert sum(g.group_bytes for g in groups) == byts
        # groups are contiguous, non-overlapping doc_id ranges
        for a, b in zip(groups, groups[1:]):
            assert a.last_file < b.first_file
        # cumulative-quota property: all but the last group crossed the
        # target boundary once its last file was added (group g ends only
        # when bytes_before reaches (g+1)*target)
        cum = 0
        for g in groups[:-1]:
            cum += g.group_bytes
            assert cum >= (g.group_id + 1) * _COMPACT_TARGET - 0, (
                "group closed before reaching its quota"
            )


def test_triangle_selfcheck_agrees_with_census(spark, sf_dir):
    # round-9: the dual-plan self-check's totals must equal the census's
    # oracle-gated total_triangles at small SF — ties the sf1 rows-only
    # invariant back to the hash-gated number
    from akka_streams_kinesis_spark.operators.graph import (
        graph_triangle_census_selfcheck,
        graph_triangle_count,
    )

    census = graph_triangle_count(spark, sf_dir).collect()[0]
    check = graph_triangle_census_selfcheck(spark, sf_dir).collect()[0]
    assert check["totals_agree"] is True
    assert check["total_triangles"] == census["total_triangles"]
    assert check["total_degree_oriented"] == census["total_triangles"]
