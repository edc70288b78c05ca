"""Plan-shape pins for the round-7 operators: the scale claims in their
docstrings, asserted against the physical plan (the same discipline as
tests/test_plans.py)."""

from __future__ import annotations

from akka_streams_kinesis_spark import registry
from akka_streams_kinesis_spark.plans import (
    join_strategies,
    physical_plan,
)

registry.load_all()


def test_delete_vectors_anti_join_is_broadcast(spark, sf_dir):
    df = registry.QUERIES["maintenance_delete_vectors_mor"](spark, sf_dir)
    plan = physical_plan(df)
    st = join_strategies(df)
    assert st["cartesian"] == 0
    # the sidecar applies as a BROADCAST anti-join: the base is never
    # shuffled to subtract the (dimension-sized) delete keys
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_temperature_sampling_rates_are_broadcast(spark, sf_dir):
    df = registry.QUERIES["curation_temperature_sampling"](spark, sf_dir)
    st = join_strategies(df)
    assert st["cartesian"] == 0
    # per-domain rates join back map-side; the corpus is never shuffled
    # to be classified
    assert st["broadcast_hash"] >= 1


def test_knn_label_eval_no_cartesian(spark, sf_dir):
    df = registry.QUERIES["similarity_knn_label_eval"](spark, sf_dir)
    st = join_strategies(df)
    assert st["cartesian"] == 0, physical_plan(df)


def test_label_propagation_no_cartesian(spark, sf_dir):
    df = registry.QUERIES["graph_label_propagation_communities"](spark, sf_dir)
    st = join_strategies(df)
    assert st["cartesian"] == 0


def test_next_event_model_is_broadcast(spark, sf_dir):
    df = registry.QUERIES["behavior_next_event_prediction"](spark, sf_dir)
    st = join_strategies(df)
    assert st["cartesian"] == 0
    # the |types|²-row model joins the eval frame as a broadcast
    assert st["broadcast_hash"] >= 1


def test_split_leakage_audit_no_cartesian(spark, sf_dir):
    df = registry.QUERIES["dedup_split_leakage_audit"](spark, sf_dir)
    st = join_strategies(df)
    assert st["cartesian"] == 0


def test_dynamic_partition_pruning_in_plan(spark, sf_dir):
    df = registry.QUERIES["layout_dynamic_partition_pruning"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan


def test_frequent_itemset_pairs_join_is_hash_not_nested_loop(spark, sf_dir):
    # round-8 ADVICE: the one mixed equi/non-equi self-join (_ok equality
    # AND part_a < part_b) — a regression in equi-key extraction would
    # silently degrade it to a nested-loop join
    df = registry.QUERIES["agg_frequent_itemset_pairs"](spark, sf_dir)
    st = join_strategies(df)
    assert st["cartesian"] == 0
    assert st["broadcast_nested_loop"] == 0
