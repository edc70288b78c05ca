"""Focused tests for round-13 optimization restructures.

Each optimization that changed an operator's internals gets a direct
equivalence check against the straightforward reference formulation, so
the oracle gate is not the only thing pinning the rewrite.
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from akka_streams_kinesis_spark import registry
from akka_streams_kinesis_spark.functions import explode_ordered_pairs
from akka_streams_kinesis_spark.io import table

registry.load_all()


def test_ordered_pairs_enumerates_self_join_output(spark):
    """ordered_pairs on a sorted duplicate-free array must equal the
    equi-self-join's (a.k = b.k AND a.x < b.x) pair set, basket by
    basket — including the empty and single-element edge cases."""
    rows = [(1, [3, 7, 9]), (2, [5]), (3, []), (4, [1, 2])]
    df = spark.createDataFrame(rows, "k int, items array<int>")
    # the helper drops non-array columns, so pair-tag each basket by a
    # disjoint value range to keep the per-basket grouping observable
    got = sorted(
        map(tuple, explode_ordered_pairs(df, "items").collect())
    )
    flat = df.select("k", F.explode("items").alias("x"))
    a = flat.select(F.col("k").alias("_k"), F.col("x").alias("u"))
    b = flat.select(F.col("k").alias("_k2"), F.col("x").alias("v"))
    want = sorted(
        map(
            tuple,
            a.join(
                b, (F.col("_k") == F.col("_k2")) & (F.col("u") < F.col("v"))
            )
            .select("u", "v")
            .collect(),
        )
    )
    assert got == want
    assert got == [(1, 2), (3, 7), (3, 9), (7, 9)]


def test_jaccard_pair_explode_matches_self_join(spark, sf_dir):
    """The r13 array-explode pair pipeline must reproduce the old
    equi-self-join formulation of the link-prediction candidates row
    for row (pairs AND degree table)."""
    from akka_streams_kinesis_spark.operators.graph import (
        _LP_MAX_BASKET,
        _purchase_edges,
    )

    edges = _purchase_edges(spark, sf_dir)
    sized = (
        edges.groupBy("custkey")
        .agg(F.count("*").alias("basket"))
        .filter(F.col("basket") <= _LP_MAX_BASKET)
        .select("custkey")
    )
    kept = edges.join(sized, "custkey")
    a, b = kept.alias("a"), kept.alias("b")
    want_pairs = sorted(
        map(
            tuple,
            a.join(
                b,
                (F.col("a.custkey") == F.col("b.custkey"))
                & (F.col("a.suppkey") < F.col("b.suppkey")),
            )
            .groupBy(F.col("a.suppkey").alias("u"), F.col("b.suppkey").alias("v"))
            .agg(F.count("*").alias("shared"))
            .collect(),
        )
    )
    baskets = (
        edges.groupBy("custkey")
        .agg(F.sort_array(F.collect_set("suppkey")).alias("supps"))
        .filter(F.size("supps") <= _LP_MAX_BASKET)
    )
    got_pairs = sorted(
        map(
            tuple,
            explode_ordered_pairs(baskets, "supps")
            .groupBy("u", "v")
            .agg(F.count("*").alias("shared"))
            .collect(),
        )
    )
    assert got_pairs == want_pairs
    want_deg = sorted(
        map(
            tuple,
            kept.groupBy("suppkey").agg(F.count("*").alias("d")).collect(),
        )
    )
    got_deg = sorted(
        map(
            tuple,
            baskets.select(F.explode("supps").alias("suppkey"))
            .groupBy("suppkey")
            .agg(F.count("*").alias("d"))
            .collect(),
        )
    )
    assert got_deg == want_deg


def test_itemset_basket_frame_matches_window_formulation(spark, sf_dir):
    """The r13 collect_set basket frame must keep exactly the baskets the
    old distinct + COUNT-window formulation kept, with the same item
    sets."""
    from akka_streams_kinesis_spark.operators.frequency import _FIS_MAX_BASKET
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    old_kept = (
        li.groupBy("l_orderkey", "l_partkey")
        .agg(F.lit(1).alias("_one"))
        .withColumn(
            "bsize", F.count("*").over(Window.partitionBy("l_orderkey"))
        )
        .filter(F.col("bsize") <= _FIS_MAX_BASKET)
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("l_partkey")).alias("parts"))
    )
    new_kept = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
        .filter(F.size("parts") <= _FIS_MAX_BASKET)
    )
    old_rows = sorted((r["l_orderkey"], tuple(r["parts"])) for r in old_kept.collect())
    new_rows = sorted((r["l_orderkey"], tuple(r["parts"])) for r in new_kept.collect())
    assert old_rows == new_rows


def test_bench_short_line_fits_tail_budget():
    """The final short stdout line of bench.py must fit the driver's
    2000-byte tail capture whole even with a worst-case-sized queries
    map: simulate 301 queries with long names and 4-digit seconds and
    assert the trim loop converges under SHORT_LINE_BUDGET."""
    import bench

    timings = {
        f"similarity_standing_index_family_member_{i:03d}": 1234.567
        for i in range(301)
    }
    slowest = {
        n: round(timings[n], 2)
        for n in sorted(timings, key=lambda n: -timings[n])[:15]
    }
    families: dict[str, float] = {}
    for n, s in timings.items():
        fam = n.split("_", 1)[0]
        families[fam] = round(families.get(fam, 0.0) + s, 1)
    sentinel = {n: 9999.999 for n in bench.DRIFT_SENTINEL}
    short = {
        "metric": "headline_query_total_seconds",
        "value": 99999.999,
        "unit": "sec",
        "n_queries": len(timings),
        "n_errors": 0,
        "shared_builds_total": 9999.999,
        "drift_sentinel_total": 9999.999,
        "drift_baseline": bench.DRIFT_BASELINE,
        "drift_factor": 99.999,
        "drift_factor_median": 99.999,
        "drift_median_baseline": bench.DRIFT_MEDIAN_BASELINE,
        "sentinel_current": sentinel,
        "slowest": slowest,
        "families": families,
        "stream_ingest_rows_per_sec": 999999.9,
        "sf": 0.1,
        "queries_file": "BENCH_SUMMARY.json",
    }
    line = json.dumps(short)
    while len(line.encode()) > bench.SHORT_LINE_BUDGET and len(slowest) > 5:
        slowest.pop(next(reversed(slowest)))
        line = json.dumps(short)
    assert len(line.encode()) <= bench.SHORT_LINE_BUDGET, len(line.encode())
    # the real families map (34 one-word prefixes at r12) plus 5+ slowest
    # names must survive the trim — the driver needs at least the heavy
    # names visible
    assert len(slowest) >= 5
    assert bench.SHORT_LINE_BUDGET <= 1999  # line + newline inside 2000
