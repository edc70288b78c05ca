"""Structural/property tests for the frequency operators. Value parity
with the SQL oracles is covered automatically by test_oracle_parity.py;
here we pin the sketch guarantee and the probability-normalization
invariant that the hash compare can't express.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from akka_streams_kinesis_spark import registry
from akka_streams_kinesis_spark.operators.frequency import _tokens, _mg_partials

registry.load_all()


def test_mg_candidates_superset_of_true_heavy_hitters(spark, sf_dir):
    """The union of per-partition Misra-Gries summaries must contain every
    token whose global count exceeds n/CAP — the bound the exact top-k
    recount relies on."""
    toks = _tokens(spark, sf_dir)
    cand = {
        r["tok"]
        for r in toks.mapInPandas(_mg_partials, schema="tok string").collect()
    }
    exact = toks.groupBy("tok").agg(F.count("*").alias("n")).collect()
    n_total = sum(r["n"] for r in exact)
    from akka_streams_kinesis_spark.operators.frequency import _MG_CAP

    must_have = {r["tok"] for r in exact if r["n"] > n_total / _MG_CAP}
    assert must_have <= cand, f"missing guaranteed heavy hitters: {must_have - cand}"


def test_heavy_hitters_matches_full_groupby(spark, sf_dir):
    got = registry.QUERIES["agg_heavy_hitters_topk"](spark, sf_dir).collect()
    toks = _tokens(spark, sf_dir)
    want = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok"))
        .limit(len(got))
        .collect()
    )
    assert [(r["tok"], r["n"]) for r in got] == [(r["tok"], r["n"]) for r in want]


def test_transition_probs_sum_to_one(spark, sf_dir):
    df = registry.QUERIES["events_transition_matrix"](spark, sf_dir)
    sums = df.groupBy("event_type").agg(F.sum("prob").alias("p")).collect()
    for r in sums:
        assert abs(r["p"] - 1.0) < 0.01, (r["event_type"], r["p"])


def test_bpe_pairs_are_two_chars(spark, sf_dir):
    rows = registry.QUERIES["text_bpe_pair_counts"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    assert all(len(r["pair"]) == 2 for r in rows)
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)
