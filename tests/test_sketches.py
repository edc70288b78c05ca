"""Sketch-based aggregates: accuracy pinned against their exact twins
(the rows-only registry entries get their real check here)."""

from __future__ import annotations

import pyspark.sql.functions as F

from akka_streams_kinesis_spark import registry

registry.load_all()


def test_approx_percentiles_close_to_exact(spark, sf_dir):
    # the query now gates the sketch itself: exact interpolated percentiles
    # (hash-matched vs DuckDB QUANTILE_CONT) plus a boolean that every
    # sketch estimate landed within 5% (oracle asserts literal TRUE)
    rows = registry.QUERIES["agg_approx_percentiles_sketch"](spark, sf_dir).collect()
    exact = {
        r["o_orderpriority"]: (r["p25"], r["p50"], r["p75"])
        for r in registry.QUERIES["agg_exact_percentiles"](spark, sf_dir).collect()
    }
    assert {r["o_orderpriority"] for r in rows} == exact.keys()
    for r in rows:
        assert r["within_tolerance"], f"{r['o_orderpriority']}: sketch out of tolerance"
        p25, p50, p75 = exact[r["o_orderpriority"]]
        # the gate's exact percentiles agree with the exact-percentiles query
        assert abs(r["exact_p25"] - p25) / p25 < 0.01
        assert abs(r["exact_p50"] - p50) / p50 < 0.01
        assert abs(r["exact_p75"] - p75) / p75 < 0.01


def test_hll_close_to_exact_distinct(spark, sf_dir):
    # the query now gates the sketch itself: exact count + a boolean that
    # the HLL estimate landed within 5% of it (oracle asserts literal TRUE)
    rows = registry.QUERIES["agg_approx_distinct_users"](spark, sf_dir).collect()
    exact = {
        r["event_type"]: r["distinct_users"]
        for r in registry.QUERIES["agg_distinct_users_per_type"](spark, sf_dir).collect()
    }
    assert {r["event_type"] for r in rows} == exact.keys()
    for r in rows:
        assert r["exact_users"] == exact[r["event_type"]]
        assert r["within_tolerance"], f"{r['event_type']}: HLL estimate out of tolerance"


def test_raw_sql_surface(spark, sf_dir):
    """Users can address every table through plain spark.sql after
    register_views — the SQL entry surface of the engine."""
    from akka_streams_kinesis_spark.io import register_views

    register_views(spark, sf_dir)
    got = spark.sql(
        "SELECT r_name, COUNT(*) AS n FROM region JOIN nation "
        "ON r_regionkey = n_regionkey GROUP BY r_name ORDER BY r_name"
    ).collect()
    assert sum(r["n"] for r in got) == 25 and len(got) == 5


def test_python_hll_accuracy_pinned():
    """The stream-state HLL must estimate within its design error at
    several cardinalities (incl. the linear-counting small range)."""
    from akka_streams_kinesis_spark.streaming.stateful import (
        _HLL_M,
        _hll_fold,
        hll_estimate,
    )

    for n in (50, 500, 5_000, 50_000):
        regs = bytearray(_HLL_M)
        _hll_fold(regs, range(n))
        est = hll_estimate(bytes(regs))
        assert abs(est - n) / n < 0.05, (n, est)


def test_python_hll_merge_is_order_insensitive():
    from akka_streams_kinesis_spark.streaming.stateful import (
        _HLL_M,
        _hll_fold,
        hll_estimate,
    )

    a = bytearray(_HLL_M)
    _hll_fold(a, list(range(1000)))
    b = bytearray(_HLL_M)
    _hll_fold(b, list(reversed(range(1000))))
    _hll_fold(b, range(500))  # redelivery: idempotent
    assert hll_estimate(bytes(a)) == hll_estimate(bytes(b))
