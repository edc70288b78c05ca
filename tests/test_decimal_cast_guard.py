"""Decimal-cast guard: no registered query's analyzed plan may contain a
double→DECIMAL (or float→DECIMAL) Cast.

This is the round-6 driver-red class: a double→DECIMAL(18,2) cast is
*engine-version-defined* at the half-cent boundary (DuckDB switched
truncate→round semantics across versions, Spark is HALF_UP), so a query
that carries money semantics through such a cast can pass against the
local DuckDB and fail against the driver's — exactly what happened to
`scalar_decimal_money_arithmetic` in CORRECTNESS_r06. The sanctioned
idiom is `functions.money_cents` (FLOOR(x*100+0.5) → BIGINT, pure IEEE
ops, bit-identical everywhere) with DECIMAL rendered only from cents via
`functions.cents_to_decimal` (exact decimal×decimal multiplication).

Unlike the text-level numeric-headroom audit, the analyzed-plan STRING
does not carry the cast child's type, so this guard walks the resolved
JVM expression trees (py4j) and inspects Cast nodes' child dataType —
analyzer-inserted implicit casts are covered too, not just literal
`.cast("decimal...")` calls in our source.
"""

from __future__ import annotations

import pytest

from akka_streams_kinesis_spark import registry

registry.load_all()

AUDITED = sorted(n for n in registry.QUERIES if not n.startswith("stream_"))


def _seq(jseq):
    return [jseq.apply(i) for i in range(jseq.size())]


def _cast_findings(jexpr, out, depth=0):
    if depth > 100:  # defensive: analyzed trees are shallow
        return
    if jexpr.getClass().getSimpleName() == "Cast":
        try:
            child_dt = jexpr.child().dataType().simpleString()
            dt = jexpr.dataType().simpleString()
        except Exception:  # non-standard Cast shim — ignore
            child_dt = dt = ""
        if child_dt in ("double", "float") and dt.startswith("decimal"):
            out.append(f"cast({child_dt} -> {dt}): {jexpr.toString()[:120]}")
    for ch in _seq(jexpr.children()):
        _cast_findings(ch, out, depth + 1)


def _plan_findings(jplan, out):
    for e in _seq(jplan.expressions()):
        _cast_findings(e, out)
    for ch in _seq(jplan.children()):
        _plan_findings(ch, out)


def analyzed_double_to_decimal_casts(df) -> list[str]:
    out: list[str] = []
    _plan_findings(df._jdf.queryExecution().analyzed(), out)
    return out


@pytest.mark.parametrize("name", AUDITED)
def test_no_double_to_decimal_cast(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    findings = analyzed_double_to_decimal_casts(df)
    assert not findings, (
        f"{name}: double→DECIMAL cast in analyzed plan — engine-version-"
        f"defined at the half-cent; derive integer cents with "
        f"functions.money_cents and render DECIMAL with cents_to_decimal: "
        f"{findings}"
    )


def test_guard_catches_the_round6_pattern(spark, sf_dir):
    """Self-test: the guard must flag the exact round-6 driver-red cast,
    and must NOT flag the sanctioned money_cents/cents_to_decimal path."""
    import pyspark.sql.functions as F

    from akka_streams_kinesis_spark.functions import cents_to_decimal, money_cents
    from akka_streams_kinesis_spark.io import table

    o = table(spark, sf_dir, "orders")
    bad = o.select(F.col("o_totalprice").cast("decimal(18,2)").alias("price_dec"))
    assert analyzed_double_to_decimal_casts(bad), (
        "guard failed to flag the known-bad double→DECIMAL cast"
    )

    ok = o.select(
        cents_to_decimal(money_cents(F.col("o_totalprice")), 18).alias("price_dec")
    )
    assert not analyzed_double_to_decimal_casts(ok), (
        "guard false-positived on the sanctioned cents idiom"
    )
