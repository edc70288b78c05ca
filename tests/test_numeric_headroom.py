"""Numeric-headroom audit: no registered query may SUM a hash/digest-
derived integer column into an int64 accumulator.

This is exactly the round-3 scale-killer class: summing 48-bit md5
digests (`conv(substr(md5(..)),16,10) :: long`) overflows int64 at
~65 K rows/table — fine at sf0.01, ARITHMETIC_OVERFLOW under ANSI at
sf0.1, silent wraparound (≠ DuckDB's HUGEINT promotion) with ANSI off.
The audit walks every non-streaming query's *analyzed* plan (no
execution) and flags any `sum(...)` whose argument window contains a
digest producer (`conv(`, `hash(`, `xxhash64(`, `crc32(`) without a
decimal accumulator. Order-independent checksums must use `bit_xor`
(bounded by the digest width at any row count) or a decimal(38,0) sum.
"""

from __future__ import annotations

import re

import pytest

from akka_streams_kinesis_spark import registry

registry.load_all()

AUDITED = sorted(n for n in registry.QUERIES if not n.startswith("stream_"))

# producers whose output is uniformly distributed over a wide integer
# range — any int64 SUM over them has data-size-bounded headroom
_DIGEST_FNS = ("conv(", "hash(", "xxhash64(", "crc32(")


def _sum_windows(plan: str):
    """Yield the balanced-paren argument of every sum( in the plan —
    balanced extraction, so text AFTER the sum (e.g. a crc32 salt
    expression elsewhere in the plan line) can't false-positive."""
    for m in re.finditer(r"\bsum\(", plan):
        depth, i = 1, m.end()
        while i < len(plan) and depth:
            if plan[i] == "(":
                depth += 1
            elif plan[i] == ")":
                depth -= 1
            i += 1
        yield plan[m.end() : i - 1]


def _digest_sum_findings(plan: str) -> list[str]:
    findings = []
    for w in _sum_windows(plan):
        if not any(fn in w for fn in _DIGEST_FNS):
            continue
        if "as decimal" in w:
            continue  # decimal accumulator: the sanctioned wide-sum escape
        if any(op in w for op in (" < ", " > ", " <= ", " >= ", " = ")):
            # the digest feeds a COMPARISON inside the sum argument — the
            # summed value is a 0/1 predicate result (e.g. a hash-threshold
            # keep flag), bounded by row count, not by digest magnitude
            continue
        findings.append(f"sum({w[:120]}...")
    return findings


@pytest.mark.parametrize("name", AUDITED)
def test_no_int64_sum_over_digests(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().analyzed().toString()
    findings = _digest_sum_findings(plan)
    assert not findings, (
        f"{name}: int64 SUM over digest-derived values (overflow at scale; "
        f"use bit_xor or a decimal(38,0) sum): {findings}"
    )


def test_audit_catches_the_round3_checksum_pattern(spark, sf_dir):
    """Self-test: the audit must flag the exact round-3 bug if rebuilt."""
    import pyspark.sql.functions as F
    from akka_streams_kinesis_spark.io import table

    t = table(spark, sf_dir, "orders")
    bad = t.agg(
        F.sum(
            F.conv(
                F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 12),
                16,
                10,
            ).cast("long")
        ).alias("checksum")
    )
    plan = bad._jdf.queryExecution().analyzed().toString()
    assert _digest_sum_findings(plan), "audit failed to flag the known-bad pattern"

    # and the decimal escape hatch is honored
    ok = t.agg(
        F.sum(
            F.conv(
                F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 12),
                16,
                10,
            ).cast("decimal(38,0)")
        ).alias("checksum")
    )
    plan_ok = ok._jdf.queryExecution().analyzed().toString()
    assert not _digest_sum_findings(plan_ok)
