"""Property tests for the money_cents / cents_to_decimal idiom
(functions/__init__.py) — the round-7 replacement for the
engine-version-defined double→DECIMAL cast.

Pins: (1) Spark's money_cents equals DuckDB's MONEY_CENTS_DUCK bit-for-
bit over adversarial doubles (half-cent boundaries, float dust, large
magnitudes); (2) cents_to_decimal renders the exact scale-2 value with
the requested precision; (3) the pair round-trips: for any 2dp-valued
double, cents/100 == the original decimal."""

from __future__ import annotations

from decimal import Decimal

import duckdb
import pyspark.sql.functions as F
import pytest

from akka_streams_kinesis_spark.functions import (
    CENTS_TO_DECIMAL_DUCK,
    MONEY_CENTS_DUCK,
    cents_to_decimal,
    money_cents,
)

# adversarial money doubles: exact cents, half-cent ties (where DuckDB
# versions disagree on double→DECIMAL), accumulated float dust, big values
VALUES = [
    0.0, 0.01, 0.005, 0.015, 0.025, 1.005, 2.675,  # classic tie cases
    0.1 + 0.2,                                      # 0.30000000000000004
    1234.56, 99999999.99, 12345678901.23,
    3.9999999999999996, 7.004999999999999,
]


@pytest.fixture(scope="module")
def frames(spark):
    df = spark.createDataFrame([(v,) for v in VALUES], "v double")
    got = df.select(
        money_cents(F.col("v")).alias("cents"),
        cents_to_decimal(money_cents(F.col("v")), 28).alias("dec"),
    ).collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE t(v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in VALUES])
    duck = con.execute(
        f"SELECT {MONEY_CENTS_DUCK.format(col='v')} AS cents, "
        f"{CENTS_TO_DECIMAL_DUCK.format(cents=MONEY_CENTS_DUCK.format(col='v'), p=28)} AS dec "
        "FROM t"
    ).fetchall()
    return got, duck


def test_cents_bit_identical_across_engines(frames):
    got, duck = frames
    assert [r["cents"] for r in got] == [r[0] for r in duck]


def test_decimal_render_is_exact(frames):
    got, duck = frames
    for s, d in zip(got, duck):
        assert s["dec"] == d[1], (s, d)
        # the rendered decimal IS cents/100 exactly
        assert s["dec"] == Decimal(s["cents"]) / 100


def test_roundtrip_for_exact_2dp_values(spark):
    vals = [0.25, 19.99, 100.10, 12345.67]
    rows = spark.createDataFrame([(v,) for v in vals], "v double").select(
        cents_to_decimal(money_cents(F.col("v")), 18).alias("dec")
    ).collect()
    assert [r["dec"] for r in rows] == [
        Decimal(str(v)).quantize(Decimal("0.01")) for v in vals
    ]
