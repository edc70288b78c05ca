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


# ---------------------------------------------------------------------------
# cents_to_money_str / money_str_duck — the round-8 driver-gate rendering
# ---------------------------------------------------------------------------

CENTS = [0, 1, 5, 7, 9, 10, 99, 100, 101, 12345, -1, -7, -99, -100, -12345,
         987654321098765, -987654321098765]


def test_money_str_bit_identical_across_engines(spark):
    from akka_streams_kinesis_spark.functions import (
        cents_to_money_str,
        money_str_duck,
    )

    df = spark.createDataFrame([(c,) for c in CENTS], "c long")
    got = [
        r["s"]
        for r in df.select(cents_to_money_str(F.col("c")).alias("s"))
        .orderBy("c")
        .collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(c BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(c,) for c in CENTS])
    duck = [
        r[0]
        for r in con.execute(
            f"SELECT {money_str_duck('c')} FROM t ORDER BY c"
        ).fetchall()
    ]
    assert got == duck


def test_money_str_null_pins_to_null_in_both_engines(spark):
    """Round-9 ADVICE pin: NULL cents must render NULL in BOTH engines.

    Without the explicit guards, Spark's concat null-propagates (NULL)
    while DuckDB's CONCAT skips NULL arguments (renders '.') — a silent
    driver-gate divergence on any future nullable money column (e.g. an
    outer-join label)."""
    from akka_streams_kinesis_spark.functions import (
        cents_to_money_str,
        money_str_duck,
    )

    df = spark.createDataFrame([(None,), (123,)], "c long")
    got = {
        r["c"]: r["s"]
        for r in df.select("c", cents_to_money_str(F.col("c")).alias("s")).collect()
    }
    assert got[None] is None and got[123] == "1.23"
    con = duckdb.connect()
    con.execute("CREATE TABLE t(c BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(None,), (123,)])
    duck = dict(
        con.execute(f"SELECT c, {money_str_duck('c')} FROM t").fetchall()
    )
    assert duck[None] is None and duck[123] == "1.23"


def test_money_str_is_canonical_decimal_rendering(spark):
    from akka_streams_kinesis_spark.functions import cents_to_money_str

    df = spark.createDataFrame([(c,) for c in CENTS], "c long")
    rows = df.select("c", cents_to_money_str(F.col("c")).alias("s")).collect()
    for r in rows:
        sign = "-" if r["c"] < 0 else ""
        a = abs(r["c"])
        assert r["s"] == f"{sign}{a // 100}.{a % 100:02d}", r
        # and it round-trips through Decimal exactly
        assert Decimal(r["s"]) * 100 == r["c"]
