"""Guard against driver hash-fails caused by DuckDB output types.

The driver's value hash is type-sensitive. DuckDB widens integer SUM to
HUGEINT (int128) and can emit TIMESTAMP_NS; Spark emits BIGINT/TIMESTAMP.
Round 1 lost 3 CORRECTNESS rows to exactly this (values identical at full
precision, hash mismatched on type). Every registered oracle must therefore
DESCRIBE to driver-hashable types only — fix is `CAST(SUM(...) AS BIGINT)`
in the oracle SQL.
"""

from __future__ import annotations

import duckdb
import pytest

from akka_streams_kinesis_spark import registry
from akka_streams_kinesis_spark.io import TABLES

registry.load_all()

FORBIDDEN = ("HUGEINT", "TIMESTAMP_NS", "UHUGEINT")


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(registry.ORACLES))
def test_oracle_output_types_hashable(duck, name):
    desc = duck.execute(f"DESCRIBE ({registry.ORACLES[name]})").fetchall()
    bad = [
        (col, typ)
        for col, typ, *_ in desc
        if any(f in typ.upper() for f in FORBIDDEN)
    ]
    assert not bad, (
        f"oracle for {name!r} emits driver-hash-unsafe types {bad}; "
        f"CAST the offending columns (e.g. CAST(SUM(...) AS BIGINT))"
    )
