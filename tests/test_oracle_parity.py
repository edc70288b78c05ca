"""Local mirror of the driver's correctness gate.

For every registered query with an oracle, run the Spark DataFrame plan and
the DuckDB SQL on the same parquet tables and compare: row count, column
names, and order-insensitive values (floats to 6 significant figures via
repr of rounded values — the queries themselves already round anything
noisy, so this is belt-and-braces).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from akka_streams_kinesis_spark import registry
from akka_streams_kinesis_spark.io import TABLES

registry.load_all()

ORACLE_QUERIES = sorted(registry.ORACLES)
NO_ORACLE = sorted(set(registry.QUERIES) - set(registry.ORACLES))


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(v):
    if v is None:
        return "\x00<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _rows_to_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = sorted(tuple(_canon(r[i]) for i in order) for r in rows)
    return out


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    sdf = registry.QUERIES[name](spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns

    con = _duck(sf_dir)
    dres = con.execute(registry.ORACLES[name])
    dcols = [d[0] for d in dres.description]
    drows = dres.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} != {len(drows)}"
    sset = _rows_to_multiset([tuple(r) for r in srows], scols)
    dset = _rows_to_multiset(drows, dcols)
    mismatches = [(a, b) for a, b in zip(sset, dset) if a != b]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:3]}"


@pytest.mark.parametrize("name", NO_ORACLE)
def test_rows_only_queries_run(spark, sf_dir, name):
    sdf = registry.QUERIES[name](spark, sf_dir)
    assert sdf.count() >= 0
    assert len(sdf.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as se

    df = se.entry(spark)
    assert df.count() > 0


def test_every_oracle_key_has_query():
    assert set(registry.ORACLES) <= set(registry.QUERIES)
