"""File source/sink round trips (SURVEY §2.D rows: 'Scans: files' /
'Sinks: files' — ABSENT in the reference, supplied by Spark built-ins):
parquet, csv, json all preserve the relational payload; parquet preserves
binary and timestamps natively."""

from __future__ import annotations

import pyspark.sql.functions as F

from akka_streams_kinesis_spark.io import table


def _orders_sample(spark, sf_dir):
    return table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


def _as_sorted_strs(df):
    return sorted(map(str, df.collect()))


def test_parquet_round_trip(spark, sf_dir, tmp_path):
    df = _orders_sample(spark, sf_dir)
    path = str(tmp_path / "o.parquet")
    df.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    assert _as_sorted_strs(back) == _as_sorted_strs(df)


def test_csv_round_trip_with_header_and_schema(spark, sf_dir, tmp_path):
    df = _orders_sample(spark, sf_dir)
    path = str(tmp_path / "o.csv")
    df.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.schema(df.schema).option("header", True).csv(path)
    assert _as_sorted_strs(back) == _as_sorted_strs(df)


def test_json_round_trip(spark, sf_dir, tmp_path):
    df = _orders_sample(spark, sf_dir)
    path = str(tmp_path / "o.json")
    df.write.mode("overwrite").json(path)
    back = spark.read.schema(df.schema).json(path)
    assert _as_sorted_strs(back) == _as_sorted_strs(df)


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    """partitionBy + a partition-key filter: the scan only lists the
    matching directory (partition pruning — the scale property)."""
    df = _orders_sample(spark, sf_dir)
    path = str(tmp_path / "o_part")
    df.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    back = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    expected = df.filter(F.col("o_orderstatus") == "F").count()
    assert back.count() == expected
    files = back.select(F.input_file_name()).distinct().collect()
    assert all("o_orderstatus=F" in r[0] for r in files)
