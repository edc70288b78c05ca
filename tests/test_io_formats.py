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


def test_orc_round_trip(spark, sf_dir, tmp_path):
    df = _orders_sample(spark, sf_dir)
    path = str(tmp_path / "o.orc")
    df.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert _as_sorted_strs(back) == _as_sorted_strs(df)


def test_bucketed_join_skips_shuffle(spark, sf_dir, tmp_path):
    """Bucketing both join sides on the key lets the sort-merge join read
    co-located buckets with NO Exchange — at 100 TB this is the difference
    between an all-to-all shuffle of the fact tables per query and none;
    the bucket layout is paid once at write time and reused by every
    downstream join on that key."""
    from akka_streams_kinesis_spark.plans import num_shuffles

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    (o.write.mode("overwrite").option("path", str(tmp_path / "ob"))
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("orders_b"))
    (l.write.mode("overwrite").option("path", str(tmp_path / "lb"))
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("lineitem_b"))
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the sort-merge path: at test SF the planner would broadcast
        # these tiny tables, which hides the property under test (at 100 TB
        # neither fact side is broadcastable)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ob, lb = spark.table("orders_b"), spark.table("lineitem_b")
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey)
        assert num_shuffles(joined) == 0, "bucketed join must not shuffle"
        plain = o.join(l, o.o_orderkey == l.l_orderkey)
        assert num_shuffles(plain) >= 1, "sanity: unbucketed join shuffles"
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_fanout_repartitions_single_split_input(spark, sf_dir):
    """fanout() spreads a single-file scan across defaultParallelism
    partitions (the 'single-split trap': without it, any explosive operator
    downstream of a compact input runs in one task)."""
    from akka_streams_kinesis_spark.io import fanout

    d = table(spark, sf_dir, "documents")
    assert d.rdd.getNumPartitions() == 1  # the trap this guards against
    f = fanout(d)
    assert f.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert f.count() == d.count()
    assert fanout(d, 7).rdd.getNumPartitions() == 7
