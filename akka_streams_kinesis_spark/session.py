"""SparkSession factory tuned for the engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]``; the same settings are the
ones we would ship on a 1000-executor cluster: AQE for runtime re-planning
(skew joins, partition coalescing), broadcast joins for small dimensions, and
Arrow for the few Pandas-UDF operators.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(app_name: str = "akka-streams-kinesis-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # AQE: runtime shuffle-partition coalescing + skew-join splitting.
        # At 100 TB these two matter more than any static tuning.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Static shuffle parallelism for local runs; AQE coalesces below this.
        .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
        # Partition discovery below this many paths happens on the driver
        # instead of as a one-task-per-directory Spark job: the default
        # (32) made every fresh read of the 256-cell ANN store pay a
        # 256-task listing job (~1-2 s of pure scheduling for KB-sized
        # dirs). On a real lake a 256-dir listing is a handful of
        # LIST calls — driver-side is the right place for it.
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "1024")
        # Dimension tables (region/nation/supplier/part) are broadcast-able;
        # raise the threshold so Catalyst picks broadcast-hash over sort-merge.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Arrow transfer for pandas_udf / mapInPandas operators.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # ANSI mode ON, explicitly: Spark 4's default and the driver's
        # verify/bench posture. Pinning it here means local runs can never
        # silently diverge (e.g. overflow-wraps passing locally but
        # throwing ARITHMETIC_OVERFLOW under the driver, as in round 3).
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.ui.enabled", "false")
        # local mode: driver heap IS executor heap for all 32 task threads;
        # undersizing it turns broadcast/codegen churn into GC tail latency
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    return builder.getOrCreate()
