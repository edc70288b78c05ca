"""Streaming analytics on the simulated stream: watermarks, windows, dedup.

The reference has no streaming analytics (SURVEY §2.D: windows/watermark/
stateful ops ABSENT) — its tests compose `groupedWithin` batching on top of
the source (KinesisSourceTest.scala:245). These helpers supply the
Structured Streaming equivalents that a consumer of the reference would
hand-build downstream.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..functions import div_round4
from pyspark.sql import Column, DataFrame
from pyspark.sql.types import StructType


def decode_json_payload(records: DataFrame, schema: StructType | str) -> DataFrame:
    """Decode the opaque `data` bytes into typed columns — the consumer-side
    `.map` decode the reference leaves to users (KinesisSourceTest.scala:244
    maps ByteBuffer→String; we go bytes→JSON→struct)."""
    return records.select(
        "shard_id",
        "sequence_number",
        "partition_key",
        F.from_json(F.decode(F.col("data"), "utf-8"), schema).alias("payload"),
    ).select("shard_id", "sequence_number", "partition_key", "payload.*")


def hourly_rollup(events: DataFrame, ts_col: str = "ts", watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour window aggregation with a watermark for late data —
    the streaming twin of the batch flagship (events_hourly_rollup)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), "1 hour"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
            # round(sum,2)/count: boundary-safe avg (see operators.relational)
            div_round4(F.round(F.sum("value"), 2), F.count("*")).alias("avg_value"),
        )
        .select(
            F.col("window.start").alias("hour"),
            "event_type",
            "n",
            "total_value",
            "avg_value",
        )
    )


def stream_dedup(events: DataFrame, keys: list[str], ts_col: str = "ts",
                 watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup: at-least-once ingest (the reference's delivery
    guarantee, SURVEY §4) → exactly-once analytics. State is bounded by the
    watermark horizon."""
    return events.withWatermark(ts_col, watermark).dropDuplicates(keys)


def sessionize(events: DataFrame, gap: str = "30 minutes", ts_col: str = "ts",
               watermark: str = "2 hours") -> DataFrame:
    """Event-time session windows (gap-based) per user — the streaming twin
    of the batch events_sessionize query."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )
