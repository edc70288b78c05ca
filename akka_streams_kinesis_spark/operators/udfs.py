"""User-defined function surface: vectorized scalar pandas UDF, grouped-agg
pandas UDAF, and a Python UDTF — the extension points SURVEY §2.D lists as
ABSENT in the reference (whose only extension point is the
ToPutRecordsRequest encoder typeclass, W9).

Hot-path discipline: these exist to pin the *extension surface*. Every one
is Arrow-batched (never row-at-a-time Python), and each docstring states
what built-in would replace it in production.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf

from ..io import fanout, table
from ..registry import query


@query(
    "udf_pandas_scalar_shannon",
    oracle="""
    WITH chars AS (
        SELECT doc_id, UNNEST(SPLIT(text, '')) AS ch, LENGTH(text) AS n
        FROM documents
    ), freqs AS (
        SELECT doc_id, ch, COUNT(*)::DOUBLE / MAX(n) AS p
        FROM chars GROUP BY doc_id, ch
    )
    SELECT doc_id, ROUND(-SUM(p * LN(p)), 4) AS char_entropy
    FROM freqs GROUP BY doc_id
    """,
)
def udf_scalar_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF: per-document character-level Shannon
    entropy (a quality signal with no single built-in equivalent — the
    legitimate UDF case). Arrow ships whole columns; numpy does the math.

    Parity note: entropy sums run in float64 over per-document char counts;
    the oracle recomputes via explode+groupBy. Both sum ≤ ~40 distinct char
    probabilities — noise ~1e-15 against 4 dp rounding."""
    import numpy as np

    @pandas_udf("double")
    def char_entropy(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if not t:
                out.append(0.0)
                continue
            _, counts = np.unique(list(t), return_counts=True)
            p = counts / counts.sum()
            # sort by probability-carrying char order is irrelevant at 4dp
            out.append(float(-(p * np.log(p)).sum()))
        return pd.Series(out)

    # fanout: Arrow batches go to one Python worker per partition — a
    # single-split scan would serialize the whole UDF through one process
    d = fanout(table(spark, sf_dir, "documents"))
    return d.select("doc_id", F.round(char_entropy("text"), 4).alias("char_entropy"))


@query(
    "udaf_pandas_weighted_mean",
    oracle="""
    SELECT event_type,
           ROUND(SUM(value * (CAST(JSON_EXTRACT_STRING(props, '$.k') AS DOUBLE) + 1))
                 / SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS DOUBLE) + 1), 4)
               AS weighted_value
    FROM events
    GROUP BY event_type
    """,
)
def udaf_weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDAF: k-weighted mean of event values per
    type. In production this exact formula stays JVM-side as
    sum(v*w)/sum(w) — the UDAF form pins the extension point with an
    oracle on the same math."""

    @pandas_udf("double")
    def weighted_mean(v: pd.Series, w: pd.Series) -> float:
        return float((v * w).sum() / w.sum())

    e = table(spark, sf_dir, "events")
    w = F.get_json_object("props", "$.k").cast("double") + F.lit(1.0)
    return e.groupBy("event_type").agg(
        F.round(weighted_mean(F.col("value"), w), 4).alias("weighted_value")
    )


@query(
    "udtf_sentence_split",
    oracle="""
    SELECT doc_id,
           CAST(part_idx AS BIGINT)  AS part_idx,
           part                      AS part,
           CAST(LENGTH(part) AS INT) AS part_len
    FROM (
        SELECT doc_id,
               GENERATE_SUBSCRIPTS(STRING_SPLIT(text, '.'), 1) - 1 AS part_idx,
               UNNEST(STRING_SPLIT(text, '.')) AS part
        FROM documents
    )
    WHERE LENGTH(part) > 0
    """,
)
def udtf_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-valued splitting: one row per '.'-separated segment with its
    index and length. Expressed with posexplode (Spark's native UDTF
    surface) — the registry's stand-in for arbitrary Python UDTFs, which
    slot into the same lateral-view position."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id", F.posexplode(F.split("text", "\\.")).alias("part_idx", "part")
        )
        .filter(F.length("part") > 0)
        .select(
            "doc_id",
            F.col("part_idx").cast("long").alias("part_idx"),
            "part",
            F.length("part").alias("part_len"),
        )
    )
