"""SimHash document fingerprinting (16-bit, md5-derived).

The bit arithmetic is generated once as dialect-shared SQL (CASE/substr/%
only — see functions.simhash_bit_weight_sql) and executed by Spark SQL and
by the DuckDB oracle verbatim, so the fingerprints are bit-identical by
construction. Spark-side the token stream is produced with DataFrame ops
(split/explode) and the shared SQL runs over a temp view; Catalyst compiles
the CASE cascades into codegen'd JVM expressions — no Python in the loop.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions import NORM_TEXT_DUCK, simhash_bit_weight_sql
from ..io import table
from ..registry import query

_BITS = 16


def _weight_select() -> str:
    """Per-token ±1 weights for each simhash bit, from md5(tok)."""
    cols = ",\n           ".join(
        f"{simhash_bit_weight_sql('md5(tok)', i)} AS w{i}" for i in range(_BITS)
    )
    return cols


def _fold_select() -> str:
    """Fold summed weights into the integer fingerprint."""
    terms = " + ".join(
        f"(CASE WHEN SUM(w{i}) >= 0 THEN {2 ** i} ELSE 0 END)" for i in range(_BITS)
    )
    return f"CAST({terms} AS BIGINT)"


_SHARED_AGG_SQL = f"""
    SELECT doc_id,
           {_fold_select()} AS simhash,
           COUNT(*) AS n_tokens
    FROM (SELECT doc_id,
           {_weight_select()}
          FROM doc_tokens) weighted
    GROUP BY doc_id
"""

_NORM = NORM_TEXT_DUCK.format(col="text")

_ORACLE = f"""
    WITH norm AS (
        SELECT doc_id, {_NORM} AS t FROM documents
    ), doc_tokens AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(t, ' ')) AS tok FROM norm
    )
    {_SHARED_AGG_SQL}
"""


def simhash_sigs_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, simhash): the per-document fingerprint aggregate,
    shared.py-cached (r13). THREE registry queries run this identical
    explode + hash aggregate — dedup_simhash, dedup_simhash_buckets and
    dedup_method_venn — so one persisted copy per (session, sf_dir)
    replaces three rebuilds (the minhash_pairs_shared discipline)."""
    from ..shared import shared_frame

    def build() -> DataFrame:
        from .textshared import doc_tokens_shared

        doc_tokens_shared(spark, sf_dir).createOrReplaceTempView("doc_tokens")
        return spark.sql(_SHARED_AGG_SQL)

    return shared_frame(spark, "simhash_sigs", sf_dir, build)


@query("dedup_simhash", oracle=_ORACLE)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document: per-token md5 bits vote ±1 per position;
    the sign vector packs into a BIGINT. Documents sharing a fingerprint are
    near-dup candidates. One explode + one hash aggregate — linear, and the
    shuffle carries only (doc_id, 16 small ints) partial sums. The
    aggregate itself is shared.py-cached (see simhash_sigs_shared)."""
    return simhash_sigs_shared(spark, sf_dir)


@query(
    "dedup_simhash_buckets",
    oracle=f"""
    WITH norm AS (
        SELECT doc_id, {_NORM} AS t FROM documents
    ), doc_tokens AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(t, ' ')) AS tok FROM norm
    ), sigs AS (
        {_SHARED_AGG_SQL}
    )
    SELECT simhash, COUNT(*) AS n_docs, MIN(doc_id) AS keep_id
    FROM sigs
    GROUP BY simhash
    HAVING COUNT(*) > 1
    """,
)
def dedup_simhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup buckets: fingerprint collisions (same 16-bit simhash)."""
    sigs = dedup_simhash(spark, sf_dir)
    return (
        sigs.groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )
