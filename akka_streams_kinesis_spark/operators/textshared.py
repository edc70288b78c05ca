"""Shared normalized-document frames (r12 optimization round).

Two stacked corpus-wide frames, both built once per (session, sf_dir)
through shared.py's documented cache lifecycle (build cost reported once
under shared_builds — the same accounting as the minhash/purchase-graph/
ngram chains):

``norm_docs_shared`` — (doc_id, source, lang, t, w) where
    t = normalize_text(text) and w = split(t, ' '). Before this frame,
    ~20 registry queries EACH re-ran the identical
    ``documents → normalize_text`` pipeline (two regex passes over every
    document byte) before their own aggregates; at 100 TB that is twenty
    full corpus scans + normalizations for one logical artifact.

``doc_tokens_shared`` — (doc_id, tok), the exploded token stream, built
    FROM norm_docs_shared (the explode is the only extra work).

The SENTINEL query text_tfidf_top_terms keeps its own inline pipeline
(drift-sentinel code must stay frozen; bench.py DRIFT_SENTINEL), as do
text_quality / pipeline_quality_dedup_filter, whose feature sets also
read the RAW text column (sharing would add a second scan, not remove
one).

Consumers must not mutate the returned frames; filter/project as needed.
The t/w/tok definitions here must stay byte-identical to the `_NORM` +
STRING_SPLIT derivation the oracles use.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions import normalize_text
from ..io import fanout, table
from ..shared import shared_frame


def norm_docs_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, lang, t, w): every document, normalized once.

    t is the oracle-parity normalized text (`_NORM`); w its whitespace
    split. Only (doc_id, source, lang, t) is CACHED — w is derived
    lazily on top, so the split fuses into each consumer's codegen
    stage instead of forcing a deserialized array<string> cache scan
    (measured slower than re-splitting the cached string). Raw ``text``
    is deliberately NOT carried (consumers that need raw-text features
    keep their own scan)."""

    def build() -> DataFrame:
        d = fanout(table(spark, sf_dir, "documents"))
        return d.select(
            "doc_id",
            "source",
            "lang",
            normalize_text(F.col("text")).alias("t"),
        )

    return shared_frame(spark, "norm_docs", sf_dir, build).withColumn(
        "w", F.split("t", " ")
    )


def doc_tokens_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, tok): every document's normalized whitespace tokens."""

    def build() -> DataFrame:
        return norm_docs_shared(spark, sf_dir).select(
            "doc_id", F.explode("w").alias("tok")
        )

    return shared_frame(spark, "doc_tokens", sf_dir, build)
