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


def word_shingles3_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, source, g): every document's DISTINCT 3-word
    shingles with its (functionally dependent) lang/source labels (r13).

    Three pipelines exploded and distinct-collapsed the identical
    corpus-wide 3-gram set: text_boilerplate_by_source (consumes this
    frame directly — lang/source ride along for free since both are
    doc-functional, so the distinct's row count is unchanged),
    curation_source_overlap_matrix (derives its (source, digest) grain
    with one small distinct on top), and the dedup family's
    ngram_shingles_shared build (derives its (lang, source, shingle)
    digests with a projection — the preimage rows are already distinct,
    so no second distinct is needed under the r12 injective-digest
    argument)."""

    def build() -> DataFrame:
        from ..functions import word_shingles

        return (
            norm_docs_shared(spark, sf_dir)
            .select(
                "doc_id",
                "lang",
                "source",
                F.explode(word_shingles("w", 3)).alias("g"),
            )
            .distinct()
        )

    return shared_frame(spark, "word_shingles3", sf_dir, build)


def word_shingles4_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, s): every document's DISTINCT 4-word shingles (r13).

    Four registry queries — curation_decontaminate_train,
    curation_decontaminate_bloom, curation_ngram_novelty and
    pipeline_pretraining_prep — each exploded and distinct-collapsed the
    identical corpus-wide 4-gram set (their _DECON_N/_BLOOM_N/_NOV_N/
    _PREP_N constants are all 4) before their own joins/aggregates:
    four full-corpus explodes + four fact-scale distinct exchanges for
    one logical artifact. One build serves all four; subset consumers
    (prep screens only its dedup survivors) filter by doc_id — a doc's
    distinct shingle set does not depend on which other docs survive."""

    def build() -> DataFrame:
        from ..functions import word_shingles

        return (
            norm_docs_shared(spark, sf_dir)
            .select(
                "doc_id", F.explode(word_shingles("w", 4)).alias("s")
            )
            .distinct()
        )

    return shared_frame(spark, "word_shingles4", sf_dir, build)
