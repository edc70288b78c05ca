"""Shared normalized-token frame (r12 optimization round).

Eleven registry queries independently re-ran the identical
``documents → normalize_text → split → explode`` pipeline (regex
normalization over every document byte, then a row explosion) before
their own aggregates. At 100 TB that is eleven full corpus scans for one
logical artifact; locally it is ~0.5 s of repeated work per consumer.
``doc_tokens_shared`` materializes the (doc_id, tok) stream once per
(session, sf_dir) through shared.py's documented cache lifecycle — the
same accounting as the minhash/purchase-graph/ngram chains, with the
build cost reported once under shared_builds.

The SENTINEL query text_tfidf_top_terms keeps its own inline pipeline
(drift-sentinel code must stay frozen; bench.py DRIFT_SENTINEL).

Consumers must not mutate the returned frame; filter/project as needed.
The token definition here must stay byte-identical to the `_NORM` +
STRING_SPLIT derivation the oracles use.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions import normalize_text
from ..io import fanout, table
from ..shared import shared_frame


def doc_tokens_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, tok): every document's normalized whitespace tokens."""

    def build() -> DataFrame:
        d = fanout(table(spark, sf_dir, "documents"))
        return d.select(
            "doc_id",
            F.explode(F.split(normalize_text(F.col("text")), " ")).alias("tok"),
        )

    return shared_frame(spark, "doc_tokens", sf_dir, build)
