"""Property tests for the mixtures module beyond the oracle gate:
Morton-bucket rectangle alignment, classifier hash-path recompute,
mixture-weight algebra, incremental-dedup set relations."""

from __future__ import annotations

import hashlib
import math

import pyspark.sql.functions as F

from akka_streams_kinesis_spark import registry
from akka_streams_kinesis_spark.io import table
from akka_streams_kinesis_spark.operators.mixtures import (
    _CLF_BIAS,
    _CLF_MOD,
    _MIX_ALPHA,
    _MIX_TOKEN_BUDGET,
    curation_domain_mixture_weights,
    dedup_incremental_digest,
    layout_zorder_cluster,
    text_quality_linear_classifier,
)

registry.load_all()


def test_zorder_buckets_are_aligned_rectangles(spark, sf_dir):
    """bucket = zval >> 10 fixes the top 3 bits of BOTH dimensions, so
    every bucket's bounding box must sit inside one aligned 32×32 cell —
    the property that makes min/max file skipping work on either column.
    (A single-column sort would leave the other dimension's range
    near-full-width in every file.)"""
    rows = layout_zorder_cluster(spark, sf_dir).collect()
    assert rows, "no buckets"
    for r in rows:
        assert r["a_max"] - r["a_min"] < 32
        assert r["b_max"] - r["b_min"] < 32
        assert r["a_min"] >> 5 == r["a_max"] >> 5
        assert r["b_min"] >> 5 == r["b_max"] >> 5
        assert r["n"] > 0


def test_classifier_matches_local_recompute(spark, sf_dir):
    docs = {
        r["doc_id"]: r["text"]
        for r in table(spark, sf_dir, "documents").limit(20).collect()
    }
    got = {
        r["doc_id"]: r
        for r in text_quality_linear_classifier(spark, sf_dir).collect()
        if r["doc_id"] in docs
    }
    for doc_id, text in docs.items():
        toks = text.split(" ")
        ws = []
        for tok in toks:
            b = int(hashlib.md5(tok.encode()).hexdigest()[:6], 16) % 1024
            ws.append((b % _CLF_MOD) / _CLF_MOD - 0.5)
        score = 1.0 / (1.0 + math.exp(-(_CLF_BIAS + sum(ws) / len(ws))))
        r = got[doc_id]
        assert r["n_tok"] == len(toks)
        assert abs(r["score"] - score) < 5e-4
        assert r["keep"] == (score >= 0.5)


def test_mixture_weights_algebra(spark, sf_dir):
    rows = curation_domain_mixture_weights(spark, sf_dir).collect()
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-2  # 4dp rounding slack
    tot = sum(r["n_tokens"] for r in rows)
    for r in rows:
        # tempering with alpha<1 moves every weight TOWARD uniform:
        # small domains up, large domains down, never past uniform
        raw = r["n_tokens"] / tot
        uni = 1.0 / len(rows)
        lo, hi = min(raw, uni), max(raw, uni)
        assert lo - 5e-4 <= r["weight"] <= hi + 5e-4
        want_epochs = _MIX_TOKEN_BUDGET * r["weight"] / r["n_tokens"]
        assert abs(r["eff_epochs"] - want_epochs) < 0.05 * max(want_epochs, 1e-9)
    assert _MIX_ALPHA < 1.0


def test_incremental_dedup_set_relations(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    corpus_h = {
        r["h"]
        for r in d.filter(~F.expr("doc_id % 10 >= 8"))
        .select(F.md5("text").alias("h"))
        .distinct()
        .collect()
    }
    batch = d.filter(F.expr("doc_id % 10 >= 8")).select(
        "doc_id", F.md5("text").alias("h")
    )
    fresh = [r for r in batch.collect() if r["h"] not in corpus_h]
    kept = dedup_incremental_digest(spark, sf_dir).collect()
    # kept digests never collide with the standing corpus
    assert all(r["h"] not in corpus_h for r in kept)
    # one kept row per fresh digest; copies add back to the fresh count
    assert len(kept) == len({r["h"] for r in fresh})
    assert sum(r["batch_copies"] for r in kept) == len(fresh)
    # keep-lowest-id rule
    by_h: dict[str, int] = {}
    for r in fresh:
        by_h[r["h"]] = min(by_h.get(r["h"], 1 << 62), r["doc_id"])
    assert {(r["h"], r["doc_id"]) for r in kept} == set(
        (h, i) for h, i in by_h.items()
    )
