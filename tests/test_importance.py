"""Bloom-prefiltered decontamination: position parity and real pruning."""

from __future__ import annotations

import pyspark.sql.functions as F

from akka_streams_kinesis_spark.operators import importance as imp


def test_bloom_positions_build_probe_roundtrip(spark):
    """Build and probe share ONE position expression
    (_bloom_position_cols), so a bitmap built from a shingle set must
    pass every member through the probe-side bit test (no false
    negatives — the property the old md5 build/probe parity test pinned
    when the two sides were separate implementations). Positions must
    also be valid bit indexes (0 <= pos < M) — pmod, never a signed %."""
    samples = ["a b c d", "join table scan merge", "x" * 50, "", "é ü"]
    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    rows = df.select(
        "s", F.array(*imp._bloom_position_cols(F.col("s"))).alias("pos")
    ).collect()
    bits = bytearray(imp._BLOOM_M // 8)
    for r in rows:
        assert len(r.pos) == imp._BLOOM_K
        for p in r.pos:
            assert 0 <= p < imp._BLOOM_M, (r.s, p)
            bits[p >> 3] |= 1 << (p & 7)
    # probe side: identical expression, so every member's bits are set
    for r in rows:
        assert all((bits[p >> 3] >> (p & 7)) & 1 for p in r.pos), r.s
    # determinism: the expression yields the same positions on re-eval
    rows2 = df.select(
        "s", F.array(*imp._bloom_position_cols(F.col("s"))).alias("pos")
    ).collect()
    assert {r.s: list(r.pos) for r in rows} == {
        r.s: list(r.pos) for r in rows2
    }


def test_bloom_prefilter_prunes_but_never_drops_leaks(spark, sf_dir):
    """The prefilter must pass every true leak (guaranteed by construction
    — a member's bits are all set) and actually prune a non-trivial share
    of the non-leaking train shingles at the design load."""
    from akka_streams_kinesis_spark.functions import normalize_text, word_shingles
    from akka_streams_kinesis_spark.io import table

    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.split(normalize_text(F.col("text")), " ").alias("w")
    )
    sh = toks.select(
        "doc_id", F.explode(word_shingles("w", imp._BLOOM_N)).alias("s")
    ).distinct()
    split = d.select(
        "doc_id", F.expr(imp._SPLIT_CASE.format(st="STRING")).alias("split")
    )
    train_sh = sh.join(split.filter(F.col("split") == "train"), "doc_id")
    test_sh = (
        sh.join(split.filter(F.col("split") == "test"), "doc_id")
        .select("s")
        .distinct()
    )
    n_train = train_sh.count()
    n_true = train_sh.join(test_sh, "s", "left_semi").count()

    # run the operator end-to-end; its per-doc counts must sum to the
    # exact leak count (the confirm join removed every false positive)
    out = imp.curation_decontaminate_bloom(spark, sf_dir)
    total_leaked = out.agg(F.sum("n_leaked")).collect()[0][0] or 0
    assert total_leaked == n_true

    # and the bitmap really is a filter: set-bit density below 50% means
    # the prefilter rejects a measurable share of random non-members
    test_bits = test_sh.count() * imp._BLOOM_K
    assert test_bits < imp._BLOOM_M / 2, (
        "bloom overloaded at test scale — raise _BLOOM_M"
    )
    assert n_true <= n_train
