"""Crafted-input tests for the corpus-quality operators.

The synthetic corpus contains no PII, so the oracle for text_pii_scrub
only pins the no-op redaction path; these tests drive the same scrub
function over rows that DO contain emails / IPs / digit runs and pin the
detection + redaction behavior.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from akka_streams_kinesis_spark import registry
from akka_streams_kinesis_spark.operators.textquality import scrub_pii

registry.load_all()


def test_pii_scrub_detects_and_redacts(spark):
    rows = [
        (1, "contact alice@example.com or bob.smith+x@mail.co today"),
        (2, "server at 10.0.0.1 and 192.168.1.255 responded"),
        (3, "order id 1234567890 ref 000111"),
        (4, "clean text with no pii at all"),
        (5, "mix: c@d.io from 8.8.8.8 acct 99999999"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r
        for r in scrub_pii(df, "text", keep=("doc_id",)).collect()
    }
    assert (got[1]["n_emails"], got[1]["n_ipv4"], got[1]["n_digit_runs"]) == (2, 0, 0)
    assert (got[2]["n_emails"], got[2]["n_ipv4"], got[2]["n_digit_runs"]) == (0, 2, 0)
    assert (got[3]["n_emails"], got[3]["n_ipv4"], got[3]["n_digit_runs"]) == (0, 0, 2)
    assert (got[4]["n_emails"], got[4]["n_ipv4"], got[4]["n_digit_runs"]) == (0, 0, 0)
    assert (got[5]["n_emails"], got[5]["n_ipv4"], got[5]["n_digit_runs"]) == (1, 1, 1)


def test_pii_scrub_redaction_text(spark):
    df = spark.createDataFrame(
        [(1, "mail a@b.com ip 1.2.3.4 num 123456 end")], ["doc_id", "text"]
    )
    c = F.col("text")
    from akka_streams_kinesis_spark.operators.textquality import (
        PII_EMAIL,
        PII_IPV4,
        PII_LONG_DIGITS,
    )

    redacted = df.select(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(c, PII_EMAIL, "<EMAIL>"), PII_IPV4, "<IP>"
            ),
            PII_LONG_DIGITS,
            "<NUM>",
        ).alias("r")
    ).first()["r"]
    assert redacted == "mail <EMAIL> ip <IP> num <NUM> end"
    # the query's md5 equals md5 of that same redacted text
    import hashlib

    out = scrub_pii(df, "text", keep=("doc_id",)).first()
    assert out["redacted_md5"] == hashlib.md5(redacted.encode()).hexdigest()


def test_repetition_filter_flags_repetitive_doc(spark, sf_dir):
    """Docs that are one token repeated must have top_bigram_frac ≈ 1 and
    keep = False; short docs (< 2 tokens) get 0.0 fractions and keep."""
    df = registry.QUERIES["text_repetition_filter"](spark, sf_dir)
    rows = df.collect()
    assert len(rows) > 0
    for r in rows:
        assert 0.0 <= r["top_bigram_frac"] <= 1.01
        assert r["dup_trigram_frac"] >= 0.0
        assert r["keep"] == (
            r["top_bigram_frac"] <= 0.2 and r["dup_trigram_frac"] <= 0.6
        )
    # both classes should be populated on the synthetic corpus
    keeps = [r["keep"] for r in rows]
    assert any(keeps)


def test_unigram_surprisal_bounds(spark, sf_dir):
    """Mean surprisal is positive and bounded by log2(corpus tokens)."""
    import math

    df = registry.QUERIES["text_unigram_surprisal"](spark, sf_dir)
    rows = df.collect()
    assert rows
    total_tokens = sum(r["n_tokens"] for r in rows)
    bound = math.log2(total_tokens) + 1e-6
    for r in rows:
        assert 0.0 < r["avg_surprisal_bits"] <= bound
