"""Data-selection operators for pre-training corpora: hashed-n-gram
importance weighting (DSIR-style) and bloom-prefiltered decontamination.

- ``curation_importance_weights``: importance weights for domain-targeted
  data selection following the hashed-n-gram construction of DSIR (Xie et
  al., "Data Selection for Language Models via Importance Resampling",
  NeurIPS 2023 — public paper): featurize each document as hashed word
  bigrams, fit smoothed bucket distributions for the target domain (here
  ``lang='en'``) and the raw corpus, and score every document by its mean
  log importance ratio ``ln(p_target/q_source)``. High scorers are the
  documents importance *resampling* would keep.
- ``curation_decontaminate_bloom``: the same benchmark-leak screen as
  ``curation_decontaminate_train`` but with the scale path a 100 TB
  corpus needs: the test-set shingle membership is compressed into a
  broadcast Bloom filter that prunes the train-side shingle stream
  map-side (C-speed md5, no shuffle, a few hundred KB of bits), and only
  the surviving ~few % of candidates reach the exact confirm join.
  False positives are eliminated by the confirm join, so the result is
  EXACTLY the exact-join answer — which is what the oracle computes.

Reference parity: none — the reference is a Kinesis connector with no
text surface (SURVEY.md §2.D); driver-mandated north-star extensions.
Both DuckDB-oracle-gated.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions import NORM_TEXT_DUCK, word_shingles
from ..io import table
from ..registry import query
from ..shared import transient_persist

_NORM = NORM_TEXT_DUCK.format(col="text")

# ---------------------------------------------------------------------------
# curation_importance_weights — DSIR-style hashed-bigram importance ratio
# ---------------------------------------------------------------------------

# 4096 hash buckets: the bucket label is the first 3 hex chars of
# md5(bigram) — a string key both engines derive identically, so no
# integer-hash parity games. Add-one smoothing over the bucket space.
_IW_BUCKETS = 4096
_TARGET_LANG = "en"


@query(
    "curation_importance_weights",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang, STRING_SPLIT({_NORM}, ' ') AS w FROM documents
    ), grams AS (
        SELECT doc_id, lang,
               SUBSTR(MD5(UNNEST(CASE WHEN LEN(w) >= 2
                    THEN LIST_TRANSFORM(RANGE(1, LEN(w)), i -> w[i] || ' ' || w[i+1])
                    ELSE [] END)), 1, 3) AS bucket
        FROM toks
    ), tgt AS (
        SELECT bucket, COUNT(*) AS cnt FROM grams
        WHERE lang = '{_TARGET_LANG}' GROUP BY bucket
    ), src AS (
        SELECT bucket, COUNT(*) AS cnt FROM grams GROUP BY bucket
    ), model AS (
        -- logratio quantized to integer micro-nats: per-doc averages are
        -- then EXACT int64 sums (order-independent), where averaging raw
        -- doubles diverged between engines at sf0.1 (partial-agg order)
        SELECT s.bucket,
               CAST(FLOOR(LN(((COALESCE(t.cnt, 0) + 1) * 1.0 /
                   ((SELECT SUM(cnt) FROM tgt) + {_IW_BUCKETS}))
                  / ((s.cnt + 1) * 1.0 /
                     ((SELECT SUM(cnt) FROM src) + {_IW_BUCKETS})))
                   * 1000000 + 0.5) AS BIGINT) AS lr_u
        FROM src s LEFT JOIN tgt t ON s.bucket = t.bucket
    )
    SELECT g.doc_id,
           ANY_VALUE(g.lang) AS lang,
           COUNT(*) AS n_grams,
           FLOOR(CAST(SUM(m.lr_u) AS DOUBLE) * 10000.0
                 / (COUNT(*) * 1000000.0) + 0.5) / 10000.0 AS avg_logratio
    FROM grams g JOIN model m ON m.bucket = g.bucket
    GROUP BY g.doc_id
    """,
)
def curation_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights: hashed word-bigram features, smoothed
    target (``lang='en'``) vs corpus bucket distributions, and a per-doc
    mean log importance ratio — the score importance resampling ranks by.

    Plan: ONE explode of the bigram stream is persisted and feeds all
    three consumers (target counts, source counts, scoring). Both count
    tables collapse to ≤{_IW_BUCKETS} rows, so the scoring model is a
    broadcast join that pipelines with the gram stream; the only doc-keyed
    shuffle is the final per-doc average. At 100 TB: counts partial-agg
    map-side into a bounded table regardless of corpus size — this is the
    whole point of the hashed feature space."""
    from .textshared import norm_docs_shared

    toks = norm_docs_shared(spark, sf_dir).select("doc_id", "lang", "w")
    grams = (
        toks.select(
            "doc_id", "lang", F.explode(word_shingles("w", 2)).alias("g")
        )
        .select(
            "doc_id", "lang", F.substring(F.md5("g"), 1, 3).alias("bucket")
        )
    )
    grams = transient_persist(grams)
    tgt = (
        grams.filter(F.col("lang") == _TARGET_LANG)
        .groupBy("bucket")
        .agg(F.count("*").alias("t_cnt"))
    )
    src = grams.groupBy("bucket").agg(F.count("*").alias("s_cnt"))
    n_tgt = tgt.agg(F.sum("t_cnt").alias("n_t"))
    n_src = src.agg(F.sum("s_cnt").alias("n_s"))
    model = (
        src.join(tgt, "bucket", "left")
        .crossJoin(F.broadcast(n_tgt))
        .crossJoin(F.broadcast(n_src))
        .select(
            "bucket",
            # micro-nat quantization — see the oracle comment: int64 sums
            # are order-independent where double AVG is not
            F.floor(
                F.log(
                    ((F.coalesce("t_cnt", F.lit(0)) + 1) * 1.0 / (F.col("n_t") + _IW_BUCKETS))
                    / ((F.col("s_cnt") + 1) * 1.0 / (F.col("n_s") + _IW_BUCKETS))
                )
                * 1000000
                + 0.5
            )
            .cast("long")
            .alias("lr_u"),
        )
    )
    return (
        grams.join(F.broadcast(model), "bucket")
        .groupBy("doc_id")
        .agg(
            F.any_value("lang").alias("lang"),
            F.count("*").alias("n_grams"),
            (
                F.floor(
                    F.sum("lr_u").cast("double")
                    * 10000.0
                    / (F.count("*") * 1000000.0)
                    + 0.5
                )
                / 10000.0
            ).alias("avg_logratio"),
        )
    )


# ---------------------------------------------------------------------------
# curation_decontaminate_bloom — bloom-prefiltered benchmark-leak screen
# ---------------------------------------------------------------------------

_BLOOM_N = 4           # shingle width (words)
_BLOOM_M = 1 << 17     # bits (16 KiB)
_BLOOM_K = 3           # hash functions

# train/test split: imported from curation.py (single source of truth —
# the decontamination screens must agree with split_train_valid_test and
# pipeline_pretraining_prep about which docs are train/test; a retuned
# copy here would silently desynchronize the contamination screen)
from .curation import _SPLIT_CASE  # noqa: E402


def _bloom_position_cols(s: F.Column) -> list[F.Column]:
    """The K bit-position columns of shingle column ``s`` —
    pmod(xxhash64(s, i), M), the SAME JVM expression on build and probe
    sides (r12: replaced the md5-hex build expression + per-row Python
    hashlib probe; any deterministic hash family yields an equivalent
    bloom because the exact confirm join removes false positives)."""
    return [
        F.pmod(F.xxhash64(s, F.lit(i)), F.lit(_BLOOM_M)) for i in range(_BLOOM_K)
    ]


@query(
    "curation_decontaminate_bloom",
    oracle=f"""
    WITH norm AS (
        SELECT doc_id, {_NORM} AS t FROM documents
    ), toks AS (
        SELECT doc_id, STRING_SPLIT(t, ' ') AS w FROM norm
    ), sh AS (
        SELECT DISTINCT doc_id,
               UNNEST(CASE WHEN LEN(w) >= {_BLOOM_N}
                           THEN LIST_TRANSFORM(RANGE(1, LEN(w) - {_BLOOM_N - 2}),
                                               i -> {" || ' ' || ".join(f"w[i+{j}]" if j else "w[i]" for j in range(_BLOOM_N))})
                           ELSE [] END) AS s
        FROM toks
    ), split AS (
        SELECT doc_id, {_SPLIT_CASE.format(st="VARCHAR")} AS split FROM documents
    ), test_sh AS (
        SELECT DISTINCT s FROM sh JOIN split USING (doc_id) WHERE split = 'test'
    )
    SELECT sh.doc_id,
           COUNT(*) AS n_leaked,
           MIN(MD5(sh.s)) AS leak_digest
    FROM sh
    JOIN split ON split.doc_id = sh.doc_id AND split.split = 'train'
    JOIN test_sh ON test_sh.s = sh.s
    GROUP BY sh.doc_id
    """,
)
def curation_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination with a Bloom prefilter: flag train-split
    documents sharing any {_BLOOM_N}-gram with the test split, reporting
    the distinct leaked-shingle count and a digest of the smallest leak.

    The scale path: the test side's distinct shingles are folded into a
    {_BLOOM_M}-bit / {_BLOOM_K}-hash Bloom bitmap (bit positions computed
    IN SPARK, only the set positions — bounded by M — reach the driver),
    broadcast to every executor, and applied to the train shingle stream
    as an Arrow-batched membership test BEFORE any shuffle. Only the
    surviving candidates (true leaks + ~5% false positives at design
    load) enter the exact broadcast confirm join, which removes the false
    positives — so the answer equals the exact join's, and the oracle
    computes exactly that. At 100 TB the train side never shuffles its
    shingle fan-out; the bitmap is KBs regardless of corpus size."""
    from .textshared import norm_docs_shared, word_shingles4_shared

    # r13: the corpus-wide distinct 4-gram frame (already persisted by
    # shared_frame) is shared with the exact screen, the novelty score
    # and the pretraining prep (_BLOOM_N == 4 == the frame's width)
    assert _BLOOM_N == 4
    sh = word_shingles4_shared(spark, sf_dir)
    split = norm_docs_shared(spark, sf_dir).select(
        "doc_id", F.expr(_SPLIT_CASE.format(st="STRING")).alias("split")
    )
    test_sh = (
        sh.join(split.filter(F.col("split") == "test"), "doc_id")
        .select("s")
        .distinct()
    )
    # Bloom build: positions computed distributed; only distinct set bits
    # (≤ M = 16 KiB of ints) are collected.
    positions = (
        test_sh.select(
            F.explode(F.array(*_bloom_position_cols(F.col("s")))).alias("pos")
        )
        .distinct()
    )
    bits = bytearray(_BLOOM_M // 8)
    for row in positions.collect():
        p = row.pos
        bits[p >> 3] |= 1 << (p & 7)
    bloom_bc = spark.sparkContext.broadcast(bytes(bits))

    # probe: positions as JVM columns (IDENTICAL expression to the build
    # side), bit test as one vectorized numpy gather per batch — no
    # per-row Python and no hashing in Python (was hashlib.md5 per
    # shingle, the dominant cost; guide §4.2). Nondeterministic pin per
    # guide §4.4 so the optimizer cannot duplicate the Python eval
    # around the pushed filter.
    @F.pandas_udf("boolean")
    def bloom_maybe(p0: pd.Series, p1: pd.Series, p2: pd.Series) -> pd.Series:
        arr = np.frombuffer(bloom_bc.value, dtype=np.uint8)
        ok = np.ones(len(p0), dtype=bool)
        for pc in (p0, p1, p2):
            p = pc.to_numpy()
            ok &= (arr[p >> 3] & (1 << (p & 7)).astype(np.uint8)) != 0
        return pd.Series(ok)

    bloom_maybe = bloom_maybe.asNondeterministic()

    train_sh = sh.join(split.filter(F.col("split") == "train"), "doc_id")
    candidates = train_sh.filter(
        bloom_maybe(*_bloom_position_cols(F.col("s")))
    )
    return (
        candidates.join(F.broadcast(test_sh), "s")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_leaked"),
            F.min(F.md5("s")).alias("leak_digest"),
        )
    )


# ---------------------------------------------------------------------------
# curation_decontaminate_fuzzy — near-duplicate benchmark leakage (MinHash)
# ---------------------------------------------------------------------------

# Exact n-gram screens (curation_decontaminate_train / _bloom) miss
# lightly-paraphrased benchmark copies; the LSH band pipeline already
# built for dedup finds them. This reuses dedup.py's capped band
# candidate pairs verbatim and keeps only pairs that CROSS the
# train/test split — the contamination feed a training run must drop.

from .dedup import _band_cap_ctes as _dedup_band_cap_ctes
from .dedup import _minhash_ctes as _dedup_minhash_ctes
from .dedup import dedup_minhash as _dedup_minhash_pairs


@query(
    "curation_decontaminate_fuzzy",
    oracle=f"""
    {_dedup_minhash_ctes()}{_dedup_band_cap_ctes()}
    , split AS (
        SELECT doc_id, {_SPLIT_CASE.format(st="VARCHAR")} AS split FROM documents
    ), crossed AS (
        SELECT CASE WHEN sa.split = 'train' THEN p.doc_a ELSE p.doc_b END
                   AS train_doc_id,
               CASE WHEN sa.split = 'train' THEN p.doc_b ELSE p.doc_a END
                   AS test_doc_id
        FROM cand_pairs p
        JOIN split sa ON sa.doc_id = p.doc_a
        JOIN split sb ON sb.doc_id = p.doc_b
        WHERE (sa.split = 'train' AND sb.split = 'test')
           OR (sa.split = 'test'  AND sb.split = 'train')
    )
    SELECT train_doc_id,
           COUNT(DISTINCT test_doc_id) AS n_test_neighbors,
           MIN(test_doc_id)            AS nearest_test_doc
    FROM crossed GROUP BY train_doc_id
    """,
)
def curation_decontaminate_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy decontamination: train-split documents that are NEAR
    DUPLICATES of test-split documents (MinHash-LSH candidate pairs
    crossing the split), with how many test docs each one collides with.
    Catches the paraphrased/templated benchmark leak the exact
    {_BLOOM_N}-gram screens cannot.

    Plan: reuses the persisted, band-capped LSH pair pipeline from
    dedup_minhash_lsh unchanged (same scale guarantees: output-sensitive
    candidate generation, star edges over hot buckets), then two
    broadcast-able joins against the stateless md5-split assignment and
    one per-train-doc aggregate. The split predicate is row-local, so at
    100 TB the only added cost over dedup is the pair→split join on
    doc_id."""
    pairs = _dedup_minhash_pairs(spark, sf_dir)
    split = table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_SPLIT_CASE.format(st="STRING")).alias("split")
    )
    sa = split.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")
    )
    sb = split.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")
    )
    crossed = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(
            ((F.col("split_a") == "train") & (F.col("split_b") == "test"))
            | ((F.col("split_a") == "test") & (F.col("split_b") == "train"))
        )
        .select(
            F.when(F.col("split_a") == "train", F.col("doc_a"))
            .otherwise(F.col("doc_b"))
            .alias("train_doc_id"),
            F.when(F.col("split_a") == "train", F.col("doc_b"))
            .otherwise(F.col("doc_a"))
            .alias("test_doc_id"),
        )
    )
    return crossed.groupBy("train_doc_id").agg(
        F.countDistinct("test_doc_id").alias("n_test_neighbors"),
        F.min("test_doc_id").alias("nearest_test_doc"),
    )
