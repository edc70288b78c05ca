"""Corpus-quality operators a large-scale training-data pipeline needs on
top of the dedup/text-analysis families: repetition filtering (the
Gopher-style "fraction of characters in repeated n-grams" screens), a
corpus-unigram surprisal score (perplexity proxy under a unigram LM), and
a PII detect/redact pass — plus the remaining portable aggregate
(median / count_if / bool_and / bool_or) and window (percent_rank /
cume_dist) families.

Reference parity: the reference engine has no relational or text surface
at all (SURVEY.md §2.D; its entire operator set is the Kinesis
source/sink, `KinesisSource.scala:71-79`, `KinesisGraphStage.scala:28-30`);
these are driver-mandated north-star extensions supplied Spark-first.

Scale notes (100 TB posture):
- Every operator here is explode → hash-aggregate → (broadcast) join;
  shuffle keys are (doc_id, gram) or (tok) — high-cardinality and
  skew-free, so partial aggregation does the heavy lifting map-side.
- The unigram vocabulary join is broadcast: a natural-language vocab is
  a few million rows regardless of corpus size (Heaps' law), far under
  broadcast thresholds once counted.
- PII scrub is a pure per-row projection (regexp in whole-stage codegen,
  no Python, no shuffle) — it pipelines with the scan at any scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions import NORM_TEXT_DUCK, word_shingles
from ..io import table
from ..registry import query
from ..shared import transient_persist
from .textshared import norm_docs_shared

_NORM = NORM_TEXT_DUCK.format(col="text")

# Portable n-gram CTE fragment (DuckDB): 1-based list slices, RANGE upper
# bound exclusive, so n-grams of an L-token list are i ∈ [1, L-n+1].
def _grams_duck(n: int) -> str:
    joined = " || ' ' || ".join(f"w[i+{j}]" if j else "w[i]" for j in range(n))
    return (
        f"UNNEST(CASE WHEN LEN(w) >= {n} "
        f"THEN LIST_TRANSFORM(RANGE(1, LEN(w) - {n - 2}), i -> {joined}) "
        f"ELSE [] END)"
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition screen
# ---------------------------------------------------------------------------

@query(
    "text_repetition_filter",
    oracle=f"""
    WITH norm AS (
        SELECT doc_id, {_NORM} AS t FROM documents
    ), toks AS (
        SELECT doc_id, LENGTH(t) AS n_chars, STRING_SPLIT(t, ' ') AS w FROM norm
    ), g2 AS (
        SELECT doc_id, n_chars, {_grams_duck(2)} AS g FROM toks
    ), c2 AS (
        SELECT doc_id, n_chars, g, COUNT(*) AS n FROM g2 GROUP BY ALL
    ), top2 AS (
        SELECT doc_id, g AS top_bigram, n * LENGTH(g) AS top_chars
        FROM c2
        QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n DESC, g ASC) = 1
    ), g3 AS (
        SELECT doc_id, {_grams_duck(3)} AS g FROM toks
    ), c3 AS (
        SELECT doc_id, g, COUNT(*) AS n FROM g3 GROUP BY ALL
    ), dup3 AS (
        SELECT doc_id, SUM(n * LENGTH(g)) AS dup_chars
        FROM c3 WHERE n > 1 GROUP BY doc_id
    )
    SELECT t.doc_id,
           top2.top_bigram,
           ROUND(COALESCE(top2.top_chars * 1.0 / NULLIF(t.n_chars, 0), 0.0), 4)
               AS top_bigram_frac,
           ROUND(COALESCE(dup3.dup_chars * 1.0 / NULLIF(t.n_chars, 0), 0.0), 4)
               AS dup_trigram_frac,
           (COALESCE(top2.top_chars * 1.0 / NULLIF(t.n_chars, 0), 0.0) <= 0.2
            AND COALESCE(dup3.dup_chars * 1.0 / NULLIF(t.n_chars, 0), 0.0) <= 0.6)
               AS keep
    FROM toks t
    LEFT JOIN top2 ON t.doc_id = top2.doc_id
    LEFT JOIN dup3 ON t.doc_id = dup3.doc_id
    """,
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality screen: per document, the fraction of characters
    covered by (a) the single most frequent word bigram and (b) all word
    trigrams that occur more than once — the Gopher-report style repetition
    filters. ``keep`` applies fixed thresholds (0.2 / 0.6).

    Plan: two explode→hash-agg pipelines over (doc_id, gram) — partial
    aggregation collapses the fan-out map-side; the bigram argmax is a
    per-doc ``row_number`` (ties broken lexicographically, deterministic);
    both per-doc aggregates join back to the doc list. All shuffle keys
    are doc_id — uniform, skew-free, so the shape holds at corpus scale.
    """
    base = norm_docs_shared(spark, sf_dir).select(
        "doc_id",
        F.col("w").alias("toks"),
        F.char_length("t").alias("n_chars"),
    )
    g2 = base.select("doc_id", F.explode(word_shingles("toks", 2)).alias("g"))
    c2 = g2.groupBy("doc_id", "g").agg(F.count("*").alias("n"))
    w = Window.partitionBy("doc_id").orderBy(F.col("n").desc(), F.col("g").asc())
    top2 = (
        c2.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("g").alias("top_bigram"),
            (F.col("n") * F.char_length("g")).alias("top_chars"),
        )
    )
    g3 = base.select("doc_id", F.explode(word_shingles("toks", 3)).alias("g"))
    dup3 = (
        g3.groupBy("doc_id", "g")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .groupBy("doc_id")
        .agg(F.sum(F.col("n") * F.char_length("g")).alias("dup_chars"))
    )
    nz = F.nullif(F.col("n_chars").cast("double"), F.lit(0.0))
    top_frac = F.coalesce(F.col("top_chars") / nz, F.lit(0.0))
    dup_frac = F.coalesce(F.col("dup_chars") / nz, F.lit(0.0))
    return (
        base.select("doc_id", "n_chars")
        .join(top2, "doc_id", "left")
        .join(dup3, "doc_id", "left")
        .select(
            "doc_id",
            "top_bigram",
            F.round(top_frac, 4).alias("top_bigram_frac"),
            F.round(dup_frac, 4).alias("dup_trigram_frac"),
            ((top_frac <= 0.2) & (dup_frac <= 0.6)).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# Unigram-LM surprisal (perplexity proxy)
# ---------------------------------------------------------------------------

@query(
    "text_unigram_surprisal",
    oracle=f"""
    WITH norm AS (
        SELECT doc_id, {_NORM} AS t FROM documents
    ), toks AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(t, ' ')) AS tok FROM norm
    ), vocab AS (
        SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok
    ), model AS (
        SELECT tok, -LOG2(cnt * 1.0 / (SELECT SUM(cnt) FROM vocab)) AS surprisal
        FROM vocab
    )
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           ROUND(AVG(m.surprisal), 4) AS avg_surprisal_bits
    FROM toks t JOIN model m USING (tok)
    GROUP BY t.doc_id
    """,
)
def text_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity proxy under a corpus-fit unigram LM: mean per-token
    surprisal ``-log2 p(tok)`` per document. Low-surprisal documents are
    repetitive boilerplate; very high ones are noise — both are standard
    pre-training prune targets.

    Plan: one explode feeds BOTH the model fit (tok → count, a map-side-
    partial hash agg) and the scoring join. The vocabulary is broadcast:
    by Heaps' law it grows ~O(corpus^0.5), a few million rows even at
    100 TB, so scoring is a broadcast hash join that pipelines with the
    token stream — no shuffle of the token fan-out at all; the only
    doc-keyed shuffle is the final per-doc average.
    """
    from .textshared import doc_tokens_shared

    toks = doc_tokens_shared(spark, sf_dir)
    vocab = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    model = vocab.crossJoin(F.broadcast(total)).select(
        "tok", (-F.log2(F.col("cnt") / F.col("total"))).alias("surprisal")
    )
    return (
        toks.join(F.broadcast(model), "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg("surprisal"), 4).alias("avg_surprisal_bits"),
        )
    )


# ---------------------------------------------------------------------------
# PII detect / redact
# ---------------------------------------------------------------------------

# RE2- and Java-regex portable patterns (no lookaround, \b supported by both)
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_LONG_DIGITS = r"\d{6,}"


def scrub_pii(df: DataFrame, text_col: str = "text", keep: tuple[str, ...] = ()) -> DataFrame:
    """Per-row PII scrub: count emails / IPv4s / long digit runs in
    ``text_col`` and produce an md5 of the redacted text (email → <EMAIL>,
    ip → <IP>, digit run → <NUM>, replaced in that order).

    Pure projection — regexps run inside whole-stage codegen, no Python,
    no shuffle; the scrub pipelines with the scan at any corpus size.
    """
    c = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(c, PII_EMAIL, "<EMAIL>"), PII_IPV4, "<IP>"
        ),
        PII_LONG_DIGITS,
        "<NUM>",
    )
    return df.select(
        *keep,
        F.regexp_count(c, F.lit(PII_EMAIL)).alias("n_emails"),
        F.regexp_count(c, F.lit(PII_IPV4)).alias("n_ipv4"),
        F.regexp_count(c, F.lit(PII_LONG_DIGITS)).alias("n_digit_runs"),
        F.md5(redacted).alias("redacted_md5"),
    )


@query(
    "text_pii_scrub",
    oracle=f"""
    SELECT doc_id,
           LEN(REGEXP_EXTRACT_ALL(text, '{PII_EMAIL}')) AS n_emails,
           LEN(REGEXP_EXTRACT_ALL(text, '{PII_IPV4}')) AS n_ipv4,
           LEN(REGEXP_EXTRACT_ALL(text, '{PII_LONG_DIGITS}')) AS n_digit_runs,
           MD5(REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(
               text, '{PII_EMAIL}', '<EMAIL>', 'g'),
                     '{PII_IPV4}', '<IP>', 'g'),
                     '{PII_LONG_DIGITS}', '<NUM>', 'g')) AS redacted_md5
    FROM documents
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over the corpus. The synthetic corpus contains no PII, so
    counts are 0 here — but the oracle still verifies the full redaction
    pipeline byte-for-byte via the md5 of the redacted text on every row;
    detection behavior on PII-bearing rows is pinned by the crafted-input
    unit test (tests/test_textquality.py)."""
    return scrub_pii(table(spark, sf_dir, "documents"), "text", keep=("doc_id",))


# ---------------------------------------------------------------------------
# Portable aggregate family: median / count_if / bool_and / bool_or
# ---------------------------------------------------------------------------

@query(
    "agg_median_countif_bool",
    oracle="""
    SELECT event_type,
           ROUND(MEDIAN(value), 4) AS median_value,
           COUNT(*) FILTER (WHERE value > 250) AS n_high,
           BOOL_AND(value >= 0) AS all_nonneg,
           BOOL_OR(value > 480) AS any_extreme
    FROM events
    GROUP BY event_type
    """,
)
def agg_median_countif_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median (interpolated, identical definition in both engines)
    plus conditional-count and boolean aggregates per event type. One hash
    aggregate; median needs per-group sorted values, which Spark handles
    with an ObjectHashAggregate — fine for bounded group counts like
    event_type (single digit cardinality regardless of row count)."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.median("value"), 4).alias("median_value"),
        F.count_if(F.col("value") > 250).alias("n_high"),
        F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
        F.bool_or(F.col("value") > 480).alias("any_extreme"),
    )


# ---------------------------------------------------------------------------
# Window family: percent_rank / cume_dist
# ---------------------------------------------------------------------------

@query(
    "window_percent_rank_cume",
    oracle="""
    SELECT c_nationkey,
           c_custkey,
           c_acctbal,
           ROUND(PERCENT_RANK() OVER w, 4) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 4) AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal)
    """,
)
def window_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-position analytics: percent_rank and cume_dist of each
    customer's balance within its nation. Tie rows share identical values
    under both functions, so the result is deterministic without a
    tiebreaker. Single shuffle on the partition key."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal")
    return c.select(
        "c_nationkey",
        "c_custkey",
        "c_acctbal",
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
    )


# ---------------------------------------------------------------------------
# text_bigram_lm_kneser_ney — interpolated-KN bigram LM perplexity proxy
# ---------------------------------------------------------------------------

_KN_D = 0.75  # absolute discount


@query(
    "text_bigram_lm_kneser_ney",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, STRING_SPLIT({_NORM}, ' ') AS w FROM documents
    ), bigrams AS (
        SELECT doc_id,
               UNNEST(CASE WHEN LEN(w) >= 2
                           THEN LIST_TRANSFORM(RANGE(1, LEN(w)), i -> w[i])
                           ELSE [] END) AS w1,
               UNNEST(CASE WHEN LEN(w) >= 2
                           THEN LIST_TRANSFORM(RANGE(1, LEN(w)), i -> w[i+1])
                           ELSE [] END) AS w2
        FROM toks
    ), cb AS (
        SELECT w1, w2, COUNT(*) AS c FROM bigrams GROUP BY w1, w2
    ), cu AS (
        SELECT w1, SUM(c) AS c1, COUNT(*) AS n1_fwd FROM cb GROUP BY w1
    ), cont AS (
        SELECT w2, COUNT(*) AS n1_back FROM cb GROUP BY w2
    ), types AS (
        SELECT COUNT(*) AS t FROM cb
    ), model AS (
        SELECT cb.w1, cb.w2,
               (GREATEST(cb.c - {_KN_D}, 0) / cu.c1)
               + ({_KN_D} * cu.n1_fwd / cu.c1) * (cont.n1_back * 1.0 / types.t)
                   AS p_kn
        FROM cb JOIN cu USING (w1) JOIN cont USING (w2) CROSS JOIN types
    )
    SELECT b.doc_id,
           COUNT(*) AS n_bigrams,
           ROUND(AVG(-LOG2(m.p_kn)), 4) AS avg_surprisal_bits
    FROM bigrams b JOIN model m ON m.w1 = b.w1 AND m.w2 = b.w2
    GROUP BY b.doc_id
    """,
)
def text_bigram_lm_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM fit on the corpus, scoring each
    document by mean per-bigram surprisal — the CCNet-style LM-quality
    filter one tier above unigram surprisal: KN's continuation
    probability ranks tokens by how many CONTEXTS they follow, so
    formulaic boilerplate (few contexts, high raw frequency) scores
    differently than fluent text.

    Plan: ONE bigram explode is persisted and feeds the count model
    (bigram counts → left/continuation marginals, all map-side partial
    hash-aggs into Heaps-law-bounded tables) and the scoring join; the
    model is broadcast — a natural-language bigram table is millions of
    rows regardless of corpus size — so scoring pipelines with the
    stream and the only doc-keyed shuffle is the final average."""
    toks = norm_docs_shared(spark, sf_dir).select("doc_id", "w")
    bigrams = (
        toks.select("doc_id", F.explode(word_shingles("w", 2)).alias("bg"))
        .select(
            "doc_id",
            F.split("bg", " ")[0].alias("w1"),
            F.split("bg", " ")[1].alias("w2"),
        )
    )
    bigrams = transient_persist(bigrams)
    cb = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    cu = cb.groupBy("w1").agg(
        F.sum("c").alias("c1"), F.count("*").alias("n1_fwd")
    )
    cont = cb.groupBy("w2").agg(F.count("*").alias("n1_back"))
    types = cb.agg(F.count("*").alias("t"))
    model = (
        cb.join(cu, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(types))
        .select(
            "w1",
            "w2",
            (
                F.greatest(F.col("c") - _KN_D, F.lit(0)) / F.col("c1")
                + (_KN_D * F.col("n1_fwd") / F.col("c1"))
                * (F.col("n1_back") * 1.0 / F.col("t"))
            ).alias("p_kn"),
        )
    )
    return (
        bigrams.join(F.broadcast(model), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(-F.log2("p_kn")), 4).alias("avg_surprisal_bits"),
        )
    )


# ---------------------------------------------------------------------------
# curation_gopher_quality_rules — the Gopher rule battery as a source report
# ---------------------------------------------------------------------------

_GOPHER_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "that")
_GOPHER_MIN_WORDS = 50
_GOPHER_MAX_WORDS = 100_000


@query(
    "curation_gopher_quality_rules",
    oracle=f"""
    WITH norm AS (
        SELECT doc_id, source, {_NORM} AS t FROM documents
    ), base AS (
        SELECT doc_id, source,
               LEN(STRING_SPLIT(t, ' '))              AS n_words,
               LENGTH(REPLACE(t, ' ', ''))            AS n_alpha
        FROM norm
    ), words AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(t, ' ')) AS w FROM norm
    ), wc AS (
        SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY 1, 2
    ), per_doc AS (
        SELECT doc_id,
               COUNT(*)  AS n_distinct,
               MAX(c)    AS top_cnt,
               SUM(CASE WHEN w IN {_GOPHER_STOPWORDS} THEN 1 ELSE 0 END) AS n_stop_kinds
        FROM wc GROUP BY doc_id
    ), flags AS (
        SELECT b.source,
               (b.n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS})
                                                            AS r_word_count,
               (3 * b.n_words <= b.n_alpha
                AND b.n_alpha <= 10 * b.n_words)             AS r_mean_word_len,
               (p.n_stop_kinds >= 2)                         AS r_stopwords,
               (5 * p.top_cnt <= b.n_words)                  AS r_repetition,
               (5 * p.n_distinct >= b.n_words)               AS r_distinct_ratio
        FROM base b JOIN per_doc p USING (doc_id)
    )
    SELECT source,
           COUNT(*)                                            AS n_docs,
           CAST(SUM(CASE WHEN NOT r_word_count    THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_word_count,
           CAST(SUM(CASE WHEN NOT r_mean_word_len THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_mean_word_len,
           CAST(SUM(CASE WHEN NOT r_stopwords     THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_stopwords,
           CAST(SUM(CASE WHEN NOT r_repetition    THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_repetition,
           CAST(SUM(CASE WHEN NOT r_distinct_ratio THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_distinct_ratio,
           CAST(SUM(CASE WHEN r_word_count AND r_mean_word_len AND r_stopwords
                     AND r_repetition AND r_distinct_ratio THEN 1 ELSE 0 END) AS BIGINT)
                                                               AS n_pass_all,
           FLOOR(SUM(CASE WHEN r_word_count AND r_mean_word_len AND r_stopwords
                           AND r_repetition AND r_distinct_ratio THEN 1 ELSE 0 END)
                 * 10000.0 / COUNT(*) + 0.5) / 10000.0         AS pass_rate
    FROM flags
    GROUP BY source
    """,
)
def curation_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher quality-rule battery (Rae et al. 2021, §A1.1) as a
    per-source report: word-count bounds [{_GOPHER_MIN_WORDS},
    {_GOPHER_MAX_WORDS}], mean word length in [3, 10], ≥2 distinct common
    stopwords present, no single word above 20% of the document, and ≥20%
    distinct words — the filter bank every pretraining corpus passes
    through before dedup, rolled up to per-rule fail counts so a curator
    sees WHICH rule is killing WHICH source.

    Determinism: every rule is exact integer arithmetic (the mean-length
    band is 3·n ≤ chars ≤ 10·n, never a float division), so the booleans
    cannot ride a float boundary; only the final pass_rate crosses a
    ratio, FLOOR-rounded at 4dp.

    Scale shape: one explode → (doc, word) hash-agg → per-doc agg — the
    same two-level shape as the TF-IDF family; per-source rollup is a
    dimension-sized aggregate. Nothing is quadratic, nothing collects."""
    norm = norm_docs_shared(spark, sf_dir).select("doc_id", "source", "t")
    base = norm.select(
        "doc_id",
        "source",
        F.size(F.split("t", " ")).alias("n_words"),
        F.length(F.replace(F.col("t"), F.lit(" "), F.lit(""))).alias("n_alpha"),
    )
    wc = (
        norm.select("doc_id", F.explode(F.split("t", " ")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
    )
    per_doc = wc.groupBy("doc_id").agg(
        F.count("*").alias("n_distinct"),
        F.max("c").alias("top_cnt"),
        F.sum(F.col("w").isin(*[s for s in _GOPHER_STOPWORDS]).cast("int")).alias(
            "n_stop_kinds"
        ),
    )
    flags = base.join(per_doc, "doc_id").select(
        "source",
        F.col("n_words").between(_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS).alias(
            "r_word_count"
        ),
        (
            (F.lit(3) * F.col("n_words") <= F.col("n_alpha"))
            & (F.col("n_alpha") <= F.lit(10) * F.col("n_words"))
        ).alias("r_mean_word_len"),
        (F.col("n_stop_kinds") >= 2).alias("r_stopwords"),
        (F.lit(5) * F.col("top_cnt") <= F.col("n_words")).alias("r_repetition"),
        (F.lit(5) * F.col("n_distinct") >= F.col("n_words")).alias(
            "r_distinct_ratio"
        ),
    )
    pass_all = (
        F.col("r_word_count")
        & F.col("r_mean_word_len")
        & F.col("r_stopwords")
        & F.col("r_repetition")
        & F.col("r_distinct_ratio")
    )
    return flags.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum((~F.col("r_word_count")).cast("int")).alias("n_fail_word_count"),
        F.sum((~F.col("r_mean_word_len")).cast("int")).alias(
            "n_fail_mean_word_len"
        ),
        F.sum((~F.col("r_stopwords")).cast("int")).alias("n_fail_stopwords"),
        F.sum((~F.col("r_repetition")).cast("int")).alias("n_fail_repetition"),
        F.sum((~F.col("r_distinct_ratio")).cast("int")).alias(
            "n_fail_distinct_ratio"
        ),
        F.sum(pass_all.cast("int")).alias("n_pass_all"),
        (
            F.floor(
                F.sum(pass_all.cast("int")) * 10000.0 / F.count("*") + 0.5
            )
            / 10000.0
        ).alias("pass_rate"),
    )


# ---------------------------------------------------------------------------
# quality_classifier_agreement_kappa — can the cheap screen replace the
# full rule battery?
# ---------------------------------------------------------------------------

_KAPPA_CHEAP_MIN_WORDS = 30   # cheap screen: minimum word count
_KAPPA_CHEAP_STOP_DEN = 25    # ...and stopword-token share >= 1/25 (4%)


@query(
    "quality_classifier_agreement_kappa",
    oracle=f"""
    WITH norm AS (
        SELECT doc_id, {_NORM} AS t FROM documents
    ), base AS (
        SELECT doc_id,
               LEN(STRING_SPLIT(t, ' '))   AS n_words,
               LENGTH(REPLACE(t, ' ', '')) AS n_alpha
        FROM norm
    ), words AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(t, ' ')) AS w FROM norm
    ), wc AS (
        SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY 1, 2
    ), per_doc AS (
        SELECT doc_id,
               COUNT(*) AS n_distinct,
               MAX(c)   AS top_cnt,
               SUM(CASE WHEN w IN {_GOPHER_STOPWORDS} THEN 1 ELSE 0 END) AS n_stop_kinds,
               SUM(CASE WHEN w IN {_GOPHER_STOPWORDS} THEN c ELSE 0 END) AS n_stop_toks
        FROM wc GROUP BY doc_id
    ), flags AS (
        SELECT
            (b.n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS}
             AND 3 * b.n_words <= b.n_alpha AND b.n_alpha <= 10 * b.n_words
             AND p.n_stop_kinds >= 2
             AND 5 * p.top_cnt <= b.n_words
             AND 5 * p.n_distinct >= b.n_words)            AS battery,
            (b.n_words >= {_KAPPA_CHEAP_MIN_WORDS}
             AND {_KAPPA_CHEAP_STOP_DEN} * p.n_stop_toks >= b.n_words) AS cheap
        FROM base b JOIN per_doc p USING (doc_id)
    ), cont AS (
        SELECT
            CAST(COUNT(*) AS BIGINT)                                       AS n_docs,
            CAST(SUM(CASE WHEN battery AND cheap THEN 1 ELSE 0 END) AS BIGINT)     AS n11,
            CAST(SUM(CASE WHEN battery AND NOT cheap THEN 1 ELSE 0 END) AS BIGINT) AS n10,
            CAST(SUM(CASE WHEN NOT battery AND cheap THEN 1 ELSE 0 END) AS BIGINT) AS n01,
            CAST(SUM(CASE WHEN NOT battery AND NOT cheap THEN 1 ELSE 0 END) AS BIGINT) AS n00
        FROM flags
    )
    SELECT n_docs, n11, n10, n01, n00,
           FLOOR((n11 + n00) * 10000.0 / n_docs + 0.5) / 10000.0 AS po4,
           FLOOR((n_docs * (n11 + n00)
                  - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)))
                 * 10000.0
                 / (n_docs * n_docs
                    - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)))
                 + 0.5) / 10000.0                                AS kappa4
    FROM cont
    """,
)
def quality_classifier_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's κ between the full Gopher rule battery and a 2-rule cheap
    screen (min {_KAPPA_CHEAP_MIN_WORDS} words + stopword-token share ≥
    1/{_KAPPA_CHEAP_STOP_DEN}) — the classifier-replacement audit: before
    swapping an expensive quality filter for a cheaper one across 100 TB,
    measure chance-corrected agreement on the corpus, not raw accuracy
    (raw agreement is inflated when both classifiers mostly say "pass").

    Determinism: the 2×2 contingency table is exact integer counts and κ
    is computed as the single exact rational
    (N·(n11+n00) − Σ marginal products) / (N² − Σ marginal products),
    FLOOR-rounded at 4dp — the nested po/pe divisions never materialize
    as floats. int64 headroom: N² < 2^63 for N < 3·10⁹ docs per audit
    slice.

    Scale shape: one explode → (doc, word) hash-agg → per-doc agg (the
    Gopher shape), then a single global conditional aggregate — output is
    ONE row regardless of corpus size."""
    norm = norm_docs_shared(spark, sf_dir).select("doc_id", "t")
    base = norm.select(
        "doc_id",
        F.size(F.split("t", " ")).alias("n_words"),
        F.length(F.replace(F.col("t"), F.lit(" "), F.lit(""))).alias("n_alpha"),
    )
    wc = (
        norm.select("doc_id", F.explode(F.split("t", " ")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
    )
    is_stop = F.col("w").isin(*list(_GOPHER_STOPWORDS))
    per_doc = wc.groupBy("doc_id").agg(
        F.count("*").alias("n_distinct"),
        F.max("c").alias("top_cnt"),
        F.sum(is_stop.cast("int")).alias("n_stop_kinds"),
        F.sum(F.when(is_stop, F.col("c")).otherwise(0)).alias("n_stop_toks"),
    )
    flags = base.join(per_doc, "doc_id").select(
        (
            F.col("n_words").between(_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS)
            & (F.lit(3) * F.col("n_words") <= F.col("n_alpha"))
            & (F.col("n_alpha") <= F.lit(10) * F.col("n_words"))
            & (F.col("n_stop_kinds") >= 2)
            & (F.lit(5) * F.col("top_cnt") <= F.col("n_words"))
            & (F.lit(5) * F.col("n_distinct") >= F.col("n_words"))
        ).alias("battery"),
        (
            (F.col("n_words") >= _KAPPA_CHEAP_MIN_WORDS)
            & (
                F.lit(_KAPPA_CHEAP_STOP_DEN) * F.col("n_stop_toks")
                >= F.col("n_words")
            )
        ).alias("cheap"),
    )
    cont = flags.agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("battery") & F.col("cheap")).cast("long")).alias("n11"),
        F.sum((F.col("battery") & ~F.col("cheap")).cast("long")).alias("n10"),
        F.sum((~F.col("battery") & F.col("cheap")).cast("long")).alias("n01"),
        F.sum((~F.col("battery") & ~F.col("cheap")).cast("long")).alias("n00"),
    )
    # marginal-products term of the exact rational κ; F.expr literals would
    # type as DECIMAL, so the 4dp rounding uses the Python-API double idiom
    marg = (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01")) + (
        F.col("n01") + F.col("n00")
    ) * (F.col("n10") + F.col("n00"))
    agree = F.col("n11") + F.col("n00")
    return cont.select(
        "n_docs",
        "n11",
        "n10",
        "n01",
        "n00",
        (F.floor(agree * 10000.0 / F.col("n_docs") + 0.5) / 10000.0).alias("po4"),
        (
            F.floor(
                (F.col("n_docs") * agree - marg)
                * 10000.0
                / (F.col("n_docs") * F.col("n_docs") - marg)
                + 0.5
            )
            / 10000.0
        ).alias("kappa4"),
    )
