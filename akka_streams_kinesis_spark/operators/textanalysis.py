"""Text-analysis operators: language ID, quality scoring, token stats,
document fingerprinting. All built-in-function plans (split/explode/regexp/
md5) — one explode + one aggregate each, no Python in the hot path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions import NORM_TEXT_DUCK, normalize_text
from ..io import fanout, table
from ..registry import query
from ..shared import shared_frame, transient_persist

_NORM = NORM_TEXT_DUCK.format(col="text")

# Marker-token sets for the n-gram/stopword language-ID heuristic. The
# corpus is synthetic, so the lists are small but the operator shape is the
# real one: token-set membership counts → argmax with a fixed tie order.
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "to", "of"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "les", "et", "des"),
    "de": ("der", "die", "das", "und", "ist"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),
}
_LANG_ORDER = ("en", "es", "fr", "de", "zh")

_STOPWORDS = ("the", "a", "and", "to", "of", "in", "is", "on", "for", "with")


def _in_list_sql(col: str, words: tuple[str, ...]) -> str:
    quoted = ", ".join(f"'{w}'" for w in words)
    return f"(CASE WHEN {col} IN ({quoted}) THEN 1 ELSE 0 END)"


def _langid_score_sql() -> str:
    return ",\n           ".join(
        f"CAST(SUM({_in_list_sql('tok', _LANG_MARKERS[lang])}) AS BIGINT) AS score_{lang}"
        for lang in _LANG_ORDER
    )


def _langid_pick_sql() -> str:
    """argmax over the per-language scores, ties broken by _LANG_ORDER."""
    best = "GREATEST(" + ", ".join(f"score_{l}" for l in _LANG_ORDER) + ")"
    chain = " ".join(
        f"WHEN score_{l} = {best} THEN '{l}'" for l in _LANG_ORDER
    )
    return f"(CASE {chain} END)"


_LANGID_AGG_SQL = f"""
    SELECT doc_id,
           {_langid_score_sql()}
    FROM doc_tokens
    GROUP BY doc_id
"""

_LANGID_FINAL_SQL = f"""
    SELECT doc_id,
           {_langid_pick_sql()} AS pred_lang,
           GREATEST({', '.join('score_' + l for l in _LANG_ORDER)}) AS best_score
    FROM scored
"""


@query(
    "text_language_id",
    oracle=f"""
    WITH norm AS (
        SELECT doc_id, {_NORM} AS t FROM documents
    ), doc_tokens AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(t, ' ')) AS tok FROM norm
    ), scored AS (
        {_LANGID_AGG_SQL}
    )
    {_LANGID_FINAL_SQL}
    """,
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID: per-language token-hit counts → argmax
    with a deterministic tie order. The scoring SQL text is shared verbatim
    with the DuckDB oracle."""
    from .textshared import doc_tokens_shared

    doc_tokens_shared(spark, sf_dir).createOrReplaceTempView("doc_tokens")
    spark.sql(_LANGID_AGG_SQL).createOrReplaceTempView("scored")
    return spark.sql(_LANGID_FINAL_SQL)


@query(
    "text_quality_scores",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, text, {_NORM} AS t FROM documents
    )
    SELECT doc_id,
           LENGTH(text) AS n_chars_raw,
           LEN(STRING_SPLIT(t, ' ')) AS n_tokens,
           ROUND(CAST(LENGTH(REPLACE(t, ' ', '')) AS DOUBLE)
                 / LEN(STRING_SPLIT(t, ' ')), 4) AS avg_token_len,
           ROUND(CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
                 / LENGTH(text), 4) AS punct_ratio
    FROM base
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features: raw length, token count, mean token
    length, punctuation ratio. Pure scalar projection — embarrassingly
    parallel, no shuffle at all."""
    d = table(spark, sf_dir, "documents")
    t = normalize_text(F.col("text"))
    n_tokens = F.size(F.split(t, " "))
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_raw"),
        n_tokens.alias("n_tokens"),
        F.round(
            F.length(F.replace(t, F.lit(" "), F.lit(""))).cast("double") / n_tokens, 4
        ).alias("avg_token_len"),
        F.round(
            (
                F.length("text")
                - F.length(F.regexp_replace("text", "[^a-zA-Z0-9 ]", ""))
            ).cast("double")
            / F.length("text"),
            4,
        ).alias("punct_ratio"),
    )


@query(
    "text_stopword_ratio",
    oracle=f"""
    WITH norm AS (
        SELECT doc_id, {_NORM} AS t FROM documents
    ), doc_tokens AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(t, ' ')) AS tok FROM norm
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM({_in_list_sql('tok', _STOPWORDS)}) AS BIGINT) AS n_stopwords,
           ROUND(CAST(SUM({_in_list_sql('tok', _STOPWORDS)}) AS DOUBLE) / COUNT(*), 4)
               AS stopword_ratio
    FROM doc_tokens
    GROUP BY doc_id
    """,
)
def text_stopword_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword density per document (quality-filter staple)."""
    from .textshared import doc_tokens_shared

    toks = doc_tokens_shared(spark, sf_dir)
    is_stop = F.col("tok").isin(*_STOPWORDS).cast("long")
    return toks.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(is_stop).alias("n_stopwords"),
        F.round(F.sum(is_stop).cast("double") / F.count("*"), 4).alias("stopword_ratio"),
    )


@query(
    "text_top_tokens",
    oracle=f"""
    WITH norm AS (
        SELECT doc_id, {_NORM} AS t FROM documents
    ), doc_tokens AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(t, ' ')) AS tok FROM norm
    )
    SELECT tok, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS doc_freq
    FROM doc_tokens
    GROUP BY tok
    ORDER BY n DESC, tok
    LIMIT 20
    """,
)
def text_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token statistics: top-20 tokens by term frequency with
    document frequency. explode → hash-agg (map-side partials carry the
    heavy lifting) → TakeOrdered top-k."""
    from .textshared import doc_tokens_shared

    toks = doc_tokens_shared(spark, sf_dir)
    return (
        toks.groupBy("tok")
        .agg(F.count("*").alias("n"), F.countDistinct("doc_id").alias("doc_freq"))
        .orderBy(F.col("n").desc(), F.col("tok"))
        .limit(20)
    )


@query(
    "text_fingerprint",
    oracle="""
    WITH grams AS (
        SELECT doc_id,
               UNNEST(CASE WHEN LENGTH(text) >= 8
                           THEN LIST_TRANSFORM(RANGE(1, LENGTH(text) - 6),
                                               i -> SUBSTR(text, CAST(i AS INTEGER), 8))
                           ELSE [] END) AS g
        FROM documents
    )
    SELECT doc_id,
           MIN(MD5(g))       AS fingerprint,
           COUNT(DISTINCT g) AS n_distinct_grams
    FROM grams
    GROUP BY doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint: min-md5 over character 8-grams
    (the min-sampling end of a winnowing scheme). Lexicographic min of hex
    digests is engine-portable; the aggregate is a single hash-agg whose
    shuffle rows are (doc_id, 32-char digest) partials, not the grams."""
    d = fanout(table(spark, sf_dir, "documents"))
    # explode a PRIMITIVE position sequence and slice the gram after the
    # generate, never a per-row array of n string grams: the transient
    # per-document allocation is 8 bytes/position instead of a whole
    # second copy of the text ×8 — the difference between a long document
    # costing kilobytes and costing megabytes of task memory (an sf1
    # canary run OOMed a 1 GiB session on the materialized-array form)
    grams = (
        d.filter(F.char_length("text") >= 8)
        .select(
            "doc_id",
            "text",
            F.explode(
                F.sequence(F.lit(1), F.char_length("text") - 7)
            ).alias("i"),
        )
        .select("doc_id", F.expr("substring(text, i, 8)").alias("g"))
    )
    # two-level aggregate instead of countDistinct: the (doc_id, g) partial
    # aggregation dedups map-side BEFORE the shuffle, and avoids the Expand
    # node countDistinct+min would plan; md5 runs once per distinct gram.
    distinct_grams = grams.groupBy("doc_id", "g").agg(F.lit(1).alias("_one"))
    return distinct_grams.groupBy("doc_id").agg(
        F.min(F.md5("g")).alias("fingerprint"),
        F.count("*").alias("n_distinct_grams"),
    )


@query(
    "text_tfidf_top_terms",
    oracle=f"""
    WITH norm AS (
        SELECT doc_id, {_NORM} AS t FROM documents
    ), doc_tokens AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(t, ' ')) AS tok FROM norm
    ), tf AS (
        SELECT doc_id, tok, COUNT(*) AS tf FROM doc_tokens GROUP BY doc_id, tok
    ), idf AS (
        SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
    ), n AS (
        SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents
    ), scored AS (
        SELECT tf.doc_id, tf.tok, tf.tf, idf.df,
               ROUND(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / idf.df), 4) AS tfidf
        FROM tf JOIN idf ON tf.tok = idf.tok CROSS JOIN n
    )
    SELECT doc_id, tok, tf, df, tfidf
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY tfidf DESC, tok) AS rnk
          FROM scored)
    WHERE rnk <= 3
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: term frequency per (doc, token), document frequency per
    token, top-3 terms per document by tf·ln(N/df).

    Plan shape at scale: the tf aggregate rides the (doc-partitioned)
    explode; df is a second aggregate over tf's (already deduped) output —
    NOT over raw tokens, which cuts its input by the in-doc repeat factor;
    N broadcasts as a single-row build side. Ranking uses the ROUNDED score
    plus token tiebreak so the top-3 cut is identical on both engines."""
    d = fanout(table(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id", F.explode(F.split(normalize_text(F.col("text")), " ")).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    idf = tf.groupBy(F.col("tok").alias("i_tok")).agg(F.count("*").alias("df"))
    n_docs = table(spark, sf_dir, "documents").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    scored = (
        tf.join(idf, F.col("tok") == F.col("i_tok"))
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "tok",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 4
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("tok"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "tok", "tf", "df", "tfidf")
    )


@query(
    "pipeline_quality_dedup_filter",
    oracle=f"""
    WITH norm AS (
        SELECT doc_id, lang, {_NORM} AS t, text FROM documents
    ), feats AS (
        SELECT doc_id, lang,
               LEN(STRING_SPLIT(t, ' ')) AS n_tokens,
               ROUND(CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
                     / LENGTH(text), 4) AS punct_ratio
        FROM norm
    ), keepers AS (
        SELECT MIN(doc_id) AS doc_id FROM norm GROUP BY MD5(t)
    )
    SELECT f.doc_id, f.lang, f.n_tokens, f.punct_ratio
    FROM feats f
    JOIN keepers k ON f.doc_id = k.doc_id
    WHERE f.n_tokens >= 20 AND f.punct_ratio <= 0.2
    """,
)
def pipeline_quality_dedup_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation pipeline in one plan: normalize → exact-dedup
    keep set (min doc_id per normalized hash) → quality features → threshold
    filter. This is the composition a pretraining data pipeline actually
    runs; here it is ONE Catalyst plan — the dedup aggregate and the feature
    projection share the single documents scan, and the keep-set join is a
    semi join on doc_id.

    Thresholds are plain numeric comparisons on 4dp-rounded ratios, so the
    filter cut is engine-stable."""
    d = table(spark, sf_dir, "documents")
    t = normalize_text(F.col("text"))
    feats = d.select(
        "doc_id",
        "lang",
        F.size(F.split(t, " ")).alias("n_tokens"),
        F.round(
            (
                F.length("text")
                - F.length(F.regexp_replace("text", "[^a-zA-Z0-9 ]", ""))
            ).cast("double")
            / F.length("text"),
            4,
        ).alias("punct_ratio"),
    )
    keepers = (
        d.select("doc_id", F.md5(t).alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("keep_id"))
        .select("keep_id")
    )
    return (
        feats.join(keepers, feats.doc_id == keepers.keep_id, "left_semi")
        .filter((F.col("n_tokens") >= 20) & (F.col("punct_ratio") <= 0.2))
        .select("doc_id", "lang", "n_tokens", "punct_ratio")
    )


_CHUNK = 128   # tokens per chunk
_STRIDE = 96   # chunk stride (32-token overlap)


@query(
    "text_chunk_windows",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, STRING_SPLIT({_NORM}, ' ') AS w FROM documents
    ), chunks AS (
        SELECT doc_id,
               UNNEST(RANGE(0, CAST(CEIL(LEN(w) / {_STRIDE}.0) AS BIGINT))) AS chunk_idx,
               w
        FROM toks
    )
    SELECT doc_id, chunk_idx,
           LEN(w[chunk_idx * {_STRIDE} + 1 : chunk_idx * {_STRIDE} + {_CHUNK}]) AS chunk_tokens,
           MD5(ARRAY_TO_STRING(w[chunk_idx * {_STRIDE} + 1 : chunk_idx * {_STRIDE} + {_CHUNK}], ' '))
               AS chunk_digest
    FROM chunks
    """,
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window document chunking — the retrieval/packing prep
    step (128-token chunks, 96-token stride → 32-token overlap so no
    boundary sentence is lost). Emits (doc_id, chunk_idx, chunk_tokens,
    chunk_digest); the md5 digest stands in for the chunk payload in the
    hash gate and doubles as a chunk-level dedup key downstream.

    Pure explode of a sequence + JVM-side slice/hash — row-local, no
    shuffle; the chunk fan-out is bounded by doc length / stride. DuckDB
    1-based LIST slicing == Spark's 1-based F.slice, and both engines cap
    the slice at the array end, so the trailing partial chunk agrees."""
    from .textshared import norm_docs_shared

    toks = norm_docs_shared(spark, sf_dir).select("doc_id", "w")
    n_chunks = F.ceil(F.size("w") / float(_STRIDE)).cast("long")
    chunks = toks.select(
        "doc_id", "w",
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("chunk_idx"),
    )
    window = F.slice("w", (F.col("chunk_idx") * _STRIDE + 1).cast("int"), _CHUNK)
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.size(window).alias("chunk_tokens"),
        F.md5(F.array_join(window, " ")).alias("chunk_digest"),
    )


# ---------------------------------------------------------------------------
# text_duplicate_spans — exact-substring duplication, span-merged per doc
# ---------------------------------------------------------------------------

_SPAN_K = 30  # character gram width: the "verbatim copy" detection unit


@query(
    "text_duplicate_spans",
    oracle=f"""
    WITH pos AS (
        SELECT doc_id, text,
               UNNEST(RANGE(1, LEN(text) - {_SPAN_K} + 2)) AS p
        FROM documents WHERE LEN(text) >= {_SPAN_K}
    ), grams AS (
        SELECT doc_id, p, MD5(SUBSTR(text, CAST(p AS INTEGER), {_SPAN_K})) AS dig
        FROM pos
    ), dupdig AS (
        SELECT dig FROM grams GROUP BY dig
        HAVING COUNT(DISTINCT doc_id) > 1
    ), marked AS (
        SELECT g.doc_id, g.p,
               g.p - ROW_NUMBER() OVER (PARTITION BY g.doc_id ORDER BY g.p)
                   AS island
        FROM grams g JOIN dupdig USING (dig)
    ), spans AS (
        SELECT doc_id,
               MIN(p) AS span_start,
               MAX(p) + {_SPAN_K} - 1 AS span_end
        FROM marked GROUP BY doc_id, island
    )
    SELECT doc_id,
           COUNT(*) AS n_spans,
           CAST(SUM(span_end - span_start + 1) AS BIGINT) AS dup_chars,
           CAST(MAX(span_end - span_start + 1) AS BIGINT) AS max_span_len
    FROM spans GROUP BY doc_id
    """,
)
def text_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication audit in the style of Lee et al.,
    "Deduplicating Training Data Makes Language Models Better" (ACL 2022
    — public paper): every {_SPAN_K}-char gram that appears verbatim in
    more than one document marks its positions, and runs of consecutive
    marked positions merge into SPANS (start/extent of copied text), the
    unit substring-level dedup would actually trim. Per-doc rollup:
    span count, duplicated chars, longest span.

    Plan shape: position fan-out → md5-digest grams (the shuffle carries
    16-byte digests + ints, never text) → cross-doc document-frequency
    agg → one equi-join marking duplicated positions → island merge
    (pos − row_number over each doc — per-doc windows, bounded by doc
    length) → per-doc agg. Everything is linear in total characters; no
    pairwise doc joins anywhere, unlike a suffix-array build this
    approximates."""
    d = fanout(table(spark, sf_dir, "documents"))
    pos = d.filter(F.length("text") >= _SPAN_K).select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(F.lit(1), F.length("text") - _SPAN_K + 1)
        ).alias("p"),
    )
    # gram digest = xxhash64 pair (128-bit collision budget like the
    # oracle's md5, ~3× cheaper per position and half the shuffle/cache
    # width — this query hashes EVERY character position, so digest cost
    # and width dominate; the digest is a pure equality key, never
    # ordered or emitted, so the result set is unchanged)
    grams = pos.select(
        "doc_id",
        "p",
        F.xxhash64(F.expr(f"substring(text, p, {_SPAN_K})")).alias("d1"),
        F.xxhash64(F.expr(f"substring(text, p, {_SPAN_K})"), F.lit(1)).alias("d2"),
    )
    grams = transient_persist(grams)  # two consumers: the df aggregate and the mark-join
    dupdig = (
        grams.groupBy("d1", "d2")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") > 1)
        .select("d1", "d2")
    )
    marked = grams.join(dupdig, ["d1", "d2"]).select("doc_id", "p")
    w = Window.partitionBy("doc_id").orderBy("p")
    islands = marked.withColumn("island", F.col("p") - F.row_number().over(w))
    spans = islands.groupBy("doc_id", "island").agg(
        F.min("p").alias("span_start"),
        (F.max("p") + _SPAN_K - 1).alias("span_end"),
    )
    return spans.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("dup_chars"),
        F.max(F.col("span_end") - F.col("span_start") + 1).alias("max_span_len"),
    )


# ---------------------------------------------------------------------------
# text_langid_confusion — classifier evaluation against ground truth
# ---------------------------------------------------------------------------


@query(
    "text_langid_confusion",
    oracle=f"""
    WITH norm AS (
        SELECT doc_id, lang, {_NORM} AS t FROM documents
    ), doc_tokens AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(t, ' ')) AS tok FROM norm
    ), scored AS (
        SELECT doc_id,
               {_langid_score_sql()}
        FROM doc_tokens
        GROUP BY doc_id
    ), pred AS (
        SELECT doc_id, {_langid_pick_sql()} AS pred_lang FROM scored
    )
    SELECT n.lang AS true_lang, p.pred_lang,
           COUNT(*) AS n_docs,
           ROUND(COUNT(*) * 1.0 /
                 SUM(COUNT(*)) OVER (PARTITION BY n.lang), 4) AS frac_of_true
    FROM norm n JOIN pred p USING (doc_id)
    GROUP BY n.lang, p.pred_lang
    """,
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline self-evaluation: confusion matrix of the stopword-marker
    language-ID classifier against the corpus's ground-truth ``lang``
    column, with each cell's share of its true-language row. Every
    classifier the pipeline gates on (langid, quality, CLIP filter)
    needs exactly this report before its threshold is trusted — shipping
    it as a first-class gated operator keeps the evaluation in the same
    declarative DAG as the classifier.

    Plan: the scoring pass is the same explode → per-doc hash-agg as
    text_language_id (shared SQL text); the matrix is a ≤|langs|² agg
    and the row-share window runs over that tiny aggregate."""
    from .textshared import doc_tokens_shared

    doc_tokens_shared(spark, sf_dir).createOrReplaceTempView("doc_tokens")
    spark.sql(_LANGID_AGG_SQL).createOrReplaceTempView("scored")
    pred = spark.sql(
        f"SELECT doc_id, {_langid_pick_sql()} AS pred_lang FROM scored"
    )
    truth = table(spark, sf_dir, "documents").select(
        "doc_id", F.col("lang").alias("true_lang")
    )
    m = (
        truth.join(pred, "doc_id")
        .groupBy("true_lang", "pred_lang")
        .agg(F.count("*").alias("n_docs"))
    )
    w = Window.partitionBy("true_lang")
    return m.withColumn(
        "frac_of_true", F.round(F.col("n_docs") / F.sum("n_docs").over(w), 4)
    )


# ---------------------------------------------------------------------------
# text_zipf_fit — Zipf-law slope via regression aggregates
# ---------------------------------------------------------------------------


@query(
    "text_zipf_fit",
    oracle=f"""
    WITH norm AS (
        SELECT doc_id, {_NORM} AS t FROM documents
    ), toks AS (
        SELECT UNNEST(STRING_SPLIT(t, ' ')) AS tok FROM norm
    ), vocab AS (
        SELECT tok, COUNT(*) AS freq FROM toks GROUP BY tok
    ), ranked AS (
        SELECT freq,
               ROW_NUMBER() OVER (ORDER BY freq DESC, tok) AS rank
        FROM vocab
    )
    SELECT COUNT(*) AS vocab_size,
           ROUND(REGR_SLOPE(LN(freq), LN(rank)), 4)     AS zipf_slope,
           ROUND(REGR_INTERCEPT(LN(freq), LN(rank)), 4) AS zipf_intercept,
           ROUND(REGR_R2(LN(freq), LN(rank)), 4)        AS r2
    FROM ranked
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit over the corpus vocabulary: least-squares slope,
    intercept, and R² of log-frequency vs log-rank, using the SQL
    regression aggregates (``regr_slope``/``regr_intercept``/``regr_r2``).
    Natural text sits near slope −1; a corpus whose slope drifts flat is
    boilerplate-flooded and one that's too steep lost its long tail to
    over-aggressive filtering — a one-row corpus-health gauge.

    Plan: token hash-agg → rank window over the (Heaps-law-bounded)
    vocabulary → one regression aggregate; the only full-data pass is
    the token count."""
    from .textshared import doc_tokens_shared

    toks = doc_tokens_shared(spark, sf_dir).select("tok")
    vocab = toks.groupBy("tok").agg(F.count("*").alias("freq"))
    ranked = vocab.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.col("freq").desc(), "tok")),
    )
    lf, lr = F.log("freq"), F.log("rank")
    return ranked.agg(
        F.count("*").alias("vocab_size"),
        F.round(F.expr("regr_slope(ln(freq), ln(rank))"), 4).alias(
            "zipf_slope"
        ),
        F.round(F.expr("regr_intercept(ln(freq), ln(rank))"), 4).alias(
            "zipf_intercept"
        ),
        F.round(F.expr("regr_r2(ln(freq), ln(rank))"), 4).alias("r2"),
    )


# ---------------------------------------------------------------------------
# text_ngram_entropy_filter — per-document bigram entropy (gibberish screen)
# ---------------------------------------------------------------------------


@query(
    "text_ngram_entropy_filter",
    oracle=f"""
    WITH norm AS (
        SELECT doc_id, {_NORM} AS t FROM documents
    ), toks AS (
        SELECT doc_id, STRING_SPLIT(t, ' ') AS w FROM norm
    ), bigrams AS (
        SELECT doc_id,
               UNNEST(CASE WHEN LEN(w) >= 2
                           THEN LIST_TRANSFORM(RANGE(1, LEN(w)),
                                               i -> w[i] || ' ' || w[i+1])
                           ELSE [] END) AS bg
        FROM toks
    ), cnt AS (
        SELECT doc_id, bg, COUNT(*) AS c FROM bigrams GROUP BY doc_id, bg
    ), per_doc AS (
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_bigrams,
               ROUND(LOG2(SUM(c)) - SUM(c * LOG2(c)) / SUM(c), 4) AS entropy_bits
        FROM cnt GROUP BY doc_id
    )
    SELECT doc_id, n_bigrams, entropy_bits,
           ROUND(entropy_bits / LOG2(GREATEST(n_bigrams, 2)), 4) AS entropy_ratio,
           ROUND(entropy_bits / LOG2(GREATEST(n_bigrams, 2)), 4) < 0.7
               AS low_entropy
    FROM per_doc
    """,
)
def text_ngram_entropy_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document word-bigram Shannon entropy with a relative-entropy
    flag: repetitive/templated/gibberish text concentrates probability
    mass on few bigrams and scores well below the log2(n) ceiling of an
    all-distinct document — the information-theoretic quality screen that
    catches machine-generated loops the stopword/length heuristics miss.

    The entropy identity used is shuffle-friendly: H = log2(n) −
    Σ c·log2(c) / n over per-(doc,bigram) counts, so one (doc,bigram)
    hash-agg (map-side combined) and one per-doc rollup compute it —
    no per-document probability vector ever materializes. The flag
    compares the ROUNDED ratio in both engines."""
    from .textshared import norm_docs_shared

    toks = norm_docs_shared(spark, sf_dir).select("doc_id", "w")
    bigrams = toks.filter(F.size("w") >= 2).select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, size(w) - 1), i -> concat(w[i-1], ' ', w[i]))")
        ).alias("bg"),
    )
    cnt = bigrams.groupBy("doc_id", "bg").agg(F.count("*").alias("c"))
    log2 = lambda col: F.log(2.0, col)  # noqa: E731
    per_doc = cnt.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_bigrams"),
        F.round(
            log2(F.sum("c")) - F.sum(F.col("c") * log2(F.col("c"))) / F.sum("c"), 4
        ).alias("entropy_bits"),
    )
    ratio = F.round(
        F.col("entropy_bits") / log2(F.greatest(F.col("n_bigrams"), F.lit(2))), 4
    )
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        "entropy_bits",
        ratio.alias("entropy_ratio"),
        (ratio < 0.7).alias("low_entropy"),
    )


# ---------------------------------------------------------------------------
# text_vocab_growth_heaps — Heaps'-law vocabulary growth audit
# ---------------------------------------------------------------------------


@query(
    "text_vocab_growth_heaps",
    oracle=f"""
    WITH norm AS (
        SELECT doc_id, {_NORM} AS t FROM documents
    ), toks AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(t, ' ')) AS tok FROM norm
    ), mx AS (
        SELECT MAX(doc_id) AS max_id FROM documents
    ), bucketed AS (
        SELECT LEAST(9, CAST(FLOOR(doc_id * 10.0 / (max_id + 1)) AS BIGINT))
                   AS bucket,
               tok
        FROM toks CROSS JOIN mx
    ), tok_first AS (
        SELECT tok, MIN(bucket) AS first_bucket FROM bucketed GROUP BY tok
    ), new_per_bucket AS (
        SELECT first_bucket AS bucket, COUNT(*) AS new_types
        FROM tok_first GROUP BY 1
    ), tokens_per_bucket AS (
        SELECT bucket, COUNT(*) AS n_tokens FROM bucketed GROUP BY bucket
    ), curve AS (
        SELECT t.bucket,
               CAST(SUM(t.n_tokens) OVER (ORDER BY t.bucket) AS BIGINT)
                   AS cum_tokens,
               CAST(SUM(COALESCE(n.new_types, 0)) OVER (ORDER BY t.bucket)
                    AS BIGINT) AS cum_vocab
        FROM tokens_per_bucket t
        LEFT JOIN new_per_bucket n ON n.bucket = t.bucket
    )
    SELECT bucket, cum_tokens, cum_vocab,
           ROUND(REGR_SLOPE(LN(cum_vocab), LN(cum_tokens)) OVER (), 4)
               AS heaps_beta
    FROM curve
    """,
)
def text_vocab_growth_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth: cumulative distinct token types vs
    cumulative token instances over 10 corpus prefixes, plus the fitted
    log-log slope (Heaps' β, healthy natural text ~0.4–0.6). A corpus
    whose β collapses is saturating (duplication, templating); one whose
    β stays near 1 is noise — the corpus-health dual of the Zipf fit.

    Running COUNT DISTINCT across prefixes uses the same first-occurrence
    identity as window_cumulative_distinct_users: each type counts once
    at its FIRST bucket (one token-level hash-agg), so the cumulative
    window only ever sees 10 rows. β comes from the SQL regression
    aggregate over the 10 log-log points — no driver-side fitting."""
    from .textshared import doc_tokens_shared

    d = table(spark, sf_dir, "documents")
    mx = d.agg(F.max("doc_id").alias("max_id"))
    toks = (
        doc_tokens_shared(spark, sf_dir)
        .crossJoin(F.broadcast(mx))
        .select(
            F.least(
                F.lit(9),
                F.floor(F.col("doc_id") * 10.0 / (F.col("max_id") + 1)),
            )
            .cast("bigint")
            .alias("bucket"),
            "tok",
        )
    )
    tok_first = toks.groupBy("tok").agg(F.min("bucket").alias("first_bucket"))
    new_per_bucket = tok_first.groupBy(
        F.col("first_bucket").alias("bucket")
    ).agg(F.count("*").alias("new_types"))
    tokens_per_bucket = toks.groupBy("bucket").agg(F.count("*").alias("n_tokens"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    curve = (
        tokens_per_bucket.join(new_per_bucket, "bucket", "left")
        .select(
            "bucket",
            F.col("n_tokens"),
            F.coalesce("new_types", F.lit(0)).alias("new_types"),
        )
        .select(
            "bucket",
            F.sum("n_tokens").over(w).cast("bigint").alias("cum_tokens"),
            F.sum("new_types").over(w).cast("bigint").alias("cum_vocab"),
        )
    )
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return curve.select(
        "bucket",
        "cum_tokens",
        "cum_vocab",
        F.round(
            F.expr("regr_slope(ln(cum_vocab), ln(cum_tokens))").over(w_all), 4
        ).alias("heaps_beta"),
    )


# ---------------------------------------------------------------------------
# text_chunk_dedup_rate — sub-document dedup measurement per source
# ---------------------------------------------------------------------------

_DCHUNK = 16  # non-overlapping chunk length for the dedup grain


@query(
    "text_chunk_dedup_rate",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source, STRING_SPLIT({_NORM}, ' ') AS w FROM documents
    ), chunks AS (
        SELECT doc_id, source,
               MD5(ARRAY_TO_STRING(
                   w[chunk_idx * {_DCHUNK} + 1 : chunk_idx * {_DCHUNK} + {_DCHUNK}],
                   ' ')) AS dg
        FROM (
            SELECT doc_id, source, w,
                   UNNEST(RANGE(0, CAST(FLOOR(LEN(w) / {_DCHUNK}.0) AS BIGINT)))
                       AS chunk_idx
            FROM toks
        )
    ), df AS (
        SELECT dg, COUNT(*) AS n FROM chunks GROUP BY dg
    )
    SELECT c.source,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN d.n > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_duplicated,
           FLOOR(SUM(CASE WHEN d.n > 1 THEN 1 ELSE 0 END) * 10000.0
                 / COUNT(*) + 0.5) / 10000.0 AS dup_rate4
    FROM chunks c JOIN df d ON d.dg = c.dg
    GROUP BY c.source
    """,
)
def text_chunk_dedup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document duplication measurement: documents are cut into
    NON-overlapping {_DCHUNK}-token chunks, each chunk is hashed, and a
    chunk is 'duplicated' when its digest occurs more than once anywhere
    in the corpus. Per-source duplicated-chunk rate is the C4/RefinedWeb
    measurement that motivates dedup below document granularity —
    boilerplate headers/footers duplicate at chunk level while their host
    documents stay unique, so doc-level dedup alone misses them (the
    document-level twin is dedup_exact; the char-gram extreme is
    text_duplicate_spans; this is the budget-relevant middle grain).

    Plan: explode to (chunk digest) rows — linear in corpus tokens; one
    hash-agg for global digest frequencies; the mark-join back to chunks
    shuffles on the digest the frequency agg already grouped by; the
    per-source rollup is dimension-sized. No pairwise joins anywhere.

    Determinism: counts + FLOOR-1e4 rate; only full {_DCHUNK}-token
    chunks count (FLOOR of len/chunk), so no ragged-tail ambiguity."""
    from .textshared import norm_docs_shared

    toks = norm_docs_shared(spark, sf_dir).select("doc_id", "source", "w")
    n_chunks = F.floor(F.size("w") / float(_DCHUNK)).cast("long")
    chunks = (
        toks.filter(n_chunks > 0)
        .select(
            "doc_id",
            "source",
            "w",
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
                "chunk_idx"
            ),
        )
        .select(
            "source",
            F.md5(
                F.array_join(
                    F.slice(
                        "w", (F.col("chunk_idx") * _DCHUNK + 1).cast("int"), _DCHUNK
                    ),
                    " ",
                )
            ).alias("dg"),
        )
    )
    chunks = transient_persist(chunks)  # feeds the df agg AND the mark-join
    freq = chunks.groupBy("dg").agg(F.count("*").alias("n"))
    marked = chunks.join(freq, "dg")
    return marked.groupBy("source").agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.sum(F.when(F.col("n") > 1, 1).otherwise(0)).cast("long").alias(
            "n_duplicated"
        ),
        (
            F.floor(
                F.sum(F.when(F.col("n") > 1, 1).otherwise(0)) * 10000.0
                / F.count("*")
                + 0.5
            )
            / 10000.0
        ).alias("dup_rate4"),
    )


# ---------------------------------------------------------------------------
# text_bm25_ranked_retrieval — BM25 lexical ranking (query-by-document)
# ---------------------------------------------------------------------------

_BM25_N_QUERIES = 3    # query documents: doc_id < 3 ("more like this")
_BM25_MAX_TERMS = 16   # rarest-first term budget per query
_BM25_MIN_TOK = 4      # drop short/stopword-ish query tokens
_BM25_TOPK = 5
_BM25_K1 = "1.2"       # literal strings → the same double in both engines
_BM25_B = "0.75"
_BM25_SCALE = 1_000_000  # per-term contribution → integer micro-units


# Shared BM25 CTE chain (norm -> toks -> tf -> dl -> df -> meta -> qterms
# -> contrib -> scored): consumed by text_bm25_ranked_retrieval's oracle
# and by the hybrid-RRF oracle (similarity.py), kept as ONE constant so
# the two gates can never desync on the scoring definition.
_BM25_CTES = f"""
    WITH norm AS (
        SELECT doc_id, {_NORM} AS t FROM documents
    ), toks AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(t, ' ')) AS tok FROM norm
    ), tf AS (
        SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok
    ), dl AS (
        SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id
    ), df AS (
        SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
    ), meta AS (
        SELECT COUNT(*) AS n_docs, SUM(dl) AS total_len FROM dl
    ), qterms AS (
        SELECT query_id, tok, df FROM (
            SELECT tf.doc_id AS query_id, tf.tok, df.df,
                   ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                      ORDER BY df.df, tf.tok) AS trnk
            FROM tf JOIN df ON df.tok = tf.tok
            WHERE tf.doc_id < {_BM25_N_QUERIES}
              AND LENGTH(tf.tok) >= {_BM25_MIN_TOK}
        ) WHERE trnk <= {_BM25_MAX_TERMS}
    ), contrib AS (
        SELECT q.query_id, tf.doc_id,
               CAST(FLOOR({_BM25_SCALE} *
                   LN(1 + (CAST(m.n_docs AS DOUBLE) - q.df + 0.5) / (q.df + 0.5))
                   * (tf.tf * ({_BM25_K1} + 1))
                   / (tf.tf + {_BM25_K1} * (1 - {_BM25_B}
                        + {_BM25_B} * dl.dl
                          / (CAST(m.total_len AS DOUBLE) / m.n_docs)))
               ) AS BIGINT) AS c_u
        FROM qterms q
        JOIN tf ON tf.tok = q.tok AND tf.doc_id >= {_BM25_N_QUERIES}
        JOIN dl ON dl.doc_id = tf.doc_id
        CROSS JOIN meta m
    ), scored AS (
        SELECT query_id, doc_id, CAST(SUM(c_u) AS BIGINT) AS score_u
        FROM contrib GROUP BY query_id, doc_id
    )"""


def _bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full BM25 scoring pipeline -> (query_id, doc_id, score_u),
    pre-top-k, shared_frame-cached: text_bm25_ranked_retrieval, the
    hybrid-RRF fusion, and the retrieval system-comparison eval (all in
    similarity.py) consume the SAME scoring definition, so the three
    gates can never desync — and the corpus-side token aggregates run
    once per (session, sf_dir), not once per consumer. The cached frame
    is (queries x candidate docs) rows of three integers — bounded by
    corpus size, never by corpus bytes. See text_bm25_ranked_retrieval's
    docstring for plan shape and the integer-micro-unit determinism
    discipline."""

    def build() -> DataFrame:
        return _bm25_scores_build(spark, sf_dir)

    return shared_frame(spark, "bm25_scored", sf_dir, build)


def _bm25_scores_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .textshared import doc_tokens_shared

    toks = doc_tokens_shared(spark, sf_dir)  # shared, persisted; feeds tf AND dl
    tf = transient_persist(
        toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    df = tf.groupBy("tok").agg(F.count("*").alias("df"))
    meta = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_len")
    )
    wq = Window.partitionBy("query_id").orderBy("df", "tok")
    qterms = (
        tf.filter(
            (F.col("doc_id") < _BM25_N_QUERIES)
            & (F.char_length("tok") >= _BM25_MIN_TOK)
        )
        .select(F.col("doc_id").alias("query_id"), "tok")
        .join(df, "tok")
        .withColumn("trnk", F.row_number().over(wq))
        .filter(F.col("trnk") <= _BM25_MAX_TERMS)
        .select("query_id", "tok", "df")
    )
    contrib = (
        tf.filter(F.col("doc_id") >= _BM25_N_QUERIES)
        .join(F.broadcast(qterms), "tok")
        .join(dl, "doc_id")
        .join(F.broadcast(meta))
        .select(
            "query_id",
            "doc_id",
            F.floor(
                F.lit(_BM25_SCALE)
                * F.log(
                    1
                    + (F.col("n_docs").cast("double") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (F.expr(_BM25_K1) + 1))
                / (
                    F.col("tf")
                    + F.expr(_BM25_K1)
                    * (
                        1
                        - F.expr(_BM25_B)
                        + F.expr(_BM25_B)
                        * F.col("dl")
                        / (F.col("total_len").cast("double") / F.col("n_docs"))
                    )
                )
            ).cast("long").alias("c_u"),
        )
    )
    return contrib.groupBy("query_id", "doc_id").agg(
        F.sum("c_u").alias("score_u")
    )


@query(
    "text_bm25_ranked_retrieval",
    oracle=f"""{_BM25_CTES}
    SELECT query_id, doc_id, score_u, rnk FROM (
        SELECT query_id, doc_id, score_u,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score_u DESC, doc_id) AS rnk
        FROM scored
    ) WHERE rnk <= {_BM25_TOPK}
    """,
)
def text_bm25_ranked_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval, query-by-document ("more like this"): each
    query document's {_BM25_MAX_TERMS} RAREST distinct tokens (≥
    {_BM25_MIN_TOK} chars, df-ascending — the classic rare-term relevance
    budget) retrieve the top-{_BM25_TOPK} corpus documents by
    Okapi BM25 with k1={_BM25_K1}, b={_BM25_B} and the Lucene
    ln(1 + (N − df + 0.5)/(df + 0.5)) idf. The lexical twin of the
    embedding retrieval stack (similarity_paired_retrieval_eval measures
    the dense side; this is the sparse side every RAG/eval harness ranks
    against first).

    Scale shape: tf / dl / df are the three canonical one-pass token
    aggregates; the query-term frame is bounded by queries ×
    {_BM25_MAX_TERMS} and BROADCASTS into the posting join, so corpus
    work is one hash join on token over tf — never a corpus×corpus
    product; corpus-wide constants (N, total length) ride a one-row
    broadcast. The per-(query, doc) score aggregate shuffles only
    candidate postings (docs sharing ≥1 rare query term).

    Determinism (house FLOOR-integer discipline, see money_cents): each
    per-term contribution is floored to BIGINT micro-units row-locally —
    tf, dl, df, N are exact integers, and the only doubles (one LN, one
    ratio) are identical row-local IEEE expressions in both engines — and
    the per-(query, doc) score is an exact BIGINT SUM, so aggregation
    ORDER can never move the score; ranking ties break on doc_id.

    Reference parity: none (SURVEY §2.D north-star; round-8 VERDICT ask
    #8's 'one new capability')."""
    scored = _bm25_scores(spark, sf_dir)
    wr = Window.partitionBy("query_id").orderBy(F.col("score_u").desc(), "doc_id")
    return (
        scored.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= _BM25_TOPK)
        .select("query_id", "doc_id", "score_u", "rnk")
    )

