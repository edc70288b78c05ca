"""Frequency-analysis operators for the corpus pipeline:

- ``agg_heavy_hitters_topk`` — top-k tokens via a Misra-Gries sketch pass
  plus an exact candidate recount. The scale pattern this demonstrates is
  the one a 100 TB vocabulary forces: a full ``groupBy(token)`` shuffles
  every distinct token (web-scale corpora have billions), while the sketch
  pass reduces each partition to a bounded candidate summary, and only
  rows matching the (tiny, broadcast) candidate set ever reach a shuffle.
- ``text_bpe_pair_counts`` — adjacent symbol-pair frequencies within
  tokens, i.e. the statistic behind one BPE merge round of tokenizer
  induction. Pure built-ins (explode over an index sequence + hash agg).
- ``events_transition_matrix`` — first-order Markov transition counts and
  probabilities between consecutive event types per user; lag/lead window
  plus two hash aggregates, all JVM-side.

Reference parity: none of these exist in the reference — it is a Kinesis
connector with no aggregation surface (SURVEY.md §2.D: aggregations and
window functions ABSENT, supplied by Spark built-ins; heavy-hitter/BPE
operators are driver-mandated north-star extensions for training-data
pipelines).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions import NORM_TEXT_DUCK, explode_ordered_pairs
from ..io import table
from ..registry import query
from ..shared import transient_persist

_NORM = NORM_TEXT_DUCK.format(col="text")

# Misra-Gries capacity per partition. The union of per-partition summaries
# is guaranteed to contain every token with global count > n/CAP
# (pigeonhole over partitions + the MG retention bound), so the final
# top-K is exact as long as the K-th token's frequency clears n/CAP —
# comfortably true for Zipfian text at CAP=256 and K=15; the oracle-parity
# gate would catch a violation.
_MG_CAP = 256
_HH_TOPK = 15


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r12: shared normalized-token frame (one corpus explode per session
    # instead of one per consumer) — see operators/textshared.py
    from .textshared import doc_tokens_shared

    return doc_tokens_shared(spark, sf_dir).select("tok")


def _mg_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Bounded-memory Misra-Gries summary of one partition's token stream.

    Per Arrow batch: exact value_counts (vocab ≤ batch rows, so bounded),
    merged into the running summary; when the summary exceeds capacity,
    every counter is decremented by the (CAP+1)-th largest count and
    non-positive entries dropped — the standard MG merge, which keeps the
    undercount error ≤ n_partition / CAP. Emits candidate tokens only;
    exact counts come from the recount pass.
    """
    counters: dict[str, int] = {}
    for b in batches:
        for tok, c in b["tok"].value_counts().items():
            counters[tok] = counters.get(tok, 0) + int(c)
        if len(counters) > _MG_CAP:
            d = sorted(counters.values(), reverse=True)[_MG_CAP]
            counters = {t: c - d for t, c in counters.items() if c > d}
    yield pd.DataFrame({"tok": list(counters)})


@query(
    "agg_heavy_hitters_topk",
    oracle=f"""
    WITH norm AS (
        SELECT {_NORM} AS t FROM documents
    ), toks AS (
        SELECT UNNEST(STRING_SPLIT(t, ' ')) AS tok FROM norm
    )
    SELECT tok, COUNT(*) AS n
    FROM toks
    GROUP BY tok
    ORDER BY n DESC, tok
    LIMIT {_HH_TOPK}
    """,
)
def heavy_hitters_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-15 tokens without shuffling the full vocabulary.

    Pass 1 (sketch): per-partition Misra-Gries over the token stream —
    bounded memory, no shuffle, ≤ CAP candidate tokens emitted per
    partition. Pass 2 (recount): semi-join the stream against the
    broadcast candidate set, then an exact hash aggregate over only those
    rows. At 100 TB the shuffle carries |candidates| × #partitions partial
    counts instead of the billon-key vocabulary; the candidate filter is
    applied map-side, before any exchange.
    """
    toks = _tokens(spark, sf_dir)
    cand = toks.mapInPandas(_mg_partials, schema="tok string").distinct()
    return (
        toks.join(F.broadcast(cand), "tok", "left_semi")
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok"))
        .limit(_HH_TOPK)
    )


_BPE_TOPK = 20


@query(
    "text_bpe_pair_counts",
    oracle=f"""
    WITH norm AS (
        SELECT {_NORM} AS t FROM documents
    ), toks AS (
        SELECT UNNEST(STRING_SPLIT(t, ' ')) AS tok FROM norm
    ), pairs AS (
        SELECT SUBSTR(tok, CAST(i AS INTEGER), 2) AS pair
        FROM toks CROSS JOIN UNNEST(RANGE(1, LENGTH(tok))) AS r(i)
        WHERE LENGTH(tok) >= 2
    )
    SELECT pair, COUNT(*) AS n
    FROM pairs
    GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT {_BPE_TOPK}
    """,
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent character-pair frequencies within tokens — the counting
    step of a BPE tokenizer-induction merge round (the highest-count pair
    becomes the next merge). Explode over an index sequence + substring,
    then a hash aggregate; partial aggregation absorbs the ~word-length×
    fan-out map-side, so the shuffle carries (pair, partial-count) rows
    bounded by the pair alphabet, not the corpus."""
    toks = _tokens(spark, sf_dir).filter(F.length("tok") >= 2)
    pairs = toks.select(
        F.explode(F.sequence(F.lit(1), F.length("tok") - 1)).alias("i"), "tok"
    ).select(F.expr("substring(tok, i, 2)").alias("pair"))
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair"))
        .limit(_BPE_TOPK)
    )


@query(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT event_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events
    )
    SELECT event_type, next_type, COUNT(*) AS n,
           ROUND(CAST(COUNT(*) AS DOUBLE)
                 / SUM(COUNT(*)) OVER (PARTITION BY event_type), 4) AS prob
    FROM seq
    WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    ORDER BY event_type, next_type
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    P(next_type | event_type) with counts. One shuffle partitions by
    user_id for the lead() window (ties broken by event_id for engine-
    stable sequences), then a hash aggregate on the (from, to) pair —
    whose cardinality is |event_type|², so the second exchange is tiny —
    and a window over the aggregate for row-normalized probabilities."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    counts = seq.groupBy("event_type", "next_type").agg(F.count("*").alias("n"))
    total = Window.partitionBy("event_type")
    return (
        counts.withColumn(
            "prob", F.round(F.col("n") / F.sum("n").over(total), 4)
        )
        .orderBy("event_type", "next_type")
    )


# ---------------------------------------------------------------------------
# agg_count_min_sketch — mergeable CMS with an exact-recount comparison
# ---------------------------------------------------------------------------

# Depth (independent hash rows) × width (buckets per row). The bucket of a
# token under seed i is the first 2 hex chars of md5('<i>|' || tok) — a
# string key both engines derive identically, so the whole sketch (and
# therefore every estimate) is bit-reproducible across Spark and the
# oracle: the gate checks the sketch MATH, not just "close enough".
_CMS_DEPTH = 3
_CMS_WIDTH = 256  # 2 hex chars
_CMS_TOPK = 20


@query(
    "agg_count_min_sketch",
    oracle=f"""
    WITH norm AS (
        SELECT doc_id, {{norm}} AS t FROM documents
    ), toks AS (
        SELECT UNNEST(STRING_SPLIT(t, ' ')) AS tok FROM norm
    ), seeded AS (
        SELECT tok, UNNEST(RANGE(0, {_CMS_DEPTH})) AS seed FROM toks
    ), sketch AS (
        SELECT seed, SUBSTR(MD5(CAST(seed AS VARCHAR) || '|' || tok), 1, 2) AS bucket,
               COUNT(*) AS cnt
        FROM seeded GROUP BY seed, bucket
    ), exact AS (
        SELECT tok, COUNT(*) AS exact_count FROM toks GROUP BY tok
        ORDER BY exact_count DESC, tok LIMIT {_CMS_TOPK}
    ), est AS (
        SELECT e.tok, e.exact_count, MIN(s.cnt) AS cms_estimate
        FROM exact e
        JOIN sketch s
          ON s.bucket = SUBSTR(MD5(CAST(s.seed AS VARCHAR) || '|' || e.tok), 1, 2)
        GROUP BY e.tok, e.exact_count
    )
    SELECT tok, exact_count, cms_estimate,
           cms_estimate - exact_count AS overestimate,
           (cms_estimate >= exact_count) AS never_underestimates
    FROM est
    """.format(norm=_NORM),
)
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the corpus token stream, checked against an
    exact recount of the top-20 tokens. The sketch is depth 3 × width
    256: one hash-aggregate pass collapses the unbounded token stream
    into a 768-cell table (mergeable across partitions/days — cells
    just add), and a point estimate is the min over depth rows. CMS never
    underestimates; the ``never_underestimates`` flag crosses the oracle
    hash as a checked invariant.

    Scale shape: the sketch build is explode → map-side partial agg into
    ≤768 groups — O(1) state regardless of corpus size, the reason
    to sketch at all. The estimate lookup joins the (tiny, broadcast)
    sketch to the (bounded) candidate set. At 100 TB nothing here
    shuffles more than depth·width rows."""
    toks = _tokens(spark, sf_dir)  # shared frame (already persisted)
    seeds = F.array(*[F.lit(i) for i in range(_CMS_DEPTH)])
    sketch = (
        toks.select("tok", F.explode(seeds).alias("seed"))
        .select(
            "seed",
            F.substring(
                F.md5(F.concat_ws("|", F.col("seed").cast("string"), "tok")), 1, 2
            ).alias("bucket"),
        )
        .groupBy("seed", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    exact = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("exact_count"))
        .orderBy(F.col("exact_count").desc(), "tok")
        .limit(_CMS_TOPK)
    )
    # probe side: candidate × seed with ITS OWN bucket precomputed, so the
    # lookup is a clean (seed, bucket) equi-join against the broadcast
    # sketch (an expression mixing both sides would force a nested loop)
    probes = exact.select(
        "tok", "exact_count", F.explode(seeds).alias("seed")
    ).select(
        "tok",
        "exact_count",
        "seed",
        F.substring(
            F.md5(F.concat_ws("|", F.col("seed").cast("string"), "tok")), 1, 2
        ).alias("bucket"),
    )
    est = (
        probes.join(F.broadcast(sketch), ["seed", "bucket"])
        .groupBy("tok", "exact_count")
        .agg(F.min("cnt").alias("cms_estimate"))
    )
    return est.select(
        "tok",
        "exact_count",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("exact_count")).alias("overestimate"),
        (F.col("cms_estimate") >= F.col("exact_count")).alias(
            "never_underestimates"
        ),
    )


# ---------------------------------------------------------------------------
# agg_histogram_quantiles — mergeable equi-width histogram → quantiles
# ---------------------------------------------------------------------------

_HIST_BUCKETS = 128


@query(
    "agg_histogram_quantiles",
    oracle="""
    WITH bounds AS (
        SELECT MIN(value) AS lo, MAX(value) AS hi, COUNT(*) AS n FROM events
    ), hist AS (
        SELECT LEAST(CAST(FLOOR((value - lo)
                           / (GREATEST(hi - lo, 1e-12) / 128)) AS INTEGER),
                     127) AS bucket,
               COUNT(*) AS cnt
        FROM events, bounds GROUP BY 1
    ), cum AS (
        SELECT bucket, cnt,
               SUM(cnt) OVER (ORDER BY bucket) AS cum_n
        FROM hist
    ), est AS (
        SELECT q.p, MIN(bucket) AS qb
        FROM cum CROSS JOIN (VALUES (0.5), (0.95), (0.99)) AS q(p)
        CROSS JOIN bounds
        WHERE cum_n >= p * n
        GROUP BY q.p
    ), exact AS (
        SELECT 0.5 AS p, QUANTILE_CONT(value, 0.5) AS exact_v FROM events
        UNION ALL
        SELECT 0.95, QUANTILE_CONT(value, 0.95) FROM events
        UNION ALL
        SELECT 0.99, QUANTILE_CONT(value, 0.99) FROM events
    )
    SELECT CAST(est.p AS DOUBLE) AS p,
           ROUND(lo + (qb + 0.5) * (GREATEST(hi - lo, 1e-12) / 128), 4)
             AS est_value,
           ROUND(exact_v, 4) AS exact_value,
           (ABS((lo + (qb + 0.5) * (GREATEST(hi - lo, 1e-12) / 128)) - exact_v)
             <= GREATEST(hi - lo, 1e-12) / 128) AS within_bucket_width
    FROM est JOIN exact ON exact.p = est.p CROSS JOIN bounds
    """,
)
def agg_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable equi-width histogram sketch → quantile estimates, the
    fourth mergeable-sketch family next to HLL (distincts), CMS (point
    frequencies), and Misra-Gries (heavy hitters): per-partition bucket
    counts just ADD, so a 1000-executor fleet sketches locally and merges
    128 integers. p50/p95/p99 are read off the cumulative
    histogram (bucket midpoint); the gate pins the estimator's error
    contract — each estimate within one bucket width of DuckDB's exact
    continuous quantile — as a hashed boolean.

    Two scans total (bounds, then counts), both partial+final hash-aggs
    into O(1) state; the quantile read-off is a window over
    128 rows."""
    e = table(spark, sf_dir, "events")
    bounds = e.agg(
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.count("*").alias("n"),
    )
    # zero-width guard (degenerate single-value distribution): without it
    # Spark yields NULL buckets (silent 127) while the DuckDB oracle's
    # CAST(FLOOR(NaN)) errors — engines must agree, and cleanly
    width = F.greatest(F.col("hi") - F.col("lo"), F.lit(1e-12)) / _HIST_BUCKETS
    hist = (
        e.crossJoin(F.broadcast(bounds))
        .select(
            F.least(
                F.floor((F.col("value") - F.col("lo")) / width).cast("int"),
                F.lit(_HIST_BUCKETS - 1),
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )
    cum = hist.withColumn(
        "cum_n", F.sum("cnt").over(Window.orderBy("bucket"))
    )
    ps = spark.range(1).select(
        F.explode(F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99))).alias("p")
    )
    est = (
        cum.crossJoin(F.broadcast(ps))
        .crossJoin(F.broadcast(bounds.select("n")))
        .filter(F.col("cum_n") >= F.col("p") * F.col("n"))
        .groupBy("p")
        .agg(F.min("bucket").alias("qb"))
    )
    exact = (
        e.agg(
            F.expr("percentile(value, array(0.5D, 0.95D, 0.99D))").alias("ev")
        )
        .select(F.posexplode("ev").alias("i", "exact_v"))
        .select(
            F.element_at(
                F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)),
                F.col("i") + 1,
            ).alias("p"),
            "exact_v",
        )
    )
    return (
        est.join(exact, "p")
        .crossJoin(F.broadcast(bounds.select("lo", "hi")))
        .select(
            "p",
            F.round(
                F.col("lo") + (F.col("qb") + 0.5) * width, 4
            ).alias("est_value"),
            F.round(F.col("exact_v"), 4).alias("exact_value"),
            (
                F.abs(
                    (F.col("lo") + (F.col("qb") + 0.5) * width)
                    - F.col("exact_v")
                )
                <= width
            ).alias("within_bucket_width"),
        )
    )


# ---------------------------------------------------------------------------
# text_bpe_train_merges — distributed BPE merge LEARNING (unrolled rounds)
# ---------------------------------------------------------------------------

# Number of merge rounds learned. Unrolled (not a driver loop over actions)
# so the whole trainer stays one declarative recipe per round; each round's
# vocabulary is localCheckpointed because round k+1's pair counts reference
# it repeatedly (same lineage-truncation discipline as the connected-
# components loop, curation.py).
_BPE_ROUNDS = 3

# A word is represented as its symbol sequence with every symbol wrapped in
# parens: "the" -> "(t)(h)(e)". Applying merge (a,b) is then a plain literal
# string REPLACE of "(a)(b)" with "(ab)" — and because both Spark's and
# DuckDB's replace() scan left-to-right over non-overlapping occurrences,
# this IS the greedy BPE application rule ("aaa" + merge(a,a) -> (aa)(a)),
# identical in both engines. The alphabet is normalize_text's [a-z0-9 ], so
# parens can never collide with corpus symbols.


def _bpe_oracle() -> str:
    norm = _NORM
    rounds = []
    prev = "v0"
    for k in range(1, _BPE_ROUNDS + 1):
        rounds.append(f"""
    p{k} AS (
        SELECT l[i] AS a, l[i + 1] AS b, CAST(SUM(freq) AS BIGINT) AS cnt
        FROM (SELECT REGEXP_EXTRACT_ALL(w, '\\(([^()]*)\\)', 1) AS l, freq
              FROM {prev}) t
        CROSS JOIN UNNEST(RANGE(1, LEN(l))) AS r(i)
        GROUP BY 1, 2
    ), b{k} AS (
        SELECT a, b, cnt FROM p{k} ORDER BY cnt DESC, a, b LIMIT 1
    ), v{k} AS (
        SELECT REPLACE(w, '(' || b{k}.a || ')(' || b{k}.b || ')',
                          '(' || b{k}.a || b{k}.b || ')') AS w, freq
        FROM {prev}, b{k}
    )""")
        prev = f"v{k}"
    selects = "\n    UNION ALL ".join(
        f"SELECT {k} AS merge_round, a AS sym_a, b AS sym_b, "
        f"a || b AS merged, cnt AS pair_count FROM b{k}"
        for k in range(1, _BPE_ROUNDS + 1)
    )
    return f"""
    WITH toks AS (
        SELECT UNNEST(STRING_SPLIT({norm}, ' ')) AS tok FROM documents
    ), vocab AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq
        FROM toks WHERE tok <> '' GROUP BY tok
    ), v0 AS (
        SELECT REGEXP_REPLACE(tok, '(.)', '(\\1)', 'g') AS w, freq FROM vocab
    ),{",".join(rounds)}
    {selects}
    ORDER BY merge_round
    """


@query("text_bpe_train_merges", oracle=_bpe_oracle())
def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer TRAINING — the iterative dual of
    ``text_bpe_pair_counts``: {_BPE_ROUNDS} merge rounds are actually
    learned, each round = (count adjacent symbol pairs weighted by word
    frequency) → (argmax with lexicographic tie-break) → (apply the merge
    to the vocabulary). Returns one row per learned merge with its count.

    Scale shape — the reason BPE training is feasible on a 100 TB corpus
    at all: after ONE corpus pass builds the word-frequency table, every
    round operates on the VOCABULARY (Heaps-bounded, millions of rows at
    web scale, ~10^4 here), never the corpus. Pair counting explodes each
    vocab word into (|word|-1) weighted pairs and hash-aggregates (map-
    side partials bound the shuffle by the pair alphabet); the argmax is
    a 1-row TakeOrdered broadcast back into a literal string replace.
    Per-round vocabularies are localCheckpointed so round k+1's lineage
    does not re-derive rounds 1..k (the connected-components discipline,
    curation.py).

    Determinism: counts are exact int64 sums of word frequencies, the
    argmax tie-break is lexicographic (a, b), and merge application is
    left-to-right non-overlapping literal replace in BOTH engines — greedy
    BPE semantics, bit-identical across partition orders."""
    toks = _tokens(spark, sf_dir).filter(F.col("tok") != "")
    vocab = toks.groupBy("tok").agg(F.count("*").alias("freq"))
    v = vocab.select(
        F.regexp_replace("tok", "(.)", r"($1)").alias("w"), "freq"
    ).localCheckpoint()
    out = None
    for k in range(1, _BPE_ROUNDS + 1):
        syms = v.select(
            F.regexp_extract_all("w", F.lit(r"\(([^()]*)\)"), 1).alias("l"),
            "freq",
        ).filter(F.size("l") >= 2)
        pairs = (
            syms.select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(l) - 1),"
                        " i -> struct(element_at(l, i) AS a,"
                        "             element_at(l, i + 1) AS b))"
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").cast("long").alias("cnt"))
        )
        best = (
            pairs.orderBy(F.col("cnt").desc(), "a", "b")
            .limit(1)
            .localCheckpoint()
        )
        row = best.select(
            F.lit(k).alias("merge_round"),
            F.col("a").alias("sym_a"),
            F.col("b").alias("sym_b"),
            F.concat("a", "b").alias("merged"),
            F.col("cnt").alias("pair_count"),
        )
        out = row if out is None else out.unionByName(row)
        v = (
            v.crossJoin(F.broadcast(best.select("a", "b")))
            .select(
                F.replace(
                    F.col("w"),
                    F.concat(F.lit("("), "a", F.lit(")("), "b", F.lit(")")),
                    F.concat(F.lit("("), "a", "b", F.lit(")")),
                ).alias("w"),
                "freq",
            )
            .localCheckpoint()
        )
    return out.orderBy("merge_round")


# ---------------------------------------------------------------------------
# events_frequent_sequences — session-bounded sequential pattern mining
# ---------------------------------------------------------------------------

# Relative support threshold: keep length-3 sequences covering at least
# 0.9% of all session trigrams (exact integer compare: 1000*n >= 9*total).
_SEQ_SUPPORT_PER_MILLE = 9


@query(
    "events_frequent_sequences",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN LAG(ts) OVER w IS NULL THEN 1
                    WHEN EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > 1800000000 THEN 1
                    ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts, event_id, event_type,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS session_id
        FROM flagged
    ), grams AS (
        SELECT event_type AS t1,
               LEAD(event_type, 1) OVER s AS t2,
               LEAD(event_type, 2) OVER s AS t3
        FROM sessions
        WINDOW s AS (PARTITION BY user_id, session_id ORDER BY ts, event_id)
    ), counted AS (
        SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS total
        FROM grams
        WHERE t3 IS NOT NULL
        GROUP BY t1, t2, t3
    )
    SELECT t1, t2, t3, n, (10000 * n) // total AS support4
    FROM counted
    WHERE 1000 * n >= {_SEQ_SUPPORT_PER_MILLE} * total
    ORDER BY n DESC, t1, t2, t3
    """,
)
def events_frequent_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern mining, the session-bounded length-3 case: count
    every event-type trigram occurring INSIDE a 30-minute-gap session (a
    trigram never spans a session boundary — the property the plain Markov
    transition matrix can't express) and keep those above a relative
    support threshold ({_SEQ_SUPPORT_PER_MILLE}‰ of all trigrams). This is
    the frequent-subsequence primitive behind journey mining / funnel
    discovery (PrefixSpan's k=3 slice, materialized declaratively).

    Scale shape: ONE shuffle on user_id drives both the sessionize lag and
    the per-session lead window (same partitioning, Catalyst reuses the
    Exchange); the trigram aggregate's key space is |event_type|³ (125
    here) so the second exchange and the single-row total broadcast are
    metadata-sized. Exact integer support compare — no float threshold."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = e.withColumn(
        "new_session",
        F.when(F.lag("ts").over(w).isNull(), 1)
        .when(gap_us > 1800 * 1000 * 1000, 1)
        .otherwise(0),
    )
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(cum))
    s = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    grams = sessions.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(s).alias("t2"),
        F.lead("event_type", 2).over(s).alias("t3"),
    ).filter(F.col("t3").isNotNull())
    counted = grams.groupBy("t1", "t2", "t3").agg(
        F.count("*").cast("long").alias("n")
    )
    total = Window.partitionBy()
    return (
        counted.withColumn("total", F.sum("n").over(total).cast("long"))
        .filter(F.lit(1000) * F.col("n") >= F.lit(_SEQ_SUPPORT_PER_MILLE) * F.col("total"))
        .select(
            "t1",
            "t2",
            "t3",
            "n",
            F.expr("(10000 * n) DIV total").alias("support4"),
        )
        .orderBy(F.col("n").desc(), "t1", "t2", "t3")
    )


# ---------------------------------------------------------------------------
# agg_frequent_itemset_pairs — market-basket co-occurrence mining
# ---------------------------------------------------------------------------

# minimum number of baskets (orders) a part pair must co-occur in
_FIS_MIN_SUPPORT = 3
# basket-size bound: TPC-H orders hold ≤7 lines, but the cap is stated
# (and enforced) so a pathological mega-basket can never square the pair
# stage — the same Σ min(deg, cap)² discipline as the triangle counter
_FIS_MAX_BASKET = 16


@query(
    "agg_frequent_itemset_pairs",
    oracle=f"""
    WITH baskets AS (
        SELECT l_orderkey, l_partkey
        FROM lineitem
        GROUP BY l_orderkey, l_partkey
    ), sized AS (
        SELECT l_orderkey, l_partkey,
               COUNT(*) OVER (PARTITION BY l_orderkey) AS bsize
        FROM baskets
    ), kept AS (
        SELECT l_orderkey, l_partkey FROM sized WHERE bsize <= {_FIS_MAX_BASKET}
    ), pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               COUNT(*) AS support
        FROM kept a JOIN kept b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
    ), singles AS (
        SELECT l_partkey, COUNT(*) AS n_baskets FROM kept GROUP BY l_partkey
    )
    SELECT p.part_a, p.part_b,
           CAST(p.support AS BIGINT) AS support,
           FLOOR(p.support * 10000.0 / sa.n_baskets + 0.5) / 10000.0
               AS confidence_a_to_b4,
           FLOOR(p.support * 10000.0 / sb.n_baskets + 0.5) / 10000.0
               AS confidence_b_to_a4
    FROM pairs p
    JOIN singles sa ON sa.l_partkey = p.part_a
    JOIN singles sb ON sb.l_partkey = p.part_b
    WHERE p.support >= {_FIS_MIN_SUPPORT}
    """,
)
def agg_frequent_itemset_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-itemset PAIR mining (the 2-itemset A-Priori stage) over
    order baskets: distinct (order, part) rows self-join within the
    basket to candidate pairs, pairs below {_FIS_MIN_SUPPORT} baskets of
    support are pruned, and each survivor carries both directed
    confidences (support/|baskets containing A|) — the association-rule
    readout. Baskets larger than {_FIS_MAX_BASKET} items are excluded
    BEFORE pair generation, so pair work is Σ min(basket, cap)² — linear
    in orders with a constant bound, never quadratic in a hub basket
    (TPC-H baskets are ≤7 lines; the cap is armor for real data).

    Scale shape: one shuffle on l_orderkey shared by the dedup, the size
    window, and the equi-self-join; the pair aggregate shuffles pair keys
    (output-sized); the confidence joins are against the
    |parts|-bounded singles frame. This is the distributed A-Priori
    candidate stage every market-basket / co-occurrence-embedding
    pipeline starts from.

    Determinism: integer supports, FLOOR-1e4 confidences."""
    # ONE fact-scale exchange (groupBy l_orderkey whose map-side partial
    # collect_set also dedups the (order, part) rows) replaces the old
    # distinct-groupBy → basket-size window → equi-self-join chain — three
    # fact-scale exchanges for the same pair list (guide §2.4). Each
    # basket's sorted part set is exploded into its ordered (a < b) pairs
    # inline; the basket frame feeds TWO consumers (pairs + singles), so
    # it is persisted, and the |parts|-bounded singles frame is broadcast
    # onto the pair list (guide §3.1).
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = transient_persist(
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
        .filter(F.size("parts") <= _FIS_MAX_BASKET)
    )
    pairs = (
        explode_ordered_pairs(baskets, "parts", u="part_a", v="part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= _FIS_MIN_SUPPORT)
    )
    singles = (
        baskets.select(F.explode("parts").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count("*").alias("n_baskets"))
    )
    conf = lambda sup, n: F.floor(sup * 10000.0 / n + 0.5) / 10000.0  # noqa: E731
    return (
        pairs.join(
            F.broadcast(
                singles.select(
                    F.col("l_partkey").alias("part_a"),
                    F.col("n_baskets").alias("_na"),
                )
            ),
            "part_a",
        )
        .join(
            F.broadcast(
                singles.select(
                    F.col("l_partkey").alias("part_b"),
                    F.col("n_baskets").alias("_nb"),
                )
            ),
            "part_b",
        )
        .select(
            "part_a",
            "part_b",
            F.col("support").cast("long").alias("support"),
            conf(F.col("support"), F.col("_na")).alias("confidence_a_to_b4"),
            conf(F.col("support"), F.col("_nb")).alias("confidence_b_to_a4"),
        )
    )
