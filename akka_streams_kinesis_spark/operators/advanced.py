"""Advanced operator families rounding out SURVEY §2.D and the
training-data-pipeline surface: statistical aggregates, exact percentiles,
pivot, array/map scalar families, embedding near-dup mining, BPE-ish
tokenization, multimodal frame sampling, reproducible sampling.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..functions import MONEY_CENTS_DUCK, money_cents
from ..io import fanout, table
from ..registry import query
from ..shared import transient_persist
from .similarity import cosine_sim


@query(
    "agg_stats_variance",
    oracle="""
    SELECT event_type,
           ROUND(STDDEV_SAMP(value), 4) AS sd_value,
           ROUND(VAR_SAMP(value), 4)    AS var_value,
           ROUND(MIN(value), 2)         AS min_value,
           ROUND(MAX(value), 2)         AS max_value
    FROM events
    GROUP BY event_type
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate family: sample stddev/variance, min/max —
    all single-pass partial+final aggregates."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.stddev_samp("value"), 4).alias("sd_value"),
        F.round(F.var_samp("value"), 4).alias("var_value"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
    )


@query(
    "agg_exact_percentiles",
    oracle="""
    SELECT o_orderpriority,
           ROUND(QUANTILE_CONT(o_totalprice, 0.25), 2) AS p25,
           ROUND(QUANTILE_CONT(o_totalprice, 0.50), 2) AS p50,
           ROUND(QUANTILE_CONT(o_totalprice, 0.75), 2) AS p75
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (the scale caveat is real: exact
    percentile gathers per-group values — at 100 TB swap in
    approx_percentile's mergeable sketch; both are one registry line)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", 0.25), 2).alias("p25"),
        F.round(F.percentile("o_totalprice", 0.50), 2).alias("p50"),
        F.round(F.percentile("o_totalprice", 0.75), 2).alias("p75"),
    )


@query(
    "pivot_user_event_matrix",
    oracle="""
    SELECT user_id,
           CAST(COALESCE(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END), 0) AS BIGINT) AS click,
           CAST(COALESCE(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END), 0) AS BIGINT) AS error,
           CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END), 0) AS BIGINT) AS purchase,
           CAST(COALESCE(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END), 0) AS BIGINT) AS signup,
           CAST(COALESCE(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END), 0) AS BIGINT) AS view
    FROM events
    GROUP BY user_id
    """,
)
def pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: user × event-type count matrix. Explicit value list keeps the
    plan a single aggregate (no extra distinct-values job) — the form that
    scales."""
    e = table(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    p = e.groupBy("user_id").pivot("event_type", kinds).count()
    return p.select(
        "user_id", *[F.coalesce(F.col(k), F.lit(0)).alias(k) for k in kinds]
    )


@query(
    "scalar_array_functions",
    oracle="""
    WITH toks AS (
        SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents
    )
    SELECT doc_id,
           LEN(w)                       AS n_tokens,
           LEN(LIST_DISTINCT(w))        AS n_unique,
           LIST_SORT(w)[1]              AS first_token,
           LIST_SORT(w)[-1]             AS last_token,
           CASE WHEN LIST_CONTAINS(w, 'spark') THEN 1 ELSE 0 END AS has_spark
    FROM toks
    """,
)
def scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar family: size/distinct/sort/element_at/contains over a
    tokens array — all JVM-side, no explode needed."""
    d = table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    sorted_w = F.sort_array(w)
    return d.select(
        "doc_id",
        F.size(w).alias("n_tokens"),
        F.size(F.array_distinct(w)).alias("n_unique"),
        F.element_at(sorted_w, 1).alias("first_token"),
        F.element_at(sorted_w, -1).alias("last_token"),
        F.array_contains(w, "spark").cast("int").alias("has_spark"),
    )


@query(
    "scalar_map_json_keys",
    oracle="""
    SELECT event_type,
           LIST_SORT(JSON_KEYS(props)) AS prop_keys,
           COUNT(*)                    AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def scalar_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: JSON payload → map type → key introspection (the typed
    step after the schema-free decode, data model §1.2)."""
    e = table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return (
        e.select("event_type", F.sort_array(F.map_keys(m)).alias("prop_keys"))
        .groupBy("event_type", "prop_keys")
        .agg(F.count("*").alias("n"))
    )


_NEAR_DUP_THRESHOLD = 0.3

_DUCK_SIM_PAIR = """
    SUM(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))
      / (SQRT(SUM(CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))
       * SQRT(SUM(CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))
"""


@query(
    "embedding_near_dup_pairs",
    oracle=f"""
    WITH sims AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
               ROUND({_DUCK_SIM_PAIR}, 6) AS sim
        FROM embeddings a
        JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        CROSS JOIN UNNEST(RANGE(1, 65)) AS t(i)
        GROUP BY a.vec_id, b.vec_id, a.label
    )
    SELECT vec_a, vec_b, label, sim FROM sims WHERE sim >= {_NEAR_DUP_THRESHOLD}
    """,
)
def embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup mining, IVF-blocked: candidate pairs come
    only from the same coarse cell (the ``label`` cluster assignment), so
    the pair space is Σ(cell²) instead of N² — the standard scale path for
    embedding dedup. Cosine folds in double, 6 dp rounding (see
    similarity.py for the parity argument).

    The cell work is SALTED: a bare group on ``label`` caps parallelism at
    the number of cells (10 here, maybe thousands at corpus scale — still
    far under the cluster's task slots, and skewed by cell size). Each
    vector lands once as a "build" row in salt ``crc32(vec_id) % S`` and is
    replicated as a "probe" row across all S salts, so every unordered pair
    appears in exactly one (label, salt) group — same pair set as a salted
    self-join, S× the tasks.

    Per-pair math is ONE numpy GEMM per group via applyInPandas (Arrow in,
    C BLAS, Arrow out) — the round-1 version folded an interpreted
    higher-order `aggregate` per pair (~64 lambda evals/pair), which at
    100× data makes the per-pair constant the bottleneck. GEMM makes the
    per-pair cost ~a fused multiply-add."""
    import numpy as np
    import pandas as pd

    n_salts = 8
    e = fanout(table(spark, sf_dir, "embeddings"))
    probe = e.select(
        "vec_id", "embedding", "label",
        F.explode(F.array(*[F.lit(s) for s in range(n_salts)])).alias("salt"),
        F.lit(0).alias("is_build"),
    )
    build = e.select(
        "vec_id", "embedding", "label",
        (F.crc32(F.col("vec_id").cast("string")) % n_salts).cast("int").alias("salt"),
        F.lit(1).alias("is_build"),
    )

    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        label = int(pdf["label"].iloc[0])
        bmask = pdf["is_build"].values == 1
        bids = pdf["vec_id"].values[bmask]
        aids = pdf["vec_id"].values[~bmask]
        if len(bids) == 0 or len(aids) == 0:
            return pd.DataFrame(
                {"vec_a": [], "vec_b": [], "label": [], "sim": []}
            ).astype({"vec_a": "int64", "vec_b": "int64", "label": "int32", "sim": "float64"})
        emb = np.stack(pdf["embedding"].values).astype(np.float64)
        A, B = emb[~bmask], emb[bmask]
        dots = A @ B.T
        nrm = np.linalg.norm(A, axis=1)[:, None] * np.linalg.norm(B, axis=1)[None, :]
        sims = dots / nrm
        # loosened prefilter only — the exact cut happens JVM-side on the
        # F.round'ed value (np.round is half-to-even, DuckDB ROUND is half
        # away from zero; doing the final round in Spark keeps rounding
        # semantics engine-consistent at every SF). The 5e-7 slack admits
        # raw sims that round UP across the threshold.
        ia, ib = np.nonzero(
            (aids[:, None] < bids[None, :]) & (sims >= _NEAR_DUP_THRESHOLD - 5e-7)
        )
        return pd.DataFrame(
            {
                "vec_a": aids[ia],
                "vec_b": bids[ib],
                "label": np.full(len(ia), label, dtype="int32"),
                "sim": sims[ia, ib],
            }
        )

    return (
        probe.unionByName(build)
        .groupBy("label", "salt")
        .applyInPandas(cell_pairs, "vec_a long, vec_b long, label int, sim double")
        .withColumn("sim", F.round("sim", 6))
        .filter(F.col("sim") >= _NEAR_DUP_THRESHOLD)
    )


@query(
    "text_token_counts_bpe",
    oracle="""
    SELECT doc_id,
           LEN(STRING_SPLIT(text, ' ')) AS n_ws_tokens,
           LEN(REGEXP_EXTRACT_ALL(text, '[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS n_subword_tokens
    FROM documents
    """,
)
def token_counts_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish regex
    segmentation (letter runs / digit runs / punctuation singletons) — the
    pretraining-cost estimator. Pure projection, no shuffle."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
        F.size(
            F.expr("regexp_extract_all(text, '[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0)")
        ).alias("n_subword_tokens"),
    )


_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_sha", StringType()),
    ]
)


@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(UNNEST(RANGE(0, LENGTH(text) // 100 + 1)) * 10 AS BIGINT) AS frame_idx,
           SHA256(text || ':' ||
                  CAST(UNNEST(RANGE(0, LENGTH(text) // 100 + 1)) * 10 AS BIGINT)) AS frame_sha
    FROM documents
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over opaque media payloads: a 1→N Arrow-batched
    mapInPandas stage (each "video" yields every 10th "frame"; the decode is
    the deterministic stub — real codecs slot into the same seam, see
    multimodal.decode_image). The oracle recomputes the stub in SQL."""
    docs = fanout(table(spark, sf_dir, "documents")).select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_idx, out_sha = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                n_frames = len(raw) // 100 + 1  # fake "decoder": 100 bytes/frame
                for k in range(n_frames):
                    idx = k * 10  # sample every 10th frame
                    out_doc.append(int(doc_id))
                    out_idx.append(idx)
                    out_sha.append(
                        hashlib.sha256(raw + b":" + str(idx).encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": out_doc, "frame_idx": out_idx, "frame_sha": out_sha}
            )

    return docs.mapInPandas(_sample, schema=_FRAME_SCHEMA)


def reproducible_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample of lineitem — reproducible within Spark
    (fixed seed; scan-local, no shuffle). The sample MEMBERSHIP is
    engine-specific (Spark's XORShift vs anything else), so the gated
    query wraps this in engine-portable invariants instead of hashing
    row identity."""
    l = table(spark, sf_dir, "lineitem")
    return l.sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@query(
    "sample_reproducible",
    oracle="""
    SELECT COUNT(*) AS n_total,
           TRUE     AS sample_rate_ok,
           TRUE     AS all_rows_from_source
    FROM lineitem
    """,
)
def sample_reproducible(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance gate for the seeded Bernoulli sample: the exact source
    count (hash-matched against DuckDB) plus two engine-portable
    invariants — the realized rate is within ±0.03 of the requested 0.1
    (>7σ of Binomial noise at the smallest test SF, so a correct sampler
    never trips it), and every sampled row exists in the source (left-anti
    join count is zero). The oracle asserts literal TRUE for both, so a
    broken sampler hash-fails the gate."""
    l = table(spark, sf_dir, "lineitem")
    s = reproducible_sample(spark, sf_dir)
    tot = l.agg(F.count("*").alias("n_total"))
    samp = s.agg(F.count("*").alias("n_samp"))
    bad = (
        s.select("l_orderkey", "l_linenumber")
        .join(l.select("l_orderkey", "l_linenumber"), ["l_orderkey", "l_linenumber"], "left_anti")
        .agg(F.count("*").alias("n_bad"))
    )
    return (
        tot.crossJoin(samp)
        .crossJoin(bad)
        .select(
            "n_total",
            (
                F.abs(F.col("n_samp") / F.col("n_total") - 0.1) <= 0.03
            ).alias("sample_rate_ok"),
            (F.col("n_bad") == 0).alias("all_rows_from_source"),
        )
    )


@query(
    "agg_collect_sorted_lists",
    oracle="""
    SELECT o_custkey,
           LIST(o_orderkey ORDER BY o_orderkey)          AS order_keys,
           STRING_AGG(o_orderstatus, ',' ORDER BY o_orderkey) AS status_seq
    FROM orders
    WHERE o_totalprice > 450000
    GROUP BY o_custkey
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection aggregates: per-customer sorted key list + ordered
    string_agg. collect_list has no deterministic order in a distributed
    aggregate, so determinism comes from collecting (key, payload) structs
    and sorting AFTER collection — sort_array + transform, the portable way
    to get DuckDB's ORDER BY-qualified aggregates."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    pairs = F.sort_array(
        F.collect_list(F.struct("o_orderkey", "o_orderstatus"))
    )
    return o.groupBy("o_custkey").agg(pairs.alias("p")).select(
        "o_custkey",
        F.expr("transform(p, x -> x.o_orderkey)").alias("order_keys"),
        F.array_join(F.expr("transform(p, x -> x.o_orderstatus)"), ",").alias("status_seq"),
    )


@query(
    "agg_corr_covar_price_qty",
    oracle="""
    SELECT l_returnflag,
           ROUND(CORR(l_extendedprice, l_quantity), 4)       AS price_qty_corr,
           ROUND(COVAR_SAMP(l_extendedprice, l_quantity), 2) AS price_qty_covar,
           ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 4) AS price_per_unit
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistical aggregates: correlation, sample covariance and
    regression slope of price against quantity per return flag — single-pass
    mergeable moments (partial aggregation map-side, like any sum/count), so
    one small shuffle at any scale. 3 groups × ~20k rows each: float noise
    ~1e-10 relative against 2-4 dp rounding."""
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.corr("l_extendedprice", "l_quantity"), 4).alias("price_qty_corr"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 2).alias("price_qty_covar"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("price_per_unit"),
    )


@query(
    "agg_approx_percentiles_sketch",
    oracle="""
    SELECT o_orderpriority,
           ROUND(QUANTILE_CONT(o_totalprice, 0.25), 2) AS exact_p25,
           ROUND(QUANTILE_CONT(o_totalprice, 0.50), 2) AS exact_p50,
           ROUND(QUANTILE_CONT(o_totalprice, 0.75), 2) AS exact_p75,
           TRUE AS within_tolerance
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (KLL-style mergeable sketch) — the 100 TB
    replacement for agg_exact_percentiles: fixed-size per-partition
    sketches merge map-side instead of gathering each group's values.

    The sketch VALUES are implementation-specific, so the gate hashes the
    exact interpolated percentiles (Spark ``percentile`` == DuckDB
    ``QUANTILE_CONT``, both type-7 linear interpolation) per group plus a
    boolean that every sketch estimate landed within 5% of its exact twin
    — the oracle asserts literal TRUE, so a sketch regression beyond
    tolerance hash-fails. With accuracy 10000 the rank error at the gated
    SFs is <1 rank, leaving ~50x headroom inside the 5% value slack."""
    o = table(spark, sf_dir, "orders")
    qs = F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
    agg = o.groupBy("o_orderpriority").agg(
        F.approx_percentile("o_totalprice", qs, 10000).alias("ap"),
        F.percentile("o_totalprice", qs).alias("ep"),
    )
    tol = F.aggregate(
        F.zip_with(
            "ap", "ep", lambda a, e: (F.abs(a - e) / F.abs(e)) <= F.lit(0.05)
        ),
        F.lit(True),
        lambda acc, ok: acc & ok,
    )
    return agg.select(
        "o_orderpriority",
        F.round(F.col("ep")[0], 2).alias("exact_p25"),
        F.round(F.col("ep")[1], 2).alias("exact_p50"),
        F.round(F.col("ep")[2], 2).alias("exact_p75"),
        tol.alias("within_tolerance"),
    )


@query(
    "agg_salted_two_phase",
    oracle="""
    SELECT event_type,
           COUNT(*)             AS n,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def agg_salted_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-mitigation idiom as a gated operator: aggregate on
    (key, salt) first — 16x more reducers share a hot key's rows — then
    roll the salted partials up to the key. For algebraic aggregates the
    two-phase result is EXACTLY the direct one (the oracle is the plain
    GROUP BY), which is the property that makes salting safe to deploy.
    Spark's map-side partial aggregation already gives this for free when
    the hot key is spread across input partitions; explicit salting is
    the fix when a hot key arrives CLUSTERED (sorted input, single kafka
    partition) and one reducer would otherwise own the whole key. Sums
    are rounded once, after the final rollup, so salting cannot perturb
    the hash."""
    e = table(spark, sf_dir, "events")
    salted = e.withColumn(
        "salt", (F.crc32(F.col("event_id").cast("string")) % 16).cast("int")
    )
    partial = salted.groupBy("event_type", "salt").agg(
        F.count("*").alias("pn"), F.sum("value").alias("pv")
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        F.round(F.sum("pv"), 2).alias("total_value"),
    )


@query(
    "sample_fixed_per_group",
    oracle="""
    WITH ranked AS (
        SELECT event_type, event_id, user_id,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY MD5('r:' || CAST(event_id AS VARCHAR)),
                                           event_id) AS rn
        FROM events
    )
    SELECT event_type, event_id, user_id, rn
    FROM ranked
    WHERE rn <= 20
    """,
)
def sample_fixed_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-size per-group sample (reservoir-sampling
    semantics without reservoir state): rank rows inside each group by a
    seeded md5 of their id and keep the first 20 — every group yields
    exactly min(20, |group|) rows, uniformly chosen, identical on any
    engine and any cluster layout. One shuffle on the group key; at scale
    the rank prunes with WindowGroupLimit (rn <= k pushes the top-k into
    the sort, so no group ever materializes fully)."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.concat(F.lit("r:"), F.col("event_id").cast("string"))), "event_id"
    )
    return (
        e.select("event_type", "event_id", "user_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
    )


_SKEW_SALTS = 8


@query(
    "join_salted_skew_join",
    oracle=f"""
    SELECT p.p_type,
           COUNT(*) AS n_lines,
           CAST(SUM({MONEY_CENTS_DUCK.format(col="l_extendedprice")}) AS DOUBLE)
               / 100.0 AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_type
    """,
)
def join_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted *join* idiom as a gated operator (the companion to
    agg_salted_two_phase): the dimension side is replicated once per salt
    and the fact side gets a deterministic salt, so a hot join key's rows
    spread across 8 reducers instead of one. Because every fact row
    matches exactly one replica of its key, the salted join is row-for-row
    EQUAL to the plain join — the oracle is the plain join + rollup,
    which is the property that makes salting safe to deploy. This is what
    AQE's skew-join split does adaptively; the explicit form is the fix
    when skew is known ahead of time (a boilerplate part, a bot user) or
    AQE's per-partition thresholds miss it. Revenue sums ride exact
    integer cents (money_cents — never a double→DECIMAL cast, whose
    half-cent behavior is engine-version-defined) so the salted reduction
    order cannot perturb the hash.

    Scale: the replicated dim is |part| × 8 rows of two columns — still a
    shuffle (or broadcast) of the SMALL side; the fact side's shuffle is
    the same size as unsalted, just spread over 8× the key space."""
    l = table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        money_cents(F.col("l_extendedprice")).alias("cents"),
        (F.crc32(F.col("l_orderkey").cast("string")) % _SKEW_SALTS)
        .cast("int")
        .alias("salt"),
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    replicas = p.withColumn(
        "salt",
        F.explode(F.array(*[F.lit(i) for i in range(_SKEW_SALTS)])),
    )
    joined = l.join(
        replicas,
        (l.l_partkey == replicas.p_partkey) & (l.salt == replicas.salt),
    )
    return joined.groupBy("p_type").agg(
        F.count("*").alias("n_lines"),
        (F.sum("cents").cast("double") / F.lit(100.0)).alias("revenue"),
    )


@query(
    "curation_tokenizer_fertility",
    oracle="""
    WITH per_doc AS (
        SELECT lang,
               LEN(STRING_SPLIT(text, ' ')) AS n_words,
               LEN(REGEXP_EXTRACT_ALL(text, '[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))
                   AS n_subwords
        FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT)    AS total_words,
           CAST(SUM(n_subwords) AS BIGINT) AS total_subwords,
           ROUND(SUM(n_subwords) * 1.0 / SUM(n_words), 4) AS fertility
    FROM per_doc
    GROUP BY lang
    """,
)
def curation_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: subword-tokens-per-word under
    the BPE-ish regex segmentation — the multilingual-tokenizer-equity
    audit (languages a tokenizer over-fragments pay more compute per
    word and effectively see less context), and the conversion factor
    that turns word budgets into token budgets per language.

    Plan: the two token counters are one row-local projection (no
    explode — counts come straight off the regex/split arrays), then a
    |langs|-row aggregate. Entirely map-side until the tiny final
    exchange."""
    d = table(spark, sf_dir, "documents")
    per_doc = d.select(
        "lang",
        F.size(F.split("text", " ")).alias("n_words"),
        F.size(
            F.expr(
                "regexp_extract_all(text, '[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0)"
            )
        ).alias("n_subwords"),
    )
    return per_doc.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").alias("total_words"),
        F.sum("n_subwords").alias("total_subwords"),
        F.round(
            F.sum("n_subwords") * 1.0 / F.sum("n_words"), 4
        ).alias("fertility"),
    )


# ---------------------------------------------------------------------------
# agg_hll_intersection_estimate — sketch-based audience-overlap estimation
# ---------------------------------------------------------------------------

_HLL_PAIRS = [("view", "click"), ("click", "purchase"), ("signup", "purchase")]
# tolerance for the inclusion-exclusion estimate, as a fraction of the
# EXACT union size (inclusion-exclusion sums three ±rsd sketches, so the
# gate scales to the union, not the intersection): 8% ≈ 4× the 2% rsd
_HLL_INTERSECT_TOL = 0.08


@query(
    "agg_hll_intersection_estimate",
    oracle="""
    """
    + "\nUNION ALL\n".join(
        f"""
    SELECT '{a}' AS type_a, '{b}' AS type_b,
           CAST(SUM(ha * hb) AS BIGINT) AS exact_intersection,
           TRUE AS within_tolerance
    FROM (SELECT user_id,
                 MAX(CASE WHEN event_type = '{a}' THEN 1 ELSE 0 END) AS ha,
                 MAX(CASE WHEN event_type = '{b}' THEN 1 ELSE 0 END) AS hb
          FROM events WHERE event_type IN ('{a}', '{b}')
          GROUP BY user_id)"""
        for a, b in _HLL_PAIRS
    ),
)
def agg_hll_intersection_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimation from mergeable sketches: |A ∩ B| via
    HLL inclusion-exclusion (est_A + est_B − est_A∪B) — the only way to
    intersect user sets that live on different machines/days without
    re-shuffling raw ids (HLL unions are lossless and mergeable;
    intersections must go through inclusion-exclusion). This is the
    cross-segment overlap / reach-dedup primitive every audience or
    ads-measurement pipeline runs.

    Gated like agg_approx_distinct_users: the estimate is
    implementation-specific, so the hash gate pins the EXACT overlap plus
    a boolean asserting the sketch estimate landed within
    ``_HLL_INTERSECT_TOL`` (8%) of the exact union (inclusion-exclusion
    amplifies the per-sketch rsd by
    roughly |A|+|B|+|A∪B| over the intersection, so tolerance is scaled
    to the union, not the intersection). Two shuffles: distinct flags per
    user, then a global 1-row rollup per pair."""
    e = table(spark, sf_dir, "events")
    # ONE scan + ONE user_id shuffle serves all pairs: per-user type flags
    # first, then every pair's exact/sketch stats as columns of a single
    # global aggregate, unpivoted to rows with an explode (no per-pair
    # re-scan, no recomputed aggregate branches)
    types = sorted({t for p in _HLL_PAIRS for t in p})
    per_user = (
        e.filter(F.col("event_type").isin(*types))
        .groupBy("user_id")
        .agg(
            *[
                F.max((F.col("event_type") == t).cast("int")).alias(f"h_{t}")
                for t in types
            ]
        )
    )
    # 7 sketches, not 15: each TYPE's cardinality sketch is shared by every
    # pair that mentions it, and only the per-pair UNION needs its own
    # sketch. rsd is 2% — HLL buffer width scales as 1/rsd² and the
    # declarative register updates run per input row, so 1% sketches cost
    # ~3x the whole rest of the aggregate; 2% is the at-scale tradeoff
    aggs = [
        F.approx_count_distinct(
            F.when(F.col(f"h_{t}") == 1, F.col("user_id")), 0.02
        ).alias(f"e_{t}")
        for t in types
    ]
    for a, b in _HLL_PAIRS:
        ha, hb = F.col(f"h_{a}"), F.col(f"h_{b}")
        aggs += [
            F.sum(ha * hb).cast("bigint").alias(f"xi_{a}_{b}"),
            F.sum(F.greatest(ha, hb)).alias(f"xu_{a}_{b}"),
            F.approx_count_distinct(
                F.when((ha == 1) | (hb == 1), F.col("user_id")), 0.02
            ).alias(f"eu_{a}_{b}"),
        ]
    one = per_user.agg(*aggs)
    rows = []
    for a, b in _HLL_PAIRS:
        est_inter = F.col(f"e_{a}") + F.col(f"e_{b}") - F.col(f"eu_{a}_{b}")
        rows.append(
            F.struct(
                F.lit(a).alias("type_a"),
                F.lit(b).alias("type_b"),
                F.col(f"xi_{a}_{b}").alias("exact_intersection"),
                (
                    F.abs(est_inter - F.col(f"xi_{a}_{b}"))
                    <= _HLL_INTERSECT_TOL * F.col(f"xu_{a}_{b}")
                ).alias("within_tolerance"),
            )
        )
    return one.select(F.explode(F.array(*rows)).alias("s")).select("s.*")


# ---------------------------------------------------------------------------
# agg_mode_per_group — per-group MODE with deterministic tiebreak
# ---------------------------------------------------------------------------


@query(
    "agg_mode_per_group",
    oracle="""
    WITH cnt AS (
        SELECT user_id, event_type, COUNT(*) AS c
        FROM events GROUP BY user_id, event_type
    ), ranked AS (
        SELECT user_id, event_type, c,
               SUM(c) OVER (PARTITION BY user_id) AS n_events,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY c DESC, event_type) AS rn
        FROM cnt
    )
    SELECT user_id,
           event_type                         AS mode_event_type,
           CAST(n_events AS BIGINT)           AS n_events,
           ROUND(CAST(c AS DOUBLE) / n_events, 4) AS mode_share
    FROM ranked WHERE rn = 1
    """,
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group MODE (most frequent value) with a deterministic tiebreak
    (lexicographically first among ties) plus its share of the group —
    the statistical mode aggregate SQL engines bolt on late (DuckDB grew
    MODE(); ANSI has none), stated as the portable two-step: count per
    (group, value), then top-1 per group.

    Scale shape: the (user, event_type) count is one partial+final
    hash-agg whose output is |users|x|types| rows — the raw stream never
    reaches the window; the top-1 is a WindowGroupLimit (rn = 1 pushes
    the limit into the sort) over that tiny table, and the group total
    rides the same window partitioning, so the window pass adds no
    second exchange."""
    e = table(spark, sf_dir, "events")
    cnt = e.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    w = Window.partitionBy("user_id")
    w_rank = w.orderBy(F.col("c").desc(), "event_type")
    return (
        cnt.select(
            "user_id",
            "event_type",
            "c",
            F.sum("c").over(w).alias("n_events"),
            F.row_number().over(w_rank).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_event_type"),
            F.col("n_events").cast("bigint").alias("n_events"),
            F.round(F.col("c").cast("double") / F.col("n_events"), 4).alias(
                "mode_share"
            ),
        )
    )


# ---------------------------------------------------------------------------
# agg_bitmap_exact_distinct_rollup — exact distinct via mergeable bitmaps
# ---------------------------------------------------------------------------


@query(
    "agg_bitmap_exact_distinct_rollup",
    oracle="""
    SELECT event_type,
           CAST(ts AS DATE)              AS day,
           COUNT(DISTINCT user_id)       AS distinct_users
    FROM events
    GROUP BY event_type, CAST(ts AS DATE)
    """,
)
def agg_bitmap_exact_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counts through mergeable bitmap partials (Spark 3.5
    bitmap_* aggregates): user ids are bucketed
    (bitmap_bucket_number), each (event_type, day, bucket) builds a
    32 KiB bitmap of bit positions (bitmap_construct_agg), and the final
    count is the SUM of per-bucket popcounts. Unlike COUNT(DISTINCT),
    the bitmap partials are mergeable and reusable: a week/month rollup
    or an OR across segments (bitmap_or_agg) reuses the same
    pre-aggregated bitmaps with no rescan of raw ids — the exact-count
    sibling of the HLL-sketch rollup, and the pattern that replaces
    repeated count-distinct scans in a 100 TB metrics store.

    Plan: two hash aggregates (ids→bucket bitmaps, bitmaps→popcount sum);
    the first shuffles (type, day, bucket) rows with fixed-size binary
    payloads instead of raw id multisets — shuffle bytes are bounded by
    buckets × 32 KiB per group regardless of row count. The oracle is the
    plain COUNT(DISTINCT): values must match EXACTLY (bitmaps are not an
    estimate)."""
    e = table(spark, sf_dir, "events")
    buckets = (
        e.select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"),
        )
        .groupBy("event_type", "day", "bucket")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    return (
        buckets.groupBy("event_type", "day")
        .agg(F.sum(F.expr("bitmap_count(bm)")).cast("long").alias("distinct_users"))
    )


# ---------------------------------------------------------------------------
# agg_bitmap_exact_intersection — exact pairwise set overlap via bitmap merge
# ---------------------------------------------------------------------------


@query(
    "agg_bitmap_exact_intersection",
    oracle="""
    WITH t AS (SELECT DISTINCT event_type FROM events),
    p AS (
        SELECT a.event_type AS ta, b.event_type AS tb
        FROM t a JOIN t b ON a.event_type < b.event_type
    ),
    u AS (SELECT DISTINCT event_type, user_id FROM events)
    SELECT p.ta AS type_a, p.tb AS type_b,
           CAST((SELECT COUNT(*) FROM u WHERE u.event_type = p.ta)
                AS BIGINT) AS n_a,
           CAST((SELECT COUNT(*) FROM u WHERE u.event_type = p.tb)
                AS BIGINT) AS n_b,
           CAST((SELECT COUNT(*) FROM u x JOIN u y ON x.user_id = y.user_id
                  WHERE x.event_type = p.ta AND y.event_type = p.tb)
                AS BIGINT) AS n_common
    FROM p
    """,
)
def agg_bitmap_exact_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT pairwise audience overlap between every pair of event types
    via mergeable bitmaps and inclusion-exclusion — the exact twin of
    agg_hll_intersection_estimate: |A∩B| = |A| + |B| − |A∪B|, where
    |A∪B| is a popcount over bitmap_or_agg-merged bucket bitmaps. The
    raw user ids are bucketed and bitmapped ONCE (one pass over events);
    every pair's union then merges the SAME fixed-size bucket bitmaps —
    adding a segment pair costs bitmap-OR work, never another scan or
    shuffle of raw ids. This is how a 100 TB metrics store answers 'how
    much do these audiences overlap, exactly' for many segment pairs.

    Plan: one hash-agg builds (type, bucket)→bitmap partials; the pair
    fan-out joins those partials against a |types|²-row broadcast pair
    list; per-pair union is a second hash-agg over (pair, bucket) with
    bitmap_or_agg; per-type sizes come from the same cached partials.
    Shuffle bytes are types × buckets × 4 KiB, independent of row count.

    Determinism: every output is an exact integer count."""
    e = table(spark, sf_dir, "events")
    bm = (
        e.select(
            "event_type",
            F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    bm = transient_persist(bm)  # feeds per-type sizes AND both pair sides
    sizes = bm.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).cast("long").alias("n")
    )
    types = bm.select("event_type").distinct()
    pairs = (
        types.alias("a")
        .join(
            types.alias("b"),
            F.col("a.event_type") < F.col("b.event_type"),
        )
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
    )
    contrib = (
        F.broadcast(pairs)
        .join(bm, F.col("event_type") == F.col("type_a"))
        .select("type_a", "type_b", "bucket", "bm")
        .unionByName(
            F.broadcast(pairs)
            .join(bm, F.col("event_type") == F.col("type_b"))
            .select("type_a", "type_b", "bucket", "bm")
        )
    )
    union_n = (
        contrib.groupBy("type_a", "type_b", "bucket")
        .agg(F.expr("bitmap_or_agg(bm)").alias("u"))
        .groupBy("type_a", "type_b")
        .agg(F.sum(F.expr("bitmap_count(u)")).cast("long").alias("n_union"))
    )
    na = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        union_n.join(F.broadcast(na), "type_a")
        .join(F.broadcast(nb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            (F.col("n_a") + F.col("n_b") - F.col("n_union")).alias("n_common"),
        )
    )
