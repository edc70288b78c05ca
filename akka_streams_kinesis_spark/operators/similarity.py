"""Similarity search over the ``embeddings`` table (array<float> column).

Two paths, as a real pipeline would ship them:

- brute-force cosine top-k — the correctness baseline; JVM-side
  ``aggregate``/``zip_with`` folds in DOUBLE precision (bit-reproducible
  left-to-right, which is what lets a DuckDB oracle hash-match at 6 dp).
- IVF/LSH-bucketed ANN — the scale path: a coarse sign-bit quantizer
  partitions the corpus; each query only scans its own bucket, so the scan
  cost drops by the bucket fan-out (256× here) at the price of recall.

At 100 TB the brute-force plan is a broadcast of the (small) query set
against a partitioned corpus scan — embarrassingly parallel, no shuffle on
the corpus; the ANN plan turns the crossJoin into an equi-join on bucket id.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from ..io import fanout, table
from ..registry import query
from ..shared import shared_frame, transient_persist

_TOPK = 5
_N_QUERIES = 10   # query set = vec_id < 10
_DIM = 64          # embeddings table vector dimension — shared by every
                   # oracle f-string (RANGE bound) so a dataset dimension
                   # change cannot silently desync Spark vs oracle row sets
_IVF_BITS = 8     # sign bits of the first 8 dims → 256 buckets


def _fold(a: str, b: str) -> Column:
    """Σ a[i]*b[i] as a strict left-to-right DOUBLE fold (deterministic)."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def cosine_sim(a: str, b: str) -> Column:
    """Cosine similarity between two array<float> columns, double precision."""
    return _fold(a, b) / (F.sqrt(_fold(a, a)) * F.sqrt(_fold(b, b)))


# DuckDB twin: Σ over unnested index range, computed in DOUBLE. Summation
# order noise is ~1e-15 relative in double, far below the 6 dp rounding.
_DUCK_SIM = """
    SUM(CAST(q.embedding[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE))
      / (SQRT(SUM(CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))
       * SQRT(SUM(CAST(v.embedding[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE))))
"""


@query(
    "similarity_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT * FROM embeddings WHERE vec_id < {_N_QUERIES}),
    sims AS (
        SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
               ROUND({_DUCK_SIM}, 6) AS sim
        FROM q
        JOIN embeddings v ON q.vec_id <> v.vec_id
        CROSS JOIN UNNEST(RANGE(1, {_DIM + 1})) AS t(i)
        GROUP BY q.vec_id, v.vec_id
    ), ranked AS (
        SELECT query_id, vec_id, sim,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rnk
        FROM sims
    )
    SELECT query_id, vec_id, sim, rnk FROM ranked WHERE rnk <= {_TOPK}
    """,
)
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the query vectors against the
    corpus scan (no corpus shuffle), fold dot/norms JVM-side, then a
    per-query top-k window. Ranking uses the 6-dp-rounded similarity with
    vec_id tie-break so the cut is deterministic on both engines."""
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    # fanout: the corpus side does |q|×N fold evaluations; spread them over
    # every core instead of the scan's (possibly single) input split
    v = fanout(e).select(F.col("vec_id").alias("vec_id"), F.col("embedding").alias("v_emb"))
    sims = (
        v.join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_sim("q_emb", "v_emb"), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOPK)
        .select("query_id", "vec_id", "sim", "rnk")
    )


def _bucket_spark() -> Column:
    # built lazily: Column construction needs an active SparkSession
    return F.concat(
        *[
            F.when(F.expr(f"embedding[{i}]") >= 0, "1").otherwise("0")
            for i in range(_IVF_BITS)
        ]
    )

_BUCKET_DUCK = " || ".join(
    f"(CASE WHEN embedding[{i + 1}] >= 0 THEN '1' ELSE '0' END)" for i in range(_IVF_BITS)
)


@query(
    "similarity_ann_ivf",
    oracle=f"""
    WITH coded AS (
        SELECT vec_id, embedding, {_BUCKET_DUCK} AS bucket FROM embeddings
    ), q AS (SELECT * FROM coded WHERE vec_id < {_N_QUERIES}),
    sims AS (
        SELECT q.vec_id AS query_id, v.vec_id AS vec_id, q.bucket AS bucket,
               ROUND({_DUCK_SIM}, 6) AS sim
        FROM q
        JOIN coded v ON q.bucket = v.bucket AND q.vec_id <> v.vec_id
        CROSS JOIN UNNEST(RANGE(1, {_DIM + 1})) AS t(i)
        GROUP BY q.vec_id, v.vec_id, q.bucket
    ), ranked AS (
        SELECT query_id, vec_id, bucket, sim,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rnk
        FROM sims
    )
    SELECT query_id, vec_id, bucket, sim, rnk FROM ranked WHERE rnk <= 3
    """,
)
def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: sign-bit coarse quantizer (first 8 dims → 256 cells);
    candidates come only from the query's own cell, turning the crossJoin
    into an equi-join on bucket — the join Spark shuffles/broadcasts like
    any other key join, scanning 1/256th of the corpus per query."""
    e = fanout(table(spark, sf_dir, "embeddings"))
    coded = e.select("vec_id", "embedding", _bucket_spark().alias("bucket"))
    q = coded.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket"),
    )
    v = coded.select(
        F.col("vec_id").alias("vec_id"),
        F.col("embedding").alias("v_emb"),
        F.col("bucket").alias("v_bucket"),
    )
    sims = (
        v.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("v_bucket")) & (F.col("query_id") != F.col("vec_id")),
        )
        .select(
            "query_id",
            "vec_id",
            "bucket",
            F.round(cosine_sim("q_emb", "v_emb"), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("query_id", "vec_id", "bucket", "sim", "rnk")
    )


@query(
    "similarity_label_centroids",
    oracle=f"""
    SELECT label, CAST(i - 1 AS BIGINT) AS dim,
           ROUND(AVG(CAST(embedding[i] AS DOUBLE)), 6) AS centroid
    FROM embeddings
    CROSS JOIN UNNEST(RANGE(1, {_DIM + 1})) AS t(i)
    GROUP BY label, i
    """,
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster centroids (element-wise mean over each label's vectors) —
    the building block of k-means / IVF coarse-quantizer training.

    posexplode turns the vector column into (label, dim, value) rows so the
    centroid is one hash aggregate on (label, dim): map-side partial sums
    shrink the shuffle to n_labels × dim rows regardless of corpus size —
    the same partial-aggregate shape Spark would use for any scalar mean.
    Float noise vs the oracle is ~1e-14 against 6 dp rounding (per-cell sums
    of a few hundred unit-scale values)."""
    e = fanout(table(spark, sf_dir, "embeddings"))
    exploded = e.select(
        "label", F.posexplode("embedding").alias("dim", "v")
    )
    return exploded.groupBy("label", F.col("dim").cast("long").alias("dim")).agg(
        F.round(F.avg(F.col("v").cast("double")), 6).alias("centroid")
    )


# ---------------------------------------------------------------------------
# similarity_hyperplane_lsh — cosine-LSH with OR-amplified bands
# ---------------------------------------------------------------------------

# 12 seeded Gaussian hyperplanes → sign bits → 2 bands of 6 bits. A vector
# lands in 2 buckets (one per band); candidates = bucket collisions in ANY
# band (OR-amplification: recall ~ 1-(1-p^6)^2 vs a single 12-bit cell's
# p^12). Weights are fixed 4-dp literals so Spark and the DuckDB oracle
# quantize with bit-identical planes.
import random as _random

_HP_K = 12
_HP_BAND = 6
_HP_DIM = 64
_rnd = _random.Random(421)
_PLANES = [
    [round(_rnd.gauss(0.0, 1.0), 4) for _ in range(_HP_DIM)] for _ in range(_HP_K)
]
_HP_TOPK = 3


def _hp_dot(plane: list[float]) -> Column:
    # NOTE: an unrolled 64-term sum per plane (768 expression nodes total)
    # was measured SLOWER than this fold (8.7s vs 3.9s at sf0.1): the
    # generated code blows past JIT/codegen method limits and compile time
    # dominates. The interpreted HOF pays ~10× per element but stays O(K·D)
    # small here.
    arr = "array(" + ", ".join(f"CAST({w} AS DOUBLE)" for w in plane) + ")"
    return F.expr(
        f"aggregate(zip_with(embedding, {arr}, (x, w) -> CAST(x AS DOUBLE) * w), "
        f"CAST(0.0 AS DOUBLE), (a, v) -> a + v)"
    )


def _hp_oracle() -> str:
    values = ",\n               ".join(
        f"({p}, CAST([{', '.join(str(w) for w in plane)}] AS DOUBLE[]))"
        for p, plane in enumerate(_PLANES)
    )
    return f"""
    WITH planes AS (
        SELECT * FROM (VALUES {values}) AS t(p, w)
    ), dots AS (
        SELECT e.vec_id, p.p,
               SUM(CAST(e.embedding[i] AS DOUBLE) * p.w[i]) AS d
        FROM embeddings e
        CROSS JOIN planes p
        CROSS JOIN UNNEST(RANGE(1, {_HP_DIM + 1})) AS t(i)
        GROUP BY e.vec_id, p.p
    ), codes AS (
        SELECT vec_id, p // {_HP_BAND} AS band_idx,
               STRING_AGG(CASE WHEN d >= 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS code
        FROM dots GROUP BY vec_id, p // {_HP_BAND}
    ), cands AS (
        SELECT DISTINCT q.vec_id AS query_id, v.vec_id AS vec_id
        FROM codes q
        JOIN codes v ON q.band_idx = v.band_idx AND q.code = v.code
        WHERE q.vec_id < {_N_QUERIES} AND q.vec_id <> v.vec_id
    ), sims AS (
        SELECT c.query_id, c.vec_id, ROUND({_DUCK_SIM}, 6) AS sim
        FROM cands c
        JOIN embeddings q ON q.vec_id = c.query_id
        JOIN embeddings v ON v.vec_id = c.vec_id
        CROSS JOIN UNNEST(RANGE(1, {_HP_DIM + 1})) AS t(i)
        GROUP BY c.query_id, c.vec_id
    ), ranked AS (
        SELECT query_id, vec_id, sim,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rnk
        FROM sims
    )
    SELECT query_id, vec_id, sim, rnk FROM ranked WHERE rnk <= {_HP_TOPK}
    """


@query("similarity_hyperplane_lsh", oracle=_hp_oracle())
def hyperplane_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane (cosine) LSH ANN: quantize each embedding to 12
    sign bits against seeded Gaussian hyperplanes, split into 2 bands of 6,
    take bucket collisions in any band as candidates, rerank exactly with
    the double-precision cosine fold. Complements `similarity_ann_ivf`:
    data-independent planes + OR-amplified recall vs a single coarse cell.

    Scale shape: the banded self-join is an equi-join on (band, 6-bit
    code); candidate count is output-sensitive, and the exact rerank only
    touches candidates. The 12 plane dots are one projection over the
    corpus scan — no shuffle until the (tiny) candidate join."""
    e = fanout(table(spark, sf_dir, "embeddings"))
    dots = e.select(
        "vec_id", *[_hp_dot(p).alias(f"d{j}") for j, p in enumerate(_PLANES)]
    )
    n_bands = _HP_K // _HP_BAND
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.concat(
                    *[
                        F.when(F.col(f"d{b * _HP_BAND + j}") >= 0, "1").otherwise("0")
                        for j in range(_HP_BAND)
                    ]
                ).alias("code"),
            )
            for b in range(n_bands)
        ]
    )
    codes = dots.select("vec_id", F.explode(bands).alias("bc")).select(
        "vec_id", F.col("bc.band_idx").alias("band_idx"), F.col("bc.code").alias("code")
    )
    q = codes.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "band_idx", "code"
    )
    cands = (
        codes.join(F.broadcast(q), ["band_idx", "code"])
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    emb = table(spark, sf_dir, "embeddings")
    qe = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    ve = emb.select("vec_id", F.col("embedding").alias("v_emb"))
    sims = (
        cands.join(F.broadcast(qe), "query_id")
        .join(ve, "vec_id")
        .select(
            "query_id", "vec_id", F.round(cosine_sim("q_emb", "v_emb"), 6).alias("sim")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _HP_TOPK)
        .select("query_id", "vec_id", "sim", "rnk")
    )


# ---------------------------------------------------------------------------
# embedding_quantize_int8 — symmetric per-vector quantization QA
# ---------------------------------------------------------------------------


@query(
    "embedding_quantize_int8",
    oracle="""
    SELECT label,
           COUNT(*) AS n_vecs,
           ROUND(SUM(err) / COUNT(*), 6) AS avg_q_err,
           ROUND(MAX(scale), 6) AS max_scale
    FROM (
        SELECT label, vec_id, scale,
               ROUND(LIST_SUM(LIST_TRANSFORM(embedding,
                     x -> ABS(CAST(x AS DOUBLE)
                              - ROUND(CAST(x AS DOUBLE) / scale) * scale)))
                     / LEN(embedding), 6) AS err
        FROM (
            SELECT label, vec_id, embedding,
                   LIST_MAX(LIST_TRANSFORM(embedding,
                            x -> ABS(CAST(x AS DOUBLE)))) / 127.0 AS scale
            FROM embeddings
        )
    )
    GROUP BY label
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization QA: scale = max|x|/127,
    q = round(x/scale), reported as mean reconstruction error per label —
    the audit a pipeline runs before swapping a float32 embedding store for
    int8 (4× smaller, the difference between 100 TB and 25 TB of vectors).

    Engine parity: the scale uses MAX (order-exact, no float-summation
    ambiguity); only the final error mean crosses a float sum, rounded at
    6 dp after a per-vector 6-dp round."""
    e = fanout(table(spark, sf_dir, "embeddings"))
    scaled = e.select(
        "label",
        "vec_id",
        "embedding",
        (
            F.expr(
                "aggregate(embedding, CAST(0.0 AS DOUBLE),"
                " (a, x) -> greatest(a, abs(CAST(x AS DOUBLE))))"
            )
            / 127.0
        ).alias("scale"),
    )
    err = (
        F.expr(
            "aggregate(transform(embedding,"
            " x -> abs(CAST(x AS DOUBLE) - round(CAST(x AS DOUBLE) / scale) * scale)),"
            " CAST(0.0 AS DOUBLE), (a, v) -> a + v)"
        )
        / F.size("embedding")
    )
    per_vec = scaled.select("label", "vec_id", "scale", F.round(err, 6).alias("err"))
    return per_vec.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.round(F.sum("err") / F.count("*"), 6).alias("avg_q_err"),
        F.round(F.max("scale"), 6).alias("max_scale"),
    )


_KNN_K = 3
# bounded block size: a label cell larger than this is split into
# deterministic sub-buckets (vec_id % ceil(n/256)), so the per-cell
# pairwise stage is O(block²) with a CONSTANT block bound — total cost
# linear in N. Without the cap the fixed label count makes the stage
# quadratic (measured 38x wall at 10x data in BENCH_SCALING before the
# cap). At every SF ≤ 0.1 each label fits one bucket, so results there
# are identical to the uncapped form.
_KNN_BLOCK = 256


@query(
    "similarity_knn_graph_blocked",
    oracle=f"""
    WITH bucketed AS (
        SELECT vec_id, label, embedding,
               vec_id % CAST(CEIL(COUNT(*) OVER (PARTITION BY label)
                                  / {_KNN_BLOCK}.0) AS BIGINT) AS bkt
        FROM embeddings
    ), pairs AS (
        SELECT a.vec_id AS src, b.vec_id AS dst, a.label AS label,
               ROUND(
                 SUM(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))
                 / (SQRT(SUM(CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))
                  * SQRT(SUM(CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))),
                 6) AS sim
        FROM bucketed a
        JOIN bucketed b ON a.label = b.label AND a.bkt = b.bkt AND a.vec_id <> b.vec_id
        CROSS JOIN UNNEST(RANGE(1, {_DIM + 1})) AS t(i)
        GROUP BY a.vec_id, b.vec_id, a.label
    ), ranked AS (
        SELECT src, dst, label, sim,
               ROW_NUMBER() OVER (PARTITION BY src ORDER BY sim DESC, dst) AS rnk
        FROM pairs
    )
    SELECT src AS vec_id, dst AS neighbor_id, label, sim, rnk
    FROM ranked WHERE rnk <= {_KNN_K}
    """,
)
def similarity_knn_graph_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-nearest-neighbor GRAPH construction (every vector's top-{_KNN_K}
    neighbors), the substrate for graph-based dedup/diversity/cluster
    steps — blocked by the label cell so the pairwise stage is an
    EQUI-join per cell, never a corpus × corpus product — and every cell
    is SIZE-BOUNDED: labels larger than _KNN_BLOCK split into
    deterministic vec_id-hash sub-buckets, so the pairwise stage is
    O(N·block), linear in corpus size (the uncapped label blocking
    measured 38x wall at 10x data). This is the kNN-graph analog of the
    IVF search path: at 100 TB the cells come from a learned quantizer
    (see dedup_semantic_kmeans) with the same size cap, and each cell's
    block is GEMM-sized; the toy label+bucket blocking keeps the plan
    shape exact and oracle-checkable.

    Per-source top-k uses the 6-dp-rounded similarity with dst tie-break
    (deterministic on both engines); WindowGroupLimit pushes the k-cut
    into the per-cell sort."""
    e = table(spark, sf_dir, "embeddings")
    # per-label counts via a tiny aggregate + broadcast join — a window
    # would shuffle the full embedding vectors just to count labels
    counts = e.groupBy("label").agg(
        F.ceil(F.count("*") / float(_KNN_BLOCK)).cast("bigint").alias("_nb")
    )
    eb = e.join(F.broadcast(counts), "label").withColumn(
        "bkt", F.col("vec_id") % F.col("_nb")
    )
    a = fanout(eb).select(
        F.col("vec_id").alias("src"),
        "label",
        F.col("bkt"),
        F.col("embedding").alias("a_emb"),
    )
    b = eb.select(
        F.col("vec_id").alias("dst"),
        F.col("label").alias("b_label"),
        F.col("bkt").alias("b_bkt"),
        F.col("embedding").alias("b_emb"),
    )
    pairs = a.join(
        b,
        (F.col("label") == F.col("b_label"))
        & (F.col("bkt") == F.col("b_bkt"))
        & (F.col("src") != F.col("dst")),
    ).select(
        "src",
        "dst",
        "label",
        F.round(cosine_sim("a_emb", "b_emb"), 6).alias("sim"),
    )
    w = Window.partitionBy("src").orderBy(F.col("sim").desc(), F.col("dst"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _KNN_K)
        .select(
            F.col("src").alias("vec_id"),
            F.col("dst").alias("neighbor_id"),
            "label",
            "sim",
            "rnk",
        )
    )


_MRL_DIM = 16  # truncated prefix dimensionality


def _fold_prefix(a: str, b: str, d: int) -> Column:
    """Σ a[i]*b[i] over the first d dims — same strict left-to-right
    DOUBLE fold as _fold, on sliced arrays."""
    return F.expr(
        f"aggregate(zip_with(slice({a}, 1, {d}), slice({b}, 1, {d}), "
        f"(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


@query(
    "embedding_matryoshka_truncation_qa",
    oracle=f"""
    WITH q AS (SELECT * FROM embeddings WHERE vec_id < {_N_QUERIES}),
    full_sims AS (
        SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
               ROUND({_DUCK_SIM}, 6) AS sim
        FROM q JOIN embeddings v ON q.vec_id <> v.vec_id
        CROSS JOIN UNNEST(RANGE(1, {_DIM + 1})) AS t(i)
        GROUP BY q.vec_id, v.vec_id
    ), full_top AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, vec_id) AS rnk
            FROM full_sims
        ) WHERE rnk <= {_TOPK}
    ), trunc_sims AS (
        SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
               ROUND({_DUCK_SIM}, 6) AS sim
        FROM q JOIN embeddings v ON q.vec_id <> v.vec_id
        CROSS JOIN UNNEST(RANGE(1, {_MRL_DIM + 1})) AS t(i)
        GROUP BY q.vec_id, v.vec_id
    ), trunc_top AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, vec_id) AS rnk
            FROM trunc_sims
        ) WHERE rnk <= {_TOPK}
    )
    SELECT f.query_id,
           CAST(COUNT(t.vec_id) AS BIGINT) AS n_overlap,
           ROUND(COUNT(t.vec_id) * 1.0 / {_TOPK}, 4) AS recall_at_{_TOPK}
    FROM full_top f
    LEFT JOIN trunc_top t
      ON t.query_id = f.query_id AND t.vec_id = f.vec_id
    GROUP BY f.query_id
    """,
)
def embedding_matryoshka_truncation_qa(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Matryoshka-style truncation audit: per query, the top-{_TOPK}
    neighbor overlap between full 64-dim cosine and the first-{_MRL_DIM}-
    dims-only cosine — the recall@k a store would KEEP if it served
    truncated prefixes (4× smaller vectors, MRL's storage play). This is
    the go/no-go QA gate before switching a serving index to truncated
    embeddings, next to embedding_quantize_int8's int8 audit.

    Both rankings run in one broadcast-query pass over the corpus scan
    (two JVM folds per pair, no second scan — the truncated fold slices
    the SAME array column); the overlap join is per-query top-k sized,
    i.e. tiny."""
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    v = fanout(e).select(
        F.col("vec_id").alias("vec_id"), F.col("embedding").alias("v_emb")
    )
    trunc_sim = _fold_prefix("q_emb", "v_emb", _MRL_DIM) / (
        F.sqrt(_fold_prefix("q_emb", "q_emb", _MRL_DIM))
        * F.sqrt(_fold_prefix("v_emb", "v_emb", _MRL_DIM))
    )
    sims = v.join(F.broadcast(q), F.col("query_id") != F.col("vec_id")).select(
        "query_id",
        "vec_id",
        F.round(cosine_sim("q_emb", "v_emb"), 6).alias("full_sim"),
        F.round(trunc_sim, 6).alias("trunc_sim"),
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.col("full_sim").desc(), F.col("vec_id")
    )
    wt = Window.partitionBy("query_id").orderBy(
        F.col("trunc_sim").desc(), F.col("vec_id")
    )
    ranked = sims.select(
        "query_id",
        "vec_id",
        F.row_number().over(wf).alias("full_rnk"),
        F.row_number().over(wt).alias("trunc_rnk"),
    )
    full_top = ranked.filter(F.col("full_rnk") <= _TOPK).select(
        "query_id", "vec_id"
    )
    trunc_top = ranked.filter(F.col("trunc_rnk") <= _TOPK).select(
        F.col("query_id").alias("t_qid"), F.col("vec_id").alias("t_vid")
    )
    joined = full_top.join(
        trunc_top,
        (F.col("query_id") == F.col("t_qid"))
        & (F.col("vec_id") == F.col("t_vid")),
        "left",
    )
    return joined.groupBy("query_id").agg(
        F.count("t_vid").alias("n_overlap"),
        F.round(F.count("t_vid") * 1.0 / _TOPK, 4).alias(f"recall_at_{_TOPK}"),
    )


_PAIRED_K = 10
_PAIRED_N_QUERIES = 50


@query(
    "similarity_paired_retrieval_eval",
    oracle=f"""
    WITH q AS (
        SELECT vec_id, embedding FROM embeddings
        WHERE vec_id % 7 = 0 AND vec_id < {7 * _PAIRED_N_QUERIES}
    ), sims AS (
        SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
               ROUND({_DUCK_SIM}, 6) AS sim
        FROM q JOIN embeddings v ON q.vec_id <> v.vec_id
        CROSS JOIN UNNEST(RANGE(1, {_DIM + 1})) AS t(i)
        GROUP BY q.vec_id, v.vec_id
    ), ranked AS (
        SELECT query_id, vec_id, sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, vec_id) AS rnk
        FROM sims
    ), target AS (
        -- the "paired" item: the query's nearest same-label neighbor,
        -- i.e. the ground-truth positive a retrieval benchmark stores
        SELECT r.query_id, MIN(r.vec_id) AS target_id
        FROM ranked r
        JOIN embeddings a ON a.vec_id = r.query_id
        JOIN embeddings b ON b.vec_id = r.vec_id AND b.label = a.label
        WHERE r.rnk = (
            SELECT MIN(r2.rnk) FROM ranked r2
            JOIN embeddings b2 ON b2.vec_id = r2.vec_id
            JOIN embeddings a2 ON a2.vec_id = r2.query_id
            WHERE r2.query_id = r.query_id AND b2.label = a2.label
        )
        GROUP BY r.query_id
    )
    SELECT t.query_id, t.target_id,
           MIN(r.rnk) AS target_rank,
           (MIN(r.rnk) = 1)            AS hit_at_1,
           (MIN(r.rnk) <= {_PAIRED_K}) AS hit_at_{_PAIRED_K}
    FROM target t JOIN ranked r
      ON r.query_id = t.query_id AND r.vec_id = t.target_id
    GROUP BY t.query_id, t.target_id
    """,
)
def similarity_paired_retrieval_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Retrieval-benchmark evaluation (the recall@k table a CLIP-style
    paired dataset reports): for each query vector, the ground-truth
    positive is its nearest same-label neighbor, and the metric is that
    target's rank in the UNRESTRICTED top-k — hit@1 / hit@{_PAIRED_K}
    booleans cross the oracle hash per query. This is the eval harness
    that gates every ANN/quantization/truncation change shipped by the
    similarity family.

    Plan: one broadcast-query pass computes the full ranking (same
    JVM-fold shape as similarity_cosine_topk); target selection and the
    metric join run over per-query ranked rows, never the corpus."""
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(
        (F.col("vec_id") % 7 == 0)
        & (F.col("vec_id") < 7 * _PAIRED_N_QUERIES)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("q_label"),
    )
    v = fanout(e).select(
        F.col("vec_id").alias("vec_id"),
        F.col("embedding").alias("v_emb"),
        F.col("label").alias("v_label"),
    )
    ranked = (
        v.join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            "q_label",
            "v_label",
            F.round(cosine_sim("q_emb", "v_emb"), 6).alias("sim"),
        )
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("sim").desc(), F.col("vec_id")
                )
            ),
        )
    )
    ranked = transient_persist(ranked)
    same = ranked.filter(F.col("q_label") == F.col("v_label"))
    best = same.groupBy("query_id").agg(F.min("rnk").alias("best_rnk"))
    target = (
        same.join(best, "query_id")
        .filter(F.col("rnk") == F.col("best_rnk"))
        .groupBy("query_id")
        .agg(F.min("vec_id").alias("target_id"))
    )
    tgt = target.select(
        F.col("query_id").alias("t_qid"), "target_id"
    )
    metric = ranked.join(
        tgt,
        (F.col("query_id") == F.col("t_qid"))
        & (F.col("vec_id") == F.col("target_id")),
    ).select(F.col("t_qid").alias("query_id"), "target_id", "rnk")
    return metric.groupBy("query_id", "target_id").agg(
        F.min("rnk").alias("target_rank"),
        (F.min("rnk") == 1).alias("hit_at_1"),
        (F.min("rnk") <= _PAIRED_K).alias(f"hit_at_{_PAIRED_K}"),
    )


_HN_K = 5


@query(
    "similarity_hard_negative_mining",
    oracle=f"""
    WITH q AS (
        SELECT vec_id, embedding, label FROM embeddings
        WHERE vec_id % 7 = 0 AND vec_id < {7 * _PAIRED_N_QUERIES}
    ), sims AS (
        SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
               v.label AS neg_label,
               ROUND({_DUCK_SIM}, 6) AS sim
        FROM q JOIN embeddings v
          ON q.vec_id <> v.vec_id AND v.label <> q.label
        CROSS JOIN UNNEST(RANGE(1, {_DIM + 1})) AS t(i)
        GROUP BY q.vec_id, v.vec_id, v.label
    ), ranked AS (
        SELECT query_id, vec_id, neg_label, sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, vec_id) AS rnk
        FROM sims
    )
    SELECT query_id, vec_id AS negative_id, neg_label, sim, rnk
    FROM ranked WHERE rnk <= {_HN_K}
    """,
)
def similarity_hard_negative_mining(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query vector,
    the top-{_HN_K} most-similar vectors with a DIFFERENT label — the
    negatives that actually move an embedding model, versus the trivial
    random ones. The other half of the retrieval-training data pipeline
    next to similarity_paired_retrieval_eval's positives.

    Plan: identical broadcast-query corpus pass as cosine top-k with the
    label-mismatch predicate fused into the join condition (negatives
    filtered BEFORE the fold output ranks), then the per-query top-k
    window with WindowGroupLimit."""
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(
        (F.col("vec_id") % 7 == 0)
        & (F.col("vec_id") < 7 * _PAIRED_N_QUERIES)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("q_label"),
    )
    v = fanout(e).select(
        F.col("vec_id").alias("vec_id"),
        F.col("embedding").alias("v_emb"),
        F.col("label").alias("neg_label"),
    )
    sims = v.join(
        F.broadcast(q),
        (F.col("query_id") != F.col("vec_id"))
        & (F.col("neg_label") != F.col("q_label")),
    ).select(
        "query_id",
        "vec_id",
        "neg_label",
        F.round(cosine_sim("q_emb", "v_emb"), 6).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("vec_id")
    )
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _HN_K)
        .select(
            "query_id",
            F.col("vec_id").alias("negative_id"),
            "neg_label",
            "sim",
            "rnk",
        )
    )


# ---------------------------------------------------------------------------
# similarity_centroid_drift — embedding-distribution drift monitor
# ---------------------------------------------------------------------------

# cohort split: first half vs second half of the corpus by vec_id parity
# (stand-in for "last week's embeddings vs this week's")
_DRIFT_A = "vec_id % 2 = 0"
_DRIFT_B = "vec_id % 2 = 1"
_DRIFT_COS_FLOOR = 0.98


@query(
    "similarity_centroid_drift",
    oracle=f"""
    WITH cells AS (
        SELECT label,
               CAST(i - 1 AS BIGINT) AS dim,
               AVG(CASE WHEN {_DRIFT_A}
                        THEN CAST(embedding[i] AS DOUBLE) END) AS ca,
               AVG(CASE WHEN {_DRIFT_B}
                        THEN CAST(embedding[i] AS DOUBLE) END) AS cb
        FROM embeddings
        CROSS JOIN UNNEST(RANGE(1, {_DIM + 1})) AS t(i)
        GROUP BY label, dim
    )
    SELECT label,
           ROUND(SUM(ca * cb)
                 / (SQRT(SUM(ca * ca)) * SQRT(SUM(cb * cb))), 6)
               AS centroid_cosine,
           (SUM(ca * cb) / (SQRT(SUM(ca * ca)) * SQRT(SUM(cb * cb)))
               >= {_DRIFT_COS_FLOOR}) AS within_tolerance
    FROM cells
    GROUP BY label
    """,
)
def similarity_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift monitor: per label, the cosine
    between the cohort-A and cohort-B centroids (here the two vec_id
    parities standing in for consecutive ingest windows). A drifting
    encoder or a shifted upstream corpus pulls the cosine off 1.0; the
    ≥{_DRIFT_COS_FLOOR} flag is the alarm an embedding pipeline pages
    on before its ANN index quietly degrades.

    Plan: BOTH cohort centroids come out of ONE posexplode pass
    (conditional means per (label, dim) — map-side partials shrink the
    shuffle to labels × dims regardless of corpus size), then the cosine
    folds over the tiny cell table."""
    e = fanout(table(spark, sf_dir, "embeddings"))
    exploded = e.select(
        "label", "vec_id", F.posexplode("embedding").alias("dim", "v")
    )
    cells = exploded.groupBy("label", "dim").agg(
        F.avg(
            F.when(F.expr(_DRIFT_A), F.col("v").cast("double"))
        ).alias("ca"),
        F.avg(
            F.when(F.expr(_DRIFT_B), F.col("v").cast("double"))
        ).alias("cb"),
    )
    cos = F.sum(F.col("ca") * F.col("cb")) / (
        F.sqrt(F.sum(F.col("ca") * F.col("ca")))
        * F.sqrt(F.sum(F.col("cb") * F.col("cb")))
    )
    return cells.groupBy("label").agg(
        F.round(cos, 6).alias("centroid_cosine"),
        (cos >= _DRIFT_COS_FLOOR).alias("within_tolerance"),
    )


# ---------------------------------------------------------------------------
# embedding_dimension_variance_report — per-dimension embedding health audit
# ---------------------------------------------------------------------------


@query(
    "embedding_dimension_variance_report",
    oracle=f"""
    WITH vals AS (
        SELECT i.i AS dim, CAST(embedding[i.i] AS DOUBLE) AS v
        FROM embeddings CROSS JOIN UNNEST(RANGE(1, {_DIM + 1})) AS i(i)
    )
    SELECT dim,
           ROUND(AVG(v), 6)         AS mean_v,
           ROUND(STDDEV_SAMP(v), 6) AS std_v,
           ROUND(MIN(v), 6)         AS min_v,
           ROUND(MAX(v), 6)         AS max_v,
           ROUND(STDDEV_SAMP(v), 6) < 0.01 AS near_dead
    FROM vals GROUP BY dim
    """,
)
def embedding_dimension_variance_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding statistics (mean/std/min/max + a
    collapsed-dimension flag): the embedding-space health audit run
    before trusting any downstream similarity index — dimensions with
    near-zero variance carry no information (a symptom of embedding
    collapse or a truncated model) and systematically biased means break
    cosine assumptions.

    Scale shape: posexplode to (dim, value) pairs — 64 rows per vector,
    all consumed by one partial+final hash-agg into exactly 64 output
    rows; no shuffle ever carries more than |dims| x partials. The dead
    flag compares the ROUNDED std in both engines, so the gate has no
    float-boundary ambiguity."""
    emb = table(spark, sf_dir, "embeddings")
    vals = emb.select(
        F.posexplode("embedding").alias("pos", "val")
    ).select(
        (F.col("pos") + 1).cast("bigint").alias("dim"),
        F.col("val").cast("double").alias("v"),
    )
    std6 = F.round(F.stddev_samp("v"), 6)
    return vals.groupBy("dim").agg(
        F.round(F.avg("v"), 6).alias("mean_v"),
        std6.alias("std_v"),
        F.round(F.min("v"), 6).alias("min_v"),
        F.round(F.max("v"), 6).alias("max_v"),
        (std6 < 0.01).alias("near_dead"),
    )


_DIV_TOPK = 10     # diversified result size
_DIV_QUOTA = 2     # at most this many hits per label in the final top-k


@query(
    "similarity_diversified_topk",
    oracle=f"""
    WITH q AS (SELECT * FROM embeddings WHERE vec_id < {_N_QUERIES}),
    sims AS (
        SELECT q.vec_id AS query_id, v.vec_id AS vec_id, v.label AS label,
               ROUND({_DUCK_SIM}, 6) AS sim
        FROM q
        JOIN embeddings v ON q.vec_id <> v.vec_id
        CROSS JOIN UNNEST(RANGE(1, {_DIM + 1})) AS t(i)
        GROUP BY q.vec_id, v.vec_id, v.label
    ), quota AS (
        SELECT query_id, vec_id, label, sim,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id, label ORDER BY sim DESC, vec_id
               ) AS label_rnk
        FROM sims
    ), ranked AS (
        SELECT query_id, vec_id, label, sim,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rnk
        FROM quota WHERE label_rnk <= {_DIV_QUOTA}
    )
    SELECT query_id, vec_id, label, sim, rnk FROM ranked WHERE rnk <= {_DIV_TOPK}
    """,
)
def similarity_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-quota re-rank: brute-force cosine top-{_DIV_TOPK} with at
    most {_DIV_QUOTA} results per label — the RAG/retrieval staple that
    stops one dense cluster of near-duplicates from monopolizing the
    result list (the window-function twin of MMR, without MMR's
    sequential greedy step).

    Scale shape: identical to the brute-force baseline — broadcast query
    set against a partitioned corpus scan, no corpus shuffle — plus two
    window passes over the per-query candidate lists (corpus-partitioned
    by query_id, each partition |corpus|-bounded; at 100 TB the first
    window runs on the ANN shortlist instead of the full sims frame).
    Ranking uses the 6-dp-rounded sim with vec_id tie-break, so both the
    quota cut and the final cut are deterministic on both engines."""
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    v = fanout(e).select(
        F.col("vec_id").alias("vec_id"),
        F.col("label"),
        F.col("embedding").alias("v_emb"),
    )
    sims = v.join(F.broadcast(q), F.col("query_id") != F.col("vec_id")).select(
        "query_id",
        "vec_id",
        "label",
        F.round(cosine_sim("q_emb", "v_emb"), 6).alias("sim"),
    )
    w_label = Window.partitionBy("query_id", "label").orderBy(
        F.col("sim").desc(), F.col("vec_id")
    )
    w_all = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        sims.withColumn("label_rnk", F.row_number().over(w_label))
        .filter(F.col("label_rnk") <= _DIV_QUOTA)
        .withColumn("rnk", F.row_number().over(w_all))
        .filter(F.col("rnk") <= _DIV_TOPK)
        .select("query_id", "vec_id", "label", "sim", "rnk")
    )


_MP_RADII = (0, 1, 2)   # probe Hamming radii swept
_MP_K = 10              # recall@k


def _code_spark() -> Column:
    """Integer bucket code: sign bit of dims 0..7 packed little-endian."""
    code = F.lit(0)
    for i in range(_IVF_BITS):
        code = code + F.when(F.expr(f"embedding[{i}]") >= 0, F.lit(1 << i)).otherwise(0)
    return code.cast("long")


_CODE_DUCK = " + ".join(
    f"(CASE WHEN embedding[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
    for i in range(_IVF_BITS)
)


@query(
    "similarity_multiprobe_recall_sweep",
    oracle=f"""
    WITH coded AS (
        SELECT vec_id, label, embedding,
               CAST({_CODE_DUCK} AS BIGINT) AS code
        FROM embeddings
    ), q AS (SELECT * FROM coded WHERE vec_id < {_N_QUERIES}),
    sims AS (
        SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
               ROUND({_DUCK_SIM}, 6) AS sim,
               bit_count(xor(q.code, v.code)) AS hamming
        FROM q
        JOIN coded v ON q.vec_id <> v.vec_id
        CROSS JOIN UNNEST(RANGE(1, {_DIM + 1})) AS t(i)
        GROUP BY q.vec_id, v.vec_id, q.code, v.code
    ), exact AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rnk
            FROM sims
        ) WHERE rnk <= {_MP_K}
    ), radii AS (SELECT * FROM (VALUES (0), (1), (2)) AS r(probe_h)),
    cand AS (
        SELECT r.probe_h, s.query_id, s.vec_id, s.sim
        FROM sims s JOIN radii r ON s.hamming <= r.probe_h
    ), cand_top AS (
        SELECT probe_h, query_id, vec_id FROM (
            SELECT probe_h, query_id, vec_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY probe_h, query_id ORDER BY sim DESC, vec_id
                   ) AS rnk
            FROM cand
        ) WHERE rnk <= {_MP_K}
    ), hits AS (
        SELECT c.probe_h, CAST(COUNT(*) AS BIGINT) AS n_hits
        FROM cand_top c JOIN exact e
          ON e.query_id = c.query_id AND e.vec_id = c.vec_id
        GROUP BY c.probe_h
    ), volume AS (
        SELECT probe_h, CAST(COUNT(*) AS BIGINT) AS n_candidate_pairs
        FROM cand GROUP BY probe_h
    )
    SELECT v.probe_h, v.n_candidate_pairs,
           COALESCE(h.n_hits, 0) AS n_hits,
           (10000 * COALESCE(h.n_hits, 0)) // ({_MP_K} * {_N_QUERIES}) AS recall4
    FROM volume v LEFT JOIN hits h ON h.probe_h = v.probe_h
    ORDER BY v.probe_h
    """,
)
def similarity_multiprobe_recall_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH tuning table: recall@{_MP_K} and candidate volume of
    the sign-bit bucket index when each query probes every bucket within
    Hamming radius h ∈ {_MP_RADII} of its own code — the ANN twin of the
    MinHash band-tuning S-curve (dedup_minhash_band_tuning). The output
    is the measured recall/cost trade-off that picks the probe radius
    from data instead of folklore (Lv et al., multi-probe LSH).

    Scale shape: this is an OFFLINE eval on a query sample — ground truth
    needs the brute-force ranking anyway (same cost shape as
    embedding_matryoshka_truncation_qa); both rankings come from ONE
    broadcast-join sims frame, radii fan out 3× by a broadcast join
    against a 3-row literal frame, and everything downstream is windows
    over per-(radius, query) groups. In production the per-radius
    candidate volume column is the scan-cost estimate: at radius h the
    index scans Σ_(j<=h) C(8,j)/2^8 of the corpus.

    Determinism: bucket codes and Hamming distances are integers; recall
    is (10000·hits) FLOOR-div ({_MP_K}·|Q|) — no float crosses the gate."""
    e = fanout(table(spark, sf_dir, "embeddings"))
    coded = e.select("vec_id", "embedding", _code_spark().alias("code"))
    q = coded.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("code").alias("q_code"),
    )
    sims = (
        coded.join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_sim("q_emb", "embedding"), 6).alias("sim"),
            F.expr("bit_count(q_code ^ code)").alias("hamming"),
        )
    )
    # sims feeds THREE consumers (the exact ranking, the radius fan-out's
    # window, and the volume aggregate) — without a persist the
    # brute-force cosine fold over corpus × |Q| runs three times (r12;
    # the fold is the query's dominant cost)
    sims = transient_persist(sims)
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    exact = (
        sims.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _MP_K)
        .select("query_id", F.col("vec_id").alias("e_vec_id"))
    )
    radii = spark.range(1).select(
        F.explode(F.array(*[F.lit(h) for h in _MP_RADII])).alias("probe_h")
    )
    cand = sims.join(F.broadcast(radii), F.col("hamming") <= F.col("probe_h"))
    w_h = Window.partitionBy("probe_h", "query_id").orderBy(
        F.col("sim").desc(), F.col("vec_id")
    )
    cand_top = (
        cand.withColumn("rnk", F.row_number().over(w_h))
        .filter(F.col("rnk") <= _MP_K)
        .select("probe_h", "query_id", "vec_id")
    )
    hits = (
        cand_top.join(
            exact,
            (cand_top["query_id"] == exact["query_id"])
            & (cand_top["vec_id"] == exact["e_vec_id"]),
        )
        .groupBy("probe_h")
        .agg(F.count("*").alias("n_hits"))
    )
    volume = cand.groupBy("probe_h").agg(F.count("*").alias("n_candidate_pairs"))
    return (
        volume.join(F.broadcast(hits), "probe_h", "left")
        .select(
            "probe_h",
            "n_candidate_pairs",
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            F.expr(
                f"(10000 * coalesce(n_hits, 0L)) DIV ({_MP_K} * {_N_QUERIES})"
            ).alias("recall4"),
        )
        .orderBy("probe_h")
    )


_CB_HOT_FACTOR = 2   # a cell is hot when it holds > factor× the mean load


@query(
    "similarity_ivf_cell_balance_report",
    oracle=f"""
    WITH coded AS (
        SELECT vec_id, CAST({_CODE_DUCK} AS BIGINT) AS cell FROM embeddings
    ), per_cell AS (
        SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vectors
        FROM coded GROUP BY cell
    ), tot AS (
        SELECT CAST(SUM(n_vectors) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS n_cells
        FROM per_cell
    )
    SELECT p.cell, p.n_vectors,
           (10000 * p.n_vectors) // t.total AS share4,
           (t.n_cells * p.n_vectors > {_CB_HOT_FACTOR} * t.total) AS hot
    FROM per_cell p CROSS JOIN tot t
    ORDER BY p.n_vectors DESC, p.cell
    """,
)
def similarity_ivf_cell_balance_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-occupancy audit of the sign-bit IVF index — the similarity-side
    twin of maintenance_partition_skew_report: per-cell vector counts,
    corpus share, and a hot flag when a cell holds more than
    {_CB_HOT_FACTOR}× the mean occupied-cell load. Hot cells are where
    ANN latency hides (a probe into a hot cell scans that cell's whole
    posting list), and the report is the evidence that justifies
    re-training the coarse quantizer or splitting cells.

    Scale shape: ONE hash aggregate on the cell code (map-side partials
    shrink the shuffle to |cells| rows), then a broadcast of the 1-row
    total. Output is at most 2^{_IVF_BITS} rows regardless of corpus
    size. Hot flag and share are exact integer arithmetic (the flag
    compares n_cells·n > {_CB_HOT_FACTOR}·total, never a float mean)."""
    e = table(spark, sf_dir, "embeddings")
    per_cell = (
        e.select(_code_spark().alias("cell"))
        .groupBy("cell")
        .agg(F.count("*").alias("n_vectors"))
    )
    tot = per_cell.agg(
        F.sum("n_vectors").alias("total"), F.count("*").alias("n_cells")
    )
    return (
        per_cell.crossJoin(F.broadcast(tot))
        .select(
            "cell",
            "n_vectors",
            F.expr("(10000 * n_vectors) DIV total").alias("share4"),
            (
                F.col("n_cells") * F.col("n_vectors")
                > _CB_HOT_FACTOR * F.col("total")
            ).alias("hot"),
        )
        .orderBy(F.col("n_vectors").desc(), "cell")
    )


# ---------------------------------------------------------------------------
# similarity_knn_label_eval — label-blind kNN classifier with holdout-free
# leave-one-out eval
# ---------------------------------------------------------------------------

_KNN_EVAL_K = 3


@query(
    "similarity_knn_label_eval",
    oracle=f"""
    WITH coded AS (
        SELECT vec_id, label, embedding, {_BUCKET_DUCK} AS bucket
        FROM embeddings
    ), pairs AS (
        SELECT a.vec_id AS src, a.label AS true_label,
               b.vec_id AS dst, b.label AS nbr_label,
               ROUND({_DUCK_SIM.replace("q.", "a.").replace("v.", "b.")}, 6) AS sim
        FROM coded a
        JOIN coded b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
        CROSS JOIN UNNEST(RANGE(1, {_DIM + 1})) AS t(i)
        GROUP BY a.vec_id, a.label, b.vec_id, b.label
    ), topk AS (
        SELECT src, true_label, nbr_label FROM (
            SELECT src, true_label, nbr_label,
                   ROW_NUMBER() OVER (PARTITION BY src
                                      ORDER BY sim DESC, dst) AS rnk
            FROM pairs
        ) WHERE rnk <= {_KNN_EVAL_K}
    ), votes AS (
        SELECT src, true_label, nbr_label AS predicted FROM (
            SELECT src, true_label, nbr_label,
                   ROW_NUMBER() OVER (PARTITION BY src
                                      ORDER BY COUNT(*) DESC, nbr_label) AS vr
            FROM topk GROUP BY src, true_label, nbr_label
        ) WHERE vr = 1
    )
    SELECT true_label,
           CAST(COUNT(*) AS BIGINT) AS n_eval,
           CAST(SUM(CASE WHEN predicted = true_label THEN 1 ELSE 0 END) AS BIGINT)
               AS n_correct,
           FLOOR(SUM(CASE WHEN predicted = true_label THEN 1 ELSE 0 END) * 10000.0
                 / COUNT(*) + 0.5) / 10000.0 AS accuracy4
    FROM votes
    GROUP BY true_label
    """,
)
def similarity_knn_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN classifier quality report: every vector is classified by the
    majority label of its {_KNN_EVAL_K} nearest neighbors (leave-one-out:
    self excluded), with candidates drawn ONLY from the vector's
    LABEL-BLIND IVF sign-bucket — blocking must come from content, never
    from the label, or the eval silently answers itself (the embedding
    analog of dedup_split_leakage_audit's lesson). Emits per-class
    support and accuracy — the 'are these embeddings any good for this
    taxonomy' health check run before spending GPU-time training on them.

    Vote determinism: neighbors ranked by 6-dp cosine then vec_id; the
    vote by (count desc, label asc) — total orders on both engines.
    Singleton buckets contribute no eval rows (no neighbors to vote).

    Scale shape: identical to similarity_ann_ivf's bucket equi-join (the
    pair space is Σ bucket², bounded by the quantizer; at 100 TB the
    buckets come from a learned IVF with the same size cap) plus two
    window cuts that WindowGroupLimit keeps per-bucket. No all-pairs
    stage anywhere."""
    e = table(spark, sf_dir, "embeddings")
    coded = e.withColumn("bucket", _bucket_spark())
    a = fanout(coded).select(
        F.col("vec_id").alias("src"),
        F.col("label").alias("true_label"),
        F.col("bucket"),
        F.col("embedding").alias("a_emb"),
    )
    b = coded.select(
        F.col("vec_id").alias("dst"),
        F.col("label").alias("nbr_label"),
        F.col("bucket").alias("b_bucket"),
        F.col("embedding").alias("b_emb"),
    )
    pairs = a.join(
        b,
        (F.col("bucket") == F.col("b_bucket")) & (F.col("src") != F.col("dst")),
    ).select(
        "src",
        "true_label",
        "dst",
        "nbr_label",
        F.round(cosine_sim("a_emb", "b_emb"), 6).alias("sim"),
    )
    wk = Window.partitionBy("src").orderBy(F.col("sim").desc(), "dst")
    topk = pairs.withColumn("rnk", F.row_number().over(wk)).filter(
        F.col("rnk") <= _KNN_EVAL_K
    )
    wv = Window.partitionBy("src").orderBy(F.col("cnt").desc(), "nbr_label")
    votes = (
        topk.groupBy("src", "true_label", "nbr_label")
        .agg(F.count("*").alias("cnt"))
        .withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select("src", "true_label", F.col("nbr_label").alias("predicted"))
    )
    correct = (F.col("predicted") == F.col("true_label")).cast("int")
    return votes.groupBy("true_label").agg(
        F.count("*").cast("long").alias("n_eval"),
        F.sum(correct).cast("long").alias("n_correct"),
        (F.floor(F.sum(correct) * 10000.0 / F.count("*") + 0.5) / 10000.0).alias(
            "accuracy4"
        ),
    )


# ---------------------------------------------------------------------------
# similarity_binary_quantization — sign-bit codes + Hamming shortlist + rerank
# ---------------------------------------------------------------------------

_BQ_SHORTLIST = 50  # Hamming candidates per query before the exact rerank


def _bq_code_spark(lo_bit: int, hi_bit: int) -> Column:
    """Pack sign bits [lo_bit, hi_bit) of the embedding into one BIGINT."""
    return sum(
        (
            F.when(F.expr(f"embedding[{i}]") > 0, F.lit(1 << (i - lo_bit)))
            .otherwise(F.lit(0))
            for i in range(lo_bit, hi_bit)
        ),
        F.lit(0).cast("long"),
    )


def _bq_code_duck(lo_bit: int, hi_bit: int) -> str:
    terms = " + ".join(
        f"(CASE WHEN embedding[{i + 1}] > 0 THEN {1 << (i - lo_bit)} ELSE 0 END)"
        for i in range(lo_bit, hi_bit)
    )
    return f"CAST({terms} AS BIGINT)"


@query(
    "similarity_binary_quantization",
    oracle=f"""
    WITH coded AS (
        SELECT vec_id, embedding,
               {_bq_code_duck(0, 32)} AS lo,
               {_bq_code_duck(32, 64)} AS hi
        FROM embeddings
    ), q AS (SELECT * FROM coded WHERE vec_id < {_N_QUERIES}),
    ham AS (
        SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
               bit_count(xor(q.lo, v.lo)) + bit_count(xor(q.hi, v.hi)) AS hamming
        FROM q JOIN coded v ON q.vec_id <> v.vec_id
    ), short AS (
        SELECT query_id, vec_id, hamming,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY hamming, vec_id) AS hrnk
        FROM ham
    ), cand AS (
        SELECT query_id, vec_id, hamming FROM short WHERE hrnk <= {_BQ_SHORTLIST}
    ), sims AS (
        SELECT c.query_id, c.vec_id, c.hamming,
               ROUND({_DUCK_SIM}, 6) AS sim
        FROM cand c
        JOIN embeddings q ON q.vec_id = c.query_id
        JOIN embeddings v ON v.vec_id = c.vec_id
        CROSS JOIN UNNEST(RANGE(1, {_DIM + 1})) AS t(i)
        GROUP BY c.query_id, c.vec_id, c.hamming
    ), ranked AS (
        SELECT query_id, vec_id, CAST(hamming AS BIGINT) AS hamming, sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, vec_id) AS rnk
        FROM sims
    )
    SELECT query_id, vec_id, hamming, sim, rnk FROM ranked WHERE rnk <= {_TOPK}
    """,
)
def similarity_binary_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary (sign-bit) quantization ANN: each 64-dim float vector is
    packed into TWO BIGINT words of sign bits (32× smaller than the
    floats); candidate generation is a Hamming-distance scan over the
    packed words — two XOR + two POPCOUNT per comparison instead of 64
    multiply-adds — and only the top-{_BQ_SHORTLIST} Hamming candidates
    per query pay the exact cosine rerank. This is the modern
    binary-quantization retrieval shape (sign-bit codes are the 1-bit
    extreme of the PQ family): the compressed-domain scan is memory-
    bandwidth-bound at 1/32nd the bytes, which is the whole win at
    100 TB of vectors.

    Plan: the corpus is coded in one row-local projection (whole-stage
    codegen — the 64 CASE terms fold into two long sums); queries
    broadcast against the coded scan; Hamming is two `bit_count(a ^ b)`
    JVM intrinsics; the per-query top-k shortlist window shuffles ONLY
    (query_id, vec_id, hamming) — embeddings are re-joined afterwards by
    broadcasting the queries×shortlist candidate set against the corpus
    scan, so the exact rerank touches {_BQ_SHORTLIST} rows/query and the
    corpus never shuffles anywhere (round-9: previously the window input
    carried both 64-float arrays, ~16× the shuffle bytes).

    Determinism: Hamming is exact integer; the rerank orders by
    6dp-rounded cosine with vec_id tie-break (house convention); the
    shortlist cut orders by (hamming, vec_id) — bit-identical across
    engines.

    Reference parity: none (SURVEY §2.D north-star ANN extension, the
    1-bit sibling of similarity_ann_pq)."""
    e = table(spark, sf_dir, "embeddings")
    coded = e.select(
        "vec_id",
        "embedding",
        _bq_code_spark(0, 32).alias("lo"),
        _bq_code_spark(32, 64).alias("hi"),
    )
    q = coded.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("lo").alias("q_lo"),
        F.col("hi").alias("q_hi"),
    )
    v = fanout(coded).select(
        "vec_id",
        F.col("lo").alias("v_lo"),
        F.col("hi").alias("v_hi"),
    )
    # shortlist shuffle carries ONLY (query_id, vec_id, hamming) — 3
    # scalar columns (round-9 VERDICT ask #4: the old frame dragged both
    # 64-float embeddings through the row_number() window, ~16× wider
    # shuffle rows for data the rerank can re-join later)
    ham = (
        v.join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            (
                F.expr("bit_count(q_lo ^ v_lo)") + F.expr("bit_count(q_hi ^ v_hi)")
            ).cast("long").alias("hamming"),
        )
    )
    wh = Window.partitionBy("query_id").orderBy("hamming", "vec_id")
    cand = ham.withColumn("hrnk", F.row_number().over(wh)).filter(
        F.col("hrnk") <= _BQ_SHORTLIST
    )
    # exact rerank: re-attach embeddings to the {_N_QUERIES}×{_BQ_SHORTLIST}-row
    # shortlist — queries via a broadcast dim, corpus vectors by
    # BROADCASTING THE SHORTLIST against the corpus scan (candidate set is
    # bounded by queries×shortlist, never corpus-sized), so the corpus
    # still never shuffles
    q_emb = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    cand_q = cand.join(F.broadcast(q_emb), "query_id")
    sims = e.select("vec_id", F.col("embedding").alias("v_emb")).join(
        F.broadcast(cand_q), "vec_id"
    ).select(
        "query_id",
        "vec_id",
        "hamming",
        F.round(cosine_sim("q_emb", "v_emb"), 6).alias("sim"),
    )
    wr = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "vec_id")
    return (
        sims.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= _TOPK)
        .select("query_id", "vec_id", "hamming", "sim", "rnk")
    )


# ---------------------------------------------------------------------------
# similarity_mips_norm_augment — max-inner-product via the norm-augment trick
# ---------------------------------------------------------------------------

# DuckDB raw inner product over unnested index range (aliases q, v)
_DUCK_IP = "SUM(CAST(q.embedding[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE))"


@query(
    "similarity_mips_norm_augment",
    oracle=f"""
    WITH norms AS (
        SELECT vec_id,
               SUM(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)) AS sq
        FROM embeddings CROSS JOIN UNNEST(RANGE(1, {_DIM + 1})) AS t(i)
        GROUP BY vec_id
    ), m AS (SELECT MAX(sq) AS max_sq FROM norms),
    q AS (SELECT * FROM embeddings WHERE vec_id < {_N_QUERIES}),
    scored AS (
        SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
               ROUND({_DUCK_IP}, 6) AS ip
        FROM q
        JOIN embeddings v ON q.vec_id <> v.vec_id
        CROSS JOIN UNNEST(RANGE(1, {_DIM + 1})) AS t(i)
        GROUP BY q.vec_id, v.vec_id
    ), augmented AS (
        -- the REAL augmented-space cosine, constructed: corpus vector x
        -- gains the extra coordinate e = sqrt(M²−‖x‖²) (query gains 0),
        -- so <q_aug,x_aug> = <q,x> and ‖x_aug‖ = sqrt(‖x‖² + e·e) —
        -- recomputed from the augmented parts, never assumed to be M, so
        -- a broken augmentation would genuinely change the ranking
        SELECT s.query_id, s.vec_id, s.ip,
               ROUND(s.ip / (SQRT(nq.sq)
                   * SQRT(nv.sq
                          + SQRT((SELECT max_sq FROM m) - nv.sq)
                          * SQRT((SELECT max_sq FROM m) - nv.sq))), 6) AS aug
        FROM scored s
        JOIN norms nq ON nq.vec_id = s.query_id
        JOIN norms nv ON nv.vec_id = s.vec_id
    ), ranked AS (
        SELECT query_id, vec_id, ip,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY ip DESC, vec_id) AS rnk_ip,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY aug DESC, vec_id) AS rnk_aug
        FROM augmented
    )
    SELECT query_id, vec_id, ip, rnk_ip,
           rnk_ip = rnk_aug AS aug_rank_agrees
    FROM ranked WHERE rnk_ip <= {_TOPK}
    """,
)
def similarity_mips_norm_augment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-inner-product search (MIPS) and the norm-augmentation
    reduction (Bachrach et al. / Shrivastava-Li): MIPS cannot be served
    by a cosine/L2 ANN index directly (inner product is not a metric),
    but appending one coordinate sqrt(M²−‖x‖²) to every corpus vector —
    M = max corpus norm — makes all vectors norm-M, and cosine ranking in
    the augmented space equals inner-product ranking in the original.
    That reduction is what lets the recommendation-scoring workload
    (user·item dot products) reuse the whole cosine-ANN stack above
    (IVF/LSH/PQ/binary) unchanged.

    The gate returns the top-{_TOPK} by raw inner product per query AND a
    per-row boolean that the augmented-space cosine ranking agrees — the
    reduction's correctness claim, checked inside each engine and
    hash-compared across them. The augmented cosine is CONSTRUCTED, not
    assumed (round-9 ADVICE): each corpus vector's extra coordinate
    e = sqrt(M²−‖x‖²) is materialized and the denominator recomputes
    ‖x_aug‖ = sqrt(‖x‖² + e·e) from it, so a broken augmentation (wrong
    M, wrong coordinate, non-norm-M result) genuinely flips the boolean
    instead of cancelling out.

    Plan: one corpus pass for the max-norm scalar (broadcast), one
    broadcast-queries × corpus scan for scores + norms (the three folds
    share the same row, whole-stage codegen), two rank windows over the
    same tiny per-query partitions. No corpus shuffle; at serve time the
    augmentation is one extra coordinate per vector, precomputable.

    Determinism: both rankings order by 6dp-rounded scores with vec_id
    tie-break; ip and aug agree in exact arithmetic (aug = ip scaled by
    per-query/near-constant positive factors), so the boolean pins that
    the constructed reduction preserves ranking up to rounding ties."""
    e = table(spark, sf_dir, "embeddings")
    norms = e.select(_fold("embedding", "embedding").alias("sq"))
    max_sq = norms.agg(F.max("sq")).first()[0]  # scalar model parameter
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    v = fanout(e).select("vec_id", F.col("embedding").alias("v_emb"))
    # the REAL augmented-space cosine (round-9 ADVICE: the old
    # divide-by-constant form could only catch rounding ties, never a
    # broken reduction): corpus vector x gains the extra coordinate
    # e = sqrt(M²−‖x‖²), the query gains 0, and the cosine is recomputed
    # from the augmented parts — numerator <q,x> (the extra term is 0·e),
    # denominator ‖q‖ · sqrt(‖x‖² + e·e), NEVER the assumed constant M
    scored = (
        v.join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(_fold("q_emb", "v_emb"), 6).alias("ip"),
            _fold("q_emb", "q_emb").alias("q_sq"),
            _fold("v_emb", "v_emb").alias("v_sq"),
        )
        .withColumn("extra", F.sqrt(F.lit(float(max_sq)) - F.col("v_sq")))
        .withColumn(
            "aug",
            F.round(
                F.col("ip")
                / (
                    F.sqrt("q_sq")
                    * F.sqrt(F.col("v_sq") + F.col("extra") * F.col("extra"))
                ),
                6,
            ),
        )
    )
    w_ip = Window.partitionBy("query_id").orderBy(F.col("ip").desc(), "vec_id")
    w_aug = Window.partitionBy("query_id").orderBy(F.col("aug").desc(), "vec_id")
    return (
        scored.withColumn("rnk_ip", F.row_number().over(w_ip))
        .withColumn("rnk_aug", F.row_number().over(w_aug))
        .filter(F.col("rnk_ip") <= _TOPK)
        .select(
            "query_id",
            "vec_id",
            "ip",
            "rnk_ip",
            (F.col("rnk_ip") == F.col("rnk_aug")).alias("aug_rank_agrees"),
        )
    )


# ---------------------------------------------------------------------------
# retrieval_hybrid_rrf — BM25 ⊕ dense-cosine fusion via Reciprocal Rank Fusion
# ---------------------------------------------------------------------------

_RRF_K = 60            # the canonical RRF smoothing constant (Cormack et al.)
_RRF_N = 20            # per-side list depth feeding the fusion
_RRF_SCALE = 1_000_000_000  # 1/(k+r) → integer units via exact int division
_RRF_TOPK = 5

_DUCK_COS_QV = """
    SUM(CAST(q.embedding[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE))
      / (SQRT(SUM(CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))
       * SQRT(SUM(CAST(v.embedding[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE))))
"""


def _rrf_oracle() -> str:
    from .textanalysis import _BM25_CTES, _BM25_N_QUERIES

    return f"""{_BM25_CTES}, lex_top AS (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score_u DESC, doc_id) AS r
        FROM scored
    ), lex_c AS (
        SELECT query_id, doc_id, {_RRF_SCALE} // ({_RRF_K} + r) AS c_u
        FROM lex_top WHERE r <= {_RRF_N}
    ), dense AS (
        SELECT q.vec_id AS query_id, v.vec_id AS doc_id,
               ROUND({_DUCK_COS_QV}, 6) AS sim
        FROM embeddings q
        JOIN embeddings v ON v.vec_id >= {_BM25_N_QUERIES}
        CROSS JOIN UNNEST(RANGE(1, {_DIM + 1})) AS t(i)
        WHERE q.vec_id < {_BM25_N_QUERIES}
        GROUP BY 1, 2
    ), dense_top AS (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, doc_id) AS r
        FROM dense
    ), dense_c AS (
        SELECT query_id, doc_id, {_RRF_SCALE} // ({_RRF_K} + r) AS c_u
        FROM dense_top WHERE r <= {_RRF_N}
    ), fused AS (
        SELECT query_id, doc_id,
               CAST(SUM(c_u) AS BIGINT) AS rrf_u,
               CAST(COUNT(*) AS BIGINT) AS n_lists
        FROM (SELECT * FROM lex_c UNION ALL SELECT * FROM dense_c)
        GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, rrf_u, n_lists, rnk FROM (
        SELECT query_id, doc_id, rrf_u, n_lists,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY rrf_u DESC, doc_id) AS rnk
        FROM fused
    ) WHERE rnk <= {_RRF_TOPK}
    """


def _dense_retrieval_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-cosine retrieval scores for the shared query set (vec_id <
    _BM25_N_QUERIES) against the full corpus → (query_id, doc_id, sim),
    6dp-rounded, shared_frame-cached. Consumed by the hybrid-RRF fusion
    and the retrieval system-comparison eval: the corpus scan + JVM
    cosine fold runs once per (session, sf_dir); the cached frame is
    (queries × corpus) rows of THREE SCALARS — the embedding arrays never
    persist, so memory is bounded by corpus row count, not vector bytes."""
    from .textanalysis import _BM25_N_QUERIES

    def build() -> DataFrame:
        e = table(spark, sf_dir, "embeddings")
        q = e.filter(F.col("vec_id") < _BM25_N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
        )
        v = fanout(e).filter(F.col("vec_id") >= _BM25_N_QUERIES).select(
            F.col("vec_id").alias("doc_id"), F.col("embedding").alias("v_emb")
        )
        return v.join(F.broadcast(q)).select(
            "query_id",
            "doc_id",
            F.round(cosine_sim("q_emb", "v_emb"), 6).alias("sim"),
        )

    return shared_frame(spark, "retrieval_dense_scores", sf_dir, build)


@query("retrieval_hybrid_rrf", oracle=_rrf_oracle())
def retrieval_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion: the BM25 lexical
    ranking (text_bm25_ranked_retrieval's scoring pipeline, SHARED code
    and shared oracle CTEs) and the dense cosine ranking over the
    embeddings table are each cut to their top-{_RRF_N}, and candidates
    are fused by rrf(d) = Σ_lists 1/({_RRF_K} + rank) — the standard
    score-free fusion (Cormack/Clarke/Buettcher '09) every hybrid RAG
    stack runs, robust to the two sides' incomparable score scales.
    Returns the top-{_RRF_TOPK} fused docs per query with how many lists
    surfaced each (n_lists = 2 ⇒ lexical AND semantic agreement).

    Scale shape: each side is its own already-audited bounded plan (BM25:
    broadcast rare-term posting join; dense: broadcast-query corpus scan);
    the fusion itself touches only 2 × {_RRF_N} rows per query — a
    queries×depth-bounded union + one tiny hash aggregate. Nothing new
    shuffles at corpus scale.

    Determinism: ranks are exact integers from already-deterministic
    orderings (integer BM25 micro-units; 6dp-rounded cosine; doc_id
    tiebreaks), and each 1/(k+r) contribution is the exact integer
    {_RRF_SCALE} DIV (k+r), so fused scores are order-independent BIGINT
    sums — no float ever crosses the gate.

    Reference parity: none (SURVEY §2.D north-star; composes the round-9
    BM25 lexical side with the dense retrieval stack)."""
    from .textanalysis import _bm25_scores

    lex = _bm25_scores(spark, sf_dir)
    wl = Window.partitionBy("query_id").orderBy(F.col("score_u").desc(), "doc_id")
    lex_c = (
        lex.withColumn("r", F.row_number().over(wl))
        .filter(F.col("r") <= _RRF_N)
        .select(
            "query_id",
            "doc_id",
            F.expr(f"{_RRF_SCALE} DIV ({_RRF_K} + r)").alias("c_u"),
        )
    )
    dense = _dense_retrieval_scores(spark, sf_dir)
    wd = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "doc_id")
    dense_c = (
        dense.withColumn("r", F.row_number().over(wd))
        .filter(F.col("r") <= _RRF_N)
        .select(
            "query_id",
            "doc_id",
            F.expr(f"{_RRF_SCALE} DIV ({_RRF_K} + r)").alias("c_u"),
        )
    )
    fused = (
        lex_c.unionByName(dense_c)
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum("c_u").alias("rrf_u"),
            F.count("*").alias("n_lists"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(F.col("rrf_u").desc(), "doc_id")
    return (
        fused.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= _RRF_TOPK)
        .select("query_id", "doc_id", "rrf_u", "n_lists", "rnk")
    )


# ---------------------------------------------------------------------------
# retrieval_eval_system_comparison — MRR / hits@1 / P@k across the three
# retrieval systems (BM25 lexical, dense cosine, RRF hybrid)
# ---------------------------------------------------------------------------

_EVAL_K = 10               # evaluation list depth (metrics @10)
_MRR_SCALE = 1_000_000     # 1/first_rel_rank → exact integer micro-units


def _retrieval_eval_oracle() -> str:
    from .textanalysis import _BM25_CTES, _BM25_N_QUERIES

    return f"""{_BM25_CTES}, lex_rank AS (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score_u DESC, doc_id) AS rnk
        FROM scored
    ), dense AS (
        SELECT q.vec_id AS query_id, v.vec_id AS doc_id,
               ROUND({_DUCK_COS_QV}, 6) AS sim
        FROM embeddings q
        JOIN embeddings v ON v.vec_id >= {_BM25_N_QUERIES}
        CROSS JOIN UNNEST(RANGE(1, {_DIM + 1})) AS t(i)
        WHERE q.vec_id < {_BM25_N_QUERIES}
        GROUP BY 1, 2
    ), dense_rank AS (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, doc_id) AS rnk
        FROM dense
    ), lex_c AS (
        SELECT query_id, doc_id, {_RRF_SCALE} // ({_RRF_K} + rnk) AS c_u
        FROM lex_rank WHERE rnk <= {_RRF_N}
    ), dense_c AS (
        SELECT query_id, doc_id, {_RRF_SCALE} // ({_RRF_K} + rnk) AS c_u
        FROM dense_rank WHERE rnk <= {_RRF_N}
    ), fused AS (
        SELECT query_id, doc_id, SUM(c_u) AS rrf_u
        FROM (SELECT * FROM lex_c UNION ALL SELECT * FROM dense_c)
        GROUP BY query_id, doc_id
    ), rrf_rank AS (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY rrf_u DESC, doc_id) AS rnk
        FROM fused
    ), ranked AS (
        SELECT 'bm25' AS system, query_id, doc_id, rnk
        FROM lex_rank WHERE rnk <= {_EVAL_K}
        UNION ALL
        SELECT 'dense', query_id, doc_id, rnk
        FROM dense_rank WHERE rnk <= {_EVAL_K}
        UNION ALL
        SELECT 'rrf', query_id, doc_id, rnk
        FROM rrf_rank WHERE rnk <= {_EVAL_K}
    ), labeled AS (
        SELECT r.system, r.query_id, r.rnk,
               CASE WHEN ql.label = vl.label THEN 1 ELSE 0 END AS rel
        FROM ranked r
        JOIN embeddings ql ON ql.vec_id = r.query_id
        JOIN embeddings vl ON vl.vec_id = r.doc_id
    ), per_query AS (
        SELECT system, query_id,
               MIN(CASE WHEN rel = 1 THEN rnk END) AS first_rel,
               MAX(CASE WHEN rnk = 1 THEN rel ELSE 0 END) AS hit1,
               SUM(rel) AS rel_topk
        FROM labeled GROUP BY system, query_id
    )
    SELECT system,
           CAST(COUNT(*) AS BIGINT)                                 AS n_queries,
           CAST(SUM(COALESCE({_MRR_SCALE} // first_rel, 0)) AS BIGINT) AS sum_rr_u,
           CAST(SUM(hit1) AS BIGINT)                                AS hits_at_1,
           CAST(SUM(rel_topk) AS BIGINT)                            AS rel_in_topk
    FROM per_query
    GROUP BY system
    ORDER BY system
    """


@query("retrieval_eval_system_comparison", oracle=_retrieval_eval_oracle())
def retrieval_eval_system_comparison(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Side-by-side IR-metric evaluation of the three retrieval systems
    the engine ships — BM25 lexical, dense cosine, and their RRF hybrid —
    against a shared relevance standard (corpus doc shares the query
    document's embedding label, the same ground truth
    similarity_paired_retrieval_eval uses). Per system: query count,
    MRR@{_EVAL_K} in exact integer micro-units (Σ {_MRR_SCALE} DIV
    first-relevant-rank), hits@1, and the P@{_EVAL_K} numerator (relevant
    docs in the top {_EVAL_K}). This is the comparison table every hybrid
    RAG deployment reads before picking a retriever — and the eval
    harness that will gate any future scoring change to either side.

    Scale shape: both scoring sides are the already-audited bounded plans
    (BM25: broadcast rare-term posting join; dense: broadcast-query corpus
    scan) and arrive via shared_frame, so a session that already ran the
    BM25 or RRF gates pays NOTHING new for scoring here; ranking windows
    are per-query (queries × corpus-candidates rows, WindowGroupLimit
    bounds the sort); everything after the @{_EVAL_K} cut is
    queries × systems × {_EVAL_K} rows — label joins broadcast that
    90-row frame against the label dimension, never the reverse.

    Determinism: ranks come from the exact orderings already gated
    (integer BM25 micro-units / 6dp cosine / integer RRF units, doc_id
    tiebreaks); reciprocal ranks are exact integer DIV; every metric is
    an integer SUM — order-independent, float-free gates.

    Reference parity: none (SURVEY §2.D north-star; composes the round-9
    retrieval stack into its evaluation harness)."""
    from .textanalysis import _bm25_scores

    lex = _bm25_scores(spark, sf_dir)
    dense = _dense_retrieval_scores(spark, sf_dir)
    wl = Window.partitionBy("query_id").orderBy(F.col("score_u").desc(), "doc_id")
    wd = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "doc_id")
    lex_rank = lex.select(
        "query_id", "doc_id", F.row_number().over(wl).alias("rnk")
    )
    dense_rank = dense.select(
        "query_id", "doc_id", F.row_number().over(wd).alias("rnk")
    )

    def contrib(ranked: DataFrame) -> DataFrame:
        return ranked.filter(F.col("rnk") <= _RRF_N).select(
            "query_id",
            "doc_id",
            F.expr(f"{_RRF_SCALE} DIV ({_RRF_K} + rnk)").alias("c_u"),
        )

    fused = (
        contrib(lex_rank)
        .unionByName(contrib(dense_rank))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("c_u").alias("rrf_u"))
    )
    wr = Window.partitionBy("query_id").orderBy(F.col("rrf_u").desc(), "doc_id")
    rrf_rank = fused.select(
        "query_id", "doc_id", F.row_number().over(wr).alias("rnk")
    )
    ranked = (
        lex_rank.filter(F.col("rnk") <= _EVAL_K)
        .withColumn("system", F.lit("bm25"))
        .unionByName(
            dense_rank.filter(F.col("rnk") <= _EVAL_K)
            .withColumn("system", F.lit("dense"))
        )
        .unionByName(
            rrf_rank.filter(F.col("rnk") <= _EVAL_K)
            .withColumn("system", F.lit("rrf"))
        )
    )
    lab = table(spark, sf_dir, "embeddings").select("vec_id", "label")
    ql = lab.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("q_label")
    )
    vl = lab.select(
        F.col("vec_id").alias("doc_id"), F.col("label").alias("v_label")
    )
    # ranked is systems × queries × K rows — broadcast it against the
    # corpus-sized label dimension, never the reverse
    labeled = vl.join(
        F.broadcast(ranked.join(F.broadcast(ql), "query_id")), "doc_id"
    ).select(
        "system",
        "query_id",
        "rnk",
        (F.col("q_label") == F.col("v_label")).cast("long").alias("rel"),
    )
    per_query = labeled.groupBy("system", "query_id").agg(
        F.min(F.when(F.col("rel") == 1, F.col("rnk"))).alias("first_rel"),
        F.max(F.when(F.col("rnk") == 1, F.col("rel")).otherwise(0)).alias("hit1"),
        F.sum("rel").alias("rel_topk"),
    )
    return (
        per_query.groupBy("system")
        .agg(
            F.count("*").alias("n_queries"),
            F.sum(
                F.coalesce(
                    F.expr(f"{_MRR_SCALE} DIV first_rel"),
                    F.lit(0).cast("long"),
                )
            ).alias("sum_rr_u"),
            F.sum("hit1").alias("hits_at_1"),
            F.sum("rel_topk").alias("rel_in_topk"),
        )
        .orderBy("system")
    )
