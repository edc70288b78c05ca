"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The reference's whole data model is "opaque bytes + a partition key"
(ByteBuffer records, KinesisSource.scala:68-69; PutRecordsRequestEntry,
ToPutRecordsRequest.scala:9-11). This module carries that model into a
multimodal table: ``binary`` payload columns with a metadata struct, and
Arrow-batched ``mapInPandas`` decode/feature stages.

Decoding is optional-import: ``decode_image``/``decode_audio`` use
PIL/soundfile when installed and raise ``NotImplementedError`` when not
(this container ships neither); ``decode_features`` dispatches — real
dimensions for decodable images under an installed backend, the
deterministic ``fake_decode_features`` stand-in otherwise — so the oracle
gate (text payloads, never decodable images) passes identically with either
backend. The Spark-side plumbing — schema, batch iteration, partitioning —
is the real production shape either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..io import fanout, table
from ..registry import query


def decode_image(payload: bytes) -> "object":
    """Real image decode seam — optional-import PIL. Returns a PIL.Image
    when Pillow is installed; raises NotImplementedError when it isn't
    (this container ships no imaging library). Invalid image bytes raise
    ValueError so callers can distinguish "no backend" from "not an
    image" and fall back per-payload."""
    try:
        from PIL import Image  # type: ignore[import-not-found]
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires Pillow, which is not installed; "
            "decode_features falls back to the deterministic stub"
        ) from e
    import io

    try:
        img = Image.open(io.BytesIO(payload))
        img.load()
        return img
    except Exception as e:  # noqa: BLE001 - any decode failure → typed error
        raise ValueError(f"payload is not a decodable image: {e}") from e


def decode_audio(payload: bytes) -> "object":
    """Real audio decode seam — optional-import soundfile. Returns
    (samples, sample_rate) when soundfile is installed; raises
    NotImplementedError when it isn't. Invalid audio bytes raise
    ValueError (same backend-vs-payload distinction as decode_image)."""
    try:
        import soundfile as sf  # type: ignore[import-not-found]
    except ImportError as e:
        raise NotImplementedError(
            "audio decoding requires soundfile, which is not installed; "
            "decode_features falls back to the deterministic stub"
        ) from e
    import io

    try:
        return sf.read(io.BytesIO(payload))
    except Exception as e:  # noqa: BLE001
        raise ValueError(f"payload is not decodable audio: {e}") from e


def fake_decode_features(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic stand-in for a media decoder: derives (byte_size,
    width, height, content digest) purely from the bytes."""
    n = len(payload)
    return n, n % 640 + 1, (n * 7) % 480 + 1, hashlib.sha256(payload).hexdigest()


def decode_features(payload: bytes) -> tuple[int, int, int, str]:
    """Backend-dispatching feature decode: real PIL dimensions when Pillow
    is installed AND the payload is a decodable image; the deterministic
    stub otherwise (no backend, or non-image bytes such as this corpus's
    text payloads). Either backend yields the same (byte_size, width,
    height, content_sha) shape, so the oracle gate — which runs over text
    payloads that always take the stub path — passes identically with or
    without Pillow installed."""
    try:
        img = decode_image(payload)
    except (NotImplementedError, ValueError):
        return fake_decode_features(payload)
    w, h = img.size
    return len(payload), int(w), int(h), hashlib.sha256(payload).hexdigest()


_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_size", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("content_sha", StringType()),
    ]
)


def extract_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, payload) rows.

    ``mapInPandas`` streams whole Arrow record batches through Python — the
    per-partition batch shape a real decoder wants (amortized library setup,
    vectorizable post-processing) — instead of a per-row Python UDF.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_features(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "byte_size": [f[0] for f in feats],
                    "width": [f[1] for f in feats],
                    "height": [f[2] for f in feats],
                    "content_sha": [f[3] for f in feats],
                }
            )

    return binary_df.mapInPandas(_extract, schema=_FEATURE_SCHEMA)


def to_binary_table(docs: DataFrame) -> DataFrame:
    """documents → multimodal layout: opaque payload + typed metadata struct
    (the Spark rendering of the reference's (data, partitionKey) record)."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.col("lang").alias("lang"),
            F.col("source").alias("source"),
            F.col("n_chars").alias("n_chars"),
        ).alias("meta"),
    )


@query(
    "multimodal_binary_features",
    oracle="""
    SELECT doc_id,
           CAST(LENGTH(text) AS BIGINT)           AS byte_size,
           CAST(LENGTH(text) % 640 + 1 AS BIGINT) AS width,
           CAST((LENGTH(text) * 7) % 480 + 1 AS BIGINT) AS height,
           SHA256(text)                           AS content_sha
    FROM documents
    """,
)
def multimodal_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal plumbing: text → binary payload column (+meta
    struct) → Arrow-batched mapInPandas "decode" → typed feature rows. The
    oracle recomputes the deterministic fake features in SQL (ASCII corpus:
    utf-8 byte length == char length), confirming the whole binary path."""
    docs = fanout(table(spark, sf_dir, "documents"))
    binary = to_binary_table(docs).select("doc_id", "payload")
    return extract_features(binary)


_RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("src_w", LongType()),
        StructField("src_h", LongType()),
        StructField("dst_w", LongType()),
        StructField("dst_h", LongType()),
        StructField("thumb_sha", StringType()),
    ]
)

_THUMB_MAX = 128  # target bounding box for the fake "resize"


def resize_thumbnail(binary_df: DataFrame, box: int = _THUMB_MAX) -> DataFrame:
    """Aspect-preserving "resize" over opaque payloads (mapInPandas).

    A real implementation decodes pixels (decode_image seam) and rescales;
    the deterministic stand-in derives source dims from the bytes
    (fake_decode_features), fits them into a ``box``×``box`` bounding box
    with integer arithmetic, and fingerprints the would-be thumbnail as
    sha256(payload ‖ dst dims). Batch shape, schema, and the 1→1 row
    contract are the production ones."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "src_w", "src_h", "dst_w", "dst_h", "thumb_sha")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                _, w, h, _ = fake_decode_features(raw)
                scale_num, scale_den = (box, max(w, h)) if max(w, h) > box else (1, 1)
                dw = max(1, (w * scale_num) // scale_den)
                dh = max(1, (h * scale_num) // scale_den)
                rows["doc_id"].append(int(doc_id))
                rows["src_w"].append(w)
                rows["src_h"].append(h)
                rows["dst_w"].append(dw)
                rows["dst_h"].append(dh)
                rows["thumb_sha"].append(
                    hashlib.sha256(raw + f":{dw}x{dh}".encode()).hexdigest()
                )
            yield pd.DataFrame(rows)

    return binary_df.mapInPandas(_resize, schema=_RESIZE_SCHEMA)


@query(
    "multimodal_resize_thumbnails",
    oracle=f"""
    WITH dims AS (
        SELECT doc_id, text,
               CAST(LENGTH(text) % 640 + 1 AS BIGINT)       AS src_w,
               CAST((LENGTH(text) * 7) % 480 + 1 AS BIGINT) AS src_h
        FROM documents
    ), scaled AS (
        SELECT doc_id, text, src_w, src_h,
               CASE WHEN GREATEST(src_w, src_h) > {_THUMB_MAX}
                    THEN GREATEST(CAST(src_w * {_THUMB_MAX} // GREATEST(src_w, src_h) AS BIGINT), 1)
                    ELSE src_w END AS dst_w,
               CASE WHEN GREATEST(src_w, src_h) > {_THUMB_MAX}
                    THEN GREATEST(CAST(src_h * {_THUMB_MAX} // GREATEST(src_w, src_h) AS BIGINT), 1)
                    ELSE src_h END AS dst_h
        FROM dims
    )
    SELECT doc_id, src_w, src_h, dst_w, dst_h,
           SHA256(text || ':' || dst_w || 'x' || dst_h) AS thumb_sha
    FROM scaled
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The resize stage of the multimodal pipeline: binary payloads →
    aspect-fit thumbnail dims + content fingerprint, Arrow-batched. The
    oracle recomputes the deterministic stub in SQL (ASCII corpus: byte
    length == char length), pinning the full binary round trip."""
    docs = fanout(table(spark, sf_dir, "documents"))
    binary = to_binary_table(docs).select("doc_id", "payload")
    return resize_thumbnail(binary)


_AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("est_duration_ms", LongType()),
        StructField("est_sample_rate", LongType()),
        StructField("channel_sha", StringType()),
    ]
)


def extract_audio_features(binary_df: DataFrame) -> DataFrame:
    """Audio-modality twin of extract_features: duration/sample-rate
    metadata derived deterministically from the opaque payload (a real
    decoder plugs into the decode_audio seam; batch shape and schema are
    production-real)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "n_bytes", "est_duration_ms",
                                    "est_sample_rate", "channel_sha")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                n = len(raw)
                rate = 8000 * (n % 3 + 1)          # fake: 8/16/24 kHz
                rows["doc_id"].append(int(doc_id))
                rows["n_bytes"].append(n)
                rows["est_duration_ms"].append((n * 1000) // (rate * 2))
                rows["est_sample_rate"].append(rate)
                rows["channel_sha"].append(hashlib.sha256(b"ch0:" + raw).hexdigest())
            yield pd.DataFrame(rows)

    return binary_df.mapInPandas(_extract, schema=_AUDIO_SCHEMA)


@query(
    "multimodal_audio_features",
    oracle="""
    SELECT doc_id,
           CAST(LENGTH(text) AS BIGINT) AS n_bytes,
           CAST(LENGTH(text) * 1000 // ((8000 * (LENGTH(text) % 3 + 1)) * 2) AS BIGINT)
               AS est_duration_ms,
           CAST(8000 * (LENGTH(text) % 3 + 1) AS BIGINT) AS est_sample_rate,
           SHA256('ch0:' || text) AS channel_sha
    FROM documents
    """,
)
def multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio path of the multimodal surface: opaque payload → estimated
    duration/sample-rate + per-channel fingerprint via Arrow-batched
    mapInPandas (deterministic stub behind the decode_audio seam; the
    oracle recomputes it in SQL over the ASCII corpus)."""
    docs = fanout(table(spark, sf_dir, "documents"))
    binary = to_binary_table(docs).select("doc_id", "payload")
    return extract_audio_features(binary)


@query(
    "multimodal_phash_buckets",
    oracle="""
    WITH feats AS (
        SELECT doc_id,
               CAST(LENGTH(text) AS BIGINT)                 AS byte_size,
               CAST(LENGTH(text) % 640 + 1 AS BIGINT)       AS width,
               CAST((LENGTH(text) * 7) % 480 + 1 AS BIGINT) AS height
        FROM documents
    )
    SELECT width // 16 AS wq, height // 16 AS hq, byte_size // 256 AS sq,
           COUNT(*)        AS n_members,
           MIN(doc_id)     AS rep_doc
    FROM feats
    GROUP BY 1, 2, 3
    HAVING COUNT(*) >= 2
    """,
)
def multimodal_phash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash-style near-dup blocking for media: decode features
    (Arrow-batched mapInPandas — the real decoder seam, stubbed
    deterministically here), quantize them into coarse buckets (a pHash
    collapses an image to a few quantized frequency bits the same way),
    and emit buckets with ≥2 members — the candidate groups an exact
    pairwise verifier would then score. The feature pass is row-local;
    blocking is one hash-agg on the tiny quantized key; pair generation
    stays output-sensitive, never all-pairs — the same scale anatomy as
    MinHash-LSH for text (operators/dedup.py)."""
    d = fanout(table(spark, sf_dir, "documents"))
    feats = extract_features(
        to_binary_table(d).select("doc_id", "payload")
    )
    return (
        feats.select(
            (F.col("width") / 16).cast("long").alias("wq"),
            (F.col("height") / 16).cast("long").alias("hq"),
            (F.col("byte_size") / 256).cast("long").alias("sq"),
            "doc_id",
        )
        .groupBy("wq", "hq", "sq")
        .agg(F.count("*").alias("n_members"), F.min("doc_id").alias("rep_doc"))
        .filter(F.col("n_members") >= 2)
    )


# ---------------------------------------------------------------------------
# multimodal_clip_pair_filter — image-text pair curation (LAION-style)
# ---------------------------------------------------------------------------

# Keep a pair when the first 4 hex chars of sha256(payload || caption)
# sort below this threshold (hex strings compare lexicographically):
# 'c000'/'10000' ≈ 75% keep rate. The real system would threshold a CLIP
# similarity; the deterministic digest stand-in exercises the identical
# plumbing (paired binary+text batch through Arrow, per-pair score,
# threshold filter) and stays oracle-checkable.
_CLIP_KEEP_BELOW = "c000"
_CLIP_CAPTION_TOKENS = 8

_CLIP_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("caption", StringType()),
        StructField("score_hex", StringType()),
    ]
)


def clip_score_stub(payload: bytes, caption: str) -> str:
    """Deterministic stand-in for a CLIP image-text similarity: the first
    4 hex chars of sha256(image_bytes || caption). A real scorer slots in
    here (same (bytes, str) -> comparable signature) when a vision model
    is available."""
    return hashlib.sha256(payload + caption.encode()).hexdigest()[:4]


@query(
    "multimodal_clip_pair_filter",
    oracle=f"""
    WITH pairs AS (
        SELECT doc_id, text,
               ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[1:{_CLIP_CAPTION_TOKENS}], ' ')
                   AS caption
        FROM documents
    )
    SELECT doc_id, caption,
           SUBSTR(SHA256(text || caption), 1, 4) AS score_hex,
           (SUBSTR(SHA256(text || caption), 1, 4) < '{_CLIP_KEEP_BELOW}')
               AS kept
    FROM pairs
    """,
)
def multimodal_clip_pair_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-text pair curation, the LAION-style filter: pair every
    "image" payload with its caption (first {_CLIP_CAPTION_TOKENS} tokens
    here), score each pair with a CLIP-shaped scorer, and keep pairs
    above threshold. The scorer is the documented deterministic stub
    (``clip_score_stub`` — no vision model in this container); everything
    around it is the production shape: binary+text columns ride ONE Arrow
    ``mapInPandas`` pass (model inference wants whole batches, amortized
    weights load), the threshold is a plain column predicate, and nothing
    shuffles — pair filtering is embarrassingly parallel at any scale."""
    d = fanout(table(spark, sf_dir, "documents"))
    pairs = d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.array_join(
            F.slice(F.split("text", " "), 1, _CLIP_CAPTION_TOKENS), " "
        ).alias("caption"),
    )

    def _score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "caption": pdf["caption"],
                    "score_hex": [
                        clip_score_stub(bytes(p), c)
                        for p, c in zip(pdf["payload"], pdf["caption"])
                    ],
                }
            )

    scored = pairs.select("doc_id", "payload", "caption").mapInPandas(
        _score, schema=_CLIP_SCHEMA
    )
    return scored.select(
        "doc_id",
        "caption",
        "score_hex",
        (F.col("score_hex") < _CLIP_KEEP_BELOW).alias("kept"),
    )


# ---------------------------------------------------------------------------
# multimodal_phash_hamming_pairs — bucketed Hamming near-dup pair generation
# ---------------------------------------------------------------------------

# 16-bit perceptual code from the stubbed feature triple (a real pHash
# quantizes DCT coefficients; the stand-in quantizes the same decoded
# feature fields, keeping every downstream step — banding, bucket join,
# Hamming confirm — real and oracle-checkable)
_PH_HAMMING_MAX = 3     # confirm threshold: near-dup iff ≤ 3 differing bits
# band = the top byte of the code; pairs are generated only within a band
# (single-band recall limit documented in the docstring; production runs
# several band tables exactly like the MinHash band path, dedup.py)


@query(
    "multimodal_phash_hamming_pairs",
    oracle=f"""
    WITH feats AS (
        SELECT doc_id,
               CAST(LENGTH(text) AS BIGINT)                 AS byte_size,
               CAST(LENGTH(text) % 640 + 1 AS BIGINT)       AS width,
               CAST((LENGTH(text) * 7) % 480 + 1 AS BIGINT) AS height
        FROM documents
    ), coded AS (
        SELECT doc_id,
               CAST(
                   ((width // 16) % 16) * 4096
                 + ((height // 16) % 16) * 256
                 + (byte_size % 256) AS BIGINT
               ) AS phash16
        FROM feats
    ), banded AS (
        SELECT doc_id, phash16, phash16 // 256 AS band FROM coded
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(a.phash16 AS BIGINT) AS phash_a,
           CAST(b.phash16 AS BIGINT) AS phash_b,
           CAST(bit_count(xor(a.phash16, b.phash16)) AS BIGINT) AS hamming
    FROM banded a JOIN banded b
      ON a.band = b.band AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.phash16, b.phash16)) <= {_PH_HAMMING_MAX}
    """,
)
def multimodal_phash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate PAIRS for media: decode features
    (Arrow-batched mapInPandas, deterministic stand-in decoder — see
    module docstring), pack them into a 16-bit pHash-style code, band on
    the code's top byte, generate candidate pairs ONLY within a band, and
    confirm with an exact Hamming-distance test (≤{_PH_HAMMING_MAX} bits).
    This is the image-dedup candidate pipeline (pHash/aHash dedup in
    LAION-scale curation) with the same scale anatomy as MinHash-LSH for
    text: banding makes candidate work Σ(bucket²), never corpus².

    Single-band recall limit: a pair differing only in the top byte is
    missed; production runs several rotated band tables exactly like the
    MinHash band path (operators/dedup.py) — one band here keeps the
    oracle 1:1.

    Determinism: the code is exact integer arithmetic over the decoded
    integer features; the confirm is bit_count(xor) — no float anywhere."""
    d = fanout(table(spark, sf_dir, "documents"))
    feats = extract_features(to_binary_table(d).select("doc_id", "payload"))
    coded = feats.select(
        "doc_id",
        (
            (F.expr("(width DIV 16) % 16") * 4096)
            + (F.expr("(height DIV 16) % 16") * 256)
            + (F.col("byte_size") % 256)
        ).cast("long").alias("phash16"),
    )
    banded = coded.withColumn("band", F.expr("phash16 DIV 256"))
    a = banded.alias("a")
    b = banded.alias("b")
    hamming = F.expr("bit_count(a.phash16 ^ b.phash16)")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(hamming <= _PH_HAMMING_MAX)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.phash16").alias("phash_a"),
            F.col("b.phash16").alias("phash_b"),
            hamming.cast("long").alias("hamming"),
        )
    )
