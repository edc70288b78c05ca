"""Backend-dispatch tests for the multimodal decode seam.

The oracle gate (multimodal_binary_features et al.) runs over text payloads
and must produce identical output whether or not an imaging/audio backend is
installed; the real-decode branch is exercised only when PIL/soundfile
exist (skipif-gated — absent in this container).
"""

from __future__ import annotations

import struct
import zlib

import pytest

from akka_streams_kinesis_spark.operators.multimodal import (
    decode_audio,
    decode_features,
    decode_image,
    fake_decode_features,
)


def _has(mod: str) -> bool:
    try:
        __import__(mod)
        return True
    except ImportError:
        return False


def _tiny_png(w: int = 3, h: int = 2) -> bytes:
    """A valid minimal RGB PNG built with stdlib only (no PIL needed to
    CONSTRUCT it — only to decode it)."""

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x10\x20\x30" * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_decode_features_falls_back_on_text_payloads():
    """Text bytes are never a decodable image, so decode_features must equal
    the deterministic stub regardless of installed backends — this is what
    keeps the oracle gate backend-independent."""
    for payload in (b"hello world", b"", b"\x00\x01\x02", "καλημέρα".encode()):
        assert decode_features(payload) == fake_decode_features(payload)


@pytest.mark.skipif(not _has("PIL"), reason="Pillow not installed")
def test_decode_image_real_backend():
    img = decode_image(_tiny_png(5, 4))
    assert img.size == (5, 4)
    # decode_features reports REAL dims under the real backend
    n, w, h, sha = decode_features(_tiny_png(5, 4))
    assert (w, h) == (5, 4) and n == len(_tiny_png(5, 4))
    with pytest.raises(ValueError):
        decode_image(b"not an image")


@pytest.mark.skipif(_has("PIL"), reason="Pillow installed")
def test_decode_image_without_backend_raises_notimplemented():
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_image(_tiny_png())


@pytest.mark.skipif(not _has("soundfile"), reason="soundfile not installed")
def test_decode_audio_real_backend():
    import io

    import numpy as np
    import soundfile as sf

    buf = io.BytesIO()
    sf.write(buf, np.zeros(160, dtype="float32"), 16000, format="WAV")
    samples, rate = decode_audio(buf.getvalue())
    assert rate == 16000 and len(samples) == 160
    with pytest.raises(ValueError):
        decode_audio(b"not audio")


@pytest.mark.skipif(_has("soundfile"), reason="soundfile installed")
def test_decode_audio_without_backend_raises_notimplemented():
    with pytest.raises(NotImplementedError, match="soundfile"):
        decode_audio(b"RIFF....WAVE")
