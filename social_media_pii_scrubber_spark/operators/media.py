"""Multimodal (binary) column operators.

The reference's media path — read image bytes from a zip member, detect
faces, Gaussian-blur each box, save
(/root/reference/SMParser/smparserbase.py:133-171) — maps to Spark as
``binary`` columns transformed by Arrow-batched pandas UDFs via
``mapInPandas``. PIL/dlib/face_recognition are NOT in this container,
so the decode/detect kernels are STUBBED behind a deterministic fake
(documented per the build brief); everything Spark-side is real and
tested: schema, batch shape, per-record error isolation (the
reference's log-and-skip at smparserbase.py:164-167 becomes a status
struct column — never fail the job on one bad blob).
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, StringType,
    StructField, StructType,
)

# output schema of the media-scrub stage: original key, transformed
# bytes, extracted metadata, and the per-record error channel.
MEDIA_SCRUB_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("scrubbed_bytes", BinaryType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("status", StringType()),   # 'ok' | 'error:<reason>'
])

_DECODER_CACHE: dict[str, object] = {}


def _get_decoder():
    """Lazy per-worker decoder init (the model-per-executor idiom).

    In production this imports PIL + face_recognition and loads the
    face detector once per Python worker. Here: a deterministic fake
    that 'decodes' our synthetic html bytes (see sources/webpages.py)
    and 'blurs' by masking a fixed byte range.
    """
    dec = _DECODER_CACHE.get("decoder")
    if dec is None:
        dec = _FakeDecoder()
        # The real PIL path is opt-in; media workers must NEVER fail the
        # whole job because an optional dependency happens to be
        # importable but unwired (per-record never-fail contract,
        # smparserbase.py:164-167) — ANY failure building the real
        # decoder degrades to the fake one with records tagged
        # 'error:decoder' instead of raising out of the worker.
        if os.environ.get("SCRUB_MEDIA_REAL_DECODER") == "1":
            try:
                dec = _build_real_decoder()
            except ImportError:
                dec = _FakeDecoder()          # dep absent: normal stub path
            except Exception:
                dec = _FakeDecoder(status="error:decoder")
        _DECODER_CACHE["decoder"] = dec
    return dec


def _build_real_decoder():
    """Production seam: import PIL + face_recognition, load the detector
    once per worker, return an object with decode_meta/blur. Not wired
    in this container (the libs are absent)."""
    import PIL  # noqa: F401 — real path, not in container

    raise NotImplementedError(
        "real PIL decode path not wired in this environment"
    )


class _FakeDecoder:
    """Deterministic stand-in for PIL decode + face blur.

    ``status`` is what healthy records are tagged with: 'ok' normally,
    'error:decoder' when this fake is standing in for a real decoder
    that failed to initialize (so the degradation is visible in the
    output instead of crashing the job)."""

    def __init__(self, status: str = "ok"):
        self.status = status

    def decode_meta(self, blob: bytes) -> tuple[int, int]:
        # fake dimensions derived deterministically from content
        return (len(blob) % 640 + 16, len(blob) % 480 + 16)

    def blur(self, blob: bytes) -> bytes:
        # mask the middle third of the payload — a visible, testable
        # transformation standing in for per-face GaussianBlur
        n = len(blob)
        lo, hi = n // 3, 2 * n // 3
        return blob[:lo] + b"\x00" * (hi - lo) + blob[hi:]


def _scrub_batches(batches: Iterator[pd.DataFrame], url_col: str,
                   bytes_col: str) -> Iterator[pd.DataFrame]:
    """Worker-side kernel of scrub_media (module-level so the decoder
    degradation contract is unit-testable without a Spark worker)."""
    dec = _get_decoder()
    for pdf in batches:
        out = {"url": [], "scrubbed_bytes": [], "width": [],
               "height": [], "status": []}
        for url, blob in zip(pdf[url_col], pdf[bytes_col]):
            out["url"].append(url)
            try:
                if blob is None:
                    raise ValueError("null blob")
                blob = bytes(blob)
                w, h = dec.decode_meta(blob)
                out["scrubbed_bytes"].append(dec.blur(blob))
                out["width"].append(w)
                out["height"].append(h)
                out["status"].append(dec.status)
            except Exception as e:  # per-record isolation
                out["scrubbed_bytes"].append(None)
                out["width"].append(None)
                out["height"].append(None)
                out["status"].append(f"error:{type(e).__name__}")
        yield pd.DataFrame(out)


def scrub_media(df: DataFrame, url_col: str = "url",
                bytes_col: str = "html") -> DataFrame:
    """Binary scrub via mapInPandas: decode → transform → status.

    Per-record failures land in the status column (reference semantics:
    log, append to problems, continue — smparserbase.py:164-167).
    """

    def _scrub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        return _scrub_batches(batches, url_col, bytes_col)

    return df.select(url_col, bytes_col).mapInPandas(_scrub, MEDIA_SCRUB_SCHEMA)


# --- feature extraction / resize / frame sampling ---------------------------
# Same contract as scrub_media: real Spark plumbing (schema, Arrow batch
# shape, error channel), deterministic fake kernels where the real
# decoder libraries (PIL/ffmpeg) are absent from this environment.

FEATURES_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("features", ArrayType(FloatType())),
    StructField("status", StringType()),
])

FEATURE_DIM = 16


def extract_features(df: DataFrame, url_col: str = "url",
                     bytes_col: str = "html") -> DataFrame:
    """binary → fixed-dim float feature vector (CLIP-embedding shaped).

    Fake kernel: 16 byte-histogram buckets, L1-normalized — replace
    with a real vision encoder per worker in production.
    """

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            urls, feats, status = [], [], []
            for url, blob in zip(pdf[url_col], pdf[bytes_col]):
                urls.append(url)
                try:
                    arr = np.frombuffer(bytes(blob), dtype=np.uint8)
                    hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
                    total = max(int(hist.sum()), 1)
                    feats.append((hist / total).astype("float32").tolist())
                    status.append("ok")
                except Exception as e:
                    feats.append(None)
                    status.append(f"error:{type(e).__name__}")
            yield pd.DataFrame({"url": urls, "features": feats, "status": status})

    return df.select(url_col, bytes_col).mapInPandas(_feat, FEATURES_SCHEMA)


RESIZE_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("resized_bytes", BinaryType()),
    StructField("status", StringType()),
])


def resize_media(df: DataFrame, target_bytes: int = 1024,
                 url_col: str = "url", bytes_col: str = "html") -> DataFrame:
    """binary → size-bounded binary (thumbnail-shaped).

    Fake kernel: deterministic stride subsampling to ≤ target_bytes —
    stands in for PIL Image.resize; the Spark side (schema, batching,
    error isolation) is the production shape.
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, out, status = [], [], []
            for url, blob in zip(pdf[url_col], pdf[bytes_col]):
                urls.append(url)
                try:
                    b = bytes(blob)
                    stride = max(1, len(b) // target_bytes)
                    out.append(b[::stride][:target_bytes])
                    status.append("ok")
                except Exception as e:
                    out.append(None)
                    status.append(f"error:{type(e).__name__}")
            yield pd.DataFrame({"url": urls, "resized_bytes": out, "status": status})

    return df.select(url_col, bytes_col).mapInPandas(_resize, RESIZE_SCHEMA)


FRAMES_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame_bytes", BinaryType()),
    StructField("status", StringType()),
])


def sample_frames(df: DataFrame, n_frames: int = 4,
                  url_col: str = "url", bytes_col: str = "html") -> DataFrame:
    """binary 'video' → N evenly-spaced frame rows (1:N fan-out).

    Fake kernel: splits the blob into n equal chunks, one per frame —
    stands in for ffmpeg keyframe extraction. Demonstrates the fan-out
    shape (mapInPandas emitting multiple rows per input)."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"url": [], "frame_idx": [], "frame_bytes": [], "status": []}
            for url, blob in zip(pdf[url_col], pdf[bytes_col]):
                try:
                    b = bytes(blob)
                    step = max(1, len(b) // n_frames)
                    for i in range(n_frames):
                        rows["url"].append(url)
                        rows["frame_idx"].append(i)
                        rows["frame_bytes"].append(b[i * step:(i + 1) * step])
                        rows["status"].append("ok")
                except Exception as e:
                    rows["url"].append(url)
                    rows["frame_idx"].append(None)
                    rows["frame_bytes"].append(None)
                    rows["status"].append(f"error:{type(e).__name__}")
            yield pd.DataFrame(rows)

    return df.select(url_col, bytes_col).mapInPandas(_frames, FRAMES_SCHEMA)
