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

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, StringType, StructField, StructType,
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
        try:
            import PIL  # noqa: F401 — real path, not in container

            raise NotImplementedError(
                "real PIL decode path not wired in this environment"
            )
        except ImportError:
            dec = _FakeDecoder()
        _DECODER_CACHE["decoder"] = dec
    return dec


class _FakeDecoder:
    """Deterministic stand-in for PIL decode + face blur."""

    def decode_meta(self, blob: bytes) -> tuple[int, int]:
        # fake dimensions derived deterministically from content
        return (len(blob) % 640 + 16, len(blob) % 480 + 16)

    def blur(self, blob: bytes) -> bytes:
        # mask the middle third of the payload — a visible, testable
        # transformation standing in for per-face GaussianBlur
        n = len(blob)
        lo, hi = n // 3, 2 * n // 3
        return blob[:lo] + b"\x00" * (hi - lo) + blob[hi:]


def scrub_media(df: DataFrame, url_col: str = "url",
                bytes_col: str = "html") -> DataFrame:
    """Binary scrub via mapInPandas: decode → transform → status.

    Per-record failures land in the status column (reference semantics:
    log, append to problems, continue — smparserbase.py:164-167).
    """

    def _scrub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
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
                    out["status"].append("ok")
                except Exception as e:  # per-record isolation
                    out["scrubbed_bytes"].append(None)
                    out["width"].append(None)
                    out["height"].append(None)
                    out["status"].append(f"error:{type(e).__name__}")
            yield pd.DataFrame(out)

    return df.select(url_col, bytes_col).mapInPandas(_scrub, MEDIA_SCRUB_SCHEMA)
