"""Multimodal (binary-column) plumbing: treat image/audio/video payloads as
opaque ``binary`` columns with typed metadata, processed in Arrow batches
via ``mapInPandas``.

The decode step is STUBBED (no image/audio libs in this environment): a
clearly-marked deterministic fake derives metadata from the byte stream.
Everything Spark-side — schema, partitioning, UDF signature, Arrow batch
shape — is real and tested; swapping ``_decode_stub`` for PIL/ffmpeg is a
one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, content_md5 string, "
    "width int, height int, channels int, format string"
)

FRAME_SCHEMA = "doc_id long, frame_idx int, frame_offset long, frame_md5 string"


def _decode_stub(data: bytes) -> tuple[int, int, int, str]:
    """Deterministic FAKE decode (real impl: PIL.Image.open / ffprobe).

    Raises on empty payloads exactly like a real decoder would.
    """
    if not data:
        raise ValueError("empty payload")
    n = len(data)
    return (n % 640 + 1, (n * 7) % 480 + 1, 3, "fake")


def extract_features(df: DataFrame, id_col: str, binary_col: str) -> DataFrame:
    """Per-payload metadata via mapInPandas (one Arrow batch at a time —
    bounded memory regardless of payload sizes). Undecodable payloads get
    NULL dimensions instead of failing the job; a NULL payload keeps
    n_bytes/content_md5 NULL too (a MISSING document must not share
    md5(b'') with a genuinely empty one), and a NULL id passes through as
    NULL instead of crashing int(NaN)."""
    idc, binc = id_col, binary_col

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf[idc], pdf[binc]):
                did = None if pd.isna(doc_id) else int(doc_id)
                if data is None:
                    rows.append((did, None, None, None, None, None, None))
                    continue
                data = bytes(data)
                md5 = hashlib.md5(data).hexdigest()
                try:
                    w, h, c, fmt = _decode_stub(data)
                except ValueError:
                    w = h = c = None
                    fmt = None
                rows.append((did, len(data), md5, w, h, c, fmt))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_bytes", "content_md5", "width", "height", "channels", "format"],
            )

    return df.select(F.col(idc), F.col(binc)).mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(df: DataFrame, id_col: str, binary_col: str, k: int = 4) -> DataFrame:
    """Sample k evenly-spaced 'frames' per payload (video-style). The
    frame extraction is stubbed to a byte-offset slice hash; the row
    explosion + Arrow plumbing is the real pattern."""
    idc, binc = id_col, binary_col

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf[idc], pdf[binc]):
                data = bytes(data) if data is not None else b""
                if not data:
                    continue
                n = len(data)
                for i in range(k):
                    off = (i * n) // k
                    sl = data[off : off + 16]
                    rows.append((int(doc_id), i, off, hashlib.md5(sl).hexdigest()))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_offset", "frame_md5"])

    return df.select(F.col(idc), F.col(binc)).mapInPandas(run, FRAME_SCHEMA)


def with_fake_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Derive a deterministic binary payload column from text (testing aid:
    the sandbox tables carry no real image bytes)."""
    return df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )
