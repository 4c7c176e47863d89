"""Streaming deduplication — the Structured-Streaming twin of
``pipeline/dedup.py`` for continuously-ingested web corpora.

State discipline at 10^12-scale ingest: ``dropDuplicatesWithinWatermark``
keeps one state entry per key only until the event-time watermark passes
``delay`` — state is bounded by (arrival rate × delay), never by corpus
size. Content dedup stores a 16-byte digest, not the document."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    stream_df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    delay: str = "10 minutes",
) -> DataFrame:
    """Pass each key through once per watermark window. Duplicates that
    arrive within ``delay`` of the first sighting are dropped; state for
    keys older than the watermark is evicted (bounded memory)."""
    return stream_df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def streaming_content_dedup(
    stream_df: DataFrame,
    content_col: str,
    ts_col: str,
    delay: str = "10 minutes",
) -> DataFrame:
    """Exact content dedup on a streaming corpus: state carries ONLY the
    16-byte md5 digest per document (the same digest-not-payload shuffle
    discipline as the batch ``exact_dedup`` in pipeline/dedup.py)."""
    digested = stream_df.withColumn(
        "__digest", F.md5(F.col(content_col).cast("binary"))
    )
    return (
        digested.withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(["__digest"])
        .drop("__digest")
    )
