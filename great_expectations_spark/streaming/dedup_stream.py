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
    keys older than the watermark is evicted (bounded memory).

    Rows with a NULL in any key column carry no dedup signal and pass
    through UNCHANGED — dropDuplicatesWithinWatermark groups NULL keys as
    equal, which would silently collapse all of them into one row (the
    batch twin ``exact_dedup`` passes NULL rows through too)."""
    any_null = None
    for c in key_cols:
        n = F.col(c).isNull()
        any_null = n if any_null is None else (any_null | n)
    marked = stream_df.withWatermark(ts_col, delay)
    deduped = marked.where(~any_null).dropDuplicatesWithinWatermark(list(key_cols))
    return deduped.unionByName(marked.where(any_null))


def streaming_content_dedup(
    stream_df: DataFrame,
    content_col: str,
    ts_col: str,
    delay: str = "10 minutes",
) -> DataFrame:
    """Exact content dedup on a streaming corpus: state carries ONLY the
    16-byte md5 digest per document (the same digest-not-payload shuffle
    discipline as the batch ``exact_dedup`` in pipeline/dedup.py).
    NULL-content rows pass through unchanged (md5(NULL) is NULL — the
    dedup state would otherwise treat every missing document as a copy of
    the first one)."""
    marked = stream_df.withWatermark(ts_col, delay)
    nonnull = F.col(content_col).isNotNull()
    deduped = (
        marked.where(nonnull)
        .withColumn("__digest", F.md5(F.col(content_col).cast("binary")))
        .dropDuplicatesWithinWatermark(["__digest"])
        .drop("__digest")
    )
    return deduped.unionByName(marked.where(~nonnull))
