"""Structured Streaming validation.

The reference is strictly batch (SURVEY.md §1); streams are this engine's
extension for continuously-arriving web crawl data. Two shapes:

  * ``validate_stream`` — full expectation suites per micro-batch via
    ``foreachBatch``: each micro-batch is a checkpoint chunk
    (chunk_id = batch id), appended to the same results table as batch
    runs, so one dashboard reads both.
  * ``windowed_condition_rates`` — pure streaming aggregation (watermark +
    tumbling window) of map-condition pass rates: no foreachBatch, fully
    incremental state, for always-on drift monitors.
"""

from great_expectations_spark.streaming.dedup_stream import (
    streaming_content_dedup,
    streaming_exact_dedup,
)
from great_expectations_spark.streaming.stateful import cumulative_condition_rate
from great_expectations_spark.streaming.validate_stream import (
    validate_stream,
    validate_stream_by,
    windowed_condition_rates,
    windowed_kl_drift,
)

__all__ = [
    "validate_stream",
    "validate_stream_by",
    "windowed_condition_rates",
    "windowed_kl_drift",
    "cumulative_condition_rate",
    "streaming_exact_dedup",
    "streaming_content_dedup",
]
