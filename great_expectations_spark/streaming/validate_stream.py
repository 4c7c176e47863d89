"""Streaming validation: per-micro-batch suites and windowed condition rates."""

from __future__ import annotations

import json
import time
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from great_expectations_spark.checkpoint import RESULTS_SCHEMA
from great_expectations_spark.core.suite import ExpectationSuite
from great_expectations_spark.validator import validate


def validate_stream(
    stream_df: DataFrame,
    suite: ExpectationSuite,
    results_path: str,
    checkpoint_location: str,
    run_id: str = "stream",
    result_format: Any = "BOOLEAN_ONLY",
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """Validate each micro-batch with the fused validator and append one
    results row per expectation, keyed (run_id, chunk_id=batch-<id>).

    Exactly-once notes: Spark's streaming checkpoint (``checkpoint_location``)
    guarantees each batch id is processed at least once; replays overwrite
    nothing (append with batch id in chunk_id lets downstream dedup on
    (run_id, chunk_id, expectation_index) — same contract as batch resume).
    """
    spark = stream_df.sparkSession

    def process(batch_df: DataFrame, batch_id: int) -> None:
        t0 = time.time()
        result = validate(batch_df, suite, result_format=result_format)
        wall = time.time() - t0
        rows = []
        for i, evr in enumerate(result.results):
            res = evr.result
            rows.append(
                (
                    run_id,
                    f"batch-{batch_id}",
                    "streaming-micro-batch",
                    i,
                    evr.expectation_config.expectation_type,
                    json.dumps(evr.expectation_config.kwargs, sort_keys=True, default=str),
                    bool(evr.success),
                    res.get("element_count"),
                    res.get("missing_count"),
                    res.get("unexpected_count"),
                    json.dumps(res["observed_value"], default=str)
                    if "observed_value" in res
                    else None,
                    bool(evr.exception_info.get("raised_exception")),
                    res.get("element_count"),
                    round(wall, 4),
                    time.time(),
                )
            )
        spark.createDataFrame(rows, RESULTS_SCHEMA).coalesce(1).write.mode("append").parquet(
            results_path
        )

    writer = (
        stream_df.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_location)
        .foreachBatch(process)
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def windowed_condition_rates(
    stream_df: DataFrame,
    ts_col: str,
    conditions: dict[str, Column],
    window_seconds: int = 60,
    watermark_seconds: int = 120,
) -> DataFrame:
    """Incremental per-window pass rates for named boolean conditions.

    Pure streaming aggregation — conditional counts are commutative, state
    is one row per window, late data handled by the watermark. Feed any
    sink; join with thresholds downstream for alerting.

        rates = windowed_condition_rates(
            stream, "warc_ts",
            {"text_nonnull": F.col("text").isNotNull(),
             "lang_known": F.col("lang").isin("en", "de", "fr")})
    """
    aggs = [F.count(F.lit(1)).alias("element_count")]
    for name, cond in conditions.items():
        aggs.append(F.sum(F.when(cond, 1).otherwise(0)).alias(f"{name}__pass"))
    out = (
        stream_df.withWatermark(ts_col, f"{watermark_seconds} seconds")
        .groupBy(F.window(F.col(ts_col), f"{window_seconds} seconds").alias("w"))
        .agg(*aggs)
    )
    rate_cols = [
        (F.col(f"{name}__pass") / F.col("element_count")).alias(f"{name}__rate")
        for name in conditions
    ]
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "element_count",
        *[F.col(f"{n}__pass") for n in conditions],
        *rate_cols,
    )
