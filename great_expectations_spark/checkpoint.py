"""Checkpointed, resumable suite validation with per-partition lineage.

The north-rule production shape: a 10^12-row validation run must survive
preemption. The table is carved into chunks by a *splitter* (mirroring the
reference's batch splitters, split_and_sample/sparkdf_data_splitter.py:40-324);
each chunk is validated by the fused single-pass validator and its
per-expectation results are APPENDED to a results table keyed
``(run_id, chunk_id)`` together with lineage (predicate, rows, wall time).
Re-running the same ``run_id`` skips chunks already present — resume is a
read of the results table, not a recomputation.

Scale notes:
  * When the splitter column matches the physical table partitioning
    (e.g. Iceberg ``days(warc_ts)``), each chunk's ``df.filter`` prunes to
    its own files — chunks never rescan the table.
  * Map-expectation counts are commutative monoids: the suite-level
    verdict is re-derived exactly from per-chunk sums (``rollup``).
    Aggregate expectations (mean/quantiles/...) are chunk-scoped —
    flagged ``chunk_scoped`` in the rollup rather than merged wrongly.
  * The results table is itself a DataFrame append per chunk — on a real
    cluster an Iceberg table with (run_id, chunk_id) partitioning.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from great_expectations_spark.core.suite import ExpectationSuite
from great_expectations_spark.validator import validate

RESULTS_SCHEMA = (
    "run_id string, chunk_id string, chunk_predicate string, "
    "expectation_index int, expectation_type string, kwargs_json string, "
    "success boolean, element_count long, missing_count long, "
    "unexpected_count long, observed_value_json string, "
    "raised_exception boolean, rows_scanned long, wall_time_s double, "
    "finished_at double"
)

# map-style expectations whose (element/missing/unexpected) counts merge as
# commutative monoids across chunks
_COUNT_KEYS = ("element_count", "missing_count", "unexpected_count")


@dataclass
class Splitter:
    """Chunk definition: name + list of (chunk_id, predicate Column) pairs."""

    name: str
    chunks: list[tuple[str, Any]]  # (chunk_id, Column predicate)

    @staticmethod
    def column_value(df: DataFrame, column: str, max_chunks: int = 1000) -> "Splitter":
        """One chunk per distinct value (incl. NULL) — the reference's
        ``split_on_column_value``. Distinct values are collected once."""
        vals = [r[0] for r in df.select(column).distinct().limit(max_chunks + 1).collect()]
        if len(vals) > max_chunks:
            raise ValueError(f"column {column} has >{max_chunks} distinct values")
        chunks = []
        for v in sorted((v for v in vals if v is not None), key=str):
            chunks.append((f"{column}={v}", F.col(column).eqNullSafe(F.lit(v))))
        if any(v is None for v in vals):
            chunks.append((f"{column}=__null__", F.col(column).isNull()))
        return Splitter(f"column_value({column})", chunks)

    @staticmethod
    def hashed_column(column: str, n: int) -> "Splitter":
        """n hash buckets of a column — the reference's
        ``split_on_hashed_column``, xxhash64-based (engine-native, no UDF)."""
        chunks = [
            (f"hash({column})%{n}={i}", F.pmod(F.xxhash64(F.col(column)), F.lit(n)) == i)
            for i in range(n)
        ]
        return Splitter(f"hashed_column({column},{n})", chunks)

    @staticmethod
    def date_part(column: str, part: str, values: list[int]) -> "Splitter":
        """Date-part chunks (year/month/day...) — reference's date splitters;
        aligns with Iceberg partition transforms for file pruning."""
        fn = {"year": F.year, "month": F.month, "day": F.dayofmonth, "hour": F.hour}[part]
        chunks = [(f"{part}({column})={v}", fn(F.col(column)) == v) for v in values]
        return Splitter(f"date_part({part},{column})", chunks)


@dataclass
class CheckpointResult:
    run_id: str
    completed_chunks: list[str]
    skipped_chunks: list[str]
    results_df: DataFrame

    def rollup(self) -> DataFrame:
        """Suite-level verdict per expectation, merged across chunks.

        Count metrics sum exactly (monoid); success is re-derived as
        all-chunks-succeeded AND no exceptions. ``chunk_scoped`` marks
        expectations whose observed value cannot be merged (aggregates).
        """
        r = self.results_df.where(F.col("run_id") == self.run_id)
        return (
            r.groupBy("expectation_index", "expectation_type", "kwargs_json")
            .agg(
                F.count(F.lit(1)).alias("n_chunks"),
                F.min(F.col("success").cast("int")).cast("boolean").alias("success"),
                *[F.sum(k).alias(k) for k in _COUNT_KEYS],
                F.max(F.col("raised_exception").cast("int")).cast("boolean").alias(
                    "raised_exception"
                ),
                F.max(F.when(F.col("observed_value_json").isNotNull(), 1).otherwise(0))
                .cast("boolean")
                .alias("chunk_scoped"),
            )
            .orderBy("expectation_index")
        )


def run_checkpoint(
    df: DataFrame,
    suite: ExpectationSuite,
    splitter: Splitter,
    results_path: str,
    run_id: str,
    result_format: Any = "BOOLEAN_ONLY",
    tables: dict[str, DataFrame] | None = None,
    on_chunk: Callable[[str, float], None] | None = None,
) -> CheckpointResult:
    """Validate ``df`` chunk-by-chunk, appending per-chunk EVR rows to the
    parquet results table at ``results_path``; chunks already recorded for
    this ``run_id`` are skipped (resume)."""
    spark = df.sparkSession

    done: set[str] = set()
    try:
        existing = spark.read.parquet(results_path)
        done = {
            r.chunk_id
            for r in existing.where(F.col("run_id") == run_id).select("chunk_id").distinct().collect()
        }
    except Exception:
        existing = None  # first run: no results table yet

    completed, skipped = [], []
    for chunk_id, pred in splitter.chunks:
        if chunk_id in done:
            skipped.append(chunk_id)
            continue
        t0 = time.time()
        chunk_df = df.where(pred)
        result = validate(chunk_df, suite, result_format=result_format, tables=tables)
        wall = time.time() - t0
        rows = []
        for i, evr in enumerate(result.results):
            res = evr.result
            rows.append(
                (
                    run_id,
                    chunk_id,
                    str(pred._jc if hasattr(pred, "_jc") else pred),
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
        completed.append(chunk_id)
        if on_chunk:
            on_chunk(chunk_id, wall)

    return CheckpointResult(
        run_id=run_id,
        completed_chunks=completed,
        skipped_chunks=skipped,
        results_df=spark.read.parquet(results_path),
    )
