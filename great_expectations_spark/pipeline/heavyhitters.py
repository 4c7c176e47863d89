"""Heavy hitters + count-min sketch over crawl-scale columns.

The north-star profile (BASELINE.json) names "count-min for heavy
hitters ... merged via commutative monoid aggregation". Two operators:

  * ``count_min_table`` / ``count_min_build`` — a count-min sketch as a
    PURE DataFrame plan: each row contributes ``depth`` (row-of-sketch,
    bucket) pairs via JVM-side hashing (xxhash64, or md5 in the
    cross-engine-replayable mode); ``groupBy(j, bucket).count()`` IS the
    commutative monoid merge — Catalyst's map-side HashAggregate builds
    each partition's sketch and the shuffle reduces them, so at most
    ``depth × width`` rows per partition ever move. No Python runs at all.
  * ``heavy_hitters`` — EXACT frequent values (count ≥ fraction·n) in two
    scans: per-partition Misra-Gries summaries via ``mapInPandas`` (Arrow
    batches; Python cost is per DISTINCT value per batch, never per row)
    give a guaranteed candidate superset — a value absent from every
    partition summary has total count < n/(k+1) ≤ fraction·n/2 — then one
    bounded ``isin`` + groupBy computes exact counts for candidates only.
    Nothing with the full column cardinality is ever shuffled or
    collected, unlike a naive ``groupBy(col).count()`` top-k.

Reference: the reference exposes value_counts / most_common_value
(metrics/column_aggregate_metrics) but has no sub-linear-memory frequent
-items path; this is the engine's scale extension (Misra-Gries 1982 /
Cormode-Muthukrishnan count-min, both public algorithms).
"""

from __future__ import annotations

import math
from typing import Any, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["CountMinSketch", "count_min_table", "count_min_build", "heavy_hitters"]


def _bucket(c: Column, j: int, width: int, hash_mode: str) -> Column:
    """Bucket index of value ``c`` under the j-th hash row, JVM-side."""
    if hash_mode == "xxhash64":
        return F.pmod(F.xxhash64(F.lit(j), c), F.lit(width))
    if hash_mode == "md5":
        # engine-portable: DuckDB ('0x' || substr(md5(j || ':' || v),1,15))::BIGINT % width
        h = F.conv(
            F.substring(F.md5(F.encode(F.concat(F.lit(f"{j}:"), c.cast("string")), "UTF-8")), 1, 15),
            16, 10,
        ).cast("long")
        return F.pmod(h, F.lit(width))
    raise ValueError(f"unknown hash_mode {hash_mode!r} (use 'xxhash64' or 'md5')")


def count_min_table(
    df: DataFrame, column: str, depth: int = 5, width: int = 2048,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """The distributed count-min sketch as a (j, bucket, cnt) DataFrame.

    One whole-stage-codegen scan: explode each non-null value into its
    ``depth`` bucket coordinates, then count per coordinate. Map-side
    partial aggregation bounds the shuffle at depth×width rows/partition
    regardless of data size; summing two such tables elementwise is the
    sketch monoid merge (what the shuffle reduce already does).
    """
    c = F.col(column)
    pairs = df.where(c.isNotNull()).select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).cast("int").alias("j"),
                    _bucket(c, j, width, hash_mode).alias("bucket"),
                )
                for j in range(depth)
            ])
        ).alias("p")
    )
    return pairs.groupBy(F.col("p.j").alias("j"), F.col("p.bucket").alias("bucket")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


class CountMinSketch:
    """Driver-side query handle over a merged count-min table.

    ``table`` is depth×width int64; ``estimate`` upper-bounds true counts
    (min over rows), with the usual CM guarantee: overestimate ≤ e/width ×
    total with prob ≥ 1 - e^-depth per query.
    """

    def __init__(self, depth: int, width: int, table: np.ndarray, total: int,
                 hash_mode: str):
        self.depth, self.width, self.table = depth, width, table
        self.total, self.hash_mode = total, hash_mode

    def estimate(self, spark: SparkSession, values: list[Any]) -> dict[Any, int]:
        """Point estimates for ``values`` — one tiny job to compute the
        same JVM-side hashes used at build time (never reimplemented in
        Python, so build and query can't drift)."""
        vdf = spark.createDataFrame([(v,) for v in values], ["v"])
        rows = vdf.select(
            "v", *[_bucket(F.col("v"), j, self.width, self.hash_mode).alias(f"b{j}")
                   for j in range(self.depth)]
        ).collect()
        return {
            r["v"]: int(min(self.table[j, r[f"b{j}"]] for j in range(self.depth)))
            for r in rows
        }


def count_min_build(
    df: DataFrame, column: str, depth: int = 5, width: int = 2048,
    hash_mode: str = "xxhash64",
) -> CountMinSketch:
    """Materialize the sketch driver-side (≤ depth×width longs)."""
    table = np.zeros((depth, width), dtype=np.int64)
    for r in count_min_table(df, column, depth, width, hash_mode).collect():
        table[r["j"], r["bucket"]] = r["cnt"]
    return CountMinSketch(depth, width, table, int(table[0].sum()), hash_mode)


def _mg_summaries(column: str, k: int):
    """Per-partition Misra-Gries via Arrow batches. Emits (value, cnt)
    summary rows plus one (null, n_partition) row for the total."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[Any, int] = {}
        n_part = 0
        for pdf in batches:
            n_part += len(pdf)
            vc = pdf[column].value_counts(dropna=True)  # vectorized C path
            for v, cnt in vc.items():
                counters[v] = counters.get(v, 0) + int(cnt)
            if len(counters) > k:
                # batch MG decrement: subtract the (len-k)-th smallest
                # count from everyone, drop the non-positive
                counts = np.fromiter(counters.values(), dtype=np.int64)
                d = int(np.partition(counts, len(counts) - k - 1)[len(counts) - k - 1])
                counters = {v: c - d for v, c in counters.items() if c > d}
        rows = [(v, c) for v, c in counters.items()]
        rows.append((None, n_part))
        yield pd.DataFrame(rows, columns=["value", "cnt"])

    return fn


def heavy_hitters(
    df: DataFrame, column: str, min_fraction: float,
    candidate_cap: int = 100_000,
) -> DataFrame:
    """EXACT values with count ≥ ceil(min_fraction × n_rows), two scans.

    Returns (value, cnt, fraction) — fraction = round(cnt / n_rows, 6).
    Raises if the Misra-Gries candidate set exceeds ``candidate_cap``
    (loud failure instead of a silent unbounded driver collect).
    """
    if not 0.0 < min_fraction <= 1.0:
        raise ValueError("min_fraction must be in (0, 1]")
    dtype = df.schema[column].dataType.simpleString()
    k = max(8, math.ceil(2.0 / min_fraction))
    # project to the one needed column BEFORE mapInPandas — Arrow would
    # otherwise serialize every column of every row to the Python workers
    summaries = df.select(column).mapInPandas(
        _mg_summaries(column, k), schema=f"value {dtype}, cnt long"
    )
    # +2, not +1: the null total-count row (cnt = n, the max) always
    # occupies one slot of the limit, so cap+2 guarantees both the marker
    # row and cap+1 candidates survive, keeping the overflow check live
    merged = (
        summaries.groupBy("value").agg(F.sum("cnt").alias("cnt"))
        .orderBy(F.desc("cnt"))
        .limit(candidate_cap + 2)
        .collect()
    )
    n_rows = sum(int(r["cnt"]) for r in merged if r["value"] is None)
    candidates = [r["value"] for r in merged if r["value"] is not None]
    if len(candidates) > candidate_cap:
        raise ValueError(
            f"heavy_hitters candidate set exceeds cap {candidate_cap}; "
            f"raise min_fraction or candidate_cap"
        )
    threshold = math.ceil(min_fraction * n_rows)
    if not candidates or n_rows == 0:
        return df.sparkSession.createDataFrame(
            [], f"value {dtype}, cnt long, fraction double"
        )
    c = F.col(column)
    if len(candidates) <= 1_000:
        filtered = df.where(c.isin(candidates))
    else:
        # large candidate sets would bloat the plan as an IN-list literal;
        # broadcast semi-join keeps the filter map-side with no shuffle
        cand_df = df.sparkSession.createDataFrame(
            [(v,) for v in candidates], f"value {dtype}"
        )
        filtered = df.join(
            F.broadcast(cand_df), on=c == F.col("value"), how="leftsemi"
        )
    return (
        filtered.groupBy(c.alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= F.lit(threshold))
        .select(
            "value", "cnt",
            F.round(F.col("cnt").cast("double") / F.lit(float(n_rows)), 6).alias("fraction"),
        )
    )
