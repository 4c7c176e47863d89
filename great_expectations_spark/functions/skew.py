"""Skew-aware aggregation helpers (north rule: salted-key repartitioning
for url/lang skew).

Plain ``groupBy(key).agg(...)`` already does map-side partial aggregation,
which neutralizes skew for algebraic aggregates (count/sum/min/max) — the
hot key reaches the reducer as ONE partial row per map task. Salting is
needed when the per-key state is NOT compactable map-side:

  * ``collect_set``/``collect_list`` per key (set grows with group size)
  * exact ``countDistinct(key, col)`` (expanded row explosion)
  * windows ``over (partition by key)`` — the reference's uniqueness
    implementation (column_values_unique.py:79-84), which this engine
    already avoids

``salted_group_agg`` implements the standard two-stage pattern: stage 1
groups by (key, salt) — the hot key splits across ``salt`` reducers —
stage 2 merges the per-salt partials by key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int = 16, col_name: str = "__salt") -> DataFrame:
    """Row salt in [0, buckets) from the row's POSITION (partition-local
    id), not its content — content-derived salts send byte-identical rows
    (duplicated pages, pre-projected key columns) to the SAME salt bucket,
    re-creating the hotspot salting exists to break. Position salts spread
    every key uniformly; the salt value itself never reaches results (the
    stage-2 merge removes it), so replay stability of the VALUES is moot.
    """
    return df.withColumn(
        col_name, F.pmod(F.monotonically_increasing_id(), F.lit(buckets))
    )


def salted_group_agg(
    df: DataFrame,
    key_cols: list[str],
    partial_aggs: Callable[[], list[Column]],
    merge_aggs: Callable[[], list[Column]],
    buckets: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``partial_aggs()`` builds the stage-1 aggregate columns (aliased),
    ``merge_aggs()`` the stage-2 merge over those aliases. Example —
    skew-safe distinct-count per key::

        salted_group_agg(
            df, ["lang"],
            lambda: [F.collect_set("url").alias("s")],
            lambda: [F.size(F.array_distinct(F.flatten(F.collect_list("s")))).alias("n")],
        )
    """
    salted = with_salt(df, buckets)
    stage1 = salted.groupBy(*key_cols, "__salt").agg(*partial_aggs())
    return stage1.groupBy(*key_cols).agg(*merge_aggs())


def skew_safe_value_counts(df: DataFrame, column: str, buckets: int = 16) -> DataFrame:
    """Per-value counts that survive a hot value: counts are algebraic so
    this is equivalent to a plain groupBy — provided as the template
    pattern (and for engines with map-side combine disabled)."""
    return salted_group_agg(
        df.where(F.col(column).isNotNull()),
        [column],
        lambda: [F.count(F.lit(1)).alias("__partial")],
        lambda: [F.sum("__partial").alias("n")],
        buckets,
    )
