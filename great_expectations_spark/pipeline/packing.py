"""Sequence packing: assemble documents into fixed token-budget training
sequences, deterministically and in parallel.

Training pipelines concatenate documents into fixed-length sequences
("sample packing") to avoid padding waste. At corpus scale the packing must
be (a) parallel — no global order, (b) deterministic — same doc lands in
the same pack on every run and engine, and (c) skew-free. This module uses
bucketed greedy packing:

    bucket  = md5(key) mod ``buckets``          (uniform, deterministic)
    order   = by key within the bucket
    pack    = floor(exclusive-prefix-sum(size) / budget) within the bucket

i.e. ONE hash-partitioned shuffle + ONE in-partition window per bucket.
Every step is engine-portable integer arithmetic (the DuckDB oracle replays
it with the same window), and bucket counts scale with the cluster — each
bucket's window is independent, so 10^12 docs pack as ``buckets`` parallel
streams with no global sort.

Packing semantics (documented contract, standard practice):
  * ``budget`` is a soft cap: the document that crosses a pack boundary
    stays in the pack it started in, so a pack can overflow by less than
    one document; consumers truncate or wrap at tokenization time.
  * A document longer than ``budget`` gets its own pack span (subsequent
    documents skip ahead — pack ids within a bucket may have gaps).
  * ``pack_offset`` is the raw prefix-sum residue ``before mod budget``.
    It equals the in-pack token offset for every gap-free pack; the first
    document AFTER an oversized document inherits a non-zero residue even
    though it opens its pack — consumers needing a zero-based offset there
    subtract the pack's min offset (one extra window).
  * NULL or non-positive sizes are invalid input; with ``validate`` on
    (default) an inline guard fails the packing job on the first bad row —
    no extra scan.

The reference has no packing operator; this belongs to the training-data
addendum alongside dedup/sampling/quality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from great_expectations_spark.pipeline.dedup import _md5_int

__all__ = ["pack_sequences", "pack_stats"]

# pack_id = bucket * 2^40 + local pack index: collision-free for any corpus
# whose per-bucket token total stays under budget * 2^40.
_PACK_STRIDE = 1 << 40


def pack_sequences(
    df: DataFrame,
    size_col: str,
    budget: int,
    key_col: str,
    buckets: int = 1024,
    validate: bool = True,
) -> DataFrame:
    """Assign every document a deterministic ``pack_id`` plus
    ``pack_offset``, the prefix-sum residue (see module contract — equals
    the in-pack token offset except right after an oversized-doc gap).

    One shuffle (hash on bucket) + one window per bucket. ``buckets``
    bounds parallelism — size it ≥ cluster cores; each bucket packs
    ~1/buckets of the corpus independently.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    max_buckets = (2**63 - 1) // _PACK_STRIDE
    if not 0 < buckets <= max_buckets:
        raise ValueError(
            f"buckets must be in (0, {max_buckets}] so pack_id = bucket * 2^40 "
            "+ local index stays inside int64"
        )
    size = F.col(size_col)
    if validate:
        # inline guard — no extra scan: the packing job itself fails fast on
        # the first NULL/non-positive size it reads
        size = F.when(
            size.isNull() | (size <= 0),
            F.raise_error(
                F.lit(f"pack_sequences: {size_col} must be positive and non-null")
            ).cast(df.schema[size_col].dataType),
        ).otherwise(size)
    bucket = F.pmod(_md5_int(F.col(key_col).cast("string")), F.lit(buckets))
    w = (
        Window.partitionBy("__bucket")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        df.withColumn("__bucket", bucket)
        .withColumn("__before", F.coalesce(F.sum(size).over(w), F.lit(0)).cast("long"))
        .withColumn(
            "pack_id",
            (F.col("__bucket").cast("long") * _PACK_STRIDE
             + F.floor(F.col("__before") / budget)).alias("pack_id"),
        )
        .withColumn("pack_offset", F.pmod(F.col("__before"), F.lit(budget)))
    )
    return out.drop("__bucket", "__before")


def pack_stats(packed: DataFrame, size_col: str, budget: int) -> DataFrame:
    """Per-pack summary of a ``pack_sequences`` result: document count,
    token total, and fill ratio (can exceed 1 — soft-cap overflow).
    One groupBy over pack_id."""
    return packed.groupBy("pack_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(size_col).cast("long").alias("total_tokens"),
        (F.sum(size_col) / F.lit(float(budget))).alias("fill_ratio"),
    )
