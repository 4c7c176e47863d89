"""Batch samplers — the reference's sampling operators re-expressed as
pure Column predicates (split_and_sample/sparkdf_data_sampler.py:35-203).

The reference's hash sampler used a per-row Python md5 UDF
(sparkdf_data_sampler.py:163-203); here it is engine-native xxhash64 —
same semantics (deterministic pseudo-random membership), zero Python.
All samplers are predicates, so they push into the scan and compose with
splitters and row_conditions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sample_limit(df: DataFrame, n: int) -> DataFrame:
    """reference: _sample_using_limit (df.limit)."""
    return df.limit(n)


def sample_random(df: DataFrame, p: float, seed: int = 42) -> DataFrame:
    """reference: _sample_using_random (F.rand(seed) < p)."""
    return df.where(F.rand(seed) < p)


def sample_mod(df: DataFrame, column: str, mod: int, value: int) -> DataFrame:
    """reference: _sample_using_mod (column % mod == value)."""
    return df.where((F.col(column) % mod) == value)


def sample_value_list(df: DataFrame, column: str, values: list) -> DataFrame:
    """reference: _sample_using_a_list (column isin values)."""
    return df.where(F.col(column).isin(values))


def hash_bucket_predicate(column: str, buckets: int, keep: int, seed: int = 0) -> Column:
    """Deterministic hash-membership predicate (reference's
    _sample_using_hash, md5-UDF-free): keeps rows whose
    xxhash64(column) bucket equals ``keep``. Stable across runs and
    cluster layouts — the reproducible big-data sampling primitive."""
    return F.pmod(F.xxhash64(F.col(column), F.lit(seed)), F.lit(buckets)) == keep


def sample_hash(df: DataFrame, column: str, buckets: int = 100, keep: int = 0,
                seed: int = 0) -> DataFrame:
    return df.where(hash_bucket_predicate(column, buckets, keep, seed))
