"""Basic column profiler: one fused scan -> per-column profile rows.

Reference: profile/basic_dataset_profiler.py:33-91 classifies each column
(cardinality band, type) by issuing many per-metric jobs through the
validator. This profiler computes the same facts — type, null fraction,
approx cardinality + band, min/max/mean/stddev for numerics, length
stats for strings — for EVERY column in ONE ``df.agg`` pass (plus zero
extra jobs), then emits a tidy DataFrame.

Use it to bootstrap a suite: ``suggest_suite`` turns a profile into the
obvious expectations (not_null for near-complete columns, in_set for
low-cardinality, between for numerics), mirroring the reference's
BasicSuiteBuilderProfiler intent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DateType,
    NumericType,
    StringType,
    TimestampType,
)

from great_expectations_spark.core.suite import ExpectationSuite

# reference cardinality bands (basic_dataset_profiler.py: _get_column_cardinality)
_BANDS = [(1, "one"), (2, "two"), (20, "very_few"), (60, "few"),
          (1000, "many"), (10000, "very_many"), (float("inf"), "unique_or_more")]


def _band(n: int, total: int) -> str:
    if total and n >= total * 0.95:
        return "unique"
    for lim, name in _BANDS:
        if n <= lim:
            return name
    return "unique_or_more"


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One fused scan; returns a DataFrame with one row per column:
    (column, dtype, kind, n_rows, n_null, null_fraction, approx_distinct,
    cardinality_band, min, max, mean, stddev, min_len, max_len, avg_len)."""
    spark = df.sparkSession
    fields = [f for f in df.schema.fields if columns is None or f.name in columns]

    aggs = [F.count(F.lit(1)).alias("__n")]
    for f in fields:
        c, name = F.col(f.name), f.name
        aggs.append(F.sum(F.when(c.isNull(), 1).otherwise(0)).alias(f"{name}__null"))
        if not isinstance(f.dataType, BinaryType):
            aggs.append(F.approx_count_distinct(c).alias(f"{name}__card"))
        if isinstance(f.dataType, NumericType):
            aggs.extend([
                F.min(c).cast("double").alias(f"{name}__min"),
                F.max(c).cast("double").alias(f"{name}__max"),
                F.mean(c).cast("double").alias(f"{name}__mean"),
                F.stddev_samp(c).cast("double").alias(f"{name}__std"),
            ])
        elif isinstance(f.dataType, (TimestampType, DateType)):
            aggs.extend([
                F.min(c).cast("string").alias(f"{name}__tmin"),
                F.max(c).cast("string").alias(f"{name}__tmax"),
            ])
        elif isinstance(f.dataType, StringType):
            aggs.extend([
                F.min(F.length(c)).cast("double").alias(f"{name}__lmin"),
                F.max(F.length(c)).cast("double").alias(f"{name}__lmax"),
                F.avg(F.length(c)).cast("double").alias(f"{name}__lavg"),
            ])
        elif isinstance(f.dataType, BinaryType):
            aggs.extend([
                F.min(F.octet_length(c)).cast("double").alias(f"{name}__lmin"),
                F.max(F.octet_length(c)).cast("double").alias(f"{name}__lmax"),
                F.avg(F.octet_length(c)).cast("double").alias(f"{name}__lavg"),
            ])
    row = df.agg(*aggs).first()
    n = row["__n"]

    def kind(dt) -> str:
        if isinstance(dt, NumericType):
            return "numeric"
        if isinstance(dt, (TimestampType, DateType)):
            return "datetime"
        if isinstance(dt, BooleanType):
            return "boolean"
        if isinstance(dt, BinaryType):
            return "binary"
        if isinstance(dt, StringType):
            return "string"
        return "other"

    out = []
    for f in fields:
        name = f.name
        nn = int(row[f"{name}__null"] or 0)
        card = int(row[f"{name}__card"]) if f"{name}__card" in row.asDict() else None
        out.append({
            "column": name,
            "dtype": f.dataType.simpleString(),
            "kind": kind(f.dataType),
            "n_rows": n,
            "n_null": nn,
            "null_fraction": round(nn / n, 6) if n else None,
            "approx_distinct": card,
            "cardinality_band": _band(card, n - nn) if card is not None else None,
            "min": row.asDict().get(f"{name}__min"),
            "max": row.asDict().get(f"{name}__max"),
            "mean": row.asDict().get(f"{name}__mean"),
            "stddev": row.asDict().get(f"{name}__std"),
            "min_ts": row.asDict().get(f"{name}__tmin"),
            "max_ts": row.asDict().get(f"{name}__tmax"),
            "min_len": row.asDict().get(f"{name}__lmin"),
            "max_len": row.asDict().get(f"{name}__lmax"),
            "avg_len": row.asDict().get(f"{name}__lavg"),
        })
    schema = (
        "column string, dtype string, kind string, n_rows long, n_null long, "
        "null_fraction double, approx_distinct long, cardinality_band string, "
        "min double, max double, mean double, stddev double, "
        "min_ts string, max_ts string, min_len double, max_len double, avg_len double"
    )
    return spark.createDataFrame(out, schema)


def suggest_suite(df: DataFrame, name: str = "profiled", null_tolerance: float = 0.05,
                  set_cardinality_max: int = 20) -> ExpectationSuite:
    """Bootstrap a suite from a profile (BasicSuiteBuilderProfiler-style).

    Exactly TWO scans regardless of column count: the fused ``profile``
    pass, then ONE fused bounded ``collect_set`` job for every
    low-cardinality column at once (not one distinct().collect() per
    column — that's N extra full scans at crawl scale). The collect is
    sliced at cap+1 so an approx_count_distinct underestimate can't pull
    an unbounded set onto the driver; overflow falls back to a range
    expectation for numerics and is skipped otherwise.
    """
    prof = {r.column: r for r in profile(df).collect()}
    suite = ExpectationSuite(name=name)
    suite.add("expect_table_columns_to_match_set", column_set=list(prof))
    suite.add("expect_table_row_count_to_be_between",
              min_value=max(int(next(iter(prof.values())).n_rows * 0.5), 1))
    set_candidates = [
        col for col, r in prof.items()
        if (r.approx_distinct is not None and r.approx_distinct <= set_cardinality_max
            and r.kind in ("string", "boolean", "numeric"))
    ]
    value_sets: dict[str, list] = {}
    if set_candidates:
        row = df.agg(*[
            F.slice(F.collect_set(F.col(c)), 1, set_cardinality_max + 1).alias(c)
            for c in set_candidates
        ]).first()
        value_sets = {c: row[c] for c in set_candidates}
    for col, r in prof.items():
        if r.null_fraction is not None and r.null_fraction <= null_tolerance:
            suite.add("expect_column_values_to_not_be_null", column=col,
                      mostly=max(0.0, round(1 - max(r.null_fraction * 2, 0.01), 4)))
        values = value_sets.get(col)
        if values is not None and len(values) <= set_cardinality_max:
            suite.add("expect_column_values_to_be_in_set", column=col,
                      value_set=sorted(values, key=str), mostly=0.99)
        elif r.kind == "numeric" and r.min is not None and r.max is not None:
            span = (r.max - r.min) or 1.0
            suite.add("expect_column_values_to_be_between", column=col,
                      min_value=r.min - 0.5 * span, max_value=r.max + 0.5 * span,
                      mostly=0.99)
    return suite
