"""Suite-as-filter: run row-level expectations as a corpus cleaning pass.

Validation answers "is this table healthy?"; a training-data pipeline also
needs the complement: "give me the rows that ARE healthy, and tell me why
the rest were dropped". This module reuses the compiler's map kernels
(``plans/compiler.py`` / ``functions/conditions.py``) so the filter
semantics are BY CONSTRUCTION identical to validation: a row is rejected
by an expectation exactly when that expectation would count it as
unexpected (domain included and condition false). Missing-domain rows
(e.g. a null column under a non-null-domain kernel) are NOT rejections —
nullness is only a rejection under an explicit
``expect_column_values_to_not_be_null``.

Scale notes (100 TB / 10^12 docs):
  * ``annotate_suite``/``split_by_suite`` are pure Column projections —
    ONE whole-stage-codegen scan, zero shuffle, zero Python (unless a
    kernel itself is a pandas UDF, e.g. json_parseable — then Arrow
    batches). Filters compose with Catalyst: a downstream
    ``.where(passed)`` pushes nothing extra; partition pruning and
    column pruning still apply.
  * ``rejection_stats`` is ONE fused ``df.agg`` over conditional sums —
    the same single-pass monoid shape as the validator's pass 1.
  * mostly/aggregate/table-shape expectations are not row predicates;
    ``strict=True`` (default) raises on them so a suite with
    non-filterable expectations can't silently under-filter.

Reference: the reference has no suite-as-filter operator (its
``remove_expectations``/checkpoint actions operate on results, not rows);
this is the engine's training-data extension. The per-expectation
unexpected condition matches the reference's map semantics
(expectations/expectation.py _format_map_output; spark backend
sparkdf_execution_engine.py condition evaluation).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from great_expectations_spark.core.suite import (
    ExpectationConfiguration,
    ExpectationSuite,
)
from great_expectations_spark.plans.compiler import (
    CompileError,
    Options,
    compile_expectation,
)

__all__ = ["annotate_suite", "split_by_suite", "rejection_stats", "reason_label"]


def reason_label(config: ExpectationConfiguration) -> str:
    """Stable human-readable rejection reason: ``type(domain)``."""
    kw = config.kwargs
    dom = kw.get("column")
    if not dom:
        parts = [kw.get("column_A"), kw.get("column_B")]
        dom = ",".join([p for p in parts if p]) or ",".join(kw.get("column_list") or [])
    return f"{config.expectation_type}({dom})" if dom else config.expectation_type


def _row_predicates(
    suite: ExpectationSuite, options: Options, strict: bool
) -> list[tuple[str, Column]]:
    """(reason, row-fails-this-expectation Column) per map expectation."""
    out: list[tuple[str, Column]] = []
    seen: set[str] = set()
    for config in suite.expectations:
        compiled = compile_expectation(config, options)
        kernel = compiled.kernel
        if kernel is None:
            if strict:
                raise CompileError(
                    f"{config.expectation_type} is not a row-level expectation; "
                    "it cannot filter rows. Drop it from the filter suite or "
                    "call with strict=False to skip aggregate expectations."
                )
            continue
        reason = reason_label(config)
        if reason in seen:  # same type+domain twice: disambiguate by index
            reason = f"{reason}#{len(out)}"
        seen.add(reason)
        unexpected = kernel.include & F.coalesce(~kernel.ok, F.lit(False))
        out.append((reason, unexpected))
    return out


def annotate_suite(
    df: DataFrame,
    suite: ExpectationSuite,
    options: Options | None = None,
    failed_col: str = "failed_expectations",
    passed_col: str = "passed",
    strict: bool = True,
) -> DataFrame:
    """Original columns + ``failed_expectations: array<string>`` (reasons,
    suite order) + ``passed: boolean``. One codegen scan, no shuffle."""
    options = options or Options()
    preds = _row_predicates(suite, options, strict)
    failed = F.array_compact(
        F.array(*[F.when(cond, F.lit(reason)) for reason, cond in preds])
    ).cast("array<string>")
    return df.withColumn(failed_col, failed).withColumn(
        passed_col, F.size(F.col(failed_col)) == 0
    )


def split_by_suite(
    df: DataFrame,
    suite: ExpectationSuite,
    options: Options | None = None,
    strict: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """(kept, rejected): kept has the original schema; rejected carries the
    ``failed_expectations`` reasons column for triage/audit sinks."""
    ann = annotate_suite(df, suite, options=options, strict=strict)
    kept = ann.where(F.col("passed")).drop("failed_expectations", "passed")
    rejected = ann.where(~F.col("passed")).drop("passed")
    return kept, rejected


def rejection_stats(
    df: DataFrame,
    suite: ExpectationSuite,
    options: Options | None = None,
    strict: bool = True,
) -> DataFrame:
    """Per-reason rejection counts in ONE fused aggregation.

    Rows: one per map expectation (suite order) plus ``__any__`` (rows
    failing at least one) and ``__total__`` (row count). Columns:
    (reason, failed_count, failed_percent) — percent of the table's rows,
    6dp, matching the validator's unexpected_percent rounding convention.
    """
    options = options or Options()
    preds = _row_predicates(suite, options, strict)
    any_fail = None
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, (_, cond) in enumerate(preds):
        aggs.append(F.sum(F.when(cond, 1).otherwise(0)).alias(f"__f{i}"))
        any_fail = cond if any_fail is None else (any_fail | cond)
    if any_fail is not None:
        aggs.append(F.sum(F.when(any_fail, 1).otherwise(0)).alias("__any"))
    row = df.agg(*aggs).first()
    n = int(row["__n"])
    out: list[tuple[str, int]] = [
        (reason, int(row[f"__f{i}"] or 0)) for i, (reason, _) in enumerate(preds)
    ]
    out.append(("__any__", int(row["__any"] or 0) if preds else 0))
    out.append(("__total__", n))
    spark = df.sparkSession
    pct = lambda c: round(100.0 * c / n, 6) if n else None  # noqa: E731
    return spark.createDataFrame(
        [(r, c, pct(c)) for r, c in out],
        "reason string, failed_count long, failed_percent double",
    )
