"""Suite → fused-plan compiler.

Each expectation compiles to a ``Compiled`` record declaring:
  * ``aggs``   — keyed aggregate Columns folded into ONE suite-wide
                 ``df.agg(...)`` (pass 1). Keys are metric ids; identical
                 keys across expectations are computed once (the metric-dedup
                 idea of the reference's ValidationGraph —
                 validator/validation_graph.py:96-100 — moved to plan time).
  * ``aggs2``  — second-wave aggregates whose expressions depend on wave-1
                 metric VALUES (z-scores need mean/std first; reference
                 resolves these as graph waves — validation_graph.py:325-347).
                 All wave-2 requests across the suite fuse into one more agg.
  * ``eager``  — metrics that need their own shaped job (groupBy uniqueness,
                 value counts, anti-joins). One job per request, but only for
                 expectations that actually need them.
  * ``finalize`` — driver-side math turning metric values into an EVR
                 (mostly-ratio: expectation.py:3576-3586; min/max bounds:
                 expectation.py:2339-2433).
  * ``kernel`` — the row-level condition for the violation pass (pass 2),
                 which runs per *violated* expectation only.

Unlike the reference (each eager metric = its own Spark action; dozens of
jobs per suite), a suite of N expectations here costs: 1 fused agg + 1
optional wave-2 agg + one job per uniqueness/referential/distribution-eager
expectation + one bounded job per violated map expectation.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Callable, Mapping

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from great_expectations_spark.core.result import ExpectationValidationResult as EVR
from great_expectations_spark.core.result_format import ResultFormat
from great_expectations_spark.core.suite import ExpectationConfiguration
from great_expectations_spark.functions import stats
from great_expectations_spark.functions.conditions import MAP_KERNELS, MapKernel


@dataclass
class Options:
    """Engine knobs. ``approx`` trades exactness for 100TB-scale sketches:
    countDistinct → approx_count_distinct (HLL++), exact percentile accuracy
    stays bounded. Tests run exact; bench runs approx."""

    approx_distinct: bool = False
    percentile_accuracy: int = 10000
    complete_list_cap: int = 100_000
    distinct_set_cap: int = 100_000


Metrics = Mapping[str, Any]


@dataclass
class Compiled:
    config: ExpectationConfiguration
    finalize: Callable[[Metrics], EVR]
    aggs: dict[str, Column] = field(default_factory=dict)
    aggs2: Callable[[Metrics], dict[str, Column]] | None = None
    eager: Callable[[DataFrame, Metrics], dict[str, Any]] | None = None
    kernel: MapKernel | None = None
    schema_only: bool = False
    # wave-2 kernel builder (z-score violation pass needs wave-1 values)
    kernel2: Callable[[Metrics], MapKernel] | None = None


COMPILERS: dict[str, Callable[[ExpectationConfiguration, Options], Compiled]] = {}


def compiler(name: str):
    def deco(fn):
        COMPILERS[name] = fn
        return fn

    return deco


class CompileError(ValueError):
    pass


def compile_expectation(config: ExpectationConfiguration, options: Options) -> Compiled:
    et = config.expectation_type
    if et in COMPILERS:
        return COMPILERS[et](config, options)
    if et in MAP_KERNELS:
        return _compile_map(config, options)
    raise CompileError(f"unknown expectation_type: {et}")


def supported_expectations() -> list[str]:
    return sorted(set(COMPILERS) | set(MAP_KERNELS))


# --------------------------------------------------------------------- utils


def _row_condition(kwargs: dict[str, Any]) -> Column | None:
    """Raw Spark-SQL row_condition (reference condition_parser="spark",
    sparkdf_execution_engine.py:532-552). Instead of pre-filtering the
    DataFrame per domain, the predicate is folded into each conditional
    aggregate so every domain still shares the single fused scan."""
    rc = kwargs.get("row_condition")
    if not rc:
        return None
    parser = kwargs.get("condition_parser", "spark")
    if parser not in ("spark", "great_expectations__experimental__"):
        raise CompileError(f"unsupported condition_parser {parser!r}")
    if parser == "great_expectations__experimental__":
        # GE mini-DSL: col("x") <op> literal — rewrite to SQL
        # (reference expectations/row_conditions.py:45-70)
        import re

        rc = re.sub(r'col\("([^"]+)"\)', r"`\1`", rc)
    return F.expr(rc)


def _guard(expr: Column, rc: Column | None) -> Column:
    return F.when(rc, expr) if rc is not None else expr


def _cnt_key(rc_id: str) -> str:
    return f"table.row_count|{rc_id}"


def _rc_id(kwargs: dict[str, Any]) -> str:
    return str(kwargs.get("row_condition") or "")


def _count_agg(rc: Column | None) -> Column:
    return F.count(_guard(F.lit(1), rc))


def _bool_sum(cond: Column) -> Column:
    return F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0)))


def _between_success(value: Any, kwargs: dict[str, Any]) -> bool:
    """min/max/strict bounds (reference _validate_metric_value_between,
    expectations/expectation.py:2339-2433)."""
    if value is None:
        return False
    lo, hi = kwargs.get("min_value"), kwargs.get("max_value")
    strict_min = bool(kwargs.get("strict_min", False))
    strict_max = bool(kwargs.get("strict_max", False))
    try:
        if lo is not None and (value <= lo if strict_min else value < lo):
            return False
        if hi is not None and (value >= hi if strict_max else value > hi):
            return False
    except TypeError:
        return False
    return True


def _py(v: Any) -> Any:
    """Normalize JVM/numpy scalars to plain Python for JSON-able EVRs."""
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if hasattr(v, "asDict"):
        return {k: _py(x) for k, x in v.asDict().items()}
    if isinstance(v, list):
        return [_py(x) for x in v]
    return v


# -------------------------------------------------------- map expectations


def _compile_map(config: ExpectationConfiguration, options: Options) -> Compiled:
    kwargs = config.kwargs
    kernel = MAP_KERNELS[config.expectation_type](kwargs)
    rc = _row_condition(kwargs)
    if rc is not None:
        kernel = MapKernel(
            include=kernel.include & rc,
            ok=kernel.ok,
            value=kernel.value,
            columns=kernel.columns,
            column_domain=kernel.column_domain,
        )
    rcid = _rc_id(kwargs)
    k_elem = _cnt_key(rcid)
    k_missing = f"missing|{config.id}"
    k_unexp = f"unexpected_count|{config.id}"
    unexpected = kernel.include & ~F.coalesce(kernel.ok, F.lit(False))
    aggs = {
        k_elem: _count_agg(rc),
        k_missing: _bool_sum(_guard(~kernel.include, rc) if rc is not None else ~kernel.include),
        k_unexp: _bool_sum(unexpected),
    }

    def finalize(metrics: Metrics) -> EVR:
        return _map_finalize(config, metrics, k_elem, k_missing, k_unexp)

    return Compiled(config=config, finalize=finalize, aggs=aggs, kernel=kernel)


def _map_finalize(
    config: ExpectationConfiguration,
    metrics: Metrics,
    k_elem: str,
    k_missing: str,
    k_unexp: str,
) -> EVR:
    """Counts → EVR with the reference's map-output field set
    (expectations/expectation.py:3411-3555) and mostly semantics
    (:3576-3586): success = (nonmissing - unexpected)/nonmissing >= mostly."""
    kwargs = config.kwargs
    element_count = int(metrics.get(k_elem) or 0)
    missing_count = int(metrics.get(k_missing) or 0)
    unexpected_count = int(metrics.get(k_unexp) or 0)
    nonmissing = element_count - missing_count
    mostly = float(kwargs.get("mostly", 1.0))

    if nonmissing <= 0:
        success = True  # vacuous truth (reference expectation.py:2846-2848)
        unexpected_percent = None
    else:
        ratio = (nonmissing - unexpected_count) / nonmissing
        success = ratio >= mostly
        unexpected_percent = 100.0 * unexpected_count / nonmissing

    result: dict[str, Any] = {
        "element_count": element_count,
        "unexpected_count": unexpected_count,
        "unexpected_percent": unexpected_percent,
        "unexpected_percent_nonmissing": unexpected_percent,
        "unexpected_percent_total": (
            100.0 * unexpected_count / element_count if element_count else None
        ),
        "missing_count": missing_count,
        "missing_percent": (100.0 * missing_count / element_count) if element_count else None,
    }
    # violation lists are attached by the engine (pass 2) under these keys
    for extra in (
        "partial_unexpected_list",
        "partial_unexpected_counts",
        "unexpected_list",
        "unexpected_index_list",
    ):
        if f"{extra}|{config.id}" in metrics:
            result[extra] = metrics[f"{extra}|{config.id}"]
    return EVR(success=bool(success), expectation_config=config, result=result)


# --------------------------------------------- column aggregate expectations


def _agg_between(
    name: str, agg_builder: Callable[[dict[str, Any], Column | None, Options], Column]
):
    @compiler(name)
    def _c(config: ExpectationConfiguration, options: Options) -> Compiled:
        kwargs = config.kwargs
        rc = _row_condition(kwargs)
        col = F.col(kwargs["column"])
        key = f"{name}|{kwargs['column']}|{_rc_id(kwargs)}"
        aggs = {key: agg_builder(kwargs, _guard(col, rc), options)}

        def finalize(metrics: Metrics) -> EVR:
            obs = _py(metrics.get(key))
            return EVR(
                success=_between_success(obs, kwargs),
                expectation_config=config,
                result={"observed_value": obs},
            )

        return Compiled(config=config, finalize=finalize, aggs=aggs)

    return _c


_agg_between("expect_column_mean_to_be_between", lambda k, c, o: F.mean(c))
_agg_between("expect_column_sum_to_be_between", lambda k, c, o: F.sum(c))
_agg_between("expect_column_min_to_be_between", lambda k, c, o: F.min(c))
_agg_between("expect_column_max_to_be_between", lambda k, c, o: F.max(c))
_agg_between("expect_column_stdev_to_be_between", lambda k, c, o: F.stddev_samp(c))
_agg_between(
    "expect_column_median_to_be_between",
    # reference column_median.py:90-121 uses exact approxQuantile; we keep the
    # sketch inside the fused pass (percentile_approx = Greenwald-Khanna)
    lambda k, c, o: F.percentile_approx(c, 0.5, o.percentile_accuracy),
)


def _distinct_count_agg(kwargs: dict[str, Any], col: Column, options: Options) -> Column:
    if options.approx_distinct:
        return F.approx_count_distinct(col)  # HLL++
    return F.countDistinct(col)


@compiler("expect_column_unique_value_count_to_be_between")
def _unique_count(config: ExpectationConfiguration, options: Options) -> Compiled:
    kwargs = config.kwargs
    rc = _row_condition(kwargs)
    col = _guard(F.col(kwargs["column"]), rc)
    mode = "approx" if options.approx_distinct else "exact"
    key = f"column.distinct_count.{mode}|{kwargs['column']}|{_rc_id(kwargs)}"
    aggs = {key: _distinct_count_agg(kwargs, col, options)}

    def finalize(metrics: Metrics) -> EVR:
        obs = _py(metrics.get(key))
        return EVR(
            success=_between_success(obs, kwargs),
            expectation_config=config,
            result={"observed_value": obs},
        )

    return Compiled(config=config, finalize=finalize, aggs=aggs)


@compiler("expect_column_proportion_of_unique_values_to_be_between")
def _unique_proportion(config: ExpectationConfiguration, options: Options) -> Compiled:
    kwargs = config.kwargs
    rc = _row_condition(kwargs)
    c = kwargs["column"]
    col = _guard(F.col(c), rc)
    mode = "approx" if options.approx_distinct else "exact"
    k_distinct = f"column.distinct_count.{mode}|{c}|{_rc_id(kwargs)}"
    k_nonnull = f"column.nonnull|{c}|{_rc_id(kwargs)}"
    aggs = {
        k_distinct: _distinct_count_agg(kwargs, col, options),
        k_nonnull: F.count(col),
    }

    def finalize(metrics: Metrics) -> EVR:
        distinct = int(metrics.get(k_distinct) or 0)
        nonnull = int(metrics.get(k_nonnull) or 0)
        obs = (distinct / nonnull) if nonnull else None
        return EVR(
            success=_between_success(obs, kwargs),
            expectation_config=config,
            result={"observed_value": obs},
        )

    return Compiled(config=config, finalize=finalize, aggs=aggs)


@compiler("expect_column_quantile_values_to_be_between")
def _quantiles(config: ExpectationConfiguration, options: Options) -> Compiled:
    kwargs = config.kwargs
    rc = _row_condition(kwargs)
    c = kwargs["column"]
    qr = kwargs["quantile_ranges"]
    quantiles = list(qr["quantiles"])
    ranges = list(qr["value_ranges"])
    if len(quantiles) != len(ranges):
        raise CompileError("quantiles and value_ranges must have equal length")
    accuracy = options.percentile_accuracy
    if kwargs.get("allow_relative_error") not in (None, False):
        err = kwargs["allow_relative_error"]
        if isinstance(err, (int, float)) and err > 0:
            accuracy = max(1, int(1.0 / float(err)))
    key = f"column.quantiles|{c}|{quantiles}|{accuracy}|{_rc_id(kwargs)}"
    col = _guard(F.col(c), rc)
    aggs = {key: F.percentile_approx(col, quantiles, accuracy)}

    def finalize(metrics: Metrics) -> EVR:
        values = _py(metrics.get(key)) or [None] * len(quantiles)
        ok = True
        for v, (lo, hi) in zip(values, ranges):
            if v is None or (lo is not None and v < lo) or (hi is not None and v > hi):
                ok = False
        return EVR(
            success=ok,
            expectation_config=config,
            result={"observed_value": {"quantiles": quantiles, "values": values}},
        )

    return Compiled(config=config, finalize=finalize, aggs=aggs)


def _collect_distinct_agg(c: str, rc: Column | None) -> tuple[str, Column]:
    key = f"column.distinct_values|{c}|{str(rc)}"
    return key, F.collect_set(_guard(F.col(c), rc))


def _distinct_set_compiler(name: str, check: Callable[[set, set], bool]):
    @compiler(name)
    def _c(config: ExpectationConfiguration, options: Options) -> Compiled:
        kwargs = config.kwargs
        rc = _row_condition(kwargs)
        key, agg = _collect_distinct_agg(kwargs["column"], rc)
        expected = set(kwargs.get("value_set") or [])

        def finalize(metrics: Metrics) -> EVR:
            observed = set(_py(metrics.get(key)) or [])
            return EVR(
                success=check(observed, expected),
                expectation_config=config,
                result={"observed_value": sorted(observed, key=lambda x: (str(type(x)), str(x)))},
            )

        return Compiled(config=config, finalize=finalize, aggs={key: agg})

    return _c


_distinct_set_compiler(
    "expect_column_distinct_values_to_be_in_set", lambda obs, exp: obs.issubset(exp)
)
_distinct_set_compiler(
    "expect_column_distinct_values_to_contain_set", lambda obs, exp: exp.issubset(obs)
)
_distinct_set_compiler(
    "expect_column_distinct_values_to_equal_set", lambda obs, exp: obs == exp
)


@compiler("expect_column_most_common_value_to_be_in_set")
def _most_common(config: ExpectationConfiguration, options: Options) -> Compiled:
    kwargs = config.kwargs
    c = kwargs["column"]
    key = f"column.most_common|{c}"

    def eager(df: DataFrame, metrics: Metrics) -> dict[str, Any]:
        col = F.col(c)
        gb = df.where(col.isNotNull()).groupBy(c).agg(F.count(F.lit(1)).alias("__n"))
        gb = gb.persist()
        try:
            top = gb.orderBy(F.desc("__n")).first()
            if top is None:
                return {key: []}
            modes = [r[c] for r in gb.where(F.col("__n") == top["__n"]).collect()]
        finally:
            gb.unpersist()
        return {key: sorted(modes, key=str)}

    def finalize(metrics: Metrics) -> EVR:
        modes = _py(metrics.get(key)) or []
        expected = set(kwargs["value_set"])
        ties_ok = bool(kwargs.get("ties_okay", False))
        in_set = [m in expected for m in modes]
        success = all(in_set) if not ties_ok else any(in_set)
        if not modes:
            success = True
        return EVR(
            success=success, expectation_config=config, result={"observed_value": modes}
        )

    return Compiled(config=config, finalize=finalize, eager=eager)


# -------------------------------------------------------------- table-level


@compiler("expect_table_row_count_to_be_between")
def _row_count_between(config: ExpectationConfiguration, options: Options) -> Compiled:
    kwargs = config.kwargs
    rc = _row_condition(kwargs)
    key = _cnt_key(_rc_id(kwargs))
    aggs = {key: _count_agg(rc)}

    def finalize(metrics: Metrics) -> EVR:
        obs = int(metrics.get(key) or 0)
        return EVR(
            success=_between_success(obs, kwargs),
            expectation_config=config,
            result={"observed_value": obs},
        )

    return Compiled(config=config, finalize=finalize, aggs=aggs)


@compiler("expect_table_row_count_to_equal")
def _row_count_equal(config: ExpectationConfiguration, options: Options) -> Compiled:
    kwargs = config.kwargs
    rc = _row_condition(kwargs)
    key = _cnt_key(_rc_id(kwargs))
    aggs = {key: _count_agg(rc)}

    def finalize(metrics: Metrics) -> EVR:
        obs = int(metrics.get(key) or 0)
        return EVR(
            success=obs == int(kwargs["value"]),
            expectation_config=config,
            result={"observed_value": obs},
        )

    return Compiled(config=config, finalize=finalize, aggs=aggs)


@compiler("expect_table_row_count_to_equal_other_table")
def _row_count_other(config: ExpectationConfiguration, options: Options) -> Compiled:
    kwargs = config.kwargs
    key = _cnt_key("")
    other_key = f"other.row_count|{kwargs['other_table_name']}"
    aggs = {key: F.count(F.lit(1))}

    def eager(df: DataFrame, metrics: Metrics) -> dict[str, Any]:
        # the validator injects the other table under metrics["__tables__"]
        tables = metrics.get("__tables__") or {}
        name = kwargs["other_table_name"]
        if name not in tables:
            raise CompileError(f"other table {name!r} not provided to validator(tables=...)")
        return {other_key: tables[name].count()}

    def finalize(metrics: Metrics) -> EVR:
        obs = int(metrics.get(key) or 0)
        other = int(metrics.get(other_key) or 0)
        return EVR(
            success=obs == other,
            expectation_config=config,
            result={"observed_value": {"self": obs, "other": other}},
        )

    return Compiled(config=config, finalize=finalize, aggs=aggs, eager=eager)


def _schema_compiler(name: str, fn: Callable[[dict[str, Any], T.StructType], EVR | tuple[bool, Any]]):
    @compiler(name)
    def _c(config: ExpectationConfiguration, options: Options) -> Compiled:
        def finalize(metrics: Metrics) -> EVR:
            schema: T.StructType = metrics["__schema__"]
            success, observed = fn(config.kwargs, schema)
            return EVR(
                success=success,
                expectation_config=config,
                result={"observed_value": observed},
            )

        return Compiled(config=config, finalize=finalize, schema_only=True)

    return _c


def _col_exists(kwargs: dict[str, Any], schema: T.StructType):
    names = schema.fieldNames()
    c = kwargs["column"]
    if "column_index" in kwargs and kwargs["column_index"] is not None:
        idx = int(kwargs["column_index"])
        return (idx < len(names) and names[idx] == c), names
    return c in names, names


_schema_compiler("expect_column_to_exist", _col_exists)
_schema_compiler(
    "expect_table_columns_to_match_set",
    lambda k, s: (
        set(s.fieldNames()) == set(k["column_set"])
        if bool(k.get("exact_match", True))
        else set(k["column_set"]).issubset(set(s.fieldNames())),
        sorted(s.fieldNames()),
    ),
)
_schema_compiler(
    "expect_table_columns_to_match_ordered_list",
    lambda k, s: (s.fieldNames() == list(k["column_list"]), s.fieldNames()),
)
_schema_compiler(
    "expect_table_column_count_to_equal",
    lambda k, s: (len(s.fields) == int(k["value"]), len(s.fields)),
)


@compiler("expect_table_column_count_to_be_between")
def _column_count_between(config: ExpectationConfiguration, options: Options) -> Compiled:
    def finalize(metrics: Metrics) -> EVR:
        n = len(metrics["__schema__"].fields)
        return EVR(
            success=_between_success(n, config.kwargs),
            expectation_config=config,
            result={"observed_value": n},
        )

    return Compiled(config=config, finalize=finalize, schema_only=True)


_SPARK_TYPE_ALIASES = {
    "StringType": "string", "str": "string", "string": "string", "TEXT": "string",
    "IntegerType": "int", "int": "int", "IntType": "int", "INTEGER": "int",
    "LongType": "bigint", "bigint": "bigint", "long": "bigint", "BIGINT": "bigint",
    "FloatType": "float", "float": "float", "FLOAT": "float",
    "DoubleType": "double", "double": "double", "DOUBLE": "double",
    "BooleanType": "boolean", "bool": "boolean", "boolean": "boolean", "BOOLEAN": "boolean",
    "TimestampType": "timestamp", "timestamp": "timestamp", "datetime": "timestamp",
    "DateType": "date", "date": "date",
    "BinaryType": "binary", "binary": "binary",
    "DecimalType": "decimal", "decimal": "decimal",
}


def _normalize_type(name: str) -> str:
    return _SPARK_TYPE_ALIASES.get(name, name.lower())


def _type_of(schema: T.StructType, column: str) -> str:
    dt = schema[column].dataType.simpleString()
    return dt.split("(")[0]  # decimal(10,2) → decimal


def _of_type(kwargs: dict[str, Any], schema: T.StructType):
    # reference resolves names against pyspark.sql.types at the expectation
    # level (expect_column_values_to_be_of_type.py:418-470) — pure schema
    # comparison, no row scan needed.
    c = kwargs["column"]
    if c not in schema.fieldNames():
        return False, None
    actual = _type_of(schema, c)
    return actual == _normalize_type(str(kwargs["type_"])), actual


def _in_type_list(kwargs: dict[str, Any], schema: T.StructType):
    c = kwargs["column"]
    if c not in schema.fieldNames():
        return False, None
    actual = _type_of(schema, c)
    wanted = {_normalize_type(str(t)) for t in kwargs["type_list"]}
    return actual in wanted, actual


_schema_compiler("expect_column_values_to_be_of_type", _of_type)
_schema_compiler("expect_column_values_to_be_in_type_list", _in_type_list)


# ------------------------------------------------------ uniqueness (eager)


def _uniqueness_compiler(name: str, cols_fn: Callable[[dict[str, Any]], list[str]]):
    @compiler(name)
    def _c(config: ExpectationConfiguration, options: Options) -> Compiled:
        kwargs = config.kwargs
        cols = cols_fn(kwargs)
        rcid = _rc_id(kwargs)
        rc = _row_condition(kwargs)
        k_elem = _cnt_key(rcid)
        k_missing = f"missing|{config.id}"
        k_unexp = f"unexpected_count|{config.id}"
        single = len(cols) == 1
        include = (
            F.col(cols[0]).isNotNull()
            if single
            else F.lit(True)
        )
        if rc is not None:
            include = include & rc
        aggs = {
            k_elem: _count_agg(rc),
            k_missing: _bool_sum(~include if rc is None else _guard(~include, rc)),
        }

        def eager(df: DataFrame, metrics: Metrics) -> dict[str, Any]:
            # Skew-safe uniqueness: two-stage partial-agg groupBy (map-side
            # combine keeps hot keys from flooding one reducer) instead of
            # the reference's single-partition window
            # (column_values_unique.py:79-84, compound_columns_unique.py:154-160).
            d = df
            if rc is not None:
                d = d.filter(rc)
            if single:
                d = d.filter(F.col(cols[0]).isNotNull())
            counts = d.groupBy(*cols).agg(F.count(F.lit(1)).alias("__n"))
            dup = counts.where(F.col("__n") > 1).agg(
                F.coalesce(F.sum("__n"), F.lit(0)).alias("dup_rows"),
                F.count(F.lit(1)).alias("dup_keys"),
            ).first()
            return {k_unexp: int(dup["dup_rows"]), f"dup_keys|{config.id}": int(dup["dup_keys"])}

        def finalize(metrics: Metrics) -> EVR:
            return _map_finalize(config, metrics, k_elem, k_missing, k_unexp)

        # violation pass: rows whose key occurs >1 times — expressed as a
        # window kernel only for the bounded pass-2 sample (never pass 1)
        key_struct = F.struct(*[F.col(c) for c in cols])
        kernel = MapKernel(
            include=include,
            ok=F.count(F.lit(1)).over(Window.partitionBy(*[F.col(c) for c in cols])) <= 1,
            value=F.col(cols[0]) if single else key_struct,
            columns=list(cols),
            column_domain=single,
        )
        return Compiled(config=config, finalize=finalize, aggs=aggs, eager=eager, kernel=kernel)

    return _c


_uniqueness_compiler("expect_column_values_to_be_unique", lambda k: [k["column"]])
_uniqueness_compiler("expect_compound_columns_to_be_unique", lambda k: list(k["column_list"]))
_uniqueness_compiler("expect_multicolumn_values_to_be_unique", lambda k: list(k["column_list"]))


# ----------------------------------------------------- referential (eager)


@compiler("expect_column_values_to_be_in_other_table")
def _in_other_table(config: ExpectationConfiguration, options: Options) -> Compiled:
    """Native cross-table referential check — hash-partitioned LEFT ANTI join
    (broadcast when the reference side is small; AQE decides). The reference
    cannot do this on Spark at all (sparkdf_execution_engine.py:507-511
    raises on multiple named tables)."""
    kwargs = config.kwargs
    c = kwargs["column"]
    k_elem = _cnt_key("")
    k_missing = f"missing|{config.id}"
    k_unexp = f"unexpected_count|{config.id}"
    col = F.col(c)
    aggs = {k_elem: F.count(F.lit(1)), k_missing: _bool_sum(col.isNull())}

    def eager(df: DataFrame, metrics: Metrics) -> dict[str, Any]:
        tables = metrics.get("__tables__") or {}
        name = kwargs["other_table_name"]
        if name not in tables:
            raise CompileError(f"other table {name!r} not provided to validator(tables=...)")
        other_col = kwargs.get("other_column", c)
        ref = tables[name].select(F.col(other_col).alias(c)).where(F.col(c).isNotNull()).distinct()
        missing = (
            df.where(col.isNotNull())
            .join(ref, on=c, how="left_anti")
        )
        unexp = missing.count()
        out: dict[str, Any] = {k_unexp: int(unexp)}
        out[f"__violations_df__|{config.id}"] = missing.select(col.alias("__value"))
        return out

    def finalize(metrics: Metrics) -> EVR:
        return _map_finalize(config, metrics, k_elem, k_missing, k_unexp)

    return Compiled(config=config, finalize=finalize, aggs=aggs, eager=eager)


# ---------------------------------------------------------- z-score (wave 2)


@compiler("expect_column_value_z_scores_to_be_less_than")
def _z_scores(config: ExpectationConfiguration, options: Options) -> Compiled:
    kwargs = config.kwargs
    c = kwargs["column"]
    rc = _row_condition(kwargs)
    rcid = _rc_id(kwargs)
    col = F.col(c)
    k_elem = _cnt_key(rcid)
    k_missing = f"missing|{config.id}"
    k_unexp = f"unexpected_count|{config.id}"
    k_mean = f"expect_column_mean_to_be_between|{c}|{rcid}"
    k_std = f"column.stdev|{c}|{rcid}"
    threshold = float(kwargs["threshold"])
    double_sided = bool(kwargs.get("double_sided", True))
    include = col.isNotNull() if rc is None else (col.isNotNull() & rc)
    aggs = {
        k_elem: _count_agg(rc),
        k_missing: _bool_sum(_guard(col.isNull(), rc) if rc is not None else col.isNull()),
        k_mean: F.mean(_guard(col, rc)),
        k_std: F.stddev_samp(_guard(col, rc)),
    }

    def _z(metrics: Metrics) -> Column:
        mean = float(metrics.get(k_mean) or 0.0)
        std = float(metrics.get(k_std) or 0.0)
        if std == 0 or math.isnan(std):
            return F.lit(0.0)
        return (col - F.lit(mean)) / F.lit(std)

    def aggs2(metrics: Metrics) -> dict[str, Column]:
        z = _z(metrics)
        ok = (F.abs(z) < threshold) if double_sided else (z < threshold)
        return {k_unexp: _bool_sum(include & ~ok)}

    def kernel2(metrics: Metrics) -> MapKernel:
        z = _z(metrics)
        ok = (F.abs(z) < threshold) if double_sided else (z < threshold)
        return MapKernel(include=include, ok=ok, value=col, columns=[c])

    def finalize(metrics: Metrics) -> EVR:
        return _map_finalize(config, metrics, k_elem, k_missing, k_unexp)

    return Compiled(config=config, finalize=finalize, aggs=aggs, aggs2=aggs2, kernel2=kernel2)


# ------------------------------------------------- ordered (window, eager)


def _monotonic_compiler(name: str, increasing: bool):
    @compiler(name)
    def _c(config: ExpectationConfiguration, options: Options) -> Compiled:
        kwargs = config.kwargs
        c = kwargs["column"]
        strictly = bool(kwargs.get("strictly", False))
        order_by = kwargs.get("order_by")  # engine extension; reference uses
        # encounter order via a single-partition constant-literal window
        # (column_values_increasing.py:140-145) — catastrophic at scale.
        k_elem = _cnt_key("")
        k_missing = f"missing|{config.id}"
        k_unexp = f"unexpected_count|{config.id}"
        col = F.col(c)
        aggs = {k_elem: F.count(F.lit(1)), k_missing: _bool_sum(col.isNull())}

        def eager(df: DataFrame, metrics: Metrics) -> dict[str, Any]:
            d = df.where(col.isNotNull())
            if order_by:
                w = Window.orderBy(F.col(order_by))
            else:
                w = Window.orderBy(F.monotonically_increasing_id())
            prev = F.lag(col).over(w)
            if increasing:
                bad = (col <= prev) if strictly else (col < prev)
            else:
                bad = (col >= prev) if strictly else (col > prev)
            flagged = d.select((prev.isNotNull() & bad).alias("__bad"))
            unexp = flagged.agg(_bool_sum(F.col("__bad")).alias("u")).first()["u"]
            return {k_unexp: int(unexp or 0)}

        def finalize(metrics: Metrics) -> EVR:
            return _map_finalize(config, metrics, k_elem, k_missing, k_unexp)

        return Compiled(config=config, finalize=finalize, aggs=aggs, eager=eager)

    return _c


_monotonic_compiler("expect_column_values_to_be_increasing", True)
_monotonic_compiler("expect_column_values_to_be_decreasing", False)


# ------------------------------------------------------- distributional


def _hist_keys(config_id: str, nbins: int) -> list[str]:
    return [f"hist|{config_id}|{i}" for i in range(nbins + 2)]  # + below/above


def _hist_aggs(col: Column, bins: list[float], config_id: str) -> dict[str, Column]:
    keys = _hist_keys(config_id, len(bins) - 1)
    aggs: dict[str, Column] = {keys[0]: _bool_sum(col < F.lit(bins[0]))}
    for i in range(len(bins) - 1):
        lo, hi = bins[i], bins[i + 1]
        upper = (col <= F.lit(hi)) if i == len(bins) - 2 else (col < F.lit(hi))
        aggs[keys[i + 1]] = _bool_sum((col >= F.lit(lo)) & upper)
    aggs[keys[-1]] = _bool_sum(col > F.lit(bins[-1]))
    return aggs


@compiler("expect_column_kl_divergence_to_be_less_than")
def _kl_divergence(config: ExpectationConfiguration, options: Options) -> Compiled:
    """KL(observed || expected) against a partition_object.

    Continuous path (bins+weights): histogram bucket sums fused into pass 1
    + below/above-partition counts, tail/internal holdout math on the driver
    (reference expect_column_kl_divergence_to_be_less_than.py:359-516).
    Categorical path (values+weights): eager value-counts groupBy.
    """
    kwargs = config.kwargs
    c = kwargs["column"]
    po = kwargs["partition_object"]
    threshold = kwargs.get("threshold")
    tail_holdout = float(kwargs.get("tail_weight_holdout", 0.0))
    internal_holdout = float(kwargs.get("internal_weight_holdout", 0.0))
    col = F.col(c)
    k_nonnull = f"column.nonnull|{c}|"
    aggs: dict[str, Column] = {k_nonnull: F.count(col)}
    eager = None

    if "bins" in po:
        bins = [float(b) for b in po["bins"]]
        weights = [float(w) for w in po["weights"]]
        aggs.update(_hist_aggs(col, bins, config.id))
        keys = _hist_keys(config.id, len(bins) - 1)

        def finalize(metrics: Metrics) -> EVR:
            nonnull = int(metrics.get(k_nonnull) or 0)
            counts = [int(metrics.get(k) or 0) for k in keys]
            below, hist, above = counts[0], counts[1:-1], counts[-1]
            if nonnull == 0:
                return EVR(success=True, expectation_config=config,
                           result={"observed_value": None})
            pk = [h / nonnull for h in hist] + [below / nonnull, above / nonnull]
            scale = 1.0 - tail_holdout - internal_holdout
            qk = [w * scale for w in weights]
            if internal_holdout and any(w == 0 for w in weights):
                nzero = sum(1 for w in weights if w == 0)
                qk = [
                    (w * scale) if w > 0 else internal_holdout / nzero
                    for w in weights
                ]
            qk = qk + [tail_holdout / 2.0, tail_holdout / 2.0]
            kl = stats.kl_divergence(np.array(pk), np.array(qk))
            success = threshold is not None and kl < float(threshold)
            return EVR(
                success=bool(success),
                expectation_config=config,
                result={
                    "observed_value": None if math.isinf(kl) else kl,
                    "details": {
                        "observed_partition": {
                            "bins": bins,
                            "weights": [h / nonnull for h in hist],
                            "tail_weights": [below / nonnull, above / nonnull],
                        },
                        "expected_partition": po,
                    },
                },
            )

    else:  # categorical
        values = list(po["values"])
        weights = [float(w) for w in po["weights"]]
        k_counts = f"value_counts|{config.id}"

        def eager(df: DataFrame, metrics: Metrics) -> dict[str, Any]:
            rows = (
                df.where(col.isNotNull())
                .groupBy(c)
                .agg(F.count(F.lit(1)).alias("__n"))
                .collect()
            )
            return {k_counts: {r[c]: int(r["__n"]) for r in rows}}

        def finalize(metrics: Metrics) -> EVR:
            counts: dict[Any, int] = metrics.get(k_counts) or {}
            nonnull = int(metrics.get(k_nonnull) or 0)
            if nonnull == 0:
                return EVR(success=True, expectation_config=config,
                           result={"observed_value": None})
            qk = {v: w for v, w in zip(values, weights)}
            extra_mass = sum(n for v, n in counts.items() if v not in qk) / nonnull
            if extra_mass > 0 and tail_holdout == 0:
                kl = float("inf")
            else:
                pk_list, qk_list = [], []
                for v in values:
                    pk_list.append(counts.get(v, 0) / nonnull)
                    qk_list.append(qk[v] * (1.0 - tail_holdout))
                if extra_mass > 0:
                    pk_list.append(extra_mass)
                    qk_list.append(tail_holdout)
                kl = stats.kl_divergence(np.array(pk_list), np.array(qk_list))
            success = threshold is not None and kl < float(threshold)
            observed_weights = {str(v): counts.get(v, 0) / nonnull for v in values}
            return EVR(
                success=bool(success),
                expectation_config=config,
                result={
                    "observed_value": None if math.isinf(kl) else kl,
                    "details": {
                        "observed_partition": {
                            "values": values,
                            "weights": [observed_weights[str(v)] for v in values],
                        },
                        "expected_partition": po,
                    },
                },
            )

    return Compiled(config=config, finalize=finalize, aggs=aggs, eager=eager)


@compiler("expect_column_chisquare_test_p_value_to_be_greater_than")
def _chisquare(config: ExpectationConfiguration, options: Options) -> Compiled:
    kwargs = config.kwargs
    c = kwargs["column"]
    po = kwargs["partition_object"]
    p_threshold = float(kwargs.get("p", 0.05))
    col = F.col(c)
    k_nonnull = f"column.nonnull|{c}|"
    k_counts = f"value_counts|{config.id}"
    aggs = {k_nonnull: F.count(col)}

    def eager(df: DataFrame, metrics: Metrics) -> dict[str, Any]:
        rows = (
            df.where(col.isNotNull()).groupBy(c).agg(F.count(F.lit(1)).alias("__n")).collect()
        )
        return {k_counts: {r[c]: int(r["__n"]) for r in rows}}

    def finalize(metrics: Metrics) -> EVR:
        counts: dict[Any, int] = metrics.get(k_counts) or {}
        nonnull = int(metrics.get(k_nonnull) or 0)
        values = list(po["values"])
        weights = [float(w) for w in po["weights"]]
        observed = np.array([counts.get(v, 0) for v in values], dtype=float)
        expected = np.array(weights, dtype=float) * nonnull
        stat, p = stats.chisquare_test(observed, expected)
        return EVR(
            success=p > p_threshold,
            expectation_config=config,
            result={"observed_value": p, "details": {"chi_squared": stat}},
        )

    return Compiled(config=config, finalize=finalize, aggs=aggs, eager=eager)


def _ks_compiler(name: str):
    @compiler(name)
    def _c(config: ExpectationConfiguration, options: Options) -> Compiled:
        """KS test of the column against a continuous partition_object,
        computed from fused histogram counts (ECDF at bin edges) — a
        sketch-based variant of the reference's sample-based test
        (column_bootstrapped_ks_test_p_value.py, pandas-only there)."""
        kwargs = config.kwargs
        c = kwargs["column"]
        po = kwargs["partition_object"]
        p_threshold = float(kwargs.get("p", 0.05))
        col = F.col(c)
        bins = [float(b) for b in po["bins"]]
        weights = [float(w) for w in po["weights"]]
        k_nonnull = f"column.nonnull|{c}|"
        aggs = {k_nonnull: F.count(col)}
        aggs.update(_hist_aggs(col, bins, config.id))
        keys = _hist_keys(config.id, len(bins) - 1)

        def finalize(metrics: Metrics) -> EVR:
            nonnull = int(metrics.get(k_nonnull) or 0)
            counts = [int(metrics.get(k) or 0) for k in keys]
            below, hist = counts[0], counts[1:-1]
            if nonnull == 0:
                return EVR(success=True, expectation_config=config,
                           result={"observed_value": None})
            ecdf = np.cumsum([below] + hist) / nonnull
            expected_cdf = np.cumsum([0.0] + weights)
            d = float(np.max(np.abs(ecdf - expected_cdf)))
            p = stats.ks_sf(d, nonnull)
            return EVR(
                success=p > p_threshold,
                expectation_config=config,
                result={"observed_value": p, "details": {"ks_d": d}},
            )

        return Compiled(config=config, finalize=finalize, aggs=aggs)

    return _c


_ks_compiler("expect_column_bootstrapped_ks_test_p_value_to_be_greater_than")
_ks_compiler("expect_column_parameterized_distribution_ks_test_p_value_to_be_greater_than")


@compiler("expect_column_pair_cramers_phi_value_to_be_less_than")
def _cramers_phi(config: ExpectationConfiguration, options: Options) -> Compiled:
    kwargs = config.kwargs
    ca, cb = kwargs["column_A"], kwargs["column_B"]
    threshold = float(kwargs.get("threshold", 0.1))
    k_phi = f"cramers_phi|{config.id}"

    def eager(df: DataFrame, metrics: Metrics) -> dict[str, Any]:
        rows = (
            df.where(F.col(ca).isNotNull() & F.col(cb).isNotNull())
            .groupBy(ca, cb)
            .agg(F.count(F.lit(1)).alias("__n"))
            .collect()
        )
        a_vals = sorted({r[ca] for r in rows}, key=str)
        b_vals = sorted({r[cb] for r in rows}, key=str)
        table = np.zeros((len(a_vals), len(b_vals)))
        ai = {v: i for i, v in enumerate(a_vals)}
        bi = {v: i for i, v in enumerate(b_vals)}
        for r in rows:
            table[ai[r[ca]], bi[r[cb]]] = r["__n"]
        return {k_phi: stats.cramers_phi(table)}

    def finalize(metrics: Metrics) -> EVR:
        phi = float(metrics.get(k_phi) or 0.0)
        return EVR(
            success=phi < threshold,
            expectation_config=config,
            result={"observed_value": phi},
        )

    return Compiled(config=config, finalize=finalize, eager=eager)
