"""Parity against the reference's own golden JSON expectation corpus.

Loads every spark-applicable test case from
``/root/reference/tests/test_definitions/**/*.json`` (read in place — test
DATA, not code) and runs it through THIS engine, comparing EVR fields the
way the reference's ``check_json_test_result``
(great_expectations/self_check/util.py:2918-3189) does:

  * ``success`` exactly
  * ``observed_value`` with numeric tolerance; lists order-insensitively
  * ``unexpected_list`` / ``partial_unexpected_list`` as multisets
  * ``traceback_substring`` → our EVR must carry exception_info
  * ``unexpected_index_list`` is NOT asserted (the reference itself only
    checks it on pandas backends — util.py gates it off for spark)

Backend gates (``only_for`` / ``suppress_test_for``) are honored exactly
as the reference runner does for its spark backend.
"""

from __future__ import annotations

import datetime
import glob
import json
import math
import os

import pytest

FIXTURE_GLOB = "/root/reference/tests/test_definitions/*/*.json"

# legacy kwargs this engine deliberately does not implement
# (parse_strings_as_datetimes IS handled, matching the reference spark
# backend: bounds parsed for between, strings compared as-is elsewhere)
_UNSUPPORTED_KWARGS = {
    "output_strftime_format",
    "utc_offset",
}
# out-keys the reference does not assert for the spark backend, or that
# carry engine-specific detail payloads
_SKIP_OUT_KEYS = {
    "unexpected_index_list",
    "unexpected_index_query",
    "details",
    "observed_partition",
    "expected_partition",
    "value_counts",
    "observed_value_list",
    "observed_cdf_x_0_lt",
    "observed_cdf_x_-1_gt",
    "observed_cdf_x_0_eq",
    "observed_cdf_x_-1_eq",
}


def _gate_ok(t: dict) -> bool:
    only = t.get("only_for") or []
    if isinstance(only, str):
        only = [only]
    if only and not any(x == "spark" for x in only):
        return False
    sup = t.get("suppress_test_for") or []
    if isinstance(sup, str):
        sup = [sup]
    return "spark" not in sup


def _has_unsupported(kwargs: dict) -> str | None:
    for k in kwargs:
        if k in _UNSUPPORTED_KWARGS:
            return k
    return None


def _collect():
    cases = []
    for path in sorted(glob.glob(FIXTURE_GLOB)):
        try:
            doc = json.load(open(path))
        except Exception:
            continue
        et = doc.get("expectation_type") or os.path.basename(path)[:-5]
        for di, ds in enumerate(doc.get("datasets", [])):
            if not isinstance(ds.get("data"), dict):
                continue  # multi-table layouts handled by dedicated tests
            for ti, t in enumerate(ds.get("tests", [])):
                if not isinstance(t.get("in"), dict) or not isinstance(t.get("out"), (dict,)):
                    continue
                if not _gate_ok(t):
                    continue
                cases.append(
                    pytest.param(
                        path, di, ti, et,
                        id=f"{et}-{di}-{t.get('title', ti)}"[:120],
                    )
                )
    return cases


CASES = _collect()


def _coerce(v, spark_type_name: str | None):
    if v is None:
        return None
    if spark_type_name in ("FloatType", "DoubleType"):
        return float(v)
    if spark_type_name in ("IntegerType", "LongType"):
        return int(v)
    if spark_type_name == "StringType":
        return str(v)
    if spark_type_name == "BooleanType":
        return bool(v)
    if spark_type_name in ("TimestampType", "DateType"):
        if isinstance(v, str):
            try:
                dt = datetime.datetime.fromisoformat(v)
            except ValueError:
                from dateutil import parser as dtp

                dt = dtp.parse(v)
            return dt.date() if spark_type_name == "DateType" else dt
        return v
    return v


def _build_df(spark, data: dict, schemas: dict | None):
    from pyspark.sql import types as T

    cols = list(data)
    n = max((len(v) for v in data.values()), default=0)
    spark_schema = (schemas or {}).get("spark")

    def infer(name):
        for v in data[name]:
            if v is None:
                continue
            if isinstance(v, bool):
                return "BooleanType"
            if isinstance(v, int):
                return "LongType"
            if isinstance(v, float):
                return "DoubleType"
            if isinstance(v, str):
                return "StringType"
            return None
        return "StringType"

    names = {}
    for c in cols:
        tname = (spark_schema or {}).get(c) or infer(c)
        if tname is None:
            raise ValueError(f"cannot infer type for column {c}")
        # mixed int/float columns without an explicit schema → double
        if tname == "LongType" and not spark_schema and any(
            isinstance(v, float) for v in data[c]
        ):
            tname = "DoubleType"
        names[c] = tname

    fields = [T.StructField(c, getattr(T, names[c])(), True) for c in cols]
    rows = [
        tuple(_coerce(data[c][i] if i < len(data[c]) else None, names[c]) for c in cols)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, T.StructType(fields))


def _num_eq(a, b) -> bool:
    # the reference's own comparator (self_check/util.py:491-492) uses
    # RTOL=1e-7, ATOL=5e-2 for observed_value floats — match it
    try:
        if a is None or b is None:
            return a is None and b is None
        fa, fb = float(a), float(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return abs(fa - fb) <= 5e-2 + 1e-7 * abs(fb)
    except (TypeError, ValueError):
        return a == b


def _norm(v):
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, (int, float)):
        return ("n", round(float(v), 6))
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_norm(x) for x in v))
    if isinstance(v, dict):
        return ("d", tuple(sorted((k, _norm(x)) for k, x in v.items())))
    return ("s", str(v))


def _values_match(expected, actual, tolerant: bool = False) -> bool:
    if isinstance(expected, (int, float)) and not isinstance(expected, bool):
        if tolerant:
            return _num_eq(expected, actual)
        try:
            return actual is not None and round(float(expected), 6) == round(float(actual), 6)
        except (TypeError, ValueError):
            return expected == actual
    if isinstance(expected, list):
        if not isinstance(actual, (list, tuple)):
            return False
        if tolerant and len(expected) == len(actual) and all(
            isinstance(x, (int, float)) and not isinstance(x, bool) for x in expected
        ):
            try:
                return all(
                    _num_eq(e, a) for e, a in zip(sorted(map(float, expected)),
                                                  sorted(map(float, actual)))
                )
            except (TypeError, ValueError):
                pass
        return sorted(map(_norm, expected)) == sorted(map(_norm, actual))
    if isinstance(expected, dict):
        if not isinstance(actual, dict):
            return False
        return all(
            k in actual and _values_match(v, actual[k], tolerant)
            for k, v in expected.items()
        )
    return expected == actual


@pytest.mark.parametrize("path,di,ti,et", CASES)
def test_reference_fixture(spark, path, di, ti, et):
    from great_expectations_spark import ExpectationSuite, validate
    from great_expectations_spark.plans.compiler import supported_expectations

    doc = json.load(open(path))
    ds = doc["datasets"][di]
    t = ds["tests"][ti]
    kwargs = dict(t["in"])
    out = t["out"]

    if et not in supported_expectations():
        pytest.skip(f"expectation {et} not implemented")
    bad = _has_unsupported(kwargs)
    if bad:
        pytest.skip(f"unsupported kwarg {bad}")

    kwargs.pop("catch_exceptions", None)
    result_format = kwargs.pop("result_format", "COMPLETE")

    df = _build_df(spark, ds["data"], ds.get("schemas"))
    suite = ExpectationSuite(name="fixture").add(et, **kwargs)
    res = validate(df, suite, result_format=result_format)
    evr = res.results[0]

    if not out:
        return  # out == {}: the reference runner asserts nothing

    if "traceback_substring" in out:
        assert evr.exception_info.get("raised_exception"), (
            f"expected exception, got success={evr.success} result={evr.result}")
        return

    assert not evr.exception_info.get("raised_exception"), (
        f"unexpected exception: {evr.exception_info.get('exception_message')}")

    for key, expected in out.items():
        if key in _SKIP_OUT_KEYS:
            continue
        if key == "success":
            assert evr.success == expected, (
                f"success mismatch: expected {expected}, got {evr.success}; "
                f"result={evr.result}")
        elif key == "result":
            for rk, rv in expected.items():
                if rk in _SKIP_OUT_KEYS:
                    continue
                actual = evr.result.get(rk)
                assert _values_match(rv, actual, tolerant=(rk == "observed_value")), (
                    f"result[{rk}]: expected {rv!r}, got {actual!r}")
        elif key in ("unexpected_list", "partial_unexpected_list"):
            actual = evr.result.get(key)
            assert _values_match(expected, actual), (
                f"{key}: expected {expected!r}, got {actual!r}")
        elif key == "observed_value":
            actual = evr.result.get("observed_value")
            assert _values_match(expected, actual, tolerant=True), (
                f"observed_value: expected {expected!r}, got {actual!r}")
        # unknown out-keys: ignore (reference runner is selective too)
