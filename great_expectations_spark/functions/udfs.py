"""Vectorized pandas-UDF kernels for Python-semantics checks.

The reference uses per-row ``F.udf`` for these (json parse:
column_values_json_parseable.py:37, strftime:
column_values_match_strftime_format.py:44-50, dateutil:
sparkdf_execution_engine.py:102-106). Per the north rule all Python-side
text invariants run ONLY through Arrow-batched pandas UDFs
(Series → boolean Series), never row-at-a-time Spark UDFs.
"""

from __future__ import annotations

import json
import re
from datetime import datetime
from typing import Any, Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # dateutil ships as a pandas dependency
    from dateutil.parser import parse as _dateutil_parse
except Exception:  # pragma: no cover
    _dateutil_parse = None


@F.pandas_udf(T.BooleanType())
def json_parseable(s: pd.Series) -> pd.Series:
    def ok(v: Any) -> bool:
        if v is None:
            return False
        try:
            json.loads(v)
            return True
        except (TypeError, ValueError):
            return False

    return s.map(ok).astype("boolean")


@F.pandas_udf(T.BooleanType())
def dateutil_parseable(s: pd.Series) -> pd.Series:
    if _dateutil_parse is None:  # pragma: no cover
        raise NotImplementedError("python-dateutil unavailable")

    def ok(v: Any) -> bool:
        if v is None:
            return False
        try:
            _dateutil_parse(str(v))
            return True
        except (ValueError, OverflowError, TypeError):
            return False

    return s.map(ok).astype("boolean")


def match_strftime(fmt: str) -> Callable[[Column], Column]:
    """Boolean kernel: value parses exactly under the given strftime format."""

    @F.pandas_udf(T.BooleanType())
    def _match(s: pd.Series) -> pd.Series:
        def ok(v: Any) -> bool:
            if v is None:
                return False
            try:
                datetime.strptime(str(v), fmt)
                return True
            except ValueError:
                return False

        return s.map(ok).astype("boolean")

    return _match


# --- minimal JSON-schema validator (subset) ---------------------------------
# jsonschema isn't in the base image; this covers the draft-07 subset the
# reference fixtures exercise: type, enum, properties, required, items,
# minimum/maximum, minLength/maxLength, pattern.

_TYPE_MAP: dict[str, tuple[type, ...]] = {
    "object": (dict,),
    "array": (list,),
    "string": (str,),
    "integer": (int,),
    "number": (int, float),
    "boolean": (bool,),
    "null": (type(None),),
}


def _schema_ok(value: Any, schema: dict[str, Any]) -> bool:
    t = schema.get("type")
    if t is not None:
        types = [t] if isinstance(t, str) else list(t)
        allowed: tuple[type, ...] = ()
        for name in types:
            allowed += _TYPE_MAP.get(name, ())
        if not isinstance(value, allowed):
            return False
        if isinstance(value, bool) and "boolean" not in types:
            return False
    if "enum" in schema and value not in schema["enum"]:
        return False
    if isinstance(value, (int, float)) and not isinstance(value, bool):
        if "minimum" in schema and value < schema["minimum"]:
            return False
        if "maximum" in schema and value > schema["maximum"]:
            return False
    if isinstance(value, str):
        if "minLength" in schema and len(value) < schema["minLength"]:
            return False
        if "maxLength" in schema and len(value) > schema["maxLength"]:
            return False
        if "pattern" in schema and not re.search(schema["pattern"], value):
            return False
    if isinstance(value, dict):
        for req in schema.get("required", []):
            if req not in value:
                return False
        for k, sub in schema.get("properties", {}).items():
            if k in value and not _schema_ok(value[k], sub):
                return False
    if isinstance(value, list) and "items" in schema:
        items = schema["items"]
        if isinstance(items, dict):
            if not all(_schema_ok(v, items) for v in value):
                return False
    return True


def match_json_schema(schema: dict[str, Any] | str) -> Callable[[Column], Column]:
    sch = json.loads(schema) if isinstance(schema, str) else schema

    @F.pandas_udf(T.BooleanType())
    def _match(s: pd.Series) -> pd.Series:
        def ok(v: Any) -> bool:
            if v is None:
                return False
            try:
                return _schema_ok(json.loads(v), sch)
            except (TypeError, ValueError):
                return False

        return s.map(ok).astype("boolean")

    return _match
