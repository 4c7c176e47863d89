"""Regression tests for the round-2 core self-review findings
(compiler NaN/relative-error/value_format/row-condition-mode, checkpoint
chunk-id collision + resume error handling, evaluation-parameter URNs)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from great_expectations_spark import ExpectationSuite, validate


def test_nan_observed_value_fails_between(spark):
    """NaN mean must FAIL the between check (inverted comparisons would
    silently pass it)."""
    df = spark.createDataFrame([(1.0,), (float("nan"),)], "x double")
    suite = ExpectationSuite("nan").add(
        "expect_column_mean_to_be_between", column="x", min_value=0)
    r = validate(df, suite).results[0]
    assert r.success is False
    obs = r.result["observed_value"]
    assert obs is None or math.isnan(obs)


def test_allow_relative_error_true_rejected(spark):
    """allow_relative_error=True is not a float: must surface an error,
    never silently compute accuracy=1 (~100% relative error) quantiles."""
    df = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    suite = ExpectationSuite("q").add(
        "expect_column_quantile_values_to_be_between", column="x",
        allow_relative_error=True,
        quantile_ranges={"quantiles": [0.5], "value_ranges": [[0, 100]]})
    r = validate(df, suite).results[0]
    assert r.exception_info["raised_exception"] is True
    assert "allow_relative_error" in (r.exception_info["exception_message"] or "")


def test_pair_row_condition_keeps_pair_value_format(spark):
    """Pair expectation + row_condition: unexpected values must stay
    [a, b] lists (the kernel rebuild used to reset value_format)."""
    df = spark.createDataFrame(
        [(1, 10, 5), (2, 3, 7), (3, 8, 1)], "id int, a int, b int")
    suite = ExpectationSuite("pair").add(
        "expect_column_pair_values_a_to_be_greater_than_b",
        column_A="a", column_B="b", row_condition="id >= 1",
        condition_parser="spark")
    r = validate(df, suite, result_format="COMPLETE").results[0]
    assert r.result["unexpected_count"] == 1
    assert r.result["unexpected_list"] == [[3, 7]]


def test_most_common_honors_row_condition(spark):
    """The mode must be computed over the row_condition domain, not the
    whole table."""
    rows = [("EU", "de")] * 5 + [("EU", "en")] * 2 + [("US", "en")] * 10
    df = spark.createDataFrame(rows, "region string, lang string")
    suite = ExpectationSuite("mode").add(
        "expect_column_most_common_value_to_be_in_set",
        column="lang", value_set=["de"],
        row_condition="region = 'EU'", condition_parser="spark")
    r = validate(df, suite).results[0]
    # global mode is 'en' (12x); EU-domain mode is 'de' (5x) -> must pass
    assert r.success is True
    assert r.result["observed_value"] == ["de"]
    assert r.result["element_count"] == 7


def test_splitter_null_sentinel_collision(spark):
    """A literal '__null__' string value and actual NULLs must get
    DISTINCT chunk ids (resume keys on chunk_id)."""
    from great_expectations_spark.checkpoint import Splitter

    df = spark.createDataFrame(
        [("__null__",), ("a",), (None,)], "k string")
    sp = Splitter.column_value(df, "k")
    ids = [cid for cid, _ in sp.chunks]
    assert len(ids) == len(set(ids)) == 3
    # each chunk selects exactly one row
    for cid, pred in sp.chunks:
        assert df.where(pred).count() == 1, cid


def test_parse_urn_stores_short_is_typed_error():
    from great_expectations_spark.core.evaluation_parameters import (
        EvaluationParameterError,
        parse_urn,
    )

    with pytest.raises(EvaluationParameterError, match="stores URN"):
        parse_urn("urn:great_expectations:stores:only_store")
