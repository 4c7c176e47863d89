"""Plugin expectation bases: regex- and set-based factory registration
(reference regex_based_column_map_expectation.py /
set_based_column_map_expectation.py)."""

from __future__ import annotations

import pytest

from great_expectations_spark import (
    ExpectationSuite,
    register_regex_expectation,
    register_set_expectation,
    validate,
)


def test_regex_expectation_roundtrip(spark):
    register_regex_expectation(
        "expect_column_values_to_be_hex_color", r"^#[0-9a-fA-F]{6}$")
    df = spark.createDataFrame(
        [("#a1b2c3",), ("#FFFFFF",), ("red",), (None,)], "c string")
    suite = ExpectationSuite("s").add(
        "expect_column_values_to_be_hex_color", column="c", mostly=0.5)
    res = validate(df, suite, result_format="COMPLETE")
    evr = res.results[0]
    assert evr.success
    assert evr.result["unexpected_count"] == 1
    assert evr.result["unexpected_list"] == ["red"]


def test_regex_expectation_negated(spark):
    register_regex_expectation(
        "expect_column_values_to_not_be_shouting", r"^[A-Z ]+$", match=False)
    df = spark.createDataFrame([("quiet",), ("LOUD NOISE",)], "c string")
    suite = ExpectationSuite("s").add(
        "expect_column_values_to_not_be_shouting", column="c")
    res = validate(df, suite)
    assert res.results[0].result["unexpected_count"] == 1


def test_set_expectation(spark):
    register_set_expectation(
        "expect_column_values_to_be_primary_color", ["red", "green", "blue"])
    df = spark.createDataFrame([("red",), ("blue",), ("mauve",)], "c string")
    suite = ExpectationSuite("s").add(
        "expect_column_values_to_be_primary_color", column="c", mostly=0.6)
    res = validate(df, suite)
    assert res.results[0].success
    assert res.results[0].result["unexpected_count"] == 1


def test_bad_name_rejected():
    with pytest.raises(ValueError):
        register_regex_expectation("not_an_expectation", ".*")
