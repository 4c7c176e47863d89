"""Migration parity: the reference's own on-disk expectation-suite JSON
files load and run unmodified.

A reference user's `expectations/*.json` (format:
great_expectations/core/expectation_suite.py `to_json_dict` — keys
expectation_suite_name / expectations / meta / data_asset_type /
evaluation_parameters) must round-trip through
``ExpectationSuite.from_json`` and validate through this engine,
including `$PARAMETER` URNs chained against prior results.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from great_expectations_spark import ExpectationSuite, validate

FIXDIR = Path("/root/reference/tests/test_fixtures/expectation_suites")


@pytest.mark.skipif(not FIXDIR.exists(), reason="reference fixtures absent")
class TestReferenceSuiteJson:
    def test_parameterized_suite_loads(self):
        suite = ExpectationSuite.from_json(
            (FIXDIR / "parameterized_expectation_suite_fixture.json").read_text()
        )
        assert suite.name == "my_dag_node.default"
        types = [e.expectation_type for e in suite.expectations]
        assert types == [
            "expect_table_row_count_to_equal",
            "expect_column_unique_value_count_to_be_between",
        ]
        # the $PARAMETER URNs survive verbatim in kwargs
        assert "$PARAMETER" in suite.expectations[0].kwargs["value"]

    def test_parameterized_suite_runs_with_urn_chaining(self, spark):
        raw = json.loads(
            (FIXDIR / "parameterized_expectation_suite_fixture.json").read_text()
        )
        # keep the row-count expectation; rewrite only the domain column of
        # the second to one that exists in our table
        raw["expectations"][1]["kwargs"]["column"] = "id"
        raw["expectations"][0]["kwargs"]["value"]["$PARAMETER"] = (
            "urn:great_expectations:validations:upstream:"
            "expect_table_row_count_to_be_between.result.observed_value"
        )
        raw["expectations"][1]["kwargs"]["min_value"] = 1
        suite = ExpectationSuite.from_dict(raw)

        df = spark.range(25).toDF("id")
        upstream = ExpectationSuite("upstream").add(
            "expect_table_row_count_to_be_between", min_value=1)
        up = validate(df, upstream)
        res = validate(df, suite, validation_results={"upstream": up})
        assert res.success
        assert res.results[0].result["observed_value"] == 25

    def test_roundtrip_preserves_reference_shape(self):
        raw = json.loads(
            (FIXDIR / "parameterized_expectation_suite_fixture.json").read_text()
        )
        suite = ExpectationSuite.from_dict(raw)
        out = suite.to_dict()
        assert out["expectation_suite_name"] == raw["expectation_suite_name"]
        assert [e["expectation_type"] for e in out["expectations"]] == [
            e["expectation_type"] for e in raw["expectations"]
        ]
        assert out["expectations"][0]["kwargs"] == raw["expectations"][0]["kwargs"]


@pytest.mark.skipif(not FIXDIR.exists(), reason="reference fixtures absent")
def test_expression_suite_binds_urn_arithmetic(spark):
    # parameterized_EXPRESSION fixture: bounds are
    # trunc(0.9 * <upstream row count>) .. trunc(1.1 * <...>) — chain a real
    # upstream result under the fixture's suite name and check the math
    raw = json.loads(
        (FIXDIR / "parameterized_expression_expectation_suite_fixture.json").read_text()
    )
    suite = ExpectationSuite.from_dict(raw)

    upstream_df = spark.range(30).toDF("x")
    up = validate(
        upstream_df,
        ExpectationSuite("source_patient_data.default").add(
            "expect_table_row_count_to_equal", value=30),
    )
    assert up.success

    df = spark.range(30).toDF("x")  # 30 unique values in [27, 33]
    res = validate(
        df, suite, validation_results={"source_patient_data.default": up})
    r = res.results[0]
    assert not r.exception_info.get("raised_exception"), r.exception_info
    assert r.success
    assert r.result["observed_value"] == 30


@pytest.mark.skipif(not FIXDIR.exists(), reason="reference fixtures absent")
def test_expression_suite_unresolvable_urn_is_exception_info(spark):
    # without the upstream result the $PARAMETER must surface as
    # exception_info (the reference's "No value found" behavior), never a
    # raised exception or a silent pass
    raw = json.loads(
        (FIXDIR / "parameterized_expression_expectation_suite_fixture.json").read_text()
    )
    suite = ExpectationSuite.from_dict(raw)
    res = validate(spark.range(5).toDF("x"), suite)
    r = res.results[0]
    assert not r.success
    assert r.exception_info["raised_exception"]
    assert "No value found for $PARAMETER" in r.exception_info["exception_message"]
