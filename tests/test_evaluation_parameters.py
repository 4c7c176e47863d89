"""Evaluation parameters: expression language, $PARAMETER binding, and
cross-suite URN chaining (reference core/evaluation_parameters.py:226-455)."""

from __future__ import annotations

import datetime

import pytest

from great_expectations_spark.core.evaluation_parameters import (
    EvaluationParameterError,
    build_evaluation_parameters,
    make_validations_resolver,
    parse_evaluation_parameter,
    parse_urn,
)


class TestExpressionLanguage:
    def test_arithmetic(self):
        assert parse_evaluation_parameter("1 + 2 * 3") == 7
        assert parse_evaluation_parameter("(1 + 2) * 3") == 9
        assert parse_evaluation_parameter("2 ^ 3 ^ 2") == 512  # right-assoc
        assert parse_evaluation_parameter("-4 / 2") == -2
        assert parse_evaluation_parameter("trunc(3.9)") == 3
        assert parse_evaluation_parameter("round(2.5)") == 2
        assert parse_evaluation_parameter("abs(-7)") == 7

    def test_constants(self):
        import math

        assert parse_evaluation_parameter("PI") == pytest.approx(math.pi)
        assert parse_evaluation_parameter("e * 2") == pytest.approx(2 * math.e)

    def test_now_and_timedelta(self):
        before = datetime.datetime.now()
        v = parse_evaluation_parameter("now()")
        assert isinstance(v, datetime.datetime) and v >= before
        v52 = parse_evaluation_parameter("now() - timedelta(weeks=52)")
        assert isinstance(v52, datetime.datetime)
        assert (datetime.datetime.now() - v52).days in (363, 364, 365)

    def test_timedelta_expression_arg(self):
        v = parse_evaluation_parameter("now() - timedelta(weeks=52*100)")
        assert (datetime.datetime.now() - v).days > 36000

    def test_variables(self):
        assert parse_evaluation_parameter("x + 1", {"x": 41}) == 42
        # single bare variable returns the RAW value (lists pass through)
        assert parse_evaluation_parameter("vs", {"vs": [1, 2, 3]}) == [1, 2, 3]

    def test_unknown_variable_raises(self):
        with pytest.raises(EvaluationParameterError):
            parse_evaluation_parameter("nope + 1")
        with pytest.raises(EvaluationParameterError):
            parse_evaluation_parameter("nope")

    def test_datetime_string_fallback(self):
        v = parse_evaluation_parameter("2020-01-01T00:00:00")
        assert v == datetime.datetime(2020, 1, 1)


class TestBuildEvaluationParameters:
    def test_substitution(self):
        kwargs = {"column": "x", "min_value": {"$PARAMETER": "lo * 2"}}
        out, subbed = build_evaluation_parameters(kwargs, {"lo": 5})
        assert out["min_value"] == 10
        assert subbed == {"min_value": 10}
        assert out["column"] == "x"

    def test_runtime_override_key(self):
        kwargs = {"min_value": {"$PARAMETER": "lo", "$PARAMETER.lo": 99}}
        out, _ = build_evaluation_parameters(kwargs, {"lo": 1})
        assert out["min_value"] == 99


class TestUrns:
    def test_parse_validations_urn(self):
        d = parse_urn(
            "urn:great_expectations:validations:suite_a:"
            "expect_table_row_count_to_be_between.result.observed_value")
        assert d["urn_type"] == "validations"
        assert d["expectation_suite_name"] == "suite_a"
        assert d["metric_name"].endswith("observed_value")

    def test_parse_urn_with_kwargs(self):
        d = parse_urn(
            "urn:great_expectations:validations:s:m.result.observed_value:column=a")
        assert d["metric_kwargs"] == "column=a"


class TestUrnChaining:
    def test_cross_suite_row_count(self, spark):
        from great_expectations_spark import ExpectationSuite, validate

        customers = spark.range(100).toDF("id")
        orders = spark.range(100).toDF("id")

        upstream = ExpectationSuite("customers_suite").add(
            "expect_table_row_count_to_be_between", min_value=1, max_value=10**9)
        up_result = validate(customers, upstream)
        assert up_result.success

        urn = ("urn:great_expectations:validations:customers_suite:"
               "expect_table_row_count_to_be_between.result.observed_value")
        downstream = ExpectationSuite("orders_suite").add(
            "expect_table_row_count_to_equal", value={"$PARAMETER": urn})
        down = validate(
            orders, downstream,
            validation_results={"customers_suite": up_result})
        assert down.success
        assert down.results[0].result["observed_value"] == 100

    def test_urn_arithmetic(self, spark):
        from great_expectations_spark import ExpectationSuite, validate

        base = spark.range(50).toDF("id")
        upstream = ExpectationSuite("up").add(
            "expect_table_row_count_to_be_between", min_value=0)
        up_result = validate(base, upstream)
        urn = ("urn:great_expectations:validations:up:"
               "expect_table_row_count_to_be_between.result.observed_value")
        down_suite = ExpectationSuite("down").add(
            "expect_table_row_count_to_be_between",
            min_value={"$PARAMETER": f"{urn} * 0.5"},
            max_value={"$PARAMETER": f"{urn} * 2"})
        down = validate(base, down_suite, validation_results={"up": up_result})
        assert down.success

    def test_missing_result_is_exception_info(self, spark):
        from great_expectations_spark import ExpectationSuite, validate

        df = spark.range(3).toDF("id")
        urn = "urn:great_expectations:validations:ghost:expect_x.result.observed_value"
        suite = ExpectationSuite("s").add(
            "expect_table_row_count_to_equal", value={"$PARAMETER": urn})
        res = validate(df, suite, validation_results={"other": None})
        assert res.results[0].exception_info["raised_exception"]

    def test_suite_level_evaluation_parameters(self, spark):
        from great_expectations_spark import ExpectationSuite, validate

        df = spark.range(10).toDF("id")
        suite = ExpectationSuite("s", evaluation_parameters={"expected_n": 10})
        suite.add("expect_table_row_count_to_equal", value={"$PARAMETER": "expected_n"})
        assert validate(df, suite).success
        # explicit parameters take priority over suite-level ones
        res = validate(df, suite, evaluation_parameters={"expected_n": 11})
        assert not res.success


class TestRowConditionNotNull:
    def test_mini_dsl_notnull(self, spark):
        from great_expectations_spark import ExpectationSuite, validate

        df = spark.createDataFrame(
            [(1, "a"), (2, None), (None, "c"), (4, "d")], "x int, y string")
        suite = ExpectationSuite("s").add(
            "expect_column_values_to_not_be_null",
            column="x",
            row_condition='col("y").notnull()',
            condition_parser="great_expectations__experimental__")
        res = validate(df, suite)
        evr = res.results[0]
        assert not evr.exception_info["raised_exception"]
        # rows with y null are excluded: x=(1, None, 4) remain, one null
        assert evr.result["element_count"] == 3
        assert evr.result["unexpected_count"] == 1
        assert not evr.success

    def test_mini_dsl_comparison_still_works(self, spark):
        from great_expectations_spark import ExpectationSuite, validate

        df = spark.createDataFrame([(1,), (2,), (3,)], "x int")
        suite = ExpectationSuite("s").add(
            "expect_table_row_count_to_equal", value=2,
            row_condition='col("x") < 3',
            condition_parser="great_expectations__experimental__")
        assert validate(df, suite).success
