"""COMPLETE-tier detail payloads: unexpected_index_query,
include_unexpected_rows, and the semi-join uniqueness violation lists."""

from __future__ import annotations

from great_expectations_spark import ExpectationSuite, validate


def test_unexpected_index_query(spark):
    df = spark.createDataFrame([(1,), (2,), (300,)], "x int")
    suite = ExpectationSuite("s").add(
        "expect_column_values_to_be_between", column="x", min_value=0, max_value=10)
    res = validate(df, suite, result_format="COMPLETE")
    q = res.results[0].result["unexpected_index_query"]
    assert q.startswith("df.filter(F.expr(")
    assert "x" in q

    # opt-out knob (reference return_unexpected_index_query=False)
    res2 = validate(df, suite, result_format={
        "result_format": "COMPLETE", "return_unexpected_index_query": False})
    assert "unexpected_index_query" not in res2.results[0].result


def test_include_unexpected_rows(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (300, "c")], "x int, tag string")
    suite = ExpectationSuite("s").add(
        "expect_column_values_to_be_between", column="x", min_value=0, max_value=10)
    res = validate(df, suite, result_format={
        "result_format": "SUMMARY", "include_unexpected_rows": True})
    rows = res.results[0].result["unexpected_rows"]
    assert rows == [{"x": 300, "tag": "c"}]


def test_uniqueness_violation_list_via_semijoin(spark):
    df = spark.createDataFrame([(1,), (2,), (2,), (3,), (3,), (3,)], "x int")
    suite = ExpectationSuite("s").add("expect_column_values_to_be_unique", column="x")
    res = validate(df.repartition(4), suite, result_format="COMPLETE")
    evr = res.results[0]
    assert evr.result["unexpected_count"] == 5
    assert sorted(evr.result["unexpected_list"]) == [2, 2, 3, 3, 3]


def test_compound_uniqueness_violation_records(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], "x int, y string")
    suite = ExpectationSuite("s").add(
        "expect_compound_columns_to_be_unique", column_list=["x", "y"])
    res = validate(df, suite, result_format="COMPLETE")
    evr = res.results[0]
    assert evr.result["unexpected_count"] == 2
    assert evr.result["unexpected_list"] == [{"x": 1, "y": "a"}, {"x": 1, "y": "a"}]
