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


def test_uniqueness_index_columns_and_rows(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 20), (2, 21), (3, 30)], "x int, rid int")
    suite = ExpectationSuite("s").add("expect_column_values_to_be_unique", column="x")
    res = validate(df, suite, result_format={
        "result_format": "COMPLETE",
        "unexpected_index_column_names": ["rid"],
        "include_unexpected_rows": True})
    evr = res.results[0]
    assert sorted(evr.result["unexpected_list"]) == [2, 2]
    assert sorted(r["rid"] for r in evr.result["unexpected_index_list"]) == [20, 21]
    assert sorted(r["rid"] for r in evr.result["unexpected_rows"]) == [20, 21]


def test_uniqueness_null_duplicates_listed(spark):
    # groupBy counts NULL keys as a group; the violation list must agree
    df = spark.createDataFrame(
        [(1, "a"), (None, "b"), (None, "c")], "x int, y string")
    suite = ExpectationSuite("s").add(
        "expect_compound_columns_to_be_unique",
        column_list=["x", "y"])
    # (None,'b') vs (None,'c') differ — unique; plant equal-null dups:
    df2 = spark.createDataFrame(
        [(None, "b"), (None, "b"), (1, "a")], "x int, y string")
    res = validate(df2, suite, result_format="COMPLETE")
    evr = res.results[0]
    assert evr.result["unexpected_count"] == 2
    assert evr.result["unexpected_list"] == [
        {"x": None, "y": "b"}, {"x": None, "y": "b"}]


def test_compound_uniqueness_violation_records(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], "x int, y string")
    suite = ExpectationSuite("s").add(
        "expect_compound_columns_to_be_unique", column_list=["x", "y"])
    res = validate(df, suite, result_format="COMPLETE")
    evr = res.results[0]
    assert evr.result["unexpected_count"] == 2
    assert evr.result["unexpected_list"] == [{"x": 1, "y": "a"}, {"x": 1, "y": "a"}]
