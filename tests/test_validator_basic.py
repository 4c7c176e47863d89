"""Engine correctness on small inline frames — mirrors the semantics of the
reference's golden JSON corpus (SURVEY.md §5): counts, mostly, vacuous truth,
missing-column exceptions, violation lists per result_format tier."""

import pytest

from great_expectations_spark import ExpectationSuite, validate
from great_expectations_spark.plans.compiler import Options


@pytest.fixture(scope="module")
def xyz(spark):
    return spark.createDataFrame(
        [(1, 1.1, "hello"), (2, 2.2, "jello"), (4, 5.5, "mello"), (None, None, None)],
        "x int, y double, z string",
    )


def _one(df, etype, **kwargs):
    rf = kwargs.pop("result_format", "BASIC")
    suite = ExpectationSuite(name="t").add(etype, **kwargs)
    res = validate(df, suite, result_format=rf)
    return res.results[0]


def test_not_null(xyz):
    r = _one(xyz, "expect_column_values_to_not_be_null", column="x")
    assert not r.success
    assert r.result["element_count"] == 4
    assert r.result["unexpected_count"] == 1
    assert r.result["missing_count"] == 0
    r = _one(xyz, "expect_column_values_to_not_be_null", column="x", mostly=0.7)
    assert r.success


def test_in_set(xyz):
    r = _one(xyz, "expect_column_values_to_be_in_set", column="z",
             value_set=["hello", "jello", "mello"])
    assert r.success
    assert r.result["missing_count"] == 1  # the null row is missing, not unexpected
    r = _one(xyz, "expect_column_values_to_be_in_set", column="z", value_set=["hello"])
    assert not r.success
    assert r.result["unexpected_count"] == 2
    assert sorted(r.result["partial_unexpected_list"]) == ["jello", "mello"]


def test_between_strict(xyz):
    r = _one(xyz, "expect_column_values_to_be_between", column="x", min_value=1, max_value=4)
    assert r.success
    r = _one(xyz, "expect_column_values_to_be_between", column="x", min_value=1,
             max_value=4, strict_max=True)
    assert not r.success and r.result["unexpected_count"] == 1


def test_regex_and_lengths(xyz):
    r = _one(xyz, "expect_column_values_to_match_regex", column="z", regex="^.ello$")
    assert r.success
    r = _one(xyz, "expect_column_value_lengths_to_equal", column="z", value=5)
    assert r.success
    r = _one(xyz, "expect_column_value_lengths_to_be_between", column="z",
             min_value=1, max_value=4)
    assert not r.success and r.result["unexpected_count"] == 3


def test_vacuous_truth(spark):
    df = spark.createDataFrame([(None,), (None,)], "a string")
    r = _one(df, "expect_column_values_to_match_regex", column="a", regex="x")
    assert r.success  # all-null domain → vacuously true
    assert r.result["unexpected_percent"] is None


def test_missing_column_exception(xyz):
    r = _one(xyz, "expect_column_values_to_not_be_null", column="nope")
    assert not r.success
    assert r.exception_info["raised_exception"]


def test_aggregates(xyz):
    r = _one(xyz, "expect_column_mean_to_be_between", column="y", min_value=2.9, max_value=3.0)
    assert r.success and abs(r.result["observed_value"] - (1.1 + 2.2 + 5.5) / 3) < 1e-9
    r = _one(xyz, "expect_column_sum_to_be_between", column="x", min_value=7, max_value=7)
    assert r.success
    r = _one(xyz, "expect_column_min_to_be_between", column="x", min_value=0, max_value=1)
    assert r.success
    r = _one(xyz, "expect_column_max_to_be_between", column="x", min_value=5)
    assert not r.success
    r = _one(xyz, "expect_column_stdev_to_be_between", column="x", min_value=1.0, max_value=2.0)
    assert r.success


def test_unique_value_counts(xyz):
    r = _one(xyz, "expect_column_unique_value_count_to_be_between", column="z",
             min_value=3, max_value=3)
    assert r.success and r.result["observed_value"] == 3
    r = _one(xyz, "expect_column_proportion_of_unique_values_to_be_between", column="z",
             min_value=1.0)
    assert r.success


def test_distinct_sets(xyz):
    r = _one(xyz, "expect_column_distinct_values_to_be_in_set", column="x",
             value_set=[1, 2, 4, 8])
    assert r.success and r.result["observed_value"] == [1, 2, 4]
    r = _one(xyz, "expect_column_distinct_values_to_contain_set", column="x", value_set=[1, 8])
    assert not r.success
    r = _one(xyz, "expect_column_distinct_values_to_equal_set", column="x", value_set=[1, 2, 4])
    assert r.success


def test_uniqueness(spark):
    df = spark.createDataFrame(
        [("a", 1), ("b", 2), ("a", 3), (None, 4)], "k string, v int"
    )
    r = _one(df, "expect_column_values_to_be_unique", column="k")
    assert not r.success
    assert r.result["unexpected_count"] == 2  # both 'a' rows
    assert r.result["missing_count"] == 1
    assert r.result["partial_unexpected_list"] == ["a", "a"]
    r = _one(df, "expect_column_values_to_be_unique", column="v")
    assert r.success


def test_compound_unique(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 1)], "k string, v int"
    )
    r = _one(df, "expect_compound_columns_to_be_unique", column_list=["k", "v"])
    assert not r.success and r.result["unexpected_count"] == 2


def test_pairs(spark):
    df = spark.createDataFrame(
        [(2, 1), (3, 1), (1, 2), (None, 5)], "a int, b int"
    )
    r = _one(df, "expect_column_pair_values_a_to_be_greater_than_b",
             column_A="a", column_B="b", ignore_row_if="either_value_is_missing")
    assert not r.success
    assert r.result["element_count"] == 4
    assert r.result["missing_count"] == 1
    assert r.result["unexpected_count"] == 1
    r = _one(df, "expect_column_pair_values_to_be_equal", column_A="a", column_B="b",
             ignore_row_if="either_value_is_missing")
    assert r.result["unexpected_count"] == 3


def test_multicolumn_sum(spark):
    df = spark.createDataFrame([(1, 2), (2, 1), (3, 3)], "a int, b int")
    r = _one(df, "expect_multicolumn_sum_to_equal", column_list=["a", "b"], sum_total=3)
    assert not r.success and r.result["unexpected_count"] == 1


def test_unique_within_record(spark):
    df = spark.createDataFrame([(1, 2, 3), (1, 1, 3)], "a int, b int, c int")
    r = _one(df, "expect_select_column_values_to_be_unique_within_record",
             column_list=["a", "b", "c"])
    assert not r.success and r.result["unexpected_count"] == 1


def test_table_and_schema(xyz):
    r = _one(xyz, "expect_table_row_count_to_be_between", min_value=4, max_value=4)
    assert r.success and r.result["observed_value"] == 4
    r = _one(xyz, "expect_table_row_count_to_equal", value=5)
    assert not r.success
    r = _one(xyz, "expect_column_to_exist", column="x")
    assert r.success
    r = _one(xyz, "expect_table_columns_to_match_ordered_list", column_list=["x", "y", "z"])
    assert r.success
    r = _one(xyz, "expect_table_columns_to_match_set", column_set=["z", "y", "x"])
    assert r.success
    r = _one(xyz, "expect_table_column_count_to_equal", value=3)
    assert r.success
    r = _one(xyz, "expect_column_values_to_be_of_type", column="x", type_="IntegerType")
    assert r.success and r.result["observed_value"] == "int"
    r = _one(xyz, "expect_column_values_to_be_in_type_list", column="y",
             type_list=["float", "double"])
    assert r.success


def test_zscore(spark):
    data = [(float(i),) for i in range(100)] + [(1000.0,)]
    df = spark.createDataFrame(data, "v double")
    r = _one(df, "expect_column_value_z_scores_to_be_less_than", column="v",
             threshold=3, double_sided=True)
    assert not r.success
    assert r.result["unexpected_count"] == 1
    assert r.result["partial_unexpected_list"] == [1000.0]


def test_monotonic(spark):
    df = spark.createDataFrame([(1, 1), (2, 3), (3, 2), (4, 5)], "o int, v int")
    r = _one(df, "expect_column_values_to_be_increasing", column="v", order_by="o")
    assert not r.success and r.result["unexpected_count"] == 1
    df2 = spark.createDataFrame([(1, 1), (2, 3), (3, 3)], "o int, v int")
    r = _one(df2, "expect_column_values_to_be_increasing", column="v", order_by="o")
    assert r.success
    r = _one(df2, "expect_column_values_to_be_increasing", column="v", order_by="o",
             strictly=True)
    assert not r.success


def test_row_condition(xyz):
    r = _one(xyz, "expect_column_values_to_be_between", column="x",
             min_value=1, max_value=2, row_condition="x < 4", condition_parser="spark")
    assert r.success
    assert r.result["element_count"] == 2


def test_result_format_tiers(spark):
    df = spark.createDataFrame([(i % 3,) for i in range(30)], "v int")
    suite = ExpectationSuite(name="t").add(
        "expect_column_values_to_be_in_set", column="v", value_set=[0, 1]
    )
    r0 = validate(df, suite, result_format="BOOLEAN_ONLY").results[0]
    assert "partial_unexpected_list" not in r0.result
    r1 = validate(df, suite, result_format="SUMMARY").results[0]
    assert r1.result["partial_unexpected_counts"] == [{"value": 2, "count": 10}]
    r2 = validate(df, suite, result_format="COMPLETE").results[0]
    assert len(r2.result["unexpected_list"]) == 10


def test_other_table_and_referential(spark):
    main = spark.createDataFrame([("u1",), ("u2",), ("u3",), (None,)], "u string")
    ref = spark.createDataFrame([("u1",), ("u3",)], "u string")
    suite = ExpectationSuite(name="t")
    suite.add("expect_table_row_count_to_equal_other_table", other_table_name="ref")
    suite.add("expect_column_values_to_be_in_other_table", column="u",
              other_table_name="ref", other_column="u")
    res = validate(main, suite, tables={"ref": ref})
    assert not res.results[0].success  # 4 != 2
    r = res.results[1]
    assert not r.success
    assert r.result["unexpected_count"] == 1
    assert r.result["partial_unexpected_list"] == ["u2"]


def test_quantiles(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "v double")
    r = _one(df, "expect_column_quantile_values_to_be_between", column="v",
             quantile_ranges={"quantiles": [0.5, 0.9],
                              "value_ranges": [[45, 55], [85, 95]]})
    assert r.success
    obs = r.result["observed_value"]
    assert obs["quantiles"] == [0.5, 0.9]


def test_median(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "v double")
    r = _one(df, "expect_column_median_to_be_between", column="v", min_value=2, max_value=2)
    assert r.success


def test_most_common(spark):
    df = spark.createDataFrame([("a",), ("a",), ("b",)], "v string")
    r = _one(df, "expect_column_most_common_value_to_be_in_set", column="v", value_set=["a"])
    assert r.success and r.result["observed_value"] == ["a"]


def test_suite_statistics(xyz):
    suite = ExpectationSuite(name="s")
    suite.add("expect_column_values_to_not_be_null", column="x")
    suite.add("expect_table_row_count_to_equal", value=4)
    res = validate(xyz, suite)
    assert res.statistics["evaluated_expectations"] == 2
    assert res.statistics["successful_expectations"] == 1
    assert not res.success


def test_parallel_eager_matches_sequential(spark):
    """Suites with several independent eager jobs (uniqueness, KL
    value-counts, referential) produce identical results whether the jobs
    are submitted concurrently (default) or sequentially."""
    from great_expectations_spark.plans.compiler import Options

    df = spark.createDataFrame(
        [(1, "en"), (2, "en"), (2, "de"), (3, "fr"), (4, None)],
        "id long, lang string")
    other = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    suite = (
        ExpectationSuite(name="par")
        .add("expect_column_values_to_be_unique", column="id")
        .add("expect_column_kl_divergence_to_be_less_than", column="lang",
             partition_object={"values": ["en", "de", "fr"],
                               "weights": [0.5, 0.25, 0.25]}, threshold=5.0)
        .add("expect_column_values_to_be_in_other_table",
             column="id", other_table_name="t", other_column="id")
    )

    def run(parallel):
        res = validate(df, suite, tables={"t": other},
                       result_format="SUMMARY",
                       options=Options(parallel_eager=parallel))
        return [(r.expectation_config.expectation_type, r.success,
                 r.result.get("unexpected_count"),
                 r.result.get("observed_value")) for r in res.results]

    assert run(True) == run(False)


def test_parallel_eager_exception_maps_to_its_expectation(spark):
    """A failing eager job marks ITS expectation with exception_info and
    leaves sibling eager results intact (concurrent submission must not
    cross wires)."""
    from great_expectations_spark.plans.compiler import Options

    df = spark.createDataFrame([(1, "a"), (1, "b")], "id long, v string")
    suite = (
        ExpectationSuite(name="exc")
        .add("expect_column_values_to_be_unique", column="id")
        # other_table missing from tables= -> the referential eager raises
        .add("expect_column_values_to_be_in_other_table",
             column="id", other_table_name="missing", other_column="id")
    )
    res = validate(df, suite, result_format="BASIC",
                   options=Options(parallel_eager=True))
    by_type = {r.expectation_config.expectation_type: r for r in res.results}
    uniq = by_type["expect_column_values_to_be_unique"]
    ref = by_type["expect_column_values_to_be_in_other_table"]
    assert not uniq.success and uniq.result["unexpected_count"] == 2
    assert ref.exception_info["raised_exception"]
