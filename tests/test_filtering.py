"""Suite-as-filter: row rejection semantics mirror validation exactly."""

import pytest

from great_expectations_spark.core.suite import ExpectationSuite
from great_expectations_spark.pipeline.filtering import (
    annotate_suite,
    reason_label,
    rejection_stats,
    split_by_suite,
)
from great_expectations_spark.plans.compiler import CompileError


@pytest.fixture()
def docs(spark):
    rows = [
        # (doc_id, text, lang, source)
        (1, "good long text here", "en", "src1"),   # passes everything
        (2, None, "en", "src2"),                    # fails not_null(text)
        (3, "ok", "xx", "src3"),                    # fails lengths + in_set(lang)
        (4, "fine document text", None, "src4"),    # lang NULL: missing, NOT a rejection
        (5, "another good text", "de", "bad9"),     # fails regex(source)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def _suite():
    return (
        ExpectationSuite(name="clean")
        .add("expect_column_values_to_not_be_null", column="text")
        .add("expect_column_value_lengths_to_be_between",
             column="text", min_value=5, max_value=100)
        .add("expect_column_values_to_be_in_set", column="lang", value_set=["en", "de"])
        .add("expect_column_values_to_match_regex", column="source", regex="^src")
    )


def test_annotate_reasons_and_missing_domain_semantics(docs):
    ann = {r["doc_id"]: r for r in annotate_suite(docs, _suite()).collect()}
    assert ann[1]["passed"] and ann[1]["failed_expectations"] == []
    assert ann[2]["failed_expectations"] == ["expect_column_values_to_not_be_null(text)"]
    assert ann[3]["failed_expectations"] == [
        "expect_column_value_lengths_to_be_between(text)",
        "expect_column_values_to_be_in_set(lang)",
    ]
    # null lang under in_set: domain missing -> not a rejection
    assert ann[4]["passed"]
    assert ann[5]["failed_expectations"] == ["expect_column_values_to_match_regex(source)"]


def test_split_partitions_the_table(docs):
    kept, rejected = split_by_suite(docs, _suite())
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 4]
    rej = {r["doc_id"]: r["failed_expectations"] for r in rejected.collect()}
    assert set(rej) == {2, 3, 5}
    assert kept.columns == docs.columns  # original schema restored
    assert "failed_expectations" in rejected.columns


def test_rejection_stats_single_fused_pass(docs):
    stats = {r["reason"]: (r["failed_count"], r["failed_percent"])
             for r in rejection_stats(docs, _suite()).collect()}
    assert stats["__total__"][0] == 5
    assert stats["__any__"][0] == 3
    assert stats["expect_column_values_to_not_be_null(text)"][0] == 1
    assert stats["expect_column_value_lengths_to_be_between(text)"][0] == 1
    assert stats["expect_column_values_to_be_in_set(lang)"][0] == 1
    assert stats["expect_column_values_to_match_regex(source)"][0] == 1
    assert stats["__any__"][1] == 60.0


def test_filter_matches_validation_unexpected_counts(docs):
    """The filter's per-reason counts ARE the validator's unexpected_counts."""
    from great_expectations_spark import validate

    suite = _suite()
    result = validate(docs, suite, result_format="BASIC")
    stats = {r["reason"]: r["failed_count"]
             for r in rejection_stats(docs, suite).collect()}
    for evr in result.results:
        reason = reason_label(evr.expectation_config)
        assert stats[reason] == evr.result["unexpected_count"]


def test_strict_raises_on_aggregate_expectation(docs):
    suite = _suite().add("expect_column_mean_to_be_between", column="doc_id", min_value=0)
    with pytest.raises(CompileError, match="not a row-level"):
        annotate_suite(docs, suite)
    # strict=False skips the aggregate and filters on the rest
    kept, _ = split_by_suite(docs, suite, strict=False)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 4]


def test_row_condition_narrows_the_filter(docs):
    suite = ExpectationSuite(name="rc").add(
        "expect_column_values_to_match_regex", column="source", regex="^src",
        row_condition="lang = 'de'", condition_parser="spark")
    # only doc 5 (lang=de, source=bad9) is in-domain and failing
    kept, rejected = split_by_suite(docs, suite)
    assert sorted(r["doc_id"] for r in rejected.collect()) == [5]
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 2, 3, 4]


def test_duplicate_reason_disambiguated(docs):
    suite = (
        ExpectationSuite(name="dup")
        .add("expect_column_values_to_match_regex", column="source", regex="^src")
        .add("expect_column_values_to_match_regex", column="source", regex="1$")
    )
    ann = {r["doc_id"]: r["failed_expectations"]
           for r in annotate_suite(docs, suite).collect()}
    assert ann[5] == ["expect_column_values_to_match_regex(source)",
                      "expect_column_values_to_match_regex(source)#1"]


def test_annotate_is_single_scan_no_shuffle(docs):
    plan = annotate_suite(docs, _suite())._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure projection: no shuffle anywhere
