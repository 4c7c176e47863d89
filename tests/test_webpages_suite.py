"""Suite-level test on the synthetic Common-Crawl-style table (north-rule
input shape) with planted anomalies at known rates."""

import pytest
from pyspark.sql import functions as F

from great_expectations_spark import validate
from great_expectations_spark.sources.webpages import webpages, webpages_ref
from great_expectations_spark.suites import prepare_webpages, webpage_suite

N = 4000


@pytest.fixture(scope="module")
def pages(spark):
    return prepare_webpages(webpages(spark, N)).cache()


def test_generator_deterministic(spark):
    a = webpages(spark, 200, partitions=2).orderBy("url").collect()
    b = webpages(spark, 200, partitions=7).orderBy("url").collect()
    assert a == b  # partitioning-independent determinism


def test_text_per_url_invariant(pages):
    # byte-identical text per url (the north-rule per-row invariant)
    bad = (
        pages.groupBy("url")
        .agg(F.countDistinct("text").alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert bad == 0


def test_planted_anomaly_rates(pages):
    n = pages.count()
    assert n == N
    dup_rows = n - pages.select("url").distinct().count()
    assert 0.02 * n < dup_rows < 0.08 * n  # ~5% duplicate urls
    nulls = pages.where(F.col("text").isNull()).count()
    assert 0.01 * n < nulls < 0.06 * n  # ~3% null text
    bad_lang = pages.where(F.col("lang") == "zz").count()
    assert 0 < bad_lang < 0.02 * n  # ~0.5% invalid lang


def test_flagship_suite(spark, pages):
    ref = webpages_ref(spark, N)
    res = validate(pages, webpage_suite(), tables={"webpages_ref": ref},
                   result_format="SUMMARY")
    by_type = {}
    for r in res.results:
        key = (r.expectation_config.expectation_type,
               r.expectation_config.kwargs.get("column"))
        by_type[key] = r
    # no expectation should blow up
    assert all(not r.exception_info["raised_exception"] for r in res.results)
    # planted violations are detected but within mostly-tolerance
    uniq = by_type[("expect_column_values_to_be_unique", "url")]
    assert uniq.success and uniq.result["unexpected_count"] > 0
    lang = by_type[("expect_column_values_to_be_in_set", "lang")]
    assert lang.success and lang.result["unexpected_count"] > 0
    kl = by_type[("expect_column_kl_divergence_to_be_less_than", "lang")]
    assert kl.result["observed_value"] is not None
    assert kl.result["observed_value"] < 0.1
    ref_check = by_type[("expect_column_values_to_be_in_other_table", "url")]
    assert ref_check.result["unexpected_count"] > 0  # the held-out 2%
    assert ref_check.success  # but within mostly=0.9
    assert res.statistics["evaluated_expectations"] == len(res.results)
