"""Canonical suites.

``webpage_suite`` is the flagship: the full expectation battery from the
north rule (nulls, uniqueness, set membership, regex, aggregates, quantiles,
KL-divergence drift, referential) over the Common-Crawl-style table
(url, warc_ts, html, text, lang). ``prepare_webpages`` derives the numeric
columns the aggregate/distribution expectations need (text_len) — derived
natively so everything still rides the single fused scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from great_expectations_spark.core.suite import ExpectationSuite
from great_expectations_spark.sources.webpages import LANGS


def prepare_webpages(df: DataFrame) -> DataFrame:
    return df.withColumn("text_len", F.length("text")).withColumn(
        "html_len", F.length("html")
    )


def webpage_suite(with_referential: bool = True) -> ExpectationSuite:
    s = ExpectationSuite(name="webpages")
    s.add("expect_table_row_count_to_be_between", min_value=1)
    s.add("expect_table_columns_to_match_set",
          column_set=["url", "warc_ts", "html", "text", "lang", "text_len", "html_len"],
          exact_match=False)
    s.add("expect_column_values_to_be_of_type", column="url", type_="string")
    s.add("expect_column_values_to_not_be_null", column="url")
    s.add("expect_column_values_to_match_regex", column="url", regex=r"^https?://")
    s.add("expect_column_values_to_be_unique", column="url", mostly=0.85)
    s.add("expect_column_values_to_not_be_null", column="text", mostly=0.95)
    s.add("expect_column_values_to_not_be_null", column="warc_ts")
    s.add("expect_column_values_to_be_between", column="warc_ts",
          min_value="2024-01-01 00:00:00", max_value="2025-01-01 00:00:00")
    s.add("expect_column_values_to_be_in_set", column="lang",
          value_set=LANGS, mostly=0.99)
    s.add("expect_column_unique_value_count_to_be_between", column="lang",
          min_value=2, max_value=20)
    s.add("expect_column_value_lengths_to_be_between", column="url",
          min_value=10, max_value=2048)
    s.add("expect_column_mean_to_be_between", column="text_len",
          min_value=1, max_value=100_000)
    s.add("expect_column_max_to_be_between", column="text_len", max_value=200_000)
    s.add("expect_column_quantile_values_to_be_between", column="text_len",
          quantile_ranges={"quantiles": [0.25, 0.5, 0.75],
                           "value_ranges": [[0, 100_000]] * 3})
    s.add("expect_column_value_z_scores_to_be_less_than", column="text_len",
          threshold=6, double_sided=True, mostly=0.999)
    # distribution drift: lang share should track the generator's mixture
    # weights MUST sum to 1 (reference is_valid_partition_object); the
    # ~0.5% invalid-lang tail is absorbed via tail_weight_holdout
    s.add("expect_column_kl_divergence_to_be_less_than", column="lang",
          partition_object={
              "values": LANGS,
              "weights": [0.605, 0.15, 0.08, 0.06, 0.04, 0.03, 0.02, 0.015],
          },
          threshold=0.1, tail_weight_holdout=0.01)
    if with_referential:
        s.add("expect_column_values_to_be_in_other_table", column="url",
              other_table_name="webpages_ref", other_column="url", mostly=0.9)
    return s
