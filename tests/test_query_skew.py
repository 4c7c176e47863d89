"""Query-metric escape hatch + skew-safe aggregation tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_run_query_active_batch(spark, docs):
    from great_expectations_spark.functions.querymetrics import run_query

    out = run_query(docs, "SELECT count(*) AS n FROM {active_batch}").first()
    assert out.n == docs.count()


def test_run_query_multi_table(spark, docs):
    from great_expectations_spark.functions.querymetrics import run_query

    other = docs.limit(10)
    out = run_query(
        docs,
        "SELECT (SELECT count(*) FROM {active_batch}) AS a, "
        "(SELECT count(*) FROM {other}) AS b",
        tables={"other": other},
    ).first()
    assert out.a == docs.count() and out.b == 10


def test_run_query_leaves_catalog_unchanged(spark, docs):
    """Views are dropped before return (spark.sql analyzes eagerly, so
    the returned frame survives the drop); the session catalog must be
    byte-identical after a call — including the multi-table variant."""
    from great_expectations_spark.functions.querymetrics import run_query

    def temp_views():
        return sorted(t.name for t in spark.catalog.listTables()
                      if t.isTemporary)

    before = temp_views()
    out = run_query(
        docs,
        "SELECT (SELECT count(*) FROM {active_batch}) AS a, "
        "(SELECT count(*) FROM {other}) AS b",
        tables={"other": docs.limit(3)},
    )
    assert temp_views() == before
    assert out.first().b == 3  # still collectable after the drop


def test_salted_counts_match_plain_groupby(spark, docs):
    from great_expectations_spark.functions.skew import skew_safe_value_counts

    salted = {r.lang: r.n for r in skew_safe_value_counts(docs, "lang").collect()}
    plain = {
        r.lang: r.n
        for r in docs.where(F.col("lang").isNotNull())
        .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert salted == plain


def test_salted_distinct_count(spark, docs):
    from great_expectations_spark.functions.skew import salted_group_agg

    out = salted_group_agg(
        docs.where(F.col("lang").isNotNull()),
        ["lang"],
        lambda: [F.collect_set("source").alias("s")],
        lambda: [F.size(F.array_distinct(F.flatten(F.collect_list("s")))).alias("n")],
    )
    got = {r.lang: r.n for r in out.collect()}
    want = {
        r.lang: r.n
        for r in docs.where(F.col("lang").isNotNull())
        .groupBy("lang").agg(F.countDistinct("source").alias("n")).collect()
    }
    assert got == want
