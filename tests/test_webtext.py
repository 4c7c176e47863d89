"""Webtext operators: HTML→text extraction (the north-rule byte-identity
invariant), URL structure ops, salted per-domain stats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from great_expectations_spark import validate
from great_expectations_spark.pipeline.webtext import (
    domain_stats,
    extract_text,
    extraction_invariant_frame,
    extraction_invariant_suite,
    registered_domain,
    url_host,
    url_path,
)
from great_expectations_spark.sources.webpages import webpages


@pytest.fixture(scope="module")
def pages(spark):
    return webpages(spark, 2000, seed=7).persist()


def test_extract_text_byte_identical_on_synthetic_pages(spark, pages):
    """The generator wraps text as <html><body>text</body></html>; the
    extractor must recover it BYTE-identically wherever a real document
    exists. The planted ~1% empty-html rows are the violations the
    invariant suite is meant to catch — they extract to '' by design."""
    frame = pages.select(
        F.length("html").alias("hlen"),
        extract_text(F.col("html")).alias("extracted"),
        F.col("text").alias("expected"),
    )
    nonnull = frame.where(F.col("expected").isNotNull())
    total, ok = nonnull.where(F.col("hlen") > 0).select(
        F.count(F.lit(1)),
        F.sum((F.col("extracted") == F.col("expected")).cast("int"))).first()
    assert total > 1500
    assert ok == total
    # empty html ⇒ extracted '' ≠ expected: real violations exist
    planted = nonnull.where(F.col("hlen") == 0).count()
    assert planted > 0


def test_extract_text_handles_markup(spark):
    html = (
        b"<html><head><title>T</title><style>p{color:red}</style></head>"
        b"<body><p>Hello &amp; <b>world</b></p>"
        b"<script>var x = '<p>not text</p>';</script> bye</body></html>"
    )
    df = spark.createDataFrame([(html,), (b"",), (None,)], "html binary")
    got = [r[0] for r in df.select(extract_text(F.col("html"))).collect()]
    assert got[0] == "T Hello & world bye"
    assert got[1] == ""
    assert got[2] is None


def test_extraction_invariant_via_engine(spark, pages):
    """The invariant as an engine expectation: corrupt 10 rows, expect the
    violation count and the violating urls to surface normally."""
    frame = pages.withColumn("extracted", extract_text(F.col("html")))
    corrupted = frame.withColumn(
        "extracted",
        F.when(F.xxhash64("url") % 100 == 0, F.lit("CORRUPT"))
        .otherwise(F.col("extracted")),
    )
    res = validate(corrupted, extraction_invariant_suite(mostly=0.5),
                   result_format="BASIC")
    r = res.results[0].result
    # every non-null pair where extraction differs (planted empty-html rows
    # AND the injected corruptions) must be counted
    expected = corrupted.where(
        F.col("extracted").isNotNull() & F.col("text").isNotNull()
        & (F.col("extracted") != F.col("text"))).count()
    n_corrupt = corrupted.where(
        (F.col("extracted") == "CORRUPT") & F.col("text").isNotNull()).count()
    assert n_corrupt > 0
    assert r["unexpected_count"] == expected
    assert expected >= n_corrupt


def test_url_ops(spark):
    df = spark.createDataFrame(
        [("https://sub.news.example.com/a/b?q=1",),
         ("https://d0.example/p/1",)], "url string")
    rows = df.select(
        url_host(F.col("url")).alias("h"),
        registered_domain(F.col("url")).alias("d"),
        url_path(F.col("url")).alias("p"),
    ).collect()
    assert rows[0].h == "sub.news.example.com"
    assert rows[0].d == "example.com"
    assert rows[0].p == "/a/b"
    assert rows[1].h == "d0.example"
    assert rows[1].d == "d0.example"


def test_domain_stats_salted(spark, pages):
    stats = domain_stats(pages).collect()
    total = sum(r.pages for r in stats)
    assert total == 2000
    by_domain = {r.domain: r for r in stats}
    top = max(stats, key=lambda r: r.pages)
    # generator plants ~20% of rows on domain 0
    assert top.domain == "d0.example"
    assert 0.15 * 2000 < top.pages < 0.3 * 2000
    for r in stats:
        assert r.distinct_urls <= r.pages
    # cross-check one plain groupBy
    plain = (
        pages.select(registered_domain(F.col("url")).alias("d"))
        .groupBy("d").count().collect()
    )
    assert {r.d: r["count"] for r in plain} == {
        r.domain: r.pages for r in stats}
