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


# ------------------------------------------------- URL canonicalization


def test_canonical_url_cases(spark):
    from great_expectations_spark.pipeline.webtext import canonical_url

    cases = [
        # scheme/host case + default port + fragment
        ("HtTpS://WWW.Example.COM:443/Path/Pg#frag",
         "https://www.example.com/Path/Pg"),
        ("http://Example.com:80/", "http://example.com/"),
        ("http://example.com:8080/x", "http://example.com:8080/x"),
        # tracking params stripped, rest sorted, empty query dropped
        ("https://a.io/p?utm_source=feed&b=2&a=1", "https://a.io/p?a=1&b=2"),
        ("https://a.io/p?gclid=xyz&utm_campaign=q", "https://a.io/p"),
        ("https://a.io/p?z=9&fbclid=abc&y=8#sec", "https://a.io/p?y=8&z=9"),
        ("https://a.io/p?ref", "https://a.io/p"),
        # empty path → /
        ("https://a.io", "https://a.io/"),
        ("https://a.io?b=1", "https://a.io/?b=1"),
        # relative / garbage input passes through
        ("/just/a/path", "/just/a/path"),
        ("not a url", "not a url"),
        # case preserved in path and query VALUES
        ("https://A.io/Mixed/Case?Key=Val", "https://a.io/Mixed/Case?Key=Val"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["c"] for r in
           df.select(canonical_url(F.col("url")).alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_canonical_url_null_passthrough(spark):
    from great_expectations_spark.pipeline.webtext import canonical_url

    df = spark.createDataFrame([(None,)], "url string")
    assert df.select(canonical_url(F.col("url")).alias("c")).first()["c"] is None


def test_resolve_revisits_latest_wins(spark):
    from great_expectations_spark.pipeline.webtext import resolve_revisits

    rows = [
        ("https://a.io/p?utm_source=x", "2024-01-01 00:00:00", 1),
        ("https://A.IO/p", "2024-01-03 00:00:00", 2),   # same canonical, later
        ("https://a.io/p#frag", "2024-01-02 00:00:00", 3),
        ("https://b.io/q", "2024-01-01 00:00:00", 4),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts string, rev long") \
        .withColumn("warc_ts", F.to_timestamp("warc_ts"))
    out = resolve_revisits(df, "url", "warc_ts", tiebreak=["rev"])
    got = {r["canonical_url"]: r["rev"] for r in out.collect()}
    assert got == {"https://a.io/p": 2, "https://b.io/q": 4}
    # original columns preserved after canonical_url
    assert out.columns == ["canonical_url", "url", "warc_ts", "rev"]


def test_resolve_revisits_tiebreak_deterministic(spark):
    from great_expectations_spark.pipeline.webtext import resolve_revisits

    rows = [("https://a.io/p", "2024-01-01 00:00:00", i) for i in (3, 9, 5)]
    df = spark.createDataFrame(rows, "url string, warc_ts string, rev long") \
        .withColumn("warc_ts", F.to_timestamp("warc_ts")).repartition(5)
    for _ in range(3):
        out = resolve_revisits(df, "url", "warc_ts", tiebreak=["rev"])
        assert [r["rev"] for r in out.collect()] == [9]


def test_domain_cap_keeps_topk_per_domain(spark):
    from great_expectations_spark.pipeline.webtext import domain_cap

    rows = []
    for d, n in (("big", 40), ("mid", 7), ("tiny", 2)):
        for i in range(n):
            rows.append((f"https://{d}.example/p/{i}", (i * 13) % n, i))
    df = spark.createDataFrame(rows, "url string, quality long, i long")
    out = domain_cap(df, "url", k=5,
                     order_by=[F.col("quality").desc(), F.col("i").asc()])
    kept = {}
    for r in out.collect():
        dom = r["url"].split("//")[1].split(".")[0]
        kept.setdefault(dom, []).append((r["quality"], r["i"]))
    assert len(kept["big"]) == 5 and len(kept["mid"]) == 5 and len(kept["tiny"]) == 2
    # exact top-5 by (quality desc, i asc) for the big domain
    expect_big = sorted(((i * 13) % 40, i) for i in range(40))
    expect_big = sorted(expect_big, key=lambda t: (-t[0], t[1]))[:5]
    assert sorted(kept["big"], key=lambda t: (-t[0], t[1])) == expect_big
    assert "__domain" not in out.columns and "__rk" not in out.columns


def test_domain_cap_partitioning_invariant(spark):
    from great_expectations_spark.pipeline.webtext import domain_cap

    rows = [(f"https://only.example/p/{i}", i) for i in range(30)]
    df = spark.createDataFrame(rows, "url string, i long")
    a = domain_cap(df, "url", k=4, order_by=[F.col("i").desc()],
                   salt_buckets=3)
    b = domain_cap(df.repartition(11), "url", k=4,
                   order_by=[F.col("i").desc()], salt_buckets=16)
    assert sorted(r["i"] for r in a.collect()) == sorted(r["i"] for r in b.collect()) == [26, 27, 28, 29]


def test_resolve_revisits_reresolvable(spark):
    from great_expectations_spark.pipeline.webtext import resolve_revisits

    df = spark.createDataFrame(
        [("https://a.io/p?utm_source=x", 1, 10), ("https://A.IO/p", 2, 20)],
        "url string, snap long, rev long")
    once = resolve_revisits(df, "url", "snap", tiebreak=["rev"])
    twice = resolve_revisits(once, "canonical_url", "snap",
                             canonicalize=False, tiebreak=["rev"])
    assert twice.columns.count("canonical_url") == 1
    assert [r["rev"] for r in twice.collect()] == [20]


# ----------------------------------------------------------- blocklist


def test_host_suffixes(spark):
    from great_expectations_spark.pipeline.webtext import host_suffixes
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("https://A.Tracker.Example/x?q=1",),
         ("https://example/x",)], "url string")
    got = [r[0] for r in df.select(host_suffixes(F.col("url"))).collect()]
    assert got[0] == ["a.tracker.example", "tracker.example", "example"]
    assert got[1] == ["example"]


def test_blocklist_losers_and_filter(spark):
    from great_expectations_spark.pipeline.webtext import (
        blocklist_filter, blocklist_losers)

    rows = [
        (1, "https://ads.bad.example/p"),      # subdomain of blocked
        (2, "https://bad.example/p"),          # exact blocked
        (3, "https://good.example/p"),         # clean
        (4, "https://notbad.example/p"),       # suffix must respect labels
        (5, "https://cdn.Other.Example/p"),    # case-insensitive exact host
        (6, None),                             # NULL url never matches
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    bl = spark.createDataFrame(
        [("bad.example",), ("CDN.other.example",), (None,)], "domain string")
    losers = sorted(r["id"] for r in blocklist_losers(
        df, bl, "doc_id", "url").collect())
    assert losers == [1, 2, 5]
    kept = sorted(r["doc_id"] for r in blocklist_filter(
        df, bl, "doc_id", "url").collect())
    assert kept == [3, 4, 6]


def test_blocklist_stage_in_recipe(spark):
    from pyspark.sql import functions as F

    from great_expectations_spark.pipeline.recipes import (
        blocklist_stage, predicate_stage, run_recipe)

    df = spark.createDataFrame(
        [(1, "https://spam.example/x", "ok text here"),
         (2, "https://fine.example/x", "ok text here too"),
         (3, "https://fine.example/y", None)],
        "doc_id long, url string, text string")
    bl = spark.createDataFrame([("spam.example",)], "domain string")
    recipe = [
        predicate_stage("nonnull", lambda d: F.col("text").isNotNull()),
        blocklist_stage("ut1", bl),   # id_col flows from run_recipe
    ]
    got = {r["doc_id"]: r["rejected_by"]
           for r in run_recipe(df, recipe, "doc_id").annotated.collect()}
    assert got == {1: "ut1", 2: None, 3: "nonnull"}
