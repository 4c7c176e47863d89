"""Web-text operators for Common-Crawl-style page tables
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string).

The north-rule per-row invariant is BYTE-IDENTICAL extracted text per url
versus the reference pipeline. ``extract_text`` is the deterministic
HTML→text function (drop script/style subtrees, strip tags, decode the
common entities, collapse whitespace) as an Arrow-batched pandas UDF —
pandas ``str`` ops over whole batches, never a row-at-a-time Spark UDF —
and ``extraction_invariant_suite`` wires the byte-identity check through
the engine as an ordinary pair-equality expectation, so violations surface
with the standard result-format tiers (counts + violating urls).

URL structure ops (host / registered domain / path) are pure Column
expressions (JVM ``parse_url`` / ``regexp_extract``); per-host profiling
runs through the salted aggregation in ``functions/skew.py`` because web
corpora are domain-skewed by construction (a large host can be 20% of the
crawl — see `sources/webpages.py`)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCRIPT_RE = r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>"
_TAG_RE = r"(?s)<[^>]*>"
_WS_RE = r"\s+"
_ENTITIES = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),  # &amp; LAST
]


@F.pandas_udf(T.StringType())
def _extract_text_udf(html: pd.Series) -> pd.Series:
    s = html.map(lambda b: b.decode("utf-8", errors="replace")
                 if isinstance(b, (bytes, bytearray)) else b)
    s = s.str.replace(_SCRIPT_RE, " ", regex=True)
    s = s.str.replace(_TAG_RE, " ", regex=True)
    for ent, ch in _ENTITIES:
        s = s.str.replace(ent, ch, regex=False)
    s = s.str.replace(_WS_RE, " ", regex=True).str.strip()
    return s


def extract_text(html: Column) -> Column:
    """Deterministic HTML→text extraction over a ``binary`` html column.
    Same function on every engine ⇒ byte-identical output per input —
    the property the invariant suite asserts per url."""
    return _extract_text_udf(html)


def url_host(url: Column) -> Column:
    """Hostname of an absolute URL (JVM-side ``parse_url``)."""
    return F.parse_url(url, F.lit("HOST"))


def url_path(url: Column) -> Column:
    return F.parse_url(url, F.lit("PATH"))


def registered_domain(url: Column) -> Column:
    """Last two labels of the hostname (heuristic eTLD+1 — a full public
    suffix list is a data dependency, not an algorithm change)."""
    return F.regexp_extract(url_host(url), r"([^.]+\.[^.]+)$", 1)


def extraction_invariant_frame(
    df: DataFrame, html_col: str = "html", text_col: str = "text",
    url_col: str = "url",
) -> DataFrame:
    """(url, extracted, expected, ok) — ok is BYTE equality (null-safe).
    One scan; the UDF sees only the html column."""
    ex = extract_text(F.col(html_col))
    return df.select(
        F.col(url_col).alias("url"),
        ex.alias("extracted"),
        F.col(text_col).alias("expected"),
        ex.eqNullSafe(F.col(text_col)).alias("ok"),
    )


def extraction_invariant_suite(mostly: float | None = None):
    """The invariant as an engine suite over a frame that already carries
    ``extracted`` (e.g. ``df.withColumn("extracted", extract_text(...))``):
    pair-equality compiles into the same fused agg as everything else, and
    violating urls come back through the normal violation pass."""
    from great_expectations_spark import ExpectationSuite

    kwargs = {"column_A": "extracted", "column_B": "text",
              "ignore_row_if": "either_value_is_missing"}
    if mostly is not None:
        kwargs["mostly"] = mostly
    return ExpectationSuite(name="extraction_invariant").add(
        "expect_column_pair_values_to_be_equal", **kwargs)


def domain_stats(
    df: DataFrame, url_col: str = "url", buckets: int = 16
) -> DataFrame:
    """Per-registered-domain page and distinct-url counts, aggregated with
    a salted two-stage plan (web corpora have heavy-head domains; a plain
    groupBy hotspots the top domain's partition).

    Output: (domain, pages, distinct_urls)."""
    from great_expectations_spark.functions.skew import salted_group_agg

    keyed = df.select(
        registered_domain(F.col(url_col)).alias("domain"),
        F.col(url_col).alias("__url"),
    )
    pages = salted_group_agg(
        keyed,
        ["domain"],
        lambda: [F.count(F.lit(1)).alias("__partial")],
        lambda: [F.sum("__partial").alias("pages")],
        buckets=buckets,
    )
    # distinct urls per domain: two-stage distinct (url first — spreads the
    # hot domain across its urls), then a count that is no longer skewed
    distinct = (
        keyed.distinct()
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("distinct_urls"))
    )
    # eqNullSafe: the NULL-domain group (unparseable urls) must still get
    # its distinct_urls — a plain equality join never matches NULL keys
    return pages.join(
        distinct.withColumnRenamed("domain", "__d"),
        on=pages["domain"].eqNullSafe(F.col("__d")),
        how="left",
    ).drop("__d")
