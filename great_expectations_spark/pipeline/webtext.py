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


# --------------------------------------------------- URL canonicalization

# tracking parameters stripped by canonical_url: the name alone or name=value
_TRACKING_PARAM_RE = (
    r"^(utm_[^=&]*|fbclid|gclid|msclkid|yclid|igshid|spm|ref|mc_cid|mc_eid)(=.*)?$"
)
_URL_SPLIT_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?"


def canonical_url(url: Column) -> Column:
    """Deterministic URL canonical form — the dedup key for revisit
    resolution and cross-snapshot URL dedup:

    * scheme and authority lowercased; default ports (``:80`` http,
      ``:443`` https) stripped;
    * fragment dropped;
    * tracking query parameters removed (``utm_*``, ``fbclid``, ``gclid``,
      ``msclkid``, ``yclid``, ``igshid``, ``spm``, ``ref``, ``mc_cid``,
      ``mc_eid``), remaining parameters sorted so param order never splits
      a URL's identity; empty query dropped;
    * empty path becomes ``/``.

    Pure Column expressions (regexp split + higher-order array ops, no UDF);
    non-absolute inputs (no ``scheme://``) pass through unchanged.
    """
    scheme = F.lower(F.regexp_extract(url, _URL_SPLIT_RE, 1))
    auth = F.lower(F.regexp_extract(url, _URL_SPLIT_RE, 2))
    auth = F.when(scheme == "http", F.regexp_replace(auth, ":80$", "")) \
        .when(scheme == "https", F.regexp_replace(auth, ":443$", "")) \
        .otherwise(auth)
    path = F.regexp_extract(url, _URL_SPLIT_RE, 3)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    rawq = F.regexp_replace(F.regexp_extract(url, _URL_SPLIT_RE, 4), r"^\?", "")
    params = F.array_sort(F.filter(
        F.split(rawq, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_PARAM_RE),
    ))
    query = F.when(F.size(params) > 0,
                   F.concat(F.lit("?"), F.array_join(params, "&"))) \
        .otherwise(F.lit(""))
    rebuilt = F.concat(scheme, F.lit("://"), auth, path, query)
    return F.when(scheme == "", url).otherwise(rebuilt)


def resolve_revisits(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    *,
    canonicalize: bool = True,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """One row per (canonical) URL — the LATEST snapshot wins. The crawl
    revisit policy for Common-Crawl-style tables: the same page fetched in
    several WARC segments collapses to its newest capture.

    ``max_by(row, (ts, *tiebreak))`` is a commutative monoid, so the plan is
    one groupBy with map-side partial aggregation — a hot URL (redirect
    targets, parked domains) contributes one candidate row per map
    partition, never a single-task window. Pass ``tiebreak`` (e.g. a record
    id) to make equal-timestamp winners deterministic.

    Output: the input columns plus ``canonical_url`` first (an existing
    ``canonical_url`` input column — e.g. when re-resolving this function's
    own output — is replaced, not duplicated).
    """
    canon = (canonical_url(F.col(url_col)) if canonicalize
             else F.col(url_col)).alias("canonical_url")
    order = F.struct(F.col(ts_col), *[F.col(c) for c in (tiebreak or [])])
    row = F.struct(*[F.col(c) for c in df.columns if c != "canonical_url"])
    return (
        df.select(canon, order.alias("__ord"), row.alias("__row"))
        .groupBy("canonical_url")
        .agg(F.max_by("__row", "__ord").alias("__r"))
        .select("canonical_url", "__r.*")
    )


def domain_cap(
    df: DataFrame,
    url_col: str = "url",
    k: int = 100,
    order_by: list[Column] | None = None,
    salt_buckets: int = 16,
) -> DataFrame:
    """At most ``k`` pages per registered domain, keeping the top-k under
    ``order_by`` (default: url ascending — pass quality DESC + a unique id
    for a deterministic quality cap). The anti-spam quota every web corpus
    applies before training.

    Skew-safe two-phase top-k: a window over ``(domain, salt)`` first
    (bounds any task to domain_size / salt_buckets rows), then the final
    window over the ≤ k·salt_buckets survivors per domain — the head
    domain of a crawl (often 10-20% of pages) never lands on one task.
    ``order_by`` must be a total order for deterministic output.
    """
    from pyspark.sql.window import Window

    order = order_by or [F.col(url_col).asc()]
    d = df.withColumn("__domain", registered_domain(F.col(url_col)))
    salt = F.pmod(F.xxhash64(F.col(url_col)), F.lit(salt_buckets))
    w1 = Window.partitionBy("__domain", salt).orderBy(*order)
    survivors = (
        d.withColumn("__rk", F.row_number().over(w1))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )
    w2 = Window.partitionBy("__domain").orderBy(*order)
    return (
        survivors.withColumn("__rk", F.row_number().over(w2))
        .where(F.col("__rk") <= k)
        .drop("__rk", "__domain")
    )


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


def host_suffixes(url: Column) -> Column:
    """All dot-suffixes of the URL's lowercased hostname, most-specific
    first: ``https://A.B.C/x`` → ``[a.b.c, b.c, c]``. Pure Column array
    ops — the explode/join side of UT1-style blocklist matching."""
    parts = F.split(F.lower(url_host(url)), r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat_ws(".", F.slice(parts, i, n)),
    )


def blocklist_losers(
    df: DataFrame,
    blocklist: DataFrame,
    id_col: str,
    url_col: str = "url",
) -> DataFrame:
    """Ids of rows whose host OR any parent domain appears in
    ``blocklist`` (first column = lowercase domains, UT1/adult-list
    convention: an entry blocks itself and every subdomain).

    Scale shape: hosts explode into ≤ label-count suffix rows (a handful
    — never the page body), the blocklist deduplicates to one row per
    domain, and AQE broadcasts it when small (UT1 lists are a few
    million short strings); ids come back distinct. No Python."""
    dcol = blocklist.columns[0]
    bl = (blocklist.select(F.lower(F.col(dcol)).alias("__sfx"))
          .where(F.col("__sfx").isNotNull()).distinct())
    return (
        df.where(F.col(id_col).isNotNull() & F.col(url_col).isNotNull())
        .select(F.col(id_col).alias("id"),
                F.explode(host_suffixes(F.col(url_col))).alias("__sfx"))
        .join(bl, "__sfx", "left_semi")
        .select("id")
        .distinct()
    )


def blocklist_filter(
    df: DataFrame,
    blocklist: DataFrame,
    id_col: str,
    url_col: str = "url",
) -> DataFrame:
    """The rows of ``df`` NOT matched by the blocklist (original schema).
    Composes into cleaning pipelines via ``recipes.blocklist_stage``."""
    losers = blocklist_losers(df, blocklist, id_col, url_col)
    return df.join(losers.withColumnRenamed("id", id_col), id_col,
                   "left_anti")
