"""Deterministic synthetic Common-Crawl-style web-page table.

Shape per the north-rule input hint:
  (url:string, warc_ts:timestamp, html:binary, text:string, lang:string)

Fully deterministic and seed-stable: every value derives from the row id via
xxhash64 — no rand(), no partitioning sensitivity, so the same (n, seed)
always yields byte-identical rows on any cluster layout. Planted anomalies
(FIXTURES.md F1):
  * ~5% duplicate urls (uniqueness violations); text is derived from the
    url id, so duplicated urls carry byte-identical text (the per-row
    invariant: byte-identical extracted text per url)
  * Zipf-ish skewed domains (top domain ≈20% of rows) to exercise salting
  * ~3% null text, ~1% empty html
  * lang heavily skewed (en ≈60%) with ~0.5% invalid codes
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["en", "de", "fr", "es", "zh", "ru", "ja", "pt"]
# cumulative permille thresholds: en 600, de 150, fr 80, es 60, zh 40, ru 30, ja 20, pt 15, invalid 5
_LANG_CUM = [600, 750, 830, 890, 930, 960, 980, 995]


def _h(col, salt: int, seed: int):
    return F.abs(F.xxhash64(col, F.lit(salt), F.lit(seed)))


def webpages(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    partitions: int | None = None,
    max_tokens: int = 300,
) -> DataFrame:
    df = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    rid = F.col("id")

    # ~5% of rows reuse the previous row's url id → duplicate urls
    dup = (_h(rid, 1, seed) % 100) < 5
    eff = F.when(dup & (rid > 0), rid - 1).otherwise(rid)

    # Zipf-ish domain skew: 20% of rows → domain 0, else hash into 1..999
    dsel = _h(eff, 2, seed) % 1000
    domain = F.when(dsel < 200, F.lit(0)).otherwise(1 + (_h(eff, 3, seed) % 999))
    url = F.concat(
        F.lit("https://d"), domain.cast("string"), F.lit(".example/p/"), eff.cast("string")
    )

    warc_ts = F.timestamp_seconds(F.lit(1704067200) + (_h(rid, 4, seed) % 31536000))

    # deterministic token text derived from eff (url id): dup urls ⇒ identical text
    n_tokens = (_h(eff, 5, seed) % max_tokens).cast("int")
    # pre-mod BOTH addends: _h can be ~2^63-1, and the raw sum would
    # overflow int64 (wrapping negative under ANSI-off) about 1e-8/row —
    # invisible at test scale, thousands of out-of-vocabulary 'w-…' tokens
    # at 10^12 rows. (a+b)%m == (a%m + b%m)%m, so small-scale output is
    # byte-identical to the previous derivation.
    token = lambda i: F.concat(
        F.lit("w"),
        ((_h(eff, 6, seed) % 5000 + (i * 2654435761) % 5000) % 5000).cast("string"),
    )
    words = F.transform(F.sequence(F.lit(0), n_tokens), lambda i: token(i))
    raw_text = F.array_join(words, " ")
    text_null = (_h(eff, 7, seed) % 1000) < 30
    text = F.when(text_null, F.lit(None).cast("string")).otherwise(raw_text)

    html_empty = (_h(eff, 8, seed) % 1000) < 10
    html = F.when(html_empty, F.encode(F.lit(""), "utf-8")).otherwise(
        F.encode(
            F.concat(F.lit("<html><body>"), F.coalesce(raw_text, F.lit("")), F.lit("</body></html>")),
            "utf-8",
        )
    )

    lsel = _h(eff, 9, seed) % 1000
    lang = F.lit("zz")
    for i in range(len(LANGS) - 1, -1, -1):
        lo = 0 if i == 0 else _LANG_CUM[i - 1]
        lang = F.when((lsel >= lo) & (lsel < _LANG_CUM[i]), F.lit(LANGS[i])).otherwise(lang)

    return df.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )


def webpages_ref(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Reference (url, lang) table: distinct F1 urls minus a known ~2% delta —
    supports cross-table referential expectations (the anti-join finds
    exactly the held-out urls)."""
    pages = webpages(spark, n, seed).select("url", "lang").distinct()
    keep = (_h(F.col("url"), 10, seed) % 100) >= 2
    return pages.where(keep)
