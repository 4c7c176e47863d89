"""Domain-level boilerplate line removal: drop lines that repeat across
many pages of the SAME host (nav bars, cookie banners, footers).

Corpus-wide paragraph dedup (`pipeline/paragraph.py`) keeps a
boilerplate line's FIRST occurrence and is blind to lines that are
frequent within one site but rare globally. This operator implements
the per-domain frequency rule used by production crawl cleaners
(trafilatura's duplicate-element heuristic, CCNet's per-shard paragraph
hashing, Dolma/FineWeb nav-line filters): a line is boilerplate for a
domain iff it appears in at least ``min_docs`` distinct documents AND in
at least ``min_doc_frac`` of the domain's documents — and then ALL of
its occurrences in that domain are removed (not first-kept: a cookie
banner's first occurrence is as worthless as its millionth).

Scale design (10^12 docs):
  * distinct-docs-per-(domain, line) is the classic two-stage exact
    distinct: ``groupBy(domain, digest, id)`` collapses within-doc
    repeats map-side, then ``groupBy(domain, digest)`` counts — both
    map-side-combinable monoids, no ``countDistinct`` sketch needed;
    only 16-byte digests shuffle, never line text.
  * per-domain doc totals ride ONE row-count agg over the doc table.
  * the boilerplate set is a tiny fraction of distinct lines (rule
    requires multi-doc frequency), so the marking join is exploded
    lines ⋈ small-right on (domain, digest) — AQE handles the hot
    domains; a million-page host's banner is ONE row on the build side.
  * reassembly reuses the byte-lossless split/`concat_ws` contract of
    `pipeline/paragraph.py` — a doc that loses no lines round-trips
    byte-identical.

Lines shorter than ``min_chars`` are exempt (default 1 exempts only
empty segments, preserving blank-line structure — same convention as
paragraph dedup). NULL text / id / domain rows pass through untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from great_expectations_spark.pipeline.paragraph import (
    _literal_split,
    _reassemble,
)

__all__ = ["domain_boilerplate_lines", "domain_boilerplate_removal"]


def _clean(df: DataFrame, id_col: str, text_col: str, domain_col: str):
    return (F.col(text_col).isNotNull() & F.col(id_col).isNotNull()
            & F.col(domain_col).isNotNull())


def _line_doc_counts(
    df: DataFrame, id_col: str, text_col: str, domain_col: str, sep: str,
    min_chars: int,
) -> DataFrame:
    """(domain, digest, line, n_docs): distinct documents per (domain,
    line), two map-combinable stages; exempt-short lines never shuffle."""
    lines = (
        df.where(_clean(df, id_col, text_col, domain_col))
        .select(
            F.col(domain_col).alias("__dom"),
            F.col(id_col).alias("__id"),
            F.explode(_literal_split(F.col(text_col), sep)).alias("__p"),
        )
        .where(F.length("__p") >= min_chars)
        .withColumn("__d", F.md5(F.encode(F.col("__p"), "UTF-8")))
    )
    per_doc = lines.groupBy("__dom", "__d", "__id").agg(
        F.min("__p").alias("__p"))
    return per_doc.groupBy("__dom", "__d").agg(
        F.min("__p").alias("__p"),  # digest determines the text; min = it
        F.count(F.lit(1)).alias("__n_docs"),
    )


def domain_boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "domain",
    *,
    sep: str = "\n",
    min_doc_frac: float = 0.5,
    min_docs: int = 2,
    min_chars: int = 1,
) -> DataFrame:
    """The audit table: ``(domain, line, n_docs, domain_docs)`` for every
    line the rule flags as boilerplate — run this BEFORE the removal to
    eyeball what a threshold would delete."""
    return _flagged(
        df, id_col, text_col, domain_col, sep, min_doc_frac, min_docs,
        min_chars,
    ).select(
        F.col("__dom").alias("domain"),
        F.col("__p").alias("line"),
        F.col("__n_docs").alias("n_docs"),
        F.col("__total").alias("domain_docs"),
    )


def _flagged(
    df: DataFrame, id_col: str, text_col: str, domain_col: str, sep: str,
    min_doc_frac: float, min_docs: int, min_chars: int,
) -> DataFrame:
    """Flagged lines WITH their digest (``__dom, __d, __p, __n_docs,
    __total``) — the removal path joins on ``__d`` directly instead of
    re-hashing the audit table's line text. Validates the shared
    arguments for both public entry points."""
    if not sep:
        raise ValueError("sep must be a non-empty literal string")
    if not 0.0 < min_doc_frac <= 1.0:
        raise ValueError(
            f"min_doc_frac must be in (0, 1], got {min_doc_frac}")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    if min_chars < 1:
        raise ValueError(f"min_chars must be >= 1, got {min_chars}")
    counts = _line_doc_counts(df, id_col, text_col, domain_col, sep,
                              min_chars)
    totals = (
        df.where(_clean(df, id_col, text_col, domain_col))
        .groupBy(F.col(domain_col).alias("__dom"))
        .agg(F.count(F.lit(1)).alias("__total"))
    )
    return counts.join(totals, "__dom").where(
        (F.col("__n_docs") >= min_docs)
        & (F.col("__n_docs") >= F.lit(min_doc_frac) * F.col("__total"))
    )


def domain_boilerplate_removal(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "domain",
    *,
    sep: str = "\n",
    min_doc_frac: float = 0.5,
    min_docs: int = 2,
    min_chars: int = 1,
    removed_count_col: str | None = None,
) -> DataFrame:
    """Remove every occurrence of each domain's boilerplate lines and
    reassemble the documents byte-losslessly.

    Returns ``df`` with ``text_col`` rewritten (surviving lines, original
    order, ``sep``-joined). Rows with NULL text/id/domain pass through
    unchanged; ``id_col`` values must be unique (they key reassembly).
    Optionally emits the per-doc removed-line count."""
    bp = _flagged(
        df, id_col, text_col, domain_col, sep, min_doc_frac, min_docs,
        min_chars,
    ).select(F.col("__dom").alias("__bdom"), F.col("__d").alias("__bd"))

    paras = (
        df.where(_clean(df, id_col, text_col, domain_col))
        .select(
            F.col(id_col).alias("__id"),
            F.col(domain_col).alias("__dom"),
            F.posexplode(_literal_split(F.col(text_col), sep))
            .alias("__idx", "__p"),
        )
        .withColumn("__d", F.md5(F.encode(F.col("__p"), "UTF-8")))
    )
    kept = paras.join(
        bp,
        (paras["__dom"] == bp["__bdom"]) & (paras["__d"] == bp["__bd"]),
        "left",
    ).withColumn("__keep", F.col("__bd").isNull())

    # NULL-domain rows must pass through alongside NULL-id/text ones, so
    # hand _reassemble this operator's own cleanliness predicate
    return _reassemble(
        kept, df, id_col, text_col, sep, removed_count_col,
        clean=_clean(df, id_col, text_col, domain_col))
