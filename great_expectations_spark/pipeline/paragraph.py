"""Corpus-wide paragraph-level exact deduplication (C4 / CCNet style).

The reference engine has no sub-document dedup; this is the training-data
addendum twin of ``pipeline/dedup.py``'s doc-level exact dedup, one level
down: every paragraph (text split on a literal separator) is kept only at
its FIRST corpus occurrence — "first" = smallest ``(doc_id, position)``,
so the result is deterministic and independent of partitioning — and each
document is reassembled from its surviving paragraphs in original order.
C4 (Raffel et al. 2020, §2.2) dedups three-sentence spans corpus-wide;
CCNet (Wenzek et al. 2020, §3.1) dedups paragraph hashes the same way.

Scale notes (100 TB / 10^12 docs):
  * pass 1 (keeper election) shuffles (16-byte digest, id, idx) triples —
    paragraph TEXT never leaves the map stage; ``min(struct(id, idx))``
    is a commutative monoid, so Catalyst's HashAggregate collapses
    per-partition duplicates map-side before the exchange.
  * pass 2 joins the exploded paragraphs to the keeper table on the
    digest (sort-merge with AQE skew splitting; a boilerplate paragraph
    duplicated a billion times is ONE keeper row, not a hot key on the
    build side) and reassembles per doc with one more hash shuffle.
  * paragraphs shorter than ``min_chars`` bypass dedup entirely (C4 keeps
    short lines; deduping the empty string would otherwise collapse
    blank-line formatting corpus-wide) — they are never shuffled in pass 1.

Reassembly is byte-lossless: ``split`` on the literal separator keeps
trailing empty segments, so a document that loses no paragraphs
round-trips byte-identical — the same invariant the webtext extraction
suite checks (north rule).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _literal_split(col, sep: str):
    # F.split takes a Java regex — \Q...\E quotes the separator literally
    # (limit -1 keeps trailing empty segments: byte-lossless round trip)
    return F.split(col, "\\Q" + sep + "\\E", -1)


def _dedupable(df: DataFrame, id_col: str, text_col: str) -> Column:
    # NULL text has nothing to dedup; NULL ids can't key the reassembly
    # join (and distinct null-id docs would merge in the groupBy) — both
    # pass through untouched, like the NULL conventions in pipeline/dedup.py
    return F.col(text_col).isNotNull() & F.col(id_col).isNotNull()


def _exploded(df: DataFrame, id_col: str, text_col: str, sep: str) -> DataFrame:
    return (
        df.where(_dedupable(df, id_col, text_col))
        .select(
            F.col(id_col).alias("__id"),
            F.posexplode(_literal_split(F.col(text_col), sep)).alias("__idx", "__p"),
        )
        .withColumn("__d", F.md5(F.encode(F.col("__p"), "UTF-8")))
    )


def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_chars: int = 1,
    removed_count_col: str | None = None,
) -> DataFrame:
    """Remove every paragraph except its first corpus occurrence.

    Returns ``df`` with ``text_col`` rewritten to the surviving paragraphs
    (original order, re-joined with ``sep``; a doc whose every paragraph
    was removed becomes ``""``). Rows with NULL text or NULL id pass
    through unchanged. ``min_chars`` exempts short paragraphs (< that many chars)
    from dedup — default 1 exempts only empty segments. ``id_col`` values
    must be unique (they key the reassembly join). Optionally emits the
    number of removed paragraphs per doc in ``removed_count_col``.
    """
    if not sep:
        raise ValueError("sep must be a non-empty literal string")
    if min_chars < 0:
        raise ValueError(f"min_chars must be >= 0, got {min_chars}")

    paras = _exploded(df, id_col, text_col, sep)
    short = F.length(F.col("__p")) < min_chars

    keepers = (
        paras.where(~short)
        .groupBy("__d")
        .agg(F.min(F.struct("__id", "__idx")).alias("__k"))
    )
    kept = (
        paras.join(keepers, on="__d", how="left")
        .withColumn(
            "__keep",
            short | (F.struct("__id", "__idx") == F.col("__k")),
        )
    )
    return _reassemble(kept, df, id_col, text_col, sep, removed_count_col)


def paragraph_dedup_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_chars: int = 1,
) -> DataFrame:
    """One-row corpus summary of paragraph duplication.

    (n_docs, n_paragraphs, n_exempt_short, n_distinct, dup_paragraphs)
    where dup_paragraphs counts every dedupable paragraph beyond the first
    of its digest group — exactly the rows ``paragraph_dedup`` removes.
    Shuffles digests only (one map-combinable groupBy, no text movement).
    """
    paras = _exploded(df, id_col, text_col, sep)
    short = F.length(F.col("__p")) < min_chars
    per_digest = (
        paras.where(~short)
        .groupBy("__d")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    counts = per_digest.agg(
        F.coalesce(F.count(F.lit(1)), F.lit(0)).alias("n_distinct"),
        F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).alias("dup_paragraphs"),
    )
    totals = paras.agg(
        F.countDistinct("__id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_paragraphs"),
        F.coalesce(_sum_bool(short), F.lit(0)).alias("n_exempt_short"),
    )
    return totals.crossJoin(counts).select(
        "n_docs", "n_paragraphs", "n_exempt_short", "n_distinct", "dup_paragraphs"
    )


def _sum_bool(cond):
    return F.sum(F.when(cond, 1).otherwise(0))


def paragraph_dedup_within_doc(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_chars: int = 1,
    removed_count_col: str | None = None,
) -> DataFrame:
    """Intra-document repetition removal: keep only the FIRST occurrence of
    each paragraph WITHIN its own document (boilerplate nav blocks, looped
    template sections), leaving cross-document duplicates alone.

    The corpus-wide keeper election disappears: the keep decision is a
    per-(doc, digest) min-position — one hash shuffle on the doc id, no
    digest join, no cross-doc data movement. The complement of
    ``paragraph_dedup`` for pipelines that dedup across docs with MinHash
    and only need exact repetition stripped inside each page.
    """
    if not sep:
        raise ValueError("sep must be a non-empty literal string")
    if min_chars < 0:
        raise ValueError(f"min_chars must be >= 0, got {min_chars}")

    paras = _exploded(df, id_col, text_col, sep)
    short = F.length(F.col("__p")) < min_chars
    w = Window.partitionBy("__id", "__d").orderBy("__idx")
    kept = paras.withColumn(
        "__keep", short | (F.row_number().over(w) == 1)
    )
    return _reassemble(kept, df, id_col, text_col, sep, removed_count_col)


def _reassemble(
    kept: DataFrame,
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str,
    removed_count_col: str | None,
    clean: Column | None = None,
) -> DataFrame:
    """Shared tail of the line-removal operators: rebuild each doc's text
    from the ``__keep``-marked paragraph rows (original order,
    ``sep``-joined), join back onto the full-width rows, pass rows NOT
    matching ``clean`` through untouched (NULL removed-count — nothing
    was scanned). ``clean`` defaults to the paragraph-dedup predicate
    (id and text non-NULL); callers whose split phase skipped more rows
    (e.g. NULL-domain in boilerplate removal) pass their own."""
    rebuilt = kept.groupBy("__id").agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("__keep"), F.struct("__idx", "__p"))
                    )
                ),
                lambda s: s["__p"],
            ),
        ).alias("__new_text"),
        F.sum(F.when(~F.col("__keep"), 1).otherwise(0)).alias("__n_removed"),
    )

    if clean is None:
        clean = _dedupable(df, id_col, text_col)
    nn = df.where(clean)
    out_cols = [
        F.col("__new_text").alias(c) if c == text_col else F.col(c)
        for c in df.columns
    ]
    if removed_count_col:
        out_cols.append(F.col("__n_removed").alias(removed_count_col))
    deduped = nn.join(
        rebuilt, nn[id_col] == rebuilt["__id"], "inner"
    ).select(*out_cols)

    nulls = df.where(~clean)
    if removed_count_col:
        nulls = nulls.withColumn(removed_count_col, F.lit(None).cast("long"))
    return deduped.unionByName(nulls)
