"""Exact duplicated-substring detection and removal (the ExactSubstr
dedup of Lee et al. 2022, "Deduplicating Training Data Makes Language
Models Better", arXiv:2107.06499) re-expressed Spark-first.

The reference paper builds a corpus-wide suffix array — inherently
single-machine. Here fixed-width token windows with stride 1 replace
it: every duplicated token run of length ≥ ``window`` produces at least
one duplicated window, so detection is EXACT at token granularity for
spans of ≥ ``window`` tokens (shorter repeats are deliberately kept —
same motivation as the paper's 50-token threshold: short matches are
idiom, not crawl duplication).

Scale design
------------
* one scan builds ``(wkey=md5(window), id, idx)`` occurrence triples —
  the only slather-wide shuffle, linear in corpus tokens;
* the keeper of each duplicated window (corpus-wide minimum
  ``(id, idx)``) is elected with ``min(struct(id, idx))`` in a groupBy —
  a commutative monoid, so a boilerplate window occurring 10^8 times
  contributes ONE row per map partition to the shuffle, never a
  per-key sort window (no hot-task);
* span removal is pure Column code: flagged offsets are gathered per
  doc (bounded by the doc's own token count) and tokens inside any
  flagged window are dropped with nested higher-order functions —
  no Python in the loop anywhere.

Tokens are the atoms: text splits on single spaces and rebuilds with
single spaces, so runs of spaces round-trip as empty tokens and a doc
with nothing removed reassembles byte-identically.

Reference repo has no such operator (its nearest notion is
``expect_column_values_to_be_unique``); this module belongs to the
training-data-pipeline extension surface like ``pipeline/paragraph.py``
(paragraph-granularity dedup) and ``pipeline/dedup.py`` (whole-doc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _window_occurrences(
    df: DataFrame, id_col: str, text_col: str, window: int
) -> DataFrame:
    """``(id, idx, wkey)`` for every stride-1 token window: ``wkey`` is
    the md5 of the space-joined window starting at 0-based token offset
    ``idx``. Docs shorter than ``window`` tokens emit nothing."""
    if window < 2:
        raise ValueError(f"window must be >= 2 tokens, got {window}")
    toks = df.where(
        F.col(text_col).isNotNull() & F.col(id_col).isNotNull()
    ).select(
        F.col(id_col).alias("id"),
        F.split(F.col(text_col), " ").alias("toks"),
    ).where(F.size("toks") >= window)

    def win(i):
        return F.struct(
            i.cast("long").alias("idx"),
            F.md5(F.concat_ws(" ", F.slice(F.col("toks"), i + 1, window)))
            .alias("wkey"),
        )

    return toks.select(
        "id",
        F.explode(
            F.transform(F.sequence(F.lit(0), F.size("toks") - window), win)
        ).alias("w"),
    ).select("id", F.col("w.idx").alias("idx"), F.col("w.wkey").alias("wkey"))


def duplicate_window_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    window: int = 8,
) -> DataFrame:
    """Corpus-wide duplicated-window inventory: ``(wkey, n_occ, n_docs)``
    for every ``window``-token sequence appearing more than once (within
    one doc or across docs). The duplicate-mass report to read BEFORE
    choosing a removal threshold."""
    return (
        _window_occurrences(df, id_col, text_col, window)
        .groupBy("wkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occ"),
            F.countDistinct("id").cast("long").alias("n_docs"),
        )
        .where(F.col("n_occ") >= 2)
    )


def duplicate_window_occurrences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    window: int = 8,
) -> DataFrame:
    """Every occurrence of every duplicated window:
    ``(id, idx, wkey, is_keeper)`` — the keeper is the corpus-wide
    minimum ``(id, idx)``; all other occurrences are removal candidates.
    Keeper election is a min-struct groupBy (map-combinable — hot
    boilerplate keys can't hotspot one task).

    Overlap caveat: a keeper window survives verbatim only when no
    FLAGGED window of the same doc overlaps it. Self-overlapping repeat
    runs (``a a a a``, window 2: keeper at 0, flagged at 1 and 2) flag
    offsets that cover part of the keeper's own span, so the run
    collapses below ``window`` tokens — the aggressive reading of
    ExactSubstr's collapse-to-one semantics, shared by the DuckDB
    oracle. Non-self-overlapping duplicates (the cross-doc re-crawl
    case) always keep the keeper intact."""
    occ = _window_occurrences(df, id_col, text_col, window)
    dup = (
        occ.groupBy("wkey")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.min(F.struct("id", "idx")).alias("__keeper"),
        )
        .where(F.col("__n") >= 2)
        .select("wkey", "__keeper")
    )
    return occ.join(dup, "wkey").select(
        "id", "idx", "wkey",
        (F.struct("id", "idx") == F.col("__keeper")).alias("is_keeper"),
    )


def dedup_substrings(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    window: int = 8,
) -> DataFrame:
    """The corpus with every non-keeper duplicated span removed: all
    original columns, ``text_col`` rewritten (tokens covered by any
    flagged window dropped, survivors re-joined with single spaces) plus
    ``n_removed_tokens``. NULL text / NULL id rows pass through
    unchanged with ``n_removed_tokens = 0``.

    Matches the paper's semantics at token granularity: the first
    occurrence (smallest ``(id, idx)``) of each duplicated window
    survives; later occurrences are cut. Overlapping flagged windows
    merge naturally (a token is dropped if ANY flagged window covers it;
    see ``duplicate_window_occurrences`` for the self-overlap caveat).

    Coverage runs over MERGED disjoint intervals, not raw offsets: the
    sorted flag list folds into ``≤ flags`` non-overlapping ``[s, e)``
    spans first (linear when overlaps dominate), so a heavily
    re-crawled doc whose 10^5 flagged windows merge into a handful of
    spans costs O(tokens · spans), not O(tokens · flags) — no
    single-row projection hotspot."""
    flags = (
        duplicate_window_occurrences(
            df, id_col, text_col, window=window)
        .where(~F.col("is_keeper"))
        .groupBy("id")
        .agg(F.array_sort(F.collect_list("idx")).alias("__flags"))
        .withColumnRenamed("id", "__fid")
    )
    out = df.join(
        flags, F.col(id_col).eqNullSafe(F.col("__fid")), "left")

    toks = F.split(F.col(text_col), " ")
    w = F.lit(window).cast("long")

    # fold sorted offsets into disjoint [s, e) intervals: extend the last
    # interval while the next flag starts inside it, else append
    empty = F.expr("CAST(array() AS array<struct<s:bigint,e:bigint>>)")

    def _merge(acc, f):
        last = F.element_at(acc, -1)
        extend = F.concat(
            F.slice(acc, 1, F.size(acc) - 1),
            F.array(F.struct(
                last["s"].alias("s"),
                F.greatest(last["e"], f + w).alias("e"))))
        append = F.concat(
            acc, F.array(F.struct(f.alias("s"), (f + w).alias("e"))))
        return F.when((F.size(acc) > 0) & (f <= last["e"]), extend) \
            .otherwise(append)

    out = out.withColumn(
        "__iv",
        F.when(F.col("__flags").isNull(), F.lit(None))
        .otherwise(F.aggregate(F.col("__flags"), empty, _merge)))

    def uncovered(tok, p):
        return ~F.exists(
            "__iv",
            lambda i: (i["s"] <= p.cast("long")) & (p.cast("long") < i["e"]))

    kept = F.filter(toks, uncovered)
    rewritten = F.when(
        F.col("__flags").isNull() | F.col(text_col).isNull(),
        F.col(text_col),
    ).otherwise(F.array_join(kept, " "))
    n_removed = F.when(
        F.col("__flags").isNull() | F.col(text_col).isNull(), F.lit(0)
    ).otherwise(F.size(toks) - F.size(kept)).cast("long")

    # one withColumns: both expressions must see the ORIGINAL text column
    return out.withColumns(
        {text_col: rewritten, "n_removed_tokens": n_removed}
    ).drop("__fid", "__flags", "__iv")
