"""Benchmark decontamination: flag / drop corpus documents that overlap an
evaluation set by word n-grams.

The standard guard against test-set leakage in training corpora (the GPT-3
paper's 13-gram filter, Brown et al. 2020 appendix C; PaLM and Llama use the
same shape): a document is contaminated when it shares at least one word
n-gram with any document in the evaluation set. The reference has no such
operator; it belongs to this engine's training-data addendum and reuses the
dedup module's engine-portable shingle machinery (`dedup.hashed_tokens` /
`dedup.hashed_shingles` — md5-based rolling hashes any engine can replay).

Scale design (10^12-doc corpus, 10^4..10^6-doc eval set):
  * The eval side is reduced to DISTINCT shingle hashes and **broadcast**:
    eval sets are orders of magnitude smaller than the corpus, so the join
    never shuffles the corpus. For a pathologically large eval set pass
    ``broadcast=False`` to fall back to a shuffled hash join.
  * The corpus side is ONE scan: tokenize → hash → shingle → explode →
    broadcast-join. The join drops every non-matching shingle map-side, so
    the only shuffle (`groupBy(doc_id)` over the surviving hits) carries
    contaminated pairs only — at realistic contamination rates (<1%) this
    is negligible.
  * Per-doc totals (`n_shingles`) ride along the explode as a constant
    column — no second scan, no self-join.

Shingle contract (identical to `pipeline.dedup`, DuckDB-replayable):
token = single-space split; token hash = first 15 hex chars of md5, mod
2147483647; shingle hash = rolling ``s*65599 + h`` mod 2147483647 over n
consecutive token hashes, distinct per document. Documents with fewer than
``n`` tokens have no shingles and can never be flagged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from great_expectations_spark.pipeline.dedup import (
    hashed_shingles,
    hashed_tokens,
    tokens,
)

__all__ = [
    "eval_ngram_hashes",
    "contamination_stats",
    "decontaminate",
]


def _shingled(df: DataFrame, id_col: str | None, text_col: str, n: int) -> DataFrame:
    """(id?, __hs: array<long>) — distinct shingle hashes per non-null doc.

    Token hashes are materialized into their own projection first: an
    ``element_at`` over an inline ``split`` re-evaluates the split per
    access (quadratic in doc length — see dedup.hashed_tokens).
    """
    t = F.col(text_col)
    ids = [F.col(id_col)] if id_col else []
    th = df.where(t.isNotNull()).select(*ids, hashed_tokens(tokens(t)).alias("__th"))
    return th.select(*ids, hashed_shingles(F.col("__th"), n).alias("__hs"))


def eval_ngram_hashes(
    eval_df: DataFrame,
    text_col: str = "text",
    n: int = 13,
    id_col: str | None = None,
) -> DataFrame:
    """The eval set as its distinct shingle-hash table.

    Without ``id_col``: one column ``shingle`` (distinct across the whole
    eval set) — the minimal broadcast side. With ``id_col``: distinct
    (``shingle``, ``eval_id``) pairs, so contamination hits can be
    attributed to the eval documents they leak.
    """
    s = _shingled(eval_df, id_col, text_col, n)
    if id_col is None:
        return s.select(F.explode("__hs").alias("shingle")).distinct()
    return s.select(
        F.explode("__hs").alias("shingle"), F.col(id_col).alias("eval_id")
    ).distinct()


def contamination_stats(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
    eval_id_col: str | None = None,
    n: int = 13,
    broadcast: bool = True,
) -> DataFrame:
    """Per contaminated corpus document: how much of it overlaps the eval set.

    Returns (contaminated docs only — empty means a clean corpus):
      ``<id_col>``, ``n_shingles`` (doc's distinct n-grams),
      ``hit_shingles`` (how many also occur in the eval set),
      ``contamination_fraction`` (= hit/total), and — when ``eval_id_col``
      is given — ``matched_eval_docs`` (distinct eval docs leaked into it).

    One corpus scan; eval shingles broadcast; only hits shuffle.
    """
    ev = eval_ngram_hashes(eval_df, eval_text_col, n=n, id_col=eval_id_col)
    if broadcast:
        ev = F.broadcast(ev)
    doc = _shingled(corpus, id_col, text_col, n).select(
        id_col,
        F.size("__hs").cast("long").alias("n_shingles"),
        F.explode("__hs").alias("shingle"),
    )
    hits = doc.join(ev, "shingle")
    # countDistinct, not count: with eval_id_col the join yields one row per
    # (shingle, eval_id) pair, so a shingle leaked by k eval docs appears k×
    aggs = [
        F.first("n_shingles").alias("n_shingles"),
        F.countDistinct("shingle").cast("long").alias("hit_shingles"),
    ]
    if eval_id_col is not None:
        aggs.append(F.countDistinct("eval_id").cast("long").alias("matched_eval_docs"))
    out = hits.groupBy(id_col).agg(*aggs)
    return out.withColumn(
        "contamination_fraction",
        F.col("hit_shingles") / F.col("n_shingles").cast("double"),
    )


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
    n: int = 13,
    min_hits: int = 1,
    min_fraction: float | None = None,
    broadcast: bool = True,
    materialize: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """(clean, contaminated) corpus split under the n-gram overlap rule.

    A document is contaminated when it shares ≥ ``min_hits`` distinct
    n-grams with the eval set (and, if ``min_fraction`` is set, at least
    that fraction of its own n-grams). Both frames keep the corpus schema;
    the flagged-id frame is small, so the anti/semi joins broadcast it.

    With ``materialize`` (default) the flagged-id frame is computed ONCE
    (eager ``localCheckpoint``) — otherwise consuming both returned frames
    would re-run the whole shingle/join/agg pipeline per action. Total
    corpus scans: one for the stats, one per consumed side.
    """
    stats = contamination_stats(
        corpus, eval_df, id_col=id_col, text_col=text_col,
        eval_text_col=eval_text_col, n=n, broadcast=broadcast,
    )
    cond = F.col("hit_shingles") >= min_hits
    if min_fraction is not None:
        cond = cond & (F.col("contamination_fraction") >= min_fraction)
    flagged = stats.where(cond).select(id_col)
    if materialize:
        flagged = flagged.localCheckpoint(eager=True)
    flagged = F.broadcast(flagged)
    clean = corpus.join(flagged, id_col, "left_anti")
    contaminated = corpus.join(flagged, id_col, "left_semi")
    return clean, contaminated
