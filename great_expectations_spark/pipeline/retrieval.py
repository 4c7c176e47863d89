"""Lexical corpus retrieval: BM25 top-k search over a document table.

The training-data counterpart of the embedding searches in
``pipeline/similarity.py``: given a small query table (eval-set probes,
decontamination suspects, quality exemplars), rank corpus documents by
Okapi BM25 (Robertson et al., TREC-3; the idf form is Lucene's
``ln(1 + (N - df + 0.5)/(df + 0.5))``, which keeps idf positive for
terms in more than half the corpus).

Plan shape at 10^12 docs:

* ``bm25_index`` — ONE corpus scan → a persistable postings table
  ``(__id, token, tf, dl)``; doc length rides the tokenize pass (computed
  before the explode), so no second scan and no join to attach it.
* searching scans the postings ONCE, semi-joined down to hits on the
  broadcast query vocabulary immediately — only rows for query terms ever
  shuffle. Document frequencies come from those hits (postings rows are
  unique per (doc, token), so ``count(*)`` per token IS df), corpus size
  and average doc length from one bounded k-row aggregate.
* per-term partial scores sum with a map-side-combinable
  ``groupBy(query_id, doc)``; the final top-k uses the same two-phase
  salted window as ``webtext.domain_cap`` — a stopword-heavy query whose
  candidate set is a large corpus fraction never lands on one task.

Scores are rounded (``round_decimals``, default 6) BEFORE ranking so the
(score desc, doc_id asc) order is a cross-engine total order — the same
determinism contract as ``pipeline/lm.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from great_expectations_spark.pipeline._lineage import fused_checkpoint
from great_expectations_spark.pipeline.dedup import nonempty_tokens as _nonempty_tokens  # noqa: E501

__all__ = ["bm25_index", "bm25_search", "bm25_search_index"]


def bm25_index(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """ONE scan → the postings state table ``(__id, token, tf, dl)``.

    ``tf`` is the term's in-document count, ``dl`` the document's token
    count (repeated on each of the doc's rows — it rides the tokenize
    pass instead of costing a join at search time). Rows with NULL id or
    NULL/empty-token text produce no postings: a document with no tokens
    can never match a query term. Persist the result (parquet/Iceberg)
    to search the same corpus repeatedly without re-tokenizing —
    the same state-table pattern as ``dedup.exact_digest_table``.
    """
    return (
        df.where(F.col(id_col).isNotNull() & F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("__id"),
                _nonempty_tokens(F.col(text_col)).alias("__t"))
        .select("__id", F.size("__t").alias("dl"),
                F.explode("__t").alias("token"))
        .groupBy("__id", "token", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
        .select("__id", "token", "tf", "dl")
    )


def bm25_search_index(
    postings: DataFrame,
    queries: DataFrame,
    query_id_col: str = "query_id",
    query_text_col: str = "text",
    *,
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
    round_decimals: int = 6,
    salt_buckets: int = 16,
    materialize: bool = True,
) -> DataFrame:
    """Top-``top_k`` corpus docs per query over a ``bm25_index`` table.

    Output: ``(query_id, doc_id, score, rank)``, rank 1-based per query
    under the (score desc, doc_id asc) total order on ROUNDED scores.
    Repeated terms within one query count once (array_distinct — query
    term frequency is flat, as in Lucene's BooleanQuery of TermQueries).
    Queries with NULL id/text, or none of whose terms occur in the
    corpus, yield no output rows.

    ``queries`` is the SMALL side by contract (eval probes, suspect
    samples): its distinct-term vocabulary is broadcast; everything
    corpus-sized stays hits-only. Corpus size and avgdl come from one
    bounded 1-row aggregate (collected — the same k-row-collect budget as
    the compiler's eager aggregates).

    With ``materialize=True`` (default) the BOUNDED result is cached
    (evictable persist) so the corpus-sized hit cache can be dropped
    before returning — that result cache stays registered for the
    session unless released. Sweep-style callers (one search per eval
    shard in a decontamination loop) have two release paths: wrap the
    call in ``_lineage.scoped_fused_caches()`` and unpersist the
    collected frames after consuming, or pass ``materialize=False`` to
    get the lazy plan and own caching entirely (each action then
    re-scans the postings once — fine when the result is consumed
    exactly once, e.g. written straight to parquet).
    """
    from pyspark.sql.window import Window

    if top_k <= 0:
        raise ValueError(f"top_k must be positive, got {top_k}")
    # per-query distinct terms; kept driver-small by contract
    qt = (
        queries.where(
            F.col(query_id_col).isNotNull() & F.col(query_text_col).isNotNull())
        .select(F.col(query_id_col).alias("query_id"),
                F.explode(F.array_distinct(
                    _nonempty_tokens(F.col(query_text_col)))).alias("token"))
    )
    tokd = qt.select("token").distinct()

    # one bounded 1-row agg: corpus size + average doc length (per-doc dl
    # appears once per (doc, token) row — reduce to one row per doc first)
    per_doc = postings.groupBy("__id").agg(F.min("dl").alias("dl"))
    stats = per_doc.agg(F.count(F.lit(1)).alias("n_docs"),
                        F.avg("dl").alias("avgdl")).first()
    n_docs = int(stats["n_docs"] or 0)
    # empty corpus: hits is empty so the result is too — avgdl only needs
    # to be a finite placeholder to keep the expressions well-typed
    avgdl = float(stats["avgdl"]) if n_docs else 1.0

    # the single postings scan: semi-join to hits on the broadcast query
    # vocabulary, cached so df counts AND scoring reuse the blocks.
    # persist (NOT localCheckpoint): lineage stays intact so the blocks
    # are evictable under memory pressure and recomputable — a checkpoint
    # here would pin one hit set per search call for the session lifetime
    # (see _lineage). Worst case after eviction is one extra postings
    # scan, still bounded by the broadcast semi-join.
    hits = (
        postings.join(F.broadcast(tokd), "token")
        .select("token", "__id", "tf", "dl")
    ).persist()
    # postings rows are unique per (doc, token) ⇒ count(*) per token = df
    dfreq = hits.groupBy("token").agg(F.count(F.lit(1)).alias("df"))

    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    tf = F.col("tf").cast("double")
    denom = tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
    term_score = idf * tf * F.lit(k1 + 1.0) / denom

    scored = (
        hits.join(F.broadcast(dfreq), "token")  # ≤ |query vocab| rows
        .join(F.broadcast(qt), "token")
        .groupBy("query_id", "__id")
        .agg(F.round(F.sum(term_score), round_decimals).alias("score"))
    )

    # two-phase salted top-k (webtext.domain_cap): phase 1 bounds any task
    # to candidates/salt_buckets rows even for a query matching most of
    # the corpus; phase 2 ranks the ≤ top_k·salt_buckets survivors
    order = [F.col("score").desc(), F.col("__id").asc()]
    salt = F.pmod(F.xxhash64(F.col("__id").cast("string")), F.lit(salt_buckets))
    w1 = Window.partitionBy("query_id", salt).orderBy(*order)
    survivors = (
        scored.withColumn("__rk", F.row_number().over(w1))
        .where(F.col("__rk") <= top_k)
        .drop("__rk")
    )
    w2 = Window.partitionBy("query_id").orderBy(*order)
    result = (
        survivors.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= top_k)
        .select("query_id", F.col("__id").alias("doc_id"), "score", "rank")
    )
    # Materialize the BOUNDED result (≤ top_k x queries rows — this job is
    # the search itself), then drop the corpus-sized hit cache: a
    # decontamination loop searching once per eval shard must not leave one
    # stale hit set per call in storage. If the small result cache is later
    # evicted, recompute walks back through the un-cached hits — correct,
    # just one extra postings scan. materialize=False returns the lazy
    # plan instead (caller owns caching; see docstring), in which case the
    # hit cache must stay up — it backs the plan the caller will execute —
    # but remains evictable (plain persist, lineage intact).
    if materialize:
        result = fused_checkpoint(result)
        hits.unpersist()
    else:
        # hand the hit cache to an active scoped_fused_caches() scope so
        # sweep callers can still free it after consuming the lazy result
        from great_expectations_spark.pipeline import _lineage

        frames = getattr(_lineage._SCOPED, "frames", None)
        if frames is not None:
            frames.append(hits)
    return result


def bm25_search(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
    **kwargs,
) -> DataFrame:
    """One-call convenience: ``bm25_index`` + ``bm25_search_index``."""
    return bm25_search_index(
        bm25_index(corpus, id_col, text_col), queries,
        query_id_col, query_text_col, **kwargs)
