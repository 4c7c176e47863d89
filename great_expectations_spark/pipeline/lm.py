"""Corpus-trained language-model scoring and perplexity-bucket quality
stratification (the CCNet recipe of Wenzek et al. 2020,
arXiv:1911.00359, with the KenLM 5-gram model replaced by models the
engine trains on the corpus itself — a unigram LM and a Jelinek-Mercer
interpolated bigram LM; no external model files, and every step stays a
DataFrame plan).

Pipeline shape
--------------
* ``unigram_lm`` — ONE token-count scan (map-combinable groupBy) +
  a bounded ``orderBy(count desc).limit(vocab)`` (TakeOrdered — k rows
  per partition, never a global sort) → a ``(token, logp)`` model table
  with add-alpha smoothing; OOV mass is a single NULL-token row, so the
  model is self-contained and persistable like the incremental-dedup
  signature tables.
* ``doc_logprob`` — broadcast-join the (tiny) model onto the exploded
  token stream and sum per doc: one linear shuffle keyed by doc id,
  map-side partial sums.
* ``perplexity_buckets`` — CCNet's head/middle/tail split: corpus
  quantile thresholds (one agg to the driver — exact interpolated by
  default, GK sketch via ``exact=False`` at crawl scale) + a CASE
  assignment; never an ``ntile`` global-order window (single-task at
  10^12 rows).

Determinism: vocabulary ties at the count cutoff break toward the
lexicographically smaller token; scores round to 6 decimals before
thresholding, so any engine replays bucket assignments bit-for-bit
(DuckDB oracle: pipeline_lm_scores / pipeline_lm_buckets).

The reference repo has no LM-scoring surface; this module extends the
training-data-pipeline addendum like ``pipeline/quality.py`` (Gopher
heuristics) — perplexity is the quality axis those heuristics can't
see.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from great_expectations_spark.pipeline._lineage import fused_checkpoint
from great_expectations_spark.pipeline.dedup import (
    nonempty_tokens as _nonempty_tokens,
)


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return (
        df.where(F.col(text_col).isNotNull() & F.col(id_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.col(text_col), " ")).alias("token"),
        )
        .where(F.col("token") != "")
    )


def unigram_lm(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    vocab_size: int = 50_000,
    alpha: float = 1.0,
) -> DataFrame:
    """Add-alpha-smoothed unigram model: ``(token, logp)`` for the top
    ``vocab_size`` tokens by corpus frequency (count ties break toward
    the smaller token string — deterministic across engines), plus ONE
    ``token IS NULL`` row carrying the out-of-vocabulary log-probability
    (every OOV token scores ``ln(alpha / (N + alpha * (V + 1)))``).

    The model is a small persistable table (broadcast-sized by
    construction); train once, score any batch — the 10^12-token corpus
    is never re-read to score new data.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    counts = (
        _tokens(df, id_col, text_col)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    ).persist()
    try:
        # both actions hit the persisted token counts: the corpus text is
        # read EXACTLY once per training run
        n_total = counts.agg(F.sum("c")).first()[0] or 0
        top = (counts.orderBy(F.col("c").desc(), F.col("token"))
               .limit(vocab_size).collect())
    finally:
        counts.unpersist()
    # the model materializes to the driver (vocab_size + 1 rows — broadcast-
    # sized by construction, the same bound the scoring join relies on), so
    # the returned DataFrame is a local relation: scoring actions never
    # re-run the training scan
    v = len(top)
    denom = float(n_total) + alpha * (v + 1)
    rows = [(r["token"], math.log((r["c"] + alpha) / denom)) for r in top]
    rows.append((None, math.log(alpha / denom)))
    return df.sparkSession.createDataFrame(rows, "token string, logp double")


def doc_logprob(
    df: DataFrame,
    model: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Per-doc unigram score: ``(id_col, n_tokens, avg_neg_logp)`` with
    ``avg_neg_logp`` rounded to 6 decimals (lower = more natural text;
    ``exp`` of it is the unigram perplexity). Docs with NULL/empty text
    get NULL score and ``n_tokens = 0``.

    One broadcast join of the model onto the exploded token stream +
    one map-combinable groupBy by doc id."""
    vocab = model.where(F.col("token").isNotNull())
    oov_row = model.where(F.col("token").isNull()).select("logp").first()
    if oov_row is None:
        raise ValueError("model has no OOV row (token IS NULL)")
    oov_logp = float(oov_row["logp"])

    toks = _tokens(df, id_col, text_col)
    scored = toks.join(F.broadcast(vocab), "token", "left").select(
        "id", F.coalesce(F.col("logp"), F.lit(oov_logp)).alias("lp"))
    per_doc = scored.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.round(-F.avg("lp"), 6).alias("avg_neg_logp"),
    )
    return (
        df.select(F.col(id_col))
        .join(per_doc.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens"), F.lit(0).cast("long"))
            .alias("n_tokens"),
            "avg_neg_logp",
        )
    )


def lm_train_and_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    vocab_size: int = 50_000,
    alpha: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """Train the unigram LM on a corpus AND score that same corpus in ONE
    tokenize pass — the CCNet recipe's common case (``unigram_lm`` then
    ``doc_logprob`` reads the corpus text twice; at crawl scale the second
    full read is the whole cost of the step).

    Returns ``(model, scores)``: ``model`` is bit-identical to
    ``unigram_lm``'s (token counts are exact integer arithmetic either
    way); ``scores`` has ``doc_logprob``'s schema
    ``(id_col, n_tokens, avg_neg_logp)`` computed from the per-doc
    ``(id, token, cnt)`` features as ``-(Σ cnt·logp)/(Σ cnt)`` — the same
    quantity as the per-instance average up to floating-point association
    (both round to 6 decimals; oracle: pipeline_lm_fused).

    Plan: ONE ``groupBy(id, token)`` count (map-combinable — the shuffle
    carries distinct (doc, token) pairs, not token instances),
    checkpointed once (eager fused_checkpoint); the model's token totals, the vocabulary cut, and the
    per-doc scoring join all read those materialized features instead of
    re-reading text.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    feats = (
        _tokens(df, id_col, text_col)
        .groupBy("id", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    ).transform(fused_checkpoint)
    counts = feats.groupBy("token").agg(F.sum("cnt").alias("c")).persist()
    try:
        n_total = counts.agg(F.sum("c")).first()[0] or 0
        top = (counts.orderBy(F.col("c").desc(), F.col("token"))
               .limit(vocab_size).collect())
    finally:
        counts.unpersist()
    v = len(top)
    denom = float(n_total) + alpha * (v + 1)
    oov_logp = math.log(alpha / denom)
    rows = [(r["token"], math.log((r["c"] + alpha) / denom)) for r in top]
    rows.append((None, oov_logp))
    model = df.sparkSession.createDataFrame(rows, "token string, logp double")

    vocab = model.where(F.col("token").isNotNull())
    per_doc = (
        feats.join(F.broadcast(vocab), "token", "left")
        .groupBy("id")
        .agg(
            F.sum("cnt").cast("long").alias("n_tokens"),
            F.round(
                -(F.sum(F.col("cnt")
                        * F.coalesce(F.col("logp"), F.lit(oov_logp)))
                  / F.sum("cnt")),
                6,
            ).alias("avg_neg_logp"),
        )
    )
    scores = (
        df.select(F.col(id_col))
        .join(per_doc.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens"), F.lit(0).cast("long"))
            .alias("n_tokens"),
            "avg_neg_logp",
        )
    )
    return model, scores


def bigram_lm(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    vocab_size: int = 50_000,
    bigram_size: int = 200_000,
    alpha: float = 1.0,
) -> DataFrame:
    """Interpolation-ready bigram model in ONE self-contained table
    ``(w1, w2, p)``:

    * ``(NULL, token, p)`` — add-alpha unigram probability for the top
      ``vocab_size`` tokens (ties toward the smaller token, as in
      :func:`unigram_lm`);
    * ``(NULL, NULL, p)`` — the out-of-vocabulary unigram probability;
    * ``(w1, w2, p)`` — UNsmoothed conditional ``count(w1 w2)/count(w1)``
      for the top ``bigram_size`` bigrams by count (ties toward smaller
      (w1, w2)); smoothing comes from Jelinek-Mercer interpolation with
      the unigram at scoring time, so a pruned or unseen bigram degrades
      gracefully instead of scoring zero.

    One tokenize pass: the per-doc token array is ``persist``-ed (NOT
    checkpoint-pinned — the model collects to the driver, so nothing
    downstream reads the blocks and they are freed before returning;
    a checkpoint would pin them for the session, see ``_lineage``),
    then the unigram stream and the adjacent-pair stream both read it —
    the corpus text is never re-read. Both count aggregations are
    map-side-combinable; both cuts are ``orderBy().limit()``
    TakeOrdered, never a global sort. The model materializes to the
    driver (``vocab_size + bigram_size + 1`` rows — broadcast-sized by
    construction, the same bound scoring relies on).
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    if vocab_size < 1 or bigram_size < 0:
        raise ValueError(
            f"vocab_size must be >= 1 and bigram_size >= 0, got "
            f"{vocab_size}/{bigram_size}")
    arrs = (
        df.where(F.col(text_col).isNotNull() & F.col(id_col).isNotNull())
        .select(_nonempty_tokens(F.col(text_col)).alias("toks"))
        .where(F.size("toks") >= 1)
    ).persist()

    uni = (arrs.select(F.explode("toks").alias("token"))
           .groupBy("token").agg(F.count(F.lit(1)).alias("c"))).persist()
    try:
        n_total = uni.agg(F.sum("c")).first()[0] or 0
        top = (uni.orderBy(F.col("c").desc(), F.col("token"))
               .limit(vocab_size).collect())

        pairs = arrs.where(F.size("toks") >= 2).select(
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("toks"), 1, F.size("toks") - 1)
                    .alias("w1"),
                    F.slice(F.col("toks"), 2, F.size("toks") - 1)
                    .alias("w2"),
                )
            ).alias("p")
        ).select("p.w1", "p.w2")
        big = (
            pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
            # c(w1) rides a join against the SAME persisted unigram counts
            .join(uni.withColumnRenamed("token", "w1")
                  .withColumnRenamed("c", "c1"), "w1")
            .orderBy(F.col("c12").desc(), "w1", "w2")
            .limit(bigram_size)
            .collect()
        )
    finally:
        uni.unpersist()
        arrs.unpersist()

    v = len(top)
    denom = float(n_total) + alpha * (v + 1)
    rows = [(None, r["token"], (r["c"] + alpha) / denom) for r in top]
    rows.append((None, None, alpha / denom))
    rows.extend((r["w1"], r["w2"], r["c12"] / float(r["c1"])) for r in big)
    return df.sparkSession.createDataFrame(
        rows, "w1 string, w2 string, p double")


def doc_logprob_bigram(
    df: DataFrame,
    model: DataFrame,
    id_col: str,
    text_col: str,
    *,
    lam: float = 0.75,
) -> DataFrame:
    """Per-doc interpolated-bigram score ``(id_col, n_tokens,
    avg_neg_logp)``: the first token scores ``ln(p_uni)``, every later
    token ``ln(lam * p(w_i | w_{i-1}) + (1 - lam) * p_uni(w_i))`` with
    the conditional falling to 0 for pruned/unseen bigrams. ``lam=0``
    reduces exactly to :func:`doc_logprob` (up to 6-decimal rounding).
    Docs with NULL/empty text get NULL score and ``n_tokens = 0``.

    Plan: one row-local (prev, cur) pair stream off the token arrays, two
    broadcast joins (unigram part on ``cur``, bigram part on the pair),
    one map-combinable groupBy by doc id — the same shape as
    :func:`doc_logprob` plus one broadcast."""
    if not 0.0 <= lam < 1.0:
        raise ValueError(f"lam must be in [0, 1), got {lam}")
    vocab = (model.where(F.col("w1").isNull() & F.col("w2").isNotNull())
             .select(F.col("w2").alias("cur"), F.col("p").alias("pu")))
    oov_row = (model.where(F.col("w1").isNull() & F.col("w2").isNull())
               .select("p").first())
    if oov_row is None:
        raise ValueError("model has no OOV row (w1 IS NULL, w2 IS NULL)")
    oov_p = float(oov_row["p"])
    bigrams = (model.where(F.col("w1").isNotNull())
               .select("w1", "w2", F.col("p").alias("pc")))

    arrs = (
        df.where(F.col(text_col).isNotNull() & F.col(id_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            _nonempty_tokens(F.col(text_col)).alias("toks"),
        )
        .where(F.size("toks") >= 1)
    )
    # (prev, cur) for every position; position 1 gets prev = NULL, which
    # the plain (non-null-safe) bigram join correctly never matches
    pairs = arrs.select(
        "id",
        F.explode(
            F.arrays_zip(
                F.concat(F.array(F.lit(None).cast("string")),
                         F.slice(F.col("toks"), 1, F.size("toks") - 1))
                .alias("prev"),
                F.col("toks").alias("cur"),
            )
        ).alias("p"),
    ).select("id", "p.prev", "p.cur")

    scored = (
        pairs.join(F.broadcast(vocab), "cur", "left")
        .join(F.broadcast(bigrams),
              (F.col("prev") == F.col("w1"))
              & (F.col("cur") == F.col("w2")), "left")
        .select(
            "id",
            F.when(
                F.col("prev").isNull(),
                F.log(F.coalesce(F.col("pu"), F.lit(oov_p))),
            ).otherwise(
                F.log(F.lit(lam) * F.coalesce(F.col("pc"), F.lit(0.0))
                      + F.lit(1.0 - lam)
                      * F.coalesce(F.col("pu"), F.lit(oov_p)))
            ).alias("lp"),
        )
    )
    per_doc = scored.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.round(-F.avg("lp"), 6).alias("avg_neg_logp"),
    )
    return (
        df.select(F.col(id_col))
        .join(per_doc.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens"), F.lit(0).cast("long"))
            .alias("n_tokens"),
            "avg_neg_logp",
        )
    )


def perplexity_buckets(
    scores: DataFrame,
    *,
    score_col: str = "avg_neg_logp",
    cuts: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
    exact: bool = True,
) -> DataFrame:
    """CCNet head/middle/tail stratification: docs at or below the
    ``cuts[0]`` quantile of ``score_col`` are ``head`` (most natural),
    above ``cuts[1]`` are ``tail``, the rest ``middle``; NULL scores
    (empty docs) get a NULL bucket.

    Thresholds come from ONE percentile aggregate collected to the driver
    (two doubles) and fold into the plan as literals — no global sort, no
    single-task ``ntile`` window. Thresholds round to 6 decimals so the
    split replays identically in any engine.

    ``exact=True`` (default, engine-replayable interpolated percentile):
    the aggregation buffer holds one entry per DISTINCT score — bounded by
    ``doc_logprob``'s 6-decimal rounding at ~10^7 entries per unit of
    score range, fine up to crawl-shard scale but a single-buffer hotspot
    on a full 10^12-doc corpus. ``exact=False`` switches to
    ``approx_percentile`` (GK sketch, accuracy 10^5 → ±1e-5 rank error):
    constant memory at any scale, thresholds approximate — the same
    exact-vs-sketch trade the validator's ``Options(exact_quantiles)``
    exposes."""
    if exact:
        lo, hi = scores.agg(
            F.round(F.percentile(score_col, cuts[0]), 6),
            F.round(F.percentile(score_col, cuts[1]), 6),
        ).first()
    else:
        lo, hi = scores.agg(
            F.round(F.approx_percentile(score_col, cuts[0], 100_000), 6),
            F.round(F.approx_percentile(score_col, cuts[1], 100_000), 6),
        ).first()
    s = F.col(score_col)
    bucket = (
        F.when(s.isNull(), F.lit(None).cast("string"))
        .when(s <= lo, F.lit("head"))
        .when(s <= hi, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return scores.withColumn("bucket", bucket)
