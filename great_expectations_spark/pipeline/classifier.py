"""Quality classification: a fasttext/GPT-3-style linear classifier over
hashed n-gram features, Spark-first.

The published recipe (GPT-3's Wikipedia-reference LR filter, CCNet's
fasttext quality classes, LLaMA's Wikipedia classifier) trains a linear
model to separate a small curated POSITIVE corpus from the raw crawl,
then keeps raw docs whose score clears a threshold. Rebuilt on the same
hashed unigram+bigram feature space as ``pipeline/dsir.py``:

* ``train_ngram_classifier`` — full-batch logistic regression by
  gradient descent. Per iteration: ONE broadcast join of the
  ``buckets``-row weight table onto the cached feature stream, a
  doc-keyed margin sum, and a bucket-keyed gradient sum — two shuffles
  of ``(id, bucket, cnt)`` triples, never raw text. The weight vector
  (``buckets`` doubles + bias) lives on the driver between iterations,
  exactly like the k-means codebook in ``pipeline/embcluster.py``.
* ``classify_docs`` — σ(w·x + b) per doc with a FIXED model: broadcast
  weights join + map-combinable doc sum, zero Python. The model is a
  plain ``(bucket, weight)`` DataFrame plus a float bias, so it
  persists to any table format and replays in any engine (oracle:
  pipeline_classifier_scores scores against a literal weight table).
* ``quality_filter`` — the survivors above a score threshold, the form
  the cleaning recipes consume (``recipes.predicate_stage`` wraps it).

Training determinism: gradients are float64 Spark aggregates, so
last-ulp partition-order effects make retrained weights agree only to
~1e-12 — tests assert separation/convergence, not bitwise weights;
SCORING against a fixed model rounds to 6 decimals and replays
digit-exact in DuckDB (same contract as ``dsir_log_weights``).

The reference repo has no classifier surface; this extends the
training-data addendum beside DSIR (generative importance ratio) with
its discriminative counterpart.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from great_expectations_spark.pipeline._lineage import (
    tracked_checkpoint, unpersist_ids)
from great_expectations_spark.pipeline.dsir import hashed_ngram_counts

__all__ = [
    "train_ngram_classifier",
    "classify_docs",
    "quality_filter",
]


def _labeled_features(
    pos: DataFrame, neg: DataFrame, id_col: str, text_col: str, buckets: int
) -> DataFrame:
    """(id, bucket, cnt, y) with y=1.0 for pos docs, 0.0 for neg. Ids are
    namespaced by class so a doc appearing in both corpora (raw crawls DO
    contain the curated set) contributes one example per class instead of
    corrupting the join."""
    p = hashed_ngram_counts(pos, id_col, text_col, buckets=buckets).select(
        F.concat(F.lit("p|"), F.col("id").cast("string")).alias("id"),
        "bucket", "cnt", F.lit(1.0).alias("y"))
    n = hashed_ngram_counts(neg, id_col, text_col, buckets=buckets).select(
        F.concat(F.lit("n|"), F.col("id").cast("string")).alias("id"),
        "bucket", "cnt", F.lit(0.0).alias("y"))
    return p.unionByName(n)


def train_ngram_classifier(
    pos: DataFrame,
    neg: DataFrame,
    id_col: str,
    text_col: str,
    *,
    buckets: int = 10_000,
    iters: int = 20,
    lr: float = 0.5,
    l2: float = 1e-6,
    normalize: bool = True,
) -> tuple[DataFrame, float]:
    """Logistic regression weights for pos-vs-neg document classification.

    Returns ``(weights_df, bias)`` where ``weights_df`` is the
    ``buckets``-row table ``(bucket, weight)`` (zero rows omitted — the
    scoring join is LEFT and coalesces) and ``bias`` the intercept.

    Full-batch GD: w ← w − lr·(∇ + l2·w) with the gradient computed in
    ONE pass over the cached feature triples per iteration (broadcast
    weight join → per-doc margin → error join-back → per-bucket sum).
    ``normalize=True`` scales each doc's counts to sum 1 (length
    invariance — a long doc is not more "positive" than a short one).
    The driver holds ``buckets`` doubles between iterations; nothing
    else leaves the cluster."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    feats = _labeled_features(pos, neg, id_col, text_col, buckets)
    if normalize:
        totals = feats.groupBy("id").agg(F.sum("cnt").alias("__tot"))
        feats = (feats.join(totals, "id")
                 .select("id", "bucket", "y",
                         (F.col("cnt") / F.col("__tot")).alias("x")))
    else:
        feats = feats.select("id", "bucket", "y", F.col("cnt").cast("double").alias("x"))
    feats = feats.localCheckpoint(eager=True)
    spark = feats.sparkSession

    n_docs = feats.select("id").distinct().count()
    if n_docs == 0:
        raise ValueError("no trainable documents (all NULL text/id?)")

    w = [0.0] * buckets
    b = 0.0
    for _ in range(iters):
        wdf = spark.createDataFrame(
            [(i, wi) for i, wi in enumerate(w) if wi != 0.0] or [(0, 0.0)],
            "bucket int, w double")
        margins = (
            feats.join(F.broadcast(wdf), "bucket", "left")
            .groupBy("id", "y")
            .agg(F.sum(F.col("x") * F.coalesce(F.col("w"), F.lit(0.0)))
                 .alias("m"))
            .select("id", "y",
                    (F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("m") + F.lit(b))))
                     - F.col("y")).alias("err"))
        )
        # the gradient join AND the bias sum both consume this — cut
        # lineage so the margin pass runs once per iteration; tracked so
        # each iteration frees the previous one's pinned blocks
        # (checkpoint blocks are eviction-exempt: leaving them accumulates
        # O(iters) margin copies in storage memory). EAGER: a lazy cut's
        # first materialization can land on an AQE broadcast-exchange
        # thread (margins is broadcast-sized) and deadlock the driver —
        # see _lineage.fused_checkpoint
        margins, ckpt_ids = tracked_checkpoint(margins, eager=True)
        grad_rows = (
            feats.join(margins.select("id", "err"), "id")
            .groupBy("bucket")
            .agg(F.sum(F.col("x") * F.col("err")).alias("g"))
            .collect()
        )
        gb = margins.agg(F.sum("err")).first()[0] or 0.0
        unpersist_ids(margins, ckpt_ids)
        scale = lr / n_docs
        for r in grad_rows:
            i = r["bucket"]
            w[i] -= scale * (r["g"] + l2 * n_docs * w[i])
        b -= scale * gb
    weights_df = spark.createDataFrame(
        [(i, wi) for i, wi in enumerate(w) if wi != 0.0] or [(0, 0.0)],
        "bucket int, weight double")
    return weights_df, b


def classify_docs(
    df: DataFrame,
    weights: DataFrame,
    bias: float,
    id_col: str,
    text_col: str,
    *,
    buckets: int = 10_000,
    normalize: bool = True,
) -> DataFrame:
    """(id, score) — σ(w·x + bias) per doc against a FIXED model, rounded
    to 6 decimals. Docs with no features (NULL/empty text, NULL id) score
    NULL. One feature scan + broadcast weight join + doc-keyed
    map-combinable sum; zero Python."""
    feats = hashed_ngram_counts(df, id_col, text_col, buckets=buckets)
    if normalize:
        totals = feats.groupBy("id").agg(F.sum("cnt").alias("__tot"))
        feats = (feats.join(totals, "id")
                 .select("id", "bucket",
                         (F.col("cnt") / F.col("__tot")).alias("x")))
    else:
        feats = feats.select("id", "bucket", F.col("cnt").cast("double").alias("x"))
    w = weights.select(F.col("bucket"), F.col("weight").alias("__w"))
    scores = (
        feats.join(F.broadcast(w), "bucket", "left")
        .groupBy("id")
        .agg(F.sum(F.col("x") * F.coalesce(F.col("__w"), F.lit(0.0)))
             .alias("__m"))
        .select(
            "id",
            F.round(
                F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("__m") + F.lit(float(bias))))),
                6).alias("score"))
    )
    return (
        df.select(F.col(id_col))
        .join(scores.withColumnRenamed("id", id_col), id_col, "left")
        .select(id_col, "score")
    )


def quality_filter(
    df: DataFrame,
    weights: DataFrame,
    bias: float,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    *,
    buckets: int = 10_000,
    normalize: bool = True,
) -> DataFrame:
    """The rows of ``df`` whose classifier score ≥ ``threshold`` (docs
    without features never pass — a filter must not keep what it cannot
    score). Original schema preserved."""
    scores = classify_docs(
        df, weights, bias, id_col, text_col,
        buckets=buckets, normalize=normalize)
    keep = scores.where(F.col("score") >= threshold).select(id_col)
    return df.join(keep, id_col, "left_semi")


def _auc(scores: list[tuple[float, float]]) -> float:
    """Driver-side ROC-AUC from (score, y) pairs (rank statistic, ties ->
    midrank) — test helper, not a distributed op."""
    ranked = sorted(scores, key=lambda t: t[0])
    n_pos = sum(1 for _, y in ranked if y == 1.0)
    n_neg = len(ranked) - n_pos
    if n_pos == 0 or n_neg == 0:
        return math.nan
    # midranks over ties
    rank_sum = 0.0
    i = 0
    while i < len(ranked):
        j = i
        while j < len(ranked) and ranked[j][0] == ranked[i][0]:
            j += 1
        mid = (i + 1 + j) / 2.0
        rank_sum += mid * sum(1 for k in range(i, j) if ranked[k][1] == 1.0)
        i = j
    return (rank_sum - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
