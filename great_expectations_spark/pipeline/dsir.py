"""Data Selection with Importance Resampling (DSIR — Xie et al. 2023,
arXiv:2302.03169) re-expressed Spark-first.

Selects raw-corpus documents that look like a TARGET domain (e.g. a
curated high-quality set) by importance weighting in a hashed n-gram
feature space:

* ``hashed_ngram_counts`` — per-doc hashed unigram+bigram bucket counts;
  the only corpus-wide data motion, linear in tokens (explode → 60-bit
  md5 hash mod ``buckets`` → map-combinable groupBy).
* ``bucket_distribution`` — add-alpha-smoothed bucket probabilities for
  a corpus: ONE feature scan + a ``buckets``-row table (``spark.range``
  over the full bucket domain so unseen buckets carry the smoothing
  mass). Bounded by ``buckets`` (default 10^4) regardless of corpus
  size — persistable, broadcast-sized by construction.
* ``dsir_log_weights`` — per-doc importance weight
  ``log w(x) = Σ_b n_x(b) · [log p_target(b) − log q_raw(b)]``: the two
  tiny distribution tables broadcast-join onto the doc feature stream,
  then one map-combinable sum by doc id. No Python anywhere.
* ``dsir_select`` — Gumbel-top-k sampling without replacement
  (Kim et al.'s trick, used by the DSIR release): key =
  ``log w + Gumbel(u)`` with ``u`` the deterministic per-doc uniform
  from ``sampling.uniform_from_key`` — reproducible across engines,
  partitionings, and runs. Selection is ``orderBy(key).limit(n)``
  (TakeOrdered: k rows per partition fold on the driver — no global
  sort; for n beyond driver comfort, threshold on the key's corpus
  quantile instead and keep it a predicate).

Determinism contract: weights and Gumbel keys round to 6 decimals
before ordering (ties break by doc id), so DuckDB replays selections
bit-for-bit (oracles: pipeline_dsir_weights / pipeline_dsir_select).

The reference repo has no data-selection surface; this extends the
training-data addendum alongside ``pipeline/lm.py`` (perplexity
stratification) — DSIR is the targeted-domain complement of CCNet's
untargeted quality split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from great_expectations_spark.pipeline._lineage import fused_checkpoint
from great_expectations_spark.pipeline.dedup import _md5_int
from great_expectations_spark.pipeline.sampling import uniform_from_key

__all__ = [
    "hashed_ngram_counts",
    "bucket_distribution",
    "dsir_log_weights",
    "dsir_select",
]


def _grams(tf: Column) -> Column:
    """Unigrams + bigrams from a MATERIALIZED non-empty-token array column
    (``element_at`` in a lambda re-evaluates its child per access, so the
    filter/split must already live in a real column, never inline here)."""
    bi = F.when(
        F.size(tf) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(tf) - 1),
            lambda i: F.concat_ws(" ", F.element_at(tf, i),
                                  F.element_at(tf, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(tf, bi)


def hashed_ngram_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    buckets: int = 10_000,
) -> DataFrame:
    """``(id, bucket, cnt)`` hashed-feature counts per document.

    ``bucket = md5_60bit(ngram) % buckets`` — the same engine-portable
    hash the MinHash/sampling modules replay in DuckDB as
    ``('0x' || substr(md5(g), 1, 15))::BIGINT % buckets``.
    NULL-text/NULL-id docs emit nothing (no features — callers decide
    their fate; ``dsir_select`` never selects them)."""
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    return (
        df.where(F.col(text_col).isNotNull() & F.col(id_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            F.filter(F.split(F.col(text_col), " "),
                     lambda t: t != "").alias("__tf"),
        )
        .select("id", F.explode(_grams(F.col("__tf"))).alias("g"))
        .select("id", (_md5_int(F.col("g")) % buckets).alias("bucket"))
        .groupBy("id", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _distribution_from_feats(
    feats: DataFrame, buckets: int, alpha: float
) -> DataFrame:
    """``(bucket, logp)`` from an ``(id, bucket, cnt)`` feature table —
    the smoothing/domain-join core shared by ``bucket_distribution`` and
    the fused path in ``dsir_log_weights`` (which reuses ONE materialized
    feature scan for both the raw distribution and the per-doc sums)."""
    counts = feats.groupBy("bucket").agg(F.sum("cnt").alias("c"))
    spark = feats.sparkSession
    domain = spark.range(buckets).select(F.col("id").alias("bucket"))
    c = F.coalesce(F.col("c"), F.lit(0)).cast("double")
    # total N folds in as a scalar subquery-free crossJoin of one row
    total = counts.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("n"))
    return (
        domain.join(counts, "bucket", "left")
        .crossJoin(total)
        .select(
            "bucket",
            F.log((c + F.lit(alpha))
                  / (F.col("n") + F.lit(alpha * buckets))).alias("logp"),
        )
    )


def bucket_distribution(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    buckets: int = 10_000,
    alpha: float = 1.0,
) -> DataFrame:
    """``(bucket, logp)`` over the FULL bucket domain ``[0, buckets)``:
    ``logp = ln((c_b + alpha) / (N + alpha · buckets))`` — one feature
    scan, then a ``spark.range(buckets)`` left join so unseen buckets
    carry the smoothing mass. ``buckets`` rows total."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    return _distribution_from_feats(
        hashed_ngram_counts(df, id_col, text_col, buckets=buckets),
        buckets, alpha)


def dsir_log_weights(
    df: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    *,
    buckets: int = 10_000,
    alpha: float = 1.0,
    materialize_features: bool = False,
) -> DataFrame:
    """``(id, logw)`` — per-doc DSIR importance log-weight against the
    target distribution, rounded to 6 decimals. Docs with no features
    (NULL/empty text) get ``logw`` NULL.

    Plan: the corpus feature table feeds BOTH the raw distribution and
    the per-doc weight sums; the target corpus gets its own single scan.
    Both ``buckets``-row distribution tables broadcast onto the feature
    stream; the weight sum is a map-combinable groupBy on the doc id.

    ``materialize_features=True`` cuts lineage on the feature table
    (evictable ``fused_checkpoint`` persist) so the corpus is
    tokenized/hashed ONCE instead
    of once per consuming branch — pay local block storage for the
    (id, bucket, cnt) ints to skip a second full-text scan. Measured
    crossover: at sf0.1 (5k docs) recompute wins (0.8s vs 1.3s, the
    materialization overhead dominates); at crawl scale the second
    tokenize pass of the full text dwarfs the narrow-int write, so flip
    it on for big corpora."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    p_t = bucket_distribution(
        target, id_col, text_col, buckets=buckets, alpha=alpha)
    feats = hashed_ngram_counts(df, id_col, text_col, buckets=buckets)
    if materialize_features:
        feats = feats.transform(fused_checkpoint)
    q_r = _distribution_from_feats(feats, buckets, alpha)
    ratio = (
        p_t.withColumnRenamed("logp", "lp")
        .join(q_r.withColumnRenamed("logp", "lq"), "bucket")
        .select("bucket", (F.col("lp") - F.col("lq")).alias("lr"))
    )
    weights = (
        feats.join(F.broadcast(ratio), "bucket")
        .groupBy("id")
        .agg(F.round(F.sum(F.col("cnt") * F.col("lr")), 6).alias("logw"))
    )
    return (
        df.select(F.col(id_col))
        .join(weights.withColumnRenamed("id", id_col), id_col, "left")
        .select(id_col, "logw")
    )


def dsir_select(
    df: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int,
    buckets: int = 10_000,
    alpha: float = 1.0,
    seed: int = 0,
    gumbel: bool = True,
    materialize_features: bool = False,
) -> DataFrame:
    """The ``n`` rows of ``df`` DSIR-sampled toward ``target``.

    ``gumbel=True`` (the paper's sampling-without-replacement): key =
    ``round(logw, 6) + round(−ln(−ln(u + 5e−7)), 6)`` with ``u`` the
    deterministic per-doc uniform (the half-step keeps ``ln`` off the
    0 endpoint); ``gumbel=False`` degenerates to hard top-n by weight.
    Ties break by doc id, so the selected set is unique and replayable.
    Docs without features (NULL logw) are never selected.
    ``materialize_features`` forwards to ``dsir_log_weights`` (tokenize
    the corpus once at crawl scale). Internal columns are namespaced —
    a corpus that already carries ``logw``/``__key`` columns passes
    through untouched."""
    if n <= 0:
        raise ValueError(f"n must be > 0, got {n}")
    reserved = {"__dsir_logw", "__dsir_key"} & set(df.columns)
    if reserved:
        raise ValueError(f"input columns collide with reserved names: "
                         f"{sorted(reserved)}")
    w = dsir_log_weights(
        df, target, id_col, text_col, buckets=buckets, alpha=alpha,
        materialize_features=materialize_features,
    ).select(F.col(id_col), F.col("logw").alias("__dsir_logw"))
    key = F.col("__dsir_logw")
    if gumbel:
        u = uniform_from_key(F.col(id_col), seed) + F.lit(5e-7)
        key = key + F.round(-F.log(-F.log(u)), 6)
    ranked = (
        df.join(w, id_col)
        .where(F.col("__dsir_logw").isNotNull())
        .withColumn("__dsir_key", F.round(key, 6))
    )
    return (
        ranked.orderBy(F.col("__dsir_key").desc(), F.col(id_col))
        .limit(n)
        .drop("__dsir_logw", "__dsir_key")
    )
