"""DSIR importance resampling (pipeline/dsir.py)."""

from __future__ import annotations

import math

import pytest

from great_expectations_spark.pipeline.dsir import (
    bucket_distribution,
    dsir_log_weights,
    dsir_select,
    hashed_ngram_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the stock market closed higher on strong earnings"),
        (2, "quarterly earnings beat market expectations again today"),
        (3, "the recipe needs flour sugar butter and three eggs"),
        (4, "bake the cake at medium heat until golden brown"),
        (5, "market earnings stock higher quarterly"),
        (6, None),
        (7, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def target(spark):
    rows = [
        (101, "stock market earnings climbed on quarterly results"),
        (102, "earnings season lifted the market to record highs"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hashed_ngram_counts_shape(spark, corpus):
    out = hashed_ngram_counts(corpus, "doc_id", "text", buckets=64)
    rows = out.collect()
    assert out.columns == ["id", "bucket", "cnt"]
    assert all(0 <= r["bucket"] < 64 for r in rows)
    # doc 1 has 8 tokens -> 8 unigrams + 7 bigrams = 15 feature occurrences
    doc1 = sum(r["cnt"] for r in rows if r["id"] == 1)
    assert doc1 == 15
    # NULL / empty text emit nothing
    assert not [r for r in rows if r["id"] in (6, 7)]


def test_bucket_distribution_is_normalized(spark, corpus):
    dist = bucket_distribution(corpus, "doc_id", "text", buckets=32)
    rows = dist.collect()
    assert len(rows) == 32  # full domain, unseen buckets included
    assert abs(sum(math.exp(r["logp"]) for r in rows) - 1.0) < 1e-9


def test_weights_prefer_target_like_docs(spark, corpus, target):
    w = {r["doc_id"]: r["logw"] for r in dsir_log_weights(
        corpus, target, "doc_id", "text", buckets=512).collect()}
    finance = [w[1], w[2], w[5]]
    baking = [w[3], w[4]]
    assert min(finance) > max(baking)
    assert w[6] is None and w[7] is None  # no features -> NULL


def test_select_deterministic_and_partition_invariant(spark, corpus, target):
    a = sorted(r["doc_id"] for r in dsir_select(
        corpus, target, "doc_id", "text", n=3, buckets=512).collect())
    b = sorted(r["doc_id"] for r in dsir_select(
        corpus.repartition(7), target, "doc_id", "text",
        n=3, buckets=512).collect())
    assert a == b and len(a) == 3
    assert 6 not in a and 7 not in a  # featureless docs never selected


def test_select_hard_topn_matches_weight_order(spark, corpus, target):
    w = {r["doc_id"]: r["logw"] for r in dsir_log_weights(
        corpus, target, "doc_id", "text", buckets=512).collect()
        if r["logw"] is not None}
    expected = sorted(w, key=lambda k: (-w[k], k))[:2]
    got = sorted(r["doc_id"] for r in dsir_select(
        corpus, target, "doc_id", "text", n=2, buckets=512,
        gumbel=False).collect())
    assert got == sorted(expected)


def test_select_keeps_original_columns(spark, corpus, target):
    out = dsir_select(corpus, target, "doc_id", "text", n=2, buckets=512)
    assert out.columns == corpus.columns


def test_validation_args(spark, corpus, target):
    with pytest.raises(ValueError, match="buckets"):
        hashed_ngram_counts(corpus, "doc_id", "text", buckets=1)
    with pytest.raises(ValueError, match="alpha"):
        bucket_distribution(corpus, "doc_id", "text", alpha=0)
    with pytest.raises(ValueError, match="n must"):
        dsir_select(corpus, target, "doc_id", "text", n=0)
