"""Hashed n-gram quality classifier (pipeline/classifier.py): training
separates planted vocabularies, fixed-model scoring is deterministic and
engine-portable, filter semantics."""

import pytest
from pyspark.sql import functions as F

from great_expectations_spark.pipeline.classifier import (
    _auc,
    classify_docs,
    quality_filter,
    train_ngram_classifier,
)

GOOD_WORDS = ["science", "theory", "evidence", "study", "research", "method"]
BAD_WORDS = ["click", "free", "winner", "prize", "casino", "pills"]


@pytest.fixture(scope="module")
def corpora(spark):
    import random

    rnd = random.Random(7)

    def doc(words, n=12):
        return " ".join(rnd.choice(words) for _ in range(n))

    pos = spark.createDataFrame(
        [(i, doc(GOOD_WORDS)) for i in range(60)], "doc_id long, text string")
    neg = spark.createDataFrame(
        [(i, doc(BAD_WORDS)) for i in range(60)], "doc_id long, text string")
    return pos.cache(), neg.cache()


@pytest.fixture(scope="module")
def model(corpora):
    pos, neg = corpora
    return train_ngram_classifier(
        pos, neg, "doc_id", "text", buckets=512, iters=15, lr=10.0)


def test_training_separates_vocabularies(corpora, model):
    pos, neg = corpora
    w, b = model
    sp = classify_docs(pos, w, b, "doc_id", "text", buckets=512).collect()
    sn = classify_docs(neg, w, b, "doc_id", "text", buckets=512).collect()
    pairs = ([(r["score"], 1.0) for r in sp] + [(r["score"], 0.0) for r in sn])
    auc = _auc(pairs)
    assert auc > 0.97, f"classifier failed to separate: AUC={auc}"
    # scores actually move away from the 0.5 prior in both directions
    assert max(r["score"] for r in sp) > 0.6
    assert min(r["score"] for r in sn) < 0.4


def test_scoring_fixed_model_deterministic(spark, corpora, model):
    pos, _ = corpora
    w, b = model
    a = classify_docs(pos, w, b, "doc_id", "text", buckets=512).collect()
    c = classify_docs(pos.repartition(7), w, b, "doc_id", "text",
                      buckets=512).collect()
    assert sorted((r["doc_id"], r["score"]) for r in a) == \
        sorted((r["doc_id"], r["score"]) for r in c)


def test_null_and_empty_docs_score_null(spark, model):
    w, b = model
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "science study"), (None, "science")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["score"]
           for r in classify_docs(df, w, b, "doc_id", "text",
                                  buckets=512).collect()}
    assert got[1] is None and got[2] is None
    assert got[3] is not None
    assert got[None] is None


def test_quality_filter_keeps_schema_and_thresholds(corpora, model):
    pos, neg = corpora
    w, b = model
    mixed = pos.unionByName(neg.select((F.col("doc_id") + 1000).alias("doc_id"),
                                       "text"))
    kept = quality_filter(mixed, w, b, "doc_id", "text", threshold=0.5,
                          buckets=512)
    assert kept.columns == mixed.columns
    ids = [r["doc_id"] for r in kept.collect()]
    # mostly positive docs survive
    assert sum(1 for i in ids if i < 1000) > 50
    assert sum(1 for i in ids if i >= 1000) < 10


def test_bias_learns_class_prior(spark):
    # one-sided corpus with ZERO informative features (identical text):
    # weights stay ~0 via symmetric gradients, bias must carry the prior
    same_p = spark.createDataFrame([(i, "x y") for i in range(40)],
                                   "doc_id long, text string")
    same_n = spark.createDataFrame([(i, "x y") for i in range(10)],
                                   "doc_id long, text string")
    w, b = train_ngram_classifier(same_p, same_n, "doc_id", "text",
                                  buckets=64, iters=30, lr=1.0)
    s = classify_docs(same_p, w, b, "doc_id", "text", buckets=64).first()
    assert s["score"] > 0.6  # 80% positive prior


def test_train_arg_validation(corpora):
    pos, neg = corpora
    with pytest.raises(ValueError, match="iters"):
        train_ngram_classifier(pos, neg, "doc_id", "text", iters=0)


def test_auc_helper():
    assert _auc([(0.9, 1.0), (0.8, 1.0), (0.2, 0.0), (0.1, 0.0)]) == 1.0
    assert _auc([(0.5, 1.0), (0.5, 0.0)]) == 0.5
