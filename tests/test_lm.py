"""Corpus-trained unigram LM scoring + CCNet perplexity buckets
(pipeline/lm.py)."""

from __future__ import annotations

import math

import pytest

from great_expectations_spark.pipeline.lm import (
    doc_logprob,
    perplexity_buckets,
    unigram_lm,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(1, "a a b"), (2, "a c"), (3, ""), (4, None)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_model_probabilities_hand_computed(spark, docs):
    # counts: a=3, b=1, c=1; top-2 = a, b (count tie c vs b breaks to b);
    # N=5, V=2, denom = 5 + 1*(2+1) = 8
    m = {r["token"]: r["logp"]
         for r in unigram_lm(docs, "doc_id", "text",
                             vocab_size=2, alpha=1.0).collect()}
    assert set(m) == {"a", "b", None}
    assert m["a"] == pytest.approx(math.log(4 / 8))
    assert m["b"] == pytest.approx(math.log(2 / 8))
    assert m[None] == pytest.approx(math.log(1 / 8))


def test_doc_scores_hand_computed(spark, docs):
    model = unigram_lm(docs, "doc_id", "text", vocab_size=2, alpha=1.0)
    s = {r["doc_id"]: r for r in
         doc_logprob(docs, model, "doc_id", "text").collect()}
    # doc 1: a a b -> -(2 ln .5 + ln .25)/3 ; doc 2: a + OOV(c)
    assert s[1]["n_tokens"] == 3
    assert s[1]["avg_neg_logp"] == pytest.approx(
        (2 * math.log(2) + math.log(4)) / 3, abs=1e-6)
    assert s[2]["n_tokens"] == 2
    assert s[2]["avg_neg_logp"] == pytest.approx(
        (math.log(2) + math.log(8)) / 2, abs=1e-6)
    # empty / NULL text: zero tokens, NULL score
    assert s[3]["n_tokens"] == 0 and s[3]["avg_neg_logp"] is None
    assert s[4]["n_tokens"] == 0 and s[4]["avg_neg_logp"] is None


def test_buckets_head_and_tail(spark, docs):
    model = unigram_lm(docs, "doc_id", "text", vocab_size=2, alpha=1.0)
    b = {r["doc_id"]: r["bucket"] for r in
         perplexity_buckets(
             doc_logprob(docs, model, "doc_id", "text")).collect()}
    assert b[1] == "head"      # most natural (in-vocab) doc
    assert b[2] == "tail"      # OOV-heavy doc
    assert b[3] is None and b[4] is None


def test_model_scores_unseen_batch(spark, docs):
    """Train once, score a NEW batch — the training corpus is not
    re-read (incremental-scoring contract)."""
    model = unigram_lm(docs, "doc_id", "text", vocab_size=2, alpha=1.0)
    new = spark.createDataFrame(
        [(10, "a a a"), (11, "z z")], "doc_id long, text string")
    s = {r["doc_id"]: r["avg_neg_logp"] for r in
         doc_logprob(new, model, "doc_id", "text").collect()}
    assert s[10] == pytest.approx(math.log(2), abs=1e-6)
    assert s[11] == pytest.approx(math.log(8), abs=1e-6)  # all OOV


def test_partitioning_invariance(spark, docs):
    key = lambda t: (t[0] is None, t[0] or "", t[1])  # noqa: E731
    m1 = sorted(map(tuple, unigram_lm(
        docs.repartition(1), "doc_id", "text",
        vocab_size=2, alpha=1.0).collect()), key=key)
    m8 = sorted(map(tuple, unigram_lm(
        docs.repartition(8, "doc_id"), "doc_id", "text",
        vocab_size=2, alpha=1.0).collect()), key=key)
    assert m1 == m8


def test_bad_inputs_raise(spark, docs):
    with pytest.raises(ValueError, match="alpha"):
        unigram_lm(docs, "doc_id", "text", alpha=0.0)
    no_oov = unigram_lm(docs, "doc_id", "text", vocab_size=2).where(
        "token IS NOT NULL")
    with pytest.raises(ValueError, match="OOV"):
        doc_logprob(docs, no_oov, "doc_id", "text")


def test_perplexity_buckets_sketch_mode_close_to_exact(spark, docs):
    model = unigram_lm(docs, "doc_id", "text", vocab_size=50)
    scores = doc_logprob(docs, model, "doc_id", "text").cache()
    exact = {r["doc_id"]: r["bucket"]
             for r in perplexity_buckets(scores).collect()}
    approx = {r["doc_id"]: r["bucket"]
              for r in perplexity_buckets(scores, exact=False).collect()}
    scores.unpersist()
    # GK accuracy 1e5 on a few hundred docs: thresholds land on the same
    # values, buckets agree except possibly docs exactly at a boundary
    diff = sum(1 for k in exact if exact[k] != approx[k])
    assert diff <= max(2, len(exact) // 50)


def test_unigram_lm_single_training_scan(spark, docs):
    """The returned model is a local relation — scoring plans must not
    contain the training corpus scan."""
    model = unigram_lm(docs, "doc_id", "text", vocab_size=20)
    plan = model._jdf.queryExecution().optimizedPlan().toString()
    assert "parquet" not in plan.lower()


def test_fused_train_and_score_matches_two_pass(spark, docs):
    from great_expectations_spark.pipeline.lm import lm_train_and_score

    model2, scores2 = lm_train_and_score(
        docs, "doc_id", "text", vocab_size=2, alpha=1.0)
    model1 = unigram_lm(docs, "doc_id", "text", vocab_size=2, alpha=1.0)
    # the model is bit-identical (integer count arithmetic either way)
    key = lambda t: (t[0] is None, t[0], t[1])
    assert sorted(map(tuple, model2.collect()), key=key) == sorted(
        map(tuple, model1.collect()), key=key)
    s1 = {r["doc_id"]: r for r in
          doc_logprob(docs, model1, "doc_id", "text").collect()}
    s2 = {r["doc_id"]: r for r in scores2.collect()}
    assert set(s1) == set(s2)
    for k in s1:
        assert s2[k]["n_tokens"] == s1[k]["n_tokens"]
        if s1[k]["avg_neg_logp"] is None:
            assert s2[k]["avg_neg_logp"] is None
        else:
            # same quantity up to fp association; both round to 6 decimals
            assert s2[k]["avg_neg_logp"] == pytest.approx(
                s1[k]["avg_neg_logp"], abs=2e-6)


def test_fused_scoring_never_rereads_text(spark, docs):
    """The fused path tokenizes the corpus EXACTLY once: the scoring
    plan's heavy branch bottoms out in the checkpointed (id, token, cnt)
    features — no split()/explode of the text column appears in it (the
    only remaining reference to the source is the cheap id-column join
    that restores NULL-text rows)."""
    from great_expectations_spark.pipeline.lm import lm_train_and_score

    model, scores = lm_train_and_score(
        docs, "doc_id", "text", vocab_size=2, alpha=1.0)
    plan = scores._jdf.queryExecution().optimizedPlan().toString()
    assert "split(" not in plan and "explode" not in plan.lower()
    assert scores.count() == 4


def test_fused_bad_alpha_raises(spark, docs):
    from great_expectations_spark.pipeline.lm import lm_train_and_score

    with pytest.raises(ValueError, match="alpha"):
        lm_train_and_score(docs, "doc_id", "text", alpha=0.0)
