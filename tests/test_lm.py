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
    plan's heavy branch reads the cached (id, token, cnt) features
    (InMemoryTableScan) — no split()/explode of the text column executes
    outside that cache build (the only remaining reference to the source
    is the cheap id-column join that restores NULL-text rows).

    Checked on the EXECUTED plan: since fused_checkpoint became an
    evictable persist, the optimized plan's InMemoryRelation node prints
    its own cache-BUILD subtree (which legitimately contains the one
    split/explode), so the logical-plan text is no longer
    tokenize-free."""
    from great_expectations_spark.pipeline.lm import lm_train_and_score

    model, scores = lm_train_and_score(
        docs, "doc_id", "text", vocab_size=2, alpha=1.0)
    assert scores.count() == 4  # settle AQE so the final plan is real
    plan = scores._jdf.queryExecution().executedPlan().toString()
    # The scoring branch reads the cached features...
    assert "InMemoryTableScan" in plan
    # ...and the only tokenize in the WHOLE plan text is the cache-BUILD
    # subtree, which AQE prints twice (initial + final sections). A
    # regression adding a second tokenize outside the cache would push
    # the count past 2.
    assert plan.lower().count("explode") <= 2


def test_fused_bad_alpha_raises(spark, docs):
    from great_expectations_spark.pipeline.lm import lm_train_and_score

    with pytest.raises(ValueError, match="alpha"):
        lm_train_and_score(docs, "doc_id", "text", alpha=0.0)


# ---- interpolated bigram LM -------------------------------------------------


@pytest.fixture(scope="module")
def bdocs(spark):
    rows = [(1, "a b a b"), (2, "a b c"), (3, "c"), (4, ""), (5, None)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bigram_model_hand_computed(spark, bdocs):
    from great_expectations_spark.pipeline.lm import bigram_lm

    # unigrams: a=3, b=3, c=2 (N=8); bigrams: (a,b)=3, (b,a)=1, (b,c)=1
    m = bigram_lm(bdocs, "doc_id", "text", vocab_size=3,
                  bigram_size=10, alpha=1.0)
    uni = {r["w2"]: r["p"] for r in m.where("w1 IS NULL").collect()}
    big = {(r["w1"], r["w2"]): r["p"]
           for r in m.where("w1 IS NOT NULL").collect()}
    denom = 8 + 1.0 * (3 + 1)
    assert uni["a"] == pytest.approx(4 / denom)
    assert uni["c"] == pytest.approx(3 / denom)
    assert uni[None] == pytest.approx(1 / denom)   # OOV row
    assert big == {("a", "b"): pytest.approx(3 / 3),
                   ("b", "a"): pytest.approx(1 / 3),
                   ("b", "c"): pytest.approx(1 / 3)}


def test_bigram_cut_keeps_top_by_count(spark, bdocs):
    from great_expectations_spark.pipeline.lm import bigram_lm

    m = bigram_lm(bdocs, "doc_id", "text", vocab_size=3,
                  bigram_size=1, alpha=1.0)
    big = [(r["w1"], r["w2"]) for r in m.where("w1 IS NOT NULL").collect()]
    assert big == [("a", "b")]


def test_bigram_scores_hand_computed(spark, bdocs):
    from great_expectations_spark.pipeline.lm import (
        bigram_lm, doc_logprob_bigram)

    lam = 0.5
    m = bigram_lm(bdocs, "doc_id", "text", vocab_size=3,
                  bigram_size=10, alpha=1.0)
    got = {r["doc_id"]: (r["n_tokens"], r["avg_neg_logp"])
           for r in doc_logprob_bigram(
               bdocs, m, "doc_id", "text", lam=lam).collect()}
    denom = 12.0
    pu = {"a": 4 / denom, "b": 4 / denom, "c": 3 / denom}
    pc = {("a", "b"): 1.0, ("b", "a"): 1 / 3, ("b", "c"): 1 / 3}

    def tok_lp(prev, cur):
        if prev is None:
            return math.log(pu[cur])
        return math.log(lam * pc.get((prev, cur), 0.0)
                        + (1 - lam) * pu[cur])

    def doc_lp(toks):
        lps = [tok_lp(p, c)
               for p, c in zip([None] + toks[:-1], toks)]
        return round(-sum(lps) / len(lps), 6)

    assert got[1] == (4, pytest.approx(doc_lp(["a", "b", "a", "b"])))
    assert got[2] == (3, pytest.approx(doc_lp(["a", "b", "c"])))
    assert got[3] == (1, pytest.approx(doc_lp(["c"])))
    assert got[4] == (0, None)
    assert got[5] == (0, None)


def test_bigram_lambda_zero_equals_unigram(spark, bdocs):
    from great_expectations_spark.pipeline.lm import (
        bigram_lm, doc_logprob, doc_logprob_bigram, unigram_lm)

    m2 = bigram_lm(bdocs, "doc_id", "text", vocab_size=2,
                   bigram_size=10, alpha=0.5)
    m1 = unigram_lm(bdocs, "doc_id", "text", vocab_size=2, alpha=0.5)
    a = {r["doc_id"]: r["avg_neg_logp"]
         for r in doc_logprob_bigram(bdocs, m2, "doc_id", "text",
                                     lam=0.0).collect()}
    b = {r["doc_id"]: r["avg_neg_logp"]
         for r in doc_logprob(bdocs, m1, "doc_id", "text").collect()}
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=2e-6)


def test_bigram_oov_and_unseen_bigram_fallback(spark, bdocs):
    from great_expectations_spark.pipeline.lm import (
        bigram_lm, doc_logprob_bigram)

    m = bigram_lm(bdocs, "doc_id", "text", vocab_size=3,
                  bigram_size=10, alpha=1.0)
    batch = spark.createDataFrame([(9, "zz c a")], "doc_id long, text string")
    got = doc_logprob_bigram(batch, m, "doc_id", "text", lam=0.5).first()
    denom = 12.0
    oov = 1 / denom
    exp = -(math.log(oov)                        # zz: OOV first token
            + math.log(0.5 * 0.0 + 0.5 * (3 / denom))   # (zz,c) unseen
            + math.log(0.5 * 0.0 + 0.5 * (4 / denom))   # (c,a) unseen
            ) / 3
    assert got["n_tokens"] == 3
    assert got["avg_neg_logp"] == pytest.approx(round(exp, 6))


def test_bigram_partitioning_invariance(spark):
    from great_expectations_spark.pipeline.lm import (
        bigram_lm, doc_logprob_bigram)

    rows = [(i, " ".join(f"w{(i * j) % 17}" for j in range(1, 20)))
            for i in range(1, 60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    m = bigram_lm(docs.repartition(7), "doc_id", "text",
                  vocab_size=10, bigram_size=50)
    a = sorted(doc_logprob_bigram(docs.repartition(5), m, "doc_id",
                                  "text").collect())
    b = sorted(doc_logprob_bigram(docs.repartition(2), m, "doc_id",
                                  "text").collect())
    assert a == b


def test_bigram_bad_args_raise(spark, bdocs):
    from great_expectations_spark.pipeline.lm import (
        bigram_lm, doc_logprob_bigram)

    with pytest.raises(ValueError, match="alpha"):
        bigram_lm(bdocs, "doc_id", "text", alpha=0)
    with pytest.raises(ValueError, match="vocab_size"):
        bigram_lm(bdocs, "doc_id", "text", vocab_size=0)
    m = bigram_lm(bdocs, "doc_id", "text", vocab_size=2, bigram_size=2)
    with pytest.raises(ValueError, match="lam"):
        doc_logprob_bigram(bdocs, m, "doc_id", "text", lam=1.0)
    with pytest.raises(ValueError, match="OOV"):
        doc_logprob_bigram(bdocs, m.where("w1 IS NOT NULL"),
                           "doc_id", "text")


def test_bigram_lm_leaves_no_pinned_blocks(spark, bdocs):
    """r3 regression: the model collects to the driver, so training must
    free every block it cached — a localCheckpoint here pinned one full
    token-array copy per call for the session lifetime."""
    from great_expectations_spark.pipeline.lm import bigram_lm

    sc = spark.sparkContext

    def persistent_ids():
        return {int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()}

    before = persistent_ids()
    for _ in range(2):
        m = bigram_lm(bdocs, "doc_id", "text", vocab_size=5, bigram_size=10)
        assert m.count() >= 1
    # Set containment, not count equality: the ContextCleaner may
    # asynchronously unpersist UNRELATED earlier-test RDDs in the window.
    assert persistent_ids() <= before
