"""Benchmark decontamination (pipeline/decontam.py).

Planted-leak fixtures: eval docs are verbatim n-gram slices of known corpus
docs, so the expected flag set and hit counts are hand-derivable from the
single-space-token shingle contract.
"""

from __future__ import annotations

import pytest

from great_expectations_spark.pipeline.decontam import (
    contamination_stats,
    decontaminate,
    eval_ngram_hashes,
)

# 12-token docs; tokens are single-space separated by contract.
CORPUS = [
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
    (2, "one two three four five six seven eight nine ten eleven twelve"),
    (3, "red orange yellow green blue indigo violet pink brown black white gray"),
    (4, None),
    (5, "tiny doc"),  # < n tokens -> no shingles, never flagged
]

# eval doc A leaks a 3-gram run from corpus doc 1; eval doc B from doc 2;
# eval doc C is clean vocabulary.
EVAL = [
    (100, "gamma delta epsilon zeta"),
    (101, "seven eight nine"),
    (102, "completely fresh words here"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(CORPUS, "doc_id int, text string")


@pytest.fixture(scope="module")
def eval_df(spark):
    return spark.createDataFrame(EVAL, "eval_doc int, text string")


def test_eval_ngram_hashes_distinct(spark, eval_df):
    # eval doc 100 has 4 tokens -> two 3-grams; 101 -> one; 102 -> two
    assert eval_ngram_hashes(eval_df, n=3).count() == 5
    pairs = eval_ngram_hashes(eval_df, n=3, id_col="eval_doc")
    assert pairs.count() == 5
    assert set(pairs.columns) == {"shingle", "eval_id"}


def test_contamination_stats_planted(spark, corpus, eval_df):
    rows = {
        r["doc_id"]: r
        for r in contamination_stats(
            corpus, eval_df, n=3, eval_id_col="eval_doc"
        ).collect()
    }
    # docs 3/4/5 clean; docs 1 and 2 flagged
    assert set(rows) == {1, 2}
    # doc 1: 10 shingles, eval doc 100 contributes 2 overlapping 3-grams
    assert rows[1]["n_shingles"] == 10
    assert rows[1]["hit_shingles"] == 2
    assert rows[1]["matched_eval_docs"] == 1
    assert rows[1]["contamination_fraction"] == pytest.approx(0.2)
    # doc 2: 1 hit from eval doc 101
    assert rows[2]["hit_shingles"] == 1
    assert rows[2]["matched_eval_docs"] == 1


def test_hit_shingles_not_multiplied_by_eval_docs(spark, corpus):
    # the same leaked 3-gram appears in TWO eval docs -> still 1 distinct hit
    ev = spark.createDataFrame(
        [(200, "gamma delta epsilon"), (201, "gamma delta epsilon tail")],
        "eval_doc int, text string",
    )
    r = contamination_stats(corpus, ev, n=3, eval_id_col="eval_doc").collect()
    assert len(r) == 1
    assert r[0]["hit_shingles"] == 1
    assert r[0]["matched_eval_docs"] == 2


def test_decontaminate_split(spark, corpus, eval_df):
    clean, contaminated = decontaminate(corpus, eval_df, n=3)
    assert sorted(r["doc_id"] for r in clean.collect()) == [3, 4, 5]
    assert sorted(r["doc_id"] for r in contaminated.collect()) == [1, 2]
    # schema preserved
    assert clean.columns == corpus.columns


def test_decontaminate_min_hits_threshold(spark, corpus, eval_df):
    # min_hits=2 keeps doc 2 (only 1 overlapping shingle)
    clean, contaminated = decontaminate(corpus, eval_df, n=3, min_hits=2)
    assert sorted(r["doc_id"] for r in contaminated.collect()) == [1]
    assert 2 in {r["doc_id"] for r in clean.collect()}


def test_decontaminate_min_fraction(spark, corpus, eval_df):
    # doc 1 fraction = 0.2, doc 2 fraction = 0.1
    _, contaminated = decontaminate(corpus, eval_df, n=3, min_fraction=0.15)
    assert sorted(r["doc_id"] for r in contaminated.collect()) == [1]


def test_clean_corpus_empty_stats(spark, corpus):
    ev = spark.createDataFrame([(1, "totally unrelated token stream")],
                               "eval_doc int, text string")
    assert contamination_stats(corpus, ev, n=3).count() == 0
    clean, contaminated = decontaminate(corpus, ev, n=3)
    assert clean.count() == len(CORPUS)
    assert contaminated.count() == 0


def test_shuffle_join_fallback_matches_broadcast(spark, corpus, eval_df):
    b = contamination_stats(corpus, eval_df, n=3, broadcast=True).collect()
    s = contamination_stats(corpus, eval_df, n=3, broadcast=False).collect()
    key = lambda r: r["doc_id"]
    assert sorted(map(tuple, b), key=lambda t: t[0]) == sorted(
        map(tuple, s), key=lambda t: t[0]
    )
