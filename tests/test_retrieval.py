"""BM25 lexical retrieval (pipeline/retrieval.py)."""

import math

import pytest

from great_expectations_spark.pipeline.retrieval import (
    bm25_index,
    bm25_search,
    bm25_search_index,
)

K1, B = 1.2, 0.75


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat"),
            (3, "cats and dogs"),
            (4, None),           # no postings
            (None, "ghost doc"),  # no postings
        ],
        "doc_id long, text string",
    )


def _expected_score(terms, n_docs, avgdl):
    """terms: list of (tf, df, dl) for one (query, doc)."""
    s = 0.0
    for tf, df, dl in terms:
        idf = math.log(1 + (n_docs - df + 0.5) / (df + 0.5))
        s += idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / avgdl))
    return round(s, 6)


def test_bm25_matches_hand_computation(spark):
    queries = spark.createDataFrame(
        [("q1", "cat sat"), ("q2", "dog")], "query_id string, text string")
    out = {(r.query_id, r.doc_id): (r.score, r.rank)
           for r in bm25_search(_corpus(spark), queries, top_k=3).collect()}
    n, avgdl = 3, (6 + 3 + 3) / 3
    assert out[("q1", 1)] == (_expected_score([(1, 1, 6), (1, 2, 6)], n, avgdl), 1)
    assert out[("q1", 2)] == (_expected_score([(1, 2, 3)], n, avgdl), 2)
    assert out[("q2", 2)] == (_expected_score([(1, 1, 3)], n, avgdl), 1)
    assert len(out) == 3


def test_bm25_unmatched_and_null_queries_absent(spark):
    queries = spark.createDataFrame(
        [("q_none", "zebra"), ("q_null", None), (None, "cat")],
        "query_id string, text string")
    assert bm25_search(_corpus(spark), queries).count() == 0


def test_bm25_repeated_query_terms_count_once(spark):
    q1 = spark.createDataFrame([("q", "cat cat cat")], "query_id string, text string")
    q2 = spark.createDataFrame([("q", "cat")], "query_id string, text string")
    corpus = _corpus(spark)
    assert (sorted(bm25_search(corpus, q1).collect())
            == sorted(bm25_search(corpus, q2).collect()))


def test_bm25_top_k_bound_and_rank_order(spark):
    corpus = spark.createDataFrame(
        [(i, "shared " + ("pad " * (i % 5)).strip()) for i in range(1, 30)],
        "doc_id long, text string")
    queries = spark.createDataFrame([("q", "shared")], "query_id string, text string")
    rows = bm25_search(corpus, queries, top_k=7).collect()
    assert len(rows) == 7
    by_rank = sorted(rows, key=lambda r: r.rank)
    assert [r.rank for r in by_rank] == list(range(1, 8))
    # (score desc, doc_id asc) total order
    keys = [(-r.score, r.doc_id) for r in by_rank]
    assert keys == sorted(keys)


def test_bm25_partitioning_invariance(spark):
    corpus = _corpus(spark)
    queries = spark.createDataFrame(
        [("q1", "cat sat"), ("q2", "dogs and")], "query_id string, text string")
    a = sorted(bm25_search(corpus, queries).collect())
    b = sorted(bm25_search(corpus.repartition(7), queries).collect())
    assert a == b


def test_bm25_index_roundtrip_through_parquet(spark, tmp_path):
    """The postings frame is a persistable state table: searching a
    written-and-reloaded index equals searching the fresh one."""
    corpus = _corpus(spark)
    queries = spark.createDataFrame([("q1", "cat sat")], "query_id string, text string")
    idx = bm25_index(corpus, "doc_id", "text")
    path = str(tmp_path / "bm25_postings")
    idx.write.parquet(path)
    reloaded = spark.read.parquet(path)
    assert (sorted(bm25_search_index(idx, queries).collect())
            == sorted(bm25_search_index(reloaded, queries).collect()))


def test_bm25_index_shape_and_null_exclusion(spark):
    rows = bm25_index(_corpus(spark), "doc_id", "text").collect()
    assert {r["__id"] for r in rows} == {1, 2, 3}
    r = {(x["__id"], x.token): (x.tf, x.dl) for x in rows}
    assert r[(1, "the")] == (2, 6)
    assert r[(2, "sat")] == (1, 3)


def test_bm25_empty_corpus_empty_result(spark):
    corpus = spark.createDataFrame([], "doc_id long, text string")
    queries = spark.createDataFrame([("q", "cat")], "query_id string, text string")
    out = bm25_search(corpus, queries)
    assert out.count() == 0
    assert out.columns == ["query_id", "doc_id", "score", "rank"]


def test_bm25_top_k_validation(spark):
    queries = spark.createDataFrame([("q", "cat")], "query_id string, text string")
    with pytest.raises(ValueError, match="top_k"):
        bm25_search(_corpus(spark), queries, top_k=0)


def test_bm25_search_leaves_no_pinned_blocks(spark):
    """r3 regression: the hits cache must stay evictable (persist, not
    localCheckpoint) — repeated searches otherwise pin one hit set each
    for the session lifetime. persist() registers blocks while the
    returned frame is alive; after the result is consumed the frame can
    be freed without losing correctness (lineage intact)."""
    from great_expectations_spark.pipeline._lineage import _persistent_ids

    corpus = spark.createDataFrame(
        [(i, f"alpha beta w{i % 5}") for i in range(40)],
        "doc_id long, text string")
    qs = spark.createDataFrame([(1, "alpha w3")], "query_id long, text string")
    sc = spark.sparkContext
    before = _persistent_ids(sc)
    out = bm25_search(corpus, qs, top_k=3)
    assert out.count() >= 1
    # whatever the call registered must be UNPINNED storage: every new id
    # must belong to an RDD whose lineage survives unpersist — prove it by
    # freeing them all and re-running the action
    new = _persistent_ids(sc) - before
    for rid in new:
        jrdd = sc._jsc.getPersistentRDDs().get(rid)
        if jrdd is not None:
            jrdd.unpersist(False)
    assert out.count() >= 1  # recomputable => it was a persist, not a pin
