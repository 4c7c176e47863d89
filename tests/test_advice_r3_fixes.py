"""Regression tests for the round-3 ADVICE findings: read_jsonl
corrupt-column opt-out, run_recipe bounded plan growth past the
loser-stage threshold, bm25_search_index cache release paths, and BPE
max_pieces validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _persistent_rdd_ids(spark):
    sc = spark.sparkContext
    return {int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()}


def _wait_gone(spark, ids, tries=50):
    """Non-blocking unpersists deregister asynchronously — poll instead
    of asserting instantly (ContextCleaner races otherwise)."""
    import time

    for _ in range(tries):
        if not (_persistent_rdd_ids(spark) & ids):
            return True
        time.sleep(0.1)
    return False


def test_read_jsonl_corrupt_record_opt_out(spark, tmp_path):
    """corrupt_record=False keeps the caller's schema verbatim (no
    appended capture column) even in PERMISSIVE mode."""
    from great_expectations_spark.sources.readers import read_jsonl

    p = tmp_path / "docs.jsonl"
    p.write_text('{"id": "a", "n": 1}\nnot json at all\n{"id": "b", "n": 2}\n')

    strict = read_jsonl(spark, str(p), schema="id string, n int",
                        corrupt_record=False)
    assert strict.columns == ["id", "n"]

    default = read_jsonl(spark, str(p), schema="id string, n int")
    assert default.columns == ["id", "n", "_corrupt_record"]
    # Spark refuses queries referencing ONLY the corrupt column — collect
    rows = default.collect()
    assert sum(r["_corrupt_record"] is not None for r in rows) == 1


def test_recipe_plan_cut_bounds_growth_and_matches(spark):
    """Past plan_cut_after, loser stages switch to lineage cuts: results
    identical to the persist path, earlier cuts freed, final cut pinned
    until release()."""
    from great_expectations_spark.pipeline.recipes import (
        exact_dedup_stage,
        run_recipe,
    )

    rows = [(i, "dup" if i % 7 == 0 else f"text-{i}") for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    # 3 loser stages; only the first can reject (later ones see survivors
    # already deduped) — but each still forces a prefix materialization
    stages = [
        exact_dedup_stage("dedup_a", "doc_id", "text"),
        exact_dedup_stage("dedup_b", "doc_id", "text"),
        exact_dedup_stage("dedup_c", "doc_id", "text"),
    ]
    baseline = run_recipe(df, stages, "doc_id")  # persist path (threshold 8)
    expected = {r["doc_id"] for r in baseline.clean.select("doc_id").collect()}
    assert baseline.pinned_rdd_ids == set()

    before = _persistent_rdd_ids(spark)
    cut = run_recipe(df, stages, "doc_id", plan_cut_after=0)
    got = {r["doc_id"] for r in cut.clean.select("doc_id").collect()}
    assert got == expected
    stats = {r["stage"]: r["n"] for r in cut.stats().collect()}
    assert stats == {r["stage"]: r["n"] for r in baseline.stats().collect()}
    # exactly ONE cut of this run stays pinned (the last), not one per
    # stage — earlier cuts were non-blocking-unpersisted, so poll
    assert cut.pinned_rdd_ids
    assert _wait_gone(
        spark, (_persistent_rdd_ids(spark) - before) - cut.pinned_rdd_ids)
    leftover = _persistent_rdd_ids(spark) - before
    assert leftover <= cut.pinned_rdd_ids
    cut.release()
    assert cut.pinned_rdd_ids == set()
    assert _wait_gone(spark, leftover)


def test_bm25_scoped_release_and_lazy_path(spark):
    """materialize=True inside scoped_fused_caches leaves no registered
    cache after the sweep; materialize=False returns a lazy plan with
    identical rows."""
    from great_expectations_spark.pipeline._lineage import scoped_fused_caches
    from great_expectations_spark.pipeline.retrieval import (
        bm25_index,
        bm25_search_index,
    )

    corpus = spark.createDataFrame(
        [(i, f"spark data quality engine doc {i} " + ("spark " * (i % 3)))
         for i in range(30)],
        "doc_id int, text string")
    queries = spark.createDataFrame(
        [(1, "spark engine"), (2, "quality")], "query_id int, text string")
    postings = bm25_index(corpus, "doc_id", "text")

    before = _persistent_rdd_ids(spark)
    with scoped_fused_caches() as frames:
        eager = bm25_search_index(postings, queries, top_k=5)
        eager_rows = {tuple(r) for r in eager.collect()}
    for f in frames:
        f.unpersist(True)
    assert _wait_gone(spark, _persistent_rdd_ids(spark) - before)

    with scoped_fused_caches() as frames:
        lazy = bm25_search_index(postings, queries, top_k=5,
                                 materialize=False)
        lazy_rows = {tuple(r) for r in lazy.collect()}
    assert lazy_rows == eager_rows
    assert frames  # the hit cache is scope-registered on the lazy path
    for f in frames:
        f.unpersist(True)
    assert _wait_gone(spark, _persistent_rdd_ids(spark) - before)


@pytest.mark.parametrize("bad", [0, -3])
def test_bpe_max_pieces_validated(spark, bad):
    from great_expectations_spark.pipeline.bpe import piece_counts

    df = spark.createDataFrame([(1, "a b c")], "id int, text string")
    with pytest.raises(ValueError, match="max_pieces"):
        piece_counts(df, "id", "text", max_pieces=bad)
