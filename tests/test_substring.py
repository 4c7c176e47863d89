"""ExactSubstr-style duplicated-span detection/removal
(pipeline/substring.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from great_expectations_spark.pipeline.substring import (
    dedup_substrings,
    duplicate_window_occurrences,
    duplicate_window_stats,
)

SPAN = "the quick brown fox jumps over the lazy dog today"  # 10 tokens


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, SPAN),
        (2, f"intro text then {SPAN} and more"),
        (3, "unrelated content with no repeats at all whatsoever"),
        (4, None),
        (None, SPAN),
        (5, "tiny doc"),
        (6, "same doc repeat same doc repeat same doc repeat xx"),
        (7, f"leading  spaces {SPAN}"),  # double space survives
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stats_counts_planted_duplicates(spark, docs):
    stats = duplicate_window_stats(docs, "doc_id", "text", window=10).collect()
    # the 10-token SPAN appears in docs 1, 2, 7 (null-id doc excluded)
    span_rows = [r for r in stats if r["n_docs"] == 3]
    assert len(span_rows) == 1 and span_rows[0]["n_occ"] == 3


def test_keeper_is_corpus_min_id_then_offset(spark, docs):
    occ = duplicate_window_occurrences(
        docs, "doc_id", "text", window=10).collect()
    keepers = [(r["id"], r["idx"]) for r in occ if r["is_keeper"]]
    others = [(r["id"], r["idx"]) for r in occ if not r["is_keeper"]]
    # the only duplicated 10-token window is SPAN itself: docs 1, 2, 7
    # (the NULL-id copy is excluded); keeper = corpus-min (id, idx)
    assert keepers == [(1, 0)]
    assert sorted(others) == [(2, 3), (7, 3)]


def test_removal_keeps_first_occurrence_only(spark, docs):
    out = {r["doc_id"]: r for r in
           dedup_substrings(docs, "doc_id", "text", window=10).collect()}
    assert out[1]["text"] == SPAN and out[1]["n_removed_tokens"] == 0
    assert out[2]["text"] == "intro text then and more"
    assert out[2]["n_removed_tokens"] == 10
    assert out[7]["text"] == "leading  spaces"       # double space intact
    assert out[7]["n_removed_tokens"] == 10
    assert out[3]["text"].startswith("unrelated")
    assert out[3]["n_removed_tokens"] == 0


def test_within_doc_repetition_collapses(spark, docs):
    out = {r["doc_id"]: r for r in
           dedup_substrings(docs, "doc_id", "text", window=3).collect()}
    assert out[6]["text"] == "same doc repeat xx"
    assert out[6]["n_removed_tokens"] == 6


def test_null_and_short_rows_pass_through(spark, docs):
    out = {r["doc_id"]: r for r in
           dedup_substrings(docs, "doc_id", "text", window=10).collect()}
    assert out[4]["text"] is None and out[4]["n_removed_tokens"] == 0
    assert out[None]["text"] == SPAN and out[None]["n_removed_tokens"] == 0
    assert out[5]["text"] == "tiny doc" and out[5]["n_removed_tokens"] == 0
    assert dedup_substrings(docs, "doc_id", "text", window=10).count() == \
        docs.count()


def test_all_tokens_flagged_leaves_empty_string(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           dedup_substrings(df, "doc_id", "text", window=4).collect()}
    assert out[1]["text"] == "a b c d" and out[1]["n_removed_tokens"] == 0
    assert out[2]["text"] == "" and out[2]["n_removed_tokens"] == 4


def test_partitioning_invariance(spark, docs):
    a = {(r["doc_id"], r["text"], r["n_removed_tokens"]) for r in
         dedup_substrings(docs.repartition(1), "doc_id", "text",
                          window=10).collect()}
    b = {(r["doc_id"], r["text"], r["n_removed_tokens"]) for r in
         dedup_substrings(docs.repartition(8, "doc_id"), "doc_id",
                          "text", window=10).collect()}
    assert a == b


def test_window_too_small_raises(spark, docs):
    with pytest.raises(ValueError, match="window"):
        duplicate_window_stats(docs, "doc_id", "text", window=1).collect()


def test_self_overlapping_run_collapses_aggressively(spark):
    """Documented overlap caveat: flagged offsets of a self-overlapping
    repeat run cover part of the keeper window, so the run collapses
    below `window` tokens (matching the DuckDB oracle)."""
    df = spark.createDataFrame([(1, "a a a a")], "doc_id long, text string")
    out = dedup_substrings(df, "doc_id", "text", window=2).collect()[0]
    assert out["text"] == "a" and out["n_removed_tokens"] == 3


def test_merged_interval_coverage_matches_per_flag(spark):
    """A heavy re-crawl (every window flagged) merges to ONE interval;
    behavior must equal the any-flag-covers definition."""
    span = " ".join(f"t{i}" for i in range(120))
    df = spark.createDataFrame(
        [(1, span), (2, f"prefix {span} suffix")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           dedup_substrings(df, "doc_id", "text", window=8).collect()}
    assert out[1]["text"] == span and out[1]["n_removed_tokens"] == 0
    assert out[2]["text"] == "prefix suffix"
    assert out[2]["n_removed_tokens"] == 120
