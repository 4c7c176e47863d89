"""Document chunking (pipeline/chunking.py)."""

import pytest

from great_expectations_spark.pipeline.chunking import (
    chunk_documents,
    reassemble_chunks,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _by_doc(chunks):
    out = {}
    for r in chunks.collect():
        out.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["start_token"], r["n_tokens"],
             r["chunk_text"]))
    return {k: sorted(v) for k, v in out.items()}


def test_hand_computed_windows_with_overlap(spark):
    text = " ".join(f"t{i}" for i in range(10))
    got = _by_doc(chunk_documents(
        _docs(spark, [(1, text)]), "doc_id", "text", window=4, overlap=1))
    # stride 3: starts 0, 3, 6; chunk at 9 would add nothing (6+4 >= 10)
    assert got[1] == [
        (0, 0, 4, "t0 t1 t2 t3"),
        (1, 3, 4, "t3 t4 t5 t6"),
        (2, 6, 4, "t6 t7 t8 t9"),
    ]


def test_short_doc_single_chunk(spark):
    got = _by_doc(chunk_documents(
        _docs(spark, [(1, "a b"), (2, "x")]), "doc_id", "text", window=5))
    assert got == {1: [(0, 0, 2, "a b")], 2: [(0, 0, 1, "x")]}


def test_exact_multiple_no_empty_tail(spark):
    text = " ".join(f"t{i}" for i in range(8))
    got = _by_doc(chunk_documents(
        _docs(spark, [(1, text)]), "doc_id", "text", window=4, overlap=0))
    assert [c[0] for c in got[1]] == [0, 1]
    assert all(c[2] == 4 for c in got[1])


def test_ragged_tail_shorter(spark):
    text = " ".join(f"t{i}" for i in range(9))
    got = _by_doc(chunk_documents(
        _docs(spark, [(1, text)]), "doc_id", "text", window=4, overlap=0))
    assert got[1][-1] == (2, 8, 1, "t8")


def test_null_and_whitespace_dropped(spark):
    rows = [(1, "a b c"), (2, None), (None, "x y"), (3, "   ")]
    got = _by_doc(chunk_documents(
        _docs(spark, rows), "doc_id", "text", window=2))
    assert set(got) == {1}


def test_min_tokens_filter(spark):
    rows = [(1, "a b c d"), (2, "a b")]
    got = _by_doc(chunk_documents(
        _docs(spark, rows), "doc_id", "text", window=8, min_tokens=3))
    assert set(got) == {1}


def test_multispace_tokenization(spark):
    got = _by_doc(chunk_documents(
        _docs(spark, [(1, "a   b  c")]), "doc_id", "text", window=2))
    assert got[1] == [(0, 0, 2, "a b"), (1, 2, 1, "c")]


def test_roundtrip_no_overlap(spark):
    rows = [(i, " ".join(f"w{i}_{j}" for j in range(1 + (i * 7) % 23)))
            for i in range(1, 30)]
    chunks = chunk_documents(_docs(spark, rows), "doc_id", "text",
                             window=5, overlap=0)
    back = {r["doc_id"]: r["text"]
            for r in reassemble_chunks(chunks, "doc_id").collect()}
    assert back == dict(rows)


def test_roundtrip_with_overlap(spark):
    rows = [(i, " ".join(f"w{j}" for j in range(1 + (i * 11) % 37)))
            for i in range(1, 30)]
    chunks = chunk_documents(_docs(spark, rows), "doc_id", "text",
                             window=6, overlap=2)
    back = {r["doc_id"]: r["text"]
            for r in reassemble_chunks(chunks, "doc_id",
                                       overlap=2).collect()}
    assert back == dict(rows)


def test_overlapping_chunks_share_tokens(spark):
    text = " ".join(f"t{i}" for i in range(12))
    got = _by_doc(chunk_documents(
        _docs(spark, [(1, text)]), "doc_id", "text", window=6, overlap=3))
    for (_, s1, _, t1), (_, s2, _, t2) in zip(got[1], got[1][1:]):
        assert s2 - s1 == 3
        assert t1.split()[3:] == t2.split()[:3]


def test_arg_validation(spark):
    d = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError, match="window"):
        chunk_documents(d, "doc_id", "text", window=0)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(d, "doc_id", "text", window=4, overlap=4)
    with pytest.raises(ValueError, match="min_tokens"):
        chunk_documents(d, "doc_id", "text", min_tokens=0)
    with pytest.raises(ValueError, match="overlap"):
        reassemble_chunks(d, "doc_id", overlap=-1)
