"""Corpus-wide paragraph dedup (pipeline/paragraph.py)."""

from __future__ import annotations

import pytest

from great_expectations_spark.pipeline.paragraph import (
    paragraph_dedup,
    paragraph_dedup_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # doc 1: owns the first occurrence of the shared boilerplate
        (1, "unique alpha\nSHARED BOILERPLATE\nunique beta"),
        # doc 2: loses the boilerplate, keeps its own lines
        (2, "unique gamma\nSHARED BOILERPLATE\nunique delta"),
        # doc 3: internally duplicated paragraph — second copy removed too
        (3, "repeat me\nrepeat me\ntail"),
        # doc 4: entirely boilerplate -> becomes empty
        (4, "SHARED BOILERPLATE"),
        # doc 5: NULL text passes through
        (5, None),
        # doc 6: blank lines (empty segments) are exempt at min_chars=1
        (6, "one\n\ntwo\n"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _texts(df):
    return {r["doc_id"]: r["text"] for r in df.collect()}


def test_keep_first_and_reassembly(docs):
    out = _texts(paragraph_dedup(docs))
    assert out[1] == "unique alpha\nSHARED BOILERPLATE\nunique beta"
    assert out[2] == "unique gamma\nunique delta"
    assert out[3] == "repeat me\ntail"
    assert out[4] == ""
    assert out[5] is None
    # blank segments survive byte-identically (incl. trailing one)
    assert out[6] == "one\n\ntwo\n"


def test_removed_count_column(docs):
    out = {
        r["doc_id"]: r["n_removed"]
        for r in paragraph_dedup(docs, removed_count_col="n_removed").collect()
    }
    assert out == {1: 0, 2: 1, 3: 1, 4: 1, 5: None, 6: 0}


def test_unaffected_docs_roundtrip_byte_identical(spark):
    # exotic whitespace / separators inside paragraphs survive exactly
    df = spark.createDataFrame(
        [(1, "a  b\t c\nsecond  para \n\nlast")], "doc_id long, text string"
    )
    assert _texts(paragraph_dedup(df))[1] == "a  b\t c\nsecond  para \n\nlast"


def test_partitioning_independence(docs):
    one = _texts(paragraph_dedup(docs.coalesce(1)))
    many = _texts(paragraph_dedup(docs.repartition(7)))
    assert one == many


def test_min_chars_exemption(spark):
    df = spark.createDataFrame(
        [(1, "aa\nlong paragraph"), (2, "aa\nlong paragraph")],
        "doc_id long, text string",
    )
    out = _texts(paragraph_dedup(df, min_chars=3))
    assert out[1] == "aa\nlong paragraph"
    assert out[2] == "aa"  # short 'aa' exempt everywhere, long line deduped


def test_custom_separator_literal_not_regex(spark):
    # '|' would be a match-everything alternation if the separator weren't
    # \Q-quoted into a literal
    df = spark.createDataFrame(
        [(1, "x|y|x"), (2, "y|z")], "doc_id long, text string"
    )
    out = _texts(paragraph_dedup(df, sep="|"))
    assert out[1] == "x|y"  # second 'x' is a corpus duplicate of (1,0)
    assert out[2] == "z"


def test_stats(docs):
    row = paragraph_dedup_stats(docs).collect()[0]
    assert row["n_docs"] == 5  # doc 5 has NULL text
    # segments: doc1:3 doc2:3 doc3:3 doc4:1 doc6:4 = 14
    assert row["n_paragraphs"] == 14
    assert row["n_exempt_short"] == 2  # the two empty segments in doc 6
    # dedupable = 12; distinct: ua, SB, ub, ug, ud, repeat me, tail, one, two = 9
    assert row["n_distinct"] == 9
    assert row["dup_paragraphs"] == 3  # 2 extra SB + 1 extra 'repeat me'


def test_empty_input(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    assert paragraph_dedup(df).count() == 0
    row = paragraph_dedup_stats(df).collect()[0]
    assert (
        row["n_paragraphs"] == 0
        and row["n_distinct"] == 0
        and row["dup_paragraphs"] == 0
    )


def test_bad_args(docs):
    with pytest.raises(ValueError):
        paragraph_dedup(docs, sep="")
    with pytest.raises(ValueError):
        paragraph_dedup(docs, min_chars=-1)


# ------------------------------------------------------------ within-doc


def test_within_doc_keeps_cross_doc_duplicates(spark):
    from great_expectations_spark.pipeline.paragraph import paragraph_dedup_within_doc

    df = spark.createDataFrame(
        [
            (1, "nav\nbody one\nnav\nfooter"),
            (2, "nav\nbody two\nnav\nnav"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"] for r in
           paragraph_dedup_within_doc(df, removed_count_col="nr").collect()}
    nr = {r["doc_id"]: r["nr"] for r in
          paragraph_dedup_within_doc(df, removed_count_col="nr").collect()}
    # each doc keeps its OWN first 'nav'; cross-doc copies untouched
    assert out[1] == "nav\nbody one\nfooter"
    assert out[2] == "nav\nbody two"
    assert out[3] is None
    assert nr == {1: 1, 2: 2, 3: None}


def test_within_doc_partitioning_independent(spark):
    from great_expectations_spark.pipeline.paragraph import paragraph_dedup_within_doc

    df = spark.createDataFrame(
        [(i, "a\nb\na\nc\nb") for i in range(20)], "doc_id long, text string"
    )
    one = sorted(tuple(r) for r in paragraph_dedup_within_doc(df.coalesce(1)).collect())
    many = sorted(tuple(r) for r in paragraph_dedup_within_doc(df.repartition(7)).collect())
    assert one == many
    assert one[0][1] == "a\nb\nc"


def test_null_id_rows_pass_through(spark):
    from great_expectations_spark.pipeline.paragraph import (
        paragraph_dedup,
        paragraph_dedup_within_doc,
    )

    df = spark.createDataFrame(
        [(None, "dup\ndup"), (None, "dup\ndup"), (1, "dup\nkeep")],
        "doc_id long, text string",
    )
    for fn in (paragraph_dedup, paragraph_dedup_within_doc):
        rows = fn(df).collect()
        null_texts = sorted(r["text"] for r in rows if r["doc_id"] is None)
        # both null-id docs keep their full text, never merged or deduped
        assert null_texts == ["dup\ndup", "dup\ndup"]
