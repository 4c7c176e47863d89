"""Gopher/C4 quality-signal operators (pipeline/quality.py).

Expected values are hand-computed from the documented determinism contract
(ASCII-whitespace words, trimmed non-empty lines, char-fraction formulas).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from great_expectations_spark.pipeline.quality import (
    GOPHER_DEFAULTS,
    c4_clean_lines,
    c4_suite,
    gopher_filter,
    gopher_suite,
    quality_signals,
)

DOC1 = (
    "the cat sat on the mat. the cat sat again.\n"
    "the cat sat on the mat. the cat sat again.\n"
    "- bullet line\n"
    "short..."
)
DOC2 = "aa bb aa bb aa bb aa bb aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp qq rr ss tt uu vv"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, DOC1), (2, DOC2), (3, None), (4, ""), (5, "lorem ipsum dolor { x }")],
        "doc_id int, text string",
    )


@pytest.fixture(scope="module")
def signals(docs):
    rows = quality_signals(docs).collect()
    return {r["doc_id"]: r.asDict() for r in rows}


def test_word_and_line_signals(signals):
    s1 = signals[1]
    assert s1["word_count"] == 24
    assert s1["word_chars"] == 85
    assert s1["mean_word_length"] == pytest.approx(85 / 24)
    assert s1["stop_word_count"] == 6  # 'the' x3 per duplicated line
    assert s1["line_count"] == 4
    assert s1["duplicate_line_fraction"] == pytest.approx(0.25)
    assert s1["bullet_line_fraction"] == pytest.approx(0.25)
    assert s1["ellipsis_line_fraction"] == pytest.approx(0.25)
    # '...' in "short..." counts as one symbol over 24 words
    assert s1["symbol_to_word_ratio"] == pytest.approx(1 / 24)
    # two sentence-lines end in '.', "short..." ends in '.', bullet line doesn't
    assert s1["terminal_punct_line_fraction"] == pytest.approx(3 / 4)


def test_repetition_signals(signals):
    s2 = signals[2]
    # 'aa bb' occurs 5x, 4 chars each: 5*4/60
    assert s2["top_2gram_char_fraction"] == pytest.approx(20 / 60)
    # 5-grams of the alternating prefix repeat; covered = the 10 aa/bb words
    assert s2["dup_5gram_char_fraction"] == pytest.approx(20 / 60)
    s1 = signals[1]
    # the two duplicated full lines cover 66 of 85 word chars
    assert s1["dup_5gram_char_fraction"] == pytest.approx(66 / 85)
    assert s1["duplicate_line_char_fraction"] == pytest.approx(0.8)
    assert s1["duplicate_paragraph_fraction"] == 0.0  # no blank-line paragraphs


def test_null_and_empty_semantics(signals):
    s3, s4 = signals[3], signals[4]
    assert all(
        s3[k] is None
        for k in ("word_count", "mean_word_length", "duplicate_line_fraction",
                  "top_2gram_char_fraction", "has_lorem_ipsum")
    )
    assert s4["word_count"] == 0
    assert s4["stop_word_count"] == 0
    assert s4["mean_word_length"] is None  # 0/0 -> NULL, not NaN
    assert s4["top_2gram_char_fraction"] is None


def test_c4_flags_and_clean_lines(docs, signals):
    s5 = signals[5]
    assert s5["has_lorem_ipsum"] is True
    assert s5["has_curly_brace"] is True
    out = {
        r["doc_id"]: r["clean"]
        for r in docs.select(
            "doc_id", c4_clean_lines(F.col("text")).alias("clean")
        ).collect()
    }
    # doc 1: only the two >=3-word terminal-punct lines survive
    assert out[1] == DOC1.split("\n")[0] + "\n" + DOC1.split("\n")[1]
    assert out[2] == ""  # one line, no terminal punct
    assert out[3] is None
    assert out[4] == ""


def test_gopher_filter_reasons(docs):
    kept, rejected = gopher_filter(docs)
    assert kept.count() == 0  # all five docs violate some Gopher rule
    reasons = {
        r["doc_id"]: set(r["failed_expectations"]) for r in rejected.collect()
    }
    assert reasons[3] == {"expect_column_values_to_not_be_null(text)"}
    assert "expect_column_values_to_be_between(word_count)" in reasons[4]
    assert "expect_column_values_to_be_between(alpha_word_fraction)" in reasons[5]
    # doc 2 repeats 'aa bb': every n-gram rule up to n=8 fires, 9/10 don't
    assert "expect_column_values_to_be_between(dup_8gram_char_fraction)" in reasons[2]
    assert "expect_column_values_to_be_between(dup_9gram_char_fraction)" not in reasons[2]


def test_gopher_filter_passes_clean_doc(spark):
    text = (
        "the quick brown fox jumps over the lazy dog and runs far away today. "
        * 8
    )
    # suffix non-stop-words so no n-gram repeats while stop words stay intact
    uniq = " ".join(
        w if w in ("the", "and") else w + str(i)
        for i, w in enumerate(text.split())
    )
    df = spark.createDataFrame([(1, uniq)], "doc_id int, text string")
    kept, rejected = gopher_filter(df)
    assert rejected.count() == 0 and kept.count() == 1
    # kept RETAINS the annotated signal columns (split_by_suite preserves
    # its input schema) — drop them with .select(corpus cols) when sinking
    assert kept.columns[:2] == ["doc_id", "text"]
    assert "word_count" in kept.columns and "top_2gram_char_fraction" in kept.columns


def test_gopher_suite_overrides():
    s = gopher_suite(min_word_count=None, max_word_count=None,
                     min_stop_word_count=None, include_repetition=False)
    cols = {c.kwargs.get("column") for c in s.expectations}
    assert "word_count" not in cols and "stop_word_count" not in cols
    assert "top_2gram_char_fraction" not in cols
    with pytest.raises(ValueError):
        gopher_suite(bogus_threshold=1)
    # default suite covers every rule family
    full = gopher_suite()
    n_ngram = len(GOPHER_DEFAULTS["max_top_ngram_char_fraction"]) + len(
        GOPHER_DEFAULTS["max_dup_ngram_char_fraction"]
    )
    assert len(full.expectations) == 11 + n_ngram


def test_c4_suite_filters_flags(spark):
    df = spark.createDataFrame(
        [(1, "ok line one.\nok line two.\nok line three."),
         (2, "lorem ipsum is here.\nsecond line.\nthird line."),
         (3, "only one line.")],
        "doc_id int, text string",
    )
    from great_expectations_spark.pipeline.filtering import split_by_suite

    ann = quality_signals(df, include_repetition=False)
    kept, rejected = split_by_suite(ann, c4_suite())
    assert {r["doc_id"] for r in kept.select("doc_id").collect()} == {1}
    reasons = {r["doc_id"]: set(r["failed_expectations"]) for r in rejected.collect()}
    assert "expect_column_values_to_be_in_set(has_lorem_ipsum)" in reasons[2]
    assert "expect_column_values_to_be_between(line_count)" in reasons[3]


def test_custom_stop_words(spark):
    df = spark.createDataFrame([(1, "foo bar foo baz qux")], "doc_id int, text string")
    r = quality_signals(df, stop_words=["foo", "qux"]).collect()[0]
    assert r["stop_word_count"] == 3


def test_line_array_custom_separator(spark):
    from great_expectations_spark.pipeline.quality import line_array

    df = spark.createDataFrame([("a\r\nb\r\nc",)], "text string")
    (r,) = df.select(line_array(F.col("text"), sep="\r\n").alias("l")).collect()
    assert r["l"] == ["a", "b", "c"]


def test_vertical_tab_is_word_separator(spark):
    # explicit ASCII class: \x0b splits words in Spark, Python AND the
    # DuckDB oracle (RE2 \s would not) — cross-engine contract regression
    import duckdb

    from great_expectations_spark.pipeline.quality import quality_signals

    df = spark.createDataFrame([(1, "a\x0bb c")], "doc_id int, text string")
    row = quality_signals(df, include_repetition=False).first()
    assert row["word_count"] == 3
    (n,) = duckdb.sql(
        r"""SELECT len(list_filter(
              regexp_split_to_array('a' || chr(11) || 'b c', '[ \t\n\x0b\f\r]+'),
              w -> w <> ''))"""
    ).fetchone()
    assert n == 3


def test_repetition_kernel_parity_with_reference_impl():
    """The vectorized numpy kernel must produce bit-identical signals to
    the tuple/Counter reference implementation on adversarial texts."""
    import random

    from great_expectations_spark.pipeline.quality import (
        _repetition_one,
        _repetition_one_py,
    )

    rnd = random.Random(11)
    vocab = ["aa", "bbb", "c", "dddd", "ee", "ff gg".split()[0]]
    cases = [
        None, "", " ", "one", "x " * 11, "a b c d e f g h i j k l",
        ("spam ham " * 7).strip(),
        "line one here\nline one here\nother\n\nline one here",
    ]
    for _ in range(40):
        n_words = rnd.randrange(0, 60)
        words = [rnd.choice(vocab) for _ in range(n_words)]
        # plant a repeated run sometimes
        if n_words > 14 and rnd.random() < 0.5:
            run = words[:7]
            words[7:14] = run
        text = " ".join(words)
        if rnd.random() < 0.3:
            text = text.replace(" ", "\n", 3)
        cases.append(text)
    for text in cases:
        assert _repetition_one(text) == _repetition_one_py(text), repr(text)


def test_compression_ratio_orders_redundancy(spark):
    from great_expectations_spark.pipeline.quality import compression_ratio

    import random
    rnd = random.Random(3)
    gibberish = "".join(chr(rnd.randrange(0x21, 0x7f)) for _ in range(2000))
    df = spark.createDataFrame(
        [(1, "the word " * 250),              # highly templated
         (2, "The quick brown fox jumps over the lazy dog. " * 5
             + "Pack my box with five dozen liquor jugs. " * 5),
         (3, gibberish),                      # near-incompressible
         (4, None),
         (5, "")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["compression_ratio"]
           for r in compression_ratio(df).collect()}
    assert got[4] is None and got[5] is None
    # repetition compresses hardest, prose in between, gibberish worst
    assert got[1] < got[2] < got[3]
    for v in (got[1], got[2], got[3]):
        assert 0.0 < v < 1.2  # tiny inputs can exceed 1.0 only via headers
    # exact agreement with driver-side zlib on the same bytes
    import zlib
    raw = ("the word " * 250).encode()
    assert got[1] == len(zlib.compress(raw, 6)) / len(raw)


def test_compression_ratio_level_and_validation(spark):
    from great_expectations_spark.pipeline.quality import compression_ratio

    df = spark.createDataFrame([(1, "abc " * 100)], "doc_id long, text string")
    r9 = compression_ratio(df, level=9).collect()[0]["compression_ratio"]
    r1 = compression_ratio(df, level=1).collect()[0]["compression_ratio"]
    assert r9 <= r1
    with pytest.raises(ValueError, match="level"):
        compression_ratio(df, level=10)
