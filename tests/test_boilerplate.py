"""Domain boilerplate line removal (pipeline/boilerplate.py)."""

import pytest

from great_expectations_spark.pipeline.boilerplate import (
    domain_boilerplate_lines,
    domain_boilerplate_removal,
)

SCHEMA = "doc_id long, domain string, text string"


@pytest.fixture(scope="module")
def pages(spark):
    rows = [
        # a.com: NAV in 3/4 docs (frac .75 -> removed), PROMO in 1/4
        # (frac .25 -> kept), bodies unique
        (1, "a.com", "NAV\nbody one\nPROMO"),
        (2, "a.com", "NAV\nbody two"),
        (3, "a.com", "NAV\nbody three"),
        (4, "a.com", "body four"),
        # b.com: same NAV text but only 1/2 docs -> kept there; FOOT in
        # 2/2 -> removed
        (5, "b.com", "NAV\nbody five\nFOOT"),
        (6, "b.com", "body six\nFOOT"),
        # passthrough rows
        (7, None, "NAV\nno domain"),
        (8, "a.com", None),
        (None, "a.com", "NAV\nno id"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_detected_lines(spark, pages):
    got = {(r["domain"], r["line"]): (r["n_docs"], r["domain_docs"])
           for r in domain_boilerplate_lines(pages).collect()}
    assert got == {("a.com", "NAV"): (3, 4), ("b.com", "FOOT"): (2, 2)}


def test_removal_and_passthrough(spark, pages):
    got = {r["doc_id"]: (r["domain"], r["text"], r["n_rm"])
           for r in domain_boilerplate_removal(
               pages, removed_count_col="n_rm").collect()
           if r["doc_id"] is not None}
    assert got[1] == ("a.com", "body one\nPROMO", 1)
    assert got[2] == ("a.com", "body two", 1)
    assert got[3] == ("a.com", "body three", 1)
    assert got[4] == ("a.com", "body four", 0)   # untouched: byte-identical
    assert got[5] == ("b.com", "NAV\nbody five", 1)   # NAV rare on b.com
    assert got[6] == ("b.com", "body six", 1)
    assert got[7] == (None, "NAV\nno domain", None)
    assert got[8] == ("a.com", None, None)
    none_rows = [r for r in domain_boilerplate_removal(
        pages, removed_count_col="n_rm").collect() if r["doc_id"] is None]
    assert len(none_rows) == 1 and none_rows[0]["text"] == "NAV\nno id"


def test_every_occurrence_removed_not_first_kept(spark):
    rows = [(1, "x", "AD\nbody\nAD"), (2, "x", "AD\nother")]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r["doc_id"]: r["text"]
           for r in domain_boilerplate_removal(df).collect()}
    assert got == {1: "body", 2: "other"}


def test_within_doc_repeats_count_one_doc(spark):
    # AD repeats 3x in one doc but appears in only 1/3 docs -> kept
    rows = [(1, "x", "AD\nAD\nAD"), (2, "x", "b"), (3, "x", "c")]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r["doc_id"]: r["text"]
           for r in domain_boilerplate_removal(df).collect()}
    assert got[1] == "AD\nAD\nAD"


def test_empty_lines_exempt(spark):
    rows = [(1, "x", "a\n\nb"), (2, "x", "c\n\nd")]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r["doc_id"]: r["text"]
           for r in domain_boilerplate_removal(df).collect()}
    assert got == {1: "a\n\nb", 2: "c\n\nd"}  # blank lines survive


def test_min_doc_frac_threshold_inclusive(spark):
    rows = [(1, "x", "BP\na"), (2, "x", "BP\nb"), (3, "x", "c"),
            (4, "x", "d")]
    df = spark.createDataFrame(rows, SCHEMA)
    # 2/4 = exactly 0.5 -> removed at default frac
    got = {r["doc_id"]: r["text"]
           for r in domain_boilerplate_removal(df).collect()}
    assert got[1] == "a" and got[2] == "b"
    # but kept at frac 0.6
    got2 = {r["doc_id"]: r["text"]
            for r in domain_boilerplate_removal(
                df, min_doc_frac=0.6).collect()}
    assert got2[1] == "BP\na"


def test_domains_do_not_leak(spark):
    # frequent on a.com, single hit on b.com: only a.com's occurrences go
    rows = [(1, "a.com", "X\np"), (2, "a.com", "X\nq"),
            (3, "b.com", "X\nr"), (4, "b.com", "s")]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r["doc_id"]: r["text"]
           for r in domain_boilerplate_removal(df).collect()}
    assert got == {1: "p", 2: "q", 3: "X\nr", 4: "s"}


def test_partitioning_invariance(spark):
    rows = [(i, f"d{i % 3}",
             "\n".join(["HDR"] + [f"line {i} {j}" for j in range(i % 4)]))
            for i in range(1, 40)]
    df = spark.createDataFrame(rows, SCHEMA)
    a = sorted((r["doc_id"], r["text"]) for r in
               domain_boilerplate_removal(df.repartition(7)).collect())
    b = sorted((r["doc_id"], r["text"]) for r in
               domain_boilerplate_removal(df.repartition(2)).collect())
    assert a == b


def test_arg_validation(spark, pages):
    with pytest.raises(ValueError, match="min_doc_frac"):
        domain_boilerplate_lines(pages, min_doc_frac=0.0)
    with pytest.raises(ValueError, match="min_docs"):
        domain_boilerplate_lines(pages, min_docs=1)
    with pytest.raises(ValueError, match="min_chars"):
        domain_boilerplate_lines(pages, min_chars=0)
    with pytest.raises(ValueError, match="sep"):
        domain_boilerplate_removal(pages, sep="")
