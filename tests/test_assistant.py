"""Onboarding assistant: calibrated suite generation (assistant.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from great_expectations_spark.assistant import chunk_metrics, onboarding_suite
from great_expectations_spark.validator import validate

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_suite_passes_on_profiled_data(spark, docs):
    suite = onboarding_suite(docs)
    res = validate(docs, suite, result_format="BOOLEAN_ONLY")
    failed = [r.expectation_config.expectation_type for r in res.results if not r.success]
    assert res.success, failed


def test_suite_passes_on_same_distribution_holdout(spark, docs):
    # disjoint 30% holdout: row count and id extremes legitimately differ
    # (same caveat as the reference assistant), so calibrate on the
    # distribution-stable columns with a wider margin and no row-count
    from great_expectations_spark.pipeline.sampling import train_holdout_split

    train, holdout = train_holdout_split(docs, "doc_id", holdout_fraction=0.3)
    suite = onboarding_suite(
        train, columns=["n_chars", "lang", "text"], margin=0.25,
        include_row_count=False,
    )
    res = validate(holdout, suite, result_format="BOOLEAN_ONLY")
    failed = [r.expectation_config.expectation_type for r in res.results if not r.success]
    assert res.success, failed


def test_suite_fails_on_drifted_data(spark, docs):
    suite = onboarding_suite(docs, columns=["n_chars", "lang"])
    # shift the numeric column far outside the envelope; inject an unseen
    # category
    drifted = docs.withColumn("n_chars", F.col("n_chars") + F.lit(10**6)) \
                  .withColumn("lang", F.lit("??"))
    res = validate(drifted, suite, result_format="BOOLEAN_ONLY")
    assert not res.success
    failed = {r.expectation_config.expectation_type for r in res.results if not r.success}
    assert "expect_column_mean_to_be_between" in failed


def test_suite_fails_on_null_surge(spark, docs):
    suite = onboarding_suite(docs, columns=["text"])
    surged = docs.withColumn(
        "text", F.when(F.pmod(F.col("doc_id"), 2) == 0, None).otherwise(F.col("text")))
    res = validate(surged, suite, result_format="BOOLEAN_ONLY")
    assert not res.success


def test_high_cardinality_column_gets_no_in_set(spark, docs):
    suite = onboarding_suite(docs, columns=["text", "lang"], set_cardinality_cap=5)
    types_by_col = {}
    for e in suite.expectations:
        types_by_col.setdefault(e.kwargs.get("column"), set()).add(e.expectation_type)
    assert "expect_column_values_to_be_in_set" not in types_by_col.get("text", set())
    # lang is low-cardinality -> in_set present with the observed values
    assert "expect_column_values_to_be_in_set" in types_by_col.get("lang", set())


def test_chunk_metrics_shape_and_determinism(spark, docs):
    m1 = chunk_metrics(docs, ["n_chars", "lang"], n_chunks=4)
    assert {r["chunk"] for r in m1.collect()} <= {0, 1, 2, 3}
    a = sorted(tuple(r) for r in m1.select("chunk", "n_rows", "n_chars__mean").collect())
    b = sorted(
        tuple(r)
        for r in chunk_metrics(docs.repartition(9), ["n_chars", "lang"], n_chunks=4)
        .select("chunk", "n_rows", "n_chars__mean").collect()
    )
    assert a == b


def test_explicit_chunk_column_used_verbatim(spark, docs):
    key = F.pmod(F.col("doc_id"), F.lit(3))
    m = chunk_metrics(docs, ["n_chars"], n_chunks=3, chunk_by=key)
    assert {r["chunk"] for r in m.collect()} == {0, 1, 2}


def test_bad_args(spark, docs):
    with pytest.raises(ValueError):
        chunk_metrics(docs, ["nope"])
    with pytest.raises(ValueError):
        chunk_metrics(docs, ["lang"], n_chunks=1)
    with pytest.raises(ValueError):
        onboarding_suite(docs, margin=1.5)


def test_empty_input(spark):
    df = spark.createDataFrame([], "a long, b string")
    suite = onboarding_suite(df)
    kinds = {e.expectation_type for e in suite.expectations}
    assert kinds == {"expect_table_row_count_to_be_between"}


def test_suite_passes_on_chunk_correlated_column(spark):
    """A low-cardinality numeric column content-hashes into value-pure
    chunks (per-chunk std 0) while the whole-table std is large — the
    between-chunk variance term. The stdev envelope must still contain
    the whole-table value (Chan merge), or the suite fails the very data
    it profiled."""
    df = spark.createDataFrame(
        [(float(0.0),)] * 50 + [(float(1000.0),)] * 50, "flag double")
    suite = onboarding_suite(df, columns=["flag"])
    res = validate(df, suite, result_format="BOOLEAN_ONLY")
    failed = [r.expectation_config.expectation_type for r in res.results if not r.success]
    assert res.success, failed


# ---- numeric-range estimators (reference parity) ---------------------------


def test_quantile_linear_matches_numpy():
    import numpy as np

    from great_expectations_spark.assistant import _quantile_linear

    vals = [3.0, 1.0, 4.0, 1.5, 9.0, 2.6, 5.3]
    s = sorted(vals)
    for q in (0.0, 0.025, 0.05, 0.25, 0.5, 0.75, 0.975, 1.0):
        assert _quantile_linear(s, q) == pytest.approx(
            float(np.quantile(np.array(vals), q, method="linear")), abs=1e-12)


def test_estimate_range_modes():
    from great_expectations_spark.assistant import estimate_range

    vals = [10.0, 12.0, 11.0, 13.0, 10.5, 12.5, 11.5, 12.2]
    ex = estimate_range(vals, "exact")
    assert ex == (10.0, 13.0)
    qlo, qhi = estimate_range(vals, "quantiles", false_positive_rate=0.1)
    assert 10.0 <= qlo <= qhi <= 13.0
    blo, bhi = estimate_range(vals, "bootstrap", false_positive_rate=0.1)
    # deterministic: same seed -> same bounds
    assert (blo, bhi) == estimate_range(vals, "bootstrap", false_positive_rate=0.1)
    assert 10.0 - 1e-9 <= blo <= bhi <= 13.0 + 1e-9
    with pytest.raises(ValueError):
        estimate_range(vals, "kde")
    with pytest.raises(ValueError):
        estimate_range([None, None], "exact")


def test_bootstrap_bias_correction_branches():
    from great_expectations_spark.assistant import bootstrap_range

    # constant values: se == 0 -> corrected branch -> exactly the sample
    # quantile (the constant)
    lo, hi = bootstrap_range([5.0] * 6, false_positive_rate=0.1)
    assert lo == pytest.approx(5.0) and hi == pytest.approx(5.0)


def test_bootstrap_tighter_than_envelope(spark, docs):
    """VERDICT r2 #3 'done' criterion: at equal false-alarm behavior on a
    same-distribution holdout, the bootstrap estimator's numeric bounds
    are tighter than the relative-margin envelope's."""
    from great_expectations_spark.assistant import onboarding_suite
    from great_expectations_spark.pipeline.sampling import train_holdout_split
    from great_expectations_spark.validator import validate

    train, holdout = train_holdout_split(docs, "doc_id", holdout_fraction=0.3)
    kw = dict(columns=["n_chars"], include_row_count=False)
    env_suite = onboarding_suite(train, margin=0.25, **kw)
    boot_suite = onboarding_suite(
        train, estimator="bootstrap", false_positive_rate=0.1, **kw)

    def width(suite, etype):
        for e in suite.expectations:
            if e.expectation_type == etype:
                return e.kwargs["max_value"] - e.kwargs["min_value"]
        raise AssertionError(f"{etype} not in suite")

    for etype in ("expect_column_mean_to_be_between",):
        assert width(boot_suite, etype) < width(env_suite, etype)

    # no false alarm on the holdout for the numeric-stat expectations
    # (the reference contract at the chosen fpr); min/max point stats on a
    # 30% subsample legitimately move, so check the distribution-stable
    # mean/std bounds
    res = validate(holdout, boot_suite, result_format="BOOLEAN_ONLY")
    by_type = {r.expectation_config.expectation_type: r.success for r in res.results}
    assert by_type["expect_column_mean_to_be_between"], boot_suite.expectations
    assert by_type["expect_column_stdev_to_be_between"], boot_suite.expectations


def test_estimator_suite_passes_on_profiled_data(spark, docs):
    for est in ("exact", "quantiles"):
        suite = onboarding_suite(
            docs, columns=["n_chars"], estimator=est, include_row_count=False)
        res = validate(docs, suite, result_format="BOOLEAN_ONLY")
        # exact bounds contain the observed stats by construction;
        # quantiles at default fpr clip the chunk extremes, so only the
        # within-bounds stats are guaranteed — check mean specifically
        by_type = {r.expectation_config.expectation_type: r.success
                   for r in res.results}
        assert by_type["expect_column_mean_to_be_between"], est
