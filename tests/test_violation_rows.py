"""Violation rows persisted per chunk in the checkpoint results table.

North rule: the results table carries per-partition pass/fail PLUS
unexpected-value violation rows. Chunks validated at BASIC and up serialize
their partial_unexpected_list into ``unexpected_json``;
``CheckpointResult.violation_samples`` explodes them back out, capped per
expectation with a window partitioned BY expectation.
"""

import math

import pytest
from pyspark.sql import functions as F

from great_expectations_spark import ExpectationSuite
from great_expectations_spark.checkpoint import Splitter, run_checkpoint

SUITE = (
    ExpectationSuite("viol")
    .add("expect_column_values_to_be_between", column="v", min_value=10)
    .add("expect_column_mean_to_be_between", column="v", min_value=0)
)


@pytest.fixture(scope="module")
def df(spark):
    # v = id: ids 0..9 violate "v >= 10"; two chunks by parity
    return spark.createDataFrame(
        [(i, float(i), i % 2) for i in range(100)], "id long, v double, g int"
    ).cache()


def _run(df, tmp_path, result_format="SUMMARY", run_id="r1"):
    return run_checkpoint(
        df, SUITE, Splitter.column_value(df, "g"), str(tmp_path / "res"),
        run_id, result_format=result_format)


def test_summary_run_persists_violation_values(df, tmp_path):
    res = _run(df, tmp_path)
    vals = sorted(
        float(r.unexpected_value)
        for r in res.violation_samples().collect()
    )
    assert vals == [float(i) for i in range(10)]


def test_samples_carry_expectation_and_chunk(df, tmp_path):
    res = _run(df, tmp_path)
    rows = res.violation_samples().collect()
    assert {r.expectation_index for r in rows} == {0}  # aggregate row: none
    assert {r.chunk_id for r in rows} == {"g=0", "g=1"}
    assert all(r.expectation_type == "expect_column_values_to_be_between"
               for r in rows)


def test_boolean_only_persists_nothing(df, tmp_path):
    res = _run(df, tmp_path, result_format="BOOLEAN_ONLY")
    assert res.results_df.where(F.col("unexpected_json").isNotNull()).count() == 0
    assert res.violation_samples().count() == 0


def test_cap_is_per_expectation(df, tmp_path):
    res = _run(df, tmp_path)
    assert res.violation_samples(cap=3).count() == 3


def test_pre_upgrade_results_table_still_reads_and_rolls_up(spark, df, tmp_path):
    # simulate a table begun by an older engine: first chunk written without
    # the unexpected_json column, then this engine resumes and appends
    path = str(tmp_path / "res")
    res1 = _run(df.where(F.col("g") == 0), tmp_path)
    old = spark.read.parquet(path).drop("unexpected_json")
    old_path = str(tmp_path / "old")
    old.write.parquet(old_path)
    res2 = run_checkpoint(df, SUITE, Splitter.column_value(df, "g"),
                          old_path, "r1", result_format="SUMMARY")
    assert res2.skipped_chunks == ["g=0"] and res2.completed_chunks == ["g=1"]
    roll = {r.expectation_index: r for r in res2.rollup().collect()}
    assert roll[0].unexpected_count == 10 and not roll[0].success
    assert roll[1].success  # monoid merge across mixed-schema chunks
    # only the new chunk carries samples; the old chunk reads as NULL
    vals = sorted(float(r.unexpected_value)
                  for r in res2.violation_samples().collect())
    assert vals == [1.0, 3.0, 5.0, 7.0, 9.0]


def test_nan_values_fall_back_to_stringified_sample():
    # NaN is not strict JSON: the whole sample stringifies rather than drops
    # (Spark's own comparisons treat NaN as larger-than-any, so it reaches a
    # sample list via not-in-set / regex style conditions, not between)
    from great_expectations_spark.checkpoint import _values_json

    assert _values_json([1.0, math.nan]) == '["1.0", "nan"]'
    assert _values_json([1.0, 2.5]) == "[1.0, 2.5]"
    assert _values_json([]) is None and _values_json(None) is None


def test_concurrent_checkpoint_matches_sequential(spark, df, tmp_path):
    from great_expectations_spark.checkpoint import Splitter as S

    seq = run_checkpoint(df, SUITE, S.mod_integer("id", 4),
                         str(tmp_path / "seq"), "r", result_format="SUMMARY")
    par = run_checkpoint(df, SUITE, S.mod_integer("id", 4),
                         str(tmp_path / "par"), "r", result_format="SUMMARY",
                         max_concurrency=4)
    assert sorted(par.completed_chunks) == sorted(seq.completed_chunks)
    key = ["expectation_index", "chunk_id"]
    a = {tuple(r[k] for k in key): (r.element_count, r.unexpected_count, r.success)
         for r in seq.results_df.collect()}
    b = {tuple(r[k] for k in key): (r.element_count, r.unexpected_count, r.success)
         for r in par.results_df.collect()}
    assert a == b
    sa = {r.expectation_index: (r.success, r.merged_observed_json)
          for r in seq.rollup().collect()}
    sb = {r.expectation_index: (r.success, r.merged_observed_json)
          for r in par.rollup().collect()}
    assert sa == sb


def test_concurrent_checkpoint_resume_skips_done(spark, df, tmp_path):
    from great_expectations_spark.checkpoint import Splitter as S

    full = S.mod_integer("id", 4)
    half = type(full)(full.name, full.chunks[:2])
    path = str(tmp_path / "res")
    run_checkpoint(df, SUITE, half, path, "r", max_concurrency=2)
    res = run_checkpoint(df, SUITE, full, path, "r", max_concurrency=4)
    assert sorted(res.skipped_chunks) == sorted(c for c, _ in full.chunks[:2])
    assert sorted(res.completed_chunks) == sorted(c for c, _ in full.chunks[2:])


def test_streaming_results_table_carries_samples(spark, tmp_path):
    # the shared row builder gives foreachBatch validation the same column
    from great_expectations_spark.checkpoint import RESULTS_SCHEMA, results_rows
    from great_expectations_spark.validator import validate

    d = spark.createDataFrame([(i, float(i)) for i in range(20)], "id long, v double")
    result = validate(d, SUITE, result_format="SUMMARY")
    rows = results_rows(result, "s1", "batch-0", "true", 0.0)
    sdf = spark.createDataFrame(rows, RESULTS_SCHEMA)
    assert sdf.where(F.col("unexpected_json").isNotNull()).count() == 1
