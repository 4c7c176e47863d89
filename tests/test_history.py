"""Cross-run metric history + drift flagging (history.py).

The reference stores one JSON result per run (validations_store.py) and has
no engine-side cross-run metric view; here the series and the drift scores
are bounded DataFrame queries over the checkpoint results table.
"""

import pytest
from pyspark.sql import functions as F

from great_expectations_spark import ExpectationSuite
from great_expectations_spark.checkpoint import Splitter, run_checkpoint
from great_expectations_spark.history import flag_drift, metric_series, run_summary

SUITE = (
    ExpectationSuite("hist")
    .add("expect_column_values_to_not_be_null", column="v", mostly=0.5)
    .add("expect_column_mean_to_be_between", column="v", min_value=0, max_value=1000)
    .add("expect_table_row_count_to_be_between", min_value=1)
)


def _run(spark, tmp_path, run_id, values):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "id long, v double"
    ).withColumn("g", (F.col("id") % 2).cast("int"))
    return run_checkpoint(
        df, SUITE, Splitter.column_value(df, "g"), str(tmp_path / "res"), run_id
    )


@pytest.fixture(scope="module")
def results(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("hist")
    # three steady runs around mean 10, then one shifted to 100
    res = None
    for rid, base in (("r1", 10.0), ("r2", 10.5), ("r3", 9.5), ("r4", 100.0)):
        res = _run(spark, tmp, rid, [base + d for d in (-1.0, 0.0, 1.0, None)[:3]] + [None])
    return res.results_df


def test_series_one_row_per_run_and_expectation(results):
    s = metric_series(results)
    assert s.count() == 4 * 3  # 4 runs x 3 expectations
    assert s.where(F.col("metric_name").isNull()).count() == 0


def test_series_map_metric_is_whole_run_percent(results):
    s = metric_series(results).where(
        (F.col("expectation_index") == 0) & (F.col("run_id") == "r1")
    ).head()
    # 4 rows, 1 null => 25% unexpected, mostly=0.5 passes
    assert s.metric_name == "unexpected_percent"
    assert s.value == pytest.approx(25.0)
    assert s.success is True


def test_series_aggregate_metric_is_merged_observed(results):
    rows = {
        r.run_id: r
        for r in metric_series(results).where(F.col("expectation_index") == 1).collect()
    }
    assert rows["r1"].metric_name == "observed_value"
    assert rows["r1"].value == pytest.approx(10.0)  # mean of 9,10,11
    assert rows["r4"].value == pytest.approx(100.0)
    assert all(r.success for r in rows.values())


def test_series_runs_filter(results):
    s = metric_series(results, runs=["r1", "r2"])
    assert {r.run_id for r in s.select("run_id").distinct().collect()} == {"r1", "r2"}


def test_drift_flags_shifted_run_only(results):
    d = flag_drift(metric_series(results), z_threshold=3.0, min_history=3)
    flagged = d.where(F.col("drifted")).collect()
    assert {(r.run_id, r.expectation_index) for r in flagged} == {("r4", 1)}
    r4 = flagged[0]
    assert r4.n_prior == 3 and abs(r4.zscore) > 3


def test_drift_needs_min_history(results):
    d = flag_drift(metric_series(results), z_threshold=0.1, min_history=10)
    assert d.where(F.col("drifted")).count() == 0


def test_drift_constant_history_any_move_flags(spark, tmp_path):
    for rid, base in (("a", 10.0), ("b", 10.0), ("c", 10.0), ("d", 10.0002)):
        res = _run(spark, tmp_path, rid, [base - 1.0, base, base + 1.0, None])
    d = flag_drift(metric_series(res.results_df), min_history=3)
    flagged = {(r.run_id, r.expectation_index) for r in d.where("drifted").collect()}
    # constant trailing history (stddev 0): any numeric move flags, and the
    # row-count metric (constant forever) never does
    assert flagged == {("d", 1)}


def test_drift_ignores_null_values(spark, tmp_path):
    suite = ExpectationSuite("uq").add(
        "expect_column_values_to_be_unique", column="id"
    )
    for rid in ("a", "b", "c", "d"):
        df = spark.createDataFrame([(i,) for i in range(6)], "id long").withColumn(
            "g", (F.col("id") % 2).cast("int")
        )
        res = run_checkpoint(
            df, suite, Splitter.column_value(df, "g"), str(tmp_path / "res"), rid
        )
    s = metric_series(res.results_df)
    assert s.where(F.col("value").isNotNull()).count() == 0  # chunk-relative
    assert s.where(~F.col("success")).count() == 0
    assert flag_drift(s, min_history=1).where("drifted").count() == 0


def test_drift_over_grouped_series(spark):
    # flag_drift over a grouped/streaming-shaped table: each (group,
    # expectation) is its own series across batches
    rows = []
    for b, shift in enumerate([0.0, 0.0, 0.0, 50.0]):
        for g in ("en", "de"):
            rows.append((f"batch-{b}", g, 0, 10.0 + (shift if g == "en" else 0.0)))
    d = spark.createDataFrame(
        rows, "chunk_id string, lang string, expectation_index int, observed_value double")
    out = flag_drift(d, z_threshold=3.0, min_history=2,
                     partition_by=["lang", "expectation_index"],
                     order_by=["chunk_id"], value_col="observed_value")
    flagged = [(r.lang, r.chunk_id) for r in out.where("drifted").collect()]
    assert flagged == [("en", "batch-3")]


def test_run_summary_orders_runs_and_sums_rows(results):
    rows = run_summary(results).collect()
    assert [r.run_id for r in rows] == ["r1", "r2", "r3", "r4"]
    for r in rows:
        assert r.n_chunks == 2 and r.n_evaluations == 6
        assert r.rows_scanned == 4 and r.success


def test_render_history_docs(results, tmp_path):
    from great_expectations_spark.actions import render_history_docs

    path = render_history_docs(results, str(tmp_path / "docs"),
                               z_threshold=3.0, min_history=3)
    html = open(path).read()
    for rid in ("r1", "r2", "r3", "r4"):
        assert rid in html
    assert "DRIFT" in html  # the shifted r4 mean is highlighted
    assert html.count("<table>") == 2


def test_drift_plan_partitions_by_expectation(results):
    plan = flag_drift(metric_series(results))._jdf.queryExecution().executedPlan().toString()
    assert "partitionBy" not in plan or "SinglePartition" not in plan
    assert "expectation_index" in plan  # window keyed by expectation
