"""DataContext facade: suites CRUD through stores, validate-and-persist,
automatic evaluation-parameter chaining across runs, data-docs site, and
the filesystem scaffold layout."""

from __future__ import annotations

import os

import pytest

from great_expectations_spark import DataContext, ExpectationSuite, get_context
from great_expectations_spark.stores import InvalidKeyError


def _pages(spark, n=100):
    from pyspark.sql import functions as F

    return (
        spark.range(n)
        .select(
            F.concat(F.lit("https://ex.com/"), F.col("id")).alias("url"),
            (F.col("id") % 10).cast("double").alias("score"),
        )
    )


def test_suites_crud_ephemeral():
    ctx = get_context()
    suite = ExpectationSuite("s1").add(
        "expect_column_values_to_not_be_null", column="url")
    ctx.add_suite(suite)
    ctx.add_suite(ExpectationSuite("s2"))
    assert ctx.list_suite_names() == ["s1", "s2"]
    assert ctx.get_suite("s1").to_json() == suite.to_json()
    ctx.delete_suite("s2")
    assert ctx.list_suite_names() == ["s1"]
    with pytest.raises(InvalidKeyError):
        ctx.get_suite("s2")


def test_validate_persists_and_records_metrics(spark):
    ctx = get_context()
    ctx.add_suite(
        ExpectationSuite("pages")
        .add("expect_column_values_to_not_be_null", column="url")
        .add("expect_column_mean_to_be_between",
             column="score", min_value=0, max_value=9))
    res = ctx.validate(_pages(spark), "pages", run_id="r1")
    assert res.success
    stored = ctx.validations.get(("pages", "r1"))
    assert stored.to_json() == res.to_json()
    assert ctx.metrics.get(
        ("r1", "expect_column_mean_to_be_between",
         "column=score&max_value=9&min_value=0")) == 4.5


def test_same_type_same_column_metrics_do_not_collide(spark):
    """Two between-expectations on one column must store BOTH observed
    values (the kwargs-id key carries the full identity, reference
    metric_kwargs_id design) — and back-to-back default run ids must not
    overwrite each other."""
    ctx = get_context()
    ctx.add_suite(
        ExpectationSuite("p2")
        .add("expect_column_mean_to_be_between",
             column="score", min_value=0, max_value=9)
        .add("expect_column_mean_to_be_between",
             column="score", min_value=0, max_value=100))
    ctx.validate(_pages(spark), "p2", run_id="r9")
    keys = [k for k in ctx.metrics.list_keys(("r9",))]
    assert len(keys) == 2 and len({k[2] for k in keys}) == 2
    # default run ids are unique even sub-second
    r1 = ctx.validate(_pages(spark), "p2")
    r2 = ctx.validate(_pages(spark), "p2")
    runs = ctx.validations.runs_for_suite("p2")
    assert len(runs) >= 2 and len(set(runs)) == len(runs)


def test_eval_param_chaining_across_runs(spark):
    """An upstream suite's observed row count binds a downstream suite's
    $PARAMETER URN automatically — no manual params plumbing."""
    ctx = get_context()
    up = ExpectationSuite("upstream").add(
        "expect_table_row_count_to_be_between", min_value=1, max_value=10**6)
    ctx.add_suite(up)
    ctx.validate(_pages(spark, n=80), "upstream", run_id="r1")

    down = ExpectationSuite("downstream").add(
        "expect_table_row_count_to_be_between",
        min_value={"$PARAMETER": (
            "urn:great_expectations:validations:upstream:"
            "expect_table_row_count_to_be_between.result.observed_value"
            " * 0.5")},
        max_value=10**6)
    ctx.add_suite(down)
    res = ctx.validate(_pages(spark, n=80), "downstream", run_id="r2")
    assert res.success  # 80 >= 0.5 * 80
    res_fail = ctx.validate(_pages(spark, n=30), "downstream", run_id="r3")
    assert not res_fail.success  # 30 < 0.5 * 80


def test_eval_param_latest_run_wins(spark):
    ctx = get_context()
    up = ExpectationSuite("up").add(
        "expect_table_row_count_to_be_between", min_value=1, max_value=10**6)
    ctx.add_suite(up)
    ctx.validate(_pages(spark, n=10), "up", run_id="2026a")
    ctx.validate(_pages(spark, n=50), "up", run_id="2026b")
    down = ExpectationSuite("down").add(
        "expect_table_row_count_to_be_between",
        min_value={"$PARAMETER": (
            "urn:great_expectations:validations:up:"
            "expect_table_row_count_to_be_between.result.observed_value")},
        max_value=10**6)
    ctx.add_suite(down)
    # 30 rows ≥ 10 (older run) but < 50 (latest run) — latest must win
    assert not ctx.validate(_pages(spark, n=30), "down", run_id="2026c").success


def test_filesystem_scaffold_and_docs(spark, tmp_path):
    root = str(tmp_path / "ge_root")
    ctx = DataContext(root_dir=root)
    ctx.add_suite(ExpectationSuite("pages").add(
        "expect_column_values_to_not_be_null", column="url"))
    ctx.validate(_pages(spark), "pages", run_id="r1")
    assert os.path.isfile(os.path.join(root, "expectations", "pages.json"))
    assert os.path.isfile(os.path.join(root, "validations", "pages", "r1.json"))
    assert os.path.isfile(os.path.join(root, "metrics.db"))

    # a NEW context over the same root sees everything (durability)
    ctx2 = DataContext(root_dir=root)
    assert ctx2.list_suite_names() == ["pages"]
    assert ctx2.validations.get(("pages", "r1")).success

    idx = ctx2.build_data_docs()
    assert idx == os.path.join(root, "data_docs", "index.html")
    html = open(idx).read()
    assert "pages" in html and "r1" in html


def test_ephemeral_docs_requires_dir(spark):
    ctx = get_context()
    with pytest.raises(ValueError):
        ctx.build_data_docs()
    ctx.add_suite(ExpectationSuite("s").add(
        "expect_column_values_to_not_be_null", column="url"))
    ctx.validate(_pages(spark), "s", run_id="r1")


def test_explicit_params_beat_stored(spark):
    ctx = get_context()
    up = ExpectationSuite("up").add(
        "expect_table_row_count_to_be_between", min_value=1, max_value=10**6)
    ctx.add_suite(up)
    ctx.validate(_pages(spark, n=99), "up", run_id="r1")
    urn = ("urn:great_expectations:validations:up:"
           "expect_table_row_count_to_be_between.result.observed_value")
    down = ExpectationSuite("down").add(
        "expect_table_row_count_to_be_between",
        min_value={"$PARAMETER": urn}, max_value=10**6)
    ctx.add_suite(down)
    # stored value 99 would fail a 10-row table; explicit override passes
    res = ctx.validate(_pages(spark, n=10), "down", run_id="r2",
                       evaluation_parameters={urn: 5})
    assert res.success


def test_eval_param_publication_order_beats_lexicographic(spark):
    """User-supplied run ids need not sort chronologically: 'run-9' >
    'run-10' as strings, but run-10 published later and must win."""
    ctx = get_context()
    up = ExpectationSuite("up2").add(
        "expect_table_row_count_to_be_between", min_value=1, max_value=10**6)
    ctx.add_suite(up)
    ctx.validate(_pages(spark, n=10), "up2", run_id="run-9")
    ctx.validate(_pages(spark, n=50), "up2", run_id="run-10")
    down = ExpectationSuite("down2").add(
        "expect_table_row_count_to_be_between",
        min_value={"$PARAMETER": (
            "urn:great_expectations:validations:up2:"
            "expect_table_row_count_to_be_between.result.observed_value")},
        max_value=10**6)
    ctx.add_suite(down)
    # 30 ≥ 10 (run-9) but < 50 (run-10, published last) — run-10 must win
    assert not ctx.validate(_pages(spark, n=30), "down2", run_id="run-11").success
