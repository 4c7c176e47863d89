"""Composable cleaning recipes (pipeline/recipes.py): first-rejecting-stage
attribution, zero-scan predicate folding, dedup-on-survivors ordering."""

import pytest
from pyspark.sql import functions as F

from great_expectations_spark.pipeline.recipes import (
    RecipeStage,
    exact_dedup_stage,
    losers_stage,
    predicate_stage,
    run_recipe,
    suite_stage,
)
from great_expectations_spark.suites import ExpectationSuite


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "the quick brown fox jumps over the lazy dog", "en"),  # dup of 1
        (3, "short", "en"),                                        # too short
        (4, "ein ganz anderer text mit vielen worten darin", "xx"),  # bad lang
        (5, "a completely different document body here", "en"),
        (6, None, "en"),                                           # null text
        (7, "the quick brown fox jumps over the lazy dog", "en"),  # dup of 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _recipe():
    return [
        predicate_stage("nonnull", lambda d: F.col("text").isNotNull()),
        predicate_stage("min_len", lambda d: F.length("text") >= 10),
        predicate_stage("lang", lambda d: F.col("lang").isin("en", "de")),
        exact_dedup_stage("exact_dup", "doc_id", "text"),
    ]


def test_first_rejecting_stage_attribution(docs):
    res = run_recipe(docs, _recipe(), "doc_id")
    got = {r["doc_id"]: r["rejected_by"] for r in res.annotated.collect()}
    assert got == {
        1: None,           # keeper
        2: "exact_dup",
        3: "min_len",
        4: "lang",
        5: None,
        6: "nonnull",      # nonnull fires BEFORE min_len sees the NULL
        7: "exact_dup",
    }


def test_clean_preserves_schema_and_rows(docs):
    res = run_recipe(docs, _recipe(), "doc_id")
    clean = res.clean
    assert clean.columns == docs.columns
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 5]


def test_stats_in_stage_order(docs):
    rows = run_recipe(docs, _recipe(), "doc_id").stats().collect()
    assert [(r["stage"], r["n"]) for r in rows] == [
        ("nonnull", 1), ("min_len", 1), ("lang", 1), ("exact_dup", 2),
        (None, 2),
    ]


def test_dedup_runs_on_survivors_only(spark):
    # doc 11 duplicates doc 10, but 10 is rejected by the predicate first —
    # so 11 must SURVIVE (its duplicate never reached the dedup stage)
    df = spark.createDataFrame(
        [(10, "same text body for both", "xx"),
         (11, "same text body for both", "en")],
        "doc_id long, text string, lang string")
    recipe = [
        predicate_stage("lang", lambda d: F.col("lang") == "en"),
        exact_dedup_stage("dup", "doc_id", "text"),
    ]
    got = {r["doc_id"]: r["rejected_by"]
           for r in run_recipe(df, recipe, "doc_id").annotated.collect()}
    assert got == {10: "lang", 11: None}


def test_null_predicate_rejects(spark):
    # length(NULL) is NULL -> ~NULL is NULL -> must still REJECT, not keep
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    res = run_recipe(
        df, [predicate_stage("len", lambda d: F.length("text") > 3)],
        "doc_id")
    assert res.annotated.first()["rejected_by"] == "len"


def test_suite_stage_filters_per_row(docs):
    suite = (
        ExpectationSuite(name="f")
        .add("expect_column_values_to_not_be_null", column="text")
        .add("expect_column_value_lengths_to_be_between",
             column="text", min_value=10)
    )
    res = run_recipe(docs, [suite_stage("quality", suite)], "doc_id")
    got = {r["doc_id"]: r["rejected_by"] for r in res.annotated.collect()}
    assert got[3] == "quality" and got[6] == "quality"
    assert got[1] is None and got[4] is None


def test_losers_stage_custom(docs):
    # arbitrary loser function: reject even ids among survivors
    recipe = [
        losers_stage("evens", lambda s: s.where(F.col("doc_id") % 2 == 0)
                     .select("doc_id")),
    ]
    got = {r["doc_id"]: r["rejected_by"]
           for r in run_recipe(docs, recipe, "doc_id").annotated.collect()}
    assert got[2] == "evens" and got[4] == "evens" and got[1] is None


def test_losers_stage_defaulted_second_param_not_id_col(docs):
    """ADVICE r2: a one-required-arg fn with a DEFAULTED second param
    (lambda s, frac=0.5: ...) must NOT receive id_col in that slot —
    only required positionals opt in to the two-arg protocol."""
    seen = {}

    def fn(s, frac=0.5):
        seen["frac"] = frac
        return s.where(F.col("doc_id") % 2 == 0).select("doc_id")

    got = {r["doc_id"]: r["rejected_by"]
           for r in run_recipe(docs, [losers_stage("evens", fn)],
                               "doc_id").annotated.collect()}
    assert seen["frac"] == 0.5  # NOT the string "doc_id"
    assert got[2] == "evens" and got[1] is None


def test_losers_stage_two_required_params_gets_id_col(docs):
    seen = {}

    def fn(s, id_col):
        seen["id_col"] = id_col
        return s.where(F.col(id_col) % 2 == 0).select(id_col)

    run_recipe(docs, [losers_stage("evens", fn)], "doc_id").annotated.collect()
    assert seen["id_col"] == "doc_id"


def test_losers_stage_required_keyword_id_col_receives_it(docs):
    """A REQUIRED param literally named id_col opts in (passed by
    keyword, so keyword-only signatures work)."""
    seen = {}

    def fn(s, *, id_col):
        seen["id_col"] = id_col
        return s.where(F.col(id_col) % 2 == 0).select(id_col)

    run_recipe(docs, [losers_stage("evens", fn)], "doc_id").annotated.collect()
    assert seen["id_col"] == "doc_id"


def test_losers_stage_bound_id_col_is_honored(docs):
    """A DEFAULTED or partial-bound id_col is an explicit caller choice —
    run_recipe must not override it (functools.partial surfaces the
    binding as a defaulted keyword param)."""
    import functools

    seen = {}

    def fn(s, *, id_col="doc_id"):
        seen["id_col"] = id_col
        return s.where(F.col("doc_id") % 2 == 0).select("doc_id")

    run_recipe(docs, [losers_stage("evens", fn)], "doc_id").annotated.collect()
    assert seen["id_col"] == "doc_id"  # the default, untouched

    bound = functools.partial(fn, id_col="bound_choice")
    run_recipe(docs, [losers_stage("evens", bound)], "doc_id").annotated.collect()
    assert seen["id_col"] == "bound_choice"


def test_losers_stage_single_param_named_id_col(docs):
    """A one-param fn whose sole parameter happens to be named id_col is
    the classic one-arg protocol: it receives the survivors frame, never
    a duplicate keyword (which would raise TypeError)."""
    seen = {}

    def fn(id_col):
        seen["got_df"] = hasattr(id_col, "columns")
        return id_col.where(F.col("doc_id") % 2 == 0).select("doc_id")

    run_recipe(docs, [losers_stage("evens", fn)], "doc_id").annotated.collect()
    assert seen["got_df"] is True


def test_duplicate_stage_names_rejected(docs):
    with pytest.raises(ValueError, match="duplicate stage names"):
        run_recipe(docs, [
            predicate_stage("x", lambda d: F.lit(True)),
            predicate_stage("x", lambda d: F.lit(True)),
        ], "doc_id")


def test_unknown_kind_rejected(docs):
    with pytest.raises(ValueError, match="unknown stage kind"):
        run_recipe(docs, [RecipeStage("x", "nope", lambda d: d)], "doc_id")


def test_predicate_stages_fold_into_one_scan(docs):
    """All-predicate recipes must not shuffle or add jobs: the annotated
    plan contains no Exchange."""
    recipe = _recipe()[:3]
    plan = run_recipe(
        docs, recipe, "doc_id").annotated._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_suite_stages_per_expectation_attribution(docs):
    from great_expectations_spark.pipeline.recipes import suite_stages

    suite = (
        ExpectationSuite(name="f")
        .add("expect_column_values_to_not_be_null", column="text")
        .add("expect_column_value_lengths_to_be_between",
             column="text", min_value=10)
        .add("expect_column_values_to_be_in_set",
             column="lang", value_set=["en", "de"])
    )
    res = run_recipe(docs, suite_stages(suite), "doc_id")
    got = {r["doc_id"]: r["rejected_by"] for r in res.annotated.collect()}
    assert got[6] == "expect_column_values_to_not_be_null(text)"
    assert got[3] == "expect_column_value_lengths_to_be_between(text)"
    assert got[4] == "expect_column_values_to_be_in_set(lang)"
    assert got[1] is None
    # still a single-scan plan: no Exchange for all-predicate recipes
    plan = res.annotated._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_dsir_select_tolerates_logw_column(spark):
    from great_expectations_spark.pipeline.dsir import dsir_select

    df = spark.createDataFrame(
        [(1, "aa bb cc dd", 9.9), (2, "aa bb cc dd ee", 1.1),
         (3, "zz yy xx ww", 0.0)],
        "doc_id long, text string, logw double")
    out = dsir_select(df, df.where("doc_id < 3"), "doc_id", "text",
                      n=2, buckets=64)
    assert out.columns == ["doc_id", "text", "logw"]
    assert out.count() == 2


def test_compression_ratio_predicate_stage(spark):
    """The zlib compression-ratio signal composes as an ordinary recipe
    keep-predicate: a templated (hyper-compressible) doc is rejected
    with the stage's name in rejected_by, NULL text rejects too."""
    from great_expectations_spark.pipeline.quality import compression_ratio_col
    from great_expectations_spark.pipeline.recipes import (
        predicate_stage, run_recipe)

    df = spark.createDataFrame(
        [(1, "spam ham " * 400),
         (2, "The five boxing wizards jump quickly over a lazy brown dog "
             "while jackdaws love my big sphinx of quartz and vexed zebras."),
         (3, None)],
        "doc_id long, text string")
    import zlib
    raw = ("spam ham " * 400).encode()
    cutoff = len(zlib.compress(raw, 6)) / len(raw) + 0.01  # just above doc 1
    stage = predicate_stage(
        "too_compressible",
        lambda d: compression_ratio_col(F.col("text")) >= cutoff)
    res = run_recipe(df, [stage], "doc_id")
    assert {r["doc_id"] for r in res.clean.collect()} == {2}
    rej = {r["doc_id"]: r["rejected_by"] for r in res.annotated.collect()}
    assert rej[1] == "too_compressible" and rej[3] == "too_compressible"
    assert rej[2] is None
