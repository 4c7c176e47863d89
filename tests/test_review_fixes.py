"""Regression tests for the round-2 core self-review findings
(compiler NaN/relative-error/value_format/row-condition-mode, checkpoint
chunk-id collision + resume error handling, evaluation-parameter URNs)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from great_expectations_spark import ExpectationSuite, validate


def test_nan_observed_value_fails_between(spark):
    """NaN mean must FAIL the between check (inverted comparisons would
    silently pass it)."""
    df = spark.createDataFrame([(1.0,), (float("nan"),)], "x double")
    suite = ExpectationSuite("nan").add(
        "expect_column_mean_to_be_between", column="x", min_value=0)
    r = validate(df, suite).results[0]
    assert r.success is False
    obs = r.result["observed_value"]
    assert obs is None or math.isnan(obs)


def test_allow_relative_error_true_rejected(spark):
    """allow_relative_error=True is not a float: must surface an error,
    never silently compute accuracy=1 (~100% relative error) quantiles."""
    df = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    suite = ExpectationSuite("q").add(
        "expect_column_quantile_values_to_be_between", column="x",
        allow_relative_error=True,
        quantile_ranges={"quantiles": [0.5], "value_ranges": [[0, 100]]})
    r = validate(df, suite).results[0]
    assert r.exception_info["raised_exception"] is True
    assert "allow_relative_error" in (r.exception_info["exception_message"] or "")


def test_pair_row_condition_keeps_pair_value_format(spark):
    """Pair expectation + row_condition: unexpected values must stay
    [a, b] lists (the kernel rebuild used to reset value_format)."""
    df = spark.createDataFrame(
        [(1, 10, 5), (2, 3, 7), (3, 8, 1)], "id int, a int, b int")
    suite = ExpectationSuite("pair").add(
        "expect_column_pair_values_a_to_be_greater_than_b",
        column_A="a", column_B="b", row_condition="id >= 1",
        condition_parser="spark")
    r = validate(df, suite, result_format="COMPLETE").results[0]
    assert r.result["unexpected_count"] == 1
    assert r.result["unexpected_list"] == [[3, 7]]


def test_most_common_honors_row_condition(spark):
    """The mode must be computed over the row_condition domain, not the
    whole table."""
    rows = [("EU", "de")] * 5 + [("EU", "en")] * 2 + [("US", "en")] * 10
    df = spark.createDataFrame(rows, "region string, lang string")
    suite = ExpectationSuite("mode").add(
        "expect_column_most_common_value_to_be_in_set",
        column="lang", value_set=["de"],
        row_condition="region = 'EU'", condition_parser="spark")
    r = validate(df, suite).results[0]
    # global mode is 'en' (12x); EU-domain mode is 'de' (5x) -> must pass
    assert r.success is True
    assert r.result["observed_value"] == ["de"]
    assert r.result["element_count"] == 7


def test_splitter_null_sentinel_collision(spark):
    """A literal '__null__' string value and actual NULLs must get
    DISTINCT chunk ids (resume keys on chunk_id)."""
    from great_expectations_spark.checkpoint import Splitter

    df = spark.createDataFrame(
        [("__null__",), ("a",), (None,)], "k string")
    sp = Splitter.column_value(df, "k")
    ids = [cid for cid, _ in sp.chunks]
    assert len(ids) == len(set(ids)) == 3
    # each chunk selects exactly one row
    for cid, pred in sp.chunks:
        assert df.where(pred).count() == 1, cid


def test_parse_urn_stores_short_is_typed_error():
    from great_expectations_spark.core.evaluation_parameters import (
        EvaluationParameterError,
        parse_urn,
    )

    with pytest.raises(EvaluationParameterError, match="stores URN"):
        parse_urn("urn:great_expectations:stores:only_store")


# ---- second-pass findings (conditions / dedup / similarity / textstats)


def test_between_both_bounds_none_errors(spark):
    df = spark.createDataFrame([(1,)], "x int")
    suite = ExpectationSuite("nb").add(
        "expect_column_values_to_be_between", column="x")
    r = validate(df, suite).results[0]
    assert r.exception_info["raised_exception"] is True
    assert "cannot both be None" in r.exception_info["exception_message"]


def test_length_bounds_must_be_integers(spark):
    df = spark.createDataFrame([("ab",)], "s string")
    suite = ExpectationSuite("lb").add(
        "expect_column_value_lengths_to_be_between", column="s", min_value=2.5)
    r = validate(df, suite).results[0]
    assert r.exception_info["raised_exception"] is True
    assert "integer" in r.exception_info["exception_message"]


def test_empty_regex_list_errors(spark):
    df = spark.createDataFrame([("x",)], "s string")
    suite = ExpectationSuite("rl").add(
        "expect_column_values_to_match_regex_list", column="s", regex_list=[])
    r = validate(df, suite).results[0]
    assert r.exception_info["raised_exception"] is True


def test_pair_in_set_empty_set_permits_nothing(spark):
    df = spark.createDataFrame([(1, 2), (3, 4)], "a int, b int")
    suite = ExpectationSuite("ps").add(
        "expect_column_pair_values_to_be_in_set",
        column_A="a", column_B="b", value_pairs_set=[])
    r = validate(df, suite).results[0]
    assert r.success is False
    assert r.result["unexpected_count"] == 2


def test_exact_dedup_passes_null_rows_through(spark):
    from great_expectations_spark.pipeline.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (4, None)], "id int, t string")
    out = exact_dedup(df, "t", keep_order_col="id")
    ids = sorted(r.id for r in out.collect())
    assert ids == [1, 3, 4]  # one 'a' kept, BOTH null rows pass through


def test_exact_dedup_stats_empty_input_zeroes(spark):
    from great_expectations_spark.pipeline.dedup import exact_dedup_stats

    df = spark.createDataFrame([(1, None), (2, None)], "id int, t string")
    row = exact_dedup_stats(df, "t").first()
    assert (row.n_rows, row.n_null, row.n_distinct) == (2, 2, 0)
    assert row.dup_rows == 0 and row.dup_groups == 0  # not NULL


def test_lsh_bands_must_divide_k(spark):
    from great_expectations_spark.pipeline.dedup import minhash_lsh_candidates

    df = spark.createDataFrame([(1, "a b c d e")], "doc_id int, text string")
    with pytest.raises(ValueError, match="evenly divide"):
        minhash_lsh_candidates(df, "doc_id", "text", k=12, bands=16)
    with pytest.raises(ValueError, match="evenly divide"):
        minhash_lsh_candidates(df, "doc_id", "text", k=12, bands=5)


def test_ivf_works_with_string_ids(spark):
    from great_expectations_spark.pipeline.similarity import ann_topk_ivf

    rows = [(f"doc-{i:03d}", [float((i * 7 + d) % 13) for d in range(8)])
            for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    q = emb.limit(2).select(F.col("vec_id").alias("q_id"),
                            F.col("embedding").alias("q_vec"))
    out = ann_topk_ivf(emb, q, dims=8, k=3, n_centroids=4, n_probe=4)
    assert out.count() == 6  # 2 queries x top-3, no NULL-bucket crash


def test_filler_ratio_empty_list_disables(spark):
    from great_expectations_spark.pipeline.textstats import filler_ratio

    df = spark.createDataFrame([("table row table",)], "text string")
    got = df.select(
        filler_ratio(F.col("text")).alias("default_vocab"),
        filler_ratio(F.col("text"), fillers=[]).alias("disabled"),
    ).first()
    assert got.default_vocab == 1.0  # all three tokens are default fillers
    assert got.disabled == 0.0


# ---- third-pass findings (sources / streaming / skew / webtext / multimodal)


def test_streaming_dedup_null_rows_pass_through(spark, tmp_path):
    from great_expectations_spark.streaming import (
        streaming_content_dedup,
        streaming_exact_dedup,
    )

    src = str(tmp_path / "nsrc")
    rows = spark.createDataFrame(
        [("u1", "2024-01-01 00:00:01", None),
         ("u2", "2024-01-01 00:00:02", None),
         ("u3", "2024-01-01 00:00:03", "body"),
         ("u4", "2024-01-01 00:00:04", "body"),
         (None, "2024-01-01 00:00:05", "x"),
         (None, "2024-01-01 00:00:06", "y")],
        "url string, ts string, text string",
    ).withColumn("ts", F.to_timestamp("ts"))
    rows.coalesce(1).write.parquet(src)
    schema = "url string, ts timestamp, text string"

    stream = spark.readStream.schema(schema).parquet(src)
    q = (streaming_content_dedup(stream, "text", "ts")
         .writeStream.format("memory").queryName("cnull").outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck1")).start())
    q.processAllAvailable(); q.stop()
    got = spark.sql("SELECT * FROM cnull").collect()
    # both NULL-text rows survive; 'body' deduped to one
    assert sorted((r.url or "~") for r in got) == ["u1", "u2", "u3", "~", "~"]

    stream2 = spark.readStream.schema(schema).parquet(src)
    q2 = (streaming_exact_dedup(stream2, ["url"], "ts")
          .writeStream.format("memory").queryName("knull").outputMode("append")
          .option("checkpointLocation", str(tmp_path / "ck2")).start())
    q2.processAllAvailable(); q2.stop()
    got2 = spark.sql("SELECT * FROM knull").collect()
    # both NULL-url rows survive (pass-through), u1..u4 each once
    assert len(got2) == 6


def test_read_parquet_applies_schema(spark, tmp_path):
    from great_expectations_spark.sources.readers import read_any

    p = str(tmp_path / "t.parquet")
    spark.createDataFrame([(1, "a")], "i int, s string").write.parquet(p)
    out = read_any(spark, p, schema="i long, s string")
    assert dict(out.dtypes)["i"] == "bigint"  # schema applied, not ignored


def test_with_salt_spreads_identical_rows(spark):
    from great_expectations_spark.functions.skew import with_salt

    df = spark.createDataFrame([("en",)] * 200, "lang string").repartition(4)
    n_salts = with_salt(df, buckets=8).select("__salt").distinct().count()
    assert n_salts > 1  # content-derived salt would give exactly 1


def test_domain_stats_null_domain_joined(spark):
    from great_expectations_spark.pipeline.webtext import domain_stats

    df = spark.createDataFrame(
        [("https://a.example/x",), ("https://a.example/x",), (None,)],
        "url string")
    rows = {r["domain"]: r for r in domain_stats(df, "url").collect()}
    null_row = rows.get(None)
    assert null_row is not None and null_row.distinct_urls is not None


def test_multimodal_null_payload_and_id(spark):
    from great_expectations_spark.pipeline.multimodal import extract_features

    df = spark.createDataFrame(
        [(1, bytearray(b"abc")), (2, None), (None, bytearray(b""))],
        "doc_id long, payload binary")
    got = {r.doc_id: r for r in extract_features(df, "doc_id", "payload").collect()}
    assert got[1].n_bytes == 3 and got[1].content_md5 is not None
    # NULL payload: no fake md5(b'') fabricated for missing data
    assert got[2].n_bytes is None and got[2].content_md5 is None
    assert None in got  # NULL id passes through instead of crashing


# ---- fourth-pass findings (stats / core / webpages)


def test_ks_sf_nonconvergence_returns_one():
    import numpy as np

    from great_expectations_spark.functions import stats

    assert stats.ks_sf(1e-5, 100_000) == 1.0  # was 0.18 truncated garbage
    n = 10_000
    s = np.arange(1, n + 1) / (n + 1)
    _d, p = stats.ks_test_named(s, "uniform", (0.0, 1.0))
    assert p > 0.999  # perfect fit must not fail a p>0.05 expectation


def test_cramers_phi_yates_on_2x2():
    import numpy as np

    from great_expectations_spark.functions import stats

    assert abs(stats.cramers_phi(np.array([[30, 10], [10, 30]])) - 0.475) < 1e-9


def test_chisquare_zero_cells_nan():
    import math

    import numpy as np

    from great_expectations_spark.functions import stats

    st, p = stats.chisquare_test(np.array([0.0, 10.0]), np.array([0.0, 10.0]))
    assert math.isnan(st) and math.isnan(p)


def test_vectorized_cdfs_match_scalar():
    import numpy as np

    from great_expectations_spark.functions import stats

    z = np.linspace(0.001, 0.999, 500)
    vec = stats.betainc_reg_vec(2.5, 3.5, z)
    sca = np.array([stats.betainc_reg(2.5, 3.5, v) for v in z])
    assert float(np.max(np.abs(vec - sca))) < 1e-13
    zg = np.linspace(0.01, 30, 500)
    vg = stats.gammainc_lower_reg_vec(4.2, zg)
    sg = np.array([stats.gammainc_lower_reg(4.2, v) for v in zg])
    assert float(np.max(np.abs(vg - sg))) < 1e-13


def test_result_format_string_index_columns():
    from great_expectations_spark.core.result_format import ResultFormat

    rf = ResultFormat.parse({"result_format": "COMPLETE",
                             "unexpected_index_column_names": "url"})
    assert rf.unexpected_index_column_names == ("url",)  # not ('u','r','l')


def test_suite_get_metric_ambiguity_raises(spark):
    from great_expectations_spark.core.result import SuiteValidationResult

    df = spark.createDataFrame([(1, 1)], "a int, b int")
    suite = (ExpectationSuite("amb")
             .add("expect_column_values_to_be_unique", column="a")
             .add("expect_column_values_to_be_unique", column="b"))
    res = validate(df, suite)
    assert isinstance(res, SuiteValidationResult)
    with pytest.raises(KeyError, match="ambiguous"):
        res.get_metric("expect_column_values_to_be_unique.result.unexpected_count")
    # kwargs pin one -> works
    v = res.get_metric("expect_column_values_to_be_unique.result.unexpected_count",
                       column="a")
    assert v == 0
