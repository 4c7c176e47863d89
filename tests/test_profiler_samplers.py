"""Profiler, samplers, and streaming-module tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


# ----------------------------------------------------------------- profiler


def test_profile_one_row_per_column(spark, docs):
    from great_expectations_spark.profiler import profile

    prof = {r.column: r for r in profile(docs).collect()}
    assert set(prof) == set(docs.columns)
    n = docs.count()
    assert prof["doc_id"].n_rows == n
    assert prof["doc_id"].kind == "numeric"
    assert prof["text"].kind == "string"
    assert prof["lang"].cardinality_band in ("very_few", "few")
    # exact cross-check of a couple of facts
    assert prof["text"].n_null == docs.where(F.col("text").isNull()).count()
    assert prof["n_chars"].min == docs.agg(F.min("n_chars")).first()[0]


def test_suggested_suite_passes_on_its_own_data(spark, docs):
    from great_expectations_spark import validate
    from great_expectations_spark.profiler import suggest_suite

    suite = suggest_suite(docs)
    assert len(suite.expectations) >= 5
    res = validate(docs, suite, result_format="BOOLEAN_ONLY")
    assert all(r.success for r in res.results), [
        (r.expectation_config.expectation_type, r.result) for r in res.results if not r.success
    ]


def test_suggest_suite_fused_value_sets(spark):
    """Value sets come from ONE fused bounded collect job; columns past the
    cardinality cap fall back to range expectations (numeric) or nothing."""
    from great_expectations_spark.profiler import suggest_suite

    df = spark.createDataFrame(
        [(i, ["a", "b"][i % 2], float(i)) for i in range(40)],
        "id long, tag string, x double",
    )
    suite = suggest_suite(df, set_cardinality_max=5)
    by_col = {}
    for e in suite.expectations:
        by_col.setdefault(e.kwargs.get("column"), []).append(e.expectation_type)
    assert "expect_column_values_to_be_in_set" in by_col["tag"]
    in_set = next(e for e in suite.expectations
                  if e.expectation_type == "expect_column_values_to_be_in_set"
                  and e.kwargs["column"] == "tag")
    assert in_set.kwargs["value_set"] == ["a", "b"]
    # 40-distinct columns exceed the cap: ranges, never unbounded sets
    assert "expect_column_values_to_be_in_set" not in by_col.get("x", [])
    assert "expect_column_values_to_be_between" in by_col["x"]


# ----------------------------------------------------------------- samplers


def test_hash_sampler_partitions_rows(spark, docs):
    from great_expectations_spark.sources.samplers import sample_hash

    total = docs.count()
    got = sum(sample_hash(docs, "doc_id", buckets=4, keep=k).count() for k in range(4))
    assert got == total


def test_mod_and_list_samplers(spark, docs):
    from great_expectations_spark.sources.samplers import sample_mod, sample_value_list

    m = sample_mod(docs, "doc_id", 10, 3)
    assert m.where(F.col("doc_id") % 10 != 3).count() == 0
    v = sample_value_list(docs, "lang", ["en"])
    assert v.select("lang").distinct().collect() == [("en",)]


def test_random_sampler_deterministic_seed(spark, docs):
    from great_expectations_spark.sources.samplers import sample_random

    a = sample_random(docs, 0.5, seed=7).count()
    b = sample_random(docs, 0.5, seed=7).count()
    assert a == b and 0 < a < docs.count()


# ---------------------------------------------------------------- streaming


def test_validate_stream_microbatches(spark, docs, tmp_path):
    from great_expectations_spark import ExpectationSuite
    from great_expectations_spark.streaming import validate_stream

    src = str(tmp_path / "src")
    docs.limit(100).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(src)
    suite = (
        ExpectationSuite(name="stream")
        .add("expect_column_values_to_not_be_null", column="doc_id")
        .add("expect_column_values_to_not_be_null", column="text", mostly=0.8)
    )
    results = str(tmp_path / "results")
    q = validate_stream(stream, suite, results, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.read.parquet(results)
    rows = out.collect()
    assert len(rows) == 2  # one batch x two expectations
    assert {r.chunk_id for r in rows} == {"batch-0"}
    assert out.where(F.col("expectation_index") == 0).first().element_count == 100


def test_validate_stream_replayed_batch_idempotent(spark, docs, tmp_path):
    """A batch replayed after a failure mid-run (simulated: restart the
    stream with a FRESH streaming checkpoint so batch-0 re-fires over the
    same source, same run_id, same results table) must append NO duplicate
    (run_id, chunk_id) rows — rollup over the results stays exact."""
    from great_expectations_spark import ExpectationSuite
    from great_expectations_spark.streaming import validate_stream

    src = str(tmp_path / "src")
    docs.limit(50).coalesce(1).write.parquet(src)
    stream = lambda: spark.readStream.schema(docs.schema).parquet(src)
    suite = ExpectationSuite(name="replay").add(
        "expect_column_values_to_not_be_null", column="doc_id")
    results = str(tmp_path / "results")

    q = validate_stream(stream(), suite, results, str(tmp_path / "ckpt1"),
                        run_id="run-x")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    first = spark.read.parquet(results).collect()
    assert len(first) == 1 and first[0].chunk_id == "batch-0"

    # fresh checkpoint => Spark replays the source from scratch as batch-0
    q2 = validate_stream(stream(), suite, results, str(tmp_path / "ckpt2"),
                         run_id="run-x")
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    again = spark.read.parquet(results).collect()
    assert len(again) == 1  # skip-if-present: no duplicate rows

    # a DIFFERENT run_id is a new logical run and appends normally
    q3 = validate_stream(stream(), suite, results, str(tmp_path / "ckpt3"),
                         run_id="run-y")
    try:
        q3.processAllAvailable()
    finally:
        q3.stop()
    out = spark.read.parquet(results)
    assert out.count() == 2
    assert {(r.run_id, r.chunk_id) for r in out.collect()} == {
        ("run-x", "batch-0"), ("run-y", "batch-0")}


def test_validate_stream_by_replayed_batch_idempotent(spark, docs, tmp_path):
    from great_expectations_spark import ExpectationSuite
    from great_expectations_spark.streaming import validate_stream_by

    src = str(tmp_path / "src")
    docs.limit(40).coalesce(1).write.parquet(src)
    stream = lambda: spark.readStream.schema(docs.schema).parquet(src)
    suite = ExpectationSuite(name="g").add(
        "expect_column_values_to_not_be_null", column="text", mostly=0.5)
    results = str(tmp_path / "results_by")

    for ckpt in ("c1", "c2"):  # second run replays batch-0 via fresh ckpt
        q = validate_stream_by(stream(), suite, ["lang"], results,
                               str(tmp_path / ckpt), run_id="run-x")
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    out = spark.read.parquet(results)
    keys = out.select("run_id", "chunk_id", "lang").collect()
    assert len(keys) == len({(r.run_id, r.chunk_id, r.lang) for r in keys})


def test_windowed_condition_rates_batch_semantics(spark, tmp_path):
    """The windowed aggregation is valid for batch frames too — verify the
    arithmetic there (streaming execution covered by validate_stream)."""
    from great_expectations_spark.streaming import windowed_condition_rates

    df = spark.createDataFrame(
        [("2024-01-01 00:00:05", "en"), ("2024-01-01 00:00:20", None),
         ("2024-01-01 00:01:10", "de")],
        "ts string, lang string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = windowed_condition_rates(df, "ts", {"lang_known": F.col("lang").isNotNull()},
                                   window_seconds=60).orderBy("window_start").collect()
    assert [r.element_count for r in out] == [2, 1]
    assert out[0].lang_known__pass == 1 and out[0].lang_known__rate == 0.5


def test_stateful_cumulative_rate(spark, docs, tmp_path):
    """applyInPandasWithState: totals accumulate ACROSS micro-batches."""
    from great_expectations_spark.streaming.stateful import cumulative_condition_rate

    src = str(tmp_path / "src2")
    half = docs.limit(200)
    half.limit(100).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("ok", F.col("text").isNotNull())
    )
    rates = cumulative_condition_rate(stream, "lang", "ok")
    q = (
        rates.writeStream.format("memory")
        .queryName("cumrates")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
        first = {
            r.key: r.n_total
            for r in spark.sql(
                "SELECT key, max(n_total) AS n_total FROM cumrates GROUP BY key"
            ).collect()
        }
        # second batch arrives -> totals must GROW past the first 100 rows
        half.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        final = {
            r.key: r.n_total
            for r in spark.sql(
                "SELECT key, max(n_total) AS n_total FROM cumrates GROUP BY key"
            ).collect()
        }
    finally:
        q.stop()
    assert sum(first.values()) == 100
    assert sum(final.values()) == 300  # 100 + 200 cumulative, state carried
    assert all(final[k] >= v for k, v in first.items())


def test_windowed_kl_drift_batch_semantics(spark):
    """Column-expression KL matches the engine's numpy kl_divergence on the
    same counts (batch execution checks the arithmetic; streaming execution
    covered below)."""
    import numpy as np

    from great_expectations_spark.functions import stats
    from great_expectations_spark.streaming import windowed_kl_drift

    po = {"values": ["en", "de", "fr"], "weights": [0.5, 0.3, 0.2]}
    # window 1: matches expected-ish; window 2: heavy drift toward 'de'
    rows = (
        [("2024-01-01 00:00:01", "en")] * 5 + [("2024-01-01 00:00:02", "de")] * 3
        + [("2024-01-01 00:00:03", "fr")] * 2
        + [("2024-01-01 00:01:01", "de")] * 9 + [("2024-01-01 00:01:02", "en")] * 1
    )
    df = spark.createDataFrame(rows, "ts string, lang string").withColumn(
        "ts", F.to_timestamp("ts"))
    out = windowed_kl_drift(df, "ts", "lang", po, threshold=0.1,
                            window_seconds=60).orderBy("window_start").collect()
    assert len(out) == 2
    w1, w2 = out
    assert w1.element_count == 10 and w1.other_count == 0
    expect1 = stats.kl_divergence(np.array([0.5, 0.3, 0.2]), np.array(po["weights"]))
    assert abs(w1.kl_divergence - expect1) < 1e-12 and w1.drifted is False
    expect2 = stats.kl_divergence(np.array([0.1, 0.9, 0.0]), np.array(po["weights"]))
    assert abs(w2.kl_divergence - expect2) < 1e-12 and w2.drifted is True
    assert [round(x, 3) for x in w1.observed_weights] == [0.5, 0.3, 0.2]


def test_windowed_kl_drift_other_bucket(spark):
    """Unseen category with no holdout => KL=+inf => drifted; with a holdout
    the lumped-other KL is finite and equals p*ln(p/q') + p_o*ln(p_o/h)."""
    import math

    from great_expectations_spark.streaming import windowed_kl_drift

    po = {"values": ["en"], "weights": [1.0]}
    df = spark.createDataFrame(
        [("2024-01-01 00:00:01", "en")] * 8 + [("2024-01-01 00:00:02", "xx")] * 2,
        "ts string, lang string",
    ).withColumn("ts", F.to_timestamp("ts"))
    strict = windowed_kl_drift(df, "ts", "lang", po, threshold=10.0).first()
    assert math.isinf(strict.kl_divergence) and strict.drifted is True
    held = windowed_kl_drift(df, "ts", "lang", po, threshold=10.0,
                             tail_weight_holdout=0.1).first()
    expect = 0.8 * math.log(0.8 / 0.9) + 0.2 * math.log(0.2 / 0.1)
    assert abs(held.kl_divergence - expect) < 1e-12 and held.drifted is False


def test_windowed_kl_drift_streaming(spark, tmp_path):
    """Incremental execution: one state row per window, update-mode sink."""
    from great_expectations_spark.streaming import windowed_kl_drift

    src = str(tmp_path / "drift_src")
    po = {"values": ["en", "de"], "weights": [0.5, 0.5]}
    rows = spark.createDataFrame(
        [("2024-01-01 00:00:01", "en"), ("2024-01-01 00:00:02", "de"),
         ("2024-01-01 00:01:01", "de"), ("2024-01-01 00:01:02", "de")],
        "ts string, lang string",
    ).withColumn("ts", F.to_timestamp("ts"))
    rows.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("ts timestamp, lang string").parquet(src)
    drift = windowed_kl_drift(stream, "ts", "lang", po, threshold=0.2,
                              window_seconds=60)
    q = (
        drift.writeStream.format("memory").queryName("drift")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck_drift"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.window_start.minute: r for r in spark.sql("SELECT * FROM drift").collect()}
    assert got[0].drifted is False and got[0].kl_divergence == 0.0
    assert got[1].drifted is True  # all-'de' window: KL = ln 2 ≈ 0.693 > 0.2


def _run_stream_to_memory(spark, out_df, name, ckpt):
    q = (
        out_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def test_streaming_exact_dedup(spark, tmp_path):
    """dropDuplicatesWithinWatermark on url: duplicates arriving within the
    delay are dropped; each url is emitted exactly once across micro-batches."""
    from great_expectations_spark.streaming import streaming_exact_dedup

    src = str(tmp_path / "dedup_src")
    schema = "url string, warc_ts timestamp, text string"
    batch1 = spark.createDataFrame(
        [("https://a.example/1", "2024-01-01 00:00:01", "alpha"),
         ("https://a.example/2", "2024-01-01 00:00:02", "beta"),
         ("https://a.example/1", "2024-01-01 00:00:03", "alpha-dup")],
        "url string, warc_ts string, text string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    batch2 = spark.createDataFrame(
        [("https://a.example/2", "2024-01-01 00:00:10", "beta-dup"),
         ("https://a.example/3", "2024-01-01 00:00:11", "gamma")],
        "url string, warc_ts string, text string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    batch1.coalesce(1).write.mode("append").parquet(src)
    batch2.coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    deduped = streaming_exact_dedup(stream, ["url"], "warc_ts", delay="10 minutes")
    out = _run_stream_to_memory(spark, deduped, "dedup_urls", str(tmp_path / "ck_d1"))
    urls = [r.url for r in out.collect()]
    assert sorted(urls) == [
        "https://a.example/1", "https://a.example/2", "https://a.example/3"
    ]


def test_streaming_content_dedup(spark, tmp_path):
    """Content digest dedup: identical text bodies under different urls pass
    through once; state carries the 16-byte digest, and the helper column is
    dropped from the output schema."""
    from great_expectations_spark.streaming import streaming_content_dedup

    src = str(tmp_path / "cdedup_src")
    schema = "url string, warc_ts timestamp, text string"
    rows = spark.createDataFrame(
        [("https://m.example/a", "2024-01-01 00:00:01", "same body"),
         ("https://m.example/b", "2024-01-01 00:00:02", "same body"),
         ("https://m.example/c", "2024-01-01 00:00:03", "other body")],
        "url string, warc_ts string, text string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    rows.coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    deduped = streaming_content_dedup(stream, "text", "warc_ts")
    out = _run_stream_to_memory(spark, deduped, "dedup_content", str(tmp_path / "ck_d2"))
    got = out.collect()
    assert sorted(r.text for r in got) == ["other body", "same body"]
    assert out.columns == ["url", "warc_ts", "text"]  # __digest dropped


# ------------------------------------------------- format inference (r3)


def test_infer_formats_regex_and_strftime(spark):
    from great_expectations_spark.profiler import infer_formats

    df = spark.createDataFrame(
        [("2024-01-05 07:08:09", "10.5", None),
         ("2024-02-06 08:09:10", "-3", "   "),
         ("2024-03-07 09:10:11", "42", "x")],
        "d string, num string, misc string")
    inf = infer_formats(df)
    assert inf["d"]["strftime"]["best"] == "%Y-%m-%d %H:%M:%S"
    assert inf["d"]["strftime"]["ratio"] == pytest.approx(1.0)
    # num: every value matches the decimal candidate (most-specific tie
    # winner per the ordered candidate list)
    assert inf["num"]["regex"]["best"] == r"-?\d+(?:\.\d*)?"
    assert inf["num"]["strftime"]["best"] is None
    # misc: no candidate reaches threshold 1.0 (all-space vs 'x' disagree
    # on every pattern — candidates are SEARCH semantics, so any alnum
    # substring would match general_text)
    assert inf["misc"]["regex"]["best"] is None
    assert inf["misc"]["nonnull"] == 2


def test_infer_formats_threshold(spark):
    from great_expectations_spark.profiler import infer_formats

    df = spark.createDataFrame(
        [("2024-01-05",), ("2024-02-06",), ("not a date",), (None,)],
        "d string")
    strict = infer_formats(df, threshold=1.0)
    loose = infer_formats(df, threshold=0.6)
    assert strict["d"]["strftime"]["best"] is None
    assert loose["d"]["strftime"]["best"] == "%Y-%m-%d"
    assert loose["d"]["strftime"]["ratio"] == pytest.approx(2 / 3, rel=1e-9)


def test_suggest_suite_includes_passing_formats_on_webpages(spark):
    """VERDICT r2 #4 'done' criterion: suggested suites on the webpages
    fixture include a passing regex/strftime expectation."""
    from great_expectations_spark import validate
    from great_expectations_spark.profiler import suggest_suite
    from great_expectations_spark.sources.webpages import webpages

    wp = webpages(spark, 400).withColumn(
        "fetch_date", F.date_format("warc_ts", "yyyy-MM-dd HH:mm:ss"))
    cols = wp.select("url", "fetch_date", "text", "lang")
    suite = suggest_suite(cols)
    types = {(e.expectation_type, e.kwargs.get("column"))
             for e in suite.expectations}
    assert ("expect_column_values_to_match_strftime_format", "fetch_date") in types
    assert any(t == "expect_column_values_to_match_regex" for t, _ in types)
    res = validate(cols, suite, result_format="BOOLEAN_ONLY")
    assert res.success, [
        (r.expectation_config.expectation_type, r.expectation_config.kwargs)
        for r in res.results if not r.success]


def test_suggest_suite_format_inference_opt_out(spark):
    from great_expectations_spark.profiler import suggest_suite
    from great_expectations_spark.sources.webpages import webpages

    wp = webpages(spark, 200).select("url", "text")
    suite = suggest_suite(wp, infer_string_formats=False)
    types = {e.expectation_type for e in suite.expectations}
    assert "expect_column_values_to_match_regex" not in types
    assert "expect_column_values_to_match_strftime_format" not in types


def test_infer_formats_single_row_full_match(spark):
    """A 1-row column that matches 100% must clear threshold=1.0 — the
    n/(nn+eps) ratio form only misses exact 1.0 at nn == 1."""
    from great_expectations_spark.profiler import infer_formats

    df = spark.createDataFrame([("2024-01-05",)], ["d"])
    inf = infer_formats(df, threshold=1.0)
    assert inf["d"]["strftime"]["best"] == "%Y-%m-%d"
    assert inf["d"]["strftime"]["ratio"] == 1.0


def test_seen_chunks_seeds_once_then_memory(spark, docs, tmp_path):
    """ADVICE r4: the idempotence gate reads the results table ONCE at
    stream (re)start to seed a driver-side chunk_id set; every later
    trigger is an in-memory lookup, so per-trigger cost no longer grows
    with accumulated results history."""
    from great_expectations_spark.streaming.validate_stream import _SeenChunks

    results = str(tmp_path / "results")
    docs.limit(3).selectExpr(
        "'run-x' AS run_id", "'batch-0' AS chunk_id").write.parquet(results)

    gate = _SeenChunks(spark, results, "run-x")
    calls = {"n": 0}
    orig = gate._seed

    def counting_seed():
        calls["n"] += 1
        return orig()

    gate._seed = counting_seed
    assert gate.already_written("batch-0") is True   # seeded from table
    assert gate.already_written("batch-1") is False
    gate.mark("batch-1")
    assert gate.already_written("batch-1") is True   # in-memory, no reread
    assert calls["n"] == 1

    # missing table = first write; other run_id's rows don't leak in
    gate2 = _SeenChunks(spark, str(tmp_path / "nope"), "run-x")
    assert gate2.already_written("batch-0") is False
    gate3 = _SeenChunks(spark, results, "run-OTHER")
    assert gate3.already_written("batch-0") is False
