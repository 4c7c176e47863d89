"""Round-2 parity closers: the four remaining splitters
(sparkdf_data_splitter.py:221-295), file readers + table.head
(sparkdf_execution_engine.py:427-492, table_metrics/table_head.py),
checkpoint rollup whole-table semantics, query-metric brace safety, and
the MinHash-LSH hot-bucket cap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from great_expectations_spark import ExpectationSuite
from great_expectations_spark.checkpoint import Splitter, run_checkpoint

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


class TestSplitters:
    def test_mod_integer_partitions_everything(self, spark, docs):
        sp = Splitter.mod_integer("doc_id", 4)
        assert len(sp.chunks) == 5  # 4 residues + NULL chunk
        total = sum(docs.where(pred).count() for _, pred in sp.chunks)
        assert total == docs.count()

    def test_mod_integer_covers_negatives_and_nulls(self, spark):
        df = spark.createDataFrame([(-5,), (-1,), (0,), (7,), (None,)], "k int")
        sp = Splitter.mod_integer("k", 4)
        total = sum(df.where(pred).count() for _, pred in sp.chunks)
        assert total == 5  # pmod keeps negatives in range; NULL chunk catches NULL

    def test_divided_integer_quotients(self, spark, docs):
        sp = Splitter.divided_integer(docs, "doc_id", 100)
        # chunks are disjoint and complete
        total = sum(docs.where(pred).count() for _, pred in sp.chunks)
        assert total == docs.count()
        # reference semantics: int(col / divisor) (true division, cast)
        expected = {
            r[0] for r in docs.select(
                (F.col("doc_id") / 100).cast("int")).distinct().collect()
        }
        assert len(sp.chunks) == len(expected)

    def test_multi_column_values(self, spark, docs):
        sp = Splitter.multi_column_values(docs, ["lang", "source"], max_chunks=1000)
        combos = docs.select("lang", "source").distinct().count()
        assert len(sp.chunks) == combos
        total = sum(docs.where(pred).count() for _, pred in sp.chunks)
        assert total == docs.count()

    def test_converted_datetime_timestamp_column(self, spark):
        df = spark.createDataFrame(
            [("2024-01-01 10:00:00",), ("2024-01-01 23:59:59",), ("2024-01-02 00:00:01",)],
            "ts string").select(F.col("ts").cast("timestamp").alias("ts"))
        sp = Splitter.converted_datetime(df, "ts", "yyyy-MM-dd")
        ids = sorted(cid for cid, _ in sp.chunks)
        assert ids == ["ts~yyyy-MM-dd=2024-01-01", "ts~yyyy-MM-dd=2024-01-02"]
        counts = {cid: df.where(pred).count() for cid, pred in sp.chunks}
        assert counts["ts~yyyy-MM-dd=2024-01-01"] == 2

    def test_converted_datetime_epoch_column(self, spark):
        # reference from_unixtime path: numeric columns are epoch seconds
        df = spark.createDataFrame([(0,), (86400,), (86401,)], "t bigint")
        sp = Splitter.converted_datetime(df, "t", "yyyy-MM-dd")
        assert len(sp.chunks) == 2
        total = sum(df.where(pred).count() for _, pred in sp.chunks)
        assert total == 3

    def test_checkpoint_with_mod_splitter(self, spark, docs, tmp_path):
        suite = ExpectationSuite("s").add(
            "expect_column_values_to_not_be_null", column="text", mostly=0.9)
        sp = Splitter.mod_integer("doc_id", 4)
        res = run_checkpoint(docs, suite, sp, str(tmp_path / "r"), run_id="m1")
        assert len(res.completed_chunks) == 5  # 4 residues + NULL chunk
        total = res.results_df.agg(F.sum("element_count")).first()[0]
        assert total == docs.count()


class TestRollupWholeTableSemantics:
    def test_map_success_rederived_from_sums(self, spark, tmp_path):
        # 90 clean rows in chunk a, 10 rows with 2 nulls in chunk b:
        # chunk b fails mostly=0.95 (8/10), whole table passes (98/100)
        rows = [("a", "x")] * 90 + [("b", "x")] * 8 + [("b", None)] * 2
        df = spark.createDataFrame(rows, "g string, v string")
        suite = ExpectationSuite("s").add(
            "expect_column_values_to_not_be_null", column="v", mostly=0.95)
        res = run_checkpoint(
            df, suite, Splitter.column_value(df, "g"), str(tmp_path / "r"), run_id="r")
        per_chunk = {
            r["chunk_id"]: r["success"] for r in res.results_df.collect()
        }
        assert per_chunk["g=a"] is True and per_chunk["g=b"] is False
        roll = res.rollup().collect()[0]
        assert roll["unexpected_count"] == 2
        assert roll["success"] is True  # whole-table 98% >= 95%

    def test_chunk_relative_expectation_stays_conservative(self, spark, tmp_path):
        # duplicate values in the SAME chunk → chunk fails → rollup fails
        rows = [("a", 1), ("a", 1), ("b", 2), ("b", 3)]
        df = spark.createDataFrame(rows, "g string, v int")
        suite = ExpectationSuite("s").add(
            "expect_column_values_to_be_unique", column="v")
        res = run_checkpoint(
            df, suite, Splitter.column_value(df, "g"), str(tmp_path / "r"), run_id="r")
        roll = res.rollup().collect()[0]
        assert roll["success"] is False


class TestReaders:
    def test_csv_roundtrip(self, spark, tmp_path):
        from great_expectations_spark.sources.readers import read_any, read_csv

        p = str(tmp_path / "t.csv")
        with open(p, "w") as f:
            f.write("a,b\n1,x\n2,y\n")
        df = read_csv(spark, p)
        assert df.count() == 2 and set(df.columns) == {"a", "b"}
        assert read_any(spark, p).count() == 2

    def test_tsv_with_ddl_schema(self, spark, tmp_path):
        from great_expectations_spark.sources.readers import read_tsv

        p = str(tmp_path / "t.tsv")
        with open(p, "w") as f:
            f.write("a\tb\n1\tx\n")
        df = read_tsv(spark, p, schema="a int, b string")
        assert df.schema.simpleString() == "struct<a:int,b:string>"
        assert df.first()["a"] == 1

    def test_json_schema_dict(self, spark, tmp_path):
        from pyspark.sql import types as T

        from great_expectations_spark.sources.readers import read_csv

        schema = T.StructType([T.StructField("a", T.LongType())]).jsonValue()
        p = str(tmp_path / "s.csv")
        with open(p, "w") as f:
            f.write("a\n5\n")
        df = read_csv(spark, p, schema=schema)
        assert isinstance(df.schema["a"].dataType, T.LongType)

    def test_delta_unavailable_is_clear_error(self, spark):
        from great_expectations_spark.sources.readers import delta_available, read_delta

        if delta_available(spark):
            pytest.skip("delta on classpath")
        with pytest.raises(RuntimeError, match="[Dd]elta"):
            read_delta(spark, "/tmp/nope")

    def test_table_head(self, spark, docs):
        from great_expectations_spark.sources.readers import table_head

        rows = table_head(docs.orderBy("doc_id"), n_rows=3)
        assert len(rows) == 3
        assert rows[0]["doc_id"] == docs.agg(F.min("doc_id")).first()[0]
        assert set(rows[0]) == set(docs.columns)


class TestQueryMetricBraces:
    def test_literal_braces_pass_through(self, spark):
        from great_expectations_spark.functions.querymetrics import run_query

        df = spark.createDataFrame([("a1",), ("b2",)], "s string")
        out = run_query(
            df,
            r"SELECT count(*) AS n FROM {active_batch} WHERE s RLIKE '^[a-z]\\d{1}$'")
        assert out.first()["n"] == 2

    def test_map_literal_braces(self, spark):
        from great_expectations_spark.functions.querymetrics import run_query

        df = spark.createDataFrame([(1,)], "x int")
        out = run_query(df, "SELECT map('k', x) AS m FROM {active_batch}")
        assert out.first()["m"] == {"k": 1}


class TestLshHotBucketCap:
    def test_planted_hot_bucket_is_dropped(self, spark):
        # 30 identical boilerplate docs (one giant bucket) + 2 genuine near-dups
        boiler = [(i, "cookie banner accept terms privacy policy footer nav") for i in range(30)]
        pair = [
            (100, "unique document about spark range joins and analytics"),
            (101, "unique document about spark range joins and analytics"),
        ]
        df = spark.createDataFrame(boiler + pair, "doc_id long, text string")
        from great_expectations_spark.pipeline.dedup import (
            lsh_hot_buckets,
            minhash_lsh_candidates,
        )

        uncapped = minhash_lsh_candidates(df, "doc_id", "text").collect()
        assert len(uncapped) == 30 * 29 // 2 + 1  # quadratic blowup + 1 real pair

        capped = minhash_lsh_candidates(df, "doc_id", "text", max_bucket_size=10).collect()
        assert {(r["id_a"], r["id_b"]) for r in capped} == {(100, 101)}

        hot = lsh_hot_buckets(df, "doc_id", "text", min_bucket_size=11).collect()
        assert hot and all(r["n_docs"] == 30 for r in hot)

    def test_cap_does_not_change_small_corpus(self, spark, docs):
        from great_expectations_spark.pipeline.dedup import minhash_lsh_candidates

        a = {(r["id_a"], r["id_b"])
             for r in minhash_lsh_candidates(docs, "doc_id", "text").collect()}
        b = {(r["id_a"], r["id_b"])
             for r in minhash_lsh_candidates(
                 docs, "doc_id", "text", max_bucket_size=1000).collect()}
        assert a == b


def test_read_any_dispatches_wet_and_warc(spark, tmp_path):
    from great_expectations_spark.sources.readers import read_any
    from great_expectations_spark.sources.wet import write_wet

    df = spark.createDataFrame(
        [("http://x/1", "wet body")], "url string, text string")
    out = str(tmp_path / "seg.warc.wet")
    write_wet(df, out)
    # extension sniff: *.warc.wet* must land on the WET (conversion) reader
    got = read_any(spark, out)
    assert [(r["url"], r["text"]) for r in got.collect()] == [
        ("http://x/1", "wet body")]
    # explicit reader_method wins over sniffing
    assert read_any(spark, out, reader_method="wet").count() == 1

    warc = tmp_path / "crawl.warc"
    warc.write_bytes(
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://x/2\r\n\r\n"
        b"HTTP/1.1 200 OK\r\n\r\n<html>hi</html>\r\n\r\n")
    hot = read_any(spark, str(warc)).collect()
    assert bytes(hot[0]["html"]).decode() == "<html>hi</html>"


def test_read_jsonl_schema_and_corrupt_lines(spark, tmp_path):
    import gzip

    from great_expectations_spark.sources.readers import read_any, read_jsonl

    p = tmp_path / "docs.jsonl"
    p.write_text('{"id": 1, "text": "a"}\n'
                 'NOT JSON AT ALL\n'
                 '{"id": 2, "text": "b"}\n')
    got = read_jsonl(
        spark, str(p),
        schema="id long, text string, _corrupt_record string")
    rows = got.collect()
    assert sorted((r["id"], r["text"]) for r in rows
                  if r["_corrupt_record"] is None) == [(1, "a"), (2, "b")]
    assert sum(1 for r in rows if r["_corrupt_record"] is not None) == 1

    # r3 regression: a schema WITHOUT the capture column still surfaces
    # corrupt lines (the reader appends _corrupt_record automatically;
    # Spark would otherwise null the row silently)
    got2 = read_jsonl(spark, str(p), schema="id long, text string")
    assert "_corrupt_record" in got2.columns
    rows2 = got2.collect()
    assert sum(1 for r in rows2 if r["_corrupt_record"] is not None) == 1
    # non-PERMISSIVE modes keep the schema untouched
    got3 = read_jsonl(spark, str(p), schema="id long, text string",
                      mode="DROPMALFORMED")
    assert got3.columns == ["id", "text"] and got3.count() == 2

    # extension sniff incl. .jsonl.gz
    gz = tmp_path / "docs2.jsonl.gz"
    with gzip.open(gz, "wt") as f:
        f.write('{"id": 3}\n')
    assert read_any(spark, str(gz)).collect()[0]["id"] == 3
