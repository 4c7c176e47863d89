"""WARC/WET reader/writer: byte-exact round-trips, spec parsing of
hand-written files, framing-record filtering, gzip, audit columns."""

import pytest

from great_expectations_spark.sources.wet import read_wet, write_wet


def _roundtrip(spark, tmp_path, rows, **write_kw):
    df = spark.createDataFrame(rows, "url string, text string")
    out = str(tmp_path / "wet")
    write_wet(df, out, **write_kw)
    return read_wet(spark, out)


def test_roundtrip_multiline_and_unicode(spark, tmp_path):
    rows = [
        ("http://a.example/1", "plain one-liner"),
        ("http://a.example/2", "two\nlines with trailing\n"),
        ("http://a.example/3", "héllo wörld 中文"),
        ("http://a.example/4", "crlf\r\ninside"),
    ]
    got = _roundtrip(spark, tmp_path, rows)
    assert sorted((r["url"], r["text"]) for r in got.collect()) == sorted(rows)
    assert all(r["length_ok"] for r in got.collect())
    assert all(r["record_type"] == "conversion" for r in got.collect())


def test_roundtrip_many_records_many_partitions(spark, tmp_path):
    rows = [(f"http://h{i % 7}.example/p{i}", f"doc {i}\nbody {i * 3}")
            for i in range(200)]
    got = _roundtrip(spark, tmp_path, rows, partitions=5)
    assert sorted((r["url"], r["text"]) for r in got.collect()) == sorted(rows)


def test_roundtrip_gzip(spark, tmp_path):
    rows = [(f"http://g.example/{i}", f"zipped {i}") for i in range(30)]
    got = _roundtrip(spark, tmp_path, rows, compression="gzip")
    assert sorted((r["url"], r["text"]) for r in got.collect()) == sorted(rows)


def test_writer_skips_null_url_or_text_and_stamps_date(spark, tmp_path):
    df = spark.createDataFrame(
        [("http://x/1", "keep"), (None, "no url"), ("http://x/2", None)],
        "url string, text string")
    out = str(tmp_path / "wet")
    write_wet(df, out, date="2023-06-15T12:00:00Z")
    got = read_wet(spark, out).collect()
    assert [(r["url"], r["text"]) for r in got] == [("http://x/1", "keep")]
    assert str(got[0]["warc_ts"]) == "2023-06-15 12:00:00"


def test_hand_written_file_parses_per_spec(spark, tmp_path):
    # not produced by our writer: warcinfo framing record first, ragged
    # header whitespace, a record with a WRONG Content-Length
    body1 = "Hello\nWET world"
    rec = (
        "WARC/1.0\r\n"
        "WARC-Type: warcinfo\r\n"
        "Content-Length: 9\r\n"
        "\r\n"
        "info text\r\n\r\n"
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        "WARC-Target-URI:   http://spec.example/a\r\n"
        "WARC-Date: 2024-03-04T05:06:07Z\r\n"
        f"Content-Length: {len(body1.encode())}\r\n"
        "\r\n"
        f"{body1}\r\n\r\n"
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        "WARC-Target-URI: http://spec.example/b\r\n"
        "Content-Length: 999\r\n"
        "\r\n"
        "short\r\n\r\n"
    )
    p = tmp_path / "hand.warc.wet"
    p.write_bytes(rec.encode())

    got = {r["url"]: r for r in read_wet(spark, str(p)).collect()}
    assert set(got) == {"http://spec.example/a", "http://spec.example/b"}
    a = got["http://spec.example/a"]
    assert a["text"] == body1 and a["length_ok"] is True
    assert a["content_length"] == len(body1.encode())
    assert str(a["warc_ts"]) == "2024-03-04 05:06:07"
    b = got["http://spec.example/b"]
    assert b["text"] == "short" and b["length_ok"] is False

    # record_types=None keeps the framing record too
    all_recs = read_wet(spark, str(p), record_types=None).collect()
    assert {r["record_type"] for r in all_recs} == {"warcinfo", "conversion"}
    info = [r for r in all_recs if r["record_type"] == "warcinfo"][0]
    assert info["text"] == "info text" and info["url"] is None


def test_missing_headers_are_null(spark, tmp_path):
    p = tmp_path / "min.wet"
    p.write_bytes(b"WARC/1.0\r\nWARC-Type: conversion\r\n\r\npayload\r\n\r\n")
    r = read_wet(spark, str(p)).collect()[0]
    assert r["url"] is None and r["warc_ts"] is None
    assert r["content_length"] is None and r["length_ok"] is None
    assert r["text"] == "payload"


def test_write_mode_error_and_overwrite(spark, tmp_path):
    df = spark.createDataFrame([("http://x/1", "v1")], "url string, text string")
    out = str(tmp_path / "wet")
    write_wet(df, out)
    with pytest.raises(Exception):
        write_wet(df, out)  # default mode=error refuses to clobber
    df2 = spark.createDataFrame([("http://x/1", "v2")], "url string, text string")
    write_wet(df2, out, mode="overwrite")
    assert [r["text"] for r in read_wet(spark, out).collect()] == ["v2"]


def test_wet_pages_north_rule_shape(spark, tmp_path):
    rows = [("http://en.example/1", "the of and to a page in english"),
            ("http://de.example/2", "der die und das ist hier")]
    df = spark.createDataFrame(rows, "url string, text string")
    out = str(tmp_path / "wet")
    write_wet(df, out)

    from great_expectations_spark.sources.wet import wet_pages
    pages = wet_pages(spark, out)
    assert pages.columns == ["url", "warc_ts", "html", "text", "lang"]
    assert dict(pages.dtypes)["html"] == "binary"
    got = {r["url"]: r for r in pages.collect()}
    assert got["http://en.example/1"]["lang"] == "en"
    assert got["http://de.example/2"]["lang"] == "de"
    assert all(r["html"] is None for r in got.values())
    # and the suite surface applies unchanged
    from great_expectations_spark import ExpectationSuite, validate
    res = validate(
        pages,
        ExpectationSuite("wet").add(
            "expect_column_values_to_not_be_null", column="url"),
        result_format="BOOLEAN_ONLY")
    assert res.success


def test_read_warc_response_records(spark, tmp_path):
    from great_expectations_spark.sources.wet import read_warc

    html = "<html><body>Héllo\n<b>page</b></body></html>"
    http = ("HTTP/1.1 200 OK\r\n"
            "Content-Type: text/html; charset=utf-8\r\n"
            "\r\n"
            f"{html}")
    trunc = "HTTP/1.1 301"  # truncated capture: no header/body blank line
    rec = (
        "WARC/1.0\r\n"
        "WARC-Type: warcinfo\r\n"
        "\r\n"
        "crawl info\r\n\r\n"
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        "WARC-Target-URI: http://warc.example/ok\r\n"
        "WARC-Date: 2024-05-06T07:08:09Z\r\n"
        f"Content-Length: {len(http.encode())}\r\n"
        "\r\n"
        f"{http}\r\n\r\n"
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        "WARC-Target-URI: http://warc.example/trunc\r\n"
        f"Content-Length: {len(trunc.encode())}\r\n"
        "\r\n"
        f"{trunc}\r\n\r\n"
    )
    p = tmp_path / "crawl.warc"
    p.write_bytes(rec.encode())

    got = {r["url"]: r for r in read_warc(spark, str(p)).collect()}
    assert set(got) == {"http://warc.example/ok", "http://warc.example/trunc"}
    ok = got["http://warc.example/ok"]
    assert ok["http_status"] == 200 and ok["length_ok"] is True
    assert bytes(ok["html"]).decode() == html
    assert str(ok["warc_ts"]) == "2024-05-06 07:08:09"
    t = got["http://warc.example/trunc"]
    assert t["html"] is None and t["http_status"] == 301


def test_stream_wet_availablenow_matches_batch(spark, tmp_path):
    from great_expectations_spark.sources.wet import stream_wet

    rows = [(f"http://s.example/{i}", f"streamed {i}\nbody") for i in range(20)]
    df = spark.createDataFrame(rows, "url string, text string")
    src = str(tmp_path / "wet")
    write_wet(df, src, partitions=3)

    out = str(tmp_path / "sink")
    cp = str(tmp_path / "cp")
    q = (stream_wet(spark, src, max_files_per_trigger=1)
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", cp)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert sorted((r["url"], r["text"]) for r in got.collect()) == sorted(rows)
    assert got.columns == ["url", "warc_ts", "record_type",
                           "content_length", "length_ok", "text"]


def test_warc_1_1_files_parse(spark, tmp_path):
    # ISO 28500:2017 version line + lower-cased header names must parse
    p = tmp_path / "v11.wet"
    p.write_bytes(
        b"WARC/1.1\r\n"
        b"warc-type: conversion\r\n"
        b"warc-target-uri: http://v11.example/a\r\n"
        b"content-length: 5\r\n"
        b"\r\n"
        b"first\r\n\r\n"
        b"WARC/1.1\r\n"
        b"WARC-Type: conversion\r\n"
        b"WARC-Target-URI: http://v11.example/b\r\n"
        b"Content-Length: 6\r\n"
        b"\r\n"
        b"second\r\n\r\n")
    got = {r["url"]: r for r in read_wet(spark, str(p)).collect()}
    assert set(got) == {"http://v11.example/a", "http://v11.example/b"}
    assert got["http://v11.example/a"]["text"] == "first"
    assert got["http://v11.example/b"]["text"] == "second"
    assert all(r["length_ok"] for r in got.values())


def test_final_record_payload_ending_in_separator_survives(spark, tmp_path):
    # Content-Length arbitration: a final record whose payload
    # legitimately ends with CRLF CRLF must NOT be trimmed
    body = "tail\r\n\r\n"
    p = tmp_path / "tail.wet"
    p.write_bytes((
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        "WARC-Target-URI: http://t.example/a\r\n"
        f"Content-Length: {len(body.encode())}\r\n"
        "\r\n"
        f"{body}\r\n\r\n").encode())
    r = read_wet(spark, str(p)).collect()[0]
    assert r["text"] == body and r["length_ok"] is True


def test_writer_skips_whitespace_urls(spark, tmp_path):
    df = spark.createDataFrame(
        [("http://x/ok", "keep"),
         ("http://x/a b", "space"),
         ("http://x/a\r\nContent-Length: 0\r\n", "inject")],
        "url string, text string")
    out = str(tmp_path / "wet")
    write_wet(df, out)
    got = read_wet(spark, out).collect()
    assert [(r["url"], r["text"]) for r in got] == [("http://x/ok", "keep")]
