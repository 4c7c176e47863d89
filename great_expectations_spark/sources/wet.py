"""WARC/WET file ingestion — the Common Crawl plain-text archive format.

Common Crawl distributes extracted page text as WET files: WARC-framed
records (``WARC/1.0`` + header lines + blank line + payload, records
separated by CRLF CRLF) whose payload is the page's plain text. The
north-star table (url, warc_ts, text, ...) is exactly one ``read_wet``
away from these files; the reference engine has no archive-format reader
at all (its closest is the file-path data connectors under
great_expectations/datasource/data_connector/), so this belongs to the
web-scale ingestion surface alongside `sources/webpages.py`.

Spark-first design — no Python in the data path:

* **Record splitting is the Hadoop line reader with a custom
  delimiter**: ``spark.read.option("lineSep", CRLF CRLF + "WARC/1.0" +
  CRLF).text(path)`` streams records without ever buffering a file, and
  uncompressed inputs stay SPLITTABLE (the delimiter scan is the same
  machinery as newline splitting). ``.wet.gz`` segments read
  transparently (one split per file — Common Crawl ships thousands of
  ~150 MB segments precisely so file-level parallelism is enough).
* **Header parsing is whole-stage-codegen built-ins** (`substring_index`,
  `regexp_extract`, `try_to_timestamp`) — zero UDFs, zero Arrow.
* The inter-record separator is CONSUMED by the delimiter
  (``\\r\\n\\r\\nWARC/`` — version-agnostic, so WARC/1.0 and WARC/1.1
  files both split), so payloads come out exact; only the file's final
  record keeps its trailing CRLF CRLF, trimmed under the header's own
  Content-Length arbitration (a payload whose byte count already
  matches is never trimmed). A payload that itself contains the
  separator sequence (``\\r\\n\\r\\nWARC/``) cannot be recovered by any
  delimiter scan — such mis-splits are surfaced, not hidden:
  ``length_ok`` compares the header's Content-Length against the parsed
  payload's UTF-8 byte count, so corrupted or mis-split records are a
  ``WHERE NOT length_ok`` audit away.

``write_wet`` is the deterministic inverse (fixed header order, byte
Content-Length, stable record ids) — it exists so tests and benches can
round-trip a corpus through real files; its output is spec-shaped enough
for any WET consumer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_warc", "read_wet", "stream_wet", "wet_pages", "write_wet"]

_CRLF = "\r\n"
_SEP = _CRLF * 2
# one record per row: the separator + the next record's version-line
# prefix. Version-AGNOSTIC ("WARC/" without the number) so WARC/1.0 and
# WARC/1.1 (ISO 28500:2017) files both split; the remnant version digits
# are stripped per record.
_DELIM = _SEP + "WARC/"


def _hdr_field(hdr, name: str):
    # (?i): WARC field names are case-insensitive (ISO 28500 §5)
    out = F.regexp_extract(hdr, rf"(?mi)^{name}:[ \t]*(\S+)", 1)
    return F.when(out != "", out)


def read_wet(
    spark: SparkSession,
    path: str,
    *,
    record_types: tuple[str, ...] | None = ("conversion",),
) -> DataFrame:
    """Read WET/WARC files → ``(url, warc_ts, record_type,
    content_length, length_ok, text)``.

    ``record_types`` filters on the WARC-Type header (WET payload records
    are ``conversion``; ``warcinfo`` / ``metadata`` framing records are
    dropped by default) — pass ``None`` to keep every record. Missing
    headers surface as NULL; ``length_ok`` is NULL when the record has no
    Content-Length header.
    """
    raw = spark.read.option("lineSep", _DELIM).text(path)
    return _parse_records(raw, record_types)


def _parse_records(
    raw: DataFrame, record_types: tuple[str, ...] | None
) -> DataFrame:
    """Shared parse plan of the batch and streaming readers: delimiter-
    split rows of ``value`` → typed record columns."""
    rec = (
        raw
        # the delimiter consumed "WARC/" but not the version digits; the
        # file's FIRST record keeps the full version line — strip both
        # shapes so all records parse alike
        .select(F.regexp_replace("value", r"\A(WARC/)?\d+\.\d+\r\n", "")
                .alias("rec"))
        .where(F.length(F.trim(F.col("rec"))) > 0)
    )
    hdr = F.substring_index(F.col("rec"), _SEP, 1)
    # everything after the first blank line
    raw_payload = F.substring(
        F.col("rec"), F.length(hdr) + F.lit(5), F.length(F.col("rec")))
    clen = _hdr_field(hdr, "Content-Length").cast("long")
    raw_bytes = F.length(F.encode(raw_payload, "UTF-8"))
    stripped = F.regexp_replace(raw_payload, r"\r\n\r\n\Z", "")
    # only the file's FINAL record retains its trailing record separator
    # (every other one is consumed by the delimiter). Use the header's
    # own Content-Length to decide: if the raw bytes already match, the
    # payload legitimately ends with CRLF CRLF and must NOT be trimmed;
    # if they match + 4, the surplus IS the separator. No usable
    # Content-Length → strip-if-present (the overwhelmingly common
    # shape; a spec-legal payload ending in CRLF CRLF with no
    # Content-Length is then trimmed and unrecoverable — surfaced
    # as length_ok NULL, not hidden).
    payload = F.when(clen.isNotNull() & (raw_bytes == clen), raw_payload) \
        .otherwise(stripped)
    out = rec.select(
        _hdr_field(hdr, "WARC-Target-URI").alias("url"),
        F.try_to_timestamp(_hdr_field(hdr, "WARC-Date")).alias("warc_ts"),
        _hdr_field(hdr, "WARC-Type").alias("record_type"),
        clen.alias("content_length"),
        (clen == F.length(F.encode(payload, "UTF-8"))).alias("length_ok"),
        payload.alias("text"),
    )
    if record_types is not None:
        out = out.where(F.col("record_type").isin(list(record_types)))
    return out


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read full WARC crawl archives (``response`` records: HTTP message
    as payload) → ``(url, warc_ts, content_length, length_ok,
    http_status, html)``.

    Same record framing and audit as :func:`read_wet`; on top of it the
    HTTP message splits into status line + headers (dropped, bar the
    parsed status code) and body, which lands in ``html`` as UTF-8 bytes
    — the north-rule table's raw-capture column. Records whose payload
    has no HTTP header/body blank line yield NULL html (truncated
    captures), NOT a mis-parse crash."""
    rec = read_wet(spark, path, record_types=("response",))
    msg = F.col("text")
    status = F.regexp_extract(msg, r"\AHTTP/\d\.\d (\d{3})", 1)
    hdr_end = F.instr(msg, _SEP)  # 1-based; 0 = no blank line at all
    body = F.when(
        hdr_end > 0,
        F.substring(msg, hdr_end + F.lit(4), F.length(msg)))
    return rec.select(
        "url", "warc_ts", "content_length", "length_ok",
        F.when(status != "", status).cast("int").alias("http_status"),
        F.encode(body, "UTF-8").alias("html"),
    )


def write_wet(
    df: DataFrame,
    path: str,
    url_col: str = "url",
    text_col: str = "text",
    *,
    date: str = "2024-01-01T00:00:00Z",
    mode: str = "error",
    compression: str | None = None,
    partitions: int | None = None,
) -> None:
    """Serialize ``(url, text)`` rows as WET ``conversion`` records.

    Deterministic: fixed header order, constant ``date`` (or a per-row
    timestamp column of that name if one exists in ``df``), record id =
    md5 of (url, payload). Content-Length is the payload's UTF-8 byte
    count, as the spec requires. Rows with NULL url or text are skipped
    (a conversion record without a target or a payload is meaningless),
    as are rows whose url contains whitespace — a URI is whitespace-free
    by definition, and writing one would truncate silently on re-read
    (embedded CR/LF would even inject forged headers); count skips with
    a ``WHERE url RLIKE '\\\\s'`` audit before writing.
    ``compression="gzip"`` writes ``.gz`` part files that ``read_wet``
    consumes transparently.
    """
    if date in df.columns:
        ts = F.date_format(F.col(date), "yyyy-MM-dd'T'HH:mm:ss'Z'")
    else:
        ts = F.lit(date)
    url = F.col(url_col)
    payload = F.col(text_col)
    rec = F.concat(
        F.lit("WARC/1.0" + _CRLF),
        F.lit("WARC-Type: conversion" + _CRLF),
        F.lit("WARC-Target-URI: "), url, F.lit(_CRLF),
        F.lit("WARC-Date: "), ts, F.lit(_CRLF),
        F.lit("WARC-Record-ID: <urn:md5:"),
        F.md5(F.encode(F.concat_ws("\n", url, payload), "UTF-8")),
        F.lit(">" + _CRLF),
        F.lit("Content-Type: text/plain" + _CRLF),
        F.lit("Content-Length: "),
        F.length(F.encode(payload, "UTF-8")).cast("string"),
        F.lit(_SEP),
        payload,
    )
    out = (
        df.where(url.isNotNull() & payload.isNotNull()
                 & ~url.rlike(r"\s"))
        .select(rec.alias("value"))
    )
    if partitions is not None:
        out = out.repartition(partitions)
    writer = out.write.mode(mode).option("lineSep", _SEP)
    if compression:
        writer = writer.option("compression", compression)
    writer.text(path)


def wet_pages(
    spark: SparkSession,
    path: str,
    *,
    guess_lang: bool = True,
) -> DataFrame:
    """WET files → the engine's web-page table shape ``(url, warc_ts,
    html, text, lang)`` — Common Crawl straight into the validation /
    pipeline surface (same schema as `sources/webpages.py`, so every
    suite and pipeline operator applies unchanged).

    WET carries extracted text only, so ``html`` is a NULL binary column;
    ``lang`` comes from the in-plan marker heuristic
    (`pipeline/textstats.lang_id_guess`, codegen — or NULL with
    ``guess_lang=False`` when a real classifier runs downstream). Only
    records whose Content-Length audit passes survive — mis-framed
    records must not enter the corpus silently; count them from
    :func:`read_wet` directly."""
    from great_expectations_spark.pipeline.textstats import lang_id_guess

    rec = read_wet(spark, path).where(F.col("length_ok"))
    lang = (lang_id_guess(F.col("text")) if guess_lang
            else F.lit(None).cast("string"))
    return rec.select(
        "url", "warc_ts",
        F.lit(None).cast("binary").alias("html"),
        "text", lang.alias("lang"),
    )


def stream_wet(
    spark: SparkSession,
    path: str,
    *,
    record_types: tuple[str, ...] | None = ("conversion",),
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Structured-Streaming twin of :func:`read_wet`: watch a directory
    for arriving WET segments (the Common Crawl delivery unit) and emit
    parsed records per micro-batch — feed straight into
    `streaming/validate_stream.py` or `streaming/dedup_stream.py`.

    Identical schema and parse plan to the batch reader (the text file
    source takes the same custom ``lineSep``); each segment file is
    processed exactly once by the file-source log, so a long-running
    ingest survives restarts without re-parsing old segments."""
    reader = spark.readStream.option("lineSep", _DELIM)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    raw = reader.text(path)
    return _parse_records(raw, record_types)
