"""File readers: csv / tsv / parquet / delta → DataFrame.

Mirrors the reference's Spark reader surface
(execution_engine/sparkdf_execution_engine.py:427-492: reader_method
csv/tsv/parquet/delta with reader_options and an optional serialized
schema). The engine itself only ever sees DataFrames — these are the thin
boundary for users who bring file paths instead.

``schema`` accepts a StructType, a DDL string ("a int, b string"), or a
StructType.jsonValue() dict (the reference's serialized-schema convention,
sparkdf_execution_engine.py:346-361).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _resolve_schema(schema: Any) -> T.StructType | str | None:
    if schema is None or isinstance(schema, (T.StructType, str)):
        return schema
    if isinstance(schema, dict):
        return T.StructType.fromJson(schema)
    raise TypeError(f"unsupported schema spec: {type(schema).__name__}")


def read_csv(
    spark: SparkSession,
    path: str,
    header: bool = True,
    infer_schema: bool = True,
    schema: Any = None,
    sep: str = ",",
    **reader_options: Any,
) -> DataFrame:
    """CSV reader (reference reader_method="csv"). An explicit ``schema``
    disables the inference pass — at scale always pass one: inference is a
    full extra scan of the files."""
    reader = spark.read.options(header=header, sep=sep, **reader_options)
    resolved = _resolve_schema(schema)
    if resolved is not None:
        reader = reader.schema(resolved)
    elif infer_schema:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_tsv(spark: SparkSession, path: str, **kwargs: Any) -> DataFrame:
    """TSV = CSV with a tab separator (reference maps .tsv the same way)."""
    kwargs.setdefault("sep", "\t")
    return read_csv(spark, path, **kwargs)


def read_jsonl(spark: SparkSession, path: str, schema: Any = None,
               corrupt_record: bool = True,
               **reader_options: Any) -> DataFrame:
    """JSON-Lines reader (one object per line — the Dolma/web-corpus
    delivery format; ``.jsonl.gz`` parts read transparently, uncompressed
    files stay splittable). An explicit ``schema`` skips the inference
    scan — at crawl scale always pass one (e.g. ``"id string, text
    string, metadata map<string,string>"``); without it Spark reads every
    file once just to infer. Corrupt lines land in the standard
    ``_corrupt_record`` column (mode=PERMISSIVE default) instead of
    failing the job — the WET reader's length_ok philosophy: surface,
    don't crash.  With an explicit schema Spark only captures corrupt
    lines if the capture column is PART of the schema, so it is appended
    here by default — otherwise a malformed line would silently become an
    all-NULL row indistinguishable from real nulls. Pass
    ``corrupt_record=False`` to keep the caller's schema verbatim
    (strict-schema consumers: schema-equality checks, fixed-schema sinks,
    ``select *`` contracts)."""
    reader = spark.read.options(**reader_options)
    resolved = _resolve_schema(schema)
    if resolved is not None:
        if isinstance(resolved, str):
            resolved = T.StructType.fromDDL(resolved)
        # Spark reader options are case-INsensitive — honor any casing of
        # mode / columnNameOfCorruptRecord the caller used.
        lower_opts = {k.lower(): v for k, v in reader_options.items()}
        corrupt_col = lower_opts.get(
            "columnnameofcorruptrecord",
            spark.conf.get("spark.sql.columnNameOfCorruptRecord",
                           "_corrupt_record"))
        if (corrupt_record
                and str(lower_opts.get("mode", "PERMISSIVE")).upper() == "PERMISSIVE"
                and corrupt_col not in resolved.fieldNames()):
            # COPY before add: StructType.add mutates in place, and the
            # schema object belongs to the caller.
            resolved = T.StructType(list(resolved.fields)).add(
                corrupt_col, T.StringType())
        reader = reader.schema(resolved)
    return reader.json(path)


def read_parquet(spark: SparkSession, path: str, schema: Any = None,
                 **reader_options: Any) -> DataFrame:
    """An explicit ``schema`` is APPLIED (projection/validation), not
    passed through as a stringified reader option that parquet ignores."""
    reader = spark.read.options(**reader_options)
    resolved = _resolve_schema(schema)
    if resolved is not None:
        reader = reader.schema(resolved)
    if isinstance(path, (list, tuple)):  # parquet() is varargs, csv() is not
        return reader.parquet(*path)
    return reader.parquet(path)


def delta_available(spark: SparkSession) -> bool:
    """True iff the Delta Lake runtime is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.spark.sql.delta.DeltaLog")
        return True
    except Exception:
        return False


def read_delta(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    timestamp: str | None = None,
    **reader_options: Any,
) -> DataFrame:
    """Delta reader (reference reader.format("delta").load,
    sparkdf_execution_engine.py:478-486) with time travel. Degrades with a
    clear error when delta-spark is not on the classpath (this sandbox)."""
    if not delta_available(spark):
        raise RuntimeError(
            "Delta Lake runtime not on classpath; add io.delta:delta-spark to "
            "spark.jars.packages or read the table as parquet")
    reader = spark.read.format("delta").options(**reader_options)
    if version is not None:
        reader = reader.option("versionAsOf", version)
    if timestamp is not None:
        reader = reader.option("timestampAsOf", timestamp)
    return reader.load(path)


def read_any(spark: SparkSession, path: str | list[str],
             reader_method: str | None = None, **kwargs: Any) -> DataFrame:
    """Dispatch on explicit reader_method or file extension (the reference's
    path-suffix guessing, sparkdf_execution_engine.py:427-445). A LIST of
    paths goes to ONE spark.read call (csv/tsv/parquet readers take path
    lists natively — the scale path for multi-file assets); delta is
    directory-shaped and rejects lists."""
    from great_expectations_spark.sources.wet import read_warc, read_wet

    multi = isinstance(path, (list, tuple))
    method = (reader_method or "").lower()
    if not method:
        lowered = (path[0] if multi else path).lower()
        # .wet before .warc: Common Crawl WET segments are named
        # *.warc.wet.gz and must land on the conversion-record reader
        for ext, m in ((".csv", "csv"), (".tsv", "tsv"),
                       (".parquet", "parquet"), (".jsonl", "jsonl"),
                       (".ndjson", "jsonl"), (".wet", "wet"),
                       (".warc", "warc")):
            if lowered.endswith(ext) or f"{ext}." in lowered:
                method = m
                break
        else:
            raise ValueError(f"cannot guess reader_method from path {path!r}")
    dispatch = {
        "csv": read_csv,
        "tsv": read_tsv,
        "parquet": read_parquet,
        "delta": read_delta,
        "jsonl": read_jsonl,
        "json": read_jsonl,
        "wet": read_wet,
        "warc": read_warc,
    }
    if method not in dispatch:
        raise ValueError(f"unsupported reader_method {method!r}")
    if multi and method == "delta":
        raise ValueError("delta reads one table directory, not a path list")
    return dispatch[method](spark, list(path) if multi else path, **kwargs)


def table_head(df: DataFrame, n_rows: int = 5, fetch_all: bool = False) -> list[dict[str, Any]]:
    """``table.head`` metric (reference table_metrics/table_head.py:196-224
    spark branch): first ``n_rows`` rows as dicts; negative ``n_rows`` =
    all but the last ``|n|`` (one extra count job, as in the reference).
    Stays a bounded limit-collect — never a full materialization unless
    fetch_all is explicitly requested. Shallow ``asDict()`` to match the
    reference metric value exactly: nested struct columns surface as Row
    objects (not plain dicts), as in the reference's spark branch."""
    if fetch_all:
        d = df
    elif n_rows >= 0:
        d = df.limit(n_rows)
    else:
        d = df.limit(max(df.count() + n_rows, 0))
    return [row.asDict() for row in d.collect()]
