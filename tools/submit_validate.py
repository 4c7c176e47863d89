"""Cluster entry point: checkpointed suite validation via spark-submit.

    spark-submit --py-files dist/great_expectations_spark.zip \
        tools/submit_validate.py \
        --table <iceberg table | parquet path> \
        --suite suite.json \
        --results <iceberg results table | parquet path> \
        --run-id <stable id for resume> \
        [--split hashed_column:<col>:<n> | column_value:<col> | date_part:<part>:<col>:v1,v2,...] \
        [--result-format BOOLEAN_ONLY|BASIC|SUMMARY|COMPLETE] \
        [--max-concurrency N]

The suite JSON is the engine's serialized ExpectationSuite:
    {"name": "...", "expectations": [{"expectation_type": "...", "kwargs": {...}}, ...]}

Re-submitting with the same --run-id resumes: chunks already present in
the results table are skipped (checkpoint.run_checkpoint).
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_split(spec: str, df):
    from great_expectations_spark.checkpoint import Splitter

    parts = spec.split(":")
    kind = parts[0]
    if kind == "hashed_column":
        return Splitter.hashed_column(parts[1], int(parts[2]))
    if kind == "column_value":
        return Splitter.column_value(df, parts[1])
    if kind == "date_part":
        return Splitter.date_part(parts[2], parts[1], [int(v) for v in parts[3].split(",")])
    raise SystemExit(f"unknown splitter spec: {spec}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True)
    ap.add_argument("--suite", required=True)
    ap.add_argument("--results", required=True)
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--split", default="hashed_column:url:256")
    ap.add_argument("--result-format", default="BOOLEAN_ONLY")
    ap.add_argument("--snapshot-id", type=int, default=None)
    ap.add_argument("--max-concurrency", type=int, default=1,
                    help="validate this many chunks at once (driver threads)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from great_expectations_spark import ExpectationSuite
    from great_expectations_spark.checkpoint import run_checkpoint
    from great_expectations_spark.sources.iceberg import read_table

    # engine-required SQL confs (session.get_spark's semantics, minus the
    # master — that comes from spark-submit): ANSI off because the engine's
    # comparisons follow the reference's permissive coercion (Spark 4
    # defaults ANSI on, turning bad casts into job failures instead of
    # unexpected-value counts), UTC for stable timestamp metrics, Arrow for
    # the pandas-UDF kernels. Cluster sizing/perf confs stay spark-submit
    # flags (see tools/make_submit_pkg.py's launch recipe).
    spark = (
        SparkSession.builder.appName(f"ges-validate-{args.run_id}")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )

    with open(args.suite) as f:
        spec = json.load(f)
    suite = ExpectationSuite(name=spec.get("name", "suite"))
    for e in spec["expectations"]:
        suite.add(e["expectation_type"], **e.get("kwargs", {}))

    df = read_table(spark, args.table, snapshot_id=args.snapshot_id)
    splitter = parse_split(args.split, df)

    res = run_checkpoint(
        df, suite, splitter, args.results, args.run_id,
        result_format=args.result_format,
        max_concurrency=args.max_concurrency,
        on_chunk=lambda cid, wall: print(f"chunk {cid}: {wall:.1f}s", file=sys.stderr),
    )
    print(json.dumps({
        "run_id": res.run_id,
        "completed": len(res.completed_chunks),
        "resumed_skips": len(res.skipped_chunks),
    }))
    res.rollup().show(100, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
