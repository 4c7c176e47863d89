"""N vs 4N scaling evidence for the north rule.

A real cluster is unavailable in this sandbox, so the two-cluster-size
criterion is evidenced the sanctioned way: the SAME fused validation job
runs at two local parallelism levels on the SAME input, each in a fresh
JVM (subprocess); we report throughput at both plus scaling efficiency
= (rows/s at 4N) / (4 * rows/s at N).

IMPORTANT measurement caveat, quantified rather than hidden: this VM's 32
vCPUs do not deliver 4x aggregate compute from 8->32 busy threads even for
a trivially-parallel whole-stage-codegen job (host-level contention). The
harness therefore also measures that *hardware ceiling* with a pure
integer-hash aggregation, and reports the engine's efficiency alongside
it for two N->4N pairs: (2,8) where the host scales cleanly, and (8,32)
where the ceiling itself is ~0.6. On a real multi-executor cluster each
executor brings its own cores/memory bandwidth, so the (2,8) pair is the
faithful proxy for N->4N executor scaling.

Usage:
    python tools/bench_scaling.py                  # full matrix, prints JSON
    python tools/bench_scaling.py --worker 8 engine|calib   # internal
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N_ROWS = 12_000_000
MAX_TOKENS = 60  # short docs: rows fit in memory, regex cost still real
PARTITIONS = 128  # identical data layout at every parallelism level
REPS = 2
CALIB_ROWS = 4_000_000_000


def _engine_run(cores: int) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from great_expectations_spark import ExpectationSuite, validate
    from great_expectations_spark.sources.session import get_spark
    from great_expectations_spark.sources.webpages import webpages
    from pyspark.sql import functions as F

    spark = get_spark(cores=cores, app=f"scaling-{cores}",
                      shuffle_partitions=max(cores * 2, 8))
    pages = webpages(spark, N_ROWS, partitions=PARTITIONS, max_tokens=MAX_TOKENS).persist()
    pages.count()  # materialize outside the timed region
    df = pages.withColumn("warc_ts_epoch", F.unix_timestamp("warc_ts").cast("double"))

    suite = (
        ExpectationSuite(name="scaling")
        .add("expect_table_row_count_to_be_between", min_value=1)
        .add("expect_column_values_to_not_be_null", column="url")
        .add("expect_column_values_to_match_regex",
             column="url", regex=r"^https://d\d+\.example/")
        .add("expect_column_values_to_not_be_null", column="text", mostly=0.9)
        .add("expect_column_values_to_be_in_set",
             column="lang",
             value_set=["en", "de", "fr", "es", "zh", "ru", "ja", "pt"], mostly=0.99)
        .add("expect_column_value_lengths_to_be_between",
             column="text", min_value=1, max_value=10_000_000, mostly=0.9)
        .add("expect_column_unique_value_count_to_be_between",
             column="lang", min_value=1, max_value=100)
        .add("expect_column_mean_to_be_between", column="warc_ts_epoch", min_value=0)
        .add("expect_column_quantile_values_to_be_between",
             column="warc_ts_epoch",
             quantile_ranges={"quantiles": [0.25, 0.5, 0.75],
                              "value_ranges": [[0, 4e9]] * 3})
        .add("expect_column_values_to_match_regex", column="lang", regex="^[a-z]{2}$",
             mostly=0.99)
    )
    best = float("inf")
    for _ in range(REPS):
        t0 = time.time()
        res = validate(df, suite, result_format="BOOLEAN_ONLY")
        best = min(best, time.time() - t0)
        assert len(res.results) == 10
    spark.stop()
    return {"cores": cores, "rows": N_ROWS, "best_sec": round(best, 4),
            "rows_per_sec": round(N_ROWS / best, 2)}


def _calib_run(cores: int) -> dict:
    """Hardware ceiling probe: embarrassingly-parallel codegen aggregation."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from great_expectations_spark.sources.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(cores=cores, app=f"calib-{cores}",
                      shuffle_partitions=max(cores * 2, 8))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.time()
        spark.range(0, CALIB_ROWS, 1, 256).select(
            F.sum(F.xxhash64("id") % 1000).alias("s"),
            F.sum(F.xxhash64("id", F.lit(1)) % 7).alias("t"),
        ).first()
        best = min(best, time.time() - t0)
    spark.stop()
    return {"cores": cores, "rows": CALIB_ROWS, "best_sec": round(best, 4),
            "rows_per_sec": round(CALIB_ROWS / best, 2)}


def _spawn(cores: int, kind: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM="24g")
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker", str(cores), kind],
        capture_output=True, text=True, timeout=900, env=env,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    report: dict = {
        "workload": "10-expectation fused suite over 12M-row web-page table",
        "pairs": {},
    }
    runs: dict = {}
    for cores in (2, 8, 32):
        runs[cores] = {"engine": _spawn(cores, "engine")}
    for cores in (2, 8, 32):
        runs[cores]["calib"] = _spawn(cores, "calib")

    for n, n4 in ((2, 8), (8, 32)):
        e_n, e_4n = runs[n]["engine"], runs[n4]["engine"]
        c_n, c_4n = runs[n]["calib"], runs[n4]["calib"]
        eng_eff = round(e_4n["rows_per_sec"] / (4 * e_n["rows_per_sec"]), 4)
        hw_eff = round(c_4n["rows_per_sec"] / (4 * c_n["rows_per_sec"]), 4)
        report["pairs"][f"{n}->{n4}"] = {
            "engine_N": e_n, "engine_4N": e_4n,
            "engine_scaling_efficiency": eng_eff,
            "hardware_ceiling_efficiency": hw_eff,
            "engine_vs_ceiling": round(min(eng_eff / hw_eff, 1.5), 4) if hw_eff else None,
        }
    report["meets_north_rule_0.8"] = (
        report["pairs"]["2->8"]["engine_scaling_efficiency"] >= 0.8
    )
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    if len(sys.argv) > 3 and sys.argv[1] == "--worker":
        kind = sys.argv[3]
        fn = _engine_run if kind == "engine" else _calib_run
        print(json.dumps(fn(int(sys.argv[2]))))
    else:
        main()
