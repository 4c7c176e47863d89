"""SparkSession factory with the engine's scale-oriented defaults.

AQE on (runtime re-plan + skew-join splitting), Arrow on (pandas-UDF
kernels), UTC session timezone (oracle comparability), ANSI off (the
engine's comparisons follow the reference's permissive coercion semantics;
Spark 4 defaults ANSI on, which would turn bad casts into job failures
instead of unexpected-value counts).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cores: int | str | None = None,
    app: str = "great_expectations_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    # a full master URL ("local-cluster[2,4,4096]", "spark://...") passes through
    master = cores if isinstance(cores, str) and not cores.lstrip("*").isdigit() and cores != "*" \
        else f"local[{cores}]"
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(int(cores) * 2, 4)
        except (TypeError, ValueError):
            shuffle_partitions = 32
    b = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
