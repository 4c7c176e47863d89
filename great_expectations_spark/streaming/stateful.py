"""Custom stateful streaming operator: cumulative per-key condition rates
across micro-batches via ``applyInPandasWithState``.

Unlike ``windowed_condition_rates`` (per-window, watermark-bounded state),
this keeps RUNNING totals per key for the lifetime of the stream — the
"overall null-rate per language so far" style monitor. State is a single
(count, pass) pair per key: O(keys) memory, commutative updates, exactly
the shape GroupState is built for.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("passed", LongType())]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("n_total", LongType()),
        StructField("n_passed", LongType()),
        StructField("pass_rate", DoubleType()),
    ]
)


def cumulative_condition_rate(
    stream_df: DataFrame,
    key_col: str,
    flag_col: str,
) -> DataFrame:
    """Streaming DataFrame of cumulative pass rates per key.

    ``flag_col`` must be a boolean column (precompute the condition with
    native Columns — only the tiny (key, flag) projection reaches Python).
    Emits one updated row per key per micro-batch that touched the key.

        flagged = pages.withColumn("ok", F.col("text").isNotNull())
        rates = cumulative_condition_rate(flagged, "lang", "ok")
        rates.writeStream.outputMode("update")...
    """

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, passed = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            passed += int(pdf[flag_col].fillna(False).astype(bool).sum())
        state.update((n, passed))
        yield pd.DataFrame(
            [
                {
                    # NULL keys stay NULL — str() would alias them with a
                    # literal 'None' value in the keyed column
                    "key": None if key[0] is None else str(key[0]),
                    "n_total": n,
                    "n_passed": passed,
                    "pass_rate": (passed / n) if n else 0.0,
                }
            ]
        )

    return (
        stream_df.select(key_col, flag_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
