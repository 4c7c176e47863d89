"""Query-metric escape hatch — arbitrary SQL over the active batch.

Reference: query_metrics/query_table.py:66-92 registers the batch as a
temp view and formats ``{active_batch}`` into user SQL; variants bind a
column (query.column), a pair, or a column list. Same surface here, on a
DataFrame instead of an engine-managed batch.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame


def run_query(df: DataFrame, query: str, tables: dict[str, DataFrame] | None = None,
              **format_kwargs: str) -> DataFrame:
    """Run ``query`` with ``{active_batch}`` bound to ``df``.

    Extra DataFrames in ``tables`` are bound as ``{<name>}``; additional
    str format kwargs (e.g. ``column="lang"``) substitute as-is —
    mirroring query.column / query.template_values variants.
    """
    spark = df.sparkSession
    view = f"ges_batch_{uuid.uuid4().hex[:12]}"
    df.createOrReplaceTempView(view)
    bindings = {"active_batch": view}
    views = [view]
    for name, frame in (tables or {}).items():
        v = f"ges_{name}_{uuid.uuid4().hex[:8]}"
        frame.createOrReplaceTempView(v)
        bindings[name] = v
        views.append(v)
    try:
        return spark.sql(query.format(**bindings, **format_kwargs))
    finally:
        # deferred cleanup is unsafe (lazy execution) — views stay for the
        # session; they are uniquely named so re-runs never collide
        pass
