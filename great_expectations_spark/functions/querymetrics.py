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

    Only KNOWN placeholders are substituted (targeted ``str.replace``, not
    ``str.format``) so literal braces in user SQL — map literals,
    ``json_extract`` paths, regex quantifiers — pass through untouched.

    View lifetime: the uniquely-named temp views exist only for the
    duration of this call. ``spark.sql`` analyzes eagerly — the returned
    DataFrame's plan has already resolved the views into the underlying
    frames — so dropping them immediately is safe (verified: collect
    after drop succeeds) and keeps the session catalog clean across
    sweep-style callers. Names embed a fresh uuid so concurrent calls
    never collide.
    """
    spark = df.sparkSession
    view = f"ges_batch_{uuid.uuid4().hex[:12]}"
    df.createOrReplaceTempView(view)
    bindings = {"active_batch": view}
    registered = [view]
    for name, frame in (tables or {}).items():
        v = f"ges_{name}_{uuid.uuid4().hex[:8]}"
        frame.createOrReplaceTempView(v)
        bindings[name] = v
        registered.append(v)
    bindings.update(format_kwargs)
    sql = query
    for name, value in bindings.items():
        sql = sql.replace("{" + name + "}", str(value))
    try:
        return spark.sql(sql)
    finally:
        for v in registered:
            spark.catalog.dropTempView(v)
