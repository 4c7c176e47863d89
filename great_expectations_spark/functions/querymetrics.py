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

    NOTE on view lifetime: each call registers uniquely-named temp views
    for the batch and every ``tables`` entry, and deliberately leaves them
    registered for the Spark session. Dropping them eagerly would break the
    returned (lazy) DataFrame; re-runs never collide because every name
    embeds a fresh uuid.
    """
    spark = df.sparkSession
    view = f"ges_batch_{uuid.uuid4().hex[:12]}"
    df.createOrReplaceTempView(view)
    bindings = {"active_batch": view}
    for name, frame in (tables or {}).items():
        v = f"ges_{name}_{uuid.uuid4().hex[:8]}"
        frame.createOrReplaceTempView(v)
        bindings[name] = v
    bindings.update(format_kwargs)
    sql = query
    for name, value in bindings.items():
        sql = sql.replace("{" + name + "}", str(value))
    return spark.sql(sql)
