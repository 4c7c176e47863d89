"""Deterministic corpus sampling and training-mixture construction.

Training-data pipelines need reproducible sampling: the same document must
land in the same split on every run, engine, and cluster layout — so none
of this uses ``F.rand``/``df.sample`` (partition-dependent). Every operator
here is a pure Column predicate over ``u(key) ∈ [0,1)``, a uniform derived
from the md5 of the row key:

    u = (first 15 hex chars of md5(seed || '|' || key) as int) % 10^6 / 10^6

which any engine replays bit-for-bit (DuckDB:
``('0x' || substr(md5(s),1,15))::BIGINT % 1000000 / 1000000.0``). The 10^-6
granularity is deliberate — fractions are only meaningful to ~1e-6 anyway,
and the fixed modulus keeps the contract trivially portable.

Scale (10^12 docs): sampling is a predicate → pushed into the scan, zero
shuffle, zero Python. Mixture construction adds ONE small aggregation
(per-stratum sizes, bounded by strata cardinality) to derive per-stratum
keep fractions from target weights; the sample itself is again one
predicate scan. Related batch-level samplers (the reference's API) live in
``sources/samplers.py``; these are the corpus-building complements.

The reference has no mixture operators (closest: sampler hash membership,
``split_and_sample/sparkdf_data_sampler.py:163-203``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from great_expectations_spark.pipeline.dedup import _md5_int

__all__ = [
    "uniform_from_key",
    "deterministic_sample",
    "train_holdout_split",
    "stratified_sample",
    "mixture_fractions",
    "build_mixture",
    "shard_shuffle",
]

_U_MOD = 1_000_000


def uniform_from_key(key: Column, seed: int = 0) -> Column:
    """Deterministic u ∈ [0,1) from a row key (see module contract).

    NULL keys are coalesced to the empty string BEFORE hashing, so the
    hashed payload is always ``seed || '|' || key`` — DuckDB replay:
    ``md5(seed || '|' || coalesce(CAST(key AS VARCHAR), ''))``. All
    NULL-key rows share one u (kept or dropped together); give every row
    a real key (doc_id, url) for independent sampling.
    """
    return (_key_hash(key, seed) % _U_MOD) / F.lit(float(_U_MOD))


def _key_hash(key: Column, seed: int) -> Column:
    """The module's ONE portable hash: 60-bit md5 int of
    ``seed || '|' || coalesce(key, '')`` — shared by sampling and
    sharding so the engine-replayable contract lives in one place."""
    key_s = F.coalesce(key.cast("string"), F.lit(""))
    return _md5_int(F.concat_ws("|", F.lit(str(seed)), key_s))


def deterministic_sample(
    df: DataFrame, fraction: float, key_col: str, seed: int = 0
) -> DataFrame:
    """Keep each row iff u(key) < fraction — reproducible everywhere."""
    return df.where(uniform_from_key(F.col(key_col), seed) < fraction)


def train_holdout_split(
    df: DataFrame, key_col: str, holdout_fraction: float, seed: int = 0
) -> tuple[DataFrame, DataFrame]:
    """(train, holdout), disjoint and exhaustive, stable across runs: a row
    is holdout iff u(key) < holdout_fraction. Both sides are predicate
    scans — no shuffle, no materialized split table."""
    u = uniform_from_key(F.col(key_col), seed)
    return df.where(u >= holdout_fraction), df.where(u < holdout_fraction)


def _fraction_expr(strata: Column, fractions: dict, default: float) -> Column:
    expr = F.lit(float(default))
    for k, v in fractions.items():
        expr = F.when(strata == k, F.lit(float(v))).otherwise(expr)
    return expr


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    key_col: str,
    default_fraction: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep iff u(key) < fractions[s].

    ``fractions`` is a small dict (compiled to a literal CASE chain, stays
    in codegen); strata not listed keep ``default_fraction``. The per-row
    uniform is shared across strata, so changing one stratum's fraction
    never reshuffles another's sample.
    """
    keep = _fraction_expr(F.col(strata_col), fractions, default_fraction)
    return df.where(uniform_from_key(F.col(key_col), seed) < keep)


def mixture_fractions(
    df: DataFrame,
    strata_col: str,
    weights: dict,
    target: float,
    size_col: str | None = None,
    max_strata: int = 10_000,
) -> tuple[dict, list[dict]]:
    """Solve per-stratum keep fractions for a target mixture.

    ``weights`` (normalized internally) is the desired share per stratum;
    ``target`` the desired total sample size in rows (or in ``size_col``
    units, e.g. token counts). One aggregation over the listed strata
    (bounded by ``max_strata``) measures availability, then
    ``f_s = min(1, target·w_s / available_s)``.

    Returns ``(fractions, report)`` — the report has one dict per stratum
    with available/requested/fraction and ``undersupplied=True`` where the
    corpus cannot meet the requested share (fraction capped at 1).
    """
    if not weights:
        raise ValueError("weights must be a non-empty dict")
    if len(weights) > max_strata:
        raise ValueError(f"{len(weights)} strata exceeds max_strata={max_strata}")
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")
    tot_w = float(sum(weights.values()))
    if tot_w <= 0:
        raise ValueError("weights must sum to a positive value")
    size = F.sum(size_col) if size_col else F.count(F.lit(1))
    avail = {
        r["s"]: float(r["n"])
        for r in df.where(F.col(strata_col).isin(list(weights)))
        .groupBy(F.col(strata_col).alias("s"))
        .agg(size.cast("double").alias("n"))
        .collect()
    }
    fractions, report = {}, []
    for s, w in weights.items():
        req = target * (float(w) / tot_w)
        n = avail.get(s, 0.0)
        f = 1.0 if n == 0 else min(1.0, req / n)
        fractions[s] = f
        report.append({
            "stratum": s, "available": n, "requested": req,
            "fraction": f, "undersupplied": n < req,
        })
    return fractions, report


def build_mixture(
    df: DataFrame,
    strata_col: str,
    weights: dict,
    target: float,
    key_col: str,
    size_col: str | None = None,
    seed: int = 0,
) -> DataFrame:
    """Sample ``df`` down to a target mixture: ONE bounded aggregation to
    measure per-stratum availability, then one deterministic predicate
    scan. Strata outside ``weights`` are dropped. Expected (not exact)
    sample sizes — by-design for a single-pass, shuffle-free plan; at
    corpus scale the relative deviation is O(1/√(f·n)) per stratum."""
    fractions, _ = mixture_fractions(
        df, strata_col, weights, target, size_col=size_col
    )
    return stratified_sample(
        df, strata_col, fractions, key_col, default_fraction=0.0, seed=seed
    )


def shard_shuffle(
    df: DataFrame,
    key_col: str,
    *,
    shards: int,
    seed: int = 0,
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic global shuffle into ``shards`` training shards — the
    last step before tokenization (Dolma/FineWeb "shuffle and shard"):
    training order must be decorrelated from crawl/ingest order, and the
    permutation must be reproducible so a resumed or re-run job emits
    byte-identical shards.

    Adds ``shard_col`` = ``h(seed || key) % shards`` and ``pos_col`` =
    the row's 0-based position within its shard under the order of
    ``h(seed+1 || key)`` (ties broken by key) — two independent hash
    namespaces, so shard membership and within-shard order are
    uncorrelated. Same portable md5 contract as :func:`uniform_from_key`
    (DuckDB-replayable). Keys must be unique and non-NULL for a fully
    deterministic permutation (duplicate keys tie in both hashes; their
    relative order is then partition-dependent).

    Cost at 10^12 rows: exactly ONE exchange — the window's
    hash-partition on ``shard_col`` plus a per-shard sort, which is the
    same shuffle a shard writer must pay anyway. Write shards with
    ``.repartition(shards, shard_col).sortWithinPartitions(pos_col)
    .write.partitionBy(shard_col)`` — no extra exchange (AQE reuses the
    window's partitioning when the expressions match).
    """
    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")
    taken = {shard_col, pos_col, "__ord"} & set(df.columns)
    if taken:
        # silently overwriting caller data is worse than an error
        raise ValueError(
            f"shard_shuffle output columns collide with input columns "
            f"{sorted(taken)}; rename them or pass shard_col=/pos_col=")
    from pyspark.sql import Window

    shard = (_key_hash(F.col(key_col), seed) % shards).cast("int")
    order = _key_hash(F.col(key_col), seed + 1)
    w = Window.partitionBy(shard_col).orderBy(F.col("__ord"), F.col(key_col))
    return (
        df.withColumn(shard_col, shard)
        .withColumn("__ord", order)
        .withColumn(pos_col, (F.row_number().over(w) - 1).cast("long"))
        .drop("__ord")
    )
