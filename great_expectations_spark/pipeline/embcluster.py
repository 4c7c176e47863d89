"""Embedding-space clustering (distributed Lloyd's k-means) and semantic
deduplication (SemDeDup).

``kmeans_fit`` runs Lloyd's algorithm over an ``array<float>`` embedding
column with ONE DataFrame scan per iteration:

* E-step — nearest-centroid assignment as unrolled multiply-add codegen
  against the current centroids as plan literals (``ivf_assign``). The
  codebook is k·dims doubles: it always fits on the driver and ships to
  executors as plan constants, never as a shuffle.
* M-step — ``groupBy(cluster).agg(dims scalar avgs)``: map-side
  combinable, so at 10^12 rows each map partition contributes k rows of
  partials to the shuffle, not 10^12 rows (no ``explode`` — an exploded
  M-step would shuffle rows × dims).

The trajectory is deterministic and engine-replayable: init = md5 seed
buckets (``ivf_centroids``), assignment similarity rounded to 6 decimals
with ties broken toward the smallest cluster id, empty clusters keep
their previous centroid. A DuckDB oracle can therefore unroll the exact
same iterations as chained CTEs (see ``__spark_entry__._kmeans_oracle``).

``semantic_dedup`` implements SemDeDup (Abbas et al., 2023,
arXiv:2303.09540): cluster the embedding space, emit within-cluster
pairs whose cosine exceeds a threshold, and keep one exemplar per
transitively-connected group. The quadratic pairing term is confined to
single clusters and bounded by ``max_cluster_size`` (same degenerate-
bucket policy as the MinHash-LSH hot-bucket cap); transitive closure
reuses ``connected_components`` so A~B, B~C collapse to ONE keeper even
when A~C was never emitted as a pair.

The reference repo has no embedding operators (nearest notion:
``expectations/core/expect_column_values_to_be_unique.py``); this module
is part of the training-data-pipeline extension surface, like
``pipeline/dedup.py`` and ``pipeline/similarity.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from great_expectations_spark.pipeline._lineage import fused_checkpoint

from great_expectations_spark.pipeline.similarity import (
    cosine_sim,
    ivf_assign,
    ivf_centroids,
)

Centroids = list[tuple[int, list[float]]]

# expression-unrolled assignment is compiled per DISTINCT codebook (each
# Lloyd iteration changes the literals → fresh codegen); past this many
# k·dims terms the Arrow kernel beats recompilation
_EXPR_ASSIGN_MAX_TERMS = 256


def _assign_struct_udf(centroids: Centroids):
    """Arrow-batched nearest-centroid kernel: embedding →
    ``struct<c:int, s:double>`` (cluster id + round-6 own-centroid cosine).

    One BLAS matmul per Arrow batch against the k×dims codebook; ties on
    the round-6 similarity break toward the smallest cluster id exactly
    like the unrolled-expression path (``np.argmax`` returns the FIRST
    max and the codebook rows are sorted by cluster id), so the two
    methods are interchangeable and both replay in DuckDB.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.array([w for _, w in centroids], dtype=np.float64)
    cn = np.sqrt((C * C).sum(axis=1))
    cn[cn == 0.0] = 1.0
    cids = np.array([cid for cid, _ in centroids], dtype=np.int32)

    # no type hints: scalar pandas UDF returning a DataFrame for the
    # struct type (string-ized hints under `from __future__ import
    # annotations` break pyspark's signature inference)
    @pandas_udf("struct<c: int, s: double>")
    def _assign(vecs):
        valid = vecs.notna()
        out_c = pd.array([None] * len(vecs), dtype="Int32")
        out_s = np.full(len(vecs), np.nan)
        if valid.any():
            M = np.array(vecs[valid].tolist(), dtype=np.float64)
            nv = np.sqrt((M * M).sum(axis=1))
            nv[nv == 0.0] = 1.0
            from great_expectations_spark.pipeline.similarity import (
                round_half_up)

            sims = round_half_up(M @ C.T / (nv[:, None] * cn[None, :]), 6)
            idx = sims.argmax(axis=1)
            pos = np.flatnonzero(valid.to_numpy())
            out_c[pos] = cids[idx]
            out_s[pos] = sims[np.arange(len(idx)), idx]
        return pd.DataFrame({
            "c": out_c,
            "s": pd.array(out_s, dtype="Float64"),
        })

    return _assign


def _resolve_method(centroids: Centroids, method: str) -> str:
    """The single definition of the expr↔gemm crossover: ``auto`` picks
    unrolled codegen while k·dims stays within
    ``_EXPR_ASSIGN_MAX_TERMS``, the Arrow/BLAS kernel past it."""
    if method != "auto":
        return method
    dims = len(centroids[0][1]) if centroids else 0
    return ("expr" if len(centroids) * dims <= _EXPR_ASSIGN_MAX_TERMS
            else "gemm")


def _assign_col(vec, centroids: Centroids, method: str):
    """Cluster-id Column for ``vec`` under the requested method
    (``expr`` | ``gemm`` | ``auto``). NULL embedding → NULL cluster in
    both paths."""
    method = _resolve_method(centroids, method)
    if method == "expr":
        return F.when(vec.isNotNull(), ivf_assign(vec, centroids))
    if method == "gemm":
        return _assign_struct_udf(centroids)(vec)["c"]
    raise ValueError(f"unknown assign method {method!r}")


def kmeans_fit(
    corpus: DataFrame,
    dims: int,
    k: int,
    *,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign: str = "auto",
) -> Centroids:
    """Lloyd's k-means: ``iters`` assign+recenter rounds starting from the
    deterministic md5-seed-bucket codebook. Returns the final centroids as
    ``[(cluster_id, [dims floats])]`` sorted by cluster id.

    One scan per iteration; the driver holds only k·dims doubles between
    scans. ``assign`` picks the E-step: ``expr`` unrolls the codebook into
    whole-stage codegen (zero Python, but recompiled per iteration —
    right for tiny k·dims), ``gemm`` is one BLAS matmul per Arrow batch
    (right everywhere else); ``auto`` switches on k·dims. Both produce
    identical assignments (round-6 cosine, min-cluster-id ties).

    NULL embeddings and NULL ids are excluded from fitting (the seed
    bucket hashes the id); NULL-embedding rows can still be assigned
    later with ``kmeans_assign`` under an explicit policy.
    """
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    pts = corpus.where(
        F.col(vec_col).isNotNull() & F.col(id_col).isNotNull())
    cents = ivf_centroids(pts, dims, k, id_col=id_col, vec_col=vec_col)
    vec = F.col(vec_col)
    means = [
        F.avg(F.element_at(vec, d + 1).cast("double")).alias(f"d{d}")
        for d in range(dims)
    ]
    for _ in range(iters):
        rows = (
            pts.groupBy(_assign_col(vec, cents, assign).alias("__c"))
            .agg(*means)
            .collect()
        )
        new = {
            int(r["__c"]): [float(r[f"d{d}"]) for d in range(dims)]
            for r in rows
        }
        # empty clusters keep their previous centroid (never collapse k)
        cents = [(cid, new.get(cid, w)) for cid, w in cents]
    return cents


def kmeans_assign(
    corpus: DataFrame,
    centroids: Centroids,
    *,
    vec_col: str = "embedding",
    out_col: str = "cluster",
    assign: str = "auto",
) -> DataFrame:
    """The corpus plus a nearest-centroid ``out_col`` (NULL embedding →
    NULL cluster). No shuffle either way; ``expr`` is pure codegen,
    ``gemm`` one BLAS matmul per Arrow batch."""
    return corpus.withColumn(
        out_col, _assign_col(F.col(vec_col), centroids, assign))


def kmeans_cluster_stats(
    corpus: DataFrame,
    centroids: Centroids,
    *,
    vec_col: str = "embedding",
    assign: str = "auto",
) -> DataFrame:
    """Per-cluster fit summary: ``(cluster, n, mean_sim)`` where
    ``mean_sim`` is the average round-6 cosine of members to their own
    centroid, rounded to 4 decimals (engine-portable). One map-combinable
    groupBy; clusters that captured no point are absent (their centroid
    never moved)."""
    vec = F.col(vec_col)
    pts = corpus.where(vec.isNotNull())
    assign = _resolve_method(centroids, assign)
    if assign == "gemm":
        cs = _assign_struct_udf(centroids)(vec)
        assigned = pts.select(cs["c"].alias("__c"), cs["s"].alias("__s"))
    else:
        from great_expectations_spark.pipeline.similarity import (
            _centroid_sim, norm)

        # own-centroid similarity: CASE chain over the (small) codebook —
        # the matching cluster id picks its unrolled round-6 cosine
        nv = norm(vec)
        sim = F.lit(None).cast("double")
        for cid, w in centroids:
            sim = F.when(F.col("__c") == cid,
                         F.round(_centroid_sim(vec, w, nv), 6)).otherwise(sim)
        assigned = pts.withColumn(
            "__c", ivf_assign(vec, centroids)).select(
            F.col("__c"), sim.alias("__s"))
    return (
        assigned.groupBy(F.col("__c").alias("cluster"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg(F.col("__s")), 4).alias("mean_sim"),
        )
    )


def _pairs_gemm_fn(threshold: float, id_dtype: str, block: int = 512):
    """``applyInPandas`` kernel: one cluster's members in, its qualifying
    near-dup pairs out — pairwise round-4 cosines from float64 BLAS
    matmuls instead of ~|cluster|²/2 unrolled HOF expressions. Same
    values as the expression path (round-4 cosine with the same HALF_UP
    tie behavior as ``F.round`` via ``round_half_up``, ``id_a < id_b``;
    inputs are pre-filtered to finite non-zero-norm vectors upstream).
    Residual divergence is limited to cases where float64 dot-product
    associativity itself differs between the two evaluation orders.

    The matmul runs in ``block``-row strips, so peak memory is
    O(block · |cluster|) — never the full |cluster|² matrix. The
    quadratic WORK is inherent to SemDeDup's within-cluster pairing;
    ``max_cluster_size`` (semantic_pairs) is the real guard against a
    degenerate cluster, exactly like the LSH hot-bucket cap."""
    import numpy as np
    import pandas as pd

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series(dtype=id_dtype),
                              "id_b": pd.Series(dtype=id_dtype),
                              "sim": pd.Series(dtype="float64")})
        m = len(pdf)
        if m < 2:
            return empty
        ids = pdf["id"].to_numpy()
        M = np.array(pdf["v"].tolist(), dtype=np.float64)
        n = np.sqrt((M * M).sum(axis=1))
        out = []
        for s in range(0, m - 1, block):
            e = min(s + block, m)
            # rows s..e-1 against all STRICTLY LATER columns; same float
            # op order as the expr path: dot, then divide by the norm
            # product, then the same HALF_UP tie behavior as F.round
            from great_expectations_spark.pipeline.similarity import (
                round_half_up)

            S = round_half_up((M[s:e] @ M[s + 1:].T)
                              / np.outer(n[s:e], n[s + 1:]), 4)
            bi, bj = np.nonzero(S >= threshold)
            gi = bi + s
            gj = bj + s + 1
            keep = gj > gi
            if keep.any():
                gi, gj = gi[keep], gj[keep]
                ia, ib = ids[gi], ids[gj]
                lo = np.minimum(ia, ib)
                hi = np.maximum(ia, ib)
                out.append(pd.DataFrame(
                    {"id_a": lo, "id_b": hi, "sim": S[bi[keep], bj[keep]]}))
        if not out:
            return empty
        return pd.concat(out, ignore_index=True)

    return fn


def semantic_pairs(
    corpus: DataFrame,
    centroids: Centroids,
    threshold: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_size: int | None = 10_000,
    assign: str = "auto",
    pair_method: str = "auto",
) -> DataFrame:
    """Within-cluster near-duplicate candidate pairs:
    ``(id_a, id_b, sim)`` with ``id_a < id_b`` and round-4 cosine ≥
    ``threshold``.

    The pairing key is the cluster id, so the quadratic term is bounded
    by the largest cluster; ``max_cluster_size`` drops degenerate clusters
    from pairing entirely (inspect them with ``kmeans_cluster_stats`` —
    same policy as the LSH ``max_bucket_size`` hot-bucket cap). The cap is
    ON by default (10_000) so the boilerplate-heavy crawl — the NORMAL
    case at scale — never goes quadratic inside one degenerate cluster by
    default; pass ``None`` to opt out.

    ``pair_method``: ``expr`` = cluster-key self-join with the round-4
    cosine as zip_with/aggregate codegen per pair (zero Python);
    ``gemm`` = ONE Arrow ``applyInPandas`` per cluster computing the whole
    pairwise matrix as a float64 BLAS matmul — each pair costs a fused
    multiply-add instead of an expression-tree evaluation, and each
    member's vector crosses the shuffle once instead of twice (two join
    sides). ``auto`` picks ``gemm`` whenever the codebook already chose
    the Arrow assignment path (same k·dims crossover). Both orders round
    to 4 decimals before the threshold, so they agree wherever float64
    dot-product associativity agrees — the same contract the oracle-green
    ``cosine_topk_gemm`` relies on.

    Degenerate embeddings — any NaN/Inf component, or zero norm — are
    EXCLUDED from pairing up front (they become singleton keepers in
    ``semantic_dedup``): a corrupt vector has no meaningful cosine, and
    without this filter the two methods would diverge (Spark orders NaN
    above the threshold and glues the whole cluster into one component;
    numpy drops NaN comparisons; zero norms divide by zero).

    The assignment is materialized (evictable ``fused_checkpoint``
    persist) before pairing:
    the E-step then runs ONCE instead of once per join side, and
    downstream iterative consumers (connected components) don't
    re-evaluate it every round.
    """
    vec = F.col(vec_col)
    sq = F.aggregate(
        vec, F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"))
    finite = (
        vec.isNotNull()
        & ~F.exists(vec, lambda x: F.isnan(x.cast("double"))
                    | x.cast("double").isin(float("inf"), float("-inf")))
        & (sq > 0)
    )
    pts = (
        corpus.where(finite & F.col(id_col).isNotNull())
        .select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .withColumn("c", _assign_col(F.col("v"), centroids, assign))
        .transform(fused_checkpoint)
    )
    if max_cluster_size is not None:
        ok = (
            pts.groupBy("c").agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") <= max_cluster_size)
            .select("c")
        )
        pts = pts.join(F.broadcast(ok), "c", "left_semi")
    if pair_method == "auto":
        dims = len(centroids[0][1]) if centroids else 0
        pair_method = (
            "expr" if len(centroids) * dims <= _EXPR_ASSIGN_MAX_TERMS
            else "gemm")
    if pair_method == "gemm":
        id_field = pts.schema["id"].dataType.simpleString()
        id_dtype = "int64" if id_field in ("bigint", "int", "long",
                                           "smallint") else "object"
        return pts.groupBy("c").applyInPandas(
            _pairs_gemm_fn(threshold, id_dtype),
            schema=f"id_a {id_field}, id_b {id_field}, sim double",
        )
    if pair_method != "expr":
        raise ValueError(f"unknown pair_method {pair_method!r}")
    a = pts.alias("a")
    b = pts.alias("b")
    sim = F.round(cosine_sim(F.col("a.v"), F.col("b.v")), 4)
    return (
        a.join(b, F.col("a.c") == F.col("b.c"))
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            sim.alias("sim"),
        )
        .where(F.col("sim") >= threshold)
    )


def semantic_dedup_assignments(
    corpus: DataFrame,
    dims: int,
    k: int,
    threshold: float,
    *,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_size: int | None = 10_000,
    assign: str = "auto",
    pair_method: str = "auto",
    max_iter: int = 25,
    reliable: bool = False,
) -> DataFrame:
    """One row per input doc: ``(id, group, is_kept)`` where ``group`` is
    the min id of the doc's semantic near-dup component and the keeper is
    the group-id holder. Docs with no near-dup (including NULL id / NULL
    embedding rows) are singleton keepers of themselves."""
    from great_expectations_spark.pipeline.cluster import connected_components

    cents = kmeans_fit(
        corpus, dims, k, iters=iters, id_col=id_col, vec_col=vec_col,
        assign=assign)
    pairs = semantic_pairs(
        corpus, cents, threshold, id_col=id_col, vec_col=vec_col,
        max_cluster_size=max_cluster_size, assign=assign,
        pair_method=pair_method)
    comp = connected_components(
        pairs.select("id_a", "id_b"), "id_a", "id_b",
        max_iter=max_iter, reliable=reliable)
    return (
        corpus.select(F.col(id_col).alias("id"))
        .join(comp.withColumnRenamed("node", "id"), "id", "left")
        .select(
            "id",
            F.coalesce(F.col("component"), F.col("id")).alias("group"),
        )
        .withColumn("is_kept", F.col("id").eqNullSafe(F.col("group")))
    )


def semantic_dedup(
    corpus: DataFrame,
    dims: int,
    k: int,
    threshold: float,
    *,
    id_col: str = "vec_id",
    **kwargs,
) -> DataFrame:
    """The corpus with one exemplar kept per semantic near-dup group (all
    original columns preserved; NULL-id rows pass through as their own
    keepers). Kwargs forward to ``semantic_dedup_assignments``."""
    assign = semantic_dedup_assignments(
        corpus, dims, k, threshold, id_col=id_col, **kwargs)
    keep = assign.where("is_kept").select(F.col("id").alias(id_col))
    kept = corpus.join(keep, id_col, "left_semi")
    return kept.unionByName(corpus.where(F.col(id_col).isNull()))
