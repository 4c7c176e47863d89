"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (broadcast the query set,
one scan over the corpus, per-query top-k via window). The scale path is
LSH bucketing with deterministic random-hyperplane signs: candidate set
shrinks by ~2^planes, then exact rerank inside buckets.

All dot products run JVM-side via ``F.zip_with`` + ``F.aggregate`` over
doubles — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HEX = "0123456789abcdef"


def dot(a: Column, b: Column) -> Column:
    """Left-to-right double-precision dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_sim(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def round_half_up(x, decimals: int):
    """Spark-``F.round``-compatible rounding for numpy arrays: HALF_UP
    (ties away from zero), not numpy's default half-even. Spark rounds
    the exact decimal expansion of the double via BigDecimal; this
    replicates its tie behavior through ``floor(|x|·10^d + 0.5)`` with the
    sign restored. The two can still disagree where the fp product
    ``|x|·10^d`` itself rounds across a tie the exact decimal scaling
    would not — the same float64-associativity caveat the gemm/expr
    parity contract already carries."""
    import numpy as np

    scale = 10.0 ** decimals
    return np.copysign(np.floor(np.abs(x) * scale + 0.5), x) / scale


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Broadcast the (small) query set against the corpus — ONE corpus scan
    for all queries, no shuffle of the corpus itself; the only shuffle is
    the per-query top-k (tiny after the map-side filter).

    Rank is over sim rounded to 4 decimals with id tiebreak, so results
    are stable across summation orders / engines.
    """
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__v"))
    q = queries.select(F.col(q_id_col).alias("q_id"), F.col(q_vec_col).alias("__q"))
    joined = c.crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.where(F.col("vec_id") != F.col("q_id"))
    sim = F.round(cosine_sim(F.col("__v"), F.col("__q")), 4)
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        joined.select("q_id", "vec_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", "sim", F.col("rank").cast("int").alias("rank"))
    )


# ----------------------------------------------------- LSH-bucketed ANN


def hyperplane_weights(plane: int, dims: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: weight d = value of the
    first hex digit of md5('p:<plane>:<dim>') minus 7.5. Computed
    driver-side (plain Python hashlib) and shipped as literals, so any
    engine — including the DuckDB oracle — reproduces the same planes."""
    import hashlib

    return [
        int(hashlib.md5(f"p:{plane}:{d}".encode()).hexdigest()[0], 16) - 7.5
        for d in range(dims)
    ]


def lsh_bucket(vec: Column, dims: int, planes: int = 8) -> Column:
    """Random-hyperplane LSH bucket id (0..2^planes-1) as a long.

    The projection is a literal-weighted sum — pure codegen arithmetic,
    no per-row hashing.
    """
    out = F.lit(0).cast("long")
    for p in range(planes):
        w = hyperplane_weights(p, dims)
        proj = F.lit(0.0)
        for d in range(dims):
            proj = proj + F.element_at(vec, d + 1).cast("double") * F.lit(w[d])
        out = out + F.when(proj > 0, F.lit(2 ** p)).otherwise(0)
    return out


def lsh_buckets(vec: Column, dims: int, planes: int, tables: int) -> Column:
    """Array of ``tables`` bucket ids; table t uses planes
    [t*planes, (t+1)*planes) — independent hash tables, the standard
    recall lever for hyperplane LSH."""
    out = []
    for t in range(tables):
        b = F.lit(0).cast("long")
        for p in range(planes):
            w = hyperplane_weights(t * planes + p, dims)
            proj = F.lit(0.0)
            for d in range(dims):
                proj = proj + F.element_at(vec, d + 1).cast("double") * F.lit(w[d])
            b = b + F.when(proj > 0, F.lit(2 ** p)).otherwise(0)
        out.append(b)
    return F.array(*out)


# ----------------------------------------------------------- IVF ANN


def ivf_centroids(
    corpus: DataFrame,
    dims: int,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic IVF codebook: seed bucket = ``md5_int(id) %
    n_centroids`` (reproducible in ANY engine — DuckDB replays it as
    ``('0x' || substr(md5(id::VARCHAR),1,15))::BIGINT % n`` — and valid
    for ANY id type; a plain ``id % n`` would NULL out on string ids),
    centroid = per-dimension mean of its bucket — i.e. the k-means M-step
    over a fixed initial partition. One scan; ``dims * n_centroids``
    scalar aggregates come back to the driver (a few KB)."""
    from great_expectations_spark.pipeline.dedup import _md5_int

    bucket = F.pmod(_md5_int(F.col(id_col).cast("string")), F.lit(n_centroids)).cast("int")
    means = [
        F.avg(F.element_at(F.col(vec_col), d + 1).cast("double")).alias(f"d{d}")
        for d in range(dims)
    ]
    rows = corpus.groupBy(bucket.alias("__b")).agg(*means).collect()
    return sorted(
        (int(r["__b"]), [float(r[f"d{d}"]) for d in range(dims)]) for r in rows
    )


def _centroid_sim(vec: Column, weights: list[float], vec_norm: Column) -> Column:
    """Cosine of ``vec`` against a LITERAL centroid — unrolled
    multiply-add codegen, centroid norm folded as a constant."""
    import math

    proj = F.lit(0.0)
    for d, w in enumerate(weights):
        proj = proj + F.element_at(vec, d + 1).cast("double") * F.lit(w)
    cn = math.sqrt(sum(w * w for w in weights)) or 1.0
    return proj / (vec_norm * F.lit(cn))


def ivf_assign(vec: Column, centroids: list[tuple[int, list[float]]]) -> Column:
    """Nearest-centroid id by cosine (round-6 tie broken toward the
    smallest id — deterministic across engines)."""
    nv = norm(vec)
    cells = [
        F.struct(
            F.round(_centroid_sim(vec, w, nv), 6).alias("s"),
            F.lit(-cid).alias("nc"),
        )
        for cid, w in centroids
    ]
    return (-F.array_max(F.array(*cells))["nc"]).cast("int")


def ann_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    dims: int,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """IVF approximate top-k: the complementary scale path to
    ``ann_topk_lsh``. Build a ``n_centroids``-cell codebook (one scan),
    assign every corpus vector to its nearest cell, probe each query's
    ``n_probe`` closest cells, and rerank exactly inside the probed cells
    only — candidate volume shrinks by ~``n_probe / n_centroids``.

    At 10^9+ vectors: the codebook is a driver-side constant, assignment
    is pure codegen in the corpus scan, the probe map is a broadcast, and
    the per-query top-k shuffles only the probed candidates. Recall is
    tuned by ``n_probe`` (more cells probed → closer to exact)."""
    cents = ivf_centroids(corpus, dims, n_centroids, id_col, vec_col)

    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("__v"),
        ivf_assign(F.col(vec_col), cents).alias("__cid"),
    )
    # per-query probe list: rank the codebook (tiny) against each query
    spark = corpus.sparkSession
    cent_df = spark.createDataFrame(
        [(cid, w) for cid, w in cents], "cid int, c array<double>")
    q = queries.select(F.col(q_id_col).alias("q_id"), F.col(q_vec_col).alias("__q"))
    wq = Window.partitionBy("q_id").orderBy(
        F.desc(F.round(cosine_sim(F.col("__q"), F.col("c")), 6)), F.asc("cid"))
    probes = (
        q.crossJoin(F.broadcast(cent_df))
        .withColumn("__pr", F.row_number().over(wq))
        .where(F.col("__pr") <= n_probe)
        .select("q_id", "__q", F.col("cid").alias("__cid"))
    )
    cand = (
        c.join(F.broadcast(probes), on="__cid")
        .where(F.col("vec_id") != F.col("q_id"))
    )
    sim = F.round(cosine_sim(F.col("__v"), F.col("__q")), 4)
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        cand.select("q_id", "vec_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", "sim", F.col("rank").cast("int").alias("rank"))
    )


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dims: int,
    k: int = 10,
    planes: int = 6,
    tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Approximate top-k: exact cosine rerank restricted to vectors
    sharing ANY of the query's LSH buckets (``tables`` independent
    tables). At 10^9+ vectors the bucket join replaces the full scan;
    recall is tuned by ``tables`` (more tables → more candidates) and
    ``planes`` (fewer planes → bigger buckets).
    """
    c = (
        corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("__v"),
            lsh_buckets(F.col(vec_col), dims, planes, tables).alias("__blks"),
        )
        .select(
            "vec_id", "__v",
            F.posexplode(F.col("__blks")).alias("__tbl", "__blk"),
        )
    )
    q = queries.select(
        F.col(q_id_col).alias("q_id"),
        F.col(q_vec_col).alias("__q"),
        lsh_buckets(F.col(q_vec_col), dims, planes, tables).alias("__blks"),
    ).select(
        "q_id", "__q",
        F.posexplode(F.col("__blks")).alias("__tbl", "__blk"),
    )
    cand = (
        c.join(F.broadcast(q), on=["__tbl", "__blk"])
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", "__v", "__q")
        .dropDuplicates(["q_id", "vec_id"])
    )
    sim = F.round(cosine_sim(F.col("__v"), F.col("__q")), 4)
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        cand.select("q_id", "vec_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", "sim", F.col("rank").cast("int").alias("rank"))
    )


# ------------------------------------------------- GEMM exact top-k


def cosine_topk_gemm(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k, Arrow/BLAS edition — same results as
    ``cosine_topk`` (identical round-4 + id-tiebreak total order), built
    for wide query sets where the unrolled ``zip_with`` dot products
    dominate.

    Plan: the query matrix is collected driver-side (small by the same
    contract that lets ``cosine_topk`` broadcast it), L2-normalized once,
    and closed over a ``mapInPandas`` kernel; each Arrow batch of the
    corpus becomes ONE ``numpy`` GEMM (batch x dims @ dims x n_queries)
    followed by a per-query partial top-k. Only ``n_partitions * k`` rows
    per query reach the final shuffle — the corpus itself never moves.
    The per-batch prune and the final window use the SAME total order
    (sim rounded to 4 desc, id asc), so the union of per-batch top-k
    provably contains the global top-k.

    Rows with NULL or zero-norm embeddings are excluded (cosine is
    undefined there; ``cosine_topk`` ranks them last via NULL sims — the
    two differ only for queries with fewer than k well-defined neighbors).
    """
    import numpy as np
    import pandas as pd

    qrows = queries.select(
        F.col(q_id_col).alias("q_id"), F.col(q_vec_col).alias("q_vec")
    ).collect()
    if not qrows:
        raise ValueError("queries is empty")
    q_ids = [r["q_id"] for r in qrows]
    qm = np.array([r["q_vec"] for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(qm, axis=1)
    if (qn == 0).any():
        raise ValueError("zero-norm query vector")
    qm /= qn[:, None]
    dims = qm.shape[1]

    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__v"))
    q_id_type = queries.schema[q_id_col].dataType.simpleString()
    vec_id_type = corpus.schema[id_col].dataType.simpleString()
    out_schema = (
        f"q_id {q_id_type}, vec_id {vec_id_type}, sim double"
    )

    def kernel(batches):
        for pdf in batches:
            vecs = pdf["__v"]
            mask = vecs.notna().to_numpy()
            if not mask.any():
                continue
            ids = pdf["vec_id"].to_numpy()[mask]
            cm = np.stack(vecs[mask].to_numpy()).astype(np.float64)
            if cm.shape[1] != dims:
                raise ValueError(
                    f"corpus dims {cm.shape[1]} != query dims {dims}")
            cn = np.linalg.norm(cm, axis=1)
            ok = cn > 0
            if not ok.all():
                ids, cm, cn = ids[ok], cm[ok], cn[ok]
            if ids.size == 0:
                continue
            sims = round_half_up((cm / cn[:, None]) @ qm.T, 4)  # rows x queries
            out_q, out_id, out_sim = [], [], []
            for j, qid in enumerate(q_ids):
                s = sims[:, j]
                cand_ids, cand_s = ids, s
                if exclude_self:
                    ne = cand_ids != qid
                    cand_ids, cand_s = cand_ids[ne], cand_s[ne]
                if cand_ids.size == 0:
                    continue
                take = min(k, cand_ids.size)
                # total order: sim desc, id asc — same as the final window
                order = np.lexsort((cand_ids, -cand_s))[:take]
                out_q.extend([qid] * take)
                out_id.extend(cand_ids[order].tolist())
                out_sim.extend(cand_s[order].tolist())
            if out_q:
                yield pd.DataFrame(
                    {"q_id": out_q, "vec_id": out_id, "sim": out_sim}
                )

    partial = c.mapInPandas(kernel, schema=out_schema)
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", "sim", F.col("rank").cast("int").alias("rank"))
    )
