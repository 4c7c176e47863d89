"""Embedding k-means + SemDeDup semantic dedup (pipeline/embcluster.py)."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from great_expectations_spark.pipeline.embcluster import (
    kmeans_assign,
    kmeans_cluster_stats,
    kmeans_fit,
    semantic_dedup,
    semantic_dedup_assignments,
    semantic_pairs,
)

DIMS = 8


def _vec(rng: random.Random, center: list[float], spread: float = 0.3):
    return [c + rng.uniform(-spread, spread) for c in center]


@pytest.fixture(scope="module")
def emb(spark):
    """60 vectors in 3 well-separated blobs + 2 planted exact duplicates
    of vec 0 (ids 100, 101) + a NULL embedding (id 200) + a NULL id
    (blob-0 vector)."""
    rng = random.Random(7)
    centers = [
        [5.0] + [0.0] * (DIMS - 1),
        [0.0, 5.0] + [0.0] * (DIMS - 2),
        [0.0, 0.0, 5.0] + [0.0] * (DIMS - 3),
    ]
    rows = []
    for i in range(60):
        rows.append((i, _vec(rng, centers[i % 3])))
    dup_src = rows[0][1]
    rows.append((100, list(dup_src)))
    rows.append((101, list(dup_src)))
    rows.append((200, None))
    rows.append((None, _vec(rng, centers[0])))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _own_sim(v, c):
    dot = sum(a * b for a, b in zip(v, c))
    return dot / (math.sqrt(sum(a * a for a in v)) * math.sqrt(sum(a * a for a in c)))


def test_kmeans_partitioning_invariant(spark, emb):
    c1 = kmeans_fit(emb.repartition(1), DIMS, 4, iters=2)
    c8 = kmeans_fit(emb.repartition(8, "vec_id"), DIMS, 4, iters=2)
    assert [cid for cid, _ in c1] == [cid for cid, _ in c8]
    for (_, a), (_, b) in zip(c1, c8):
        assert a == pytest.approx(b, abs=1e-9)


def test_kmeans_improves_objective(spark, emb):
    from great_expectations_spark.pipeline.similarity import ivf_centroids

    pts = emb.where(F.col("embedding").isNotNull()
                    & F.col("vec_id").isNotNull())
    init = ivf_centroids(pts, DIMS, 4)
    refined = kmeans_fit(emb, DIMS, 4, iters=3)

    def mean_sim(cents):
        rows = kmeans_cluster_stats(emb, cents).collect()
        n = sum(r["n"] for r in rows)
        return sum(r["n"] * r["mean_sim"] for r in rows) / n

    assert mean_sim(refined) >= mean_sim(init) - 1e-9


def test_kmeans_recovers_blobs(spark, emb):
    """3 separated blobs, k=3 → every blob lands in one cluster."""
    cents = kmeans_fit(emb, DIMS, 3, iters=4)
    rows = kmeans_assign(
        emb.where(F.col("embedding").isNotNull()
                  & F.col("vec_id").isNotNull()), cents).collect()
    by_blob: dict[int, set[int]] = {}
    for r in rows:
        blob = int(r["vec_id"]) % 3 if r["vec_id"] < 100 else 0
        by_blob.setdefault(blob, set()).add(r["cluster"])
    assert all(len(cl) == 1 for cl in by_blob.values())
    assert len({next(iter(c)) for c in by_blob.values()}) == 3


def test_kmeans_zero_iters_is_seed_codebook(spark, emb):
    from great_expectations_spark.pipeline.similarity import ivf_centroids

    pts = emb.where(F.col("embedding").isNotNull()
                    & F.col("vec_id").isNotNull())
    assert kmeans_fit(emb, DIMS, 4, iters=0) == ivf_centroids(pts, DIMS, 4)


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    """Two far blobs, k=4: seed buckets split arbitrarily; after the
    E-step some centroid may capture nothing — it must survive with its
    previous coordinates (codebook size never shrinks)."""
    rows = [(i, [100.0 * (i % 2)] + [0.0] * (DIMS - 1)) for i in range(12)]
    df = _spark_df(rows)
    cents = kmeans_fit(df, DIMS, 4, iters=3)
    init_ids = [cid for cid, _ in kmeans_fit(df, DIMS, 4, iters=0)]
    assert [cid for cid, _ in cents] == init_ids
    assert all(len(w) == DIMS and all(isinstance(x, float) for x in w)
               for _, w in cents)


def _spark_df(rows):
    from great_expectations_spark.sources.session import get_spark

    return get_spark(cores=4, app="gxs-tests", shuffle_partitions=4).createDataFrame(
        rows, "vec_id long, embedding array<double>")


def test_assign_null_embedding_is_null_cluster(spark, emb):
    cents = kmeans_fit(emb, DIMS, 3, iters=1)
    r = kmeans_assign(emb, cents).where(F.col("vec_id") == 200).first()
    assert r["cluster"] is None


def test_semantic_pairs_find_planted_duplicates(spark, emb):
    cents = kmeans_fit(emb, DIMS, 3, iters=2)
    pairs = semantic_pairs(emb, cents, 0.9999).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert {(0, 100), (0, 101), (100, 101)} <= got
    assert all(r["sim"] >= 0.9999 for r in pairs)


def test_semantic_pairs_max_cluster_size_drops_degenerate(spark, emb):
    cents = kmeans_fit(emb, DIMS, 3, iters=2)
    assert semantic_pairs(emb, cents, 0.9, max_cluster_size=1).count() == 0


def test_semantic_dedup_keeps_one_exemplar(spark, emb):
    assign = semantic_dedup_assignments(emb, DIMS, 3, 0.9999, iters=2)
    rows = {r["id"]: r for r in assign.collect()}
    # the planted trio collapses to group 0; only id 0 is kept
    assert rows[0]["group"] == 0 and rows[0]["is_kept"]
    assert rows[100]["group"] == 0 and not rows[100]["is_kept"]
    assert rows[101]["group"] == 0 and not rows[101]["is_kept"]
    # NULL-embedding row (200) and NULL-id row: singleton keepers
    assert rows[200]["is_kept"]
    assert rows[None]["group"] is None and rows[None]["is_kept"]


def test_semantic_dedup_corpus_roundtrip(spark, emb):
    out = semantic_dedup(emb, DIMS, 3, 0.9999, iters=2)
    ids = [r["vec_id"] for r in out.collect()]
    assert 0 in ids and 100 not in ids and 101 not in ids
    assert None in ids  # NULL-id passthrough
    assert len(ids) == emb.count() - 2


def test_semantic_dedup_transitive_closure(spark):
    """A~B and B~C above threshold, A~C below: all three must share one
    group (SemDeDup pairs are cluster-local but keeping is transitive)."""
    a = [1.0, 0.0, 0.0] + [0.0] * (DIMS - 3)
    b = [0.9, 0.45, 0.0] + [0.0] * (DIMS - 3)  # cos(a,b) ≈ .895
    c = [0.62, 0.79, 0.0] + [0.0] * (DIMS - 3)  # cos(b,c) ≈ .90, cos(a,c) ≈ .62
    df = _spark_df([(1, a), (2, b), (3, c)])
    assign = {r["id"]: r for r in
              semantic_dedup_assignments(df, DIMS, 1, 0.85, iters=1).collect()}
    assert {assign[i]["group"] for i in (1, 2, 3)} == {1}
    assert assign[1]["is_kept"] and not assign[2]["is_kept"]


def test_assign_methods_agree(spark, emb):
    """The unrolled-expression E-step and the Arrow GEMM kernel are
    interchangeable: identical centroids, assignments, and stats."""
    ce = kmeans_fit(emb, DIMS, 4, iters=2, assign="expr")
    cg = kmeans_fit(emb, DIMS, 4, iters=2, assign="gemm")
    assert [cid for cid, _ in ce] == [cid for cid, _ in cg]
    for (_, a), (_, b) in zip(ce, cg):
        assert a == pytest.approx(b, abs=1e-9)
    ae = {r["vec_id"]: r["cluster"]
          for r in kmeans_assign(emb, ce, assign="expr").collect()}
    ag = {r["vec_id"]: r["cluster"]
          for r in kmeans_assign(emb, ce, assign="gemm").collect()}
    assert ae == ag
    assert ae[200] is None  # NULL embedding → NULL cluster in both
    se = sorted(tuple(r) for r in
                kmeans_cluster_stats(emb, ce, assign="expr").collect())
    sg = sorted(tuple(r) for r in
                kmeans_cluster_stats(emb, ce, assign="gemm").collect())
    assert se == sg


def test_cluster_stats_counts_total(spark, emb):
    cents = kmeans_fit(emb, DIMS, 3, iters=2)
    stats = kmeans_cluster_stats(emb, cents).collect()
    # 64 rows minus the NULL embedding (the NULL-id vector IS assigned)
    assert sum(r["n"] for r in stats) == 63
    assert all(-1.0 <= r["mean_sim"] <= 1.0 for r in stats)


# ------------------------------------------------- gemm pairing (review fixes)


def test_semantic_pairs_gemm_expr_parity(spark):
    """The Arrow/BLAS pair kernel must emit exactly the expression path's
    pairs — long ids, string ids, and across the blocked matmul strips."""
    import random

    from great_expectations_spark.pipeline.embcluster import (
        kmeans_fit, semantic_pairs)

    rnd = random.Random(5)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(300)]
    # plant near-dups
    for i in range(0, 30, 3):
        rows[i + 1] = (rows[i + 1][0], [x * 1.001 for x in rows[i][1]])
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = kmeans_fit(df, 8, 4, iters=1)
    a = sorted(map(tuple, semantic_pairs(
        df, cents, 0.8, pair_method="expr").collect()))
    b = sorted(map(tuple, semantic_pairs(
        df, cents, 0.8, pair_method="gemm").collect()))
    assert a == b and len(a) > 0
    s = df.selectExpr("CAST(vec_id AS STRING) AS vec_id", "embedding")
    cs = kmeans_fit(s, 8, 4, iters=1)
    sa = sorted(map(tuple, semantic_pairs(
        s, cs, 0.8, pair_method="expr").collect()))
    sb = sorted(map(tuple, semantic_pairs(
        s, cs, 0.8, pair_method="gemm").collect()))
    assert sa == sb


def test_semantic_pairs_gemm_blocked_strips(spark):
    """Pairs crossing the 512-row block boundary are found exactly once."""
    from great_expectations_spark.pipeline.embcluster import semantic_pairs

    n = 1100  # > 2 blocks
    df = spark.createDataFrame(
        [(i, [1.0, float(i % 7) * 1e-9]) for i in range(n)],
        "vec_id long, embedding array<double>")
    cents = [(0, [1.0, 0.0])]
    got = semantic_pairs(df, cents, 0.999, pair_method="gemm")
    assert got.count() == n * (n - 1) // 2
    assert got.select("id_a", "id_b").distinct().count() == n * (n - 1) // 2


def test_semantic_pairs_degenerate_embeddings_excluded(spark):
    """NaN/Inf components and zero-norm vectors never pair — under BOTH
    methods (without the filter, Spark's NaN ordering would glue the
    cluster while numpy drops it; zero norms divide by zero)."""
    from great_expectations_spark.pipeline.embcluster import (
        semantic_dedup_assignments, semantic_pairs)

    rows = [
        (1, [1.0, 0.0]), (2, [1.0, 1e-9]),          # genuine near-dups
        (3, [float("nan"), 1.0]), (4, [float("nan"), 1.0]),
        (5, [0.0, 0.0]), (6, [float("inf"), 1.0]),
        (7, None),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [(0, [1.0, 0.0])]
    for method in ("expr", "gemm"):
        pairs = semantic_pairs(df, cents, 0.5, pair_method=method).collect()
        assert sorted((r["id_a"], r["id_b"]) for r in pairs) == [(1, 2)], method
    # degenerate docs remain singleton keepers end-to-end
    got = {r["id"]: r["is_kept"] for r in semantic_dedup_assignments(
        df, dims=2, k=1, threshold=0.5, iters=0).collect()}
    assert got[3] and got[4] and got[5] and got[6]
    assert got[1] and not got[2]
