"""Connected components + dedup clustering (pipeline/cluster.py) against a
pure-Python union-find reference."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from great_expectations_spark.pipeline.cluster import (
    cluster_size_stats,
    connected_components,
    dedup_cluster_assignments,
    dedup_corpus,
    exact_duplicate_edges,
    pair_jaccard,
)


def uf_components(edges, nodes=()):
    """min-label union-find reference."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for n in nodes:
        find(n)
    return {n: find(n) for n in parent}


def cc_spark(spark, edges, nodes=None, **kw):
    e = spark.createDataFrame(edges or [(0, 0)], "id_a long, id_b long")
    if not edges:
        e = e.where("id_a < 0")
    ndf = (spark.createDataFrame([(n,) for n in nodes], "id_a long")
           if nodes is not None else None)
    out = connected_components(e, nodes=ndf, **kw)
    return {r["node"]: r["component"] for r in out.collect()}


# dt=0 forces the distributed star contraction; the default takes the
# driver union-find fallback for graphs this small — both must agree
@pytest.mark.parametrize("dt", [0, 100_000])
def test_two_cliques_and_chain(spark, dt):
    edges = [(1, 2), (2, 3), (1, 3),        # clique
             (10, 11), (11, 12),            # path
             (20, 21)]                      # pair
    assert cc_spark(spark, edges, driver_threshold=dt) == uf_components(edges)


@pytest.mark.parametrize("dt", [0, 100_000])
def test_long_chain_worst_case_diameter(spark, dt):
    # a 60-node path: worst case for naive label propagation; the
    # alternating star algorithm must still converge within max_iter
    edges = [(i, i + 1) for i in range(60)]
    got = cc_spark(spark, edges, max_iter=25, driver_threshold=dt)
    assert got == uf_components(edges)
    assert set(got.values()) == {0}


@pytest.mark.parametrize("dt", [0, 100_000])
def test_random_graphs_match_union_find(spark, dt):
    rng = random.Random(7)
    for trial in range(3):
        n = 120
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(90)]
        edges = [e for e in edges if e[0] != e[1]]
        assert cc_spark(spark, edges, driver_threshold=dt) == \
            uf_components(edges), f"trial {trial}"


def test_self_loops_nulls_and_duplicate_edges_ignored(spark):
    e = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (1, 2), (None, 5), (5, None)],
        "id_a long, id_b long")
    out = {r["node"]: r["component"]
           for r in connected_components(e).collect()}
    assert out == {1: 1, 2: 1}


def test_isolated_nodes_from_universe(spark):
    got = cc_spark(spark, [(1, 2)], nodes=[1, 2, 3, 4])
    assert got == {1: 1, 2: 1, 3: 3, 4: 4}


@pytest.mark.parametrize("dt", [0, 100_000])
def test_string_ids(spark, dt):
    e = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("x", "y")], "id_a string, id_b string")
    out = {r["node"]: r["component"]
           for r in connected_components(e, driver_threshold=dt).collect()}
    assert out == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


@pytest.mark.parametrize("dt", [0, 100_000])
def test_partitioning_invariance(spark, dt):
    edges = [(i, i + 1) for i in range(0, 40, 2)] + [(0, 39)]
    e = spark.createDataFrame(edges, "id_a long, id_b long").repartition(7)
    out1 = {r["node"]: r["component"]
            for r in connected_components(e, driver_threshold=dt).collect()}
    assert out1 == uf_components(edges)


def test_max_iter_exhaustion_raises(spark):
    e = spark.createDataFrame([(i, i + 1) for i in range(50)],
                              "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(e, max_iter=1, driver_threshold=0)


# ------------------------------------------------------------ dedup stages


def _corpus(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = []
    # cluster A: 0 exact-dups 1, 2 is a near-dup of both
    rows.append((0, base))
    rows.append((1, base))
    rows.append((2, base.replace("lazy", "sleepy")))
    # cluster B: two near-dups
    alt = ("colorless green ideas sleep furiously while the machines hum along "
           "quietly tonight and the compilers fold constants beneath a patient "
           "moon as buffered rivers of tokens stream past the idle caches "
           "waiting for the morning merge to finish")
    rows.append((10, alt))
    rows.append((11, alt.replace("quietly", "loudly")))
    # unique docs
    rows.append((20, "completely unrelated text about spark partitions and shuffle behavior today"))
    rows.append((21, None))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicate_edges(spark):
    got = {(r["id_a"], r["id_b"])
           for r in exact_duplicate_edges(_corpus(spark), "doc_id", "text").collect()}
    assert got == {(1, 0)}


def test_pair_jaccard_exact_values(spark):
    df = _corpus(spark)
    pairs = spark.createDataFrame([(0, 1), (0, 20)], "id_a long, id_b long")
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in pair_jaccard(df, pairs, "doc_id", "text").collect()}
    assert got[(0, 1)] == 1.0
    assert got[(0, 20)] == 0.0  # no shared shingle → 0, pair still present


def test_dedup_cluster_assignments_end_to_end(spark):
    df = _corpus(spark)
    assign = dedup_cluster_assignments(df, "doc_id", "text",
                                       jaccard_threshold=0.3)
    rows = {r["id"]: (r["cluster"], r["is_canonical"])
            for r in assign.collect()}
    assert rows[0] == (0, True)
    assert rows[1] == (0, False)
    assert rows[2] == (0, False)
    assert rows[10] == (10, True)
    assert rows[11] == (10, False)
    assert rows[20] == (20, True)
    assert rows[21] == (21, True)  # null text → singleton


def test_dedup_corpus_keeps_canonicals_only(spark):
    df = _corpus(spark)
    kept = dedup_corpus(df, "doc_id", "text", jaccard_threshold=0.3)
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 10, 20, 21]
    assert kept.columns == df.columns


def test_jaccard_threshold_prunes_weak_candidates(spark):
    df = _corpus(spark)
    strict = dedup_cluster_assignments(df, "doc_id", "text",
                                       jaccard_threshold=0.999,
                                       include_exact=False)
    # nothing but exact-identical shingle sets survive 0.999 — and exact
    # edges are off, so docs 0/1 (identical text ⇒ jaccard 1.0) still merge
    rows = {r["id"]: r["cluster"] for r in strict.collect()}
    assert rows[1] == 0
    assert rows[2] == 2 and rows[11] == 11


def test_cluster_size_stats(spark):
    assign = dedup_cluster_assignments(_corpus(spark), "doc_id", "text",
                                       jaccard_threshold=0.3)
    hist = {r["cluster_size"]: (r["n_clusters"], r["n_docs"])
            for r in cluster_size_stats(assign).collect()}
    assert hist == {3: (1, 3), 2: (1, 2), 1: (2, 2)}


def test_null_id_rows_survive_as_singletons(spark):
    df = spark.createDataFrame(
        [(None, "some text that belongs to nobody in particular right here"),
         (1, "another perfectly unique document about shuffle partitions")],
        "doc_id long, text string")
    assign = dedup_cluster_assignments(df, "doc_id", "text")
    rows = {r["id"]: r["is_canonical"] for r in assign.collect()}
    assert rows[None] is True and rows[1] is True
    kept = dedup_corpus(df, "doc_id", "text")
    assert kept.count() == 2


def test_iterative_rounds_free_previous_checkpoint_blocks(spark):
    """r3 regression: each star round localCheckpoints a new edge set;
    the PREVIOUS round's blocks must be unpersisted or O(rounds) pinned
    copies accumulate (checkpoint blocks are eviction-exempt) and starve
    execution memory — the exact OOM the 1M-doc sf1 bench hit. Only the
    final round's cut may stay pinned."""
    sc = spark.sparkContext

    def persistent_ids():
        return {int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()}

    # a 64-node chain needs several star rounds to converge
    edges = [(i, i + 1) for i in range(64)]
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    before = persistent_ids()
    out = connected_components(e, driver_threshold=0)
    assert out.count() == 65
    # Only NEW ids count as leaks (the ContextCleaner may concurrently
    # unpersist unrelated earlier-test RDDs, shrinking the before-set).
    grown = len(persistent_ids() - before)
    assert grown <= 1, f"{grown} checkpoint RDDs leaked (expected <= 1)"
