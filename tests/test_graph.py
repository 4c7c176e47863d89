"""Host-graph link analysis (pipeline/graph.py)."""

import pytest

from great_expectations_spark.pipeline.graph import degree_stats, pagerank

D = 0.85


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_cycle_is_uniform(spark):
    # a -> b -> c -> a: the stationary distribution is uniform, and the
    # uniform start is already stationary — every iterate stays 1/3
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    got = _ranks(pagerank(e, iterations=4, round_to=9))
    assert got == {"a": pytest.approx(1 / 3), "b": pytest.approx(1 / 3),
                   "c": pytest.approx(1 / 3)}


def test_one_iteration_hand_computed_with_dangling(spark):
    # a -> c, b -> c, c has no out-edges (dangling). n=3, r0 = 1/3 each.
    # contributions: c gets 1/3 + 1/3 = 2/3; emitted = 2/3; dangling = 1/3.
    # r1(v) = 0.05 + 0.85 * (contrib + (1/3)/3)
    e = _edges(spark, [("a", "c"), ("b", "c")])
    got = _ranks(pagerank(e, iterations=1, round_to=9))
    base = (1 - D) / 3
    ab = base + D * (0 + (1 / 3) / 3)
    c = base + D * (2 / 3 + (1 / 3) / 3)
    assert got["a"] == pytest.approx(ab)
    assert got["b"] == pytest.approx(ab)
    assert got["c"] == pytest.approx(c)


def test_mass_conserved_every_iteration(spark):
    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "c"), ("d", "a"),
                       ("c", "sink")])
    for it in (0, 1, 3):
        total = sum(_ranks(pagerank(e, iterations=it)).values())
        assert total == pytest.approx(1.0, abs=1e-12)


def test_zero_iterations_uniform_over_node_set(spark):
    # node set includes pure-sink nodes (only inbound)
    e = _edges(spark, [("a", "b"), ("a", "sink")])
    got = _ranks(pagerank(e, iterations=0))
    assert set(got) == {"a", "b", "sink"}
    assert all(v == pytest.approx(1 / 3) for v in got.values())


def test_null_endpoints_and_self_loops_dropped(spark):
    e = _edges(spark, [("a", "b"), ("a", "a"), (None, "b"), ("b", None)])
    got = _ranks(pagerank(e, iterations=2))
    assert set(got) == {"a", "b"}
    # with the self-loop dropped the graph is exactly a -> b
    ref = _ranks(pagerank(_edges(spark, [("a", "b")]), iterations=2))
    assert got == pytest.approx(ref)


def test_duplicate_edges_count_once(spark):
    e1 = _edges(spark, [("a", "b"), ("a", "b"), ("a", "c")])
    e2 = _edges(spark, [("a", "b"), ("a", "c")])
    assert _ranks(pagerank(e1, iterations=3)) == pytest.approx(
        _ranks(pagerank(e2, iterations=3)))


def test_partitioning_invariance(spark):
    rows = [(f"h{i % 13}", f"h{(i * i) % 13}") for i in range(200)]
    e = _edges(spark, rows)
    a = _ranks(pagerank(e.repartition(7), iterations=3, round_to=6))
    b = _ranks(pagerank(e.repartition(2), iterations=3, round_to=6,
                        checkpoint_every=1))
    assert a == b


def test_authority_ordering(spark):
    # everyone links to hub; hub links to one page. The a<->hub 2-cycle
    # makes iterates oscillate (hub leads on odd counts), so pin an odd
    # count and the exact closed-form iterate values.
    e = _edges(spark, [("a", "hub"), ("b", "hub"), ("c", "hub"),
                       ("hub", "a")])
    got = _ranks(pagerank(e, iterations=11))
    assert got["hub"] == max(got.values())
    assert got["a"] > got["b"]  # a gets the hub's mass too
    assert got["b"] == pytest.approx(got["c"])
    assert got["b"] == pytest.approx((1 - D) / 4)  # b never receives mass


def test_arg_validation(spark):
    e = _edges(spark, [("a", "b")])
    with pytest.raises(ValueError, match="iterations"):
        pagerank(e, iterations=-1)
    with pytest.raises(ValueError, match="damping"):
        pagerank(e, damping=1.5)
    with pytest.raises(ValueError, match="checkpoint_every"):
        pagerank(e, checkpoint_every=0)


def test_empty_edges(spark):
    e = _edges(spark, []).where("src IS NOT NULL")
    assert pagerank(e, iterations=2).count() == 0


def test_degree_stats(spark):
    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "c"), ("a", "b"),
                       ("c", "c"), (None, "a")])
    got = {r["node"]: (r["out_degree"], r["in_degree"])
           for r in degree_stats(e).collect()}
    # distinct edges after cleaning: a->b, a->c, b->c
    assert got == {"a": (2, 0), "b": (1, 1), "c": (0, 2)}


def test_degree_stats_keeps_self_loops_when_asked(spark):
    e = _edges(spark, [("a", "a"), ("a", "b")])
    got = {r["node"]: (r["out_degree"], r["in_degree"])
           for r in degree_stats(e, drop_self_loops=False).collect()}
    assert got == {"a": (2, 1), "b": (0, 1)}


def test_pagerank_zero_iterations_skips_edge_materialization(spark):
    """r3 regression: iterations=0 returns the uniform distribution
    without building/persisting the degree-annotated edge list (a full
    groupBy + join + repartition job the result never reads)."""
    sc = spark.sparkContext

    def persistent_ids():
        return {int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()}

    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    before = persistent_ids()
    out = pagerank(e, iterations=0)
    assert out.count() == 3
    # Set containment, not count equality: the ContextCleaner may
    # asynchronously unpersist UNRELATED earlier-test RDDs in the window,
    # shrinking the set — only NEW ids would mean we materialized edges.
    assert persistent_ids() <= before
