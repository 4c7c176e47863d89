"""Host-graph link analysis: PageRank and degree statistics over a
directed edge table.

Web-scale training-data pipelines rank crawl hosts by link authority
before sampling (Common Crawl publishes exactly such a host-level
PageRank; CCNet-style pipelines use host reputation as a quality
stratum). The reference repo has no graph operator at all — its closest
notion is the cross-table referential expectation
(reference expectations/core/expect_column_values_to_be_in_set.py and
the validator's table-level checks) — so this module belongs to the
training-data-pipeline extension surface, like `pipeline/cluster.py`.

Scale design
------------
PageRank is the canonical iterative shuffle workload; every choice here
exists to bound per-iteration exchanges and keep the driver out of the
data path:

* the edge list is degree-annotated ONCE (one join), hash-repartitioned
  on ``src`` and persisted — each iteration's contribution join then
  only exchanges the (node, rank) side, never the edges;
* contributions aggregate with ``groupBy(dst).sum`` — a commutative
  monoid, so map-side combine collapses a hub's in-links before the
  wide exchange (in-degree skew — every page linking to one big host —
  is absorbed by partial aggregation, not salting);
* dangling mass (ranks of nodes with no out-links) is recovered as
  ``1 - sum(contributions)`` — one scalar per iteration off the already
  persisted contribution frame, instead of a per-iteration anti-join;
  the driver holds one double, exactly like the k-means codebook in
  `pipeline/embcluster.py`;
* lineage is cut every ``checkpoint_every`` iterations with
  :func:`~._lineage.tracked_checkpoint`, and the PREVIOUS cut's blocks
  are freed once the new one is materialized (iterative plans otherwise
  grow without bound and pinned blocks starve execution memory).

Ranks are a probability distribution: they sum to 1 every iteration
(dangling redistribution included), which the tests pin. Results are
partitioning-independent up to float addition order; pass ``round_to``
for a cross-engine / cross-run stable output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._lineage import tracked_checkpoint, unpersist_ids


def _clean_edges(
    edges: DataFrame, src: str, dst: str, drop_self_loops: bool
) -> DataFrame:
    """Distinct directed (src, dst) edges; NULL endpoints always dropped,
    self-loops dropped by default (host link graphs discard self-links —
    they only feed a node's rank back to itself and slow mixing)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    e = e.where(F.col("src").isNotNull() & F.col("dst").isNotNull())
    if drop_self_loops:
        e = e.where(F.col("src") != F.col("dst"))
    return e.distinct()


def degree_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst",
    *, drop_self_loops: bool = True,
) -> DataFrame:
    """Per-node ``(node, out_degree, in_degree)`` over the distinct edge
    set — the skew report to read BEFORE running anything iterative on a
    crawl graph.

    One exchange total: both endpoint roles are unioned into (node,
    out, in) increments and summed in a single map-side-combinable
    groupBy, instead of the textbook two aggregations + full-outer join
    (three exchanges)."""
    e = _clean_edges(edges, src, dst, drop_self_loops)
    both = e.select(
        F.col("src").alias("node"), F.lit(1).alias("out"), F.lit(0).alias("in_"),
    ).unionAll(
        e.select(
            F.col("dst").alias("node"), F.lit(0).alias("out"),
            F.lit(1).alias("in_"),
        )
    )
    return both.groupBy("node").agg(
        F.sum("out").alias("out_degree"), F.sum("in_").alias("in_degree")
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    damping: float = 0.85,
    iterations: int = 10,
    drop_self_loops: bool = True,
    round_to: int | None = None,
    checkpoint_every: int = 2,
    reliable: bool = False,
) -> DataFrame:
    """PageRank over a directed edge table → ``(node, rank)``.

    Standard uniform-teleport formulation with dangling-mass
    redistribution: ``r'(v) = (1-d)/n + d * (Σ_{(u,v)∈E} r(u)/outdeg(u)
    + dangling/n)`` where ``dangling = 1 - Σ contributions`` (every
    non-dangling node emits exactly its rank across its out-edges, so
    the shortfall from 1 IS the dangling mass — no anti-join needed).
    Ranks sum to 1 after every iteration.

    ``iterations=0`` returns the uniform distribution over the node set
    (without building the degree-annotated edge list at all).
    ``round_to`` rounds the final rank (HALF_UP, like ``F.round``) for a
    deterministic, engine-comparable output. ``reliable=True`` routes
    the per-``checkpoint_every`` lineage cuts through reliable
    ``checkpoint()`` files instead of executor-local blocks (same knob
    as :func:`~.cluster.connected_components` — survives executor loss
    on a real cluster; requires ``sc.setCheckpointDir``).
    """
    if iterations < 0:
        raise ValueError(f"iterations must be >= 0, got {iterations}")
    if not 0.0 <= damping <= 1.0:
        raise ValueError(f"damping must be in [0, 1], got {damping}")
    if checkpoint_every < 1:
        raise ValueError(
            f"checkpoint_every must be >= 1, got {checkpoint_every}")

    e = _clean_edges(edges, src, dst, drop_self_loops)

    nodes = (
        e.select("src").unionAll(e.select(F.col("dst").alias("src")))
        .distinct().select(F.col("src").alias("node")).persist()
    )
    n = nodes.count()  # one long on the driver; also materializes the cache
    if n == 0:
        out = nodes.select(
            "node", F.lit(0.0).alias("rank"))  # empty, schema-stable
        nodes.unpersist(False)
        return out

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    if iterations == 0:
        out = ranks
        if round_to is not None:
            out = out.select(
                "node", F.round(F.col("rank"), round_to).alias("rank"))
        # lineage stays on the (now uncached) node-set plan — recomputable
        nodes.unpersist(False)
        return out

    # Degree-annotate once; hash-partition on the per-iteration join key
    # so only the rank side moves each round.
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    edges_w = (
        e.join(deg, "src")
        .select("src", "dst", "outdeg")
        .repartition(F.col("src"))
        .persist()
    )
    edges_w.count()

    base = (1.0 - damping) / n
    pinned: set[int] = set()
    live_contribs: list[DataFrame] = []
    for i in range(iterations):
        contrib = (
            edges_w.join(ranks, edges_w["src"] == ranks["node"])
            .groupBy(F.col("dst").alias("cnode"))
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("c"))
            .persist()
        )
        emitted = contrib.agg(F.sum("c")).first()[0] or 0.0
        dangling = 1.0 - emitted
        ranks = nodes.join(
            contrib, nodes["node"] == contrib["cnode"], "left"
        ).select(
            "node",
            (F.lit(base) + F.lit(damping)
             * (F.coalesce(F.col("c"), F.lit(0.0))
                + F.lit(dangling / n))).alias("rank"),
        )
        live_contribs.append(contrib)
        if (i + 1) % checkpoint_every == 0 or i == iterations - 1:
            ranks, new_ids = tracked_checkpoint(
                ranks, eager=True, reliable=reliable)
            unpersist_ids(ranks, pinned)
            pinned = new_ids
            # contribs cached since the last cut are now unreachable from
            # the (checkpointed) ranks lineage — safe to free
            for c in live_contribs:
                c.unpersist(False)
            live_contribs = []

    edges_w.unpersist(False)
    nodes.unpersist(False)
    if round_to is not None:
        ranks = ranks.select(
            "node", F.round(F.col("rank"), round_to).alias("rank"))
    return ranks
