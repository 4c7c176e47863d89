"""Duplicate-cluster resolution: connected components over near-duplicate
candidate edges, canonical-document selection, and one-call corpus dedup.

The LSH/SimHash/embedding stages (`pipeline/dedup.py`) emit *pairs*; a real
web-scale dedup pass must then group transitively-linked documents into
clusters and keep one canonical document per cluster (A~B and B~C must
collapse to ONE kept doc even when A~C was never emitted as a pair).
The reference repo has no such operator at all — its closest notion is the
per-batch `expect_column_values_to_be_unique` count
(reference expectations/core/expect_column_values_to_be_unique.py) — so this
module is part of the training-data-pipeline extension surface.

Scale design
------------
Connected components run the alternating Large-Star / Small-Star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC 2014):
each round is two star passes over the (shrinking) edge list and converges
in O(log^2 n) rounds (2-3 rounds for the small, dense clusters near-dup
graphs produce). Everything stays in DataFrame ops:

* each star phase is ONE wide exchange: the neighborhood min rides a
  window aggregate (`min(v) over (partition by u)`) on the same hash
  shuffle that co-locates each node's rows — measured 1.65x over the
  textbook groupBy-min + join-back form, whose join re-exchanges what
  the aggregate already co-located (see BASELINE.md round-3 scaling);
* a hub's rows land in one partition either way; the windowed min is a
  single streaming pass over them (a 10^6-member boilerplate cluster is
  one partition-local scan, and the following `distinct` — a true
  aggregation — combines map-side);
* lineage is truncated every round with an eager `localCheckpoint()`
  (iterative plans otherwise grow exponentially and stall the optimizer);
  set `spark.sparkContext.setCheckpointDir(...)` and pass `reliable=True`
  for fault-tolerant lineage cuts on a real cluster.

Labels are the component's MINIMUM node id, so results are deterministic
and partitioning-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ._lineage import fused_checkpoint, tracked_checkpoint, unpersist_ids


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Distinct undirected edges as (u, v), self-loops and NULL endpoints
    dropped, each edge stored once with u > v (large endpoint first — the
    orientation Small-Star expects)."""
    e = edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
    return (
        e.where(F.col("__s").isNotNull() & F.col("__d").isNotNull()
                & (F.col("__s") != F.col("__d")))
        .select(
            F.greatest("__s", "__d").alias("u"),
            F.least("__s", "__d").alias("v"),
        )
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every neighbor larger than u to u's minimum neighborhood
    member: for each node u with neighbors N(u), emit (v, min(N(u) ∪ {u}))
    for v ∈ N(u), v > u.

    The neighborhood min rides a window over the SAME hash exchange that
    co-locates each u's rows — one wide shuffle of ``sym`` per star phase.
    The textbook groupBy-min + join-back costs two (the join re-exchanges
    ``sym``, and the agg branch scans/unions ``e`` a second time); measured
    on this operator the exchange volume, not skew or round count, is what
    bounds multi-executor scaling, so halving it is the honest fix. A hub
    key's rows all land in one partition either way (same as the join's
    build side); the per-row window min is one streaming pass, no combine
    needed because the reduce-side work is trivial."""
    from pyspark.sql import Window

    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    w = Window.partitionBy("u")
    return (
        sym.withColumn("__mn", F.least(F.min("v").over(w), F.col("u")))
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("__mn").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Within each node's smaller-or-equal neighborhood, connect everything
    (including u itself) to the minimum: edges arrive oriented u > v.

    Single-exchange window formulation as in ``_large_star``, with BOTH
    emissions — (v, mn) for every non-min neighbor and the node's own
    (u, mn) — exploded out of the one windowed branch. A
    ``nbrs.union(selfs)`` over two branches would execute the window
    subtree twice (Spark does not share subplans across union arms; the
    old groupBy+join form re-ran its join per arm the same way)."""
    from pyspark.sql import Window

    w = Window.partitionBy("u")
    pair = F.struct(F.col("v").alias("u"), F.col("__mn").alias("v"))
    own = F.struct(F.col("u").alias("u"), F.col("__mn").alias("v"))
    return (
        e.withColumn("__mn", F.min("v").over(w))
        .select(F.explode(
            F.when(F.col("v") != F.col("__mn"), F.array(pair, own))
            .otherwise(F.array(own))).alias("__s"))
        .select("__s.u", "__s.v")
        .distinct()
    )


def _driver_components(e: DataFrame) -> DataFrame:
    """Min-label union-find over a small collected edge list — identical
    labels to the converged star forest (component = smallest member id),
    one job instead of several per contraction round."""
    from pyspark.sql.types import StructField, StructType

    rows = e.collect()
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        ra, rb = find(r["u"]), find(r["v"])
        if ra != rb:
            # canonical edges guarantee orderable, non-null endpoints
            parent[max(ra, rb)] = min(ra, rb)
    out_rows = [(n, find(n)) for n in parent]

    typ = e.schema["u"].dataType
    schema = StructType([
        StructField("node", typ, False),
        StructField("component", typ, False),
    ])
    return e.sparkSession.createDataFrame(out_rows, schema)


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    *,
    nodes: DataFrame | None = None,
    node_col: str | None = None,
    max_iter: int = 25,
    reliable: bool = False,
    driver_threshold: int = 100_000,
) -> DataFrame:
    """Component label per node: ``(node, component)`` where ``component``
    is the smallest node id in the connected component.

    ``nodes`` (with ``node_col``, defaulting to ``src``) optionally supplies
    the full node universe — isolated nodes (no incident edge) come back as
    singleton components labeled by themselves; without it only nodes that
    appear in ``edges`` are labeled.

    ``reliable=True`` uses ``checkpoint()`` (requires
    ``setCheckpointDir``) instead of ``localCheckpoint()`` for the per-round
    lineage cut — survives executor loss on a real cluster.

    When the deduplicated edge set is at most ``driver_threshold`` rows
    (known for free — the first lineage cut already counts it), labels come
    from a driver-side min-label union-find instead of iterative star
    rounds: near-dup edge sets are usually tiny relative to the corpus
    (pairs survive LSH/threshold filtering), and each distributed round
    costs several jobs that dwarf a 100k-edge local pass. Past the
    threshold — billions of edges at crawl scale — the alternating
    Large-Star/Small-Star contraction runs unchanged. Set
    ``driver_threshold=0`` to force the distributed path.
    """
    e = _canonical_edges(edges, src, dst)
    e, live_ids = tracked_checkpoint(e, reliable=reliable)
    prev_n = e.count()

    if prev_n <= driver_threshold:
        out = _driver_components(e)
    else:
        for _ in range(max_iter):
            # Large-Star output already satisfies the u > v orientation
            # Small-Star expects: it emits (v, least(u, mn)) with v > u ≥
            # least(u, mn), so no re-orientation pass is needed.
            stars = _small_star(_large_star(e))
            stars, new_ids = tracked_checkpoint(stars, reliable=reliable)
            # convergence: the distinct edge set is unchanged (both are
            # distinct, so equal counts + empty difference ⇔ equal sets)
            n = stars.count()
            converged = n == prev_n and stars.subtract(e).isEmpty()
            # the previous round's pinned blocks have now served their two
            # consumers (star expansion + convergence subtract) — free them
            # or O(rounds) edge-set copies accumulate and starve execution
            # memory (checkpoint blocks are eviction-exempt)
            unpersist_ids(stars, live_ids)
            live_ids = new_ids
            if converged:
                e = stars
                break
            e, prev_n = stars, n
        else:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} rounds")

        # converged star forest: every edge is (member, root); roots label
        # themselves
        labels = e.select(
            F.col("u").alias("node"), F.col("v").alias("component"))
        roots = e.select(
            F.col("v").alias("node"), F.col("v").alias("component"))
        out = labels.union(roots).distinct()

    if nodes is not None:
        nc = node_col or src
        universe = nodes.select(F.col(nc).alias("node")).where(
            F.col("node").isNotNull()).distinct()
        singletons = universe.join(out, "node", "left_anti").select(
            F.col("node"), F.col("node").alias("component"))
        out = out.union(singletons)
    return out


# ------------------------------------------------------- pair verification


def pair_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
) -> DataFrame:
    """Exact word-shingle Jaccard for EXACTLY the candidate pairs given
    (columns ``id_a``/``id_b``) — unlike ``ngram_jaccard_pairs`` (which
    enumerates every shared-shingle pair) this stays linear in
    |pairs| × shingles-per-doc: only docs referenced by some pair are
    shingled (semi-join pushdown), and intersections are counted via two
    hash joins on the 8-byte shingle hash."""
    from great_expectations_spark.pipeline.dedup import (
        hashed_shingles,
        hashed_tokens,
        tokens,
    )

    # `pairs` feeds four plan branches below (endpoint set twice, the
    # intersection join, the final left join); when it arrives as the raw
    # LSH subtree (dedup_cluster_assignments' verify path) each branch
    # would re-run shingling + banding — materialize it once
    pairs = pairs.transform(fused_checkpoint)
    wanted = (
        pairs.select(F.col("id_a").alias("__id"))
        .union(pairs.select(F.col("id_b").alias("__id")))
        .distinct()
    )
    # no broadcast hint: the endpoint set scales with |pairs| (can be 10^8
    # ids on a web corpus) — AQE picks broadcast only when it actually fits
    sh = (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("__id"), F.col(text_col).alias("__txt"))
        .join(wanted, "__id", "left_semi")
        .select("__id", tokens(F.col("__txt")).alias("__t"))
        .select("__id", hashed_tokens(F.col("__t")).alias("__th"))
        .select("__id", hashed_shingles(F.col("__th"), shingle_n).alias("__h"))
    )
    # the shingling subtree (tokenize + per-token md5) feeds four plan
    # branches (both join sides + both size lookups); an eager fused_checkpoint
    # materializes it once and reuses the blocks instead of recomputing
    sh = sh.transform(fused_checkpoint)
    ex = sh.select("__id", F.explode("__h").alias("s"))
    sizes = sh.select("__id", F.size("__h").alias("sz"))
    inter = (
        pairs.join(ex.select(F.col("__id").alias("id_a"), "s"), "id_a")
        .join(ex.select(F.col("__id").alias("id_b"), "s"), ["id_b", "s"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("__id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("__id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .join(sa, "id_a", "left")
        .join(sb, "id_b", "left")
        .select(
            "id_a", "id_b",
            F.round(
                F.coalesce(F.col("inter"), F.lit(0))
                / (F.col("sz_a") + F.col("sz_b") - F.coalesce(F.col("inter"), F.lit(0))),
                6,
            ).alias("jaccard"),
        )
    )


# ------------------------------------------------------ end-to-end dedup


def exact_duplicate_edges(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id_a, id_b) edges linking every exact duplicate (same md5 digest of
    ``text_col``) to its group's minimum id — |duplicates| edges total, one
    groupBy on the 16-byte digest."""
    from great_expectations_spark.pipeline.dedup import _md5

    d = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("__id"), _md5(F.col(text_col)).alias("__h"))
    return _edges_from_digests(d)


def _edges_from_digests(d: DataFrame) -> DataFrame:
    """Exact-duplicate edges from a ``(__id, __h)`` digest frame: each dup
    links to its group's min id. The digest groupBy moves 16-byte hashes,
    never text."""
    hubs = d.groupBy("__h").agg(F.min("__id").alias("__hub"),
                                F.count(F.lit(1)).alias("__n"))
    return (
        d.join(hubs.where(F.col("__n") > 1), "__h")
        .where(F.col("__id") != F.col("__hub"))
        .select(F.col("__id").alias("id_a"), F.col("__hub").alias("id_b"))
    )


def dedup_cluster_assignments(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
    jaccard_threshold: float | None = None,
    include_exact: bool = True,
    max_bucket_size: int | None = 10_000,
    max_iter: int = 25,
    reliable: bool = False,
) -> DataFrame:
    """Full near-dup clustering: one row per input doc with
    ``(id, cluster, is_canonical)``.

    ``max_bucket_size`` mirrors ``minhash_lsh_candidates``'s default-on
    hot-bucket cap (an explicit ``None`` here previously overrode that
    default — the one path that silently re-opened the quadratic
    degenerate-bucket hole); pass ``None`` to opt out knowingly.

    Stages: MinHash-LSH candidate pairs (optionally verified by exact
    shingle Jaccard ≥ ``jaccard_threshold``) ∪ exact-duplicate edges →
    connected components → cluster = component min id; the canonical doc is
    the cluster-id holder (deterministic min-id policy — swap in a quality
    score upstream by remapping ids if needed). Docs with no near-dup are
    singleton clusters of themselves.

    With ``include_exact`` (the default) the exact digests and the MinHash
    banding share ONE text scan (``digest_and_buckets``) — the corpus is
    read once, not once per edge source.
    """
    from great_expectations_spark.pipeline.dedup import (
        _pairs_from_triples,
        digest_and_buckets,
        minhash_lsh_candidates,
    )

    if include_exact:
        # ONE text scan feeds both the exact digests and the LSH banding
        # (separately, minhash_lsh_candidates + exact_duplicate_edges each
        # read the corpus once — the second full 100 TB pass exists only
        # because the digest didn't ride the signature scan)
        digests, triples = digest_and_buckets(
            df, id_col, text_col, k=k, bands=bands, shingle_n=shingle_n)
        pairs = _pairs_from_triples(triples, max_bucket_size)
    else:
        pairs = minhash_lsh_candidates(
            df, id_col, text_col, k=k, bands=bands, shingle_n=shingle_n,
            max_bucket_size=max_bucket_size)
    if jaccard_threshold is not None:
        pairs = (
            pair_jaccard(df, pairs, id_col, text_col, shingle_n=shingle_n)
            .where(F.col("jaccard") >= jaccard_threshold)
            .select("id_a", "id_b")
        )
    if include_exact:
        pairs = pairs.union(_edges_from_digests(digests))

    comp = connected_components(pairs, "id_a", "id_b",
                                max_iter=max_iter, reliable=reliable)
    return (
        df.select(F.col(id_col).alias("id"))
        .join(comp.withColumnRenamed("node", "id"), "id", "left")
        .select(
            "id",
            F.coalesce(F.col("component"), F.col("id")).alias("cluster"),
        )
        # eqNullSafe: a NULL id never joins an edge (edges drop NULL
        # endpoints), so it is its own singleton canonical — a plain ==
        # would yield NULL and silently drop the row from any filter
        .withColumn("is_canonical", F.col("id").eqNullSafe(F.col("cluster")))
    )


def dedup_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    **kwargs,
) -> DataFrame:
    """The corpus with one canonical doc kept per near-dup cluster (all
    original columns preserved). Kwargs forward to
    ``dedup_cluster_assignments``."""
    assign = dedup_cluster_assignments(df, id_col, text_col, **kwargs)
    keep = assign.where("is_canonical").select(F.col("id").alias(id_col))
    kept = df.join(keep, id_col, "left_semi")
    # NULL-id rows are singleton canonicals but an equi-semi-join never
    # matches NULL keys — pass them through explicitly
    return kept.unionByName(df.where(F.col(id_col).isNull()))


def cluster_size_stats(assignments: DataFrame) -> DataFrame:
    """Cluster-size histogram from an assignment frame:
    ``(cluster_size, n_clusters, n_docs)`` — the shape of the duplicate
    mass (how much of the corpus sits in how-big clusters)."""
    sizes = assignments.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("cluster_size"))
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).cast("long").alias("n_clusters"))
        .select(
            F.col("cluster_size").cast("long"),
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).cast("long").alias("n_docs"),
        )
    )
