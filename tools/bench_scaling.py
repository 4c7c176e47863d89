"""N vs 4N executor-scaling evidence for the north rule.

A real multi-node cluster is unavailable in this sandbox, so the
two-cluster-size criterion is evidenced the sanctioned way: the SAME fused
validation job over the SAME on-disk parquet input runs on a
``local-cluster`` with N and 4N executor processes (separate JVMs, own
heaps — the faithful local analogue of executor scaling):

    N  = local-cluster[2,4,4096]   (2 executors x 4 cores)
    4N = local-cluster[8,4,4096]   (8 executors x 4 cores)

scaling efficiency = (rows/s at 4N) / (4 * rows/s at N).

Methodology notes (this host is a noisy shared VM — throughput can swing
2x between minutes):
  * configs are measured in ALTERNATING rounds (N, 4N, N, 4N) and the
    best run per config is kept, so host-level noise hits both sides;
  * a pure-codegen integer aggregation measures the host's own scaling
    ceiling alongside, so engine efficiency can be read against what the
    hardware actually delivers;
  * the workload is the 9-expectation fused suite (counts, null/set/
    length/regex conditions, mean, HLL distinct) — per-row work that
    grows with data. The GK quantile sketch is benchmarked separately in
    bench.py: its merge cost is O(partitions), not O(rows), so at 10^12
    rows it amortizes to noise but at 8M rows it would dominate and
    measure the merge, not the scan.

Usage:
    python tools/bench_scaling.py                 # full matrix, prints JSON
    python tools/bench_scaling.py --worker N engine|calib   # internal
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = int(os.environ.get("SPARK_GRAFT_SCALING_ROWS", 192_000_000))
MAX_TOKENS = 60
PARTITIONS = 256
REPS = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", 3))
CALIB_ROWS = int(os.environ.get("SPARK_GRAFT_SCALING_CALIB_ROWS", 16_000_000_000))
DATA_DIR = f"/tmp/ges_scaling_pages_{N_ROWS}"

# two N->4N pairs: "small" (2->8 busy threads) sits where this VM's vCPU
# scheduling still scales ~linearly; "large" (8->32) probes the host's own
# saturation region (see hardware ceiling in the report).
# Per-executor heap is configurable (MB) because memory-hungry iterative
# workloads (CC checkpoint blocks) OOM a 4g executor at the small pair's
# 1-executor N topology; the SAME per-executor heap is used at N and 4N so
# the scaling comparison stays fair.
EXEC_MEM_MB = int(os.environ.get("SPARK_GRAFT_SCALING_EXEC_MEM_MB", 4096))
PAIRS = {
    "small": {
        "N": (f"local-cluster[1,2,{EXEC_MEM_MB}]", 2),
        "4N": (f"local-cluster[4,2,{EXEC_MEM_MB}]", 8),
    },
    "large": {
        "N": (f"local-cluster[2,4,{EXEC_MEM_MB}]", 8),
        "4N": (f"local-cluster[8,4,{EXEC_MEM_MB}]", 32),
    },
}
PAIR = os.environ.get("SPARK_GRAFT_SCALING_PAIR", "large")
MASTERS = PAIRS[PAIR]


def _gen_data() -> None:
    if os.path.exists(os.path.join(DATA_DIR, "_SUCCESS")):
        return
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from great_expectations_spark.sources.session import get_spark
    from great_expectations_spark.sources.webpages import webpages
    from pyspark.sql import functions as F

    spark = get_spark(cores=32, app="scaling-gen")
    (
        webpages(spark, N_ROWS, partitions=PARTITIONS, max_tokens=MAX_TOKENS)
        .withColumn("warc_ts_epoch", F.unix_timestamp("warc_ts").cast("double"))
        .drop("html")
        .write.mode("overwrite").parquet(DATA_DIR)
    )
    spark.stop()


def _session(label: str):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from great_expectations_spark.sources.session import get_spark

    master, cores = MASTERS[label]
    # each executor JVM must size its GC/JIT/common pools for ITS 4 cores,
    # not the 32 host vCPUs — otherwise 8 executors spawn ~200 service
    # threads and the 4N cluster loses to the N cluster on this one box
    exec_opts = f"-XX:ActiveProcessorCount={MASTERS['N'][0].split(',')[1]}"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return get_spark(cores=master, app=f"scaling-{label}",
                     shuffle_partitions=cores * 2,
                     extra_conf={"spark.executor.extraJavaOptions": exec_opts,
                                 # executor python workers must import the
                                 # package (Arrow UDF memo in bpe_encode)
                                 "spark.executorEnv.PYTHONPATH": repo,
                                 # local-cluster's [n,cores,mem] only sizes
                                 # the worker SLOT; the executor JVM heap is
                                 # spark.executor.memory (default 1g) and
                                 # must be set explicitly to match
                                 "spark.executor.memory": f"{EXEC_MEM_MB}m",
                                 # smaller input splits smooth the last wave
                                 "spark.sql.files.maxPartitionBytes": "48m"}), cores


def _engine_run(label: str) -> dict:
    from great_expectations_spark import ExpectationSuite, validate

    spark, cores = _session(label)
    df = spark.read.parquet(DATA_DIR)
    df.selectExpr("sum(length(text))", "sum(length(url))").first()  # warm page cache

    suite = (
        ExpectationSuite(name="scaling")
        .add("expect_table_row_count_to_be_between", min_value=1)
        .add("expect_column_values_to_not_be_null", column="url")
        .add("expect_column_values_to_match_regex",
             column="url", regex=r"^https://d\d+\.example/")
        .add("expect_column_values_to_not_be_null", column="text", mostly=0.9)
        .add("expect_column_values_to_be_in_set",
             column="lang",
             value_set=["en", "de", "fr", "es", "zh", "ru", "ja", "pt"], mostly=0.99)
        .add("expect_column_value_lengths_to_be_between",
             column="text", min_value=1, max_value=10_000_000, mostly=0.9)
        .add("expect_column_unique_value_count_to_be_between",
             column="lang", min_value=1, max_value=100)
        .add("expect_column_mean_to_be_between", column="warc_ts_epoch", min_value=0)
        .add("expect_column_values_to_match_regex", column="lang", regex="^[a-z]{2}$",
             mostly=0.99)
    )
    best = float("inf")
    for _ in range(REPS):
        t0 = time.time()
        res = validate(df, suite, result_format="BOOLEAN_ONLY")
        best = min(best, time.time() - t0)
        assert len(res.results) == 9
    spark.stop()
    return {"label": label, "master": MASTERS[label][0], "cores": cores,
            "rows": N_ROWS, "best_sec": round(best, 4),
            "rows_per_sec": round(N_ROWS / best, 2)}


def _mono_run(label: str) -> dict:
    """Increasing-check scaling: the round-2 distributed monotonicity plan
    (range repartition + lag within partitions + P boundary rows) over the
    same parquet, ordered by warc_ts_epoch. The round-1 plan (global
    single-partition window) could not scale at all — every row through one
    task; this one must track executor count."""
    from great_expectations_spark import ExpectationSuite, validate

    spark, cores = _session(label)
    df = spark.read.parquet(DATA_DIR)
    df.selectExpr("sum(warc_ts_epoch)").first()  # warm page cache

    suite = ExpectationSuite(name="mono").add(
        "expect_column_values_to_be_increasing",
        column="warc_ts_epoch", order_by="warc_ts_epoch")
    best = float("inf")
    for _ in range(REPS):
        t0 = time.time()
        res = validate(df, suite, result_format="BOOLEAN_ONLY")
        best = min(best, time.time() - t0)
        assert not res.results[0].exception_info["raised_exception"]
    spark.stop()
    return {"label": label, "master": MASTERS[label][0], "cores": cores,
            "rows": N_ROWS, "best_sec": round(best, 4),
            "rows_per_sec": round(N_ROWS / best, 2)}


def _grouped_run(label: str) -> dict:
    """Grouped-validation scaling: per-domain suite verdicts in one
    groupBy-agg (grouped.validate_by) over ~1000 Zipf-skewed domains (d0
    carries 20% of rows). Partial aggregation makes the map side do the
    per-row work; the shuffle moves one row per (group, partition) — this
    must track executor count like the fused suite does."""
    from great_expectations_spark import ExpectationSuite
    from great_expectations_spark.grouped import validate_by
    from pyspark.sql import functions as F

    spark, cores = _session(label)
    df = (spark.read.parquet(DATA_DIR)
          .withColumn("domain", F.regexp_extract(
              "url", r"^https://([^/]+)/", 1)))
    df.selectExpr("sum(length(text))", "sum(length(url))").first()

    suite = (
        ExpectationSuite(name="grp")
        .add("expect_column_values_to_not_be_null", column="text", mostly=0.9)
        .add("expect_column_values_to_be_in_set",
             column="lang",
             value_set=["en", "de", "fr", "es", "zh", "ru", "ja", "pt"],
             mostly=0.95)
        .add("expect_column_values_to_match_regex",
             column="url", regex=r"^https://d\d+\.example/", mostly=0.99)
        .add("expect_column_mean_to_be_between",
             column="warc_ts_epoch", min_value=0)
        .add("expect_table_row_count_to_be_between", min_value=1)
    )
    best = float("inf")
    for _ in range(REPS):
        t0 = time.time()
        n = validate_by(df, suite, ["domain"]).count()
        best = min(best, time.time() - t0)
        assert n >= 5  # groups x expectations
    spark.stop()
    return {"label": label, "master": MASTERS[label][0], "cores": cores,
            "rows": N_ROWS, "best_sec": round(best, 4),
            "rows_per_sec": round(N_ROWS / best, 2)}


CC_NODES = int(os.environ.get("SPARK_GRAFT_SCALING_CC_NODES", 10_000_000))
# ~exp(10M / 870k) ≈ 97k clusters, Zipf-1 sizes: cluster k has ~C/k
# members, the largest ≈ 0.69*C ≈ 600k — a power-law hub-degree
# distribution (the boilerplate-cluster shape of real near-dup graphs)
CC_ZIPF_C = float(os.environ.get("SPARK_GRAFT_SCALING_CC_C", 870_000))
CC_DATA_DIR = f"/tmp/ges_scaling_cc_{CC_NODES}"


def _cc_gen() -> None:
    """Materialize the power-law star edges ONCE (construction needs a
    groupBy-min + join to find each cluster's hub — that cost must not
    pollute the timed CC runs)."""
    if os.path.exists(os.path.join(CC_DATA_DIR, "_SUCCESS")):
        return
    from great_expectations_spark.sources.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(cores=32, app="scaling-cc-gen")
    base = (
        spark.range(0, CC_NODES, 1, 256)
        .select("id", F.floor(F.exp(F.col("id") / F.lit(CC_ZIPF_C)))
                .alias("k"))
    )
    hubs = base.groupBy("k").agg(F.min("id").alias("hub"))
    (
        base.join(hubs, "k")
        .where("id != hub")
        .select(F.col("id").alias("id_a"), F.col("hub").alias("id_b"))
        .write.mode("overwrite").parquet(CC_DATA_DIR)
    )
    spark.stop()


def _cc_run(label: str) -> dict:
    """Connected-components scaling: duplicate-cluster resolution
    (pipeline/cluster.py Large-Star/Small-Star) over a POWER-LAW star edge
    list — Zipf-1 cluster sizes (largest ≈ 600k members, ~97k clusters),
    the boilerplate-heavy shape of real crawl near-dup graphs, with
    ``driver_threshold=0`` so every round runs the DISTRIBUTED min-label
    path (no driver union-find short-circuit). min's map-side partial
    aggregation under hub skew is what must keep this tracking executor
    count."""
    from great_expectations_spark.pipeline.cluster import connected_components

    spark, cores = _session(label)
    edges = spark.read.parquet(CC_DATA_DIR)
    n_edges = edges.count()  # warms page cache; CC_NODES - n_clusters
    best = float("inf")
    # in-process reps (each CC run is ~10 Spark jobs; the outer
    # alternating rounds still sample each topology); tunable so big-graph
    # runs (per-rep minutes) stay inside the worker timeout
    for _ in range(int(os.environ.get("SPARK_GRAFT_SCALING_CC_REPS", 2))):
        t0 = time.time()
        members = connected_components(
            edges, "id_a", "id_b", driver_threshold=0).where(
            "node != component").count()
        best = min(best, time.time() - t0)
        assert members == n_edges  # every non-hub resolves to its hub
    spark.stop()
    return {"label": label, "master": MASTERS[label][0], "cores": cores,
            "rows": n_edges, "best_sec": round(best, 4),
            "rows_per_sec": round(n_edges / best, 2)}


PARA_ROWS = int(os.environ.get("SPARK_GRAFT_SCALING_PARA_ROWS", 8_000_000))


def _para_run(label: str) -> dict:
    """Paragraph-dedup scaling: the shuffle-bound counterpart to the
    agg-only workloads. Keep-first election is a map-combinable groupBy
    over word digests (tiny after combine — the vocabulary is small), the
    keeper join broadcasts under AQE, and the reassembly hash-shuffles all
    ~30 segments/doc — the exchange volume is what must track executor
    count. Rows/s is docs/s."""
    from pyspark.sql import functions as F

    from great_expectations_spark.pipeline.paragraph import paragraph_dedup

    spark, cores = _session(label)
    # deterministic ~PARA_ROWS hash-sample (scan-parallel, no global limit);
    # id = hash(url, warc_ts) — unique here (dup urls differ in warc_ts)
    k = max(1, N_ROWS // PARA_ROWS)
    df = (spark.read.parquet(DATA_DIR)
          .where(F.pmod(F.xxhash64("url"), F.lit(k)) == 0)
          .select(F.xxhash64("url", "warc_ts").alias("id"), "text"))
    n_in = df.count()  # also warms the page cache

    best = float("inf")
    for _ in range(2):  # explode-heavy: 2 in-process reps
        t0 = time.time()
        n = paragraph_dedup(df, id_col="id", text_col="text",
                            sep=" ", min_chars=1).count()
        best = min(best, time.time() - t0)
        assert n == n_in
    spark.stop()
    return {"label": label, "master": MASTERS[label][0], "cores": cores,
            "rows": n_in, "best_sec": round(best, 4),
            "rows_per_sec": round(n_in / best, 2)}


RECIPE_ROWS = int(os.environ.get("SPARK_GRAFT_SCALING_RECIPE_ROWS", 16_000_000))


def _recipe_run(label: str) -> dict:
    """Cleaning-recipe scaling (round-2 pipeline/recipes.py): three fused
    keep-predicates (zero extra jobs) then keep-first exact dedup on the
    survivors — per-row predicate work map-side, then ONE digest+id shuffle
    for keeper election and ONE id-keyed join back. The join/shuffle volume
    is what must track executor count. Rows/s is docs/s."""
    from pyspark.sql import functions as F

    from great_expectations_spark.pipeline.recipes import (
        exact_dedup_stage, predicate_stage, run_recipe)

    spark, cores = _session(label)
    k = max(1, N_ROWS // RECIPE_ROWS)
    df = (spark.read.parquet(DATA_DIR)
          .where(F.pmod(F.xxhash64("url"), F.lit(k)) == 0)
          .select(F.xxhash64("url", "warc_ts").alias("id"), "url", "text",
                  "lang"))
    n_in = df.count()  # also warms the page cache

    recipe = [
        predicate_stage("nonnull", lambda d: F.col("text").isNotNull()),
        predicate_stage("min_len", lambda d: F.length("text") >= 20),
        predicate_stage(
            "lang", lambda d: F.col("lang").isin(
                "en", "de", "fr", "es", "zh", "ru", "ja", "pt")),
        exact_dedup_stage("exact_dup", "id", "text"),
    ]
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        stats = {r["stage"]: r["n"]
                 for r in run_recipe(df, recipe, "id").stats().collect()}
        best = min(best, time.time() - t0)
        assert sum(stats.values()) == n_in
    spark.stop()
    return {"label": label, "master": MASTERS[label][0], "cores": cores,
            "rows": n_in, "best_sec": round(best, 4),
            "rows_per_sec": round(n_in / best, 2)}


def _doc_sample_dir(rows: int) -> str:
    return f"/tmp/ges_scaling_docsample_{N_ROWS}_{rows}"


def _doc_sample_gen(rows: int) -> None:
    """Materialize a deterministic (id, text) sample of DATA_DIR ONCE per
    size: the operator workloads must time the OPERATOR, not a re-scan of
    the 192M-row source per rep (the pmod filter reads every row)."""
    out = _doc_sample_dir(rows)
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return
    from great_expectations_spark.sources.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(cores=32, app="scaling-docsample-gen")
    k = max(1, N_ROWS // rows)
    (spark.read.parquet(DATA_DIR)
     .where(F.pmod(F.xxhash64("url"), F.lit(k)) == 0)
     .select(F.xxhash64("url", "warc_ts").alias("id"), "text")
     .repartition(64)
     .write.mode("overwrite").parquet(out))
    spark.stop()


BM25_ROWS = int(os.environ.get("SPARK_GRAFT_SCALING_BM25_ROWS", 4_800_000))


def _bm25_run(label: str) -> dict:
    """BM25 retrieval scaling (round-4: never previously through the
    harness): index (tokenize + explode + map-combinable groupBy) and
    search (broadcast query-vocab semi-join, hits-only shuffles, salted
    two-phase top-k) over a deterministic webpage sample. The postings
    groupBy and the hits shuffle are what must track executor count.
    16 queries drawn from the synthetic w<id> vocabulary hit ~1%-of-docs
    tokens each, so the candidate sets are corpus-fraction-sized (the
    salted top-k's reason to exist). Rows/s is docs/s. Caches are scope-
    swept per rep so reps don't compound storage."""
    from pyspark.sql import functions as F

    from great_expectations_spark.pipeline._lineage import scoped_fused_caches
    from great_expectations_spark.pipeline.retrieval import bm25_search

    spark, cores = _session(label)
    docs = spark.read.parquet(_doc_sample_dir(BM25_ROWS))
    n_in = docs.count()  # warms page cache
    queries = spark.createDataFrame(
        [(q, " ".join(f"w{(q * 977 + j * 131) % 5000}" for j in range(4)))
         for q in range(16)],
        "query_id int, text string")

    best = float("inf")
    for _ in range(2):
        with scoped_fused_caches() as frames:
            t0 = time.time()
            n = bm25_search(docs, queries, "id", "text", top_k=10).count()
            best = min(best, time.time() - t0)
        for f in frames:
            f.unpersist()
        assert n > 0
    spark.stop()
    return {"label": label, "master": MASTERS[label][0], "cores": cores,
            "rows": n_in, "best_sec": round(best, 4),
            "rows_per_sec": round(n_in / best, 2)}


PR_EDGES = int(os.environ.get("SPARK_GRAFT_SCALING_PR_EDGES", 48_000_000))
PR_HOSTS = int(os.environ.get("SPARK_GRAFT_SCALING_PR_HOSTS", 100_000))
PR_DATA_DIR = f"/tmp/ges_scaling_pr_{PR_EDGES}"


def _pr_gen() -> None:
    """Materialize a power-law host graph ONCE: src uniform over hosts,
    dst log-uniform (Zipf-1-ish in-degree — host 0 is the hub), the
    in-degree skew real crawl host graphs have."""
    if os.path.exists(os.path.join(PR_DATA_DIR, "_SUCCESS")):
        return
    from great_expectations_spark.sources.session import get_spark
    from pyspark.sql import functions as F
    import math

    spark = get_spark(cores=32, app="scaling-pr-gen")
    h = lambda s: F.abs(F.xxhash64("id", F.lit(s)))
    ln_h = math.log(PR_HOSTS)
    (
        spark.range(0, PR_EDGES, 1, 256)
        .select(
            (h(1) % PR_HOSTS).alias("src"),
            F.floor(F.exp((h(2) % 1_000_000) / 1_000_000.0 * ln_h))
            .cast("long").alias("dst"))
        .write.mode("overwrite").parquet(PR_DATA_DIR)
    )
    spark.stop()


def _pagerank_run(label: str) -> dict:
    """PageRank scaling (round-4): 3 iterations over the power-law host
    graph. The degree-annotated edge list persists once; the
    per-iteration exchange is the rank side plus one map-combinable
    contribution groupBy — in-degree skew (hub host 0) is absorbed by
    partial aggregation, which is what must keep this tracking executor
    count. Rows/s is edges/s (edges × iterations is the real work)."""
    from great_expectations_spark.pipeline.graph import pagerank

    spark, cores = _session(label)
    edges = spark.read.parquet(PR_DATA_DIR)
    n_edges = edges.count()  # warms page cache
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        s = pagerank(edges, "src", "dst", iterations=3).agg(
            {"rank": "sum"}).first()[0]
        best = min(best, time.time() - t0)
        assert abs(s - 1.0) < 1e-6  # ranks sum to 1
    spark.stop()
    return {"label": label, "master": MASTERS[label][0], "cores": cores,
            "rows": n_edges, "best_sec": round(best, 4),
            "rows_per_sec": round(n_edges / best, 2)}


BPE_ROWS = int(os.environ.get("SPARK_GRAFT_SCALING_BPE_ROWS", 2_000_000))
BPE_MERGES = int(os.environ.get("SPARK_GRAFT_SCALING_BPE_MERGES", 256))


def _bpe_run(label: str) -> dict:
    """BPE scaling (round-4): full train + encode — ONE piece-dict scan
    (regexp pre-tokenize + explode + groupBy), the driver-bound heap
    trainer over the bounded dict, then the Arrow rank-order encode of
    every document (row-local, zero exchanges). The piece scan and the
    encode pass are the distributed work that must track executor count;
    the driver merge loop is a fixed cost that amortizes with corpus
    size. Rows/s is docs/s."""
    from pyspark.sql import functions as F

    from great_expectations_spark.pipeline.bpe import bpe_encode, train_bpe

    spark, cores = _session(label)
    docs = spark.read.parquet(_doc_sample_dir(BPE_ROWS))
    n_in = docs.count()  # warms page cache
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        merges = train_bpe(docs, "id", "text", num_merges=BPE_MERGES,
                           max_pieces=50_000)
        n = bpe_encode(docs, merges, "id", "text").where(
            "n_bpe IS NOT NULL").count()
        best = min(best, time.time() - t0)
        assert n > 0
    spark.stop()
    return {"label": label, "master": MASTERS[label][0], "cores": cores,
            "rows": n_in, "best_sec": round(best, 4),
            "rows_per_sec": round(n_in / best, 2)}


SUBSTR_ROWS = int(os.environ.get("SPARK_GRAFT_SCALING_SUBSTR_ROWS", 400_000))


def _substring_run(label: str) -> dict:
    """ExactSubstr token-span dedup scaling (round-4; sf1 evidence for
    throughput lives in bench_results/sf1_stress_r3.json — this measures
    how the plan SCALES): the ONE linear (window-key, id, idx) shuffle +
    min-struct keeper election + HOF span removal over a webpage sample.
    The window-key exchange volume (tokens × ~window rows per doc) is
    what must track executor count. Rows/s is docs/s."""
    from pyspark.sql import functions as F

    from great_expectations_spark.pipeline.substring import dedup_substrings

    spark, cores = _session(label)
    docs = spark.read.parquet(_doc_sample_dir(SUBSTR_ROWS))
    n_in = docs.count()  # warms page cache
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        n = dedup_substrings(docs, "id", "text", window=8).count()
        best = min(best, time.time() - t0)
        assert n == n_in  # rows pass through, spans are cut in place
    spark.stop()
    return {"label": label, "master": MASTERS[label][0], "cores": cores,
            "rows": n_in, "best_sec": round(best, 4),
            "rows_per_sec": round(n_in / best, 2)}


def _profiler_run(label: str) -> dict:
    """Round-5 surface: OnboardingDataAssistant with a REAL date_part
    batch_spec over the webpages parquet — one fused domain agg, one
    fused metric agg, ONE groupBy(day(warc_ts)) for every numeric range
    builder, one format-inference scan. The per-row cost (regex
    candidate evaluation, distinct counting) grows with data, so this
    measures the profiling path's own N→4N scaling."""
    from great_expectations_spark import run_onboarding_assistant

    spark, cores = _session(label)
    df = spark.read.parquet(DATA_DIR)
    df.selectExpr("sum(length(text))", "sum(length(url))").first()  # warm
    best = float("inf")
    for _ in range(REPS):
        t0 = time.time()
        res = run_onboarding_assistant(
            df, batch_spec={"splitter": "date_part", "column": "warc_ts",
                            "part": "day"},
            # per-row-Python format inference rides a deterministic 1/101
            # sample (still ~hundreds of thousands of rows) — the
            # documented crawl-scale configuration; everything else is
            # exact full-table JVM aggregation
            format_sample_mod=101)
        best = min(best, time.time() - t0)
        assert len(res.suite.expectations) > 5
    spark.stop()
    return {"label": label, "master": MASTERS[label][0], "cores": cores,
            "rows": N_ROWS, "best_sec": round(best, 4),
            "rows_per_sec": round(N_ROWS / best, 2)}


def _calib_run(label: str) -> dict:
    """Host scaling ceiling: embarrassingly-parallel codegen aggregation."""
    from pyspark.sql import functions as F

    spark, cores = _session(label)
    best = float("inf")
    for _ in range(REPS):
        t0 = time.time()
        spark.range(0, CALIB_ROWS, 1, 512).select(
            F.sum(F.xxhash64("id") % 1000).alias("s"),
            F.sum(F.xxhash64("id", F.lit(1)) % 7).alias("t"),
        ).first()
        best = min(best, time.time() - t0)
    spark.stop()
    return {"label": label, "master": MASTERS[label][0], "cores": cores,
            "rows": CALIB_ROWS, "best_sec": round(best, 4),
            "rows_per_sec": round(CALIB_ROWS / best, 2)}


SHUF_ROWS = int(os.environ.get("SPARK_GRAFT_SCALING_SHUF_ROWS", 200_000_000))


def _shufcalib_run(label: str) -> dict:
    """Host SHUFFLE ceiling: a pure hash-exchange workload — groupBy on a
    per-row-unique key, so map-side combine cannot reduce the exchange and
    every row crosses the shuffle (write + fetch + sort). The codegen
    calibration (_calib_run) never touches the shuffle path; on one
    physical box the N and 4N "clusters" share ONE disk and ONE memory
    bus for shuffle blocks, so shuffle-bound workloads (CC's per-round
    exchanges) must be read against THIS ceiling, not the codegen one —
    on a real multi-node cluster each executor brings its own disk/NIC
    and this ceiling rises toward the codegen one."""
    from pyspark.sql import functions as F

    spark, cores = _session(label)
    best = float("inf")
    for _ in range(REPS):
        t0 = time.time()
        (spark.range(0, SHUF_ROWS, 1, 256)
         .select(F.xxhash64("id").alias("k"),
                 (F.xxhash64("id", F.lit(1)) % 1000).alias("v"))
         .groupBy("k").agg(F.sum("v").alias("sv"))
         .select(F.sum("sv")).first())
        best = min(best, time.time() - t0)
    spark.stop()
    return {"label": label, "master": MASTERS[label][0], "cores": cores,
            "rows": SHUF_ROWS, "best_sec": round(best, 4),
            "rows_per_sec": round(SHUF_ROWS / best, 2)}


def _spawn(label: str, kind: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM="8g")
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker", label, kind],
        capture_output=True, text=True,
        timeout=int(os.environ.get("SPARK_GRAFT_SCALING_TIMEOUT", 900)),
        env=env,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"worker {label}/{kind} produced no result:\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main() -> None:
    # SPARK_GRAFT_SCALING_SKIP_ENGINE=1 drops the 9-expectation fused
    # suite (and its big parquet gen) so a single operator's scaling can
    # be measured alone — the hardware-ceiling calibration still runs.
    skip_engine = bool(os.environ.get("SPARK_GRAFT_SCALING_SKIP_ENGINE"))
    if not skip_engine:
        _gen_data()
    kinds = () if skip_engine else ("engine",)
    if os.environ.get("SPARK_GRAFT_SCALING_MONO"):
        kinds += ("mono",)
    if os.environ.get("SPARK_GRAFT_SCALING_GROUPED"):
        kinds += ("grouped",)
    if os.environ.get("SPARK_GRAFT_SCALING_CC"):
        _cc_gen()
        kinds += ("cc",)
    if os.environ.get("SPARK_GRAFT_SCALING_PARA"):
        kinds += ("para",)
    if os.environ.get("SPARK_GRAFT_SCALING_RECIPE"):
        kinds += ("recipe",)
    if os.environ.get("SPARK_GRAFT_SCALING_SHUFFLE"):
        kinds += ("shuffle",)
    if os.environ.get("SPARK_GRAFT_SCALING_BM25"):
        _doc_sample_gen(BM25_ROWS)
        kinds += ("bm25",)
    if os.environ.get("SPARK_GRAFT_SCALING_PAGERANK"):
        _pr_gen()
        kinds += ("pagerank",)
    if os.environ.get("SPARK_GRAFT_SCALING_BPE"):
        _doc_sample_gen(BPE_ROWS)
        kinds += ("bpe",)
    if os.environ.get("SPARK_GRAFT_SCALING_SUBSTR"):
        _doc_sample_gen(SUBSTR_ROWS)
        kinds += ("substring",)
    if os.environ.get("SPARK_GRAFT_SCALING_PROFILER"):
        kinds += ("profiler",)
    # the operator samples slice DATA_DIR, so it must exist even with the
    # engine suite itself skipped
    if skip_engine and any(k in kinds for k in ("bm25", "bpe", "substring",
                                                "mono", "grouped", "para",
                                                "recipe", "profiler")):
        _gen_data()
    best: dict = {}
    rounds = int(os.environ.get("SPARK_GRAFT_SCALING_ROUNDS", 3))
    for _round in range(rounds):  # alternating rounds damp host noise
        for kind in kinds:
            for label in ("N", "4N"):
                r = _spawn(label, kind)
                prev = best.get((kind, label))
                if prev is None or r["best_sec"] < prev["best_sec"]:
                    best[(kind, label)] = r
    for label in ("N", "4N"):
        best[("calib", label)] = _spawn(label, "calib")

    c_n, c_4n = best[("calib", "N")], best[("calib", "4N")]
    hw_eff = round(c_4n["rows_per_sec"] / (4 * c_n["rows_per_sec"]), 4)
    report = {
        "workload": ("operator-only scaling (engine suite skipped)"
                     if skip_engine else
                     f"9-expectation fused suite over {N_ROWS}-row web-page parquet"),
        "topology": {k: v[0] for k, v in MASTERS.items()},
        "hardware_ceiling_N": c_n, "hardware_ceiling_4N": c_4n,
        "hardware_ceiling_efficiency": hw_eff,
    }
    if ("engine", "N") in best:
        e_n, e_4n = best[("engine", "N")], best[("engine", "4N")]
        eng_eff = round(e_4n["rows_per_sec"] / (4 * e_n["rows_per_sec"]), 4)
        report.update({
            "engine_N": e_n, "engine_4N": e_4n,
            "engine_scaling_efficiency": eng_eff,
            "engine_vs_ceiling": round(eng_eff / hw_eff, 4) if hw_eff else None,
            "meets_north_rule_0.8": eng_eff >= 0.8,
        })
    if ("mono", "N") in best:
        m_n, m_4n = best[("mono", "N")], best[("mono", "4N")]
        report["monotonic_N"] = m_n
        report["monotonic_4N"] = m_4n
        report["monotonic_scaling_efficiency"] = round(
            m_4n["rows_per_sec"] / (4 * m_n["rows_per_sec"]), 4)
    if ("grouped", "N") in best:
        g_n, g_4n = best[("grouped", "N")], best[("grouped", "4N")]
        report["grouped_N"] = g_n
        report["grouped_4N"] = g_4n
        report["grouped_scaling_efficiency"] = round(
            g_4n["rows_per_sec"] / (4 * g_n["rows_per_sec"]), 4)
    if ("cc", "N") in best:
        x_n, x_4n = best[("cc", "N")], best[("cc", "4N")]
        report["cc_N"] = x_n
        report["cc_4N"] = x_4n
        report["cc_scaling_efficiency"] = round(
            x_4n["rows_per_sec"] / (4 * x_n["rows_per_sec"]), 4)
    if ("para", "N") in best:
        p_n, p_4n = best[("para", "N")], best[("para", "4N")]
        report["para_N"] = p_n
        report["para_4N"] = p_4n
        report["para_scaling_efficiency"] = round(
            p_4n["rows_per_sec"] / (4 * p_n["rows_per_sec"]), 4)
    if ("recipe", "N") in best:
        r_n, r_4n = best[("recipe", "N")], best[("recipe", "4N")]
        report["recipe_N"] = r_n
        report["recipe_4N"] = r_4n
        report["recipe_scaling_efficiency"] = round(
            r_4n["rows_per_sec"] / (4 * r_n["rows_per_sec"]), 4)
    if ("shuffle", "N") in best:
        s_n, s_4n = best[("shuffle", "N")], best[("shuffle", "4N")]
        report["shuffle_ceiling_N"] = s_n
        report["shuffle_ceiling_4N"] = s_4n
        report["shuffle_ceiling_efficiency"] = round(
            s_4n["rows_per_sec"] / (4 * s_n["rows_per_sec"]), 4)
    for kind in ("bm25", "pagerank", "bpe", "substring", "profiler"):
        if (kind, "N") in best:
            k_n, k_4n = best[(kind, "N")], best[(kind, "4N")]
            report[f"{kind}_N"] = k_n
            report[f"{kind}_4N"] = k_4n
            report[f"{kind}_scaling_efficiency"] = round(
                k_4n["rows_per_sec"] / (4 * k_n["rows_per_sec"]), 4)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    if len(sys.argv) > 3 and sys.argv[1] == "--worker":
        fn = {"engine": _engine_run, "mono": _mono_run,
              "grouped": _grouped_run, "cc": _cc_run, "para": _para_run,
              "recipe": _recipe_run, "calib": _calib_run,
              "shuffle": _shufcalib_run, "bm25": _bm25_run,
              "pagerank": _pagerank_run, "bpe": _bpe_run,
              "substring": _substring_run,
              "profiler": _profiler_run}[sys.argv[3]]
        print(json.dumps(fn(sys.argv[2])))
    else:
        main()
