"""sf1-scale stress bench for the shuffle-heavy pipeline operators.

The driver testdata tops out at sf0.1 (documents = 5k rows, embeddings =
2k vectors) — far too small to exercise the shuffle/join machinery of the
three heaviest operators. This tool synthesizes a deterministic corpus
~200-400x that size (1M docs, 200k x 64-dim embeddings by default; no
external data — the same xxhash64 recipe as sources/webpages.py). The
corpus shape matters: body tokens are doc-unique draws from a 50k
vocab, ~5% of docs are exact duplicates of their predecessor, and ~20%
open with one of 5 shared 24-token boilerplate prefixes — so the
duplicated-window density is realistic (hot boilerplate keys + whole-doc
dups), not the everything-duplicates-everything degenerate corpus a
small-modulus generator produces. Timed:

  substring_dedup   ExactSubstr window-hash dedup: the stride-1 (wkey,
                    id, idx) occurrence shuffle is ~n_tokens rows — the
                    engine's single biggest exchange
  dedup_cluster     MinHash-LSH pairs ∪ exact edges → Large-Star/
                    Small-Star connected components (~5% planted dups)
  semantic_dedup    2-iteration k-means + within-cluster GEMM pairing +
                    CC keeper election (~5% planted duplicate vectors)

Prints ONE JSON line; save it as bench_results/sf1_stress_r<N>.json.
bench.py embeds that file (clearly labeled with its own wall-clock) into
the driver bench line so BENCH_r{N}.json carries the sf1 numbers without
re-paying the multi-minute run on every driver invocation.

Usage:
    python tools/bench_sf1.py > bench_results/sf1_stress_r3.json
Env: SPARK_GRAFT_SF1_DOCS (default 1_000_000), SPARK_GRAFT_SF1_VECS
(default 200_000), SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

N_DOCS = int(os.environ.get("SPARK_GRAFT_SF1_DOCS", 1_000_000))
N_VECS = int(os.environ.get("SPARK_GRAFT_SF1_VECS", 200_000))
DIMS = 64
MAX_TOKENS = 150
VOCAB = 50_000
BOILER_LEN = 24   # tokens of shared boilerplate prefix (>= 3 x window)
DOCS_DIR = f"/tmp/ges_sf1_docs_v2_{N_DOCS}"
EMB_DIR = f"/tmp/ges_sf1_emb_{N_VECS}"


def _h(col, salt: int):
    return F.abs(F.xxhash64(col, F.lit(salt), F.lit(1234)))


def _gen(spark) -> None:
    par = spark.sparkContext.defaultParallelism
    if not os.path.exists(os.path.join(DOCS_DIR, "_SUCCESS")):
        rid = F.col("id")
        # ~5% of rows reuse the previous row's content id -> exact dups
        dup = (_h(rid, 1) % 100) < 5
        eff = F.when(dup & (rid > 0), rid - 1).otherwise(rid)
        n_tokens = (_h(eff, 5) % MAX_TOKENS).cast("int") + 5
        # ~20% of docs open with one of 5 shared boilerplate prefixes
        # (cookie-banner shape): the hot duplicated windows substring
        # dedup must remove WITHOUT the whole corpus being duplicated —
        # body tokens are doc-unique draws from a 50k vocab, so the only
        # duplicated windows are the planted prefixes + the 5% exact dups.
        is_boiler = (_h(eff, 7) % 100) < 20
        variant = _h(eff, 8) % 5

        def token(i):
            rand_tok = F.concat(
                F.lit("w"),
                (F.abs(F.xxhash64(eff, i, F.lit(11))) % VOCAB)
                .cast("string"))
            boiler_tok = F.concat(
                F.lit("b"), (variant * 1000 + i).cast("string"))
            return F.when(
                is_boiler & (i < BOILER_LEN), boiler_tok).otherwise(rand_tok)

        words = F.transform(F.sequence(F.lit(0), n_tokens), token)
        text = F.array_join(words, " ")
        (
            spark.range(0, N_DOCS, 1, par * 4)
            .select(
                rid.alias("doc_id"), text.alias("text"),
                F.element_at(
                    F.array(*[F.lit(x) for x in
                              ("en", "de", "fr", "es", "zh")]),
                    (_h(eff, 9) % 5 + 1).cast("int")).alias("lang"),
                F.concat(F.lit("src"), (_h(eff, 10) % 20).cast("string"))
                .alias("source"),
                F.length(text).alias("n_chars"),
            )
            .write.mode("overwrite").parquet(DOCS_DIR)
        )
    if not os.path.exists(os.path.join(EMB_DIR, "_SUCCESS")):
        rid = F.col("id")
        dup = (_h(rid, 21) % 100) < 5
        eff = F.when(dup & (rid > 0), rid - 1).otherwise(rid)
        vec = F.transform(
            F.sequence(F.lit(0), F.lit(DIMS - 1)),
            lambda d: ((_h(eff, 22) + _h(d, 23)) % 2001 - 1000).cast("double")
            / 1000.0,
        ).cast("array<float>")
        (
            spark.range(0, N_VECS, 1, par * 4)
            .select(rid.alias("vec_id"), vec.alias("embedding"))
            .write.mode("overwrite").parquet(EMB_DIR)
        )


def main() -> None:
    from great_expectations_spark.sources.session import get_spark

    # 1M-doc CC / 200k-vector GEMM need real heap; the library default
    # (8g) is sized for test sessions
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(app="ges-bench-sf1")
    _gen(spark)
    docs = spark.read.parquet(DOCS_DIR)
    emb = spark.read.parquet(EMB_DIR)
    n_docs = docs.count()  # warm page cache
    n_vecs = emb.count()

    timings: dict[str, float] = {}

    def timed(name):
        def deco(fn):
            t0 = time.time()
            fn()
            timings[name] = round(time.time() - t0, 4)

        return deco

    @timed("substring_dedup")
    def _s1():
        from great_expectations_spark.pipeline.substring import dedup_substrings

        dedup_substrings(docs.select("doc_id", "text"), "doc_id", "text",
                         window=8).select(F.sum("n_removed_tokens")).first()

    @timed("dedup_cluster")
    def _s2():
        from great_expectations_spark.pipeline.cluster import (
            dedup_cluster_assignments)

        dedup_cluster_assignments(docs, "doc_id", "text").where(
            "NOT is_canonical").select(F.count(F.lit(1))).first()

    @timed("semantic_dedup")
    def _s3():
        from great_expectations_spark.pipeline.embcluster import (
            semantic_dedup_assignments)

        semantic_dedup_assignments(
            emb, dims=DIMS, k=32, threshold=0.38, iters=2,
        ).select(F.count(F.lit(1))).first()

    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "workload": "sf1-scale stress (synthetic, deterministic)",
        "n_docs": n_docs, "n_vecs": n_vecs, "dims": DIMS,
        "queries": timings, "total_sec": total,
        "docs_per_sec_substring": round(n_docs / timings["substring_dedup"], 1),
        "docs_per_sec_cluster": round(n_docs / timings["dedup_cluster"], 1),
        "vecs_per_sec_semantic": round(n_vecs / timings["semantic_dedup"], 1),
        "cores": os.environ.get("SPARK_GRAFT_CPUS", "*"),
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
