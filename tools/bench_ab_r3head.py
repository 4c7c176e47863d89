"""Same-window interleaved A/B: round-3 code vs current HEAD, dedup/ANN family.

BENCH_r04 read the dedup/ANN family +20-29% slower than BENCH_r03
(dedup_cluster 2.85→3.69s, dedup_minhash 2.29→2.89s, dedup_exact
0.73→0.91s, ann_gemm 0.61→0.76s) while untouched workloads in the same
file got 23-33% FASTER — and git shows no round-4 commit touched any of
these hot paths. The r4 verdict accepted "host-window noise"
provisionally but asked for the controlled check: this tool runs the r3
snapshot and HEAD strictly interleaved in ONE window (the r2/r3
scratch-worktree alternation method), so hypervisor drift hits both
sides equally. If the deltas are noise, the same-window ratio reads ~1.

Design:
  * the r3 code (commit given by SPARK_GRAFT_AB_R3SHA, default the
    round-3 close commit) is materialized once via ``git worktree add``
    under /tmp; each worker subprocess pins sys.path to ONE tree;
  * per window slice a worker runs all six family workloads (exactly the
    bench.py bodies at sf0.1, local[32]) best-of-REPS; slices alternate
    r3 / head for ROUNDS rounds; best-of across slices per cell, the
    bench_scaling convention;
  * same session config both sides (each tree's own get_spark — byte-
    identical settings in r3 and HEAD).

Usage: python tools/bench_ab_r3head.py        (~10-20 min)
  env: SPARK_GRAFT_AB_ROUNDS (default 3), SPARK_GRAFT_AB_REPS (2),
       SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
       SPARK_GRAFT_AB_R3SHA (default 4c9d0ca).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R3_SHA = os.environ.get("SPARK_GRAFT_AB_R3SHA", "4c9d0ca")
R3_TREE = f"/tmp/ges_ab_r3_{R3_SHA}"
ROUNDS = int(os.environ.get("SPARK_GRAFT_AB_ROUNDS", 3))
REPS = int(os.environ.get("SPARK_GRAFT_AB_REPS", 2))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

WORKLOADS = ("dedup_exact", "dedup_minhash", "ann_cosine", "uniq_zipf",
             "dedup_cluster", "ann_gemm_wide")


def _worker(root: str) -> None:
    sys.path.insert(0, root)
    from pyspark.sql import functions as F

    from great_expectations_spark import ExpectationSuite, validate
    from great_expectations_spark.sources.session import get_spark

    spark = get_spark(cores=32, app=f"ab-{os.path.basename(root)}")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").persist()
    emb = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
           .repartition(32).persist())
    n_docs = docs.count()
    emb.count()
    n_li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    n_zipf = max(n_li, 100_000)
    u = (F.pmod(F.xxhash64("id"), F.lit(1_000_000)) + 1) / 1_000_000.0
    zipf = spark.range(0, n_zipf, 1, 32).select(
        F.least(F.floor(F.pow(1.0 / u, F.lit(1.0 / 1.1))), F.lit(10 ** 6))
        .cast("long").alias("k")).persist()
    zipf.count()

    from great_expectations_spark.pipeline.cluster import (
        dedup_cluster_assignments,
    )
    from great_expectations_spark.pipeline.dedup import (
        exact_dedup_stats,
        minhash_lsh_candidates,
    )
    from great_expectations_spark.pipeline.similarity import (
        cosine_topk,
        cosine_topk_gemm,
    )

    def w_dedup_exact():
        exact_dedup_stats(docs, "text").first()

    def w_dedup_minhash():
        minhash_lsh_candidates(docs, "doc_id", "text").select(
            F.count(F.lit(1))).first()

    def w_ann_cosine():
        q = emb.where(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
        cosine_topk(emb, q, k=10).select(F.count(F.lit(1))).first()

    def w_uniq_zipf():
        suite = ExpectationSuite(name="zipf").add(
            "expect_column_values_to_be_unique", column="k", mostly=0.01)
        validate(zipf, suite, result_format="BOOLEAN_ONLY")

    def w_dedup_cluster():
        dedup_cluster_assignments(docs, "doc_id", "text").where(
            "NOT is_canonical").select(F.count(F.lit(1))).first()

    def w_ann_gemm_wide():
        q = emb.where(F.col("vec_id") < 64).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
        cosine_topk_gemm(emb, q, k=10).select(F.count(F.lit(1))).first()

    fns = {"dedup_exact": w_dedup_exact, "dedup_minhash": w_dedup_minhash,
           "ann_cosine": w_ann_cosine, "uniq_zipf": w_uniq_zipf,
           "dedup_cluster": w_dedup_cluster,
           "ann_gemm_wide": w_ann_gemm_wide}
    best: dict[str, float] = {}
    for _ in range(REPS):
        for name in WORKLOADS:
            t0 = time.time()
            fns[name]()
            dt = time.time() - t0
            if name not in best or dt < best[name]:
                best[name] = dt
    spark.stop()
    print(json.dumps({"root": root, "n_docs": n_docs,
                      "best": {k: round(v, 4) for k, v in best.items()}}))


def _ensure_r3_tree() -> None:
    if os.path.exists(os.path.join(R3_TREE, "bench.py")):
        return
    subprocess.run(["git", "-C", REPO, "worktree", "add", "--detach",
                    R3_TREE, R3_SHA], check=True, capture_output=True,
                   text=True)


def main() -> None:
    _ensure_r3_tree()
    best: dict[tuple[str, str], float] = {}
    t_start = time.time()
    for _round in range(ROUNDS):
        for side, root in (("r3", R3_TREE), ("head", REPO)):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker", root],
                capture_output=True, text=True, timeout=1800)
            lines = [x for x in out.stdout.strip().splitlines()
                     if x.startswith("{")]
            if not lines:
                raise RuntimeError(
                    f"worker {side} failed:\n{out.stderr[-2000:]}")
            r = json.loads(lines[-1])
            for w, sec in r["best"].items():
                cell = (side, w)
                if cell not in best or sec < best[cell]:
                    best[cell] = sec

    report = {
        "workload": f"r3({R3_SHA})-vs-HEAD dedup/ANN family A/B, sf0.1, "
                    f"local[32], interleaved {ROUNDS} rounds x {REPS} reps, "
                    f"one window ({round((time.time() - t_start) / 60, 1)} "
                    "min)",
        "cells": {f"{s}/{w}": round(best[(s, w)], 4)
                  for s in ("r3", "head") for w in WORKLOADS},
        "head_over_r3": {w: round(best[("head", w)] / best[("r3", w)], 4)
                         for w in WORKLOADS},
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        _worker(sys.argv[2])
    else:
        main()
