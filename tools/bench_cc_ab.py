"""Same-window interleaved A/B: windowed vs groupBy star formulations.

Round-3 left one measurement contradiction open (BASELINE.md): the
windowed single-exchange star phases (in-tree since r3,
``pipeline/cluster.py:63``) read LOWER official-harness N→4N efficiency
(0.611) than the old groupBy-min + join-back formulation (0.682) while
being ~1.65× faster ABSOLUTE at both cluster sizes — but those numbers
came from different recording windows on a host whose throughput swings
2× between minutes. This tool closes the question the only defensible
way: ONE window, strictly interleaved cells.

Design:
  * both formulations run from the same process tree in the same
    minutes: round-robin over (graph, formulation, topology) so host
    drift hits every cell equally;
  * the groupBy formulation is reconstructed here (it no longer exists
    in-tree) exactly as r2 shipped it: groupBy-min + join-back per star
    phase, selected by monkeypatching ``cluster._large_star/_small_star``
    in the worker process — everything else (lineage cuts, convergence
    check, driver fallback OFF) identical;
  * two graph shapes: the harness's Zipf-1 power-law star forest
    (boilerplate-hub shape) and a uniform 16-member-cluster forest —
    r3's formulation gap, if intrinsic, should show on at least one;
  * best-of per cell across rounds, exactly like bench_scaling.

Output: per (graph, formulation): N/4N rows/s, efficiency, plus the
windowed/groupBy absolute-throughput ratio per topology.

Usage: python tools/bench_cc_ab.py            (~30-60 min)
  env: SPARK_GRAFT_CCAB_NODES (default 4M), SPARK_GRAFT_CCAB_ROUNDS (2),
       SPARK_GRAFT_SCALING_EXEC_MEM_MB (8192 recommended for CC).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench_scaling as bs  # session/topology/gen conventions  # noqa: E402

NODES = int(os.environ.get("SPARK_GRAFT_CCAB_NODES", 4_000_000))
ROUNDS = int(os.environ.get("SPARK_GRAFT_CCAB_ROUNDS", 2))
REPS = int(os.environ.get("SPARK_GRAFT_CCAB_REPS", 2))
ZIPF_C = float(os.environ.get("SPARK_GRAFT_CCAB_C", 348_000))  # ~e^(4M/348k)≈97k clusters
UNIFORM_K = 16
DATA = {
    "zipf": f"/tmp/ges_ccab_zipf_{NODES}",
    "uniform": f"/tmp/ges_ccab_uniform_{NODES}",
}


def _gen(graph: str) -> None:
    if os.path.exists(os.path.join(DATA[graph], "_SUCCESS")):
        return
    from great_expectations_spark.sources.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(cores=32, app=f"ccab-gen-{graph}")
    base = spark.range(0, NODES, 1, 256)
    if graph == "zipf":
        base = base.select(
            "id", F.floor(F.exp(F.col("id") / F.lit(ZIPF_C))).alias("k"))
        hubs = base.groupBy("k").agg(F.min("id").alias("hub"))
        edges = base.join(hubs, "k").where("id != hub")
    else:
        edges = base.select(
            "id", (F.col("id") - F.col("id") % UNIFORM_K).alias("hub")
        ).where("id != hub")
    (edges.select(F.col("id").alias("id_a"), F.col("hub").alias("id_b"))
     .write.mode("overwrite").parquet(DATA[graph]))
    spark.stop()


# ---- the r2 groupBy-min + join-back formulation, reconstructed ----------


def _large_star_groupby(e):
    from pyspark.sql import functions as F

    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (sym.groupBy("u").agg(F.min("v").alias("__mn"))
            .select("u", F.least(F.col("__mn"), F.col("u")).alias("__mn")))
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("__mn").alias("v"))
        .distinct()
    )


def _small_star_groupby(e):
    from pyspark.sql import functions as F

    mins = e.groupBy("u").agg(F.min("v").alias("__mn"))
    nbrs = (e.join(mins, "u")
            .where(F.col("v") != F.col("__mn"))
            .select(F.col("v").alias("u"), F.col("__mn").alias("v")))
    selfs = mins.select(F.col("u"), F.col("__mn").alias("v"))
    return nbrs.union(selfs).distinct()


def _worker(label: str, formulation: str, graph: str) -> None:
    from great_expectations_spark.pipeline import cluster

    if formulation == "groupby":
        cluster._large_star = _large_star_groupby
        cluster._small_star = _small_star_groupby
    elif formulation != "windowed":
        raise ValueError(formulation)

    spark, cores = bs._session(label)
    edges = spark.read.parquet(DATA[graph])
    n_edges = edges.count()  # warms page cache
    best = float("inf")
    for _ in range(REPS):
        t0 = time.time()
        members = cluster.connected_components(
            edges, "id_a", "id_b", driver_threshold=0).where(
            "node != component").count()
        best = min(best, time.time() - t0)
        assert members == n_edges
    spark.stop()
    print(json.dumps({
        "label": label, "formulation": formulation, "graph": graph,
        "master": bs.MASTERS[label][0], "cores": cores, "rows": n_edges,
        "best_sec": round(best, 4),
        "rows_per_sec": round(n_edges / best, 2)}))


def main() -> None:
    graphs = os.environ.get("SPARK_GRAFT_CCAB_GRAPHS", "zipf,uniform").split(",")
    for g in graphs:
        _gen(g)
    cells = [(g, f, l) for g in graphs
             for f in ("windowed", "groupby") for l in ("N", "4N")]
    best: dict = {}
    t_start = time.time()
    for _round in range(ROUNDS):
        for cell in cells:  # strict interleave: every cell per window slice
            g, f, l = cell
            env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM="8g")
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--worker", l, f, g],
                capture_output=True, text=True, timeout=1800, env=env)
            lines = [x for x in out.stdout.strip().splitlines()
                     if x.startswith("{")]
            if not lines:
                raise RuntimeError(
                    f"worker {cell} failed:\n{out.stderr[-2000:]}")
            r = json.loads(lines[-1])
            prev = best.get(cell)
            if prev is None or r["best_sec"] < prev["best_sec"]:
                best[cell] = r

    report: dict = {
        "workload": f"CC A/B windowed-vs-groupBy, {NODES} nodes, "
                    f"interleaved {ROUNDS} rounds x {REPS} reps, "
                    f"one window ({round((time.time() - t_start) / 60, 1)} min)",
        "topology": {k: v[0] for k, v in bs.MASTERS.items()},
        "cells": {f"{g}/{f}/{l}": best[(g, f, l)]
                  for (g, f, l) in cells},
    }
    for g in graphs:
        for f in ("windowed", "groupby"):
            n, x = best[(g, f, "N")], best[(g, f, "4N")]
            report[f"{g}_{f}_efficiency"] = round(
                x["rows_per_sec"] / (4 * n["rows_per_sec"]), 4)
        for l in ("N", "4N"):
            report[f"{g}_windowed_over_groupby_{l}"] = round(
                best[(g, "windowed", l)]["rows_per_sec"]
                / best[(g, "groupby", l)]["rows_per_sec"], 4)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    if len(sys.argv) > 4 and sys.argv[1] == "--worker":
        _worker(sys.argv[2], sys.argv[3], sys.argv[4])
    else:
        main()
