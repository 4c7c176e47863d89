"""End-to-end test of the north rule's deployment shape: the engine
launched via ``spark-submit --py-files <zip>`` (reference launch surface;
tools/make_submit_pkg.py + tools/submit_validate.py).

The submit runs from a NEUTRAL working directory with PYTHONPATH scrubbed,
so ``great_expectations_spark`` must import from the ``--py-files`` zip —
a repo checkout on the driver would mask a broken artifact. The second
submit reuses the run-id and must skip every chunk (checkpoint resume).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")
DOCS = "/root/testdata/sf0.001/documents.parquet"

pytestmark = pytest.mark.skipif(
    SPARK_SUBMIT is None or not os.path.exists(DOCS),
    reason="spark-submit or sf0.001 testdata unavailable")


def _submit(workdir: str, zpath: str, suite_path: str, results: str,
            run_id: str, max_concurrency: int = 1) -> dict:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # imports must come from the zip
    cmd = [
        SPARK_SUBMIT,
        "--master", "local[2]",
        "--py-files", zpath,
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.driver.memory=2g",
        os.path.join(REPO, "tools", "submit_validate.py"),
        "--table", DOCS,
        "--suite", suite_path,
        "--results", results,
        "--run-id", run_id,
        "--split", "hashed_column:doc_id:4",
        "--result-format", "BASIC",
        "--max-concurrency", str(max_concurrency),
    ]
    out = subprocess.run(cmd, cwd=workdir, capture_output=True, text=True,
                         timeout=600, env=env)
    payload = [l for l in out.stdout.splitlines()
               if l.startswith("{") and "run_id" in l]
    assert out.returncode == 0 and payload, (
        f"spark-submit failed (rc={out.returncode}):\n"
        f"stdout:\n{out.stdout[-2000:]}\nstderr:\n{out.stderr[-3000:]}")
    return json.loads(payload[-1])


def test_spark_submit_pyfiles_checkpoint_and_resume(tmp_path):
    import sys
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from make_submit_pkg import build

    zpath = build(str(tmp_path / "dist"))
    assert os.path.getsize(zpath) > 10_000

    suite_path = str(tmp_path / "suite.json")
    with open(suite_path, "w") as f:
        json.dump({
            "name": "docs_submit",
            "expectations": [
                {"expectation_type": "expect_column_values_to_not_be_null",
                 "kwargs": {"column": "doc_id"}},
                {"expectation_type": "expect_column_values_to_not_be_null",
                 "kwargs": {"column": "text", "mostly": 0.9}},
                {"expectation_type": "expect_column_mean_to_be_between",
                 "kwargs": {"column": "n_chars", "min_value": 0}},
            ],
        }, f)

    results = str(tmp_path / "results_table")
    workdir = str(tmp_path / "neutral_cwd")
    os.makedirs(workdir)

    first = _submit(workdir, zpath, suite_path, results, "run-1")
    assert first["completed"] == 4
    assert first["resumed_skips"] == 0
    assert os.path.isdir(results)  # parquet results table written

    # resubmit with the SAME run-id: every chunk already checkpointed
    second = _submit(workdir, zpath, suite_path, results, "run-1")
    assert second["completed"] == 0
    assert second["resumed_skips"] == 4

    # a new run-id re-validates (results table holds both runs)
    third = _submit(workdir, zpath, suite_path, results, "run-2",
                    max_concurrency=2)
    assert third["completed"] == 4
