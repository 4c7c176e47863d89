"""Build the spark-submit artifact: a zip of the engine package plus an
example launch command, per the north rule's deployment shape
(``spark-submit --py-files`` on a multi-executor cluster).

    python tools/make_submit_pkg.py [outdir]

produces ``outdir/great_expectations_spark.zip`` and prints the launch
recipe for ``tools/submit_validate.py``.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(outdir: str) -> str:
    os.makedirs(outdir, exist_ok=True)
    zpath = os.path.join(outdir, "great_expectations_spark.zip")
    pkg = os.path.join(REPO, "great_expectations_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return zpath


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist")
    zpath = build(outdir)
    print(f"built {zpath}")
    print(
        "launch:\n"
        "  spark-submit \\\n"
        f"    --py-files {zpath} \\\n"
        "    --conf spark.sql.adaptive.enabled=true \\\n"
        "    --conf spark.sql.adaptive.skewJoin.enabled=true \\\n"
        "    --conf spark.sql.shuffle.partitions=<2-3x total cores> \\\n"
        "    tools/submit_validate.py \\\n"
        "      --table my_catalog.web.pages --suite suite.json \\\n"
        "      --results my_catalog.web.validation_results --run-id run-2026-08-16 \\\n"
        "      --split hashed_column:url:4096"
    )


if __name__ == "__main__":
    main()
