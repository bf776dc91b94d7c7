#!/usr/bin/env python
"""Emit a driver-schema correctness report for EVERY registered query.

The per-round driver gate (CORRECTNESS_r{N}.json) checks a frozen 50-key
set; queries registered after round 1 (s*, sim*, t*, q35-q41, d07, ...)
only run in the local pytest parity suite. This tool closes that
verification gap with a machine-readable report in the SAME schema the
driver emits — per key: rows_match / schema_match / hash_match /
spark_rows / oracle_rows / err — produced the same way (plain
SparkSession, DuckDB oracle on the same parquet dir, order-insensitive
value comparison with columns sorted by name). Oracle-less keys (S4/S6
style engine-level ops) get the driver's weaker rows-only check.

Usage: python tools/local_correctness.py [--sf-dir DIR] [--out FILE]
Cited from COVERAGE.md; exit code 1 if any key is red.
"""

from __future__ import annotations

import argparse
import re
import hashlib
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="CORRECTNESS_local_r4.json")
    ap.add_argument("--cpus", type=int, default=os.cpu_count() or 8)
    ap.add_argument(
        "--only",
        default=None,
        help="regex: check only matching keys (iteration aid; the "
        "emitted report then covers the subset, so don't commit it)",
    )
    ap.add_argument(
        "--driver-mem",
        default=None,
        help="JVM heap for the plain session (e.g. 16g). Unset = the "
        "PySpark default, mirroring the driver's untuned session; set "
        "it for beyond-fixture-scale sweeps (the sfbig replica) where "
        "the default 1g heap OOMs on data volume, not engine defects — "
        "heap size never changes values, only completion.",
    )
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    from quacfka_spark.catalog import TABLES
    from quacfka_spark.registry import QUERIES, get_queries
    from tests.parity import canon_rows

    # plain session on purpose — the driver does not apply engine tuning
    builder = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
    )
    if args.driver_mem:
        builder = builder.config("spark.driver.memory", args.driver_mem)
    spark = builder.getOrCreate()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )
    get_queries()

    def value_hash(rows: list[tuple]) -> str:
        return hashlib.md5(repr(rows).encode()).hexdigest()

    report: dict[str, dict] = {}
    only = re.compile(args.only) if args.only else None
    for name in sorted(QUERIES):
        if only and not only.search(name):
            continue
        q = QUERIES[name]
        row: dict = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            sp = q.fn(spark, args.sf_dir).toPandas()
            row["spark_rows"] = len(sp)
            if q.oracle is None:
                # driver parity: oracle-less keys get rows-only checking
                row["rows_match"] = row["spark_rows"] >= 0
            else:
                dk = con.sql(q.oracle).df()
                row["oracle_rows"] = len(dk)
                row["rows_match"] = len(sp) == len(dk)
                row["schema_match"] = sorted(sp.columns) == sorted(dk.columns)
                a, b = canon_rows(sp), canon_rows(dk)
                row["hash_match"] = value_hash(a) == value_hash(b)
                if not row["hash_match"]:
                    bs = set(b)
                    row["diff_sample"] = {
                        "spark_only": [repr(r) for r in a if r not in bs][:3],
                        "oracle_only": [
                            repr(r) for r in b if r not in set(a)
                        ][:3],
                    }
        except Exception:
            row["err"] = traceback.format_exc()
        report[name] = row
        ok = (
            row["err"] is None
            and row["rows_match"]
            and row["schema_match"] in (True, None)
            and row["hash_match"] in (True, None)
        )
        print(f"{'OK  ' if ok else 'FAIL'} {name}"
              f" spark={row['spark_rows']} oracle={row['oracle_rows']}")

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
        f.write("\n")
    red = [
        k
        for k, v in report.items()
        if v["err"] is not None
        or v["rows_match"] is False
        or v["schema_match"] is False
        or v["hash_match"] is False
    ]
    print(f"{len(report)} keys -> {args.out}; "
          f"{len(report) - len(red)} green, {len(red)} red {red or ''}")
    sys.exit(1 if red else 0)


if __name__ == "__main__":
    main()
