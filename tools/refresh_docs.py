#!/usr/bin/env python
"""Doc-count drift guard: derive operator counts from the registry (the
single source of truth) and verify README.md / COVERAGE.md state the
same numbers. Exits non-zero on drift, so it can run in the test suite
(tests/test_docs.py) — a hand-edited count can't silently go stale
again (the round-6 verdict's COVERAGE.md:18 finding).

Usage: python tools/refresh_docs.py [--list]
"""
from __future__ import annotations

import argparse
import pathlib
import re
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def counts() -> tuple[int, int, list[str]]:
    from quacfka_spark.registry import get_oracles, get_queries

    q, o = get_queries(), get_oracles()
    rows_only = sorted(set(q) - set(o))
    return len(q), len(o), rows_only


def check() -> list[str]:
    n_q, n_o, rows_only = counts()
    errs: list[str] = []
    checks = {
        "README.md": [
            (rf"\*\*{n_q} declared operators\*\*", "declared-operator count"),
            (rf"{n_o} with DuckDB oracles", "oracle count"),
        ],
        "COVERAGE.md": [
            (rf"\*\*{n_q}/{n_q} green — {n_o} hash-matched", "green/hash counts"),
        ],
    }
    for fname, patterns in checks.items():
        text = (ROOT / fname).read_text()
        for pat, what in patterns:
            if not re.search(pat, text):
                errs.append(
                    f"{fname}: {what} does not match registry "
                    f"(expected queries={n_q}, oracles={n_o}, "
                    f"rows-only={rows_only})"
                )
    return errs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--list", action="store_true", help="print every registered key")
    args = ap.parse_args()
    n_q, n_o, rows_only = counts()
    if args.list:
        from quacfka_spark.registry import get_queries

        for k in sorted(get_queries()):
            print(k)
    print(f"registry: {n_q} queries, {n_o} oracles, rows-only: {rows_only}")
    errs = check()
    for e in errs:
        print("DRIFT:", e, file=sys.stderr)
    return 1 if errs else 0


if __name__ == "__main__":
    raise SystemExit(main())
