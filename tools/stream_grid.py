#!/usr/bin/env python
"""Wide-streaming pass-length sensitivity grid — round-9 verdict ask #3.

The wide STREAMING ingest block has trailed its batch twin every round
(r9: 193.7 vs 360.0 MB/s) while sharing every data-path stage (decode,
raw write, normalize write). The hypothesis this grid tests: the gap is
PASS CADENCE, not pipeline cost — each orchestrator pass pays a fixed
setup tax (streaming query start, checkpoint init, 2 micro-batch
commits, stop) that the bench's auto-sized ~3.5 s passes never
amortize, because the streaming phase reuses the BATCH phase's row
count, which a cold calibration sizes small.

Grid: rows per pass x epochs, each cell one
``run_streaming_ingest_bench`` call (best-of-2 passes, no deadline).
The fit reported at the end solves rate = payload / (payload/R + c)
for the asymptotic MB/s R and the fixed per-pass cost c over the
single-epoch-count column — if c explains the curve, the bench's fix
is simply longer passes (more rows), which is also the FAITHFUL shape:
the reference's rotation unit is ~30 s of ingest (README.md:170), not
3 s.

Usage:
  python tools/stream_grid.py --rows 550000,1100000,2200000 \
      --out INGEST_WIDE_STREAM_GRID.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", default="550000,1100000,2200000")
    ap.add_argument("--epochs", default="2")
    ap.add_argument(
        "--extra-epochs",
        type=int,
        default=4,
        help="one extra cell at the middle row count with this epoch "
        "count, isolating micro-batch-commit cost from pass length",
    )
    ap.add_argument("--out", default="INGEST_WIDE_STREAM_GRID.json")
    args = ap.parse_args()

    from quacfka_spark.bench_ingest import run_streaming_ingest_bench
    from quacfka_spark.session import get_spark

    spark = get_spark("stream-grid")
    rows_list = [int(r) for r in args.rows.split(",") if r]
    epochs_list = [int(e) for e in args.epochs.split(",") if e]
    cells = [(r, e) for e in epochs_list for r in rows_list]
    if args.extra_epochs and len(rows_list) >= 2:
        cells.append((rows_list[len(rows_list) // 2], args.extra_epochs))

    grid = []
    for rows, epochs in cells:
        t0 = time.perf_counter()
        rep = run_streaming_ingest_bench(
            spark,
            rows=rows,
            epochs=epochs,
            shape="wide",
            work_dir="/tmp/quacfka_stream_grid",
        )
        cell = {
            "rows": rows,
            "epochs": epochs,
            "mb_per_second": rep["mb_per_second"],
            "payload_mb": round(
                rep["mb_per_second"] * rep["duration_seconds"], 1
            ),
            "pass_seconds": rep["duration_seconds"],
            "batches": rep["batches"],
            "cell_wall": round(time.perf_counter() - t0, 1),
        }
        grid.append(cell)
        print(f"# {cell}", file=sys.stderr)

    # two-point fixed-cost fit on the base-epoch column: with
    # t = P/R + c for payload P, any two cells give
    # R = (P2 - P1) / (t2 - t1), c = t1 - P1/R. Use the smallest and
    # largest rows at the base epoch count.
    base = [c for c in grid if c["epochs"] == epochs_list[0]]
    fit = None
    if len(base) >= 2:
        lo, hi = base[0], base[-1]
        dp = hi["payload_mb"] - lo["payload_mb"]
        dt = hi["pass_seconds"] - lo["pass_seconds"]
        if dp > 0 and dt > 0:
            r_asym = dp / dt
            c_fixed = lo["pass_seconds"] - lo["payload_mb"] / r_asym
            fit = {
                "asymptotic_mb_per_second": round(r_asym, 1),
                "fixed_pass_cost_seconds": round(c_fixed, 2),
                "explains": "rate(P) = P / (P / R + c); the bench's "
                "auto-sized short passes sit on the steep part of "
                "this curve",
            }

    report = {
        "metric": "wide_streaming_pass_length_grid",
        "grid": grid,
        "fit": fit,
    }
    print(json.dumps(report))
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
        fh.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
