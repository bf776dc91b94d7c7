#!/usr/bin/env python
"""Wide-ingest rate-vs-pass-length curve + r10 bench replay.

r11 verdict #1: BENCH_r11's stall-proofed wide blocks (173.6 batch /
184.5 streaming MB/s, unstalled, busy 0.99) sit below the README's
claimed 180 floor and far below the 378/330 best-window claims. This
probe measures, in ONE session, the wide BATCH and STREAMING rates at
three pass lengths (~5 s / ~15 s / ~30 s of payload — the last is the
reference's rotation unit) with the bench's own best-of-N machinery,
so the claim can be re-anchored to whichever pass length is
representative (or driver passes re-sized if long passes recover).

r11 verdict #5 (the separate question): the wide-batch driver number
declined r10 -> r11 (254.6 -> 173.6) with both windows unstalled by
the new detector's standard. The replay section runs the r10 bench
commit's (8563ab2) run_ingest_bench and the CURRENT one, auto-sized
with a driver-style deadline, A/B/A in the same session — if the two
implementations measure the same in one window, the delta was window
noise / methodology, not code.

Run SOLO (no concurrent Spark work): walls are the measurement.
Writes INGEST_WIDE_PASSCURVE.json incrementally (safe to kill).
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys
import time

OUT = os.environ.get("PASSCURVE_OUT", "INGEST_WIDE_PASSCURVE.json")
R10_COMMIT = "8563ab2"

EVIDENCE_KEYS = (
    "records_consumed",
    "duration_seconds",
    "records_per_second",
    "total_rows_per_second",
    "mb_per_second",
    "payload_mb",
    "passes",
    "pass_seconds",
    "expected_pass_s",
    "stalled",
    "pass_busy",
    "pass_steal",
    "batches",
    "calib_seconds",
    "resized",
)


def slim(rep: dict) -> dict:
    return {k: rep[k] for k in EVIDENCE_KEYS if k in rep}


def main() -> None:
    from quacfka_spark import bench_ingest as bi
    from quacfka_spark.session import get_spark

    spark = get_spark("wide-pass-curve")
    out: dict = {
        "metric": "wide_ingest_pass_length_curve",
        "cores": spark.sparkContext.defaultParallelism,
        "batch": [],
        "streaming": [],
        "replay": [],
    }

    def flush() -> None:
        with open(OUT, "w") as fh:
            json.dump(out, fh, indent=1)
            fh.write("\n")

    # -- pass-length curve: explicit rows bypass calibration; a far
    # deadline gives the full best-of-N budget (6 batch / 4 streaming)
    row_grid = (750_000, 2_200_000, 4_000_000)
    batch_best = {}
    for rows in row_grid:
        rep = bi.run_ingest_bench(
            spark,
            rows=rows,
            deadline=time.monotonic() + 900,
            shape="wide",
            work_dir="/tmp/qcurve_batch",
        )
        batch_best[rows] = rep.get("records_per_second", 0)
        out["batch"].append(slim(rep))
        print(f"# batch rows={rows}: {slim(rep)}", file=sys.stderr)
        flush()
    for rows in row_grid:
        rep = bi.run_streaming_ingest_bench(
            spark,
            rows=rows,
            deadline=time.monotonic() + 900,
            shape="wide",
            file_grain=4,
            work_dir="/tmp/qcurve_stream",
            expect_rate=batch_best.get(rows) or None,
        )
        out["streaming"].append(slim(rep))
        print(f"# stream rows={rows}: {slim(rep)}", file=sys.stderr)
        flush()

    # -- r10 replay: A/B/A, auto-sized, driver-style phase deadline
    src = subprocess.run(
        ["git", "show", f"{R10_COMMIT}:quacfka_spark/bench_ingest.py"],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    r10_path = "/tmp/bench_ingest_r10.py"
    with open(r10_path, "w") as fh:
        fh.write(src)
    spec = importlib.util.spec_from_file_location("bench_ingest_r10", r10_path)
    bi_r10 = importlib.util.module_from_spec(spec)
    # dataclass field introspection looks the module up in sys.modules
    sys.modules["bench_ingest_r10"] = bi_r10
    spec.loader.exec_module(bi_r10)

    for tag, mod in (("r11", bi), ("r10", bi_r10), ("r11b", bi)):
        rep = mod.run_ingest_bench(
            spark,
            deadline=time.monotonic() + bi.BUDGET_S * 0.28,
            shape="wide",
            work_dir="/tmp/qcurve_replay",
        )
        out["replay"].append({"impl": tag, **slim(rep)})
        print(f"# replay {tag}: {slim(rep)}", file=sys.stderr)
        flush()

    spark.stop()
    flush()
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
