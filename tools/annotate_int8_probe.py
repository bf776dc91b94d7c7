#!/usr/bin/env python
"""Annotate SCALE_PROBE_D07_INT8_5M.json with the engagement context the
committed record needs: what the notch is, why the int8 payload is what
made it run on one VM, the float-row death it supersedes, and the
measured-vs-projected footprint comparison. Pure post-processing — the
walls/rows/shuffle bytes come from tools/bits_probe.py's run."""

from __future__ import annotations

import json
import sys

SRC = sys.argv[1] if len(sys.argv) > 1 else "SCALE_PROBE_D07_INT8_5M.json"

with open(SRC) as fh:
    rep = json.load(fh)

rep["notch"] = (
    "the TRUE production-constant engagement notch (T=17100, 4.5M "
    "clustered vectors, seed-42 generator — same corpus as "
    "SCALE_PROBE_D07_AUTO_5M.json, occupancies reproduce exactly: "
    "288,414 at 4 bits / 147,055 at 5), run FULL-KERNEL with the int8 "
    "verify payload (dedup.py verify_payload='int8', r10 verdict #2). "
    "The float32 S=16 salt-capped row died here in r10 at >100 GB of "
    "shuffle scratch (AUTO_5M full_kernel_rows records the death: 69 GB "
    "spilled, 9.5 GB free); int8 ships round(127*x/||v||) tinyints — "
    "4x fewer payload bytes per banded replica — with an IDENTICAL "
    "candidate set (bands hash float32 signs) and verify cosines within "
    "0.01 of float (d07qx: measured max flip distance 0.0073). "
    "Pair counts below are int8-verify counts; cross-row RATIOS are the "
    "comparable statistic, as in the r10 scaled-notch artifact."
)
rep["payload_context"] = {
    "float32_banded_row_estimate_bytes": 400,
    "float32_s16_exchange_estimate_gb": 115,
    "int8_source": "d07q/d07qx registry keys (exact oracle + boundary-"
    "flip gate), arrowkit.cosine_prep (exact float32 SGEMM: int8 dots "
    "are integers < 2^24)",
    "rows_in_s16_exchange": 4_500_000 * 4 * 16,
}
rep["session"] = (
    "rows run sequentially in one process on one otherwise-idle 32-core "
    "VM (the mirrors/pytest sessions of the same hour finished before "
    "the first timed row's verify stage; the synthesis/occupancy phase "
    "overlapped the tail of a correctness mirror — occupancy values are "
    "counts, not walls, so the overlap cannot affect any recorded "
    "number except possibly the first row's salt-chooser agg, a "
    "single-digit-minute component of a multi-hour row)"
)

with open(SRC, "w") as fh:
    json.dump(rep, fh, indent=1)
    fh.write("\n")
print(f"annotated {SRC}")
