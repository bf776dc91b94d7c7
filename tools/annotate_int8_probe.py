#!/usr/bin/env python
"""Re-apply the committed annotations to SCALE_PROBE_D07_INT8_5M.json.

tools/bits_probe.py's flush_partial/final write uses a fixed schema, so
any run that completes another row overwrites the context annotations.
This script merges them back over the probe's latest ops/occupancy data
— run it after the probe finishes (or is killed) and commit the result.
Walls/rows/shuffle bytes always come from the probe; only prose context
is (re)attached here.
"""

from __future__ import annotations

import json
import sys

SRC = sys.argv[1] if len(sys.argv) > 1 else "SCALE_PROBE_D07_INT8_5M.json"

with open(SRC) as fh:
    rep = json.load(fh)

ops = rep.get("ops", {})

rep["notch"] = (
    "the TRUE production-constant engagement notch (T=17100, 4.5M clustered "
    "vectors, seed-42 generator — same corpus as SCALE_PROBE_D07_AUTO_5M.json, "
    "occupancies reproduce exactly: 288,414 at 4 bits / 147,055 at 5), run "
    "FULL-KERNEL with the int8 verify payload (dedup.py verify_payload='int8', "
    "r10 verdict #2). The float32 S=16 salt-capped row died here in r10 at "
    ">100 GB of shuffle scratch (AUTO_5M full_kernel_rows records the death: "
    "69 GB spilled, 9.5 GB free); int8 ships round(127*x/||v||) tinyints — 4x "
    "fewer payload bytes per banded replica — with an IDENTICAL candidate set "
    "(bands hash float32 signs) and verify cosines within 0.01 of float "
    "(d07qx key: measured max flip distance 0.0073). Pair counts are "
    "int8-verify counts; cross-row RATIOS are the comparable statistic."
)
rep["internal_consistency"] = (
    "emitted-pair ratio autobits/salt-capped = 7.221B/10.634B = 0.679 — the "
    "r10 stratum-recall certification predicted exactly this (b5x4 0.3314 / "
    "b4x4 0.4879 = 0.679, AUTO_5M.json stratum_recall): the full-corpus "
    "10.6B-pair kernel reproduces the 1-in-32-stratum measurement to 3 "
    "decimals, so the walls carry exactly the predicted recall trade."
)
walls = {
    "d07_bits4_saltcap16": "8361 s — what a user running fixed 4-bit width is "
    "paying past engagement (salt capped at 16, per-task verify side "
    "288414/16 = 18,026 rows vs the 17,100 target)",
    "d07_autobits": "5362 s — 1.56x faster unrecovered; the wall ratio is "
    "smaller than the scaled notch's 4.03x because at 10^10 emitted pairs the "
    "min-band/emission work (proportional to verified pairs, identical across "
    "rows) dominates the matmul the width knob shrinks",
}
if "d07_autobits_autobands" in ops and "sec" in ops["d07_autobits_autobands"]:
    ab = ops["d07_autobits_autobands"]
    ratio = ab["rows"] / ops["d07_bits4"]["rows"]
    walls["d07_autobits_autobands"] = (
        f"{ab['sec']:.0f} s — the 5x7 recovery family at {ratio:.3f}x the "
        "salt-capped pair count (the stratum certification predicted 1.041x "
        "— recall recovered above the 4-bit baseline at linear band cost)"
    )
else:
    walls["d07_autobits_autobands"] = (
        "did not complete inside the build window (the 5x7 recovery family, "
        "predicted ~1.041x the salt-capped pairs per the stratum ratio); the "
        "scaled-notch three-row comparison (SCALE_PROBE_D07_AUTO_SCALED.json) "
        "remains the recovery-wall evidence"
    )
rep["walls"] = walls
if "d07_autobits_autobands" in ops and "sec" in ops["d07_autobits_autobands"]:
    ab = ops["d07_autobits_autobands"]
    au = ops["d07_autobits"]
    rep["wall_inversion"] = (
        f"the recovery row's wall ({ab['sec']:.0f} s) UNDERCUTS unrecovered "
        f"autobits ({au['sec']:.0f} s) despite {ab['rows'] / au['rows']:.2f}x "
        "the emitted pairs — reasoned, not measured: both rows run the same "
        "5-bit buckets (autobands only adds 3 more band families at linear "
        "cost, expected ~1.75x the matmul work), and the per-emitted-pair "
        f"rate ({ab['rows'] / ab['sec'] / 1e6:.2f}M/s vs "
        f"{au['rows'] / au['sec'] / 1e6:.2f}M/s) differs by MORE than that "
        "work ratio, which no plan-side knob explains. The rows ran "
        "sequentially across ~5 h windows each on the host with documented "
        "random multi-10s stalls (see BENCH_STATS.json steal evidence); the "
        "probe records no per-row busy/steal, so the inversion is attributed "
        "to host-window contention in the autobits run. The cross-row "
        "RECALL ratios (0.679 / 1.039, both reproducing the stratum "
        "certification to 3 decimals) are window-independent and remain the "
        "comparable statistic."
    )
fp = {
    "s16_exchange_measured_gb": ops.get("d07_bits4", {}).get(
        "max_stage_shuffle_gb"
    ),
    "autobits_s9_exchange_measured_gb": ops.get("d07_autobits", {}).get(
        "max_stage_shuffle_gb"
    ),
    "float32_s16_death_estimate_gb": ">100 (r10, SPILL_OUT_OF_MEMORY)",
    "method": "Spark REST API completed-stage shuffleWriteBytes, diffed per row",
    "note": "compressed on-disk shuffle bytes; the 5x+ reduction vs float is "
    "what turned the row from disk-infeasible to completed on a 252 GB VM "
    "with 79 GB free",
}
if "d07_autobits_autobands" in ops:
    fp["autobands_s9x7_exchange_measured_gb"] = ops[
        "d07_autobits_autobands"
    ].get("max_stage_shuffle_gb")
rep["footprint"] = fp
rep["quantizer_note"] = (
    "these walls predate r12's quantizer rework (the Catalyst transform "
    "was replaced by one vectorized Arrow pass, "
    "functions/vector.with_int8_embedding, values bit-identical). In this "
    "kernel's plan the old transform sat below the band Generate — "
    "evaluated once per row, ~1.8 ms/row single-core measured at 50k — so "
    "its share of these walls is ~250 s on 32 cores (3-5%), and the "
    "cross-row RATIOS are unaffected. (The per-replica re-fire pathology "
    "the rework fixed bit plans that quantized inside the explode "
    "projection, sim10q's original shape, not this one.)"
)
rep["payload_source"] = (
    "d07q/d07qx registry keys (exact quantization oracle + boundary-flip "
    "gate); arrowkit.cosine_prep (int8 dots are integers < 2^24 — exact "
    "float32 SGEMM, unit-tested bit-equal to float64)"
)

with open(SRC, "w") as fh:
    json.dump(rep, fh, indent=1)
    fh.write("\n")
print(f"annotated {SRC}: rows={list(ops)}")
