#!/usr/bin/env python
"""Attribute the streaming-wide per-micro-batch fixed cost (r12
verdict #4).

INGEST_WIDE_PASSCURVE.json fits the wide STREAMING ingest at ~656 MB/s
asymptote with ~2.8 s fixed cost per pass vs batch's ~930 / ~1.2 s;
the extra ~1.6 s/epoch is per-micro-batch overhead. This tool runs the
exact bench workload (bench_ingest SHAPES['wide'], same source/codec/
pipeline construction) at TWO payload sizes per epoch and decomposes
each epoch's wall from two independent vantage points:

- the ENGINE's own StreamingQueryProgress durationMs: latestOffset +
  getBatch + queryPlanning (source planning), walCommit +
  commitOffsets (the exactly-once checkpoint barrier), addBatch (our
  foreachBatch body), triggerExecution (the whole epoch);
- the PIPELINE's per-epoch phase trace (StreamingPipeline.epoch_trace):
  raw-sink write vs derived-sink (readback + normalizer) write vs
  epilogue (publish/metrics), plus the inter-epoch gap (epoch N exit
  to N+1 enter = everything the engine does between addBatch calls).

Two payload sizes give a two-point linear fit per term: the intercept
is that term's FIXED cost per epoch (what the pass-curve's 2.8 s is
made of), the slope is payload-proportional work. Run SOLO.

Usage: python tools/stream_fixed_cost.py --out STREAM_FIXED_COST.json
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DUR_KEYS = (
    "latestOffset",
    "getBatch",
    "queryPlanning",
    "walCommit",
    "commitOffsets",
    "addBatch",
    "triggerExecution",
)


def run_one(spark, rows: int, epochs: int, work_dir: str) -> dict:
    from pyspark.sql import functions as F  # noqa: F401

    from quacfka_spark.bench_ingest import SHAPES, _codec, _gen_bytes
    from quacfka_spark.plans.normalizer import NormalizerSpec
    from quacfka_spark.streaming import PipelineConfig, StreamingPipeline

    sh = SHAPES["wide"]
    cores = spark.sparkContext.defaultParallelism
    src = os.path.join(work_dir, "src")
    out = os.path.join(work_dir, "out")
    shutil.rmtree(work_dir, ignore_errors=True)
    fmt, encode, decode = _codec(spark, sh)
    mb = _gen_bytes(spark, rows, src, cores * epochs, encode, sh.payload)

    source = (
        spark.readStream.schema("value binary")
        .option("maxFilesPerTrigger", str(cores))
        .parquet(src)
    )
    pipe = StreamingPipeline(
        spark,
        source,
        PipelineConfig(
            output_dir=out, dest_table="messages", available_now=True
        ),
        decode=decode,
        normalizer=NormalizerSpec(
            fields=[f"r.{f}" for f in sh.norm_fields],
            aliases=list(sh.norm_aliases),
        ),
    )
    t0 = time.perf_counter()
    q = pipe.start()
    q.awaitTermination()
    wall = time.perf_counter() - t0
    err = pipe.error()
    if err is not None:
        raise RuntimeError(str(err))

    # engine vantage: per-epoch durationMs (skip epoch 0 — it pays
    # stream start + codegen warmup and would skew a median of 8)
    prog = [p for p in q.recentProgress if p.get("batchId", 0) != 0]
    dur = {
        k: statistics.median(
            p["durationMs"].get(k, 0) / 1000.0 for p in prog
        )
        for k in _DUR_KEYS
        if prog
    }
    # pipeline vantage: in-batch split + inter-epoch gap
    tr = sorted(pipe.epoch_trace, key=lambda t: t["epoch"])
    gaps = [
        round(b["enter"] - a["exit"], 3)
        for a, b in zip(tr, tr[1:])
    ]
    split = {
        k: statistics.median(t[k] for t in tr[1:])
        for k in ("raw_s", "derived_s", "epilogue_s")
        if len(tr) > 1
    }
    shutil.rmtree(work_dir, ignore_errors=True)
    return {
        "rows": rows,
        "epochs": epochs,
        "rows_per_epoch": rows // epochs,
        "mb": round(mb, 1),
        "wall_s": round(wall, 2),
        "mb_per_s": round(mb / wall, 1),
        "median_epoch_durations_s": {
            k: round(v, 3) for k, v in dur.items()
        },
        "median_inbatch_split_s": {
            k: round(v, 3) for k, v in split.items()
        },
        "median_interepoch_gap_s": (
            round(statistics.median(gaps), 3) if gaps else None
        ),
        "interepoch_gaps_s": gaps,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--rows-small", type=int, default=400_000)
    ap.add_argument("--rows-large", type=int, default=1_600_000)
    ap.add_argument("--work-dir", default="/tmp/quacfka_stream_fixed")
    ap.add_argument("--out", default="STREAM_FIXED_COST.json")
    args = ap.parse_args()

    from quacfka_spark.bench_ingest import _timed, window_class
    from quacfka_spark.session import get_spark

    spark = get_spark("stream-fixed-cost")
    rep: dict = {"metric": "stream_fixed_cost", "runs": {}}

    for name, rows in (
        ("small", args.rows_small),
        ("large", args.rows_large),
    ):
        wall, busy, steal, own, r = _timed(
            lambda rows=rows: run_one(
                spark, rows, args.epochs, args.work_dir
            )
        )
        if busy is not None and own is not None:
            r["busy"], r["own"] = round(busy, 2), round(own, 2)
            r["other"] = round(max(busy - own, 0.0), 2)
            wc = window_class([busy], [steal], [own])
            if wc:
                r["window"] = wc
        rep["runs"][name] = r
        print(f"# {name}: {json.dumps(r)}", file=sys.stderr)

    # two-point fit per term: fixed = intercept at rows_per_epoch -> 0
    s, l = rep["runs"]["small"], rep["runs"]["large"]
    x1, x2 = s["rows_per_epoch"], l["rows_per_epoch"]
    fit = {}
    for k in _DUR_KEYS:
        y1 = s["median_epoch_durations_s"].get(k)
        y2 = l["median_epoch_durations_s"].get(k)
        if y1 is None or y2 is None or x2 == x1:
            continue
        slope = (y2 - y1) / (x2 - x1)
        fit[k] = {
            "fixed_s": round(y1 - slope * x1, 3),
            "s_per_mrow": round(slope * 1e6, 3),
        }
    for k in ("raw_s", "derived_s", "epilogue_s"):
        y1 = s["median_inbatch_split_s"].get(k)
        y2 = l["median_inbatch_split_s"].get(k)
        if y1 is None or y2 is None or x2 == x1:
            continue
        slope = (y2 - y1) / (x2 - x1)
        fit[k] = {
            "fixed_s": round(y1 - slope * x1, 3),
            "s_per_mrow": round(slope * 1e6, 3),
        }
    rep["per_epoch_fixed_fit"] = fit
    engine_side = sum(
        fit[k]["fixed_s"]
        for k in ("latestOffset", "getBatch", "queryPlanning",
                  "walCommit", "commitOffsets")
        if k in fit
    )
    rep["engine_side_fixed_s"] = round(engine_side, 3)
    if fit:
        dom = max(
            (k for k in fit if k != "triggerExecution"),
            key=lambda k: fit[k]["fixed_s"],
        )
        rep["dominant_fixed_term"] = dom
    with open(args.out, "w") as fh:
        json.dump(rep, fh, indent=1)
        fh.write("\n")
    print(json.dumps({k: rep[k] for k in
                      ("per_epoch_fixed_fit", "engine_side_fixed_s",
                       "dominant_fixed_term") if k in rep}))
    spark.stop()


if __name__ == "__main__":
    main()
