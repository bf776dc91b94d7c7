#!/usr/bin/env python
"""Measure d10's multi-probe recall/cost curve (round-6 verdict ask #5).

For probe in {1, 2, 3} at each fixture SF: run the d10x recall
measurement with that probe width and record recall plus the verify
cost, both as wall seconds of the d10 pass alone and as the work proxy
sum(cell_size^2) over the probe-widened memberships (the quantity the
per-cell kernel actually pays). Writes D10_RECALL_CURVE.json — the
documented evidence behind d10's probe=3 operating point.

Usage: python tools/d10_curve.py [--sfs 0.001,0.01,0.1] [--out FILE]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sfs", default="0.001,0.01,0.1")
    ap.add_argument("--root", default="/root/testdata")
    ap.add_argument("--out", default="D10_RECALL_CURVE.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from quacfka_spark.operators.dedup import (
        d10_semdedup,
        d10x_semdedup_recall,
    )
    from quacfka_spark.session import get_spark

    spark = get_spark("d10-curve")
    curve: list[dict] = []
    for sf in args.sfs.split(","):
        sf_dir = os.path.join(args.root, f"sf{sf}")
        for probe in (1, 2, 3):
            t0 = time.perf_counter()
            d10_semdedup(spark, sf_dir, probe=probe).write.format(
                "noop"
            ).mode("overwrite").save()
            d10_sec = round(time.perf_counter() - t0, 2)
            row = d10x_semdedup_recall(spark, sf_dir, probe=probe).collect()[0]
            # verify-work proxy: each (cell) group pays ~|cell|^2 cosine
            # terms; memberships are N x probe rows
            from quacfka_spark.catalog import load_views
            from quacfka_spark.operators.similarity import (
                pack_centroids,
                top_cells,
                train_centroids,
            )
            from quacfka_spark.operators.dedup import _D10_K, _D10_DIM

            e = load_views(spark, sf_dir)["embeddings"].filter(
                F.col("embedding").isNotNull()
            )
            cents = train_centroids(e, _D10_K, dim=_D10_DIM, spread=False)
            work = (
                e.crossJoin(F.broadcast(pack_centroids(cents)))
                .select(
                    F.explode(
                        F.transform(
                            top_cells(F.col("embedding"), F.col("cbs"), probe),
                            lambda s: s["cid"],
                        )
                    ).alias("cell")
                )
                .groupBy("cell")
                .agg(F.count(F.lit(1)).alias("c"))
                .agg(F.sum(F.col("c") * F.col("c")).alias("w"))
                .collect()[0]["w"]
            )
            rec = {
                "sf": sf,
                "probe": probe,
                "recall": float(row["recall"]) if row["recall"] is not None else None,
                "n_exact": int(row["n_exact"]),
                "n_d10": int(row["n_d10"]),
                "d10_sec": d10_sec,
                "verify_work_pairs": int(work),
            }
            curve.append(rec)
            print(f"# {rec}", file=sys.stderr)
    out = {"metric": "d10_multiprobe_recall_curve", "k": 16, "curve": curve}
    line = json.dumps(out)
    print(line)
    with open(args.out, "w") as fh:
        fh.write(line + "\n")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
