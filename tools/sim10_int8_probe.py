#!/usr/bin/env python
"""sim10 int8 payload at scale: float-vs-int8 head-to-head on 1M
clustered vectors (the SCALE_PROBE_SIM10_1M corpus class).

r12 companion evidence for the sim10q/sim10qx keys (r11 verdict #3):
the fixture-scale keys certify CORRECTNESS (exact oracle parity, rank
stability); this probe measures the ENGAGEMENT claim — the salted
band exchange's byte footprint and wall with the quantized payload vs
float32, plus full-graph edge agreement at 1M vectors where the salt
chooser actually engages (S=6 measured at this scale since r7).
Expectation from the payload math: 64 tinyints = 64 B vs 64 float32 =
256 B per banded replica -> ~4x less exchange payload; candidate set
identical (signatures hash float signs), so agreement should land in
the sim10qx gate's regime.

Run SOLO (walls are the measurement). Writes incrementally.
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
    ap.add_argument("--n-vecs", type=int, default=1_000_000)
    ap.add_argument("--dir", default="/tmp/quacfka_sim10_int8")
    ap.add_argument("--out", default="SCALE_PROBE_SIM10_INT8_1M.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from quacfka_spark.operators.similarity import knn_edges
    from quacfka_spark.session import get_spark
    from tools import scale_probe

    spark = get_spark(
        "sim10-int8-probe",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    )

    def shuffle_stages() -> dict | None:
        try:
            import urllib.request

            base = spark.sparkContext.uiWebUrl
            app = spark.sparkContext.applicationId
            with urllib.request.urlopen(
                f"{base}/api/v1/applications/{app}/stages?status=complete",
                timeout=10,
            ) as r:
                stages = json.load(r)
            return {
                (s["stageId"], s.get("attemptId", 0)): int(
                    s.get("shuffleWriteBytes", 0)
                )
                for s in stages
            }
        except Exception:
            return None

    rep: dict = {
        "metric": "sim10_int8_probe",
        "n_vecs": args.n_vecs,
        "ops": {},
    }

    def flush() -> None:
        with open(args.out, "w") as fh:
            json.dump(rep, fh, indent=1)
            fh.write("\n")

    t0 = time.perf_counter()
    scale_probe.synthesize(spark, args.dir, args.n_vecs, 2000)
    rep["synthesize_sec"] = round(time.perf_counter() - t0, 2)
    flush()

    edges = {}
    for name, payload in (
        ("sim10_float", "float32"),
        ("sim10_int8", "int8"),
    ):
        before = shuffle_stages()
        t0 = time.perf_counter()
        df = knn_edges(spark, args.dir, auto=True, verify_payload=payload)
        out_path = os.path.join(args.dir, f"edges_{name}.parquet")
        df.write.mode("overwrite").parquet(out_path)
        wall = round(time.perf_counter() - t0, 2)
        after = shuffle_stages()
        row = {"sec": wall}
        n = spark.read.parquet(out_path).count()
        row["edges"] = int(n)
        if before is not None and after is not None:
            new = {k: v for k, v in after.items() if k not in before}
            gb = 1024.0**3
            row["shuffle_write_gb"] = round(sum(new.values()) / gb, 2)
            row["max_stage_shuffle_gb"] = round(
                max(new.values(), default=0) / gb, 2
            )
        else:
            row["shuffle_write_gb"] = None
            row["footprint_unmeasured_reason"] = "REST stage fetch failed"
        rep["ops"][name] = row
        edges[name] = out_path
        print(f"# {name}: {row}", file=sys.stderr)
        flush()

    # agreement: identical-(i,j) membership and identical-(i,j,rnk)
    f = spark.read.parquet(edges["sim10_float"])
    q = spark.read.parquet(edges["sim10_int8"])
    both = f.select("i", "j", F.col("rnk").alias("rf")).join(
        q.select("i", "j", F.col("rnk").alias("rq")), ["i", "j"]
    )
    n_common, n_rank_eq = both.agg(
        F.count(F.lit(1)), F.sum((F.col("rf") == F.col("rq")).cast("long"))
    ).first()
    n_f = f.count()
    n_q = q.count()
    rep["agreement"] = {
        "n_float": int(n_f),
        "n_int8": int(n_q),
        "n_common": int(n_common),
        "membership_agreement": round(n_common / max(n_f, 1), 4),
        "rank_agreement_of_common": round(
            (n_rank_eq or 0) / max(n_common, 1), 4
        ),
    }
    flush()
    print(f"# agreement: {rep['agreement']}", file=sys.stderr)
    spark.stop()
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
