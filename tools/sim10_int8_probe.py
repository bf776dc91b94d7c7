#!/usr/bin/env python
"""sim10 int8 payload at scale: float-vs-int8 head-to-head on the
clustered seed-42 corpus (the SCALE_PROBE_SIM10_1M corpus class).

r12 companion evidence for the sim10q/sim10qx keys (r11 verdict #3):
the fixture-scale keys certify CORRECTNESS (exact oracle parity, rank
stability); this probe measures the ENGAGEMENT claim — the salted
band exchange's byte footprint and wall with the quantized payload vs
float32, plus full-graph edge agreement where both rows complete.
Expectation from the payload math: 64 tinyints = 64 B vs 64 float32 =
256 B per banded replica -> ~4x less exchange payload; candidate set
identical (signatures hash float signs), so agreement should land in
the sim10qx gate's regime.

r13 (r12 verdict #1): --salt/--bits select the EXCHANGE-BOUND notch —
the knob's contract is "ship int8 when the salted exchange binds",
previously backed only by d07's pairs-kernel notch. The band
exchange's size is bands * S * N * payload_bytes (width changes
occupancy, not exchange rows), so at 4.5M vectors and S=16 the
float32 exchange needs ~80 GB of shuffle scratch — past this VM's
free disk, the same regime where r10's d07 float row died
(SCALE_PROBE_D07_AUTO_5M.json) — while int8's ~20 GB completes
(SCALE_PROBE_D07_INT8_5M.json). The int8 row runs FIRST (clean
scratch); the float row runs last so its expected death cannot take
the completed measurement with it. Each row carries the bench's
host-window evidence (busy/steal/own/other + window class, r12
verdict #2) so walls are attributable by data.

Run SOLO (walls are the measurement). Writes incrementally.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _tmp_spark_dirs() -> set[str]:
    """Spark scratch dirs under /tmp (shuffle/blockmgr live here in
    local mode). Snapshot before the run; anything NEW is this probe's
    to clean when a disk-full death skips the JVM's own shutdown
    cleanup."""
    out = set()
    try:
        for d in os.listdir("/tmp"):
            if d.startswith(("spark-", "blockmgr-")):
                out.add(os.path.join("/tmp", d))
    except OSError:
        pass
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-vecs", type=int, default=1_000_000)
    ap.add_argument("--dir", default="/tmp/quacfka_sim10_int8")
    ap.add_argument("--out", default="SCALE_PROBE_SIM10_INT8_1M.json")
    ap.add_argument(
        "--salt",
        type=int,
        default=0,
        help="manual salt_groups for BOTH rows (0 = auto chooser). The "
        "top-k chooser's own task-count rule picks small S — exactly "
        "why the exchange-bound regime must be entered manually: "
        "exchange bytes scale with S while top-k selection work does "
        "not, so a high-S plan (e.g. the d07 occupancy rule's S=16 at "
        "this corpus class) is where the payload knob earns its keep.",
    )
    ap.add_argument(
        "--bits",
        type=int,
        default=0,
        help="manual band width for both rows (0 = the 4-bit default). "
        "Width bounds per-bucket occupancy (selection work); it does "
        "NOT change exchange size (bands * S * N rows either way).",
    )
    ap.add_argument(
        "--int8-first",
        action="store_true",
        help="run the int8 row before float32 — for notches where the "
        "float exchange is expected to exceed scratch (its death must "
        "not precede the completing measurement).",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from quacfka_spark.bench_ingest import _timed, window_class
    from quacfka_spark.operators.similarity import knn_edges
    from quacfka_spark.session import get_spark
    from tools import scale_probe

    def fresh_session():
        """One session PER ROW: shuffle files from a completed row can
        linger until the ContextCleaner GCs them, and at an exchange-
        bound notch that leftover would make the next row's death an
        artifact of residue, not of its own footprint. A fresh JVM per
        row starts from clean scratch; leftover dirs from a killed
        predecessor are reclaimed first."""
        return get_spark(
            "sim10-int8-probe",
            extra_conf={
                "spark.ui.enabled": "true",
                "spark.ui.retainedStages": "100000",
            },
        )

    def shuffle_stages(spark) -> dict | None:
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
        **({"salt_groups": args.salt} if args.salt else {}),
        **({"bits": args.bits} if args.bits else {}),
        "evidence_fields": {
            "busy": "host /proc/stat busy fraction over the row wall",
            "steal": "hypervisor steal fraction over the row wall",
            "own": "probe tree's share of host CPU (incl. reaped "
            "children)",
            "other": "busy - own: co-tenant load the row competed with",
            "window": "clean|contended per bench_ingest.window_class",
        },
        "ops": {},
    }

    def flush() -> None:
        # disk-full tolerant: at an exchange-bound notch the flush can
        # race the float row's scratch exhaustion; keep the last good
        # artifact rather than dying inside the error handler
        try:
            with open(args.out, "w") as fh:
                json.dump(rep, fh, indent=1)
                fh.write("\n")
        except OSError as e:
            print(f"# flush failed: {e}", file=sys.stderr)

    pre_dirs = _tmp_spark_dirs()
    spark = fresh_session()
    t0 = time.perf_counter()
    # deterministic seed-42 generator: an existing fixture with the
    # right cardinality is byte-equivalent — skip regeneration
    ep = os.path.join(args.dir, "embeddings.parquet")
    try:
        have = (
            os.path.exists(ep)
            and spark.read.parquet(ep).count() == args.n_vecs
        )
    except Exception:
        have = False
    if not have:
        scale_probe.synthesize(spark, args.dir, args.n_vecs, 2000)
    rep["synthesize_sec"] = round(time.perf_counter() - t0, 2)
    flush()
    spark.stop()

    kw: dict = {}
    if args.salt:
        kw["salt_groups"] = args.salt
    else:
        kw["auto"] = True
    if args.bits:
        kw["bits"] = args.bits

    order = [("sim10_float", "float32"), ("sim10_int8", "int8")]
    if args.int8_first:
        order.reverse()

    edges: dict[str, str] = {}
    try:
        for name, payload in order:
            # reclaim any scratch a prior row's death left behind, so
            # each row's free-disk evidence reflects ITS OWN footprint
            for d in _tmp_spark_dirs() - pre_dirs:
                shutil.rmtree(d, ignore_errors=True)
            spark = fresh_session()
            free_gb = round(shutil.disk_usage("/tmp").free / 1024**3, 1)
            before = shuffle_stages(spark)
            out_path = os.path.join(args.dir, f"edges_{name}.parquet")

            def run(spark=spark, payload=payload, out_path=out_path):
                df = knn_edges(
                    spark, args.dir, verify_payload=payload, **kw
                )
                df.write.mode("overwrite").parquet(out_path)

            try:
                wall, busy, steal, own, _ = _timed(run)
                row = {"sec": round(wall, 2)}
                n = spark.read.parquet(out_path).count()
                row["edges"] = int(n)
                edges[name] = out_path
            except Exception as e:
                # the expected float death at an exchange-bound notch
                # (scratch exhaustion) — record it as data, don't die
                wall = busy = steal = own = None
                row = {"error": str(e)[:400]}
            row["scratch_free_gb_at_start"] = free_gb
            if busy is not None:
                row["sec_busy"] = round(busy, 2)
                row["sec_steal"] = round(steal, 2)
                if own is not None:
                    row["sec_own"] = round(own, 2)
                    row["sec_other"] = round(max(busy - own, 0.0), 2)
                wc = window_class([busy], [steal], [own])
                if wc is not None:
                    row["window"] = wc
            after = shuffle_stages(spark)
            if before is not None and after is not None:
                new = {k: v for k, v in after.items() if k not in before}
                gb = 1024.0**3
                row["shuffle_write_gb"] = round(sum(new.values()) / gb, 2)
                row["max_stage_shuffle_gb"] = round(
                    max(new.values(), default=0) / gb, 2
                )
            elif "error" not in row:
                row["shuffle_write_gb"] = None
                row["footprint_unmeasured_reason"] = (
                    "REST stage fetch failed"
                )
            rep["ops"][name] = row
            print(f"# {name}: {row}", file=sys.stderr)
            try:
                spark.stop()
            except Exception:
                pass
            flush()

        # agreement: identical-(i,j) membership and identical rank —
        # only when BOTH rows completed (an exchange-bound notch is
        # expected to kill the float row before it produces a graph)
        if len(edges) == 2:
            for d in _tmp_spark_dirs() - pre_dirs:
                shutil.rmtree(d, ignore_errors=True)
            spark = fresh_session()
            f = spark.read.parquet(edges["sim10_float"])
            q = spark.read.parquet(edges["sim10_int8"])
            both = f.select("i", "j", F.col("rnk").alias("rf")).join(
                q.select("i", "j", F.col("rnk").alias("rq")), ["i", "j"]
            )
            n_common, n_rank_eq = both.agg(
                F.count(F.lit(1)),
                F.sum((F.col("rf") == F.col("rq")).cast("long")),
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
    finally:
        # a disk-full death skips the JVM's shutdown cleanup; reclaim
        # THIS run's scratch dirs (never another session's)
        for d in _tmp_spark_dirs() - pre_dirs:
            shutil.rmtree(d, ignore_errors=True)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
