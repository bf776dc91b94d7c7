#!/usr/bin/env python
"""Band-WIDTH probe for the d07/sim10 sign-LSH family — the round-8
verdict-#1 evidence run: fixed 4-bit bands let benign bucket occupancy
grow as ~N/16 per band, so past MAX_SALT's spread the per-task verify
work turns quadratic in corpus size. The width knob
(bits, lsh_tuning.choose_band_bits[_measured]) bounds occupancy at
~N/2^B; its cost is candidate RECALL (a wider band is a stricter
collision filter). This probe measures all three sides on the
scale-probe clustered generator (tools/scale_probe.py synthesize,
seed 42):

- max (band, sig) occupancy per width — the bounded-occupancy claim;
- wall time + emitted rows per width (auto salt engaged at every
  width, the production posture);
- pair/edge agreement vs the 4-bit default (optional --agreement):
  every d07 pair is exact-verified at any width, so the intersection
  count IS the shared-recall count, not a precision statement.

Usage:
  python tools/bits_probe.py --n-vecs 250000 --widths 4,6,8 \
      --families d07,sim10 --agreement --out SCALE_PROBE_BITS_250K.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import scale_probe

    ap = argparse.ArgumentParser()
    ap.add_argument("--n-vecs", type=int, default=250_000)
    ap.add_argument("--dir", default="/tmp/quacfka_bits_probe")
    ap.add_argument("--out", default="SCALE_PROBE_BITS.json")
    ap.add_argument("--widths", default="4,6,8")
    ap.add_argument(
        "--occ-widths",
        default=None,
        help="widths to MEASURE occupancy at without running the "
        "operator (defaults to --widths) — for scale notches where "
        "the narrow-width baseline is infeasible to execute but its "
        "occupancy is the evidence",
    )
    ap.add_argument("--families", default="d07,sim10")
    ap.add_argument("--fixture", default=scale_probe.FIXTURE)
    ap.add_argument(
        "--agreement",
        action="store_true",
        help="join each width's output against the 4-bit default and "
        "record the intersection count (re-executes both plans)",
    )
    ap.add_argument(
        "--autobits",
        action="store_true",
        help="add the auto_bits row (chooser-picked width + auto salt)",
    )
    ap.add_argument(
        "--autobands",
        action="store_true",
        help="add the auto_bits+auto_bands row (d07 only: chooser-"
        "picked width with the analytic recall-recovery band count)",
    )
    ap.add_argument(
        "--target-rows",
        type=int,
        default=0,
        metavar="T",
        help="override lsh_tuning.D07_TARGET_ROWS for this probe "
        "(patched module-wide so the kernels' auto paths see it). The "
        "knob geometry is scale-free — engagement happens at "
        "T * MAX_SALT * 2^min_bits vectors — so shrinking T moves the "
        "SAME salt-saturation -> width-escalation -> recall-recovery "
        "mechanism to a notch whose salted band shuffle fits this "
        "box's disk: at the production T=17,100 the engagement notch "
        "is ~4.4M vectors, where the S=16 row's embedding-carrying "
        "shuffle needs >100 GB of scratch (measured r10: the 4.5M row "
        "died SPILL_OUT_OF_MEMORY/no-space after 69 GB of spill with "
        "9.5 GB free). Production clusters provision shuffle scratch; "
        "a single 252 GB VM does not.",
    )
    ap.add_argument(
        "--stratum-recall",
        type=int,
        default=0,
        metavar="K",
        help="d07wx-style recall certification at the configurations "
        "the rows run, measured on a deterministic 1-in-K vec_id "
        "stratum where exact all-pairs is affordable: band collision "
        "is a PAIRWISE property (axis-aligned sign projections depend "
        "only on the two vectors), so the kernel's pair set restricted "
        "to the stratum equals the kernel run ON the stratum — the "
        "cheap faithful sample of full-corpus recall, and exactly the "
        "documented 100 TB spot-check posture (dedup.py d07x note)",
    )
    ap.add_argument(
        "--chooser-only",
        action="store_true",
        help="measure occupancy + record both families' measured "
        "chooser decisions WITHOUT executing the kernels — for scale "
        "notches (e.g. 8M vectors) where the occupancy/decision is "
        "the evidence and total verify work is cluster-scale by "
        "design (per-task work is what the knobs bound; total work "
        "is what a 1000-executor cluster absorbs)",
    )
    ap.add_argument(
        "--configs",
        default="",
        help="extra bits x bands rows, e.g. '6x8,8x8' — the classic "
        "LSH recall-recovery trade: when width must engage, more "
        "bands buy candidate recall back at linear shuffle cost "
        "(each config joins the --agreement comparison vs the 4x4 "
        "default when that flag is set)",
    )
    ap.add_argument(
        "--payload",
        default="float32",
        choices=["float32", "int8"],
        help="verify payload on the band exchange, applied to BOTH "
        "families' timed rows (dedup.py / similarity.knn_edges "
        "verify_payload). int8 ships round(127*x/||v||) tinyints — "
        "4x fewer payload bytes per banded replica — which is what "
        "makes the production-constant S=16 engagement row fit a "
        "single VM's shuffle scratch (the float32 row died at ~115 GB, "
        "SCALE_PROBE_D07_AUTO_5M.json). Candidate sets are identical "
        "(bands hash float signs); verify cosines shift by <= 0.01 at "
        "dim 64, certified boundary-only by the d07qx key.",
    )
    args = ap.parse_args()
    scale_probe.FIXTURE = args.fixture

    if args.target_rows:
        # both families' targets, so the d07 pairs kernel and the
        # sim10 top-k kernel hit width engagement at the same scaled
        # notch (each kernel reads the module attribute at call time)
        from quacfka_spark.operators import lsh_tuning as _lt

        _lt.D07_TARGET_ROWS = args.target_rows
        _lt.SIM10_TARGET_ROWS = args.target_rows

    from pyspark.sql import functions as F

    from quacfka_spark.operators import lsh_tuning
    from quacfka_spark.operators.dedup import _cosine_lsh_pairs
    from quacfka_spark.operators.lsh_tuning import (
        choose_band_bits,
        max_bucket_occupancy,
        sign_band_cols,
    )
    from quacfka_spark.operators.similarity import knn_edges
    from quacfka_spark.session import get_spark

    # UI on: the probe reads completed-stage shuffleWriteBytes from the
    # REST API to record the band exchange's MEASURED footprint per row
    # (the r10 death note's ~115 GB was inferred; this measures it)
    # retainedStages raised (r11 advisor): the UI evicts completed
    # stages past the default 1000, so multi-row probe runs would lose
    # 'before' stages from 'after' and silently undercount the diffed
    # footprint. Hour-long rows run thousands of stages; 100k keeps the
    # full run's stage list resident (a few hundred bytes each).
    spark = get_spark(
        "bits-probe",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    )

    def shuffle_stages() -> dict | None:
        """{(stageId, attemptId): shuffleWriteBytes} for completed
        stages — diffed around each row to attribute exchange bytes."""
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
    t0 = time.perf_counter()
    # n_docs minimal: this probe only reads embeddings. The generator
    # is deterministic (seed 42), so an existing fixture with the
    # right cardinality is byte-equivalent — skip the multi-minute
    # regeneration when probing the same notch twice (e.g. a
    # float-vs-int8 payload A/B, r12 verdict #1).
    _ep = os.path.join(args.dir, "embeddings.parquet")
    try:
        _have = (
            os.path.exists(_ep)
            and spark.read.parquet(_ep).count() == args.n_vecs
        )
    except Exception:
        _have = False
    if not _have:
        scale_probe.synthesize(spark, args.dir, args.n_vecs, 2000)
    synth_s = round(time.perf_counter() - t0, 2)

    widths = [int(w) for w in args.widths.split(",") if w]
    occ_widths = [
        int(w)
        for w in (args.occ_widths or args.widths).split(",")
        if w
    ]
    fams = args.families.split(",")
    emb = (
        spark.read.parquet(os.path.join(args.dir, "embeddings.parquet"))
        .filter(F.col("embedding").isNotNull())
    )

    def occupancy_at(bits: int, bands: int = 4) -> int:
        banded = emb.select(
            "vec_id",
            F.posexplode_outer(
                F.array(*sign_band_cols(bits, bands))
            ).alias("band", "sig"),
        )
        return max_bucket_occupancy(banded)

    configs = [
        tuple(int(x) for x in c.split("x"))
        for c in args.configs.split(",")
        if c
    ]

    results: dict[str, dict] = {}

    def flush_partial() -> None:
        # hours-long notches (the 5M engagement run) must survive a
        # timeout: every finished row lands in the artifact immediately,
        # flagged partial until the final write
        try:
            with open(args.out, "w") as fh:
                json.dump(
                    {
                        "metric": "band_width_probe",
                        "n_vecs": args.n_vecs,
                        "payload": args.payload,
                        "partial": True,
                        "ops": results,
                    },
                    fh,
                    indent=1,
                )
                fh.write("\n")
        except OSError:
            pass

    def time_one(name: str, fn) -> None:
        # per-row host-window evidence (r12 verdict #2): hour-scale
        # probe rows previously recorded only wall seconds, so a wall
        # inversion between rows (SCALE_PROBE_D07_INT8_5M.json: the
        # recovery row beat autobits despite 1.53x the pairs) had to
        # be attributed by reasoning. Each row now carries the bench's
        # busy/steal/own capture (bench_ingest._timed) plus the
        # derived co-tenant share and window class, so the next
        # inversion is attributed by data. Fields per row:
        #   busy  — host /proc/stat busy fraction over the row's wall
        #   steal — hypervisor steal fraction (noisy-neighbor stalls)
        #   own   — this probe tree's share of host CPU (incl. reaped
        #           children)
        #   other — busy - own: co-tenant load the row competed with
        #   window — clean|contended (bench_ingest.window_class rule)
        from quacfka_spark.bench_ingest import _timed, window_class

        try:
            before = shuffle_stages()

            def run():
                df = fn(spark, args.dir)
                from pyspark.sql import Observation

                obs = Observation()
                df.observe(
                    obs, F.count(F.lit(1)).alias("n")
                ).write.format("noop").mode("overwrite").save()
                return obs

            wall, busy, steal, own, obs = _timed(run)
            results[name] = {
                "sec": round(wall, 2),
                "rows": int(obs.get["n"]),
            }
            if busy is not None:
                results[name]["busy"] = round(busy, 2)
                results[name]["steal"] = round(steal, 2)
                if own is not None:
                    results[name]["own"] = round(own, 2)
                    results[name]["other"] = round(max(busy - own, 0.0), 2)
                wc = window_class([busy], [steal], [own])
                if wc is not None:
                    results[name]["window"] = wc
            after = shuffle_stages()
            if before is not None and after is not None:
                new = {k: v for k, v in after.items() if k not in before}
                gb = 1024.0 ** 3
                results[name]["shuffle_write_gb"] = round(
                    sum(new.values()) / gb, 2
                )
                results[name]["max_stage_shuffle_gb"] = round(
                    max(new.values(), default=0) / gb, 2
                )
            else:
                # an UNMEASURED footprint must be distinguishable from a
                # measured-zero one (r11 advisor): a transient REST
                # failure previously just omitted the fields.
                results[name]["shuffle_write_gb"] = None
                results[name]["footprint_unmeasured_reason"] = (
                    "REST stage fetch failed "
                    f"(before={'ok' if before is not None else 'fail'}, "
                    f"after={'ok' if after is not None else 'fail'})"
                )
        except Exception as e:
            results[name] = {"error": str(e)[:200]}
        print(f"# {name}: {results[name]}", file=sys.stderr)
        flush_partial()

    # per-width occupancy — the bounded-occupancy evidence — plus the
    # analytic chooser picks for the record
    occ_by_bits = {b: occupancy_at(b) for b in sorted(set(occ_widths))}
    for b, nb in configs:
        occ_by_bits[f"b{b}x{nb}"] = occupancy_at(b, nb)
    print(f"# occupancy by width: {occ_by_bits}", file=sys.stderr)
    picks = {
        "d07_analytic_bits": choose_band_bits(
            args.n_vecs, dim=64, bands=4,
            target_rows=lsh_tuning.D07_TARGET_ROWS,
        ),
        "sim10_analytic_bits": choose_band_bits(
            args.n_vecs, dim=64, bands=4,
            target_rows=lsh_tuning.SIM10_TARGET_ROWS,
        ),
    }

    if args.chooser_only:
        from quacfka_spark.operators.lsh_tuning import (
            choose_band_bits_measured,
            salt_for_occupancy,
        )

        def builder(b: int):
            return emb.select(
                "vec_id",
                F.posexplode_outer(
                    F.array(*sign_band_cols(b, 4))
                ).alias("band", "sig"),
            )

        for fam, target in (
            ("d07", lsh_tuning.D07_TARGET_ROWS),
            ("sim10", lsh_tuning.SIM10_TARGET_ROWS),
        ):
            t0 = time.perf_counter()
            bits, occ = choose_band_bits_measured(
                builder, args.n_vecs, dim=64, bands=4, target_rows=target
            )
            salt = (
                salt_for_occupancy(occ, target)
                if fam == "d07"
                else lsh_tuning.choose_salt_topk(
                    builder(bits), target,
                    spark.sparkContext.defaultParallelism,
                )
            )
            picks[f"{fam}_measured"] = {
                "bits": bits,
                "occ": occ,
                "salt_budget": target * lsh_tuning.MAX_SALT,
                "salt_at_pick": salt,
                "chooser_sec": round(time.perf_counter() - t0, 2),
            }
            print(f"# {fam} measured pick: {picks[f'{fam}_measured']}",
                  file=sys.stderr)
        fams = []

    stratum: dict[str, dict] = {}
    if args.stratum_recall:
        # deterministic 1-in-K stratum; pairwise band collision means
        # kernel-on-stratum == full-kernel-restricted-to-stratum (see
        # --stratum-recall help), so these recall rows certify the
        # configurations the timed rows above actually ran.
        import shutil

        from quacfka_spark.operators.dedup import d05_embedding_cosine
        from quacfka_spark.operators.lsh_tuning import (
            bands_for_recall,
            choose_band_bits_measured,
        )

        K = args.stratum_recall
        sdir = os.path.join(args.dir, f"stratum_{K}")
        shutil.rmtree(sdir, ignore_errors=True)
        os.makedirs(sdir, exist_ok=True)
        emb.filter(
            F.pmod(F.xxhash64("vec_id"), F.lit(K)) == 0
        ).write.mode("overwrite").parquet(
            os.path.join(sdir, "embeddings.parquet")
        )
        for name in os.listdir(args.dir):
            if name.endswith(".parquet") and name != "embeddings.parquet":
                os.symlink(
                    os.path.join(args.dir, name), os.path.join(sdir, name)
                )
        n_strat = spark.read.parquet(
            os.path.join(sdir, "embeddings.parquet")
        ).count()

        def builder(b: int):
            return emb.select(
                "vec_id",
                F.posexplode_outer(
                    F.array(*sign_band_cols(b, 4))
                ).alias("band", "sig"),
            )

        bm, _occ = choose_band_bits_measured(
            builder, args.n_vecs, dim=64, bands=4,
            target_rows=lsh_tuning.D07_TARGET_ROWS,
        )
        configs_cert = [(4, 4)]
        if bm != 4:
            configs_cert.append((bm, 4))
            configs_cert.append(
                (bm, bands_for_recall(bm, dim=64, threshold=0.35))
            )

        exact = d05_embedding_cosine(spark, sdir).select(
            "i", "j", F.lit(1).alias("in_exact"), F.lit(0).alias("in_cfg")
        )
        for b, nb in configs_cert:
            cfg = _cosine_lsh_pairs(
                spark, sdir, auto=True, bits=b, bands=nb,
                verify_payload=args.payload,
            ).select(
                "i", "j", F.lit(0).alias("in_exact"), F.lit(1).alias("in_cfg")
            )
            per = (
                exact.unionByName(cfg)
                .groupBy("i", "j")
                .agg(
                    F.max("in_exact").alias("in_exact"),
                    F.max("in_cfg").alias("in_cfg"),
                )
            )
            row = per.agg(
                F.coalesce(F.sum("in_exact"), F.lit(0)).alias("n_exact"),
                F.coalesce(F.sum("in_cfg"), F.lit(0)).alias("n_cfg"),
                F.coalesce(
                    F.sum(F.col("in_exact") * F.col("in_cfg")), F.lit(0)
                ).alias("n_common"),
            ).collect()[0]
            rec = (
                round(row.n_common / row.n_exact, 4) if row.n_exact else None
            )
            stratum[f"b{b}x{nb}"] = {
                "n_exact": int(row.n_exact),
                "n_pairs": int(row.n_cfg),
                "n_common": int(row.n_common),
                "recall": rec,
            }
            print(
                f"# stratum recall b{b}x{nb}: {stratum[f'b{b}x{nb}']}",
                file=sys.stderr,
            )
        stratum["_meta"] = {
            "one_in_k": K,
            "stratum_vectors": int(n_strat),
            "chooser_bits": bm,
        }

    for fam in fams:
        for b in widths:
            if fam == "d07":
                time_one(
                    f"d07_bits{b}",
                    lambda s, d, b=b: _cosine_lsh_pairs(
                        s, d, auto=True, bits=b,
                        verify_payload=args.payload,
                    ),
                )
            else:
                time_one(
                    f"sim10_bits{b}",
                    lambda s, d, b=b: knn_edges(
                        s, d, auto=True, bits=b,
                        verify_payload=args.payload,
                    ),
                )
        for b, nb in configs:
            if fam == "d07":
                time_one(
                    f"d07_b{b}x{nb}",
                    lambda s, d, b=b, nb=nb: _cosine_lsh_pairs(
                        s, d, auto=True, bits=b, bands=nb,
                        verify_payload=args.payload,
                    ),
                )
            else:
                time_one(
                    f"sim10_b{b}x{nb}",
                    lambda s, d, b=b, nb=nb: knn_edges(
                        s, d, auto=True, bits=b, bands=nb,
                        verify_payload=args.payload,
                    ),
                )
        if args.autobits:
            if fam == "d07":
                time_one(
                    "d07_autobits",
                    lambda s, d: _cosine_lsh_pairs(
                        s, d, auto=True, auto_bits=True,
                        verify_payload=args.payload,
                    ),
                )
            else:
                time_one(
                    "sim10_autobits",
                    lambda s, d: knn_edges(
                        s, d, auto=True, auto_bits=True,
                        verify_payload=args.payload,
                    ),
                )
        if args.autobands and fam == "d07":
            time_one(
                "d07_autobits_autobands",
                lambda s, d: _cosine_lsh_pairs(
                    s, d, auto=True, auto_bits=True, auto_bands=True,
                    verify_payload=args.payload,
                ),
            )

    agreement: dict[str, dict] = {}
    if args.agreement:
        for fam in fams:
            base_fn = (
                (lambda s, d: _cosine_lsh_pairs(s, d, auto=True, verify_payload=args.payload))
                if fam == "d07"
                else (lambda s, d: knn_edges(s, d, auto=True))
            )
            # materialize the 4-bit base once: each comparison's
            # .count() would otherwise re-execute the full base plan
            # (~6 min at 1M for d07) per width/config
            base = base_fn(spark, args.dir).select("i", "j").localCheckpoint()
            combos = [(b, 4) for b in widths if b != 4] + configs
            for b, nb in combos:
                wide_fn = (
                    (lambda s, d, b=b, nb=nb: _cosine_lsh_pairs(
                        s, d, auto=True, bits=b, bands=nb,
                        verify_payload=args.payload))
                    if fam == "d07"
                    else (lambda s, d, b=b, nb=nb: knn_edges(
                        s, d, auto=True, bits=b, bands=nb))
                )
                wide = wide_fn(spark, args.dir).select("i", "j")
                shared = base.join(wide, ["i", "j"]).count()
                agreement[f"{fam}_b{b}x{nb}_vs_4x4"] = {"shared": shared}
                print(
                    f"# agreement {fam} b{b}x{nb} vs 4x4: {shared}",
                    file=sys.stderr,
                )

    report = {
        "metric": "band_width_probe",
        "n_vecs": args.n_vecs,
        "payload": args.payload,
        # per-row host-window evidence schema (r12 verdict #2); rows
        # missing these fields ran where /proc was unavailable
        "evidence_fields": {
            "busy": "host /proc/stat busy fraction over the row wall",
            "steal": "hypervisor steal fraction over the row wall",
            "own": "probe tree's share of host CPU (incl. reaped "
            "children)",
            "other": "busy - own: co-tenant load the row competed with",
            "window": "clean|contended per bench_ingest.window_class "
            "(other >= 0.15 or steal >= 0.05 -> contended)",
        },
        "synthesize_sec": synth_s,
        **(
            {"target_rows_override": args.target_rows}
            if args.target_rows
            else {}
        ),
        "occupancy_by_bits": occ_by_bits,
        "chooser_picks": picks,
        "ops": results,
        **({"agreement": agreement} if agreement else {}),
        **({"stratum_recall": stratum} if stratum else {}),
    }
    line = json.dumps(report)
    print(line)
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
        fh.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
