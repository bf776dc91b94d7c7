"""Ingestion-throughput benchmark — the reference's headline metric.

The only published numbers for the reference are ingest rates from a
5-minute Kafka -> DuckDB run (/root/reference/README.md:151-173,
BASELINE.md): 398k raw records/s, 806k total rows/s (raw + normalized),
500 MB/s on 60 CPUs. This module reproduces that pipeline shape on Spark
and measures the same three numbers:

    bytes at rest  ->  decode (protobuf wire ~ the unmarshal pool, D7)
                   ->  raw nested table write           (D13)
                   ->  normalized flat table write      (D10 explode)
                   ->  parquet files                    (rotation unit)

Faithfulness notes:
- The source is a pre-materialized parquet of PROTOBUF-encoded nested
  payload bytes — the reference's actual payload format (README.md:6) —
  decoded JVM-side by the repo's wire codec (sources/proto_jvm.py),
  measured 1.8x faster than the JSON twin. When the codec jar cannot
  load, both generation and decode fall back to JSON (from_json); the
  report's ``decode`` field records which path ran. Generation is NOT
  timed — Kafka is external to the reference's measurement too; it
  measures consume -> insert.
- The normalizer output reproduces D10 semantics: one row per repeated
  element, scalars duplicated, null row on empty list (explode_outer).
- Writes are partitioned to the core count (writer tasks ~ the
  reference's 24 duck connections, D23) and go to local parquet, the
  analog of the rotated .db files.

Scale: every stage here is a narrow map (decode, explode, write) — no
shuffle at all — so the pipeline scales linearly with executors; the
only coordination is the write commit. That is the same shape as the
reference (independent worker pools, no cross-worker exchange).
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from dataclasses import dataclass
from typing import Callable

from quacfka_spark.sources.mock import NESTED_SCHEMA, nested_payload
from quacfka_spark.sources.proto_wire import Field, MessageSpec

DEFAULT_ROWS = int(os.environ.get("SPARK_GRAFT_INGEST_ROWS", "4000000"))
# The wide shape's row cap is higher (r11 #1, INGEST_WIDE_PASSCURVE.json):
# the rate-vs-pass-length curve is still rising at the 4M-row cap
# (427.7 -> 692.4 -> 764.0 MB/s at 0.75M/2.2M/4M rows in one clean
# window; two-point fit asymptote ~930 MB/s with ~1.2 s fixed pass
# cost), so a fast window sized to rate*12s was being CLIPPED by the
# cap to ~6 s passes. 8M rows (~9.8 GB payload) only engages when the
# measured rate supports it — slow windows still auto-size small.
WIDE_MAX_ROWS = int(os.environ.get("SPARK_GRAFT_INGEST_WIDE_MAX", "8000000"))

# protobuf twin of NESTED_SCHEMA (field order == struct field order, as
# the encoder requires)
BENCH_SPEC = MessageSpec(
    [
        Field(1, "site", "message", message=MessageSpec(
            [Field(1, "id", "int64"), Field(2, "name", "string")])),
        Field(2, "user_id", "int64"),
        Field(3, "amount", "double"),
        Field(4, "deals", "message", repeated=True, message=MessageSpec(
            [Field(1, "id", "int64"), Field(2, "kind", "string")])),
    ]
)

# README-shaped payload (byte parity with the reference's published run):
# /root/reference/README.md:154-167 moved 146.53 GB over 123.69M records
# = ~1,270 B/record with normalizer_fields = 10 and norm_records ~= raw
# records (122.2M vs 123.7M). The exact message type isn't published, so
# this is an ad-event message of that SIZE and SHAPE: nested site /
# device / user blocks dominated by realistic string fields (URLs, UA,
# uuid-ish ids, an ext JSON blob), one repeated `deals` block averaging
# just under 1 element per record, and a 10-field normalizer.
WIDE_SPEC = MessageSpec(
    [
        Field(1, "event_id", "string"),
        Field(2, "ts", "int64"),
        Field(3, "event_type", "string"),
        Field(4, "site", "message", message=MessageSpec(
            [
                Field(1, "id", "int64"),
                Field(2, "name", "string"),
                Field(3, "domain", "string"),
                Field(4, "page", "string"),
                Field(5, "referrer", "string"),
                Field(6, "categories", "string", repeated=True),
            ]
        )),
        Field(5, "device", "message", message=MessageSpec(
            [
                Field(1, "ua", "string"),
                Field(2, "ip", "string"),
                Field(3, "os", "string"),
                Field(4, "model", "string"),
                Field(5, "ifa", "string"),
                Field(6, "lang", "string"),
            ]
        )),
        Field(6, "user", "message", message=MessageSpec(
            [
                Field(1, "id", "string"),
                Field(2, "buyeruid", "string"),
                Field(3, "segments", "string", repeated=True),
            ]
        )),
        Field(7, "amount", "double"),
        Field(8, "currency", "string"),
        Field(9, "ext", "string"),
        Field(10, "deals", "message", repeated=True, message=MessageSpec(
            [
                Field(1, "id", "int64"),
                Field(2, "kind", "string"),
                Field(3, "bidfloor", "double"),
                Field(4, "seat", "string"),
            ]
        )),
    ]
)


def _hex16(seq: F.Column, seed: int) -> F.Column:
    """Deterministic 16-hex-char token from the sequence (uuid/ids)."""
    return F.lower(F.lpad(F.hex(F.xxhash64(F.lit(seed), seq)), 16, "0"))


def _uuidish(seq: F.Column, seed: int) -> F.Column:
    h1, h2 = _hex16(seq, seed), _hex16(seq, seed + 1)
    return F.concat_ws(
        "-",
        F.substring(h1, 1, 8),
        F.substring(h1, 9, 4),
        F.substring(h1, 13, 4),
        F.substring(h2, 1, 4),
        F.substring(h2, 5, 12),
    )


def wide_payload(seq: F.Column) -> F.Column:
    """Deterministic ~1.27 KB nested ad-event struct (see WIDE_SPEC).
    Generation is pure Catalyst expressions — untimed, like the
    reference's protorand generator (kafka.go:248-255)."""
    s = lambda n: (seq % n).cast("string")  # noqa: E731
    page = F.concat(
        F.lit("https://publisher-"), s(5000),
        F.lit(".example.com/section/"), _hex16(seq, 11),
        F.lit("/article-"), F.lpad(s(1000000), 12, "0"),
        F.lit("?utm_source=partner&utm_medium=cpc&utm_campaign=c"), s(997),
        F.lit("&ref="), _hex16(seq, 12),
    )
    referrer = F.concat(
        F.lit("https://search.example.org/results?q=topic+"), s(10007),
        F.lit("&page="), s(20),
        F.lit("&session="), _hex16(seq, 13),
        F.lit("&locale=en-US&safe=active"),
    )
    ua = F.concat(
        F.lit("Mozilla/5.0 (Linux; Android 14; SM-G99"), s(10),
        F.lit(") AppleWebKit/537.36 (KHTML, like Gecko) Chrome/12"), s(6),
        F.lit(".0.0.0 Mobile Safari/537.36"),
    )
    segments = F.transform(
        F.sequence(F.lit(0), F.lit(7)),
        lambda i: F.concat(
            F.lit("seg_"), F.lpad(((seq * 31 + i * 7) % 1000003).cast("string"), 7, "0")
        ),
    )
    ext = F.concat(
        F.lit('{"bidder":{"cpm_adjust":0.'), F.lpad(s(100), 2, "0"),
        F.lit(',"placements":["pl_'), _hex16(seq, 21),
        F.lit('","pl_'), _hex16(seq, 22),
        F.lit('"],"deal_hints":{"floor_bucket":'), s(16),
        F.lit(',"pmp_eligible":true}},"analytics":{"session":"'),
        _uuidish(seq, 23),
        F.lit('","page_depth":'), s(40),
        F.lit(',"scroll_pct":'), s(101),
        F.lit(',"experiments":["exp_'), _hex16(seq, 24),
        F.lit('","exp_'), _hex16(seq, 25),
        F.lit('"]},"consent":{"gdpr":1,"tcf":"'), _hex16(seq, 26),
        F.lit(_EXT_TCF_TAIL + '"}}'),
    )
    deal = F.struct(
        (seq * 10).alias("id"),
        F.concat(F.lit("private_auction_"), s(4)).alias("kind"),
        F.round(seq % 89 * 0.25 + 0.5, 2).alias("bidfloor"),
        F.concat(F.lit("seat-"), s(250)).alias("seat"),
    )
    deals = F.when(
        seq % 8 == 0, F.array().cast(WIDE_SPEC.spark_schema()["deals"].dataType)
    ).otherwise(F.array(deal))
    return F.struct(
        _uuidish(seq, 1).alias("event_id"),
        (F.lit(1740430000000000) + seq * 1000).alias("ts"),
        F.element_at(
            F.array(F.lit("impression"), F.lit("click"), F.lit("bid_request")),
            (seq % 3 + 1).cast("int"),
        ).alias("event_type"),
        F.struct(
            (seq % 5000).alias("id"),
            F.concat(F.lit("site_"), s(5000)).alias("name"),
            F.concat(F.lit("publisher-"), s(5000), F.lit(".example.com")).alias("domain"),
            page.alias("page"),
            referrer.alias("referrer"),
            F.transform(
                F.sequence(F.lit(0), F.lit(2)),
                lambda i: F.concat(F.lit("IAB"), ((seq + i * 5) % 26 + 1).cast("string")),
            ).alias("categories"),
        ).alias("site"),
        F.struct(
            ua.alias("ua"),
            F.concat(F.lit("203.0.113."), s(254)).alias("ip"),
            F.element_at(
                F.array(F.lit("android"), F.lit("ios"), F.lit("windows")),
                (seq % 3 + 1).cast("int"),
            ).alias("os"),
            F.concat(F.lit("model-"), s(60)).alias("model"),
            _uuidish(seq, 2).alias("ifa"),
            F.lit("en-US").alias("lang"),
        ).alias("device"),
        F.struct(
            _uuidish(seq, 3).alias("id"),
            F.concat(F.lit("buyer-"), _hex16(seq, 4)).alias("buyeruid"),
            segments.alias("segments"),
        ).alias("user"),
        F.round(seq % 997 * 1.5, 2).alias("amount"),
        F.lit("USD").alias("currency"),
        ext.alias("ext"),
        deals.alias("deals"),
    )


# TCF-consent-style opaque token tail inside ext — brings the average
# encoded message to the reference run's ~1.27 KB (README.md:163-165);
# real OpenRTB events carry consent strings of exactly this size class.
_EXT_TCF_TAIL = (
    "CPz3dI8Pz3dI8AGABCENDECsAP_AAH_AAAqIJNNd_H__bW9r-f5_aft0eY1P9_r37uQz"
    "jhfNs-8F3L_W_LwX52E7NF36tq4KmR4ku1LBIUNtHMnUDUmxaokVrzHsak2cpyNKJ7BE"
)


@dataclass(frozen=True)
class PayloadShape:
    """One benchmark payload shape: protobuf spec + generator + the
    D10 normalizer field list (paths relative to the decoded struct)."""

    name: str
    spec: MessageSpec
    payload: Callable[[F.Column], F.Column]
    norm_fields: tuple[str, ...]
    norm_aliases: tuple[str, ...]


SHAPES: dict[str, PayloadShape] = {
    # ~38 B/record: the small-row shape used since round 1 (rows/s
    # continuity across BENCH_r* history; stresses per-row overheads)
    "small": PayloadShape(
        "small",
        BENCH_SPEC,
        nested_payload,
        ("site.id", "user_id", "amount", "deals.id", "deals.kind"),
        ("site", "user_id", "amount", "deal_id", "deal_kind"),
    ),
    # ~1.27 KB/record, 10 normalizer fields: byte parity with the
    # reference's published 501 MB/s run (README.md:154-167)
    "wide": PayloadShape(
        "wide",
        WIDE_SPEC,
        wide_payload,
        (
            "site.id", "site.domain", "device.os", "device.ip",
            "user.id", "ts", "amount", "currency",
            "deals.id", "deals.kind",
        ),
        (
            "site_id", "domain", "os", "ip",
            "user_id", "ts", "amount", "currency",
            "deal_id", "deal_kind",
        ),
    ),
}


def _codec(spark: SparkSession, shape: PayloadShape = SHAPES["small"]):
    """(fmt, encode_column_fn, decode_df_fn): the JVM protobuf wire
    codec when its jar loads, else the JSON twin. Both decode to the
    same ``r`` struct shape, so every downstream stage is identical."""
    from quacfka_spark.sources.kafka import decode_json
    from quacfka_spark.sources.proto_jvm import (
        decode_protobuf_jvm,
        encode_protobuf_jvm,
        jvm_codec_available,
    )

    if jvm_codec_available(spark):
        return (
            "protobuf-jvm",
            lambda m: encode_protobuf_jvm(spark, m, shape.spec),
            lambda df: decode_protobuf_jvm(df, shape.spec),
        )
    return (
        "json",
        lambda m: F.encode(F.to_json(m), "utf-8"),
        lambda df: decode_json(df, shape.spec.spark_schema()),
    )

# Wall-clock budget for the whole CLI run (bench.py gives the subprocess
# 420 s). The host VM's effective CPU speed varies by several x between
# runs (measured 3x swings in a loop microbenchmark), so fixed row
# counts sometimes blow the budget; instead the bench CALIBRATES — time
# a small pass, then size the measured run to fit the remaining budget.
# Throughput (rows/s) stays comparable across sizes because every stage
# is a narrow map with per-row cost.
BUDGET_S = float(os.environ.get("SPARK_GRAFT_INGEST_BUDGET_S", "300"))
_CALIB_ROWS = 500_000


# ---------------------------------------------------------------------------
# Stall evidence + rerun policy (r10 verdict #1).
#
# BENCH_r10 published two host-stall casualties as official numbers: the
# narrow batch block at 309k total rows/s (r9: 6.46M — while the STREAMING
# block in the same window did 2.56M on the same decode+write path) and
# wide streaming at 35.0 MB/s (same-day driver-style rerun: 330.3). The
# query side already had spread + targeted-rerun + stall markers
# (bench.py); the ingest blocks had best-of-N but published whatever the
# window gave with no way to tell a stalled artifact from a regression.
# Three mechanisms close that, all decidable FROM THE ARTIFACT:
#   1. per-pass evidence: every pass records wall seconds plus the host's
#      /proc/stat busy fraction and hypervisor steal fraction over the
#      pass — a stalled pass shows long wall with low busy or high steal,
#      a regression shows long wall at full busy.
#   2. rate-derived expectation: calibration (batch) or the sibling batch
#      block's measured rate (streaming) predicts the pass wall; a block
#      whose BEST pass exceeds 2x its expectation keeps sampling (up to a
#      cap, inside the deadline) instead of publishing the stall —
#      the exact policy bench.py's query rerun loop applies.
#   3. calibration guards (batch): calibration is best-of-2 with a third
#      sample on >2x scatter, and if the measured passes then run >2x
#      FASTER than the calibrated rate (a stalled calibration undersized
#      the run — the r10 narrow-batch failure mode: 500k-row floor,
#      fixed costs dominate), the run is re-sized and re-generated once.
# ---------------------------------------------------------------------------


def _cpu_jiffies() -> tuple[int, int, int] | None:
    """(busy, steal, total) jiffies from /proc/stat's aggregate cpu line.
    busy = user+nice+system+irq+softirq; steal is the hypervisor-runnable-
    but-not-scheduled time — direct evidence of a noisy-neighbor stall.
    None where /proc/stat is unavailable (non-Linux)."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        if parts[0] != "cpu":
            return None
        vals = [int(x) for x in parts[1:9]]  # user..steal
        busy = vals[0] + vals[1] + vals[2] + vals[5] + vals[6]
        steal = vals[7] if len(vals) > 7 else 0
        return busy, steal, sum(vals)
    except Exception:  # pragma: no cover — non-Linux fallback
        return None


def _tree_jiffies() -> int | None:
    """CPU jiffies consumed by THIS process tree (the bench driver plus
    its live JVM / daemon children) — one /proc walk. Paired with
    _cpu_jiffies it ATTRIBUTES host busy time: busy the tree did not
    consume is co-tenant load, the r11 failure mode the stall
    detector's rate expectation cannot see (a co-tenant slows the
    calibration and the measured passes equally, so the block reads
    `stalled:false, busy 0.99` while publishing a fraction of the
    engine's healthy-window rate — BENCH_r11's wide batch 173.6 vs the
    same workload's 427.7 in a busy-0.65 window,
    INGEST_WIDE_PASSCURVE.json). None where /proc is unavailable.

    Each process contributes utime+stime (its own burn) PLUS
    cutime+cstime (burn of its already-REAPED children, which have no
    /proc entry of their own) — so a subprocess that exits between the
    two samples is not mis-billed to the co-tenants (r12 advisor): at
    the first sample its time sits in its own utime/stime, at the
    second in the reaping parent's cutime/cstime, and the DELTA the
    caller computes counts it exactly once. No double-count while a
    child is live either: cutime accumulates only on wait(), never
    concurrently with the child's own /proc entry. Remaining blind
    spot, inherent to sampling: a mid-interval exit of a process whose
    own parent is OUTSIDE the tree (orphan re-parented to init) — none
    of the bench's processes are spawned that way."""
    try:
        stats: dict[int, tuple[int, int]] = {}
        for d in os.listdir("/proc"):
            if not d.isdigit():
                continue
            try:
                with open(f"/proc/{d}/stat") as fh:
                    raw = fh.read()
            except OSError:  # raced a process exit
                continue
            # comm may contain spaces/parens: fields resume after the
            # LAST ')'; rest[1]=ppid, rest[11]=utime, rest[12]=stime,
            # rest[13]=cutime, rest[14]=cstime (reaped-child time)
            rest = raw[raw.rfind(")") + 2 :].split()
            stats[int(d)] = (
                int(rest[1]),
                int(rest[11]) + int(rest[12])
                + int(rest[13]) + int(rest[14]),
            )
        kids: dict[int, list[int]] = {}
        for pid, (ppid, _) in stats.items():
            kids.setdefault(ppid, []).append(pid)
        total, stack, seen = 0, [os.getpid()], set()
        while stack:
            p = stack.pop()
            if p in seen or p not in stats:
                continue
            seen.add(p)
            total += stats[p][1]
            stack.extend(kids.get(p, []))
        return total
    except Exception:  # pragma: no cover — non-Linux fallback
        return None


def _timed(fn):
    """Run fn() recording wall seconds and the host CPU picture over the
    interval. Returns (wall, busy_frac, steal_frac, own_frac,
    fn_result); fractions are None when /proc is unavailable. own_frac
    is the share of total host CPU capacity consumed by THIS process
    tree — busy minus own is co-tenant load (see _tree_jiffies)."""
    c0 = _cpu_jiffies()
    o0 = _tree_jiffies()
    t0 = time.perf_counter()
    ret = fn()
    wall = time.perf_counter() - t0
    c1 = _cpu_jiffies()
    o1 = _tree_jiffies()
    busy = steal = own = None
    if c0 is not None and c1 is not None and c1[2] > c0[2]:
        dt = c1[2] - c0[2]
        busy = (c1[0] - c0[0]) / dt
        steal = (c1[1] - c0[1]) / dt
        if o0 is not None and o1 is not None:
            own = (o1 - o0) / dt
    return wall, busy, steal, own, ret


def window_class(
    busys: list[float | None],
    steals: list[float | None],
    owns: list[float | None] | None,
) -> str | None:
    """One-word host-window marker for a measured block (r12 verdict
    #3): ``contended`` when any pass shows material co-tenant load
    (pass_other = busy - own >= 0.15) or hypervisor steal (>= 0.05),
    ``clean`` otherwise. None when the attribution evidence is absent
    (no /proc, or own-tree jiffies unavailable) — an UNCLASSIFIED
    window must not read as clean. Makes cross-round comparisons
    legible at a glance (BENCH_r11 wide batch 173.6 vs BENCH_r12 825.9
    was window class, not code — provable only by reading the per-pass
    arrays before this field existed). Thresholds sit above the
    attribution's own noise floor (pass_other emission gates at 0.10;
    the r11 co-tenant signature measured 0.3-0.6) and below any level
    that materially moves a rate. Pure function (unit-tested without
    Spark)."""
    others = [
        b - o
        for b, o in zip(busys, owns or [])
        if b is not None and o is not None
    ]
    if not others:
        return None
    steals_known = [s for s in steals if s is not None]
    contended = max(others) >= 0.15 or (
        bool(steals_known) and max(steals_known) >= 0.05
    )
    return "contended" if contended else "clean"


def stall_evidence(
    walls: list[float],
    expected_s: float | None,
    busys: list[float | None],
    steals: list[float | None],
    owns: list[float | None] | None = None,
) -> dict:
    """The per-pass evidence block every ingest report carries (r10
    verdict #1): all pass walls (not just the best), the rate-derived
    expectation, host busy/steal fractions per pass, and a ``stalled``
    verdict — true when even the best pass exceeded 2x expectation, i.e.
    the published number is a floor the window never let the engine
    reach. ``owns`` (r11 #5) is the bench tree's own share of host CPU
    per pass; when host busy materially exceeds it, a ``pass_other``
    co-tenant attribution rides along. Pure function (unit-tested
    without Spark)."""
    ev: dict = {
        "pass_seconds": [round(w, 2) for w in walls],
    }
    if expected_s is not None:
        ev["expected_pass_s"] = round(expected_s, 2)
        ev["stalled"] = min(walls) > 2.0 * expected_s
    if any(b is not None for b in busys):
        ev["pass_busy"] = [
            round(b, 2) if b is not None else None for b in busys
        ]
    if any(s is not None and s >= 0.005 for s in steals):
        # steal is zero on a healthy window — only worth bytes when seen
        ev["pass_steal"] = [
            round(s, 2) if s is not None else None for s in steals
        ]
    if owns is not None and any(
        b is not None and o is not None and (b - o) >= 0.10
        for b, o in zip(busys, owns)
    ):
        # co-tenant attribution (r11's wide decline): host busy the
        # bench tree did NOT consume. Emitted only when material —
        # a pass_other of e.g. 0.4 says the published rate was
        # measured against a host nearly half-consumed by someone
        # else, which no rate expectation can flag (calibration slows
        # equally) and busy alone cannot distinguish from healthy
        # saturation.
        ev["pass_other"] = [
            round(max(b - o, 0.0), 2)
            if b is not None and o is not None
            else None
            for b, o in zip(busys, owns)
        ]
    # the one-field cross-round marker (r12 verdict #3) — emitted
    # whenever the attribution evidence exists, NOT just when
    # pass_other crossed its 0.10 materiality gate: a clean window
    # should say "clean", not stay silent
    wc = window_class(busys, steals, owns)
    if wc is not None:
        ev["window"] = wc
    return ev


def should_rerun_stalled(
    walls: list[float],
    expected_s: float | None,
    cap: int,
    deadline: float | None,
) -> bool:
    """Rerun gate: best pass > 2x the rate-derived expectation, room
    under the pass cap, and the next pass (estimated at the CURRENT best
    wall, capped) still fits the deadline. Mirrors bench.py's query
    rerun loop; the estimate uses the best pass so a stalled sample
    can't lock itself in by inflating the estimate (the r6 lesson)."""
    if expected_s is None or len(walls) >= cap or deadline is None:
        return False
    if min(walls) <= 2.0 * expected_s:
        return False
    return time.monotonic() + min(min(walls), 60.0) < deadline


def _gen_bytes(
    spark: SparkSession,
    rows: int,
    path: str,
    partitions: int,
    encode=None,
    payload: Callable[[F.Column], F.Column] = nested_payload,
) -> float:
    """Materialize `rows` encoded nested messages as a binary-column
    parquet (the 'Kafka topic at rest'). ``encode`` maps the nested
    struct column to payload bytes (defaults to the JSON twin);
    ``payload`` builds the nested struct from the sequence id.
    Returns payload MB."""
    if encode is None:
        encode = lambda m: F.encode(F.to_json(m), "utf-8")  # noqa: E731
    df = (
        spark.range(0, rows, 1, partitions)
        .select(encode(payload(F.col("id"))).alias("value"))
    )
    df.write.mode("overwrite").parquet(path)
    mb = (
        spark.read.parquet(path)
        .select((F.sum(F.octet_length("value")) / (1024 * 1024)).alias("mb"))
        .collect()[0]["mb"]
    )
    return float(mb)


def run_ingest_bench(
    spark: SparkSession,
    rows: int | None = None,
    work_dir: str = "/tmp/quacfka_spark_ingest",
    deadline: float | None = None,
    shape: str = "small",
) -> dict:
    """Run the timed ingest: read bytes -> decode -> raw + norm writes.

    ``rows=None`` auto-sizes: after warmup, a calibration pass over the
    warm slice estimates this run's rows/s on THIS machine right now,
    and the measured run is sized to ~45 s (capped at DEFAULT_ROWS).
    ``deadline`` (time.monotonic()) bounds optional repeat passes.
    ``shape`` picks the payload (SHAPES): "small" = the historical
    ~38 B row, "wide" = the reference-parity ~1.27 KB message whose
    mb_per_second compares apples-to-apples with the published
    501 MB/s (README.md:154-167).

    Returns a report shaped like the reference's metrics JSON
    (/root/reference/metrics.go:259-282).
    """
    from quacfka_spark.plans.normalizer import NormalizerSpec

    sh = SHAPES[shape]
    norm_spec = NormalizerSpec(
        fields=list(sh.norm_fields), aliases=list(sh.norm_aliases)
    )
    cores = spark.sparkContext.defaultParallelism
    src = os.path.join(work_dir, "src")
    out_raw = os.path.join(work_dir, "raw")
    out_norm = os.path.join(work_dir, "norm")
    shutil.rmtree(work_dir, ignore_errors=True)
    fmt, encode, decode = _codec(spark, sh)

    # Warm the decode to JIT steady state before timing — the reference
    # reports steady-state 30s samples out of a 5-minute run
    # (metrics.go:101-166), so timing Spark's cold JIT would compare a
    # cold start to their steady state. The hot path (wire/Jackson parse
    # + codegen scaffolding) is shared across plans, so a few passes over
    # a small separate slice warm the fresh full-size plan too
    # (measured: 5x500k warm passes take the 4M decode 40s -> 7s).
    # wide rows are ~33x the bytes of small rows: scale the calibration
    # slice so its wall cost stays comparable
    calib_rows = _CALIB_ROWS if shape == "small" else _CALIB_ROWS // 8
    warm_rows = min(rows // 8, calib_rows) if rows else calib_rows
    warm_src = os.path.join(work_dir, "warm")
    _gen_bytes(spark, warm_rows, warm_src, cores, encode, sh.payload)
    warm = decode(spark.read.parquet(warm_src)).select("r.*")
    for _ in range(5):
        warm.write.format("noop").mode("overwrite").save()

    calib_list: list[float] = []
    rate: float | None = None
    target_pass_s: float | None = None
    grain = 100_000 if shape == "small" else 10_000
    if rows is None:
        # calibration: full raw+norm passes over the warm slice, best of
        # 2 — the host VM shows intermittent multi-10s stalls (measured:
        # an identical 0.6s job taking 77s), and a stalled single
        # calibration would undersize the whole run
        def calib_pass() -> float:
            t0 = time.perf_counter()
            warm.write.mode("overwrite").parquet(out_raw)
            norm_spec.apply(
                spark.read.parquet(out_raw)
            ).write.mode("overwrite").parquet(out_norm)
            return time.perf_counter() - t0

        # a third sample when the two scatter >2x: a stalled calibration
        # both undersizes the run (fixed costs then dominate the rate —
        # BENCH_r10's 309k rows/s narrow-batch casualty) and inflates
        # the expectation the stall detector compares passes against
        calib_list = [calib_pass(), calib_pass()]
        if max(calib_list) > 2.0 * min(calib_list):
            calib_list.append(calib_pass())
        rate = warm_rows / max(min(calib_list), 0.1)
        # size so gen + pass1 + optional pass2 (~3 pass-equivalents) fit
        # what's left of the budget
        if shape == "wide":
            # SHORT passes, many samples: the host shows multi-10s
            # stalls at random (measured r8: the same 614 MB raw write
            # taking 2.1 s and 38 s in one session), and any stall
            # inside a pass corrupts that sample. The reference's
            # 501 MB/s is likewise its best steady-state 30 s sample
            # out of a 5-minute run — best-of-many short passes is the
            # apples-to-apples estimator, and it is what makes the
            # wide number reproducible in an arbitrary driver window
            # (r7's single long pass caught 85 MB/s in a window where
            # best-of-6 measured 246 MB/s).
            if deadline is not None:
                target_pass_s = min(
                    12.0, max(5.0, (deadline - time.monotonic()) / 8)
                )
            else:
                target_pass_s = 12.0
        elif deadline is not None:
            target_pass_s = min(45.0, max(15.0, (deadline - time.monotonic()) / 3))
        else:
            target_pass_s = 45.0
        row_cap = WIDE_MAX_ROWS if shape == "wide" else DEFAULT_ROWS
        rows = max(
            calib_rows,
            min(row_cap, int(rate * target_pass_s) // grain * grain),
        )

    mb = _gen_bytes(spark, rows, src, cores, encode, sh.payload)

    def one_pass() -> None:
        bytes_df = spark.read.parquet(src)
        decoded = decode(bytes_df).select("r.*")
        decoded.write.mode("overwrite").parquet(out_raw)
        # Decode ONCE: the norm table derives from the just-written raw
        # parquet, not from a second decode. Re-deriving norm from the
        # decode expression re-runs it per consumer (for JSON,
        # OptimizeJsonExprs prunes the schema per extracted field — each
        # flat column becomes its own from_json and the payload parses
        # ~5x per row, measured 28.6s vs 2.7s for the read-back at 2M
        # rows). The read-back is also the 100 TB pattern: columnar,
        # pruned, shuffle-free.
        raw_back = spark.read.parquet(out_raw)
        # D10 normalizer semantics via the engine's own NormalizerSpec:
        # flat columns, one row per repeated element, scalars
        # duplicated, null columns when the list is empty.
        norm_spec.apply(raw_back).write.mode("overwrite").parquet(out_norm)

    # Best-of-N with a deadline: this VM shows large run-to-run variance
    # (noisy neighbors / JIT); the reference's number is likewise its
    # best steady-state 30s sample, so best-of-N is the apples-to-apples
    # capability measurement. Wide passes are short (see target_pass_s
    # above) so up to 6 samples fit a phase slice; the retry estimate
    # uses the BEST pass so far, capped — gating on a stalled pass's
    # time would lock the stall in (the r6 streaming lesson).
    # without a deadline (direct/test callers) cap at 2 — the 6-sample
    # wide budget exists for the driver's deadline-bounded window only
    max_passes = (6 if shape == "wide" else 2) if deadline is not None else 2
    walls: list[float] = []
    busys: list[float | None] = []
    steals: list[float | None] = []
    owns: list[float | None] = []

    def add_pass() -> None:
        w, b, s, o, _ = _timed(one_pass)
        walls.append(w)
        busys.append(b)
        steals.append(s)
        owns.append(o)

    add_pass()
    while len(walls) < max_passes and (
        deadline is None
        or time.monotonic() + min(min(walls) * 1.2, 60.0) < deadline
    ):
        add_pass()

    resized = False
    expected_pass_s: float | None = None
    if rate is not None:
        # Stalled-calibration guard (the r10 narrow-batch failure mode):
        # when the measured passes run >2x FASTER than the calibrated
        # rate, calibration caught a host stall and undersized the run —
        # the published rate then measures parquet-commit fixed costs,
        # not the pipeline (309k rows/s on a 500k-row floor vs the same
        # window's 2.56M through the streaming block). Re-size to the
        # measured rate and re-generate once, budget permitting.
        measured_rate = rows / min(walls)
        resize_cap = WIDE_MAX_ROWS if shape == "wide" else DEFAULT_ROWS
        if (
            deadline is not None
            and measured_rate > 2.0 * rate
            and rows < resize_cap
        ):
            new_rows = max(
                rows,
                min(
                    resize_cap,
                    int(measured_rate * target_pass_s) // grain * grain,
                ),
            )
            est = new_rows / measured_rate
            # gen ~ 1 pass-equivalent + 2 passes + slack
            if new_rows > rows and time.monotonic() + est * 4 < deadline:
                rate, rows = measured_rate, new_rows
                mb = _gen_bytes(spark, rows, src, cores, encode, sh.payload)
                walls, busys, steals, owns = [], [], [], []
                resized = True
                add_pass()
                while len(walls) < 2 and (
                    time.monotonic() + min(min(walls) * 1.2, 60.0) < deadline
                ):
                    add_pass()
        expected_pass_s = rows / rate
    # rerun-on-stall (r10 verdict #1): when even the best pass is >2x
    # the rate-derived expectation the window stalled every sample —
    # keep sampling up to a cap instead of publishing the stall
    while should_rerun_stalled(
        walls, expected_pass_s, max_passes + 4, deadline
    ):
        add_pass()
    elapsed = min(walls)
    passes = len(walls)

    raw_n = spark.read.parquet(out_raw).count()
    norm_n = spark.read.parquet(out_norm).count()
    shutil.rmtree(work_dir, ignore_errors=True)
    total = raw_n + norm_n
    return {
        "shape": shape,
        "records_consumed": rows,
        "records_inserted": raw_n,
        "norm_records_inserted": norm_n,
        "normalizer_fields": len(sh.norm_fields),
        "duration_seconds": round(elapsed, 3),
        "records_per_second": round(raw_n / elapsed, 2),
        "total_rows_per_second": round(total / elapsed, 2),
        "mb_per_second": round(mb / elapsed, 2),
        "payload_mb": round(mb, 2),
        "bytes_per_record": round(mb * 1024 * 1024 / rows, 1),
        "cores": cores,
        "passes": passes,
        **stall_evidence(walls, expected_pass_s, busys, steals, owns),
        **(
            {"calib_seconds": [round(c, 2) for c in calib_list]}
            if calib_list
            else {}
        ),
        **({"resized": True} if resized else {}),
        "decode": fmt,
    }


def run_streaming_ingest_bench(
    spark: SparkSession,
    rows: int = DEFAULT_ROWS,
    work_dir: str = "/tmp/quacfka_spark_ingest_stream",
    epochs: int = 2,
    deadline: float | None = None,
    shape: str = "small",
    file_grain: int = 1,
    expect_rate: float | None = None,
) -> dict:
    """Same measurement through the actual StreamingPipeline orchestrator
    (foreachBatch, rotation epochs, post-publish, metrics) — the full
    D13-D24 path, not just raw Spark jobs. ``epochs`` micro-batches
    exercise the rotation loop like the reference's multi-file run
    (9 files in the published benchmark, README.md:170).

    Epoch sizing matters: the reference's rotation unit is ~30 s of
    ingest (tens of millions of rows per closed .db file); an epoch of a
    few hundred thousand rows measures parquet-commit fixed costs, not
    pipeline throughput (measured: 500k-row epochs plateau at ~1.1M
    total rows/s while 2M-row epochs reach ~2M on the same box — and a
    PURE BATCH write of the same 500k-row chunk costs the same, so the
    overhead is chunk size, not the orchestrator). Rotation cadence
    (D15/D16) is the user's knob for this trade at deployment time.

    ``file_grain`` multiplies source-file count and the per-trigger
    file quota together (epoch/batch count unchanged): each micro-batch
    processes grain x cores tasks of payload/grain size instead of one
    task wave of full-size files. Measured on the wide shape at 2.2M
    rows (r10, same window): grain 4 = 259.8 MB/s vs ~198 at grain 1 —
    a micro-batch is a BARRIER, so one straggler in a 32-task wave
    idles 31 cores until the batch commits, and finer tasks shrink the
    straggler tail the way a 4x-cores shuffle-partition count does for
    joins. Grain 1 stays the default for the small-shape continuity
    series (its ~2 s passes are commit-bound, not straggler-bound).

    ``expect_rate`` (raw records/s) is the sibling BATCH block's
    measured best rate: the orchestrator passes it so this block has a
    rate-derived pass expectation for the stall detector (streaming has
    no calibration of its own). Expected pass wall = rows/expect_rate +
    2 s fixed setup; a best pass >2x that triggers extra samples, and
    the report carries per-pass wall/busy/steal evidence either way
    (r10 verdict #1 — the 35.0 MB/s wide-streaming casualty)."""
    from quacfka_spark.plans.normalizer import NormalizerSpec
    from quacfka_spark.streaming import PipelineConfig, StreamingPipeline

    sh = SHAPES[shape]
    cores = spark.sparkContext.defaultParallelism
    src = os.path.join(work_dir, "src")
    out = os.path.join(work_dir, "out")
    shutil.rmtree(work_dir, ignore_errors=True)
    fmt, encode, decode = _codec(spark, sh)
    grain = max(1, int(file_grain))
    mb = _gen_bytes(
        spark, rows, src, cores * epochs * grain, encode, sh.payload
    )

    def one_pass(i: int) -> dict:
        source = (
            spark.readStream.schema("value binary")
            .option("maxFilesPerTrigger", str(cores * grain))
            .parquet(src)
        )
        pipe = StreamingPipeline(
            spark,
            source,
            PipelineConfig(
                output_dir=f"{out}_{i}", dest_table="messages", available_now=True
            ),
            decode=decode,
            normalizer=NormalizerSpec(
                fields=[f"r.{f}" for f in sh.norm_fields],
                aliases=list(sh.norm_aliases),
            ),
        )
        q = pipe.start()
        q.awaitTermination()
        return pipe.metrics.report()

    # best-of-N when the deadline allows (see run_ingest_bench). The
    # retry estimate is CAPPED: when pass 1 hits a multi-10s host stall
    # (measured 6.8 s fresh vs 68 s in an aged window for the same
    # work), gating the retry on elapsed*1.2 would lock the stalled
    # number in — exactly the pass that most needs the retry. Both
    # shapes get up to 4 samples (passes are seconds-long; the byte-
    # parity wide claim and the small-row continuity series both
    # deserve one stall-free pass in an arbitrary driver window).
    # Without a deadline (direct/test callers) the while-gate would be
    # vacuously true and always run the maximum — cap those at 2 so a
    # plain call pays best-of-2, not 4x wall + 4 output dirs (advisor
    # r8); the bench driver always passes its phase deadline.
    max_passes = 4 if deadline is not None else 2
    walls: list[float] = []
    busys: list[float | None] = []
    steals: list[float | None] = []
    owns: list[float | None] = []
    best: tuple[float, dict] | None = None

    def add_pass() -> None:
        nonlocal best
        w, b, s, o, r = _timed(lambda: one_pass(len(walls)))
        walls.append(w)
        busys.append(b)
        steals.append(s)
        owns.append(o)
        if best is None or w < best[0]:
            best = (w, r)

    add_pass()
    while len(walls) < max_passes and (
        deadline is None
        or time.monotonic() + min(min(walls) * 1.2, 60.0) < deadline
    ):
        add_pass()
    # rate-derived expectation from the sibling batch block + a fixed
    # term that SCALES with micro-batch count (r11 advisor): ~2 s of
    # stream start/checkpoint init plus ~2 s commit barrier per epoch —
    # a flat 2 s marks a healthy many-epoch run "stalled" forever and
    # burns rerun passes that can never converge. Rerun-on-stall with
    # the same policy as run_ingest_bench.
    expected_pass_s = (
        rows / expect_rate + 2.0 + 2.0 * epochs
        if expect_rate and expect_rate > 0
        else None
    )
    while should_rerun_stalled(
        walls, expected_pass_s, max_passes + 4, deadline
    ):
        add_pass()
    elapsed, rep = best
    shutil.rmtree(work_dir, ignore_errors=True)
    total = rep["records_inserted"] + rep["norm_records_inserted"]
    return {
        "shape": shape,
        "records_consumed": rep["records_consumed"],
        "records_inserted": rep["records_inserted"],
        "norm_records_inserted": rep["norm_records_inserted"],
        "normalizer_fields": len(sh.norm_fields),
        "batches": rep["batches"],
        "duration_seconds": round(elapsed, 3),
        "records_per_second": round(rep["records_inserted"] / elapsed, 2),
        "total_rows_per_second": round(total / elapsed, 2),
        "mb_per_second": round(mb / elapsed, 2),
        "bytes_per_record": round(mb * 1024 * 1024 / max(rep["records_consumed"], 1), 1),
        "cores": cores,
        "passes": len(walls),
        **stall_evidence(walls, expected_pass_s, busys, steals, owns),
        "decode": fmt,
    }


def run_dedup_streaming_bench(
    spark: SparkSession,
    rows: int = DEFAULT_ROWS,
    work_dir: str = "/tmp/quacfka_spark_ingest_dedup",
) -> dict:
    """Opt-in: the measured cost of cross-epoch ingest dedup
    (PipelineConfig.dedup_keys). Same orchestrator shape as
    run_streaming_ingest_bench (so its report is the apples-to-apples
    no-dedup baseline) but every payload id appears TWICE across the
    two epochs — the worst-case 50% duplicate stream — with the digest
    ledger anti-join engaged. Report: consumed-rows/s (the ingest rate
    the pipeline sustains while deduping), the measured dedup ratio,
    and the ledger row count (one 16-byte digest per unique row — the
    ONLY cross-epoch state)."""
    from quacfka_spark.plans.normalizer import NormalizerSpec
    from quacfka_spark.streaming import PipelineConfig, StreamingPipeline

    cores = spark.sparkContext.defaultParallelism
    src = os.path.join(work_dir, "src")
    out = os.path.join(work_dir, "out")
    shutil.rmtree(work_dir, ignore_errors=True)
    fmt, encode, decode = _codec(spark)
    unique = rows // 2
    # id % unique: each payload id occurs exactly twice; with 2 epochs
    # the second sees ~all of its rows already in the ledger. NB the
    # dedup KEY tuple (site.id, user_id, amount) is itself periodic in
    # lcm(1000, 997) = 997,000 ids, so inserted lands at
    # min(unique, 997000) distinct keys — INGEST_DEDUP.json's 997,000
    # at rows=2M is the key-space bound, not over-dropping
    df = spark.range(0, rows, 1, cores * 2).select(
        encode(nested_payload(F.col("id") % unique)).alias("value")
    )
    df.write.mode("overwrite").parquet(src)
    mb = float(
        spark.read.parquet(src)
        .select((F.sum(F.octet_length("value")) / (1024 * 1024)).alias("mb"))
        .collect()[0]["mb"]
    )
    def one_pass(i: int) -> tuple[float, dict, int]:
        source = (
            spark.readStream.schema("value binary")
            .option("maxFilesPerTrigger", str(cores))
            .parquet(src)
        )
        pipe = StreamingPipeline(
            spark,
            source,
            PipelineConfig(
                output_dir=f"{out}_{i}",
                dest_table="messages",
                available_now=True,
                dedup_keys=["r.site.id", "r.user_id", "r.amount"],
            ),
            decode=decode,
            normalizer=NormalizerSpec(
                fields=["r.site.id", "r.user_id", "r.amount", "r.deals.id", "r.deals.kind"],
                aliases=["site", "user_id", "amount", "deal_id", "deal_kind"],
            ),
        )
        t0 = time.perf_counter()
        q = pipe.start()
        q.awaitTermination()
        elapsed = time.perf_counter() - t0
        ledger = spark.read.parquet(
            os.path.join(f"{out}_{i}", "_dedup_ledger")
        ).count()
        return elapsed, pipe.metrics.report(), ledger

    # best-of-2: pass 0 pays JVM/codegen warmup in this fresh subprocess
    elapsed, rep, ledger_rows = min(one_pass(0), one_pass(1), key=lambda t: t[0])
    shutil.rmtree(work_dir, ignore_errors=True)
    consumed = rep["records_consumed"]
    return {
        "records_consumed": consumed,
        "records_inserted": rep["records_inserted"],
        "dedup_dropped": consumed - rep["records_inserted"],
        "ledger_digests": ledger_rows,
        "batches": rep["batches"],
        "duration_seconds": round(elapsed, 3),
        "consumed_rows_per_second": round(consumed / elapsed, 2),
        "mb_per_second": round(mb / elapsed, 2),
        "cores": cores,
        "decode": fmt,
    }


def run_neardup_streaming_bench(
    spark: SparkSession,
    rows: int = 1_000_000,
    work_dir: str = "/tmp/quacfka_spark_ingest_neardup",
) -> dict:
    """Opt-in: the measured cost of the minhash band-ledger NEAR-dup
    gate (PipelineConfig.neardup_col). JSON text payloads: the second
    half of the stream carries one-token VARIANTS of the first half's
    texts (19 of ~21 shingles shared, J~0.86 — re-crawl-style edits an
    exact digest can never catch), so epoch 2 is gated against epoch
    1's band ledger. Reports consumed-rows/s with the gate engaged,
    the measured near-dup drop ratio (candidate-level: expected well
    below 100% at J~0.86 by LSH design — the band-probability knob,
    not a bug), and the ledger band-key count (12 bytes per key, the
    ONLY cross-epoch state)."""
    from quacfka_spark.sources.kafka import decode_json
    from quacfka_spark.streaming import PipelineConfig, StreamingPipeline

    cores = spark.sparkContext.defaultParallelism
    src = os.path.join(work_dir, "src")
    out = os.path.join(work_dir, "out")
    shutil.rmtree(work_dir, ignore_errors=True)
    unique = rows // 2
    # token values keyed modulo > `unique` so every base text is
    # DISTINCT (an early % 5000 vocab collapsed 500k docs onto 5000
    # texts, making the ledger unrealistically tiny and the drop ratio
    # inflated by intra-corpus repeats)
    base = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(19)),
            lambda i: F.concat(
                F.lit("w"), ((F.col("id") % unique) * 7919 + i * 13) % 1000003
            ),
        ),
    )
    text = F.concat(
        base,
        F.when(F.col("id") < unique, F.lit(" alpha")).otherwise(F.lit(" beta")),
    )
    df = spark.range(0, rows, 1, cores * 2).select(
        F.encode(
            F.to_json(F.struct(F.col("id").alias("doc_id"), text.alias("text"))),
            "utf-8",
        ).alias("value")
    )
    df.write.mode("overwrite").parquet(src)
    mb = float(
        spark.read.parquet(src)
        .select((F.sum(F.octet_length("value")) / (1024 * 1024)).alias("mb"))
        .collect()[0]["mb"]
    )

    def one_pass(i: int) -> tuple[float, dict, int]:
        source = (
            spark.readStream.schema("value binary")
            .option("maxFilesPerTrigger", str(cores))
            .parquet(src)
        )
        pipe = StreamingPipeline(
            spark,
            source,
            PipelineConfig(
                output_dir=f"{out}_{i}",
                dest_table="messages",
                available_now=True,
                neardup_col="r.text",
            ),
            decode=lambda d: decode_json(d, "doc_id bigint, text string"),
        )
        t0 = time.perf_counter()
        q = pipe.start()
        q.awaitTermination()
        elapsed = time.perf_counter() - t0
        ledger = spark.read.parquet(
            os.path.join(f"{out}_{i}", "_neardup_ledger")
        ).count()
        return elapsed, pipe.metrics.report(), ledger

    # best-of-2: pass 0 pays JVM/codegen warmup in this fresh subprocess
    elapsed, rep, ledger_keys = min(one_pass(0), one_pass(1), key=lambda t: t[0])
    shutil.rmtree(work_dir, ignore_errors=True)
    consumed = rep["records_consumed"]
    dropped = consumed - rep["records_inserted"]
    return {
        "records_consumed": consumed,
        "records_inserted": rep["records_inserted"],
        "neardup_dropped": dropped,
        "drop_ratio_of_variant_half": round(dropped / (rows / 2), 4),
        "ledger_band_keys": ledger_keys,
        "batches": rep["batches"],
        "duration_seconds": round(elapsed, 3),
        "consumed_rows_per_second": round(consumed / elapsed, 2),
        "mb_per_second": round(mb / elapsed, 2),
        "cores": cores,
        "decode": "json",
    }


def run_sustained_streaming_bench(
    spark: SparkSession,
    rows_per_epoch: int = 500_000,
    epochs: int = 8,
    work_dir: str = "/tmp/quacfka_spark_ingest_sustained",
    rotate_mb: float = 64.0,
) -> dict:
    """Opt-in SUSTAINED orchestrator run — the multi-epoch shape of the
    reference's published benchmark (9 rotated .db files over 5 minutes,
    /root/reference/README.md:170): ``epochs`` micro-batches through the
    full StreamingPipeline with size-based rotation (D15) engaged,
    reporting PER-EPOCH total-row rates, a flatness verdict (does
    steady-state throughput hold within 20% of the post-warmup median
    epoch-to-epoch?), and the completed-path feed shape (exactly one
    published path per table x epoch, D20).

    Epoch durations come from the engine's own StreamingQueryProgress
    (triggerExecution ms per batch); per-epoch row counts come from
    PipelineMetrics.epoch_rows(). Epoch 0 is excluded from the flatness
    check — it pays plan compilation + JIT and, with rotate_mb set,
    writes uncapped to learn bytes/record (documented D15 behavior).
    """
    import json as _json

    from quacfka_spark.plans.normalizer import NormalizerSpec
    from quacfka_spark.streaming import PipelineConfig, StreamingPipeline

    cores = spark.sparkContext.defaultParallelism
    src = os.path.join(work_dir, "src")
    out = os.path.join(work_dir, "out")
    shutil.rmtree(work_dir, ignore_errors=True)
    fmt, encode, decode = _codec(spark)
    mb = _gen_bytes(spark, rows_per_epoch * epochs, src, cores * epochs, encode)

    # warm the decode hot path (see run_ingest_bench) so epoch 0 doesn't
    # fold whole-pipeline JIT into the flatness baseline. The warm slice
    # scales with the epoch size: a 50k-row warmup left 2M-row-epoch
    # runs ramping through epoch 4 (C2-compilation of the decode loop
    # needs ~10^5-10^6 iterations per thread), which the flatness
    # verdict then misread as instability.
    warm_rows = max(200_000, rows_per_epoch // 4)
    warm = decode(spark.read.parquet(src).limit(warm_rows)).select("r.*")
    for _ in range(5):
        warm.write.format("noop").mode("overwrite").save()
    # ... and the parquet WRITE path (encoder + committer JIT), which
    # noop never touches — without this, epoch 1 still rides the tail
    # of the write-side ramp and trips the 20% band
    warm_dir = os.path.join(work_dir, "warm_write")
    for _ in range(2):
        warm.write.mode("overwrite").parquet(warm_dir)
    shutil.rmtree(warm_dir, ignore_errors=True)

    source = (
        spark.readStream.schema("value binary")
        .option("maxFilesPerTrigger", str(cores))
        .parquet(src)
    )
    pipe = StreamingPipeline(
        spark,
        source,
        PipelineConfig(
            output_dir=out,
            dest_table="messages",
            available_now=True,
            rotate_mb=rotate_mb,
        ),
        decode=decode,
        normalizer=NormalizerSpec(
            fields=["r.site.id", "r.user_id", "r.amount", "r.deals.id", "r.deals.kind"],
            aliases=["site", "user_id", "amount", "deal_id", "deal_kind"],
        ),
    )
    t0 = time.perf_counter()
    q = pipe.start()
    q.awaitTermination()
    elapsed = time.perf_counter() - t0

    # engine-reported per-batch durations (dicts in pyspark's API)
    durs: dict[int, float] = {}
    for p in q.recentProgress:
        prog = p if isinstance(p, dict) else _json.loads(p.json)
        durs[int(prog["batchId"])] = (
            float(prog["durationMs"]["triggerExecution"]) / 1000.0
        )
    rows = pipe.metrics.epoch_rows()
    per_epoch = []
    for e in sorted(rows):
        consumed, raw, norm, custom = rows[e]
        total = raw + norm + custom
        sec = durs.get(e)
        per_epoch.append(
            {
                "epoch": e,
                "rows_total": total,
                "seconds": round(sec, 3) if sec else None,
                "rows_per_second": round(total / sec, 2) if sec else None,
            }
        )
    steady = [p["rows_per_second"] for p in per_epoch[1:] if p["rows_per_second"]]
    med = sorted(steady)[len(steady) // 2] if steady else 0.0
    # strict verdict + outlier count: the host VM shows documented
    # multi-second stalls (see run_ingest_bench), so a single stalled
    # epoch is reported as an outlier rather than silently averaged away
    within = [abs(r - med) <= 0.20 * med for r in steady]
    flat = bool(steady) and all(within)
    n_outliers = len(within) - sum(within)

    # D20 feed shape: exactly one published path per table x epoch
    tables = {"messages", "messages_norm"}
    want_paths = len(tables) * len(rows)
    paths_ok = (
        len(pipe.completed_paths) == want_paths
        and len(set(pipe.completed_paths)) == want_paths
    )
    rep = pipe.metrics.report()
    total = rep["records_inserted"] + rep["norm_records_inserted"]
    shutil.rmtree(work_dir, ignore_errors=True)
    return {
        "epochs": len(rows),
        "rotate_mb": rotate_mb,
        "records_consumed": rep["records_consumed"],
        "records_inserted": rep["records_inserted"],
        "norm_records_inserted": rep["norm_records_inserted"],
        "duration_seconds": round(elapsed, 3),
        "total_rows_per_second": round(total / elapsed, 2),
        "mb_per_second": round(mb / elapsed, 2),
        "per_epoch": per_epoch,
        "steady_median_rows_per_second": med,
        "flat_within_20pct": flat,
        "steady_outlier_epochs": n_outliers,
        "completed_paths": len(pipe.completed_paths),
        "completed_paths_ok": paths_ok,
        "cores": cores,
        "decode": fmt,
    }


def main() -> None:
    """CLI: print one JSON line with both ingest reports. bench.py runs
    this in a SUBPROCESS so the ingest pipeline owns a fresh JVM — query
    jobs and ingest jobs measurably degrade each other's session (JIT/
    GC aging), and the reference's run likewise owned its process.
    ``--sustained`` instead runs ONLY the opt-in multi-epoch
    orchestrator benchmark (see run_sustained_streaming_bench)."""
    import json
    import sys

    from quacfka_spark.session import get_spark

    spark = get_spark("quacfka-spark-ingest-bench")
    if "--dedup" in sys.argv:
        rows = int(os.environ.get("SPARK_GRAFT_DEDUP_ROWS", "2000000"))
        out = {"ingest_dedup": run_dedup_streaming_bench(spark, rows=rows)}
        json.dump(out, sys.stdout)
        print()
        spark.stop()
        return
    if "--neardup" in sys.argv:
        rows = int(os.environ.get("SPARK_GRAFT_NEARDUP_ROWS", "1000000"))
        out = {"ingest_neardup": run_neardup_streaming_bench(spark, rows=rows)}
        json.dump(out, sys.stdout)
        print()
        spark.stop()
        return
    if "--sustained" in sys.argv:
        rows = int(os.environ.get("SPARK_GRAFT_SUSTAINED_ROWS", "500000"))
        epochs = int(os.environ.get("SPARK_GRAFT_SUSTAINED_EPOCHS", "8"))
        out = {"ingest_sustained": run_sustained_streaming_bench(
            spark, rows_per_epoch=rows, epochs=epochs
        )}
        json.dump(out, sys.stdout)
        print()
        spark.stop()
        return
    deadline = time.monotonic() + BUDGET_S
    out: dict = {}

    def emit() -> None:
        # progressive emit: if the host stalls during a later phase and
        # the parent kills this subprocess, the finished numbers still
        # reach bench.py (it reads the LAST complete stdout line)
        json.dump(out, sys.stdout)
        sys.stdout.write("\n")
        sys.stdout.flush()

    # Four phases inside one budget: WIDE batch + WIDE orchestrator
    # (byte parity with the reference's 501 MB/s run) first, then the
    # small shape twice (rows/s continuity with BENCH_r01..r07). Each
    # phase auto-sizes to its slice via calibration, and a phase is
    # skipped (recorded, not silent) when its slice has been eaten by
    # an earlier stall.
    def phase(key: str, frac_end: float, min_s: float, fn) -> None:
        phase_end = min(deadline, time.monotonic() + BUDGET_S * frac_end)
        if deadline - time.monotonic() < min_s:
            out[key] = {
                "skipped": f"budget exhausted ({deadline - time.monotonic():.0f}s left)"
            }
        else:
            try:
                out[key] = fn(phase_end)
            except Exception as e:  # pragma: no cover
                out[key] = {"error": str(e)[:200]}
        emit()

    # WIDE phases run FIRST (r7 verdict #1): they carry the byte-parity
    # headline claim (README 180-302 MB/s batch / 107-291 streaming),
    # and the late phases of a long subprocess are the ones most
    # exposed to JVM aging, budget erosion from earlier stalls, and
    # host stalls (measured 68 s for work a fresh session does in
    # 6.8 s). The small-shape phases keep the rows/s continuity series
    # with BENCH_r01..r07 and are robust (~2 s passes).
    phase(
        "ingest_wide", 0.28, 60,
        lambda end: run_ingest_bench(
            spark,
            deadline=end,
            shape="wide",
            work_dir="/tmp/quacfka_spark_ingest_wide",
        ),
    )
    wide_rows = out["ingest_wide"].get("records_consumed", _CALIB_ROWS // 2)
    # Pass-length fix (r9 verdict #3, INGEST_WIDE_STREAM_GRID.json):
    # each orchestrator pass pays ~1.5-2 s of fixed setup (streaming
    # query start, checkpoint init, micro-batch commits, stop) that the
    # old sizing — the batch phase's cold-calibrated row count, ~3.5 s
    # passes — never amortized: the streaming block read 190 MB/s in
    # windows where the same pipeline's asymptotic rate was 300+. Size
    # the streaming pass to ~8 s of payload at the batch phase's
    # MEASURED best rate instead (the best pass is the right estimator:
    # a stalled calibration must not lock in short passes), floored at
    # the old sizing and capped at DEFAULT_ROWS. Longer passes are also
    # the faithful shape — the reference's rotation unit is ~30 s of
    # ingest (README.md:170), not 3 s.
    wide_rate = out["ingest_wide"].get("records_per_second", 0)
    stream_wide_rows = max(
        _CALIB_ROWS // 8,
        wide_rows,
        min(WIDE_MAX_ROWS, int(wide_rate * 8) // 10_000 * 10_000),
    )
    phase(
        "ingest_streaming_wide", 0.24, 60,
        lambda end: run_streaming_ingest_bench(
            spark,
            rows=stream_wide_rows,
            deadline=end,
            shape="wide",
            file_grain=4,
            work_dir="/tmp/quacfka_spark_ingest_stream_wide",
            # the batch block's measured rate is this block's stall
            # expectation (streaming's micro-batch setup adds ~2 s,
            # folded into expected_pass_s inside)
            expect_rate=wide_rate or None,
        ),
    )
    phase(
        "ingest", 0.26, 45,
        lambda end: run_ingest_bench(spark, deadline=end),
    )
    batch_rows = out["ingest"].get("records_consumed", DEFAULT_ROWS)
    batch_rate = out["ingest"].get("records_per_second", 0)
    phase(
        "ingest_streaming", 0.22, 60,
        lambda end: run_streaming_ingest_bench(
            spark,
            rows=max(_CALIB_ROWS, batch_rows),
            deadline=end,
            expect_rate=batch_rate or None,
        ),
    )
    spark.stop()


if __name__ == "__main__":
    main()
