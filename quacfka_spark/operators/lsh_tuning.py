"""Occupancy-driven auto-tuning for the LSH skew knobs (d07
``salt_buckets``, sim10 ``salt_groups``).

The round-6 probes showed fixed band bits + a hand-picked salt is the
wrong production interface: the right salt depends on the corpus's
bucket occupancy (a clustered corpus concentrates mass in few
signatures; with B sign bits per band there are only 2^B buckets per
band, so max occupancy ~= N / 2^B even for benign corpora once N is
large). ``choose_salt`` replaces the manual pick with one cheap
aggregation over the banded frame:

    S = clamp(ceil(max_bucket_occupancy / target_rows), 1, max_salt)

``target_rows`` is the largest sub-bucket SIDE a single verify task
should face: per-task work after salting is ~(occ/S)^2 <= target^2
cosine terms. The defaults are MEASURED optima on the scale-probe
generator (tools/scale_probe.py), not the round-6 manual picks —
where they differ, the probes show the chooser's pick ties or beats
the manual one:

- d07 (all verified pairs emitted): total verify work is
  salt-INVARIANT (the triangle decomposition repartitions, never
  shrinks, the pair work), so the right S is the SMALLEST one giving
  adequate spread — extra salt only buys replication cost. Target
  17,100 -> S=2 at the 250k probe (occ 17,376: measured 23.4 s, a
  TIE with the manual salt-4's 23.5 s, vs 65.3 s unsalted) and S=4
  at 1M (occ 68,086: the measured-best 339.7 s, where the earlier
  5,000-row target's S=14 paid 410.7 s in 14x band replication —
  identical 563M-pair output, SCALE_PROBE_D07_AUTO_*.json).
- sim10 (top-k kernel: emission capped at k per member per band, a
  finer spread pays at every measured scale): the OCCUPANCY rule is
  the wrong model here — salt 6 wins at BOTH probe scales (250k: 45.7
  s vs 83 s for the occupancy rule's S=2; 1M: 1110 s) — so sim10 uses
  ``choose_salt_topk``: SIM10_TARGET_ROWS (12,000) is only the ENGAGE
  gate, and S is sized by the CLUSTER (smallest S with
  hot_buckets * S(S+1)/2 >= 40 * cores sub-bucket tasks), which
  reproduces the measured-best S=6 on the probe corpora at 32 cores
  and scales S with the hardware in production.

The d07 value is a two-point fit (S=2 at occ 17,376 AND S=4 at occ
68,086 pin the target to [17,022, 17,375]); treat it as "sub-bucket
sides up to ~17k are one task's worth of pairs work", not a magic
constant — the measured surface is flat around it (23.44 vs 23.47 s
for S=2 vs S=4 at 250k).

Cost of auto mode: ONE extra narrow aggregation over (band, sig) —
column pruning drops the vector payload from that scan, partial
aggregation reduces it map-side to <= 2^B rows per band per task, and
the result is a single scalar. The collect is a plan-control decision
made once before the expensive exchange (the same runtime-statistics
pattern AQE applies inside a stage); the chosen S is deterministic for
a given corpus, so reruns plan identically. Output equality with any
manual salt (including S=1) is the existing engine-tested invariant —
the chooser only picks WHICH identical-output plan runs.

Reference analog: none — the reference has no ANN/LSH surface; this
tunes the extension operators' scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# largest verify-task side per operator family (see module docstring)
D07_TARGET_ROWS = 17_100
SIM10_TARGET_ROWS = 12_000
# Salt ceiling — measured, not asserted (SCALE_PROBE_SIM10_SALTCURVE
# .json, r8): past the saturated optimum the top-k kernel's wall time
# is pure band-replication + sub-bucket scheduling cost, rising +12%
# at S=11 and +18% at S=16 over S=6, then a KNEE (~2.1x at S=24/32 —
# 133.0/128.2 s vs 63.3 s at 250k vectors, identical output). 16 sits
# just before the knee, and it never de-saturates a cluster: even the
# engage gate's minimum hot-bucket shape (64) yields 64*136 = 8,704
# sub-bucket tasks >= 4 per core at 2,048 cores — only the
# 40-tasks/core smoothing headroom is shaved, and real cluster-scale
# corpora carry far more hot buckets, which restores it (64x cores
# with 64x hot buckets re-picks the measured S=6). Callers with a
# measured flatter curve on their corpus can raise max_salt per-call.
MAX_SALT = 16


def max_bucket_occupancy(
    bands: DataFrame, keys: tuple[str, ...] = ("band", "sig")
) -> int:
    """Largest (band, sig) bucket in the banded frame — the quantity
    that decides the single-task ceiling. One narrow two-level agg;
    returns 0 for an empty frame."""
    row = (
        bands.groupBy(*[F.col(k) for k in keys])
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c").alias("mx"))
        .collect()[0]
    )
    return int(row["mx"] or 0)


def choose_salt(
    bands: DataFrame,
    target_rows: int,
    max_salt: int = MAX_SALT,
    keys: tuple[str, ...] = ("band", "sig"),
) -> int:
    """Pick the salt S for the banded frame (see module docstring).
    S=1 (no salting, no replication cost) whenever every bucket fits a
    single task's budget."""
    occ = max_bucket_occupancy(bands, keys)
    if occ <= target_rows:
        return 1
    return max(1, min(int(max_salt), -(-occ // int(target_rows))))


def choose_salt_topk(
    bands: DataFrame,
    gate_rows: int,
    cores: int,
    tasks_per_core: int = 40,
    max_salt: int = MAX_SALT,
    keys: tuple[str, ...] = ("band", "sig"),
) -> int:
    """Cores-aware chooser for the TOP-K kernel family (sim10).

    Measured (SCALE_PROBE_SIM10_*.json): the top-k kernel's optimal
    salt is ~invariant in bucket occupancy — salt 6 wins at BOTH 250k
    (occ 17,376: 45.7 s vs 83 s at the linear rule's S=2) and 1M (occ
    68,086: 1110 s) on 32 cores — because a sub-bucket's selection
    work shrinks with its side while the task count S(S+1)/2 grows,
    so the right question is "how many sub-bucket tasks do the hot
    buckets need to saturate the cluster", not "how big is a bucket".
    One agg pass returns max occupancy (the engage gate) and the hot
    bucket count; S is the smallest salt giving
    ``hot_buckets * S(S+1)/2 >= tasks_per_core * cores`` sub-bucket
    tasks (tasks_per_core=40 reproduces the measured-best S=6 on the
    probe corpora: 64 hot buckets, 32 cores -> need 20 pairs/bucket).
    On a 1000-executor cluster ``cores`` is the cluster parallelism,
    so S scales with the hardware — the correct production behavior
    for a kernel whose spread, not per-task volume, is the binding
    constraint. S=1 whenever no bucket exceeds ``gate_rows``."""
    row = (
        bands.groupBy(*[F.col(k) for k in keys])
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.max("c").alias("mx"),
            F.sum(
                F.when(F.col("c") > gate_rows, F.lit(1)).otherwise(F.lit(0))
            ).alias("hot"),
        )
        .collect()[0]
    )
    occ, hot = int(row["mx"] or 0), int(row["hot"] or 0)
    if occ <= gate_rows or hot == 0:
        return 1
    need = tasks_per_core * cores / hot
    s = 1
    while s < int(max_salt) and s * (s + 1) / 2 < need:
        s += 1
    return s
