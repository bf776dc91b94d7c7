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
cosine terms. The per-operator defaults reproduce the round-6 manual
probe choices on the scale-probe generator (tools/scale_probe.py):

- d07 (all verified pairs emitted, task output is O(side^2) in the
  worst case, so sides must stay small): target 5,000 -> S=4 at the
  250k-vector probe (occ 17,376; the manual probe's salt_buckets=4,
  measured 78.4 s -> 31.1 s) and S=14 at 1M (occ 68,086).
- sim10 (top-k kernel: emission capped at k per member per band, the
  task is matmul-bound only, so larger sides are fine): target
  12,000 -> S=6 at the 1M-vector probe (the manual sim10_salted6 row,
  1414 s) and S=2 at 250k.

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
D07_TARGET_ROWS = 5_000
SIM10_TARGET_ROWS = 12_000
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
