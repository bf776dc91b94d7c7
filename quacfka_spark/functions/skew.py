"""Skew mitigation: salted joins and two-phase aggregation.

First line of defense at scale is AQE's skew-join splitting (on by
default in session.py) — it rewrites oversized sort-merge partitions at
runtime with no code change. These helpers cover the cases AQE cannot:

- ``salted_join``: a broadcast-ineligible join where a handful of hot
  keys dominate (the classic null-key / power-law fact-to-dim join).
  The skewed side gets a deterministic salt in [0, S); the other side
  is replicated S times; the join key becomes (key, salt), spreading
  each hot key over S tasks. Deterministic salt (hash of the whole row,
  not rand()) keeps retries and resumed stages idempotent.
- ``two_phase_agg``: aggregation where one group swamps a task and the
  map-side partial combine is defeated (e.g. collect-style or distinct
  aggregates). Phase 1 aggregates on (key, salt); phase 2 merges the S
  partials per key. For plain algebraic aggs (sum/count/min/max) Spark's
  own partial aggregation already does this — use only when profiling
  shows a hot reduce task.

Reference mapping: the reference has no shuffle at all (single-process
channels), so skew never arises there; this module exists because our
engine actually distributes (SURVEY.md §4.3).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def _deterministic_salt(df: DataFrame, buckets: int) -> Column:
    """Salt in [0, buckets) from a hash of all columns — deterministic
    under task retries (rand() is not, and resumed stages would see
    different salts)."""
    return F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(buckets))


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    *,
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Equi-join where `skewed` has hot keys: salt the skewed side,
    replicate `other` across all salt values, join on keys + salt.

    Replication multiplies the other side's shuffle volume by
    ``salt_buckets`` — use when `other` is too big to broadcast but far
    smaller than the skewed side (else prefer AQE skew-join).
    """
    s = skewed.withColumn(_SALT, _deterministic_salt(skewed, salt_buckets))
    o = other.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return s.join(o, [*on, _SALT], how).drop(_SALT)


def two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    *,
    salt_buckets: int = 16,
) -> DataFrame:
    """Aggregate on (keys, salt) then merge per key.

    ``partial_aggs`` run per (key, salt); ``final_aggs`` merge the
    partials and must reference the partial aliases. Example (avg):

        two_phase_agg(df, ["k"],
            [F.sum("v").alias("s"), F.count("v").alias("n")],
            [(F.sum("s") / F.sum("n")).alias("avg_v")])
    """
    salted = df.withColumn(_SALT, _deterministic_salt(df, salt_buckets))
    partial = salted.groupBy(*keys, _SALT).agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)
