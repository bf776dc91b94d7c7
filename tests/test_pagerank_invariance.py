"""sim11's central claim — integer fixed-point makes the iteration
independent of summation order — made falsifiable: the same corpus
computed under different shuffle-partition counts (different partial-agg
grouping, different add order) must produce IDENTICAL pr_fixed integers,
and the total rank mass must obey the exact fixed-point bounds.
"""

from __future__ import annotations

from quacfka_spark.operators.similarity import (
    _SIM11_ITERS,
    _SIM11_SCALE,
    sim11_knn_pagerank,
)

SF = "/root/testdata/sf0.001"


def _run(spark, partitions: int) -> dict[int, int]:
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    try:
        rows = sim11_knn_pagerank(spark, SF).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    return {r.vec_id: r.pr_fixed for r in rows}


def test_pr_fixed_invariant_under_partitioning(spark):
    a = _run(spark, 2)
    b = _run(spark, 32)
    assert a == b  # bit-for-bit, not approximately


def test_fixed_point_mass_bounds(spark):
    """Every rank holds the closed-form bounds: at least the teleport
    floor (15% of uniform, floor-divided), and total mass never exceeds
    the initial SCALE (floor division only ever loses mass; damping
    redistributes at most what arrived)."""
    prs = _run(spark, 8)
    n = len(prs)
    floor_rank = (15 * _SIM11_SCALE) // (100 * n)
    assert all(v >= floor_rank for v in prs.values())
    assert sum(prs.values()) <= _SIM11_SCALE
    # and damping keeps real mass in flight: total stays above the
    # teleport-only floor (every node holds at least floor_rank, and
    # nodes with in-edges hold strictly more)
    assert sum(prs.values()) > n * floor_rank
    assert _SIM11_ITERS >= 2  # the invariance claim covers >1 round
