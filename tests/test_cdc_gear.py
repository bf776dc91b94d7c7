"""Gearhash CDC production twin (operators/dedup.cdc_dedup_gear): the
O(1)-per-char rolling chunker a 100 TB deployment swaps in for d11's
portable md5-rule boundaries. Asserts the two properties that make it a
valid swap: content-defined boundaries are offset-robust, and on the
real fixture it flags the same planted duplicate documents as the
registered (oracle-checked) d11."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _bounds_py(s: str) -> list[int]:
    """Reference reimplementation of the UDF's loop for direct cases."""
    from quacfka_spark.operators.dedup import (
        _GEAR_MASK,
        _GEAR_MIN,
        _gear_table,
    )

    gear = _gear_table()
    cuts, h, last = [0], 0, 0
    for i, c in enumerate(s, start=1):
        h = ((h << 1) + int(gear[ord(c) & 0xFF])) & ((1 << 63) - 1)
        if i - last >= _GEAR_MIN and (h & _GEAR_MASK) == 0:
            cuts.append(i)
            last = i
    if cuts[-1] != len(s):
        cuts.append(len(s))
    return cuts


def test_gear_bounds_offset_robust(spark):
    """A passage duplicated at a DIFFERENT offset must produce the same
    interior chunks — the property fixed-grid chunking lacks and the
    whole reason CDC exists. (The first chunk after the splice point
    differs because the rolling window spans the junction; everything
    once the 64-char window refills must align.)"""
    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "green turtles slowly cross the ancient stone bridge under a "
        "harvest moon and the river keeps moving east toward the sea"
    )
    shifted = "UNALIGNED-PREFIX-12345>> " + base
    df = spark.createDataFrame([(1, base), (2, shifted)], ["doc_id", "text"])
    from quacfka_spark.operators.dedup import gear_bounds_udf

    rows = {
        r["doc_id"]: r["bounds"]
        for r in df.select(
            "doc_id", gear_bounds_udf()(F.col("text")).alias("bounds")
        ).collect()
    }

    def chunks(s, bounds):
        return [s[a:b] for a, b in zip(bounds, bounds[1:])]

    c1, c2 = chunks(base, rows[1]), chunks(shifted, rows[2])
    assert rows[1] == _bounds_py(base)  # UDF matches the reference loop
    # every chunk of the original except (at most) the first must
    # reappear verbatim in the shifted copy
    tail1 = c1[1:]
    assert len(tail1) >= 2, (c1, "corpus too short for the property test")
    assert all(c in c2 for c in tail1), (c1, c2)


def test_gear_dedup_flags_same_planted_dups_as_d11(spark):
    """On the fixture corpus the gear twin and the registered md5-rule
    d11 must agree on WHICH documents contain duplicated content (the
    boundaries differ, the verdicts must not): same flagged-doc set up
    to docs whose only dup chunks are near the length gate."""
    from quacfka_spark.operators.dedup import cdc_dedup_gear
    from quacfka_spark.registry import get_queries

    sf = "/root/testdata/sf0.001"
    gear = {
        r["doc_id"]: r["n_dropped"]
        for r in cdc_dedup_gear(spark, sf).collect()
    }
    md5r = {
        r["doc_id"]: r["n_dropped"]
        for r in get_queries()["d11_cdc_dedup"](spark, sf).collect()
    }
    assert set(gear) == set(md5r)
    g_flag = {d for d, n in gear.items() if n > 0}
    m_flag = {d for d, n in md5r.items() if n > 0}
    assert m_flag, "fixture has planted dups; d11 must flag some"
    # Jaccard agreement of the flagged sets: different chunkers, same
    # duplication signal
    inter = len(g_flag & m_flag)
    union = len(g_flag | m_flag)
    assert inter / union >= 0.8, (sorted(g_flag ^ m_flag), inter, union)
