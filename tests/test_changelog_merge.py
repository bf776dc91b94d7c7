"""changelog_reduce/merge/publish (the x11 core, also driven by the s08
streaming test) on adversarial batch placements the events fixture never
produces: the merge must be lossless for EVERY way of cutting a
changelog into epochs — associativity/commutativity of the re-agg —
and latest-wins ties must break deterministically on event_id.
Hypothesis searches the cut-placement and key-collision space."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from quacfka_spark.operators.extensions import (
    changelog_merge,
    changelog_publish,
    changelog_reduce,
)

SCHEMA = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
T0 = datetime(2024, 1, 1, 10, 0, 0)


def _rows(spec):
    """spec: list of (user_id, minute_offset, type_idx, value_int)."""
    types = ["click", "view", "error"]
    return [
        (i, T0 + timedelta(minutes=m), u, types[t], float(v))
        for i, (u, m, t, v) in enumerate(spec)
    ]


def _snap(spark, rows):
    return {
        tuple(r)
        for r in changelog_publish(
            changelog_reduce(spark.createDataFrame(rows, SCHEMA))
        ).collect()
    }


row_st = st.tuples(
    st.integers(0, 4),        # user_id: few keys -> collisions
    st.integers(0, 30),       # minute offset: duplicate ts -> id tie-break
    st.integers(0, 2),        # event type incl. tombstones
    st.integers(-3, 3),       # value
)


@settings(max_examples=12, deadline=None)
@given(
    spec=st.lists(row_st, min_size=2, max_size=14),
    cut=st.data(),
)
def test_any_epoch_cut_is_lossless(spark, spec, cut):
    rows = _rows(spec)
    k = cut.draw(st.integers(1, len(rows) - 1))
    a, b = rows[:k], rows[k:]
    merged = changelog_merge(
        changelog_reduce(spark.createDataFrame(a, SCHEMA)),
        changelog_reduce(spark.createDataFrame(b, SCHEMA)),
    )
    got = {tuple(r) for r in changelog_publish(merged).collect()}
    assert got == _snap(spark, rows)


def test_merge_is_order_insensitive(spark):
    rows = _rows([(1, 0, 0, 1), (1, 5, 1, 2), (2, 1, 2, 0), (1, 5, 0, 3)])
    a = changelog_reduce(spark.createDataFrame(rows[:2], SCHEMA))
    b = changelog_reduce(spark.createDataFrame(rows[2:], SCHEMA))
    ab = {tuple(r) for r in changelog_publish(changelog_merge(a, b)).collect()}
    ba = {tuple(r) for r in changelog_publish(changelog_merge(b, a)).collect()}
    assert ab == ba == _snap(spark, rows)


def test_equal_ts_breaks_on_event_id(spark):
    # two upserts for the same key at the SAME timestamp: the higher
    # event_id must win everywhere (the max-of-struct order), and the
    # tie-break must survive the epoch cut between them
    rows = _rows([(7, 10, 0, 1), (7, 10, 1, 2)])
    one_shot = _snap(spark, rows)
    split = {
        tuple(r)
        for r in changelog_publish(
            changelog_merge(
                changelog_reduce(spark.createDataFrame(rows[:1], SCHEMA)),
                changelog_reduce(spark.createDataFrame(rows[1:], SCHEMA)),
            )
        ).collect()
    }
    assert one_shot == split
    ((_, _, last_type, last_value, n, _),) = one_shot
    assert (last_type, last_value, n) == ("view", 2.0, 2)
