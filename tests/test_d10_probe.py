"""d10's probe knob reproduces the committed recall curve (r7 verdict #4).

The operating point is a per-corpus decision (like salt_buckets/auto), so
``d10_semdedup(probe=N)`` is a real parameter — these tests pin that each
probe width reproduces the EXACT dup counts recorded in
D10_RECALL_CURVE.json at the smoke fixture, i.e. the committed curve is a
property of the shipped code, not of the run that produced the artifact.
Deterministic end-to-end: seeded centroid training + integer-quantized
in-row assignment (dedup.py d10_semdedup docstring).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SMOKE_DIR

_CURVE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "D10_RECALL_CURVE.json",
)


def _smoke_curve() -> list[dict]:
    with open(_CURVE_PATH) as fh:
        curve = json.load(fh)["curve"]
    sf_tag = os.path.basename(SMOKE_DIR.rstrip("/")).removeprefix("sf")
    return [r for r in curve if r["sf"] == sf_tag]


@pytest.mark.parametrize("probe", [1, 2, 3])
def test_probe_reproduces_committed_dup_counts(spark, probe):
    from quacfka_spark.operators.dedup import d10_semdedup

    rows = _smoke_curve()
    if not rows:  # non-default SMOKE_DIR has no committed curve row
        pytest.skip(f"no committed curve rows for {SMOKE_DIR}")
    want = {r["probe"]: r["n_d10"] for r in rows}[probe]
    got = (
        d10_semdedup(spark, SMOKE_DIR, probe=probe)
        .filter(F.col("is_dup") == 1)
        .count()
    )
    assert got == want, f"probe={probe}: {got} dups vs committed {want}"


def test_probe_widens_monotonically(spark):
    """More probes can only ADD cell co-memberships, so the dup set must
    grow (or hold) with probe — the curve's recall monotonicity is a
    structural property, not a fixture accident."""
    from quacfka_spark.operators.dedup import d10_semdedup

    counts = [
        d10_semdedup(spark, SMOKE_DIR, probe=p)
        .filter(F.col("is_dup") == 1)
        .count()
        for p in (1, 2, 3)
    ]
    assert counts[0] <= counts[1] <= counts[2]
    assert counts[0] < counts[2], "probe knob had no effect on the fixture"


def test_registered_default_is_probe_3():
    from quacfka_spark.operators.dedup import _D10_PROBE, d10_semdedup
    import inspect

    assert _D10_PROBE == 3
    assert (
        inspect.signature(d10_semdedup).parameters["probe"].default
        == _D10_PROBE
    )
