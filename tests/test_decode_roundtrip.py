"""Randomized decode round-trip — the survey's protorand analog
(SURVEY.md §5.2; reference MockKafka, /root/reference/kafka.go:238-264).

Property: for arbitrary rows of the nested message shape, encode ->
bytes -> decode_json reproduces the rows exactly (D7), and corrupt
payloads drop as null rows instead of failing the batch (D8,
proto.go:131-145).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from quacfka_spark.sources.kafka import decode_json
from quacfka_spark.sources.mock import NESTED_SCHEMA

# JSON-representable doubles only: NaN/Inf round-trip as corrupt records
# by design (exercised separately below).
finite_doubles = st.floats(allow_nan=False, allow_infinity=False, width=64)
text = st.text(max_size=40)

deal = st.fixed_dictionaries({"id": st.integers(-(2**63), 2**63 - 1) | st.none(), "kind": text | st.none()})
row = st.fixed_dictionaries(
    {
        "site": st.fixed_dictionaries(
            {"id": st.integers(-(2**63), 2**63 - 1) | st.none(), "name": text | st.none()}
        )
        | st.none(),
        "user_id": st.integers(-(2**63), 2**63 - 1) | st.none(),
        "amount": finite_doubles | st.none(),
        "deals": st.lists(deal, max_size=4) | st.none(),
    }
)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=st.lists(row, min_size=1, max_size=25))
def test_roundtrip_arbitrary_rows(spark, rows):
    src = spark.createDataFrame(rows, NESTED_SCHEMA)
    encoded = src.select(F.encode(F.to_json(F.struct("*")), "utf-8").alias("value"))
    decoded = decode_json(encoded, NESTED_SCHEMA).select("r.*")
    got = sorted(map(str, decoded.collect()))
    # to_json drops null fields; from_json restores them as nulls — an
    # all-null row round-trips to "{}" which stays a valid (all-null) row.
    want = sorted(map(str, src.collect()))
    assert got == want


def test_corrupt_records_drop_not_fail(spark):
    """D8: structurally-undecodable bytes drop (the reference's
    log-and-continue); a decodable payload with a field-level type
    mismatch keeps the row with that field NULL (PERMISSIVE JSON
    semantics, documented in decode_json)."""
    good = '{"site":{"id":1,"name":"s"},"user_id":7,"amount":1.5,"deals":[]}'
    typo = '{"site":{"id":2,"name":"t"},"user_id":"not_a_number"}'
    rows = [(good.encode(),), (b"\xff\x00 not json",), (b"{truncated",), (typo.encode(),)]
    df = spark.createDataFrame(rows, "value binary")
    out = decode_json(df, NESTED_SCHEMA).select("r.*")
    got = {r["site"]["id"]: r for r in out.collect()}
    assert set(got) == {1, 2}
    assert got[1]["user_id"] == 7
    assert got[2]["user_id"] is None  # type mismatch -> field nulled, row kept


def test_failfast_mode_raises(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkUpgradeException

    df = spark.createDataFrame([(b"not json",)], "value binary")
    out = decode_json(df, NESTED_SCHEMA, permissive=False)
    with pytest.raises(Exception):
        out.collect()
