"""Protobuf wire-format decode tests: hypothesis round-trip (the
protorand analog), packed repeated scalars, D8 corrupt-drop, and the
Spark mapInPandas integration feeding the normalizer."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from quacfka_spark.sources.proto_wire import (
    Field,
    MessageSpec,
    decode_protobuf_wire,
    encode_message,
    parse_message,
)

DEAL = MessageSpec([Field(1, "id", "int64"), Field(2, "kind", "string")])
SITE = MessageSpec([Field(1, "id", "int64"), Field(2, "name", "string")])
MSG = MessageSpec(
    [
        Field(1, "site", "message", message=SITE),
        Field(2, "user_id", "int64"),
        Field(3, "amount", "double"),
        Field(4, "deals", "message", repeated=True, message=DEAL),
        Field(5, "tags", "string", repeated=True),
        Field(6, "flags", "bool"),
        Field(7, "ratio", "float"),
        Field(8, "delta", "sint64"),
    ]
)

i64 = st.integers(-(2**63), 2**63 - 1)
txt = st.text(max_size=20)
f64 = st.floats(allow_nan=False, allow_infinity=False, width=64)
f32 = st.floats(allow_nan=False, allow_infinity=False, width=32)

msg_strategy = st.fixed_dictionaries(
    {
        "site": st.none()
        | st.fixed_dictionaries({"id": i64 | st.none(), "name": txt | st.none()}),
        "user_id": i64 | st.none(),
        "amount": f64 | st.none(),
        "deals": st.lists(
            st.fixed_dictionaries({"id": i64 | st.none(), "kind": txt | st.none()}),
            max_size=3,
        ),
        "tags": st.lists(txt, max_size=3),
        "flags": st.booleans() | st.none(),
        "ratio": f32 | st.none(),
        "delta": i64 | st.none(),
    }
)


def _norm(m: dict) -> dict:
    """Encoding drops None-valued fields; decode restores them as None
    (proto3 absent-field semantics). Nested None fields likewise."""

    def fix(d: dict, spec: MessageSpec) -> dict:
        out = {}
        for f in spec.fields:
            v = d.get(f.name)
            if f.repeated:
                vv = [fix(x, f.message) if f.type == "message" else x for x in (v or []) if x is not None]
                out[f.name] = vv
            elif f.type == "message":
                out[f.name] = fix(v, f.message) if v is not None else None
            else:
                out[f.name] = v
        return out

    return fix(m, MSG)


@settings(max_examples=200, deadline=None, suppress_health_check=list(HealthCheck))
@given(m=msg_strategy)
def test_roundtrip(m):
    got = parse_message(encode_message(m, MSG), MSG)
    assert got == _norm(m)


def test_packed_repeated_scalars():
    spec = MessageSpec([Field(1, "xs", "int64", repeated=True)])
    # hand-build packed encoding: key wt=2, len, varints 1,2,300
    payload = bytes([0x0A, 0x04, 0x01, 0x02, 0xAC, 0x02])
    assert parse_message(payload, spec) == {"xs": [1, 2, 300]}
    # unpacked form parses identically
    unpacked = bytes([0x08, 0x01, 0x08, 0x02, 0x08, 0xAC, 0x02])
    assert parse_message(unpacked, spec) == {"xs": [1, 2, 300]}


def test_unknown_fields_skipped():
    data = encode_message({"user_id": 9, "amount": 2.5}, MSG)
    narrow = MessageSpec([Field(2, "user_id", "int64")])
    assert parse_message(data, narrow) == {"user_id": 9}


def test_corrupt_raises():
    with pytest.raises(ValueError):
        parse_message(b"\x0a\xff\xff\xff\xff\xff\xff\xff\xff\xff\xff", MSG)


def test_spark_decode_and_normalize(spark):
    msgs = [
        {"site": {"id": 1, "name": "a"}, "user_id": 10, "amount": 1.5,
         "deals": [{"id": 100, "kind": "x"}, {"id": 101, "kind": "y"}]},
        {"site": {"id": 2, "name": "b"}, "user_id": 20, "amount": 2.5, "deals": []},
    ]
    rows = [(encode_message(m, MSG),) for m in msgs] + [(b"\xff\xff garbage",)]
    df = spark.createDataFrame(rows, "value binary")
    decoded = decode_protobuf_wire(df, MSG)
    assert decoded.count() == 2  # corrupt dropped (D8)

    from quacfka_spark.plans.normalizer import NormalizerSpec

    norm = NormalizerSpec(
        fields=["r.site.id", "r.user_id", "r.deals.id", "r.deals.kind"],
        aliases=["site", "user_id", "deal_id", "deal_kind"],
    ).apply(decoded)
    got = sorted(map(tuple, norm.collect()))
    # user 10: one row per deal; user 20: null row (explode_outer)
    assert got == [
        (1, 10, 100, "x"),
        (1, 10, 101, "y"),
        (2, 20, None, None),
    ]


def test_schema_evolution_old_payloads_under_widened_spec(spark):
    """Producer-upgrade mid-stream (the real Kafka forward-compat path,
    reference kafka.go consumers tolerate this via proto semantics):
    a v2 spec adds field 9; one micro-batch carries BOTH v1 payloads
    (field absent on the wire) and v2 payloads. Decoding the mixed
    batch under the v2 spec must yield one stable schema with NULL for
    the v1 rows' new column — never a decode error, never a dropped
    row — so sink parquet schemas stay consistent across the upgrade
    epoch and old epochs remain readable under the new reader spec."""
    v2 = MessageSpec(MSG.fields + [Field(9, "region", "string")])
    v1_payload = encode_message({"user_id": 1, "amount": 0.5}, MSG)
    v2_payload = encode_message(
        {"user_id": 2, "amount": 1.5, "region": "emea"}, v2
    )
    df = spark.createDataFrame(
        [(v1_payload,), (v2_payload,)], "value binary"
    )
    out = decode_protobuf_wire(df, v2).select(
        "r.user_id", "r.region"
    )
    assert dict(out.collect()) == {1: None, 2: "emea"}
    # and the v1 spec still reads the MIXED batch (new field skipped
    # as unknown — the already-pinned direction, here end-to-end)
    old = decode_protobuf_wire(df, MSG).select("r.user_id", "r.amount")
    assert dict(old.collect()) == {1: 0.5, 2: 1.5}
