"""JVM protobuf codec tests — verify the Scala wire codec
(jvm/src/quacfka/jvm/ProtoWire.scala) against the pure-Python twin
(sources/proto_wire.py): cross-decoder equivalence (hypothesis),
encoder byte-equality, struct round-trip, packed scalars, D8 corrupt
drop, and the auto-fallback wrapper."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F
from pyspark.sql import types as T

from quacfka_spark.sources.proto_jvm import (
    decode_protobuf_auto,
    decode_protobuf_jvm,
    encode_protobuf_jvm,
    jvm_codec_available,
    spec_string,
)
from quacfka_spark.sources.proto_wire import (
    Field,
    MessageSpec,
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
        Field(9, "blob", "bytes"),
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
        "blob": st.binary(max_size=16) | st.none(),
    }
)


def _row_to_dict(row, spec: MessageSpec):
    if row is None:
        return None
    out = {}
    for f, v in zip(spec.fields, row):
        if f.type == "message":
            out[f.name] = (
                [_row_to_dict(x, f.message) for x in v]
                if f.repeated
                else _row_to_dict(v, f.message)
            )
        elif f.type == "bytes":
            out[f.name] = (
                [bytes(x) for x in v] if f.repeated else (bytes(v) if v is not None else None)
            )
        elif f.repeated:
            out[f.name] = list(v)
        else:
            out[f.name] = v
    return out


def test_jvm_codec_available(spark):
    assert jvm_codec_available(spark), "JVM codec jar failed to load"


def test_spec_string_format():
    assert (
        spec_string(DEAL) == "1:id:int64;2:kind:string"
    )
    assert spec_string(MSG).startswith("1:site:msg{1:id:int64;2:name:string};2:user_id:int64")
    assert "4:deals:msg{1:id:int64;2:kind:string}*" in spec_string(MSG)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(batch=st.lists(msg_strategy, min_size=1, max_size=24))
def test_cross_decoder_equivalence(spark, batch):
    """JVM decode == Python decode on identical wire bytes."""
    payloads = [(encode_message(m, MSG),) for m in batch]
    df = spark.createDataFrame(payloads, "value binary")
    got = [
        _row_to_dict(r["r"], MSG)
        for r in decode_protobuf_jvm(df, MSG).select("r").collect()
    ]
    want = [parse_message(p[0], MSG) for p in payloads]
    assert got == want


def test_cross_encoder_byte_equality(spark):
    """JVM encoder emits byte-identical output to the Python encoder
    (same field order, unpacked repeated scalars)."""
    msgs = [
        {"site": {"id": 7, "name": "s"}, "user_id": -3, "amount": 2.25,
         "deals": [{"id": 1, "kind": "a"}, {"id": 2, "kind": "b"}],
         "tags": ["x", "y"], "flags": True, "ratio": 1.5, "delta": -9,
         "blob": b"\x00\x01"},
        {"site": None, "user_id": 2**62, "amount": None, "deals": [],
         "tags": [], "flags": None, "ratio": None, "delta": 2**60, "blob": None},
    ]
    schema = MSG.spark_schema()
    df = spark.createDataFrame(msgs, schema)
    enc = df.select(
        encode_protobuf_jvm(spark, F.struct(*[f.name for f in schema.fields]), MSG).alias("v")
    )
    got = [bytes(r["v"]) for r in enc.collect()]
    want = [encode_message(m, MSG) for m in msgs]
    assert got == want


def test_jvm_roundtrip_through_dataframe(spark):
    """encode -> decode is the identity on the struct column (the
    to_protobuf∘from_protobuf round-trip check, SURVEY.md §5.2)."""
    msgs = [
        {"site": {"id": 1, "name": "alpha"}, "user_id": 10, "amount": 1.5,
         "deals": [{"id": 100, "kind": "x"}], "tags": ["t1"], "flags": False,
         "ratio": 0.25, "delta": -1, "blob": b"zz"},
        {"site": {"id": 2, "name": None}, "user_id": None, "amount": -0.5,
         "deals": [], "tags": [], "flags": True, "ratio": None, "delta": None,
         "blob": None},
    ]
    schema = MSG.spark_schema()
    df = spark.createDataFrame(msgs, schema)
    enc = df.select(
        encode_protobuf_jvm(spark, F.struct(*[f.name for f in schema.fields]), MSG).alias("value")
    )
    back = decode_protobuf_jvm(enc, MSG).select("r.*")
    got = sorted(
        (_row_to_dict(r, MSG) for r in back.collect()),
        key=lambda d: (d["site"] or {}).get("id") or 0,
    )
    want = [
        {**m, "site": m["site"] and {**m["site"]}} for m in msgs
    ]
    assert got == want


def test_jvm_corrupt_dropped(spark):
    good = encode_message({"user_id": 5, "amount": 1.0, "deals": [], "tags": []}, MSG)
    rows = [(good,), (b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\xff\xff",), (b"\x0a\x99",)]
    df = spark.createDataFrame(rows, "value binary")
    out = decode_protobuf_jvm(df, MSG)
    assert out.count() == 1
    assert out.select("r.user_id").collect()[0][0] == 5


def test_jvm_invalid_utf8_dropped(spark):
    # field 5 (tags, string) with invalid UTF-8 bytes -> row drops, matching
    # the Python decoder's UnicodeDecodeError drop
    bad = bytes([0x2A, 0x02, 0xC3, 0x28])  # key(5,2), len 2, invalid utf8
    df = spark.createDataFrame([(bad,)], "value binary")
    assert decode_protobuf_jvm(df, MSG).count() == 0
    with pytest.raises((ValueError, UnicodeDecodeError)):
        parse_message(bad, MSG)


def test_jvm_packed_scalars(spark):
    spec = MessageSpec([Field(1, "xs", "int64", repeated=True)])
    packed = bytes([0x0A, 0x04, 0x01, 0x02, 0xAC, 0x02])
    unpacked = bytes([0x08, 0x01, 0x08, 0x02, 0x08, 0xAC, 0x02])
    df = spark.createDataFrame([(packed,), (unpacked,)], "value binary")
    got = [list(r["r"]["xs"]) for r in decode_protobuf_jvm(df, spec).collect()]
    assert got == [[1, 2, 300], [1, 2, 300]]


def test_jvm_unknown_fields_skipped(spark):
    data = encode_message({"user_id": 9, "amount": 2.5, "deals": [], "tags": []}, MSG)
    narrow = MessageSpec([Field(2, "user_id", "int64")])
    df = spark.createDataFrame([(data,)], "value binary")
    assert decode_protobuf_jvm(df, narrow).select("r.user_id").collect()[0][0] == 9


def test_auto_fallback_matches_jvm(spark):
    msgs = [{"user_id": i, "amount": float(i), "deals": [], "tags": []} for i in range(5)]
    df = spark.createDataFrame([(encode_message(m, MSG),) for m in msgs], "value binary")
    via_auto = decode_protobuf_auto(df, MSG).select("r.user_id")
    assert sorted(r[0] for r in via_auto.collect()) == [0, 1, 2, 3, 4]


# ---------------------------------------------------------------------------
# decoder-convergence cases: wire-type mismatch, field-number overflow,
# and length overflow must behave IDENTICALLY in both decoders (round-2
# ADVICE: the twins previously disagreed, so which rows survived depended
# on whether the jar was present).


def _key(fno: int, wt: int) -> bytearray:
    out = bytearray()
    _write_varint_raw(out, (fno << 3) | wt)
    return out


def _write_varint_raw(out: bytearray, val: int) -> None:
    while True:
        b = val & 0x7F
        val >>= 7
        if val:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _both_decode(spark, payload: bytes, spec: MessageSpec):
    """Returns (python_result_or_None, jvm_result_or_None) as dicts;
    None means the row was dropped by that decoder."""
    try:
        py = parse_message(payload, spec)
    except (ValueError, UnicodeDecodeError):
        py = None
    df = spark.createDataFrame([(payload,)], "value binary")
    rows = decode_protobuf_jvm(df, spec).select("r").collect()
    jvm = _row_to_dict(rows[0]["r"], spec) if rows else None
    return py, jvm


def test_mismatched_wire_types_skip_field_keep_row(spark):
    """A known field arriving with the wrong wire type is an unknown
    field (proto-standard): value discarded, row survives, other fields
    intact — in BOTH decoders."""
    # user_id (field 2) is int64/varint in MSG; send it three wrong ways,
    # alongside a valid amount (field 3, double) that must survive
    good_amount = bytearray(_key(3, 1)) + bytearray(
        __import__("struct").pack("<d", 2.5)
    )
    wrong_fixed64 = bytes(_key(2, 1) + bytearray(8) + good_amount)
    wrong_fixed32 = bytes(_key(2, 5) + bytearray(4) + good_amount)
    len_delim = bytearray(_key(2, 2))
    _write_varint_raw(len_delim, 3)
    wrong_len = bytes(len_delim + b"abc" + good_amount)
    for payload in (wrong_fixed64, wrong_fixed32, wrong_len):
        py, jvm = _both_decode(spark, payload, MSG)
        assert py is not None and jvm is not None, "row must survive"
        assert py == jvm
        assert py["user_id"] is None
        assert py["amount"] == 2.5


def test_mismatched_varint_on_string_field(spark):
    # tags (field 5) is repeated string; a varint there is a mismatch
    payload = bytearray(_key(5, 0))
    _write_varint_raw(payload, 42)
    payload += _key(2, 0)
    _write_varint_raw(payload, 7)
    py, jvm = _both_decode(spark, bytes(payload), MSG)
    assert py == jvm
    assert py["tags"] == []
    assert py["user_id"] == 7


def test_field_number_int_truncation_no_collision(spark):
    """Field number 2^32+2 truncates to 2 in a naive .toInt — it must
    NOT collide onto real field 2 (user_id); both decoders treat any
    out-of-range field number as unknown."""
    payload = bytearray(_key((1 << 32) + 2, 0))
    _write_varint_raw(payload, 99)
    payload += _key(2, 0)
    _write_varint_raw(payload, 7)
    py, jvm = _both_decode(spark, bytes(payload), MSG)
    assert py == jvm
    assert py["user_id"] == 7  # the REAL field 2, not the colliding 99


def test_declared_length_int_overflow_drops_row(spark):
    """len near Int.MaxValue must not wrap the bounds check: both
    decoders classify it as truncated input and drop the row."""
    payload = bytearray(_key(9, 2))  # blob, bytes
    _write_varint_raw(payload, (1 << 31) - 1)
    payload += b"xx"
    py, jvm = _both_decode(spark, bytes(payload), MSG)
    assert py is None and jvm is None


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(blobs=st.lists(st.binary(min_size=0, max_size=40), min_size=1, max_size=32))
def test_fuzz_decoder_convergence(spark, blobs):
    """ARBITRARY byte streams — mostly malformed, some accidentally
    valid — must produce identical outcomes from both decoders: the same
    rows survive with the same values. This is the property that makes
    jar presence invisible to pipelines (decode_protobuf_auto)."""
    want = []
    for p in blobs:
        try:
            want.append(parse_message(p, MSG))
        except (ValueError, UnicodeDecodeError):
            continue
    df = spark.createDataFrame([(p,) for p in blobs], "value binary")
    got = [
        _row_to_dict(r["r"], MSG)
        for r in decode_protobuf_jvm(df, MSG).select("r").collect()
    ]
    assert got == want


def test_jvm_schema_evolution_mixed_batch(spark):
    """Same producer-upgrade scenario as the wire twin's test (v2 spec
    adds field 10; one batch mixes v1 and v2 payloads): the JVM codec
    must produce the stable widened schema with NULL for v1 rows and
    still read the mixed batch under the v1 spec (new field skipped as
    unknown) — the two decode paths agree on the upgrade epoch."""
    v2 = MessageSpec(MSG.fields + [Field(10, "region", "string")])
    v1_payload = encode_message({"user_id": 1, "amount": 0.5}, MSG)
    v2_payload = encode_message(
        {"user_id": 2, "amount": 1.5, "region": "emea"}, v2
    )
    df = spark.createDataFrame(
        [(v1_payload,), (v2_payload,)], "value binary"
    )
    out = decode_protobuf_jvm(df, v2).select("r.user_id", "r.region")
    assert dict(out.collect()) == {1: None, 2: "emea"}
    old = decode_protobuf_jvm(df, MSG).select("r.user_id", "r.amount")
    assert dict(old.collect()) == {1: 0.5, 2: 1.5}
