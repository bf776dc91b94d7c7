"""Dependency-free protobuf wire-format decode — the fallback for D7
when neither the spark-protobuf jar nor the google.protobuf package is
available (as in this environment).

The reference's payloads ARE protobuf (README.md:6; proto.go:78-172
decodes them with generated Go code), so an engine claiming its users
can switch needs a protobuf path that works from a bare PySpark install.
The wire format is public and small (developers.google.com/
protocol-buffers/docs/encoding): varint field keys `(field_no << 3) |
wire_type`, wire types 0=varint, 1=fixed64, 2=length-delimited,
5=fixed32; nested messages and packed repeated scalars are
length-delimited.

Speed positioning (SURVEY.md §2a D7): this is the SLOW path — per-row
Python parsing inside Arrow-batched ``mapInPandas`` (no JVM round-trip
per row, but still Python). With the spark-protobuf jar present,
``sources.kafka.decode_protobuf`` (vectorized JVM ``from_protobuf``) is
the production path; the two produce identical row shapes so swapping is
a one-line change. An encoder is included so tests can round-trip
without any protobuf tooling (the protorand analog, kafka.go:248-255).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# wire types
_VARINT, _FIXED64, _LEN, _FIXED32 = 0, 1, 2, 5

_SCALAR_SPARK = {
    "int64": T.LongType(),
    "int32": T.IntegerType(),
    "uint64": T.LongType(),
    "sint64": T.LongType(),
    "sint32": T.IntegerType(),
    "bool": T.BooleanType(),
    "enum": T.IntegerType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "fixed64": T.LongType(),
    "sfixed64": T.LongType(),
    "fixed32": T.IntegerType(),
    "sfixed32": T.IntegerType(),
    "string": T.StringType(),
    "bytes": T.BinaryType(),
}
_VARINT_TYPES = {"int64", "int32", "uint64", "sint64", "sint32", "bool", "enum"}
_FIXED64_TYPES = {"double", "fixed64", "sfixed64"}
_FIXED32_TYPES = {"float", "fixed32", "sfixed32"}


@dataclass
class Field:
    number: int
    name: str
    type: str  # key of _SCALAR_SPARK, or "message"
    repeated: bool = False
    message: "MessageSpec | None" = None


@dataclass
class MessageSpec:
    """Schema of one protobuf message type — the stand-in for a compiled
    descriptor (bufarrow generated this from the Go type parameter,
    SURVEY.md §1.3)."""

    fields: list[Field] = dc_field(default_factory=list)

    def spark_schema(self) -> T.StructType:
        out = []
        for f in self.fields:
            if f.type == "message":
                dt: T.DataType = f.message.spark_schema()  # type: ignore[union-attr]
            else:
                dt = _SCALAR_SPARK[f.type]
            if f.repeated:
                dt = T.ArrayType(dt)
            out.append(T.StructField(f.name, dt))
        return T.StructType(out)

    def by_number(self) -> dict[int, Field]:
        return {f.number: f for f in self.fields}


# ---------------------------------------------------------------------------
# decoding


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = result = 0
    while True:
        if i >= len(buf):
            raise ValueError("truncated varint")
        b = buf[i]
        result |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return result, i
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _zigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _to_signed64(n: int) -> int:
    return n - (1 << 64) if n >= 1 << 63 else n


def _to_signed32(n: int) -> int:
    n &= 0xFFFFFFFF
    return n - (1 << 32) if n >= 1 << 31 else n


def _convert_varint(val: int, ftype: str):
    if ftype == "bool":
        return bool(val)
    if ftype in ("sint64", "sint32"):
        return _zigzag(val)
    if ftype in ("int32", "enum"):
        return _to_signed32(val)
    if ftype == "int64":
        return _to_signed64(val)
    return _to_signed64(val)  # uint64 carried as signed long (Spark has no u64)


def _parse_scalar_len(data: bytes, ftype: str):
    if ftype == "string":
        return data.decode("utf-8")
    if ftype == "bytes":
        return data
    raise ValueError(f"unexpected length-delimited for {ftype}")


def parse_message(buf: bytes, spec: MessageSpec) -> dict:
    """Parse one message; unknown fields are skipped, and a known field
    arriving with a mismatched wire type is treated as unknown (value
    consumed and discarded, row kept) — both standard proto parser
    semantics, byte-identical with the Scala twin. Truncated/garbage
    input raises ValueError (D8 callers drop the row)."""
    fields = spec.by_number()
    out: dict = {f.name: ([] if f.repeated else None) for f in spec.fields}
    i = 0
    while i < len(buf):
        key, i = _read_varint(buf, i)
        wt, fno = key & 7, key >> 3
        f = fields.get(fno)
        if wt == _VARINT:
            val, i = _read_varint(buf, i)
            if f and f.type in _VARINT_TYPES:
                v = _convert_varint(val, f.type)
                out[f.name].append(v) if f.repeated else out.__setitem__(f.name, v)
        elif wt == _FIXED64:
            if i + 8 > len(buf):
                raise ValueError("truncated fixed64")
            raw = buf[i : i + 8]
            i += 8
            if f and f.type in _FIXED64_TYPES:
                v = (
                    struct.unpack("<d", raw)[0]
                    if f.type == "double"
                    else struct.unpack("<q", raw)[0]
                )
                out[f.name].append(v) if f.repeated else out.__setitem__(f.name, v)
        elif wt == _FIXED32:
            if i + 4 > len(buf):
                raise ValueError("truncated fixed32")
            raw = buf[i : i + 4]
            i += 4
            if f and f.type in _FIXED32_TYPES:
                v = (
                    struct.unpack("<f", raw)[0]
                    if f.type == "float"
                    else struct.unpack("<i", raw)[0]
                )
                out[f.name].append(v) if f.repeated else out.__setitem__(f.name, v)
        elif wt == _LEN:
            ln, i = _read_varint(buf, i)
            if i + ln > len(buf):
                raise ValueError("truncated length-delimited")
            data = buf[i : i + ln]
            i += ln
            if f is None:
                continue
            if f.type == "message":
                v = parse_message(data, f.message)  # type: ignore[arg-type]
                out[f.name].append(v) if f.repeated else out.__setitem__(f.name, v)
            elif f.type in ("string", "bytes"):
                v = _parse_scalar_len(data, f.type)
                out[f.name].append(v) if f.repeated else out.__setitem__(f.name, v)
            elif not f.repeated:
                # wire-type mismatch on a known scalar field: standard
                # proto parsers treat it as an unknown field — skip the
                # (already consumed) value, keep the row. Mirrors the
                # varint/fixed branches above and the Scala twin.
                continue
            elif f.type in _VARINT_TYPES | _FIXED64_TYPES | _FIXED32_TYPES:
                # packed repeated scalars (custom.go:61 IsPacked)
                j = 0
                while j < ln:
                    if f.type in _VARINT_TYPES:
                        val, j = _read_varint(data, j)
                        out[f.name].append(_convert_varint(val, f.type))
                    elif f.type in _FIXED64_TYPES:
                        out[f.name].append(
                            struct.unpack("<d", data[j : j + 8])[0]
                            if f.type == "double"
                            else struct.unpack("<q", data[j : j + 8])[0]
                        )
                        j += 8
                    else:
                        out[f.name].append(
                            struct.unpack("<f", data[j : j + 4])[0]
                            if f.type == "float"
                            else struct.unpack("<i", data[j : j + 4])[0]
                        )
                        j += 4
            # (non-scalar f.type is impossible here: message/string/bytes
            # handled above, so the remaining branch is packed scalars)
        else:
            raise ValueError(f"unsupported wire type {wt}")
    return out


# ---------------------------------------------------------------------------
# encoding (test/generator side — the protorand analog)


def _write_varint(out: bytearray, val: int) -> None:
    val &= (1 << 64) - 1
    while True:
        b = val & 0x7F
        val >>= 7
        if val:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def encode_message(msg: dict, spec: MessageSpec) -> bytes:
    out = bytearray()
    for f in spec.fields:
        val = msg.get(f.name)
        if val is None:
            continue
        vals = val if f.repeated else [val]
        for v in vals:
            if v is None:
                continue
            if f.type in _VARINT_TYPES:
                _write_varint(out, (f.number << 3) | _VARINT)
                if f.type in ("sint64", "sint32"):
                    v = (v << 1) ^ (v >> 63)
                elif f.type == "bool":
                    v = int(v)
                _write_varint(out, v)
            elif f.type in _FIXED64_TYPES:
                _write_varint(out, (f.number << 3) | _FIXED64)
                out += struct.pack("<d", v) if f.type == "double" else struct.pack("<q", v)
            elif f.type in _FIXED32_TYPES:
                _write_varint(out, (f.number << 3) | _FIXED32)
                out += struct.pack("<f", v) if f.type == "float" else struct.pack("<i", v)
            elif f.type in ("string", "bytes"):
                data = v.encode("utf-8") if f.type == "string" else v
                _write_varint(out, (f.number << 3) | _LEN)
                _write_varint(out, len(data))
                out += data
            elif f.type == "message":
                data = encode_message(v, f.message)  # type: ignore[arg-type]
                _write_varint(out, (f.number << 3) | _LEN)
                _write_varint(out, len(data))
                out += data
            else:
                raise ValueError(f"unsupported type {f.type}")
    return bytes(out)


# ---------------------------------------------------------------------------
# Spark integration


def decode_protobuf_wire(
    df: DataFrame,
    spec: MessageSpec,
    *,
    value_col: str = "value",
) -> DataFrame:
    """bytes -> struct column ``r`` via pure-Python wire parsing in
    Arrow-batched ``mapInPandas``. Undecodable payloads drop (D8).

    Same output shape as ``decode_protobuf`` (the JVM from_protobuf
    path) so pipelines swap decoders without downstream changes.
    """
    import pandas as pd

    schema = T.StructType([T.StructField("r", spec.spark_schema())])

    def batches(it):
        for pdf in it:
            rows = []
            for raw in pdf[value_col]:
                try:
                    rows.append(
                        {"r": parse_message(bytes(raw), spec)}
                    )
                except (ValueError, UnicodeDecodeError):
                    continue  # D8: log-and-continue analog
            yield pd.DataFrame(rows, columns=["r"])

    return df.mapInPandas(batches, schema=schema)
