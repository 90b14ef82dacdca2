"""Pure-Python Avro *binary datum* codec for flat record schemas — ungates
the reference's wire format (SURVEY S2) without the spark-avro jar.

The reference produces raw Avro datum bytes onto Kafka (schema declared
out-of-band in ``stream_processing/schema.avsc:1-27``; encoding per the
public Apache Avro spec: zigzag-varint ints/longs, length-prefixed UTF-8
strings, little-endian IEEE floats/doubles — no container framing, no
compression). This module implements exactly that subset:

- ``decode_avro_records``: Arrow-batched ``mapInPandas`` decode of a
  ``value: binary`` column into the record's columns. Python-side by
  necessity, but batch-vectorized at the Arrow boundary and embarrassingly
  parallel — the decode is a per-partition map at scan speed.
- ``encode_record`` / test fixtures: the producer twin, so a
  produce→decode round-trip is provable inside this container.

When the spark-avro jar IS present, ``sources/files.py::decode_avro_stream``
(built-in ``from_avro``, JVM-side) is the preferred path; this codec is the
dependency-free fallback and the round-trip proof for both.
"""

from __future__ import annotations

import json
import struct
from typing import Iterator

from pyspark.sql import DataFrame

_PRIMITIVE_STRUCT = {
    "float": ("<f", 4),
    "double": ("<d", 8),
}

_SPARK_TYPES = {
    "string": "string",
    "long": "bigint",
    "int": "int",
    "float": "float",
    "double": "double",
    "boolean": "boolean",
    "bytes": "binary",
}


def parse_flat_record_schema(schema_json: str) -> list[tuple[str, str]]:
    """[(field_name, avro_primitive_type), ...] for a flat record schema;
    rejects unions/nesting (outside the reference's format)."""
    sch = json.loads(schema_json)
    if sch.get("type") != "record":
        raise ValueError("only record schemas supported")
    out = []
    for f in sch["fields"]:
        t = f["type"]
        if not isinstance(t, str) or t not in _SPARK_TYPES:
            raise ValueError(f"unsupported field type {t!r} (flat "
                             "primitives only)")
        out.append((f["name"], t))
    return out


def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    buf = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return bytes(buf)


def _zigzag_decode(data: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated varint")
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def encode_record(values: dict, fields: list[tuple[str, str]]) -> bytes:
    """Avro binary datum bytes for one record (the producer twin)."""
    out = bytearray()
    for name, typ in fields:
        v = values[name]
        if typ in ("long", "int"):
            out += _zigzag_encode(int(v))
        elif typ == "string":
            raw = v.encode("utf-8")
            out += _zigzag_encode(len(raw)) + raw
        elif typ == "bytes":
            out += _zigzag_encode(len(v)) + bytes(v)
        elif typ == "boolean":
            out += b"\x01" if v else b"\x00"
        else:
            fmt, _ = _PRIMITIVE_STRUCT[typ]
            out += struct.pack(fmt, v)
    return bytes(out)


def decode_record(data: bytes, fields: list[tuple[str, str]],
                  strict: bool = True) -> tuple:
    """Decode one datum. Fails LOUD on malformed input: a truncated buffer
    or trailing garbage raises instead of yielding plausible-looking wrong
    rows (a corrupt Kafka message must surface as an error, not silently
    pollute the decoded stream)."""
    pos = 0
    vals = []
    for name, typ in fields:
        if typ in ("long", "int"):
            v, pos = _zigzag_decode(data, pos)
        elif typ in ("string", "bytes"):
            n, pos = _zigzag_decode(data, pos)
            if n < 0 or pos + n > len(data):
                raise ValueError(
                    f"truncated datum: field {name!r} declares {n} bytes "
                    f"but only {len(data) - pos} remain")
            raw = data[pos:pos + n]
            pos += n
            v = raw.decode("utf-8") if typ == "string" else raw
        elif typ == "boolean":
            if pos >= len(data):
                raise ValueError(f"truncated datum at field {name!r}")
            v = data[pos] == 1
            pos += 1
        else:
            fmt, width = _PRIMITIVE_STRUCT[typ]
            if pos + width > len(data):
                raise ValueError(f"truncated datum at field {name!r}")
            v = struct.unpack_from(fmt, data, pos)[0]
            pos += width
        vals.append(v)
    if strict and pos != len(data):
        raise ValueError(
            f"{len(data) - pos} trailing bytes after the last field")
    return tuple(vals)


def decode_avro_records(frames: DataFrame, schema_json: str,
                        value_col: str = "value") -> DataFrame:
    """binary datum column -> record columns, Arrow-batched. The per-row
    Python is unavoidable without the jar (Avro's varints are not a fixed
    layout); batches flow through Arrow and the map is per-partition —
    no shuffle, no driver involvement."""
    import pandas as pd

    fields = parse_flat_record_schema(schema_json)
    out_schema = ", ".join(f"{n} {_SPARK_TYPES[t]}" for n, t in fields)
    names = [n for n, _ in fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pb in batches:
            rows = [decode_record(bytes(v), fields) for v in pb[value_col]]
            yield pd.DataFrame(rows, columns=names)

    return frames.select(value_col).mapInPandas(gen, out_schema)
