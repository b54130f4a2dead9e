"""Pure-Python Avro Object Container File codec — the fallback read
path when the ``spark-avro`` JVM connector is not deployed.

Implemented from the public Avro 1.x specification
(https://avro.apache.org/docs/current/specification/): container magic
``Obj\\x01``, file-metadata map carrying the writer schema JSON and
codec, 16-byte sync marker, then blocks of ``(record count, byte size,
payload, sync)``. Binary encoding: zigzag-varint ints/longs, IEEE-754
little-endian float/double, length-prefixed bytes/strings, records as
field concatenation, arrays/maps as counted blocks, unions as a
branch index + value. Codecs: ``null`` and ``deflate`` (raw zlib).

Scale shape: :func:`read_avro_fallback` lists files with Spark's
``binaryFile`` source and decodes each file INSIDE ``mapInPandas`` —
one Arrow-batched Python pass, partition-parallel across files, no
driver involvement. The JVM connector remains the preferred path
(vectorized, splittable within a file); this tier trades per-file
granularity for zero external dependencies, which is the right
fallback for an environment that cannot deploy packages. The encoder
exists for round-trips and fixture generation (single-buffer, used
per-partition by the writer in tests).

Supported schema surface: null/boolean/int/long/float/double/bytes/
string primitives, records, arrays, maps, ["null", X] and general
unions, enums, fixed. Logical types decode as their underlying
primitive (documented; timestamp handling is the caller's contract).
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from typing import Any, Iterator

MAGIC = b"Obj\x01"


# --------------------------------------------------------------- varint


def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: io.BytesIO) -> int:
    shift, u = 0, 0
    while True:
        (b,) = buf.read(1)
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1)


# --------------------------------------------------------------- decode


def _read_bytes(buf: io.BytesIO) -> bytes:
    return buf.read(_zigzag_decode(buf))


def _decode(schema: Any, buf: io.BytesIO) -> Any:
    if isinstance(schema, list):  # union: branch index then value
        return _decode(schema[_zigzag_decode(buf)], buf)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return {
                f["name"]: _decode(f["type"], buf) for f in schema["fields"]
            }
        if t == "array":
            out = []
            while True:
                n = _zigzag_decode(buf)
                if n == 0:
                    return out
                if n < 0:  # block with byte-size prefix
                    n = -n
                    _zigzag_decode(buf)
                out.extend(_decode(schema["items"], buf) for _ in range(n))
        if t == "map":
            out = {}
            while True:
                n = _zigzag_decode(buf)
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    _zigzag_decode(buf)
                for _ in range(n):
                    k = _read_bytes(buf).decode("utf-8")
                    out[k] = _decode(schema["values"], buf)
        if t == "enum":
            return schema["symbols"][_zigzag_decode(buf)]
        if t == "fixed":
            return buf.read(schema["size"])
        return _decode(t, buf)  # {"type": "long", "logicalType": ...}
    if schema == "null":
        return None
    if schema == "boolean":
        return buf.read(1) == b"\x01"
    if schema in ("int", "long"):
        return _zigzag_decode(buf)
    if schema == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if schema == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if schema == "bytes":
        return _read_bytes(buf)
    if schema == "string":
        return _read_bytes(buf).decode("utf-8")
    raise ValueError(f"unsupported Avro schema node: {schema!r}")


def decode_container(payload: bytes) -> tuple[dict, list[Any]]:
    """Decode one Object Container File → (writer schema, records)."""
    buf = io.BytesIO(payload)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta_schema = {"type": "map", "values": "bytes"}
    meta = _decode(meta_schema, buf)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = buf.read(16)
    records: list[Any] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, 1)
        n = _zigzag_decode(buf)
        size = _zigzag_decode(buf)
        block = buf.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported Avro codec: {codec}")
        bb = io.BytesIO(block)
        records.extend(_decode(schema, bb) for _ in range(n))
        if buf.read(16) != sync:
            raise ValueError("Avro block sync marker mismatch")
    return schema, records


# --------------------------------------------------------------- encode


def _branch_matches(branch: Any, val: Any) -> bool:
    """Union-branch resolution by Python type (Avro spec §unions: a
    union value is tagged with the branch whose type it carries)."""
    if isinstance(branch, dict):
        t = branch["type"]
        if t == "record":
            return isinstance(val, dict)
        if t == "array":
            return isinstance(val, (list, tuple))
        if t == "map":
            return isinstance(val, dict)
        if t == "enum":
            return isinstance(val, str) and val in branch["symbols"]
        if t == "fixed":
            return isinstance(val, (bytes, bytearray))
        return _branch_matches(t, val)
    if branch == "null":
        return val is None
    if branch == "boolean":
        return isinstance(val, bool)
    if branch in ("int", "long"):
        return isinstance(val, int) and not isinstance(val, bool)
    if branch in ("float", "double"):
        # accept ints for float branches only if no int branch exists —
        # callers wanting that pass floats; keep matching strict here
        return isinstance(val, float)
    if branch == "bytes":
        return isinstance(val, (bytes, bytearray))
    if branch == "string":
        return isinstance(val, str)
    return False


def _encode(schema: Any, val: Any, out: bytearray) -> None:
    if isinstance(schema, list):
        # pick the first branch whose type matches the Python value —
        # nullness alone is not enough for general unions like
        # ["int","string"], where coercing would silently corrupt data.
        for i, branch in enumerate(schema):
            if _branch_matches(branch, val):
                out += _zigzag_encode(i)
                _encode(branch, val, out)
                return
        raise ValueError(f"no union branch for {val!r} in {schema!r}")
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            for f in schema["fields"]:
                _encode(f["type"], val[f["name"]], out)
            return
        if t == "array":
            if val:
                out += _zigzag_encode(len(val))
                for item in val:
                    _encode(schema["items"], item, out)
            out += _zigzag_encode(0)
            return
        if t == "map":
            if val:
                out += _zigzag_encode(len(val))
                for k, v in val.items():
                    kb = k.encode("utf-8")
                    out += _zigzag_encode(len(kb)) + kb
                    _encode(schema["values"], v, out)
            out += _zigzag_encode(0)
            return
        if t == "enum":
            out += _zigzag_encode(schema["symbols"].index(val))
            return
        if t == "fixed":
            out += val
            return
        _encode(t, val, out)
        return
    if schema == "null":
        return
    if schema == "boolean":
        out += b"\x01" if val else b"\x00"
        return
    if schema in ("int", "long"):
        out += _zigzag_encode(int(val))
        return
    if schema == "float":
        out += struct.pack("<f", val)
        return
    if schema == "double":
        out += struct.pack("<d", val)
        return
    if schema == "bytes":
        out += _zigzag_encode(len(val)) + bytes(val)
        return
    if schema == "string":
        vb = val.encode("utf-8")
        out += _zigzag_encode(len(vb)) + vb
        return
    raise ValueError(f"unsupported Avro schema node: {schema!r}")


def encode_container(
    schema: dict, records: list[Any], codec: str = "null"
) -> bytes:
    """Encode records into one Object Container File (single block)."""
    sync = b"\x00" * 8 + b"tw-etl-sp"[:8]  # fixed marker: deterministic output
    body = bytearray()
    for r in records:
        _encode(schema, r, body)
    block = bytes(body)
    if codec == "deflate":
        c = zlib.compressobj(9, zlib.DEFLATED, -15)
        block = c.compress(block) + c.flush()
    elif codec != "null":
        raise ValueError(f"unsupported Avro codec: {codec}")
    meta = {
        "avro.schema": json.dumps(schema).encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
    }
    out = bytearray(MAGIC)
    out += _zigzag_encode(len(meta))
    for k, v in sorted(meta.items()):
        kb = k.encode("utf-8")
        out += _zigzag_encode(len(kb)) + kb
        out += _zigzag_encode(len(v)) + v
    out += _zigzag_encode(0)
    out += sync
    out += _zigzag_encode(len(records))
    out += _zigzag_encode(len(block))
    out += block
    out += sync
    return bytes(out)


# ------------------------------------------------- schema translation


def avro_to_spark_schema(schema: dict):
    """Writer-schema (record) → Spark StructType. Unions with null map
    to nullable fields; logical types stay at their physical type."""
    from pyspark.sql import types as T

    def conv(node: Any) -> tuple[Any, bool]:
        if isinstance(node, list):
            branches = [b for b in node if b != "null"]
            if len(branches) != 1:
                raise ValueError(f"general unions unsupported as columns: {node!r}")
            dt, _ = conv(branches[0])
            return dt, True
        if isinstance(node, dict):
            t = node["type"]
            if t == "record":
                return (
                    T.StructType(
                        [
                            T.StructField(f["name"], *_flip(conv(f["type"])))
                            for f in node["fields"]
                        ]
                    ),
                    False,
                )
            if t == "array":
                dt, n = conv(node["items"])
                return T.ArrayType(dt, containsNull=n), False
            if t == "map":
                dt, n = conv(node["values"])
                return T.MapType(T.StringType(), dt, valueContainsNull=n), False
            if t == "enum":
                return T.StringType(), False
            if t == "fixed":
                return T.BinaryType(), False
            return conv(t)
        return {
            "null": (T.NullType(), True),
            "boolean": (T.BooleanType(), False),
            "int": (T.IntegerType(), False),
            "long": (T.LongType(), False),
            "float": (T.FloatType(), False),
            "double": (T.DoubleType(), False),
            "bytes": (T.BinaryType(), False),
            "string": (T.StringType(), False),
        }[node]

    def _flip(dt_n):
        return dt_n[0], dt_n[1]

    dt, _ = conv(schema)
    return dt


def read_avro_fallback(spark, path: str):
    """Distributed Avro read without the JVM connector: list files via
    the ``binaryFile`` source, decode each container inside
    ``mapInPandas`` (partition-parallel, Arrow-batched), union into a
    DataFrame typed from the first file's writer schema."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)
    # one small driver read types the result; data files decode on
    # executors
    first = files.select("content").first()
    if first is None:
        raise ValueError(f"no Avro files under {path}")
    schema_json, _ = decode_container(bytes(first[0]))
    spark_schema = avro_to_spark_schema(schema_json)
    field_names = [f.name for f in spark_schema.fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for content in pdf["content"]:
                _, records = decode_container(bytes(content))
                rows.extend(records)
            yield pd.DataFrame(rows, columns=field_names)

    return files.select("content").mapInPandas(gen, schema=spark_schema)
