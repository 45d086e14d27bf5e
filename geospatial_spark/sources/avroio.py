"""Minimal pure-Python Avro Object Container File codec.

Exists for ONE consumer: Apache Iceberg manifest lists / manifest files
(`sources/snapshots.IcebergMetadataSource`), which are Avro containers
— and this sandbox ships no Avro library. Implements the subset of the
Avro 1.11 spec those files use, from the public specification:

* container framing: `Obj\\x01` magic, file-metadata map
  (avro.schema JSON + avro.codec), 16-byte sync marker, data blocks of
  (record count, byte size, payload, sync);
* codecs: `null` and `deflate` (raw zlib, windowBits=-15);
* binary encoding: zigzag-varint int/long, IEEE float/double,
  length-prefixed bytes/string, fixed, enum (int index), array & map
  block runs (negative count ⇒ abs count + byte-size follows),
  union (branch index then value), record (fields in writer order);
* named-type references (a field whose type is the name of an earlier
  record/enum/fixed) via a per-read registry.

Decoding is writer-schema-driven only (no reader-schema resolution):
the Iceberg consumer reads whole records and picks fields by name.
Logical types are returned as their underlying primitive. The writer
half exists so tests can round-trip real container bytes without an
external library; it is spec-faithful (one block, optional deflate).

Reference analogue: the datasource updater ships its database as a flat
file with a manifest naming it (GeoIpDataDao.java, shouldUpdate
DatasourceUpdateService.java:282-292); Iceberg's equivalent manifest
chain is what this module decodes.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

MAGIC = b"Obj\x01"

PRIMITIVES = {"null", "boolean", "int", "long", "float", "double",
              "bytes", "string"}


# -- binary primitives -------------------------------------------------


def _read_long(buf: io.BytesIO) -> int:
    """Zigzag varint (Avro int and long share the encoding)."""
    shift, acc = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _write_long(out: io.BytesIO, n: int) -> None:
    n = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("truncated bytes")
    return data


# -- schema-driven decode ----------------------------------------------


class _Types:
    """Named-type registry: records/enums/fixed defined once, referenced
    by (optionally namespaced) name later in the schema."""

    def __init__(self):
        self.by_name: dict[str, dict] = {}

    def define(self, schema: dict) -> None:
        name = schema.get("name")
        if not name:
            return
        ns = schema.get("namespace")
        self.by_name[name] = schema
        if ns:
            self.by_name[f"{ns}.{name}"] = schema

    def resolve(self, schema):
        if isinstance(schema, str) and schema not in PRIMITIVES:
            if schema not in self.by_name:
                raise ValueError(f"unknown named type: {schema}")
            return self.by_name[schema]
        return schema


def _decode(schema, buf: io.BytesIO, types: _Types):
    schema = types.resolve(schema)
    if isinstance(schema, list):  # union
        idx = _read_long(buf)
        if not 0 <= idx < len(schema):
            raise ValueError(f"union index {idx} out of range")
        return _decode(schema[idx], buf, types)
    if isinstance(schema, str):
        t = schema
    else:
        t = schema["type"]
        if t in ("record", "enum", "fixed"):
            types.define(schema)
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) != b"\x00"
    if t in ("int", "long"):
        return _read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return _read_bytes(buf)
    if t == "string":
        return _read_bytes(buf).decode("utf-8")
    if t == "fixed":
        return buf.read(int(schema["size"]))
    if t == "enum":
        return schema["symbols"][_read_long(buf)]
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:  # abs count, preceded-by-byte-size variant
                n = -n
                _read_long(buf)  # byte size (used for skipping; ignored)
            for _ in range(n):
                out.append(_decode(schema["items"], buf, types))
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                _read_long(buf)
            for _ in range(n):
                key = _read_bytes(buf).decode("utf-8")
                out[key] = _decode(schema["values"], buf, types)
    if t == "record":
        return {f["name"]: _decode(f["type"], buf, types)
                for f in schema["fields"]}
    raise ValueError(f"unsupported Avro type: {t!r}")


def _read_meta_map(buf: io.BytesIO) -> dict[str, bytes]:
    out = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            return out
        if n < 0:
            n = -n
            _read_long(buf)
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            out[k] = _read_bytes(buf)


def read_container(data: bytes) -> list[dict]:
    """Decode a whole Avro Object Container File → list of records."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta = _read_meta_map(buf)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported Avro codec: {codec}")
    sync = buf.read(16)
    records: list = []
    types = _Types()
    while True:
        head = buf.read(1)
        if not head:
            return records
        buf.seek(-1, io.SEEK_CUR)
        count = _read_long(buf)
        size = _read_long(buf)
        payload = buf.read(size)
        if len(payload) != size:
            raise EOFError("truncated data block")
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        block = io.BytesIO(payload)
        for _ in range(count):
            records.append(_decode(schema, block, types))
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch")


def read_container_file(path) -> list[dict]:
    with open(path, "rb") as f:
        return read_container(f.read())


# -- schema-driven encode (tests + completeness) -----------------------


def _encode(schema, value, out: io.BytesIO, types: _Types) -> None:
    schema = types.resolve(schema)
    if isinstance(schema, list):  # union: first branch the value fits
        for i, branch in enumerate(schema):
            if _fits(types.resolve(branch), value, types):
                _write_long(out, i)
                _encode(branch, value, out, types)
                return
        raise ValueError(f"no union branch for {value!r} in {schema}")
    t = schema if isinstance(schema, str) else schema["type"]
    if isinstance(schema, dict) and t in ("record", "enum", "fixed"):
        types.define(schema)
    if t == "null":
        return
    if t == "boolean":
        out.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        _write_long(out, int(value))
    elif t == "float":
        out.write(struct.pack("<f", value))
    elif t == "double":
        out.write(struct.pack("<d", value))
    elif t == "bytes":
        _write_long(out, len(value))
        out.write(value)
    elif t == "string":
        b = value.encode("utf-8")
        _write_long(out, len(b))
        out.write(b)
    elif t == "fixed":
        out.write(value)
    elif t == "enum":
        _write_long(out, schema["symbols"].index(value))
    elif t == "array":
        if value:
            _write_long(out, len(value))
            for v in value:
                _encode(schema["items"], v, out, types)
        _write_long(out, 0)
    elif t == "map":
        if value:
            _write_long(out, len(value))
            for k, v in value.items():
                kb = k.encode("utf-8")
                _write_long(out, len(kb))
                out.write(kb)
                _encode(schema["values"], v, out, types)
        _write_long(out, 0)
    elif t == "record":
        for f in schema["fields"]:
            _encode(f["type"], value[f["name"]], out, types)
    else:
        raise ValueError(f"unsupported Avro type: {t!r}")


def _fits(schema, value, types: _Types) -> bool:
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return value is None
    if value is None:
        return False
    if t in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if t == "boolean":
        return isinstance(value, bool)
    if t in ("float", "double"):
        return isinstance(value, (int, float))
    if t in ("bytes", "fixed"):
        return isinstance(value, bytes)
    if t in ("string", "enum"):
        return isinstance(value, str)
    if t == "array":
        return isinstance(value, list)
    if t in ("map", "record"):
        return isinstance(value, dict)
    return True


def write_container(schema: dict, records: list, codec: str = "deflate",
                    sync: bytes = b"\x00" * 16) -> bytes:
    """Encode records as one Avro container block (enough for tests and
    manifest-sized files; real writers chunk into many blocks)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported Avro codec: {codec}")
    types = _Types()
    body = io.BytesIO()
    for r in records:
        _encode(schema, r, body, types)
    payload = body.getvalue()
    if codec == "deflate":
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)
        payload = comp.compress(body.getvalue()) + comp.flush()
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode()}
    _write_long(out, len(meta))
    for k, v in meta.items():
        kb = k.encode()
        _write_long(out, len(kb))
        out.write(kb)
        _write_long(out, len(v))
        out.write(v)
    _write_long(out, 0)
    out.write(sync)
    _write_long(out, len(records))
    _write_long(out, len(payload))
    out.write(payload)
    out.write(sync)
    return out.getvalue()


def write_container_file(path, schema: dict, records: list,
                         codec: str = "deflate") -> None:
    with open(path, "wb") as f:
        f.write(write_container(schema, records, codec))
