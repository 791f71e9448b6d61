"""Minimal Avro object-container reader/writer (stdlib-only).

Iceberg table metadata is JSON, but the snapshot -> data-file indirection
(manifest lists and manifests) is Avro — and this sandbox ships neither the
Iceberg runtime jars nor an Avro library. Avro object container files embed
their full schema in the header, so a generic schema-driven binary decoder
can read ANY manifest without knowing Iceberg's schemas in advance; that is
what lets sources/iceberg.py resolve a static Iceberg table's current data
files in pure Python (no JVM, no catalog — the planner-side metadata walk
a worker-side scan needs).

Supported: the full Avro 1.x binary encoding — null/boolean/int/long/
float/double/bytes/string, record/enum/array/map/union/fixed, named-type
references, and the 'null'/'deflate' codecs. Logical types are returned as
their underlying primitives. The writer exists for tests and fixtures; the
decoder's varint/zigzag primitives are pinned against the byte examples in
the Avro specification (tests/test_avro_lite.py), not against the writer.

Format reference: Apache Avro specification, "Object Container Files" and
"Binary Encoding" (public documentation).
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

__all__ = ["read_container", "write_container", "zigzag_decode", "zigzag_encode"]

_MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _read_varint(buf: io.BufferedIOBase) -> int:
    """Unsigned LEB128 varint."""
    shift = 0
    out = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        v = b[0]
        out |= (v & 0x7F) << shift
        if not v & 0x80:
            return out
        shift += 7


def zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def zigzag_encode(n: int) -> int:
    # python's arithmetic shift keeps the sign: n >> 63 is 0 for n >= 0 and
    # -1 (all ones) for n < 0, exactly the zigzag mask
    return (n << 1) ^ (n >> 63)


def _read_long(buf) -> int:
    return zigzag_decode(_read_varint(buf))


def _read_bytes(buf) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("truncated bytes")
    return data


# ---------------------------------------------------------------------------
# schema-driven decode
# ---------------------------------------------------------------------------


def _decode(schema, buf, named: dict):
    if isinstance(schema, str):
        t = schema
        if t in named:  # named-type reference
            return _decode(named[t], buf, named)
        if t == "null":
            return None
        if t == "boolean":
            b = buf.read(1)
            if not b:
                raise EOFError("truncated boolean")
            return b != b"\x00"
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
        raise ValueError(f"unknown avro type {t!r}")
    if isinstance(schema, list):  # union: zigzag branch index
        idx = _read_long(buf)
        return _decode(schema[idx], buf, named)
    t = schema["type"]
    if t in ("record", "error"):
        _register(schema, named)
        return {
            f["name"]: _decode(f["type"], buf, named)
            for f in schema["fields"]
        }
    if t == "enum":
        _register(schema, named)
        return schema["symbols"][_read_long(buf)]
    if t == "fixed":
        _register(schema, named)
        return buf.read(schema["size"])
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix
                n = -n
                _read_long(buf)
            for _ in range(n):
                out.append(_decode(schema["items"], buf, named))
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
                k = _read_bytes(buf).decode("utf-8")
                out[k] = _decode(schema["values"], buf, named)
    # wrapped primitive/named reference ({"type": "long", ...})
    return _decode(t, buf, named)


def _register(schema: dict, named: dict) -> None:
    name = schema.get("name")
    if not name:
        return
    ns = schema.get("namespace")
    named[name] = schema
    if ns:
        named[f"{ns}.{name}"] = schema


def _collect_named(schema, named: dict) -> None:
    """Pre-register named types so references that appear before their
    definitions in reading order still resolve."""
    if isinstance(schema, list):
        for s in schema:
            _collect_named(s, named)
    elif isinstance(schema, dict):
        t = schema.get("type")
        if t in ("record", "error", "enum", "fixed"):
            _register(schema, named)
        if t in ("record", "error"):
            for f in schema["fields"]:
                _collect_named(f["type"], named)
        elif t == "array":
            _collect_named(schema["items"], named)
        elif t == "map":
            _collect_named(schema["values"], named)
        elif isinstance(t, (dict, list)):
            _collect_named(t, named)


def read_schema(path) -> dict:
    """The container's embedded writer schema from the HEADER alone —
    magic + metadata map, no block is decompressed or decoded (Avro's
    self-describing property makes schema discovery O(KB) however large
    the file)."""
    with open(os.fspath(path), "rb") as fh:
        head = fh.read(64 * 1024)  # header is a handful of bytes
        buf = io.BytesIO(head)
        if buf.read(4) != _MAGIC:
            raise ValueError("not an Avro object container file")
        try:
            meta = _decode({"type": "map", "values": "bytes"}, buf, {})
        except Exception:
            # pathological header larger than the probe: read it all
            buf = io.BytesIO(head + fh.read())
            buf.read(4)
            meta = _decode({"type": "map", "values": "bytes"}, buf, {})
    return json.loads(meta["avro.schema"])


def read_container(path_or_bytes) -> tuple[dict, list]:
    """Read an Avro object container file -> (schema, records)."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        buf = io.BytesIO(bytes(path_or_bytes))
    else:
        buf = io.BytesIO(open(os.fspath(path_or_bytes), "rb").read())
    if buf.read(4) != _MAGIC:
        raise ValueError("not an Avro object container file")
    meta = _decode({"type": "map", "values": "bytes"}, buf, {})
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    sync = buf.read(16)
    named: dict = {}
    _collect_named(schema, named)
    records = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, 1)
        n_rec = _read_long(buf)
        block = _read_bytes(buf)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        bbuf = io.BytesIO(block)
        # one shared registry: _collect_named pre-registered every named
        # type, and _register during decode only re-adds identical
        # definitions, so no per-record copy is needed
        for _ in range(n_rec):
            records.append(_decode(schema, bbuf, named))
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt container)")
    return schema, records


# ---------------------------------------------------------------------------
# writer (tests / fixtures)
# ---------------------------------------------------------------------------


def _write_varint(out: bytearray, n: int) -> None:
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _write_long(out: bytearray, n: int) -> None:
    _write_varint(out, zigzag_encode(n))


def _write_bytes(out: bytearray, b: bytes) -> None:
    _write_long(out, len(b))
    out.extend(b)


def _branch_accepts(schema, value, named: dict, promote: bool = False) -> bool:
    """Whether a union branch's type matches the python value's type.
    With ``promote`` the Avro numeric promotions apply (int -> float/
    double) — checked only after no branch matches exactly, so
    ['null','long','double'] still routes ints to 'long'."""
    tname = schema if isinstance(schema, str) else schema.get("type")
    if tname in named and isinstance(tname, str) and tname not in (
        "null", "boolean", "int", "long", "float", "double", "bytes",
        "string", "record", "error", "enum", "fixed", "array", "map",
    ):
        return _branch_accepts(named[tname], value, named, promote)
    if value is None:
        return tname == "null"
    if isinstance(value, bool):
        return tname == "boolean"
    if isinstance(value, int):
        if tname in ("int", "long"):
            return True
        return promote and tname in ("float", "double")
    if isinstance(value, float):
        return tname in ("float", "double")
    if isinstance(value, str):
        return tname in ("string", "enum")
    if isinstance(value, (bytes, bytearray)):
        return tname in ("bytes", "fixed")
    if isinstance(value, dict):
        if tname == "map":
            return True
        if tname in ("record", "error"):
            # disambiguate record branches (and record-vs-map when the
            # record comes FIRST) by the exact field-name set
            return set(value.keys()) == {f["name"] for f in schema["fields"]}
        return False
    if isinstance(value, (list, tuple)):
        return tname == "array"
    return False


def _encode(schema, value, out: bytearray, named: dict) -> None:
    if isinstance(schema, str):
        t = schema
        if t in named:
            return _encode(named[t], value, out, named)
        if t == "null":
            return
        if t == "boolean":
            out.append(1 if value else 0)
        elif t in ("int", "long"):
            _write_long(out, int(value))
        elif t == "float":
            out.extend(struct.pack("<f", value))
        elif t == "double":
            out.extend(struct.pack("<d", value))
        elif t == "bytes":
            _write_bytes(out, bytes(value))
        elif t == "string":
            _write_bytes(out, value.encode("utf-8"))
        else:
            raise ValueError(f"unknown avro type {t!r}")
        return
    if isinstance(schema, list):  # union: pick the branch matching the
        # VALUE'S TYPE (first-non-null would mis-encode multi-branch
        # unions); numeric promotion (int -> double) only as a second pass
        # so an exact branch always wins
        for promote in (False, True):
            for i, s in enumerate(schema):
                if _branch_accepts(s, value, named, promote):
                    _write_long(out, i)
                    if value is not None:
                        if promote and isinstance(value, int):
                            value = float(value)
                        _encode(s, value, out, named)
                    return
        raise ValueError(f"no union branch accepts {type(value).__name__}")
    t = schema["type"]
    if t in ("record", "error"):
        _register(schema, named)
        for f in schema["fields"]:
            # a record decoded under an OLDER writer schema legitimately
            # lacks fields added since; fill the schema default (standard
            # Avro writer behavior) so carried-verbatim manifest entries
            # re-encode under the current schema
            if f["name"] in value:
                v = value[f["name"]]
            elif "default" in f:
                v = f["default"]
            else:
                raise KeyError(
                    f"record missing field {f['name']!r} with no default"
                )
            _encode(f["type"], v, out, named)
    elif t == "enum":
        _write_long(out, schema["symbols"].index(value))
    elif t == "fixed":
        out.extend(value)
    elif t == "array":
        if value:
            _write_long(out, len(value))
            for v in value:
                _encode(schema["items"], v, out, named)
        _write_long(out, 0)
    elif t == "map":
        if value:
            _write_long(out, len(value))
            for k, v in value.items():
                _write_bytes(out, k.encode("utf-8"))
                _encode(schema["values"], v, out, named)
        _write_long(out, 0)
    else:
        _encode(t, value, out, named)


def write_container(path, schema, records, codec: str = "deflate") -> None:
    named: dict = {}
    _collect_named(schema, named)
    body = bytearray()
    for rec in records:
        _encode(schema, rec, body, named)
    block = zlib.compress(bytes(body))[2:-4] if codec == "deflate" else bytes(body)
    out = bytearray(_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode())
        _write_bytes(out, v)
    _write_long(out, 0)
    sync = b"\x00" * 16
    out.extend(sync)
    _write_long(out, len(records))
    _write_bytes(out, block)
    out.extend(sync)
    with open(os.fspath(path), "wb") as f:
        f.write(bytes(out))
