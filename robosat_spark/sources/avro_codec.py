"""From-scratch Apache Avro object-container-file codec.

The subset the Apache Iceberg table format stores its manifests in:
records, arrays, maps, unions, fixed, and all primitives, with the
``null`` and ``deflate`` block codecs. Implemented directly from the
public Avro 1.11 specification (binary encoding + object container file
framing) — there is no avro library in this environment, and the Iceberg
connector (``sources/iceberg.py``) needs real manifest files, not JSON
stand-ins.

Pure Python and dependency-free on purpose: the functions run on Spark
executors inside ``mapInPandas`` for distributed manifest scans (see
``iceberg.read_manifest_entries_distributed``).

Binary encoding (spec §"Binary Encoding"):
  int/long   zigzag then base-128 varint, little-endian, 7 bits/byte
  float      4-byte IEEE little-endian     double  8-byte IEEE LE
  bytes      long(len) + raw               string  long(len) + UTF-8
  boolean    1 byte                        null    zero bytes
  record     field values in order         fixed   raw bytes
  array/map  blocks: count, items..., 0 terminator (negative count =
             block-size-prefixed variant accepted on read)
  union      long(branch index) + value

Container file (spec §"Object Container Files"): magic ``Obj\\x01``, a
map<bytes> of file metadata (``avro.schema``, ``avro.codec``), a 16-byte
sync marker, then blocks of (record count, byte length, payload, sync).
"""

from __future__ import annotations

import hashlib
import json
import struct
import zlib
from typing import Any

MAGIC = b"Obj\x01"

# ---------------------------------------------------------------------------
# primitive encoders / decoders
# ---------------------------------------------------------------------------


def _write_varint(out: bytearray, u: int) -> None:
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def write_long(out: bytearray, n: int) -> None:
    # zigzag on arbitrary-precision ints: Python's >> is arithmetic, so
    # mask to 64 bits after the shift-xor exactly as the spec's int64 math
    z = ((n << 1) ^ (n >> 63)) & 0xFFFFFFFFFFFFFFFF
    _write_varint(out, z)


def write_bytes(out: bytearray, b: bytes) -> None:
    write_long(out, len(b))
    out.extend(b)


def write_string(out: bytearray, s: str) -> None:
    write_bytes(out, s.encode("utf-8"))


class Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise EOFError("truncated avro data")
        self.pos += n
        return b

    def read_long(self) -> int:
        shift = 0
        u = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            u |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        # un-zigzag
        return (u >> 1) ^ -(u & 1)

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())

    def read_string(self) -> str:
        return self.read_bytes().decode("utf-8")


# ---------------------------------------------------------------------------
# schema-driven encode / decode
# ---------------------------------------------------------------------------

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


def _resolve(schema: Any, names: dict) -> Any:
    """Named-type references ("r102") resolve to their definition."""
    if isinstance(schema, str) and schema not in _PRIMITIVES:
        return names[schema]
    return schema


def _register(schema: Any, names: dict) -> None:
    """Walk a schema, registering named records/fixed/enums."""
    if isinstance(schema, list):
        for s in schema:
            _register(s, names)
        return
    if not isinstance(schema, dict):
        return
    t = schema.get("type")
    if t in ("record", "fixed", "enum") and "name" in schema:
        names[schema["name"]] = schema
    if t == "record":
        for f in schema.get("fields", []):
            _register(f["type"], names)
    elif t == "array":
        _register(schema.get("items"), names)
    elif t == "map":
        _register(schema.get("values"), names)


def _union_branch(schema: list, value: Any) -> int:
    """Pick the union branch for a Python value: None -> the null branch,
    anything else -> the first non-null branch (Iceberg unions are always
    optional-field ``["null", X]`` shapes)."""
    for i, s in enumerate(schema):
        if (s == "null") == (value is None):
            return i
    raise ValueError(f"no union branch for {value!r} in {schema!r}")


def encode(out: bytearray, value: Any, schema: Any, names: dict) -> None:
    schema = _resolve(schema, names)
    if isinstance(schema, list):
        idx = _union_branch(schema, value)
        write_long(out, idx)
        encode(out, value, schema[idx], names)
        return
    t = schema["type"] if isinstance(schema, dict) else schema
    if isinstance(t, (dict, list)):  # {"type": {"type": "array", ...}}
        encode(out, value, t, names)
        return
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if value else 0)
    elif t in ("int", "long"):
        write_long(out, int(value))
    elif t == "float":
        out.extend(struct.pack("<f", float(value)))
    elif t == "double":
        out.extend(struct.pack("<d", float(value)))
    elif t == "bytes":
        write_bytes(out, bytes(value))
    elif t == "string":
        write_string(out, value)
    elif t == "fixed":
        if len(value) != schema["size"]:
            raise ValueError("fixed size mismatch")
        out.extend(value)
    elif t == "record":
        for f in schema["fields"]:
            try:
                encode(out, value.get(f["name"]), f["type"], names)
            except Exception as e:  # surface WHICH field broke
                raise ValueError(f"field {f['name']!r}: {e}") from e
    elif t == "array":
        items = list(value or [])
        if items:
            write_long(out, len(items))
            for it in items:
                encode(out, it, schema["items"], names)
        write_long(out, 0)
    elif t == "map":
        entries = dict(value or {})
        if entries:
            write_long(out, len(entries))
            for k, v in entries.items():
                write_string(out, k)
                encode(out, v, schema["values"], names)
        write_long(out, 0)
    elif t == "enum":
        write_long(out, schema["symbols"].index(value))
    else:
        raise ValueError(f"unsupported avro type {t!r}")


def decode(r: Reader, schema: Any, names: dict) -> Any:
    schema = _resolve(schema, names)
    if isinstance(schema, list):
        return decode(r, schema[r.read_long()], names)
    t = schema["type"] if isinstance(schema, dict) else schema
    if isinstance(t, (dict, list)):
        return decode(r, t, names)
    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) != b"\x00"
    if t in ("int", "long"):
        return r.read_long()
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        return r.read_bytes()
    if t == "string":
        return r.read_string()
    if t == "fixed":
        return r.read(schema["size"])
    if t == "record":
        return {f["name"]: decode(r, f["type"], names) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                return out
            if n < 0:  # block-size-prefixed variant
                n = -n
                r.read_long()
            for _ in range(n):
                out.append(decode(r, schema["items"], names))
    if t == "map":
        out = {}
        while True:
            n = r.read_long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                r.read_long()
            for _ in range(n):
                k = r.read_string()
                out[k] = decode(r, schema["values"], names)
    if t == "enum":
        return schema["symbols"][r.read_long()]
    raise ValueError(f"unsupported avro type {t!r}")


# ---------------------------------------------------------------------------
# object container files
# ---------------------------------------------------------------------------


def write_container(
    schema: dict, records: list, codec: str = "deflate"
) -> bytes:
    """Serialize records to Avro object-container-file bytes."""
    names: dict = {}
    _register(schema, names)
    schema_json = json.dumps(schema)
    out = bytearray()
    out.extend(MAGIC)
    # file metadata map<bytes>
    meta = {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()}
    write_long(out, len(meta))
    for k, v in meta.items():
        write_string(out, k)
        write_bytes(out, v)
    write_long(out, 0)
    # deterministic sync marker (content-derived; no RNG needed)
    sync = hashlib.md5(schema_json.encode() + len(records).to_bytes(8, "little")).digest()
    out.extend(sync)
    if records:
        payload = bytearray()
        for rec in records:
            encode(payload, rec, schema, names)
        data = bytes(payload)
        if codec == "deflate":
            data = zlib.compress(data, 9)[2:-4]  # raw deflate: strip zlib wrapper
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec}")
        write_long(out, len(records))
        write_long(out, len(data))
        out.extend(data)
        out.extend(sync)
    return bytes(out)


def read_container(buf: bytes) -> tuple[dict, list]:
    """Avro object-container-file bytes -> (schema, records)."""
    if buf[:4] != MAGIC:
        raise ValueError("not an avro object container file (bad magic)")
    r = Reader(buf, 4)
    meta: dict[str, bytes] = {}
    while True:
        n = r.read_long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.read_long()
        for _ in range(n):
            k = r.read_string()
            meta[k] = r.read_bytes()
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    names: dict = {}
    _register(schema, names)
    sync = r.read(16)
    records = []
    while r.pos < len(buf):
        count = r.read_long()
        size = r.read_long()
        block = r.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, wbits=-15)
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec}")
        br = Reader(block)
        for _ in range(count):
            records.append(decode(br, schema, names))
        if r.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
    return schema, records


def write_container_file(path: str, schema: dict, records: list, codec: str = "deflate") -> None:
    with open(path, "wb") as f:
        f.write(write_container(schema, records, codec))


def read_container_file(path: str) -> tuple[dict, list]:
    with open(path, "rb") as f:
        return read_container(f.read())
