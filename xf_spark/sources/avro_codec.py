"""Minimal Avro object-container-file codec (pure Python, stdlib only).

Iceberg's table metadata is JSON, but its manifest lists and manifest
files are Avro container files (Apache Avro 1.11 spec, public). This
sandbox has no Avro python package and no Iceberg runtime jar, so the
pure-Python Iceberg layer (`sources/iceberg.py`) carries its own codec.

Scope: exactly the Avro feature set Iceberg manifests use —
records, optional fields as ``["null", T]`` unions, string / bytes /
int / long / boolean / float / double, arrays of records, and the
``null`` + ``deflate`` block codecs. Schema resolution is writer-schema
only (we always decode with the schema embedded in the file, per spec).

This is METADATA-plane code: manifests are KB-to-MB scale and are read
once per query plan on the driver. The data plane stays Spark's native
parquet reader — nothing here touches row data.

Spec: https://avro.apache.org/docs/1.11.1/specification/ (public).
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"

# ---------------------------------------------------------------------------
# primitive encode/decode (zigzag varints per the Avro spec)
# ---------------------------------------------------------------------------


def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_long(buf: io.BytesIO, n: int) -> None:
    z = _zigzag_encode(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            return


def _read_long(buf: io.BufferedIOBase) -> int:
    shift = 0
    acc = 0
    while True:
        raw = buf.read(1)
        if not raw:
            raise EOFError("truncated varint")
        b = raw[0]
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            return _zigzag_decode(acc)
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _write_bytes(buf: io.BytesIO, data: bytes) -> None:
    _write_long(buf, len(data))
    buf.write(data)


def _read_n(buf: io.BufferedIOBase, n: int) -> bytes:
    data = buf.read(n)
    if len(data) != n:
        raise EOFError(f"expected {n} bytes, got {len(data)}")
    return data


def _read_bytes(buf: io.BufferedIOBase) -> bytes:
    return _read_n(buf, _read_long(buf))


# ---------------------------------------------------------------------------
# schema-driven value encode/decode
# ---------------------------------------------------------------------------


def _type_of(schema) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


def _encode(buf: io.BytesIO, schema, value) -> None:
    t = _type_of(schema)
    if t == "union":
        # Iceberg manifests only use ["null", T] option unions
        branches = schema
        if value is None:
            idx = next(
                i for i, b in enumerate(branches) if _type_of(b) == "null"
            )
            _write_long(buf, idx)
            return
        idx, branch = next(
            (i, b) for i, b in enumerate(branches) if _type_of(b) != "null"
        )
        _write_long(buf, idx)
        _encode(buf, branch, value)
    elif t == "null":
        return
    elif t == "boolean":
        buf.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        _write_long(buf, int(value))
    elif t == "float":
        buf.write(struct.pack("<f", float(value)))
    elif t == "double":
        buf.write(struct.pack("<d", float(value)))
    elif t == "string":
        _write_bytes(buf, value.encode("utf-8"))
    elif t == "bytes":
        _write_bytes(buf, bytes(value))
    elif t == "fixed":
        data = bytes(value)
        if len(data) != schema["size"]:
            raise ValueError("fixed size mismatch")
        buf.write(data)
    elif t == "record":
        for field in schema["fields"]:
            _encode(buf, field["type"], value[field["name"]])
    elif t == "array":
        items = list(value)
        if items:
            _write_long(buf, len(items))
            for item in items:
                _encode(buf, schema["items"], item)
        _write_long(buf, 0)
    elif t == "map":
        entries = dict(value)
        if entries:
            _write_long(buf, len(entries))
            for k, v in entries.items():
                _write_bytes(buf, k.encode("utf-8"))
                _encode(buf, schema["values"], v)
        _write_long(buf, 0)
    else:
        raise ValueError(f"unsupported Avro type: {t!r}")


def _decode(buf: io.BufferedIOBase, schema):
    t = _type_of(schema)
    if t == "union":
        idx = _read_long(buf)
        return _decode(buf, schema[idx])
    if t == "null":
        return None
    if t == "boolean":
        return _read_n(buf, 1) != b"\x00"
    if t in ("int", "long"):
        return _read_long(buf)
    if t == "float":
        return struct.unpack("<f", _read_n(buf, 4))[0]
    if t == "double":
        return struct.unpack("<d", _read_n(buf, 8))[0]
    if t == "string":
        return _read_bytes(buf).decode("utf-8")
    if t == "bytes":
        return _read_bytes(buf)
    if t == "fixed":
        return _read_n(buf, schema["size"])
    if t == "record":
        return {f["name"]: _decode(buf, f["type"]) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            count = _read_long(buf)
            if count == 0:
                return out
            if count < 0:
                # negative block count: followed by byte size (skipped)
                count = -count
                _read_long(buf)
            for _ in range(count):
                out.append(_decode(buf, schema["items"]))
    if t == "map":
        out = {}
        while True:
            count = _read_long(buf)
            if count == 0:
                return out
            if count < 0:
                count = -count
                _read_long(buf)
            for _ in range(count):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = _decode(buf, schema["values"])
    raise ValueError(f"unsupported Avro type: {t!r}")


# ---------------------------------------------------------------------------
# container file read/write
# ---------------------------------------------------------------------------

_FILE_META_SCHEMA = {"type": "map", "values": "bytes"}


def write_avro_file(
    path: str,
    schema: dict,
    records: list[dict],
    codec: str = "deflate",
    metadata: dict[str, bytes] | None = None,
) -> None:
    """Write an Avro object container file (one block, null/deflate)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec: {codec}")
    sync = os.urandom(16)
    meta = {
        "avro.schema": json.dumps(schema).encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
        **(metadata or {}),
    }
    body = io.BytesIO()
    for rec in records:
        _encode(body, schema, rec)
    payload = body.getvalue()
    if codec == "deflate":
        # deflate codec = raw zlib stream without header/checksum
        payload = zlib.compress(payload)[2:-4]
    out = io.BytesIO()
    out.write(MAGIC)
    _encode(out, _FILE_META_SCHEMA, meta)
    out.write(sync)
    if records:
        _write_long(out, len(records))
        _write_long(out, len(payload))
        out.write(payload)
        out.write(sync)
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(out.getvalue())
    os.replace(tmp, path)


def read_avro_file(path: str) -> tuple[dict, list[dict]]:
    """Read an Avro object container file -> (schema, records)."""
    with open(path, "rb") as fh:
        if fh.read(4) != MAGIC:
            raise ValueError(f"not an Avro container file: {path}")
        meta = _decode(fh, _FILE_META_SCHEMA)
        schema = json.loads(meta["avro.schema"].decode("utf-8"))
        codec = meta.get("avro.codec", b"null").decode("utf-8")
        if codec not in ("null", "deflate"):
            raise ValueError(f"unsupported codec in {path}: {codec}")
        sync = _read_n(fh, 16)
        records: list[dict] = []
        while True:
            try:
                count = _read_long(fh)
            except EOFError:
                return schema, records
            size = _read_long(fh)
            payload = _read_n(fh, size)
            if codec == "deflate":
                payload = zlib.decompress(payload, wbits=-15)
            block = io.BytesIO(payload)
            for _ in range(count):
                records.append(_decode(block, schema))
            if _read_n(fh, 16) != sync:
                raise ValueError(f"sync marker mismatch in {path}")
