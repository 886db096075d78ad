"""Protobuf (proto3) object model — writer + reader, from scratch.

Implements the public Protocol Buffers wire format (developers.google.com
protobuf encoding docs): tag = (field_number << 3) | wire_type; wire types
0 = varint, 1 = 64-bit LE, 2 = length-delimited, 5 = 32-bit LE. Streams use
the standard *delimited* framing (``writeDelimitedTo``/``parseDelimitedFrom``
convention: uvarint message length before each message), and the schema
ships as a generated ``.proto`` source file next to the data — protobuf's
own schema transport.

Reference parity: parquet-java binds protobuf messages to parquet via
parquet-protobuf (ProtoParquetWriter.java / ProtoSchemaConverter.java /
ProtoWriteSupport.java); this module is the same object-model surface for
pq_engine — columns <-> proto3 messages — built directly on the wire spec
because no protobuf library exists in this container.

Type mapping (ptype -> proto3 field):
    int64 -> sint64 (zigzag varint: negative values stay small, unlike
    int64's 10-byte two's-complement varints)    int32 -> sint32
    float64 -> double    float32 -> float    bool -> bool
    string -> string     binary -> bytes
    date32 -> sint32 (days, comment)   timestamp(_ntz)_us -> sint64 (micros)
    decimal64[p,s] -> sint64 (unscaled, comment)   uuid -> bytes (16)
Nullability uses proto3 explicit field presence (``optional``): null rows
OMIT the field from the wire; present rows always emit it (even zeros) —
exact null round-trips, the same contract ProtoWriteSupport keeps via
parquet OPTIONAL fields.

The ENCODER is fully vectorized (batch varints + the same ragged interleave
scatter the Avro writer uses — no per-row Python). The READER is a compact
per-record walk for verification/import — an interop surface, not a hot
path (same stance as avro.py / variant_binary.py).
"""

from __future__ import annotations

import numpy as np

from ..kernels.ragged import RaggedBytes
from .avro import zigzag_varint_batch

_WT_VARINT, _WT_I64, _WT_LEN, _WT_I32 = 0, 1, 2, 5

_PROTO_TYPE = {
    "int64": "sint64", "int32": "sint32", "float64": "double",
    "float32": "float", "bool": "bool", "string": "string",
    "binary": "bytes", "date32": "sint32", "timestamp_us": "sint64",
    "timestamp_ntz_us": "sint64", "uuid": "bytes",
}


def _wire_type(ptype: str) -> int:
    if ptype in ("float64",):
        return _WT_I64
    if ptype in ("float32",):
        return _WT_I32
    if ptype in ("string", "binary", "uuid"):
        return _WT_LEN
    return _WT_VARINT  # sint32/sint64/bool/decimal64


# ---------------------------------------------------------------- varints


def uvarint_batch(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Batch UNSIGNED LEB128 varints (protobuf lengths and tags) ->
    (lens int64[n], data uint8[total]); vectorized like the zigzag batch."""
    z = np.ascontiguousarray(v, dtype=np.uint64)
    n = len(z)
    nb = np.ones(n, dtype=np.int64)
    for k in range(1, 10):
        nb += (z >= (np.uint64(1) << np.uint64(7 * k))).astype(np.int64)
    total = int(nb.sum())
    out = np.zeros(total, dtype=np.uint8)
    off = np.zeros(n, dtype=np.int64)
    if n > 1:
        np.cumsum(nb[:-1], out=off[1:])
    for k in range(10):
        sel = nb > k
        if not sel.any():
            break
        chunk = ((z[sel] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nb[sel] > k + 1).astype(np.uint8) << 7
        out[off[sel] + k] = chunk | cont
    return nb, out


def _scalar_uvarint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            return bytes(out)


def read_uvarint(buf, pos: int) -> tuple[int, int]:
    shift = out = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not (b & 0x80):
            return out, pos
        shift += 7
        if shift > 70:
            raise ValueError("uvarint too long")


# ---------------------------------------------------------------- schema


def proto_schema(name: str, cols: list[dict]) -> str:
    """Generated .proto source for the table — protobuf's schema transport.
    Field numbers are 1-based column positions."""
    lines = ['syntax = "proto3";', "", f"message {name} {{"]
    for i, c in enumerate(cols, start=1):
        pt = c["ptype"]
        if pt.startswith("decimal64["):
            p, s = pt.split("[", 1)[1][:-1].split(",")
            comment = f"  // decimal({p},{s}) unscaled"
            wire = "sint64"
        elif pt == "date32":
            comment = "  // days since epoch"
            wire = "sint32"
        elif pt in ("timestamp_us", "timestamp_ntz_us"):
            comment = "  // microseconds since epoch" + (
                " (local)" if pt == "timestamp_ntz_us" else ""
            )
            wire = "sint64"
        elif pt == "uuid":
            comment = "  // uuid (16 bytes)"
            wire = "bytes"
        else:
            comment = ""
            wire = _PROTO_TYPE[pt]
        opt = "optional " if c.get("nullable") else ""
        lines.append(f"  {opt}{wire} {c['name']} = {i};{comment}")
    lines.append("}")
    return "\n".join(lines) + "\n"


def parse_proto_schema(src: str) -> tuple[str, list[dict]]:
    """Parse the subset of .proto this module generates ->
    (message name, [{name, proto_type, number, optional}])."""
    import re

    m = re.search(r"message\s+(\w+)\s*\{(.*?)\}", src, re.S)
    if not m:
        raise ValueError("no message block in .proto source")
    fields = []
    for line in m.group(2).splitlines():
        line = line.split("//")[0].strip()
        fm = re.match(r"(optional\s+)?(\w+)\s+(\w+)\s*=\s*(\d+);", line)
        if fm:
            fields.append({
                "name": fm.group(3), "proto_type": fm.group(2),
                "number": int(fm.group(4)), "optional": bool(fm.group(1)),
            })
    return m.group(1), fields


# ---------------------------------------------------------------- encode


def _encode_values_dense(ptype: str, values) -> tuple[np.ndarray, np.ndarray]:
    """Payload bytes per row (no tag), kernel value forms."""
    if ptype in ("int64", "int32", "timestamp_us", "timestamp_ntz_us",
                 "date32") or ptype.startswith("decimal64["):
        nb, data = zigzag_varint_batch(np.asarray(values, dtype=np.int64))
        return nb.astype(np.int64), data
    if ptype in ("float64", "float32"):
        w = 8 if ptype == "float64" else 4
        dt = "<f8" if ptype == "float64" else "<f4"
        arr = np.ascontiguousarray(values, dtype=dt).view(np.uint8)
        return np.full(len(values), w, dtype=np.int64), arr.reshape(-1)
    if ptype == "bool":
        b = np.asarray(values, dtype=bool).astype(np.uint8)
        return np.ones(len(b), dtype=np.int64), b
    if ptype == "uuid":
        arr = np.ascontiguousarray(values, dtype=np.uint8).reshape(-1, 16)
        n = len(arr)
        values = RaggedBytes(np.arange(n + 1, dtype=np.int64) * 16, arr.reshape(-1))
        ptype = "binary"
    if ptype in ("string", "binary"):
        col = values  # RaggedBytes
        ln, ldata = uvarint_batch(col.lengths.astype(np.int64))
        lens = ln + col.lengths
        total = int(lens.sum())
        out = np.zeros(total, dtype=np.uint8)
        off = np.zeros(len(col) + 1, dtype=np.int64)
        np.cumsum(lens, out=off[1:])
        tl = int(ln.sum())
        pos = np.repeat(off[:-1] - (np.cumsum(ln) - ln), ln) + np.arange(
            tl, dtype=np.int64
        )
        out[pos] = ldata
        tp = int(col.lengths.sum())
        if tp:
            pos = np.repeat(
                off[:-1] + ln - col.offsets[:-1], col.lengths
            ) + np.arange(tp, dtype=np.int64)
            out[pos] = col.data
        return lens, out
    raise TypeError(f"ptype {ptype!r} has no protobuf encoder")


def _encode_field(field_number: int, ptype: str, values, validity):
    """(lens int64[n_rows], data uint8): tag + payload per row; null rows
    encode to ZERO bytes (proto3 field presence: absent = null)."""
    tag = _scalar_uvarint((field_number << 3) | _wire_type(ptype))
    tag_arr = np.frombuffer(tag, dtype=np.uint8)
    v_lens, v_data = _encode_values_dense(ptype, values)
    nv = len(v_lens)
    # dense (all present): tag prepended to every row's payload
    tagged_lens = v_lens + len(tag)
    tagged = np.zeros(int(tagged_lens.sum()), dtype=np.uint8)
    off = np.zeros(nv + 1, dtype=np.int64)
    np.cumsum(tagged_lens, out=off[1:])
    for k in range(len(tag)):
        tagged[off[:-1] + k] = tag_arr[k]
    tv = int(v_lens.sum())
    if tv:
        pos = np.repeat(
            off[:-1] + len(tag) - (np.cumsum(v_lens) - v_lens), v_lens
        ) + np.arange(tv, dtype=np.int64)
        tagged[pos] = v_data
    if validity is None:
        return tagged_lens, tagged
    # expand to full row count: null rows get length 0
    validity = np.asarray(validity, dtype=bool)
    n = len(validity)
    lens = np.zeros(n, dtype=np.int64)
    lens[validity] = tagged_lens
    out_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=out_off[1:])
    out = np.zeros(int(out_off[-1]), dtype=np.uint8)
    t = int(tagged_lens.sum())
    if t:
        pos = np.repeat(
            out_off[:-1][validity] - off[:-1], tagged_lens
        ) + np.arange(t, dtype=np.int64)
        out[pos] = tagged
    return lens, out


def _interleave(fields: list[tuple[np.ndarray, np.ndarray]],
                length_prefixed: bool = True) -> bytes:
    """Row-major interleave of per-field (lens, data) into the delimited
    stream: uvarint(message length) + message bytes per row."""
    if not fields:
        return b""
    n = len(fields[0][0])
    lens_mat = np.stack([f[0] for f in fields])
    msg_lens = lens_mat.sum(axis=0)
    parts = []
    if length_prefixed:
        pl, pdata = uvarint_batch(msg_lens)
        parts.append((pl, pdata))
    parts.extend(fields)
    row_lens = msg_lens + (parts[0][0] if length_prefixed else 0)
    row_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(row_lens, out=row_off[1:])
    out = np.zeros(int(row_off[-1]), dtype=np.uint8)
    prefix = np.zeros(n, dtype=np.int64)
    for (lens, data) in parts:
        start = row_off[:-1] + prefix
        t = int(lens.sum())
        if t:
            pos = np.repeat(start - (np.cumsum(lens) - lens), lens) + np.arange(
                t, dtype=np.int64
            )
            out[pos] = data
        prefix += lens
    return out.tobytes()


def write_protobuf(path: str, name: str, cols: list[dict], n_rows: int) -> str:
    """cols: [{name, ptype, values, validity}] (kernel form: values hold the
    NON-NULL entries when validity is given). Writes ``path`` (delimited
    proto3 messages) and ``path + '.proto'`` (the schema). Returns the
    schema path."""
    fields = []
    for i, c in enumerate(cols, start=1):
        fields.append(_encode_field(i, c["ptype"], c["values"], c.get("validity")))
        if len(fields[-1][0]) != n_rows:
            raise ValueError(
                f"column {c['name']}: {len(fields[-1][0])} rows != {n_rows}"
            )
    with open(path, "wb") as f:
        f.write(_interleave(fields))
    schema_path = path + ".proto"
    with open(schema_path, "w") as f:
        f.write(proto_schema(name, [
            {"name": c["name"], "ptype": c["ptype"],
             "nullable": c.get("validity") is not None}
            for c in cols
        ]))
    return schema_path


# ---------------------------------------------------------------- decode


def _skip_field(buf, pos: int, wt: int) -> int:
    if wt == _WT_VARINT:
        return read_uvarint(buf, pos)[1]
    if wt == _WT_I64:
        return pos + 8
    if wt == _WT_I32:
        return pos + 4
    if wt == _WT_LEN:
        ln, pos = read_uvarint(buf, pos)
        return pos + ln
    raise ValueError(f"unsupported wire type {wt}")


def _decode_scalar(buf, pos: int, proto_type: str):
    import struct

    if proto_type in ("sint32", "sint64"):
        u, pos = read_uvarint(buf, pos)
        return (u >> 1) ^ -(u & 1), pos
    if proto_type in ("int32", "int64", "uint32", "uint64"):
        return read_uvarint(buf, pos)
    if proto_type == "bool":
        u, pos = read_uvarint(buf, pos)
        return bool(u), pos
    if proto_type == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if proto_type == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if proto_type in ("string", "bytes"):
        ln, pos = read_uvarint(buf, pos)
        raw = bytes(buf[pos : pos + ln])
        if len(raw) != ln:
            raise ValueError("protobuf length-delimited field truncated")
        return (raw.decode("utf-8") if proto_type == "string" else raw), pos + ln
    raise ValueError(f"unsupported proto type {proto_type!r}")


def read_protobuf(path: str, schema_path: str | None = None):
    """Read a delimited proto3 stream + its .proto schema ->
    (message name, fields, records: list[dict]). Unknown field numbers are
    skipped by wire type (protobuf's forward-compat rule); absent optional
    fields decode as None, absent non-optional as the proto3 default."""
    if schema_path is None:
        schema_path = path + ".proto"
    with open(schema_path) as f:
        name, fields = parse_proto_schema(f.read())
    by_num = {f["number"]: f for f in fields}
    defaults = {
        "sint32": 0, "sint64": 0, "int32": 0, "int64": 0, "bool": False,
        "double": 0.0, "float": 0.0, "string": "", "bytes": b"",
    }
    with open(path, "rb") as f:
        buf = f.read()
    records = []
    pos = 0
    while pos < len(buf):
        mlen, pos = read_uvarint(buf, pos)
        end = pos + mlen
        if end > len(buf):
            raise ValueError("protobuf delimited stream truncated")
        rec = {
            f["name"]: (None if f["optional"] else defaults[f["proto_type"]])
            for f in fields
        }
        while pos < end:
            key, pos = read_uvarint(buf, pos)
            fn, wt = key >> 3, key & 0x7
            fld = by_num.get(fn)
            if fld is None:
                pos = _skip_field(buf, pos, wt)
                continue
            v, pos = _decode_scalar(buf, pos, fld["proto_type"])
            rec[fld["name"]] = v
        if pos != end:
            raise ValueError("protobuf message overran its length prefix")
        records.append(rec)
    return name, fields, records
