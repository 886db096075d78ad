"""Avro Object Container File writer + reader, from scratch (no avro lib).

Implements the public Apache Avro 1.11 specification (binary encoding +
object container files): records serialize field-by-field with zigzag-varint
ints/longs, IEEE-LE floats, length-prefixed bytes/strings and varint-branch
unions; the container is ``Obj\\x01`` + a metadata map (``avro.schema`` JSON,
``avro.codec``) + a 16-byte sync marker, then blocks of
(record count, byte size, payload, sync).

Reference parity: parquet-java's parquet-avro module + parquet-cli
ToAvroCommand (/root/reference/parquet-cli/src/main/java/org/apache/parquet/
cli/commands/ToAvroCommand.java) — the one reference CLI surface previously
justified-absent here for lack of an avro library. The ENCODER is fully
vectorized NumPy (batch zigzag varints, ragged interleave scatter — no
per-row Python); the READER is a compact per-record walk used for
verification and import, documented as an interop surface, not a hot path.

Type mapping (ptype → avro):
    int64→long  int32→int  float64→double  float32→float  bool→boolean
    string→string  binary→bytes  date32→int/date
    timestamp_us→long/timestamp-micros
    timestamp_ntz_us→long/local-timestamp-micros
    decimal64[p,s]→fixed(8)/decimal(p,s)  uuid→string/uuid
Nullable columns wrap as ["null", T] unions (branch 0 = null).
"""

from __future__ import annotations

import json
import struct

import numpy as np

from ..kernels.ragged import RaggedBytes

MAGIC = b"Obj\x01"
SYNC = bytes(
    (0x70, 0x71, 0x5F, 0x65, 0x6E, 0x67, 0x69, 0x6E, 0x65, 0x5F,
     0x61, 0x76, 0x72, 0x6F, 0x30, 0x31)
)  # deterministic 16-byte sync marker ("pq_engine_avro01")


# ---------------------------------------------------------------- varints


def zigzag_varint_batch(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Batch zigzag-varint encode int64 → (lens uint8[n], data uint8[total]).
    Ten vectorized rounds (one per possible varint byte), no per-row
    Python."""
    v = np.ascontiguousarray(v, dtype=np.int64)
    n = len(v)
    z = ((v << 1) ^ (v >> 63)).view(np.uint64)
    nb = np.ones(n, dtype=np.int64)
    for k in range(1, 10):
        nb += (z >= (np.uint64(1) << np.uint64(7 * k))).astype(np.int64)
    total = int(nb.sum())
    out = np.zeros(total, dtype=np.uint8)
    off = np.zeros(n, dtype=np.int64)
    np.cumsum(nb[:-1], out=off[1:]) if n > 1 else None
    for k in range(10):
        m = nb > k
        if not m.any():
            break
        byte = ((z[m] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nb[m] - 1 > k).astype(np.uint8) << np.uint8(7)
        out[off[m] + k] = byte | cont
    return nb, out


def read_zigzag(buf, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = int(buf[pos])  # int(): numpy uint8 scalars overflow at shift 63
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (result >> 1) ^ -(result & 1), pos


def _scalar_zigzag(v: int) -> bytes:
    z = (v << 1) ^ (v >> 63) if v < 0 else v << 1
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


# ---------------------------------------------------------------- schema


def avro_schema(name: str, cols: list[dict]) -> dict:
    """cols: [{name, ptype, nullable}] → avro record schema dict."""
    fields = []
    for c in cols:
        t = _avro_type(c["ptype"])
        if c.get("nullable"):
            t = ["null", t]
        fields.append({"name": c["name"], "type": t})
    return {"type": "record", "name": name, "fields": fields}


def _avro_type(ptype: str):
    if ptype == "int64":
        return "long"
    if ptype == "int32":
        return "int"
    if ptype == "float64":
        return "double"
    if ptype == "float32":
        return "float"
    if ptype == "bool":
        return "boolean"
    if ptype == "string":
        return "string"
    if ptype == "binary":
        return "bytes"
    if ptype == "date32":
        return {"type": "int", "logicalType": "date"}
    if ptype == "timestamp_us":
        return {"type": "long", "logicalType": "timestamp-micros"}
    if ptype == "timestamp_ntz_us":
        return {"type": "long", "logicalType": "local-timestamp-micros"}
    if ptype == "uuid":
        return {"type": "string", "logicalType": "uuid"}
    if ptype.startswith("decimal64["):
        p, s = ptype[10:-1].split(",")
        return {
            "type": "fixed", "name": "dec8", "size": 8,
            "logicalType": "decimal", "precision": int(p), "scale": int(s),
        }
    raise TypeError(f"ptype {ptype!r} has no avro mapping")


# ---------------------------------------------------------------- field encode


def _encode_field(ptype: str, values, validity) -> tuple[np.ndarray, np.ndarray]:
    """Per-row encoded bytes for one column → (lens int64[n], data uint8).
    ``values`` holds the NON-NULL values only when validity is given (kernel
    form); rows are expanded so every record gets its bytes (union branch
    included when nullable)."""
    nullable = validity is not None
    n = len(validity) if nullable else (
        len(values) if not isinstance(values, RaggedBytes) else len(values)
    )
    v_lens, v_data = _encode_values_dense(ptype, values)
    if not nullable:
        return v_lens, v_data
    # union: branch varint (1 byte: 0x00 null / 0x02 value) + value bytes
    lens = np.ones(n, dtype=np.int64)
    lens[validity] += v_lens
    total = int(lens.sum())
    out = np.zeros(total, dtype=np.uint8)
    off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=off[1:])
    out[off[:-1]] = np.where(validity, 2, 0).astype(np.uint8)
    # scatter value bytes after each non-null row's branch byte
    voff = off[:-1][validity] + 1
    tv = int(v_lens.sum())
    if tv:
        pos = np.repeat(
            voff - (np.cumsum(v_lens) - v_lens), v_lens
        ) + np.arange(tv, dtype=np.int64)
        out[pos] = v_data
    return lens, out


def _encode_values_dense(ptype: str, values) -> tuple[np.ndarray, np.ndarray]:
    if ptype in ("int64", "int32", "timestamp_us", "timestamp_ntz_us", "date32"):
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
    if ptype in ("string", "binary"):
        col = values  # RaggedBytes
        ln, ldata = zigzag_varint_batch(col.lengths.astype(np.int64))
        lens = ln + col.lengths
        total = int(lens.sum())
        out = np.zeros(total, dtype=np.uint8)
        off = np.zeros(len(col) + 1, dtype=np.int64)
        np.cumsum(lens, out=off[1:])
        # varint prefixes
        tl = int(ln.sum())
        pos = np.repeat(off[:-1] - (np.cumsum(ln) - ln), ln) + np.arange(tl, dtype=np.int64)
        out[pos] = ldata
        # payloads
        tp = int(col.lengths.sum())
        if tp:
            pos = np.repeat(
                off[:-1] + ln - col.offsets[:-1], col.lengths
            ) + np.arange(tp, dtype=np.int64)
            out[pos] = col.data
        return lens, out
    if ptype.startswith("decimal64["):
        arr = np.ascontiguousarray(values, dtype=">i8").view(np.uint8)
        return np.full(len(values), 8, dtype=np.int64), arr.reshape(-1)
    if ptype == "uuid":
        from ..kernels.fixedlen import fixed_to_uuid_strings

        chars = fixed_to_uuid_strings(values)  # (n, 36) uint8
        n = len(chars)
        col = RaggedBytes(
            np.arange(n + 1, dtype=np.int64) * 36, chars.reshape(-1)
        )
        return _encode_values_dense("string", col)
    raise TypeError(f"ptype {ptype!r} has no avro encoder")


def _interleave(fields: list[tuple[np.ndarray, np.ndarray]]) -> bytes:
    """Row-major interleave of per-field (lens, data) → record stream."""
    if not fields:
        return b""
    n = len(fields[0][0])
    lens_mat = np.stack([f[0] for f in fields])  # (F, n)
    row_lens = lens_mat.sum(axis=0)
    row_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(row_lens, out=row_off[1:])
    out = np.zeros(int(row_off[-1]), dtype=np.uint8)
    prefix = np.zeros(n, dtype=np.int64)
    for (lens, data) in fields:
        start = row_off[:-1] + prefix
        t = int(lens.sum())
        if t:
            pos = np.repeat(start - (np.cumsum(lens) - lens), lens) + np.arange(
                t, dtype=np.int64
            )
            out[pos] = data
        prefix += lens
    return out.tobytes()


# ---------------------------------------------------------------- container


def write_avro(path: str, name: str, cols: list[dict], n_rows: int,
               block_rows: int = 1 << 16, codec: str = "null") -> None:
    """cols: [{name, ptype, values, validity}] (kernel form: values hold
    non-null entries when validity given). codec: 'null' or 'deflate'."""
    import zlib

    schema = avro_schema(name, [
        {"name": c["name"], "ptype": c["ptype"],
         "nullable": c["validity"] is not None}
        for c in cols
    ])
    with open(path, "wb") as f:
        f.write(MAGIC)
        meta = {
            "avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode(),
        }
        f.write(_scalar_zigzag(len(meta)))
        for k, v in meta.items():
            kb = k.encode()
            f.write(_scalar_zigzag(len(kb)) + kb)
            f.write(_scalar_zigzag(len(v)) + v)
        f.write(_scalar_zigzag(0))  # end of metadata map
        f.write(SYNC)
        for r0 in range(0, max(n_rows, 1), block_rows):
            r1 = min(r0 + block_rows, n_rows)
            if r1 <= r0:
                break
            fields = []
            for c in cols:
                vals, valid = _slice_rows(c, r0, r1)
                fields.append(_encode_field(c["ptype"], vals, valid))
            payload = _interleave(fields)
            if codec == "deflate":
                # avro deflate = raw DEFLATE stream (no zlib header)
                co = zlib.compressobj(6, zlib.DEFLATED, -15)
                payload = co.compress(payload) + co.flush()
            f.write(_scalar_zigzag(r1 - r0))
            f.write(_scalar_zigzag(len(payload)))
            f.write(payload)
            f.write(SYNC)


def _slice_rows(c: dict, r0: int, r1: int):
    values, validity = c["values"], c["validity"]
    if validity is None:
        return _slice_vals(values, c["ptype"], r0, r1), None
    pv = validity[r0:r1]
    vcum = int(validity[:r0].sum())
    v0, v1 = vcum, vcum + int(pv.sum())
    return _slice_vals(values, c["ptype"], v0, v1), pv


def _slice_vals(values, ptype, a, b):
    if isinstance(values, RaggedBytes):
        return RaggedBytes(
            values.offsets[a : b + 1] - values.offsets[a],
            values.data[values.offsets[a] : values.offsets[b]],
        )
    return values[a:b]


# ---------------------------------------------------------------- reader


def read_avro(path: str) -> tuple[dict, list[dict]]:
    """Parse an OCF → (schema dict, records as list of dicts). Verification /
    import surface: per-record Python walk, like avro's own DatumReader."""
    import zlib

    buf = open(path, "rb").read()
    if buf[:4] != MAGIC:
        raise ValueError("not an avro object container file")
    pos = 4
    meta = {}
    while True:
        cnt, pos = read_zigzag(buf, pos)
        if cnt == 0:
            break
        if cnt < 0:  # spec: negative count = block with byte size following
            cnt = -cnt
            _, pos = read_zigzag(buf, pos)
        for _ in range(cnt):
            kl, pos = read_zigzag(buf, pos)
            k = buf[pos : pos + kl].decode()
            pos += kl
            vl, pos = read_zigzag(buf, pos)
            meta[k] = buf[pos : pos + vl]
            pos += vl
    sync = buf[pos : pos + 16]
    pos += 16
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    records = []
    while pos < len(buf):
        n, pos = read_zigzag(buf, pos)
        size, pos = read_zigzag(buf, pos)
        payload = buf[pos : pos + size]
        pos += size
        if buf[pos : pos + 16] != sync:
            raise ValueError("sync marker mismatch")
        pos += 16
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        p = 0
        for _ in range(n):
            rec = {}
            for fld in schema["fields"]:
                val, p = _read_value(payload, p, fld["type"])
                rec[fld["name"]] = val
            records.append(rec)
    return schema, records


def _read_value(buf, pos, t):
    if isinstance(t, list):  # union
        branch, pos = read_zigzag(buf, pos)
        return _read_value(buf, pos, t[branch])
    if isinstance(t, dict):
        if t.get("type") == "fixed":
            size = t["size"]
            raw = bytes(buf[pos : pos + size])
            pos += size
            if t.get("logicalType") == "decimal":
                return int.from_bytes(raw, "big", signed=True), pos
            return raw, pos
        return _read_value(buf, pos, t["type"])
    if t == "null":
        return None, pos
    if t == "boolean":
        return bool(buf[pos]), pos + 1
    if t in ("int", "long"):
        return read_zigzag(buf, pos)
    if t == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t in ("bytes", "string"):
        ln, pos = read_zigzag(buf, pos)
        raw = bytes(buf[pos : pos + ln])
        pos += ln
        return (raw.decode() if t == "string" else raw), pos
    raise TypeError(f"unsupported avro type {t!r}")
