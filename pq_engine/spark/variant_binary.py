"""Parquet VARIANT *binary* encoding — reader + writer.

Reference layout (studied from
/root/reference/parquet-variant/src/main/java/org/apache/parquet/variant/
VariantUtil.java:49-231 — constants and byte layout only; implementation is
original Python):

Metadata buffer::

    header byte: bits 0-3 version (=1), bit 4 sorted_strings,
                 bits 6-7 offset_size - 1
    dict_size   (offset_size bytes, unsigned LE)
    offsets     ((dict_size + 1) x offset_size bytes)
    bytes       (concatenated UTF-8 keys)

Value buffer — first byte: bits 0-1 basic type, bits 2-7 type info:

    basic 0 = primitive: type info selects NULL/TRUE/FALSE/INT8/16/32/64/
              DOUBLE/DECIMAL4/8/16/DATE/TIMESTAMP_TZ/NTZ/FLOAT/BINARY/
              LONG_STR/TIME/TIMESTAMP_NANOS_TZ/NTZ/UUID, payload LE
    basic 1 = short string: type info = length (<= 63), bytes follow
    basic 2 = object: b4 large, b3b2 id_size-1, b1b0 offset_size-1;
              num_elements (1 or 4 B); field ids; offsets (n+1); values
    basic 3 = array:  b2 large, b1b0 offset_size-1; num_elements;
              offsets (n+1); element values

This module completes the VARIANT story (VERDICT r3 "what's missing" #4):
the engine-level representation stays the typed-shred + residual analog
(``pq_engine/spark/variant.py``), and THIS decoder bridges real
parquet-variant binary values into it (binary -> JSON -> infer/shred), while
the writer emits spec-shaped binary for interop tests. Structure walking is
per-value Python over HEADERS (like the reference's ByteBuffer walk) — this
is an interop surface, not the hot encode path; payload bytes move as
slices."""

from __future__ import annotations

import json
import struct
import uuid as _uuid
from decimal import Decimal

import numpy as np
import pandas

# primitive type ids (VariantUtil.java:99-169)
_NULL, _TRUE, _FALSE = 0, 1, 2
_INT8, _INT16, _INT32, _INT64 = 3, 4, 5, 6
_DOUBLE, _DEC4, _DEC8, _DEC16 = 7, 8, 9, 10
_DATE, _TS_TZ, _TS_NTZ, _FLOAT, _BINARY, _LONG_STR = 11, 12, 13, 14, 15, 16
_TIME, _TS_NANOS_TZ, _TS_NANOS_NTZ, _UUID = 17, 18, 19, 20

_VERSION = 1


def _read_uint(buf: bytes, pos: int, n: int) -> int:
    # an out-of-range slice silently yields fewer bytes (worst case b"" -> 0),
    # turning a corrupt variant into silently-wrong structure — fail instead
    if pos < 0 or pos + n > len(buf):
        raise ValueError(
            f"variant buffer truncated: need bytes [{pos},{pos + n}) of {len(buf)}"
        )
    return int.from_bytes(buf[pos : pos + n], "little")


# ------------------------------------------------------------------ metadata


def decode_metadata(metadata: bytes) -> list[str]:
    """Dictionary keys by field id."""
    if not metadata:
        raise ValueError("empty variant metadata")
    hdr = metadata[0]
    if hdr & 0x0F != _VERSION:
        raise ValueError(f"unsupported variant version {hdr & 0x0F}")
    osz = ((hdr >> 6) & 0x3) + 1
    dict_size = _read_uint(metadata, 1, osz)
    off0 = 1 + osz
    data0 = off0 + (dict_size + 1) * osz
    offs = [_read_uint(metadata, off0 + i * osz, osz) for i in range(dict_size + 1)]
    if any(offs[i] > offs[i + 1] for i in range(dict_size)):
        raise ValueError("variant metadata offsets not monotonic")
    if data0 + offs[-1] > len(metadata):
        raise ValueError("variant metadata truncated")
    return [
        metadata[data0 + offs[i] : data0 + offs[i + 1]].decode("utf-8")
        for i in range(dict_size)
    ]


def encode_metadata(keys: list[str]) -> bytes:
    """Metadata buffer for the given field keys (id = list position)."""
    data = [k.encode("utf-8") for k in keys]
    total = sum(len(d) for d in data)
    osz = 1 if total <= 0xFF and len(keys) <= 0xFF else (
        2 if total <= 0xFFFF and len(keys) <= 0xFFFF else 4
    )
    hdr = _VERSION | ((osz - 1) << 6)
    if data == sorted(data):
        hdr |= 0x10  # sorted_strings
    out = bytearray([hdr])
    out += len(keys).to_bytes(osz, "little")
    off = 0
    offs = [0]
    for d in data:
        off += len(d)
        offs.append(off)
    for o in offs:
        out += o.to_bytes(osz, "little")
    for d in data:
        out += d
    return bytes(out)


# ------------------------------------------------------------------ decode


def decode_value(value: bytes, keys: list[str], pos: int = 0):
    """Decode the variant value at ``pos`` -> (python object, end position).
    Scalars map to Python natives; DECIMALx -> decimal.Decimal, DATE ->
    ('date', days), TIME/TIMESTAMPs -> (tag, int64), BINARY -> bytes,
    UUID -> uuid.UUID (big-endian bytes, VariantUtil UUID comment)."""
    if pos >= len(value):
        raise ValueError("variant value truncated")
    b0 = value[pos]
    basic = b0 & 0x3
    info = (b0 >> 2) & 0x3F
    if basic == 1:  # short string
        end = pos + 1 + info
        return value[pos + 1 : end].decode("utf-8"), end
    if basic == 0:
        return _decode_primitive(value, info, pos)
    if basic == 2:  # object
        large = (info >> 4) & 0x1
        szb = 4 if large else 1
        n = _read_uint(value, pos + 1, szb)
        idsz = ((info >> 2) & 0x3) + 1
        osz = (info & 0x3) + 1
        ids0 = pos + 1 + szb
        off0 = ids0 + n * idsz
        data0 = off0 + (n + 1) * osz
        obj = {}
        end = data0 + _read_uint(value, off0 + n * osz, osz)
        if data0 > len(value) or end > len(value):
            raise ValueError(
                f"variant object overruns value buffer (data at {data0}, "
                f"end {end}, buffer {len(value)})"
            )
        for i in range(n):
            fid = _read_uint(value, ids0 + i * idsz, idsz)
            if fid >= len(keys):
                raise ValueError(
                    f"variant field id {fid} out of range (metadata has "
                    f"{len(keys)} keys)"
                )
            o = _read_uint(value, off0 + i * osz, osz)
            v, _ = decode_value(value, keys, data0 + o)
            obj[keys[fid]] = v
        return obj, end
    # basic == 3: array
    large = (info >> 2) & 0x1
    szb = 4 if large else 1
    n = _read_uint(value, pos + 1, szb)
    osz = (info & 0x3) + 1
    off0 = pos + 1 + szb
    data0 = off0 + (n + 1) * osz
    end = data0 + _read_uint(value, off0 + n * osz, osz)
    if data0 > len(value) or end > len(value):
        raise ValueError(
            f"variant array overruns value buffer (data at {data0}, "
            f"end {end}, buffer {len(value)})"
        )
    arr = []
    for i in range(n):
        o = _read_uint(value, off0 + i * osz, osz)
        v, _ = decode_value(value, keys, data0 + o)
        arr.append(v)
    return arr, end


def _decode_primitive(value: bytes, info: int, pos: int):
    p = pos + 1
    if info == _NULL:
        return None, p
    if info == _TRUE:
        return True, p
    if info == _FALSE:
        return False, p
    if info == _INT8:
        return int.from_bytes(value[p : p + 1], "little", signed=True), p + 1
    if info == _INT16:
        return int.from_bytes(value[p : p + 2], "little", signed=True), p + 2
    if info == _INT32:
        return int.from_bytes(value[p : p + 4], "little", signed=True), p + 4
    if info == _INT64:
        return int.from_bytes(value[p : p + 8], "little", signed=True), p + 8
    if info == _DOUBLE:
        return struct.unpack_from("<d", value, p)[0], p + 8
    if info == _FLOAT:
        return struct.unpack_from("<f", value, p)[0], p + 4
    if info in (_DEC4, _DEC8, _DEC16):
        w = {_DEC4: 4, _DEC8: 8, _DEC16: 16}[info]
        scale = value[p]
        unscaled = int.from_bytes(value[p + 1 : p + 1 + w], "little", signed=True)
        return Decimal(unscaled).scaleb(-scale), p + 1 + w
    if info == _DATE:
        return ("date", int.from_bytes(value[p : p + 4], "little", signed=True)), p + 4
    if info in (_TS_TZ, _TS_NTZ, _TIME, _TS_NANOS_TZ, _TS_NANOS_NTZ):
        tag = {
            _TS_TZ: "timestamp_tz", _TS_NTZ: "timestamp_ntz", _TIME: "time",
            _TS_NANOS_TZ: "timestamp_nanos_tz", _TS_NANOS_NTZ: "timestamp_nanos_ntz",
        }[info]
        return (tag, int.from_bytes(value[p : p + 8], "little", signed=True)), p + 8
    if info == _BINARY:
        n = _read_uint(value, p, 4)
        return bytes(value[p + 4 : p + 4 + n]), p + 4 + n
    if info == _LONG_STR:
        n = _read_uint(value, p, 4)
        return value[p + 4 : p + 4 + n].decode("utf-8"), p + 4 + n
    if info == _UUID:
        return _uuid.UUID(bytes=bytes(value[p : p + 16])), p + 16
    raise ValueError(f"unknown variant primitive type {info}")


def variant_to_obj(metadata: bytes, value: bytes):
    """Full decode of one (metadata, value) pair."""
    obj, end = decode_value(value, decode_metadata(metadata))
    if end != len(value):
        raise ValueError(f"trailing bytes in variant value ({end} != {len(value)})")
    return obj


def _jsonable(v):
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_jsonable(x) for x in v]
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, bytes):
        import base64

        return base64.b64encode(v).decode("ascii")
    if isinstance(v, _uuid.UUID):
        return str(v)
    if isinstance(v, tuple):  # tagged temporal: render as {tag: int}
        return {v[0]: v[1]}
    return v


def variant_to_json(metadata: bytes, value: bytes) -> str:
    """Canonical JSON rendering (the bridge into infer_variant_spec /
    shred_variant): decimals as numbers, binary as base64, uuid as string,
    temporals as single-key tagged objects."""
    return json.dumps(_jsonable(variant_to_obj(metadata, value)),
                      sort_keys=True, separators=(",", ":"))


# ------------------------------------------------------------------ encode


def _collect_keys(v, keys: set):
    if isinstance(v, dict):
        for k, x in v.items():
            keys.add(k)
            _collect_keys(x, keys)
    elif isinstance(v, list):
        for x in v:
            _collect_keys(x, keys)


def _uint_size(maxval: int) -> int:
    return 1 if maxval <= 0xFF else (2 if maxval <= 0xFFFF else
                                     (3 if maxval <= 0xFFFFFF else 4))


def _encode_value(v, key_id: dict) -> bytes:
    if v is None:
        return bytes([_NULL << 2])
    if v is True:
        return bytes([_TRUE << 2])
    if v is False:
        return bytes([_FALSE << 2])
    if isinstance(v, int):
        for info, w in ((_INT8, 1), (_INT16, 2), (_INT32, 4), (_INT64, 8)):
            if -(1 << (8 * w - 1)) <= v < (1 << (8 * w - 1)):
                return bytes([info << 2]) + v.to_bytes(w, "little", signed=True)
        raise ValueError("int out of int64 range")
    if isinstance(v, float):
        return bytes([_DOUBLE << 2]) + struct.pack("<d", v)
    if isinstance(v, Decimal):
        sign, digits, exp = v.as_tuple()
        scale = max(0, -exp)
        unscaled = int(v.scaleb(scale))
        for info, w, prec in ((_DEC4, 4, 9), (_DEC8, 8, 18), (_DEC16, 16, 38)):
            if abs(unscaled) < 10 ** prec:
                return (bytes([info << 2, scale])
                        + unscaled.to_bytes(w, "little", signed=True))
        raise ValueError("decimal precision > 38")
    if isinstance(v, str):
        b = v.encode("utf-8")
        if len(b) <= 63:
            return bytes([(len(b) << 2) | 1]) + b
        return bytes([_LONG_STR << 2]) + len(b).to_bytes(4, "little") + b
    if isinstance(v, bytes):
        return bytes([_BINARY << 2]) + len(v).to_bytes(4, "little") + v
    if isinstance(v, _uuid.UUID):
        return bytes([_UUID << 2]) + v.bytes
    if isinstance(v, tuple):  # tagged temporal ('date'|'time'|'timestamp_*', int)
        tag, iv = v
        info = {"date": _DATE, "timestamp_tz": _TS_TZ, "timestamp_ntz": _TS_NTZ,
                "time": _TIME, "timestamp_nanos_tz": _TS_NANOS_TZ,
                "timestamp_nanos_ntz": _TS_NANOS_NTZ}[tag]
        w = 4 if info == _DATE else 8
        return bytes([info << 2]) + int(iv).to_bytes(w, "little", signed=True)
    if isinstance(v, list):
        elems = [_encode_value(x, key_id) for x in v]
        offs = [0]
        for e in elems:
            offs.append(offs[-1] + len(e))
        osz = _uint_size(offs[-1])
        large = len(elems) > 0xFF
        hdr = ((1 if large else 0) << 4) | ((osz - 1) << 2) | 3
        out = bytearray([hdr])
        out += len(elems).to_bytes(4 if large else 1, "little")
        for o in offs:
            out += o.to_bytes(osz, "little")
        for e in elems:
            out += e
        return bytes(out)
    if isinstance(v, dict):
        # fields sorted by key (VariantBuilder writes id-sorted field lists
        # over a sorted dictionary — lookups may binary-search)
        items = sorted(v.items(), key=lambda kv: key_id[kv[0]])
        elems = [_encode_value(x, key_id) for _, x in items]
        offs = [0]
        for e in elems:
            offs.append(offs[-1] + len(e))
        osz = _uint_size(offs[-1])
        idsz = _uint_size(max((key_id[k] for k, _ in items), default=0))
        large = len(elems) > 0xFF
        hdr = ((1 if large else 0) << 6) | ((idsz - 1) << 4) | ((osz - 1) << 2) | 2
        # note: object header packs large at bit 4 of type info (<<6 overall),
        # id size at bits 3-2, offset size at bits 1-0 of the type info
        out = bytearray([hdr])
        out += len(elems).to_bytes(4 if large else 1, "little")
        for k, _ in items:
            out += key_id[k].to_bytes(idsz, "little")
        for o in offs:
            out += o.to_bytes(osz, "little")
        for e in elems:
            out += e
        return bytes(out)
    raise TypeError(f"cannot encode {type(v).__name__} as variant")


def obj_to_variant(v) -> tuple[bytes, bytes]:
    """Encode a Python object -> (metadata, value) variant buffers. Keys are
    dictionary-encoded sorted (sorted_strings set in the metadata header)."""
    keys: set = set()
    _collect_keys(v, keys)
    ordered = sorted(keys)
    key_id = {k: i for i, k in enumerate(ordered)}
    return encode_metadata(ordered), _encode_value(v, key_id)


# ----------------------------------------------------- batch (flat objects)
#
# The common shape in a columnar pipeline is a BATCH of flat objects with one
# shared key set and scalar fields (exactly what variant_binary_decode
# encodes). VERDICT r4 #5: keep the recursive walk for nested values, but
# run that common case as array ops — one numpy pass per field instead of a
# Python walk per value. Both fast paths verify their preconditions and fall
# back to the per-value functions otherwise, so they are drop-in.


def _flat_uniform_fields(objs):
    """Shared sorted key tuple if every element is a dict with the same key
    SET — else None. (Key-view equality is a C-level set compare; per-field
    scalar-ness is checked by the field encoders, which return None to
    trigger the fallback.)"""
    if not objs:
        return None
    first = objs[0]
    if not isinstance(first, dict) or not first:
        return None
    kv = first.keys()
    for o in objs:
        if not isinstance(o, dict) or o.keys() != kv:
            return None
    return tuple(sorted(kv))


def _encode_scalar_field_batch(vals):
    """(lens int64[n], data uint8[total]) of per-row encoded scalars
    (type byte + payload), or None when a value needs the fallback
    (strings > 63 B, ints > int64)."""
    n = len(vals)
    # ONE C-level type pass dispatches the whole field (the all(isinstance)
    # scans were the remaining per-value cost — profile r5)
    ts = set(map(type, vals))
    ts.discard(type(None))
    if not ts or ts == {bool}:
        codes = np.array(
            [(_NULL if v is None else (_TRUE if v else _FALSE)) << 2 for v in vals],
            dtype=np.uint8,
        )
        return np.ones(n, dtype=np.int64), codes
    if ts == {int}:
        try:
            iv = np.fromiter(
                (0 if v is None else v for v in vals), dtype=np.int64, count=n
            )
        except OverflowError:
            return None
        width = np.ones(n, dtype=np.int64)
        for w, lo in ((2, 1 << 7), (4, 1 << 15), (8, 1 << 31)):
            width[(iv < -lo) | (iv >= lo)] = w
        info = np.select(
            [width == 1, width == 2, width == 4], [_INT8, _INT16, _INT32], _INT64
        ).astype(np.uint8)
        isnull = np.fromiter((v is None for v in vals), dtype=bool, count=n)
        lens = 1 + width
        lens[isnull] = 1
        off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=off[1:])
        out = np.zeros(int(off[-1]), dtype=np.uint8)
        out[off[:-1]] = np.where(isnull, _NULL << 2, info << 2).astype(np.uint8)
        u = iv.view(np.uint64)
        for k in range(8):
            rows = (~isnull) & (width > k)
            out[off[:-1][rows] + 1 + k] = (
                (u[rows] >> np.uint64(8 * k)) & np.uint64(0xFF)
            ).astype(np.uint8)
        return lens, out
    if ts == {float}:
        isnull = np.array([v is None for v in vals])
        fv = np.array([0.0 if v is None else v for v in vals], dtype="<f8")
        lens = np.where(isnull, 1, 9).astype(np.int64)
        off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=off[1:])
        out = np.zeros(int(off[-1]), dtype=np.uint8)
        out[off[:-1]] = np.where(isnull, _NULL << 2, _DOUBLE << 2).astype(np.uint8)
        fb = fv.view(np.uint8).reshape(n, 8)
        rows = np.flatnonzero(~isnull)
        for k in range(8):
            out[off[:-1][rows] + 1 + k] = fb[rows, k]
        return lens, out
    if ts == {str}:
        bs = [b"" if v is None else v.encode("utf-8") for v in vals]
        blens = np.array([len(b) for b in bs], dtype=np.int64)
        if (blens > 63).any():
            return None  # long strings take the fallback
        isnull = np.array([v is None for v in vals])
        lens = np.where(isnull, 1, 1 + blens).astype(np.int64)
        off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=off[1:])
        out = np.zeros(int(off[-1]), dtype=np.uint8)
        out[off[:-1]] = np.where(
            isnull, _NULL << 2, ((blens << 2) | 1).astype(np.int64)
        ).astype(np.uint8)
        payload = np.frombuffer(b"".join(bs), dtype=np.uint8)
        if len(payload):
            src_off = np.zeros(n, dtype=np.int64)
            np.cumsum(blens[:-1], out=src_off[1:]) if n > 1 else None
            t = int(blens[~isnull].sum())
            rows = ~isnull
            pos = np.repeat(
                off[:-1][rows] + 1 - src_off[rows], blens[rows]
            ) + np.arange(t, dtype=np.int64)
            # payload positions of non-null rows, in order
            src = np.repeat(src_off[rows], blens[rows]) + (
                np.arange(t, dtype=np.int64)
                - np.repeat(np.cumsum(blens[rows]) - blens[rows], blens[rows])
            )
            out[pos] = payload[src]
        return lens, out
    return None


def objs_to_variant_batch(objs: list) -> tuple[bytes, list[bytes]]:
    """Batch obj_to_variant with ONE shared metadata buffer: the uniform
    flat-object fast path assembles headers + field offsets as matrices and
    scatters field bytes with the interleave pattern (no per-row Python);
    anything else falls back to the recursive encoder per row. Returns
    (metadata, [value bytes per row]) — all rows share the metadata."""
    keys = _flat_uniform_fields(objs)
    n = len(objs)
    if keys is not None and len(keys) <= 255:
        nf = len(keys)
        meta = encode_metadata(list(keys))
        encoded = []
        ok = True
        for k in keys:
            enc = _encode_scalar_field_batch([o[k] for o in objs])
            if enc is None:
                ok = False
                break
            encoded.append(enc)
        if ok:
            lens_mat = np.stack([e[0] for e in encoded])  # (nf, n)
            totals = lens_mat.sum(axis=0)
            if int(totals.max(initial=0)) <= 255:  # osz = 1, idsz = 1
                hl = 2 + nf + (nf + 1)
                row_lens = hl + totals
                row_off = np.zeros(n + 1, dtype=np.int64)
                np.cumsum(row_lens, out=row_off[1:])
                out = np.zeros(int(row_off[-1]), dtype=np.uint8)
                # header: hdr byte, count, ids, offsets (cumsum of field lens)
                out[row_off[:-1]] = 2  # basic=2 object, small, idsz=osz=1
                out[row_off[:-1] + 1] = nf
                for i in range(nf):
                    out[row_off[:-1] + 2 + i] = i  # field ids, sorted
                run = np.zeros(n, dtype=np.int64)
                out[row_off[:-1] + 2 + nf] = 0
                for i in range(nf):
                    run = run + lens_mat[i]
                    out[row_off[:-1] + 2 + nf + 1 + i] = run.astype(np.uint8)
                # scatter field payloads after the header
                prefix = np.zeros(n, dtype=np.int64)
                for lens, data in encoded:
                    start = row_off[:-1] + hl + prefix
                    t = int(lens.sum())
                    if t:
                        pos = np.repeat(
                            start - (np.cumsum(lens) - lens), lens
                        ) + np.arange(t, dtype=np.int64)
                        out[pos] = data
                    prefix += lens
                ob = out.tobytes()
                return meta, [
                    ob[row_off[i] : row_off[i + 1]] for i in range(n)
                ]
    # fallback: per-row recursion, one merged metadata (keys unioned)
    allkeys: set = set()
    for o in objs:
        _collect_keys(o, allkeys)
    ordered = sorted(allkeys)
    key_id = {k: i for i, k in enumerate(ordered)}
    return encode_metadata(ordered), [_encode_value(o, key_id) for o in objs]


def variants_to_json_batch(metas, vals) -> list:
    """Batch variant_to_json. Fast path: all non-null rows share one
    metadata buffer AND are flat objects with the same single-byte header
    layout (same field count/ids, idsz = osz = 1) — then every field
    decodes with numpy gathers (grouped by type byte) and the JSON rows are
    assembled from per-field string columns. Falls back per row otherwise."""
    n = len(metas)
    live = [i for i in range(n) if metas[i] is not None and vals[i] is not None]
    out: list = [None] * n
    if not live:
        return out
    m0 = bytes(metas[live[0]])
    if all(bytes(metas[i]) == m0 for i in live):
        keys = decode_metadata(m0)
        if not all(
            k.isascii() and k.isprintable() and '"' not in k and "\\" not in k
            for k in keys
        ):
            keys = None  # key needs JSON escaping — per-row path handles it
    else:
        keys = None
    if keys is not None:
        bufs = [bytes(vals[i]) for i in live]
        lens = np.array([len(b) for b in bufs], dtype=np.int64)
        data = np.frombuffer(b"".join(bufs), dtype=np.uint8)
        voff = np.zeros(len(bufs), dtype=np.int64)
        if len(bufs) > 1:
            np.cumsum(lens[:-1], out=voff[1:])
        ok = len(data) > 0 and (data[voff] == 2).all()  # flat small objects
        if ok:
            nf = int(data[voff[0] + 1])
            ok = (data[voff + 1] == nf).all() and 1 <= nf <= 255
        if ok:
            hl = 2 + nf + (nf + 1)
            ok = (lens >= hl).all()
        if ok:
            ids = data[voff[:, None] + 2 + np.arange(nf)]
            ok = (ids == np.arange(nf, dtype=np.uint8)).all() and nf <= len(keys)
        if ok:
            offs = data[voff[:, None] + 2 + nf + np.arange(nf + 1)].astype(np.int64)
            cols = []
            for i in range(nf):
                starts = voff + hl + offs[:, i]
                col = _decode_scalar_col_json(data, starts)
                if col is None:
                    ok = False
                    break
                cols.append(col)
        if ok:
            # row JSON by object-array concatenation: one C-level pass per
            # field instead of a Python generator join per row
            acc = np.full(len(live), '{"' + keys[0] + '":', dtype=object)
            acc = acc + cols[0]
            for f in range(1, nf):
                acc = acc + (',"' + keys[f] + '":')
                acc = acc + cols[f]
            acc = acc + "}"
            for j, i in enumerate(live):
                out[i] = acc[j]
            return out
    for i in live:
        out[i] = variant_to_json(bytes(metas[i]), bytes(vals[i]))
    return out


def _decode_scalar_col_json(data: np.ndarray, starts: np.ndarray):
    """JSON string fragments for the scalar values at ``starts`` (one per
    row) — numpy per type-byte group; None if any value is non-scalar."""
    tb = data[starts]
    basic = tb & 0x3
    info = tb >> 2
    n = len(starts)
    out = np.empty(n, dtype=object)
    if ((basic != 0) & (basic != 1)).any():
        return None  # nested object/array — fallback
    prim = basic == 0
    if (prim & ~np.isin(info, [_NULL, _TRUE, _FALSE, _INT8, _INT16, _INT32,
                               _INT64, _DOUBLE])).any():
        return None  # decimals/temporals etc. — fallback keeps exactness
    out[prim & (info == _NULL)] = "null"
    out[prim & (info == _TRUE)] = "true"
    out[prim & (info == _FALSE)] = "false"
    for iv, w in ((_INT8, 1), (_INT16, 2), (_INT32, 4), (_INT64, 8)):
        rows = np.flatnonzero(prim & (info == iv))
        if len(rows):
            acc = np.zeros(len(rows), dtype=np.uint64)
            for k in range(w):
                acc |= data[starts[rows] + 1 + k].astype(np.uint64) << np.uint64(8 * k)
            v = acc.astype(np.int64)
            if w < 8:  # sign-extend
                bit = np.int64(1) << np.int64(8 * w - 1)
                v = (v ^ bit) - bit
            out[rows] = v.astype(str).astype(object)
    rows = np.flatnonzero(prim & (info == _DOUBLE))
    if len(rows):
        b = np.zeros((len(rows), 8), dtype=np.uint8)
        for k in range(8):
            b[:, k] = data[starts[rows] + 1 + k]
        dv = b.view("<f8").reshape(-1)
        fin = np.isfinite(dv)
        # repr(float) IS the json number format for finite values (same
        # shortest-roundtrip algorithm dumps uses) at a fraction of the cost
        out[rows[fin]] = [repr(x) for x in dv[fin].tolist()]
        if not fin.all():
            out[rows[~fin]] = [json.dumps(float(x)) for x in dv[~fin]]
    srows = np.flatnonzero(basic == 1)
    if len(srows):
        slen = info[srows].astype(np.int64)
        t = int(slen.sum())
        src = np.repeat(starts[srows] + 1, slen) + (
            np.arange(t, dtype=np.int64)
            - np.repeat(np.cumsum(slen) - slen, slen)
        )
        payload = data[src]
        blob = payload.tobytes()
        so = np.zeros(len(srows) + 1, dtype=np.int64)
        np.cumsum(slen, out=so[1:])
        # strings with no control/quote/backslash/non-ASCII bytes emit as
        # plain '"s"'; only the rest pay json.dumps (which escapes + \uXXXX
        # encodes non-ASCII, matching the per-row path's ensure_ascii)
        special = (
            (payload < 0x20) | (payload == 0x22) | (payload == 0x5C)
            | (payload >= 0x80)
        )
        needs = np.zeros(len(srows), dtype=bool)
        if len(payload):
            nz = np.flatnonzero(special)
            if len(nz):
                needs[np.searchsorted(so[1:], nz, side="right")] = True
        clean = np.flatnonzero(~needs)
        out[srows[clean]] = [
            '"' + blob[so[j] : so[j + 1]].decode("ascii") + '"' for j in clean
        ]
        for j in np.flatnonzero(needs):
            out[srows[j]] = json.dumps(blob[so[j] : so[j + 1]].decode("utf-8"))
    return out


# ------------------------------------------------------------ Spark surface


def variant_encode_binary(df, json_col: str, metadata_out: str = "vm",
                          value_out: str = "vv"):
    """Inverse bridge: a JSON string column → spec-shaped binary variant
    (metadata, value) columns, one Arrow-batched UDF. JSON numbers map to
    the narrowest int / double; objects/arrays/strings/bools/null per the
    spec. Rows that fail to parse yield null buffers."""
    from pyspark.sql import functions as F, types as T

    @F.pandas_udf(T.StructType([
        T.StructField(metadata_out, T.BinaryType()),
        T.StructField(value_out, T.BinaryType()),
    ]))
    def enc(js: pandas.Series) -> pandas.DataFrame:
        ms, vs = [], []
        for s in js:
            if s is None:
                ms.append(None)
                vs.append(None)
                continue
            try:
                m, v = obj_to_variant(json.loads(s))
            except (ValueError, TypeError):
                m, v = None, None
            ms.append(m)
            vs.append(v)
        return pandas.DataFrame({metadata_out: ms, value_out: vs})

    tmp = f"__vb_{json_col}"
    res = df.withColumn(tmp, enc(F.col(json_col)))
    return res.withColumn(metadata_out, F.col(f"{tmp}.{metadata_out}")) \
              .withColumn(value_out, F.col(f"{tmp}.{value_out}")).drop(tmp)


def variant_decode_json(df, metadata_col: str, value_col: str,
                        out: str = "vjson"):
    """Adds ``out``: canonical JSON decoded from binary variant columns —
    the entry point that feeds real parquet-variant data into the typed
    shred path (pq_engine.spark.variant.shred_variant on the JSON)."""
    from pyspark.sql import functions as F, types as T

    @F.pandas_udf(T.StringType())
    def dec(m: pandas.Series, v: pandas.Series) -> pandas.Series:
        # batch fast path for uniform flat objects (r5); per-row fallback
        # inside for anything else
        return pandas.Series(variants_to_json_batch(list(m), list(v)))

    return df.withColumn(out, dec(F.col(metadata_col), F.col(value_col)))
