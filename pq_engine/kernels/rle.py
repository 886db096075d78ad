"""RLE / bit-packed hybrid codec (parquet-format <RLE> encoding).

Grammar (public parquet-format spec; mirrored from the doc comment at
/root/reference/parquet-column/.../values/rle/RunLengthBitPackingHybridEncoder.java:36-51):

    encoded        := run*
    run            := rle-run | bit-packed-run
    rle-run        := uvarint(count << 1)  value:ceil(width/8) bytes LE
    bit-packed-run := uvarint(groups << 1 | 1)  groups * width bytes
                      (each group = 8 values, at most 63 groups = 504 values per run,
                       RunLengthBitPackingHybridEncoder.java:185-235)

Writer policy (ours — any conforming stream decodes identically; the reference's
streaming repeat-detection at :146-183 triggers RLE at >=8 repeats, we do the same
from vectorized run boundaries):

* runs of a single value with length >= 8 become rle-runs;
* everything between them is bit-packed in groups of 8, <=504 values per run;
* mid-stream bit-packed spans must hold an exact multiple of 8 values, so up to
  7 leading values of an rle-eligible run are "borrowed" into the preceding
  bit-packed span to round it up (the reference achieves the same alignment by
  buffering 8-value groups);
* only the final group of the final run is zero-padded (:255-273).

Run detection is ``np.flatnonzero(np.diff(values))`` — the Python loop below
iterates over *runs*, never values.
"""

from __future__ import annotations

import numpy as np

from .bitpack import pack, unpack, width_for_max
from .varint import encode_uvarint, read_uvarint

_MAX_GROUPS_PER_RUN = 63  # 504 values (RunLengthBitPackingHybridEncoder.java:60-66)


def _emit_rle(value: int, count: int, width: int, out: bytearray) -> None:
    out += encode_uvarint(count << 1)
    out += int(value).to_bytes((width + 7) // 8, "little")


def _emit_packed(values: np.ndarray, width: int, out: bytearray, *, final: bool) -> None:
    """Emit bit-packed run(s) for ``values``. If not ``final`` the length must be
    a multiple of 8; if final the last group is zero-padded."""
    n = len(values)
    if n == 0:
        return
    if n % 8:
        if not final:
            raise AssertionError("mid-stream packed span not group-aligned")
        padded = np.zeros(n + (-n) % 8, dtype=np.uint64)
        padded[:n] = values
        values = padded
        n = len(values)
    # ONE pack call for the whole span, sliced per <=63-group run: runs split
    # at 8-value group boundaries, which are byte boundaries in the packed
    # stream (8 values * width bits = width bytes), so slices of the span's
    # packed bytes are identical to per-run pack() output
    groups = n // 8
    blob = pack(values, width)
    start = 0
    while groups > 0:
        g = min(groups, _MAX_GROUPS_PER_RUN)
        out += encode_uvarint((g << 1) | 1)
        out += blob[start : start + g * width]
        start += g * width
        groups -= g
    return


def encode_hybrid(values: np.ndarray, width: int) -> bytes:
    """Encode non-negative ints (< 2**width) into the hybrid grammar."""
    n = len(values)
    out = bytearray()
    if n == 0:
        return bytes(out)
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if width == 0:
        # single value 0 repeated n times: one rle-run, zero-byte value
        out += encode_uvarint(n << 1)
        return bytes(out)

    change = np.flatnonzero(v[1:] != v[:-1]) + 1
    starts = np.concatenate(([0], change)).astype(np.int64)
    ends = np.concatenate((change, [n])).astype(np.int64)
    lengths = ends - starts

    seg_start = 0  # start of the pending bit-packed span
    for idx in np.flatnonzero(lengths >= 8):
        s = int(starts[idx])
        run_len = int(lengths[idx])
        borrow = (-(s - seg_start)) % 8
        if run_len - borrow < 8:
            continue  # too short after alignment borrow — absorb into packed span
        _emit_packed(v[seg_start : s + borrow], width, out, final=False)
        _emit_rle(int(v[s]), run_len - borrow, width, out)
        seg_start = s + run_len
    _emit_packed(v[seg_start:], width, out, final=True)
    return bytes(out)


def decode_hybrid(buf, width: int, count: int) -> np.ndarray:
    """Decode exactly ``count`` values; returns uint64.
    Mirrors RunLengthBitPackingHybridDecoder.readNext (:80-90) but materializes
    whole runs vectorized instead of value-at-a-time."""
    if count == 0:
        return np.zeros(0, dtype=np.uint64)
    byte_w = (width + 7) // 8
    parts: list[np.ndarray] = []
    got = 0
    pos = 0
    while got < count:
        header, pos = read_uvarint(buf, pos)
        if header & 1:  # bit-packed run
            groups = header >> 1
            nvals = groups * 8
            nbytes = groups * width
            arr = unpack(buf[pos : pos + nbytes], width, nvals)
            pos += nbytes
            take = min(nvals, count - got)
            parts.append(arr[:take])
            got += take
        else:  # rle run
            run = header >> 1
            value = int.from_bytes(bytes(buf[pos : pos + byte_w]), "little")
            pos += byte_w
            take = min(run, count - got)
            parts.append(np.full(take, value, dtype=np.uint64))
            got += take
    return parts[0] if len(parts) == 1 else np.concatenate(parts)


def encode_hybrid_length_prefixed(values: np.ndarray, width: int) -> bytes:
    """V1 framing: u32 LE byte-length prefix then the hybrid stream
    (RunLengthBitPackingHybridValuesWriter.java:66-73)."""
    body = encode_hybrid(values, width)
    return len(body).to_bytes(4, "little") + body


def decode_hybrid_length_prefixed(buf, width: int, count: int) -> tuple[np.ndarray, int]:
    """Returns (values, bytes_consumed_including_prefix)."""
    blen = int.from_bytes(bytes(buf[:4]), "little")
    return decode_hybrid(buf[4 : 4 + blen], width, count), 4 + blen


def encode_bool_rle(values: np.ndarray) -> bytes:
    """BOOLEAN as width-1 hybrid (V2 default, DefaultV2ValuesWriterFactory.java:77-84)."""
    return encode_hybrid(values.astype(np.uint64), 1)


def decode_bool_rle(buf, count: int) -> np.ndarray:
    return decode_hybrid(buf, 1, count).astype(bool)


__all__ = [
    "encode_hybrid",
    "decode_hybrid",
    "encode_hybrid_length_prefixed",
    "decode_hybrid_length_prefixed",
    "encode_bool_rle",
    "decode_bool_rle",
    "width_for_max",
]
