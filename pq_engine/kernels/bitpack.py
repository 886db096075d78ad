"""Width-parameterized little-endian bit-packing, vectorized with NumPy.

Replaces parquet-java's build-time-generated per-width packers
(/root/reference/parquet-generator/.../encoding/Generator.java:27-31,
 /root/reference/parquet-encoding/.../bitpacking/BytePacker.java:65-111:
 ``pack8Values`` turns 8 values into ``width`` bytes). The layout is the
parquet-format "bit-packed, LSB-first" order used by the RLE/bit-packed hybrid
(RunLengthBitPackingHybridEncoder.java:130 selects LITTLE_ENDIAN): value *i*'s
bit *j* lands at global bit position ``i*width + j``; within each byte, bit 0
is the least-significant bit.

One kernel covers widths 0..64 — no generated code.
"""

from __future__ import annotations

import numpy as np


def pack(values: np.ndarray, width: int) -> bytes:
    """Bit-pack ``values`` at ``width`` bits each. ``len(values)`` must be a
    multiple of 8 (callers zero-pad the final group, mirroring
    RunLengthBitPackingHybridEncoder.java:255-273)."""
    n = len(values)
    if width == 0 or n == 0:
        return b""
    if n % 8:
        raise ValueError(f"pack() needs a multiple of 8 values, got {n}")
    if width < 0 or width > 64:
        raise ValueError(f"width out of range: {width}")
    v = np.ascontiguousarray(values, dtype=np.uint64)
    # little-endian u64 bytes unpacked LSB-first give bit j of value i at
    # column j; keep the low ``width`` columns and re-pack — identical stream
    # to the former per-bit shift matrix at a fraction of the traffic
    bits = np.unpackbits(v.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    return np.packbits(bits[:, :width].reshape(-1), bitorder="little").tobytes()


def unpack(data, width: int, count: int) -> np.ndarray:
    """Inverse of :func:`pack`. ``data`` may be longer than needed (padded
    stream tail); exactly ``count`` values are returned as uint64."""
    if width == 0:
        return np.zeros(count, dtype=np.uint64)
    if count == 0:
        return np.zeros(0, dtype=np.uint64)
    raw = np.frombuffer(data, dtype=np.uint8, count=(count * width + 7) // 8)
    bits = np.unpackbits(raw, bitorder="little")[: count * width]
    full = np.zeros((count, 64), dtype=np.uint8)
    full[:, :width] = bits.reshape(count, width)
    return np.packbits(full, axis=1, bitorder="little").reshape(count, 8).copy().view(
        np.uint64
    ).reshape(count)


def width_for_max(max_value: int) -> int:
    """Bits needed for ``max_value`` (BytesUtils.java:49 getWidthFromMaxInt)."""
    if max_value < 0:
        raise ValueError("negative max")
    return int(max_value).bit_length()
