"""FIXED_LEN_BYTE_ARRAY (FLBA) kernels and its logical-type conversions.

Reference semantics: the FLBA physical type
(/root/reference/parquet-column/.../schema/PrimitiveType.java:48-69) carries
the wide logical types —
* DECIMAL(p > 18) as minimal-width big-endian two's-complement unscaled bytes
  (LogicalTypeAnnotation.java:547, DecimalLogicalTypeAnnotation; widths per
  TypeUtil's precision→bytes table),
* UUID as 16 raw bytes (LogicalTypeAnnotation.java:1068),
* FLOAT16 as 2-byte IEEE-754 half, little-endian (LogicalTypeAnnotation.java:1104),
and the legacy INT96 timestamp (12 bytes: 8-byte little-endian
nanos-of-day + 4-byte little-endian Julian day — ParquetReadSupport /
Impala convention) which modern writers only READ.

Kernel representation: a fixed[k] column batch is a ``uint8`` ndarray of
shape (n, k) — row slicing, dictionary build (unique rows), BYTE_STREAM_SPLIT
(transpose) and PLAIN (flatten) are all single NumPy ops, no per-row Python.
"""

from __future__ import annotations

import numpy as np

EPOCH_JULIAN_DAY = 2_440_588  # 1970-01-01
_US_PER_DAY = 86_400_000_000


def decimal_byte_width(precision: int) -> int:
    """Minimal FLBA width holding any signed unscaled value of ``precision``
    digits (TypeUtil / DecimalLogicalTypeAnnotation semantics): smallest k
    with 2^(8k-1) > 10^p."""
    k = 1
    while (1 << (8 * k - 1)) <= 10**precision:
        k += 1
    return k


def fixed_width(ptype: str) -> int:
    """Byte width of any fixed-family ptype."""
    if ptype.startswith("fixed["):
        return int(ptype[6:-1])
    if ptype.startswith("decimal_flba["):
        p, _ = map(int, ptype[13:-1].split(","))
        return decimal_byte_width(p)
    if ptype == "uuid":
        return 16
    if ptype == "float16":
        return 2
    if ptype == "int96_ts":
        return 12
    if ptype == "interval":
        return 12  # (months, days, millis) u32 LE triple — the INTERVAL
        # logical type over FLBA(12), LogicalTypeAnnotation.java
    raise ValueError(f"not a fixed-family ptype: {ptype}")


def empty_fixed(k: int) -> np.ndarray:
    return np.zeros((0, k), dtype=np.uint8)


# ------------------------------------------------------------------ codecs


def encode_plain_fixed(values: np.ndarray) -> bytes:
    """PLAIN for FLBA: values back-to-back, no length prefixes
    (PlainValuesWriter FLBA path)."""
    return np.ascontiguousarray(values).tobytes()


def decode_plain_fixed(buf, k: int, count: int) -> np.ndarray:
    return np.frombuffer(buf, dtype=np.uint8, count=count * k).reshape(count, k).copy()


def encode_bss_fixed(values: np.ndarray) -> bytes:
    """BYTE_STREAM_SPLIT over FLBA (parquet-format BYTE_STREAM_SPLIT applies
    to FIXED_LEN_BYTE_ARRAY too): byte-plane i of every value stored
    contiguously — one transpose."""
    return np.ascontiguousarray(values.T).tobytes()


def decode_bss_fixed(buf, k: int, count: int) -> np.ndarray:
    planes = np.frombuffer(buf, dtype=np.uint8, count=count * k).reshape(k, count)
    return np.ascontiguousarray(planes.T)


def factorize_fixed(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(codes, unique rows) for the dictionary path — one vectorized
    np.unique over rows (id order is sorted, not first-seen; ids only need a
    consistent chunk-local mapping)."""
    if len(values) == 0:
        return np.zeros(0, np.int64), values
    uniques, codes = np.unique(values, axis=0, return_inverse=True)
    return codes.astype(np.int64).ravel(), uniques


# --------------------------------------------------------- logical conversions


def decimal128_to_fixed(arr16: np.ndarray, k: int) -> np.ndarray:
    """(n, 16) little-endian int128 rows → (n, k) big-endian two's-complement.
    Lossless because |unscaled| < 10^p fits k bytes by construction."""
    return np.ascontiguousarray(arr16[:, :k][:, ::-1])


def fixed_to_decimal128(values: np.ndarray) -> np.ndarray:
    """(n, k) big-endian two's-complement → (n, 16) little-endian int128 rows
    (sign-extended)."""
    n, k = values.shape
    out = np.zeros((n, 16), dtype=np.uint8)
    out[:, :k] = values[:, ::-1]
    if n:
        out[(values[:, 0] & 0x80) != 0, k:] = 0xFF
    return out


_HEX_LUT = np.full(256, 255, dtype=np.uint8)
for _i, _c in enumerate(b"0123456789abcdef"):
    _HEX_LUT[_c] = _i
for _i, _c in enumerate(b"0123456789ABCDEF"):
    _HEX_LUT[_c] = _i
_HEX_CHARS = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)
# canonical 8-4-4-4-12 layout: byte positions of the 32 hex digits
_UUID_HEX_POS = np.concatenate(
    [np.arange(0, 8), np.arange(9, 13), np.arange(14, 18), np.arange(19, 23), np.arange(24, 36)]
)
_UUID_DASH_POS = np.array([8, 13, 18, 23])


def uuid_strings_to_fixed(chars: np.ndarray) -> np.ndarray:
    """(n, 36) uint8 canonical UUID strings → (n, 16) bytes, vectorized."""
    if chars.shape[1] != 36:
        raise ValueError("UUID strings must be canonical 8-4-4-4-12 form")
    if not (chars[:, _UUID_DASH_POS] == ord("-")).all():
        raise ValueError("UUID strings must be canonical 8-4-4-4-12 form")
    nib = _HEX_LUT[chars[:, _UUID_HEX_POS]]
    if (nib == 255).any():
        raise ValueError("non-hex digit in UUID string")
    return (nib[:, 0::2] << 4 | nib[:, 1::2]).astype(np.uint8)


def fixed_to_uuid_strings(values: np.ndarray) -> np.ndarray:
    """(n, 16) bytes → (n, 36) uint8 canonical lowercase UUID strings."""
    n = len(values)
    hexd = np.empty((n, 32), dtype=np.uint8)
    hexd[:, 0::2] = _HEX_CHARS[values >> 4]
    hexd[:, 1::2] = _HEX_CHARS[values & 0x0F]
    out = np.full((n, 36), ord("-"), dtype=np.uint8)
    out[:, _UUID_HEX_POS] = hexd
    return out


def float32_to_fixed16(vals: np.ndarray) -> np.ndarray:
    """float32 → (n, 2) little-endian IEEE half. Values must be
    half-representable for bit-identity (FLOAT16 IS a 16-bit type; float32 is
    only the Spark carrier)."""
    return vals.astype("<f2").view(np.uint8).reshape(-1, 2)


def fixed16_to_float32(values: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(values).view("<f2").ravel().astype(np.float32)


def us_to_int96(us: np.ndarray) -> np.ndarray:
    """int64 epoch-microseconds → (n, 12) INT96 rows. The Julian day is an
    unsigned 32-bit field; timestamps before Julian day 0 (~4713 BC) or past
    day 2^32 are unrepresentable and raise rather than silently wrapping
    (found by the hypothesis property sweep)."""
    day = np.floor_divide(us, _US_PER_DAY)
    if len(day) and (
        int(day.min()) + EPOCH_JULIAN_DAY < 0
        or int(day.max()) + EPOCH_JULIAN_DAY >= 1 << 32
    ):
        raise ValueError("timestamp outside the INT96 Julian-day range")
    nanos = (us - day * _US_PER_DAY).astype("<i8") * 1000
    out = np.zeros((len(us), 12), dtype=np.uint8)
    out[:, :8] = nanos.astype("<i8").view(np.uint8).reshape(-1, 8)
    out[:, 8:] = (day + EPOCH_JULIAN_DAY).astype("<u4").view(np.uint8).reshape(-1, 4)
    return out


def int96_to_us(values: np.ndarray) -> np.ndarray:
    """(n, 12) INT96 rows → int64 epoch-microseconds (legacy-timestamp READ,
    the direction modern parquet-java supports)."""
    v = np.ascontiguousarray(values)
    nanos = v[:, :8].copy().view("<i8").ravel()
    julian = v[:, 8:].copy().view("<u4").ravel().astype(np.int64)
    return (julian - EPOCH_JULIAN_DAY) * _US_PER_DAY + nanos // 1000


def interval_to_fixed(months: np.ndarray, days: np.ndarray, millis: np.ndarray) -> np.ndarray:
    """(months, days, millis) int32 arrays → (n, 12) FLBA rows, LE u32 each
    (INTERVAL stores three unsigned little-endian ints; negative components
    round-trip via two's complement)."""
    n = len(months)
    rows = np.zeros((n, 12), dtype=np.uint8)
    rows[:, 0:4] = np.ascontiguousarray(months, dtype="<i4").view(np.uint8).reshape(n, 4)
    rows[:, 4:8] = np.ascontiguousarray(days, dtype="<i4").view(np.uint8).reshape(n, 4)
    rows[:, 8:12] = np.ascontiguousarray(millis, dtype="<i4").view(np.uint8).reshape(n, 4)
    return rows


def fixed_to_interval(values: np.ndarray):
    """Inverse of interval_to_fixed → (months, days, millis) int32 arrays."""
    n = len(values)
    flat = np.ascontiguousarray(values).view("<i4").reshape(n, 3)
    return flat[:, 0].copy(), flat[:, 1].copy(), flat[:, 2].copy()


def value_to_fixed(value, ptype: str) -> np.ndarray:
    """One probe value → its (1, k) fixed-row bytes, matching what
    _arrow_to_values produces for a column of that ptype (bloom/dictionary
    pushdown probes must hash/compare the exact stored bytes)."""
    if ptype == "uuid":
        chars = np.frombuffer(str(value).encode(), np.uint8).reshape(1, 36)
        return uuid_strings_to_fixed(chars)
    if ptype.startswith("decimal_flba["):
        from decimal import Decimal

        p, s = map(int, ptype[13:-1].split(","))
        unscaled = int(Decimal(str(value)).scaleb(s))
        k = decimal_byte_width(p)
        return np.frombuffer(
            unscaled.to_bytes(k, "big", signed=True), np.uint8
        ).reshape(1, k)
    if ptype == "float16":
        return np.array([value], dtype="<f2").view(np.uint8).reshape(1, 2)
    if ptype == "int96_ts":
        if hasattr(value, "timestamp"):  # datetime
            us = int(round(value.timestamp() * 1e6))
        else:
            us = int(value)
        return us_to_int96(np.array([us], np.int64))
    if ptype == "interval":
        m, d, ms = value  # (months, days, millis)
        return interval_to_fixed(
            np.array([m], np.int32), np.array([d], np.int32), np.array([ms], np.int32)
        )
    if ptype.startswith("fixed["):
        k = int(ptype[6:-1])
        b = value.encode() if isinstance(value, str) else bytes(value)
        if len(b) != k:
            raise ValueError(f"probe value must be exactly {k} bytes")
        return np.frombuffer(b, np.uint8).reshape(1, k)
    raise ValueError(f"not a fixed-family ptype: {ptype}")
