"""Split-block bloom filter (parquet-format BloomFilterHeader semantics).

Reference: /root/reference/parquet-column/.../values/bloomfilter/
BlockSplitBloomFilter.java:72-301 — 32-byte blocks of 8 uint32 words; each
inserted value sets ONE bit per word, chosen by the 8 SALT constants (:84);
the block index is the top 32 bits of xxHash64(value) scaled by the block
count ("block index = (h >> 32) * numBlocks >> 32"). optimalNumOfBits per
:theory. XxHash64 (seed 0) vectorized in NumPy over 8-byte-key batches;
variable-length byte values are pre-hashed to u64 keys.

Everything is batch-vectorized: insert/contains take arrays, not scalars.
"""

from __future__ import annotations

import numpy as np

SALT = np.array(
    [
        0x47B6137B, 0x44974D91, 0x8824AD5B, 0xA2B7289D,
        0x705495C7, 0x2DF1424B, 0x9EFC4947, 0x5C6BFB31,
    ],
    dtype=np.uint32,
)  # BlockSplitBloomFilter.java:84

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def xxhash64_u64(keys: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized XxHash64 of 8-byte little-endian keys (the shape parquet
    hashes fixed-width values in; XxHash.java delegates to the same core)."""
    k = keys.astype(np.uint64, copy=False)
    h = np.uint64(seed) + _P5 + np.uint64(8)
    k1 = _rotl(k * _P2, 31) * _P1
    h = h ^ k1
    h = _rotl(h, 27) * _P1 + _P4
    h ^= h >> np.uint64(33)
    h *= _P2
    h ^= h >> np.uint64(29)
    h *= _P3
    h ^= h >> np.uint64(32)
    return h


_M64 = (1 << 64) - 1


def _rotl_i(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxhash64_bytes(data: bytes, seed: int = 0) -> int:
    """Full XxHash64 over arbitrary-length bytes (python ints) — the hash
    parquet's bloom filter applies to a value's PLAIN encoding
    (XxHash.java / BlockSplitBloomFilter.hash). Used per distinct value at
    bloom build/probe time; the vectorized 8-byte fast path above covers
    INT64/FP64 batches (verified equal on 8-byte inputs). Pinned against
    the public xxHash test vectors."""
    p1, p2, p3, p4, p5 = (int(_P1), int(_P2), int(_P3), int(_P4), int(_P5))
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + p1 + p2) & _M64
        v2 = (seed + p2) & _M64
        v3 = seed & _M64
        v4 = (seed - p1) & _M64
        while pos + 32 <= n:
            lanes = [int.from_bytes(data[pos + 8 * i : pos + 8 * i + 8],
                                    "little") for i in range(4)]
            v1 = (_rotl_i((v1 + lanes[0] * p2) & _M64, 31) * p1) & _M64
            v2 = (_rotl_i((v2 + lanes[1] * p2) & _M64, 31) * p1) & _M64
            v3 = (_rotl_i((v3 + lanes[2] * p2) & _M64, 31) * p1) & _M64
            v4 = (_rotl_i((v4 + lanes[3] * p2) & _M64, 31) * p1) & _M64
            pos += 32
        h = (_rotl_i(v1, 1) + _rotl_i(v2, 7) + _rotl_i(v3, 12)
             + _rotl_i(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ (_rotl_i((v * p2) & _M64, 31) * p1) & _M64) * p1
                 + p4) & _M64
    else:
        h = (seed + p5) & _M64
    h = (h + n) & _M64
    while pos + 8 <= n:
        k = int.from_bytes(data[pos : pos + 8], "little")
        h ^= (_rotl_i((k * p2) & _M64, 31) * p1) & _M64
        h = (_rotl_i(h, 27) * p1 + p4) & _M64
        pos += 8
    if pos + 4 <= n:
        k = int.from_bytes(data[pos : pos + 4], "little")
        h ^= (k * p1) & _M64
        h = (_rotl_i(h, 23) * p2 + p3) & _M64
        pos += 4
    while pos < n:
        h ^= (data[pos] * p5) & _M64
        h = (_rotl_i(h, 11) * p1) & _M64
        pos += 1
    h ^= h >> 33
    h = (h * p2) & _M64
    h ^= h >> 29
    h = (h * p3) & _M64
    h ^= h >> 32
    return h


def optimal_num_bytes(ndv: int, fpp: float = 0.01) -> int:
    """optimalNumOfBits (BlockSplitBloomFilter.java) rounded up to a
    power-of-two byte count in [32, 128 MiB]."""
    bits = -8 * ndv / np.log(1 - fpp ** (1.0 / 8))
    nbytes = int(bits) // 8
    nbytes = max(32, nbytes)
    nbytes = 1 << int(np.ceil(np.log2(nbytes)))
    return min(nbytes, 128 << 20)


class BlockSplitBloomFilter:
    def __init__(self, num_bytes: int):
        if num_bytes % 32:
            raise ValueError("bloom size must be a multiple of 32 bytes")
        self.blocks = np.zeros((num_bytes // 32, 8), dtype=np.uint32)

    @property
    def num_blocks(self) -> int:
        return len(self.blocks)

    def _addr(self, hashes: np.ndarray):
        block = ((hashes >> np.uint64(32)) * np.uint64(self.num_blocks)) >> np.uint64(32)
        low = hashes.astype(np.uint32)  # low 32 bits
        # one bit per word: bit = (low * SALT[w]) >> 27
        bits = ((low[:, None] * SALT[None, :]) >> np.uint32(27)).astype(np.uint32)
        return block.astype(np.int64), bits

    def insert_hashes(self, hashes: np.ndarray) -> None:
        block, bits = self._addr(hashes)
        masks = (np.uint32(1) << bits)  # (n, 8)
        # scatter-OR per word column (8 fixed passes)
        for w in range(8):
            np.bitwise_or.at(self.blocks[:, w], block, masks[:, w])

    def contains_hashes(self, hashes: np.ndarray) -> np.ndarray:
        block, bits = self._addr(hashes)
        masks = np.uint32(1) << bits
        got = self.blocks[block]  # (n, 8)
        return ((got & masks) == masks).all(axis=1)

    def insert_u64(self, keys: np.ndarray) -> None:
        self.insert_hashes(xxhash64_u64(keys))

    def contains_u64(self, keys: np.ndarray) -> np.ndarray:
        return self.contains_hashes(xxhash64_u64(keys))

    def serialize(self) -> bytes:
        return self.blocks.astype("<u4").tobytes()

    @staticmethod
    def deserialize(buf) -> "BlockSplitBloomFilter":
        arr = np.frombuffer(buf, dtype="<u4").reshape(-1, 8)
        f = BlockSplitBloomFilter(arr.size * 4)
        f.blocks = arr.copy()
        return f


def widen_u64(arr: np.ndarray) -> np.ndarray:
    """Deterministically map any fixed-width numeric array to u64 keys.
    32-bit types are WIDENED first (int32→int64, float32→float64 — exact);
    viewing a 32-bit array as u64 directly would pair adjacent values (and
    crash on odd lengths). Mirrors the reference hashing each value
    individually (XxHash.java hashInt/hashFloat)."""
    arr = np.ascontiguousarray(arr)
    if arr.dtype.itemsize == 4:
        arr = arr.astype(np.int64) if arr.dtype.kind in "iu" else arr.astype(np.float64)
    return arr.view(np.uint64)


def fixed_keys(values: np.ndarray) -> np.ndarray:
    """u64 keys for (n, k) FLBA rows — FNV-1a over the row bytes, k fully
    vectorized column passes (mirrors ragged_keys on equal-length values)."""
    n, k = values.shape
    out = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    for j in range(k):
        out = (out ^ values[:, j].astype(np.uint64)) * prime
    return out


def key_for_value(value, ptype: str) -> int:
    """Driver/CLI-side probe key (must match the encode path: narrow to the
    column's physical dtype first, then widen identically)."""
    from .ragged import RaggedBytes

    if ptype in ("string", "binary", "geometry"):  # geometry = WKB binary
        v = value.encode() if isinstance(value, str) else bytes(value)
        return int(ragged_keys(RaggedBytes.from_pylist([v]))[0])
    if ptype.startswith(("decimal_flba[", "fixed[")) or ptype in (
        "uuid", "float16", "int96_ts"
    ):
        from .fixedlen import value_to_fixed

        return int(fixed_keys(value_to_fixed(value, ptype))[0])
    if ptype.startswith("decimal64["):
        ptype = "int64"  # probe with the UNSCALED int
    dt = {"int32": np.int32, "int64": np.int64, "timestamp_us": np.int64,
          "date32": np.int32, "timestamp_ntz_us": np.int64,
          "float32": np.float32, "float64": np.float64}[ptype]
    return int(widen_u64(np.array([value], dtype=dt))[0])


def ragged_keys(col) -> np.ndarray:
    """Stable u64 keys for variable-length values (pre-hash before bloom,
    mirroring hashBytes): FNV-1a over bytes, vectorized per position pass."""
    from .ragged import RaggedBytes

    assert isinstance(col, RaggedBytes)
    n = len(col)
    out = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    lens = col.lengths
    maxlen = int(lens.max()) if n else 0
    prime = np.uint64(0x100000001B3)
    for j in range(maxlen):  # passes over byte positions, not rows
        rows = np.flatnonzero(lens > j)
        b = col.data[col.offsets[:-1][rows] + j].astype(np.uint64)
        out[rows] = (out[rows] ^ b) * prime
    return out
