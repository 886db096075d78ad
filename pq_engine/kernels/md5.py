"""Batch MD5 over a ragged byte column, vectorized ACROSS messages.

Standard MD5 (public RFC 1321). The twist is the execution shape, matching
this repo's wave-parse house style (see kernels/fsst.py): instead of hashing
one message at a time, block wave ``j`` processes the j-th 64-byte block of
EVERY message that still has one — the 64 round updates run as NumPy u32
lane arithmetic over all active messages at once. Per-message Python is
gone; cost is O(total_bytes) with ~64 vector ops per block wave.

Used by the local CLI mask path (the Spark rewrite hashes JVM-side with
``F.md5``, which is faster still — this kernel exists so the no-Spark tool
has no per-row loop either, r2 'what's wrong' #1)."""

from __future__ import annotations

import numpy as np

from .ragged import RaggedBytes

# RFC 1321 constants
_S = np.array(
    [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4,
    dtype=np.uint32,
)
_K = np.floor(np.abs(np.sin(np.arange(1, 65, dtype=np.float64))) * 2**32).astype(
    np.uint64
).astype(np.uint32)
# message-word index g per round
_G = np.concatenate(
    [
        np.arange(16),
        (5 * np.arange(16) + 1) % 16,
        (3 * np.arange(16) + 5) % 16,
        (7 * np.arange(16)) % 16,
    ]
).astype(np.int64)
_INIT = np.array([0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476], dtype=np.uint32)


def _pad(col: RaggedBytes) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One padded buffer for the whole batch (0x80 + zeros + u64 bit length),
    built with scatters — no per-message loop."""
    lens = col.lengths
    n = len(col)
    padded_lens = ((lens + 8) // 64 + 1) * 64
    poff = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(padded_lens, out=poff[1:])
    buf = np.zeros(int(poff[-1]), dtype=np.uint8)
    total = int(lens.sum())
    if total:
        pos = np.repeat(poff[:-1] - col.offsets[:-1], lens) + np.arange(
            total, dtype=np.int64
        )
        buf[pos] = col.data
    buf[poff[:-1] + lens] = 0x80
    bitlen = (lens.astype(np.uint64) * 8).astype("<u8").view(np.uint8).reshape(n, 8)
    tail = (poff[1:] - 8)[:, None] + np.arange(8, dtype=np.int64)
    buf[tail.reshape(-1)] = bitlen.reshape(-1)
    return buf, poff[:-1], (padded_lens // 64).astype(np.int64)


def md5_ragged(col: RaggedBytes) -> RaggedBytes:
    """MD5 hex digests (32 lowercase hex chars each) of every value."""
    n = len(col)
    if n == 0:
        return RaggedBytes(np.zeros(1, np.int64), np.zeros(0, np.uint8))
    buf, poff, n_blocks = _pad(col)
    state = np.tile(_INIT, (n, 1))  # (n, 4) u32
    max_blocks = int(n_blocks.max())
    for j in range(max_blocks):
        active = np.flatnonzero(n_blocks > j)
        starts = poff[active] + j * 64
        block_bytes = buf[starts[:, None] + np.arange(64, dtype=np.int64)]
        M = np.ascontiguousarray(block_bytes).view("<u4")  # (m, 16) words
        a = state[active, 0].copy()
        b = state[active, 1].copy()
        c = state[active, 2].copy()
        d = state[active, 3].copy()
        for i in range(64):
            if i < 16:
                f = (b & c) | (~b & d)
            elif i < 32:
                f = (d & b) | (~d & c)
            elif i < 48:
                f = b ^ c ^ d
            else:
                f = c ^ (b | ~d)
            tmp = d
            d = c
            c = b
            x = a + f + _K[i] + M[:, _G[i]]  # u32 wraparound
            s = int(_S[i])
            b = b + ((x << np.uint32(s)) | (x >> np.uint32(32 - s)))
            a = tmp
        state[active, 0] += a
        state[active, 1] += b
        state[active, 2] += c
        state[active, 3] += d
    digest = state.astype("<u4").view(np.uint8).reshape(n, 16)
    hex_chars = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)
    out = np.empty((n, 32), dtype=np.uint8)
    out[:, 0::2] = hex_chars[digest >> 4]
    out[:, 1::2] = hex_chars[digest & 0x0F]
    return RaggedBytes(np.arange(n + 1, dtype=np.int64) * 32, out.reshape(-1))
