"""DELTA_LENGTH_BYTE_ARRAY and DELTA_BYTE_ARRAY (incremental/prefix encoding).

DELTA_LENGTH_BYTE_ARRAY (/root/reference/parquet-column/.../deltalengthbytearray/
DeltaLengthByteArrayValuesWriter.java:43-70): DELTA_BINARY_PACKED of the int32
lengths, then the concatenated raw bytes. Arrow's string layout *is already*
offsets+data, so encode/decode is offsets arithmetic — no per-value work.

DELTA_BYTE_ARRAY (/root/reference/parquet-column/.../deltastrings/
DeltaByteArrayWriter.java:38-104): per value, the shared-prefix length with the
*previous* value (DELTA_BINARY_PACKED) followed by the suffix
(DELTA_LENGTH_BYTE_ARRAY). The reference finds prefixes with SIMD
``Arrays.mismatch`` (:96); we compute all prefixes at once by materializing a
capped (n, CAP) byte matrix and comparing row i with row i-1 — prefixes longer
than CAP are truncated (costs compression, never correctness).
"""

from __future__ import annotations

import numpy as np

from .delta import decode_delta, encode_delta
from .ragged import RaggedBytes, padded_words

PREFIX_CAP = 256  # longest shared prefix we exploit; avoids huge (n, maxlen) matrices


def encode_delta_length(col: RaggedBytes) -> bytes:
    lengths = col.lengths.astype(np.int32)
    head = encode_delta(lengths)
    # join reads the numpy buffer directly: one copy of the data, not two
    return b"".join((len(head).to_bytes(4, "little"), head, col.data.data))


def decode_delta_length(buf, count: int) -> RaggedBytes:
    hlen = int.from_bytes(bytes(buf[:4]), "little")
    lengths = decode_delta(memoryview(buf)[4 : 4 + hlen], np.int64)
    offsets = np.zeros(count + 1, dtype=np.int64)
    np.cumsum(lengths[:count], out=offsets[1:])
    data = np.frombuffer(buf, dtype=np.uint8, count=int(offsets[-1]), offset=4 + hlen)
    return RaggedBytes(offsets, data)


_POWERS64 = np.uint64(1) << np.arange(64, dtype=np.uint64)


def shared_prefix_lengths(col: RaggedBytes, cap: int = PREFIX_CAP) -> np.ndarray:
    """prefix[i] = len of common prefix of value i and value i-1 (prefix[0]=0),
    capped at ``cap``. Fully vectorized: adjacent rows are compared as
    zero-padded little-endian u64 WORDS (shared sliding-view gather); the
    first differing byte inside the first differing word falls out of the
    XOR's lowest set bit. Identical results to a per-byte matrix compare."""
    n = len(col)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    lens = col.lengths
    cap = min(cap, int(lens.max()) if n else 0) or 1
    nwords = (cap + 7) // 8
    cl = np.minimum(lens, cap)  # bytes beyond cap are masked: never compared
    words = padded_words(col.data, col.offsets[:-1], cl, nwords)
    dw = words[1:] ^ words[:-1]  # (n-1, nwords)
    nzw = dw != 0
    any_neq = nzw.any(axis=1)
    widx = nzw.argmax(axis=1)
    vals = dw[np.arange(n - 1), widx]
    lsb = vals & (~vals + np.uint64(1))
    bitpos = np.searchsorted(_POWERS64, lsb, side="right") - 1
    first = np.where(any_neq, widx * 8 + bitpos // 8, cap)
    pair_min = np.minimum(lens[1:], lens[:-1])
    out = np.zeros(n, dtype=np.int64)
    out[1:] = np.minimum(first, pair_min)
    return out


def encode_delta_byte_array(col: RaggedBytes, cap: int = PREFIX_CAP) -> bytes:
    prefixes = shared_prefix_lengths(col, cap)
    lens = col.lengths
    suf_lens = lens - prefixes
    # suffix bytes: for value i, bytes [offsets[i]+prefix[i], offsets[i+1])
    suf_off = np.zeros(len(col) + 1, dtype=np.int64)
    np.cumsum(suf_lens, out=suf_off[1:])
    total = int(suf_off[-1])
    gather = np.repeat(col.offsets[:-1] + prefixes - suf_off[:-1], suf_lens) + np.arange(
        total, dtype=np.int64
    )
    suffixes = RaggedBytes(suf_off, col.data[gather])
    head = encode_delta(prefixes.astype(np.int32))
    body = encode_delta_length(suffixes)
    return len(head).to_bytes(4, "little") + head + body


def decode_delta_byte_array(buf, count: int) -> RaggedBytes:
    """Stateful reconstruction (needs previous value,
    RequiresPreviousReader.java:23). The prefix-copy recursion is sequential by
    nature; we resolve it vectorized by chasing prefix *provenance*: byte j of
    value i either comes from the suffix stream or from value i-1's byte j —
    which itself resolves to the nearest earlier value whose suffix covers j.
    Implemented as a per-column-position scan over the (n, maxlen) index grid.
    """
    hlen = int.from_bytes(bytes(buf[:4]), "little")
    prefixes = decode_delta(memoryview(buf)[4 : 4 + hlen], np.int64)[:count]
    suffixes = decode_delta_length(memoryview(buf)[4 + hlen :], count)
    suf_lens = suffixes.lengths
    lens = prefixes + suf_lens
    offsets = np.zeros(count + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    out = np.zeros(int(offsets[-1]), dtype=np.uint8)
    # place suffix bytes
    total_suf = int(suf_lens.sum())
    if total_suf:
        dst = np.repeat(offsets[:-1] + prefixes - suffixes.offsets[:-1], suf_lens) + np.arange(
            total_suf, dtype=np.int64
        )
        out[dst] = suffixes.data
    # resolve prefix bytes by provenance: byte j of value i (j < prefix[i])
    # equals byte j of the nearest earlier value a with prefix[a] <= j — and
    # for THAT value byte j is a suffix byte, already placed above. The
    # encoder guarantees prefix[i] <= len(value i-1), so j < len(a) holds
    # along the chain. One maximum.accumulate per byte position j.
    maxp = int(prefixes.max()) if count else 0
    row_ids = np.arange(count, dtype=np.int64)
    for j in range(maxp):
        need = prefixes > j
        if not need.any():
            continue
        anc = np.maximum.accumulate(np.where(need, np.int64(-1), row_ids))
        rows = np.flatnonzero(need)
        out[offsets[rows] + j] = out[offsets[anc[rows]] + j]
    return RaggedBytes(offsets, out)
