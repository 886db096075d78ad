"""Sampled per-batch statistics and codec auto-selection.

Replaces parquet-java's *streaming* fallback machinery
(/root/reference/parquet-column/.../values/fallback/FallbackValuesWriter.java:28-216 —
dict-first, measure after page 1, replay into fallback writer) with an
*up-front sampled* decision: compute cheap vectorized stats on (a sample of)
the column batch, pick the codec, encode once. The reference's safety rail is
kept verbatim in spirit: if the chosen encoding is not smaller than PLAIN, the
page is re-encoded PLAIN (``isCompressionSatisfying`` :81-92), so encoded size
never exceeds the universal fallback.

Decision outcomes mirror DefaultV2ValuesWriterFactory
(/root/reference/.../values/factory/DefaultV2ValuesWriterFactory.java):
dictionary first for every type; INT32/INT64 fall back to
DELTA_BINARY_PACKED (:116-148), BINARY to DELTA_BYTE_ARRAY / FSST (ours),
FLOAT/DOUBLE to BYTE_STREAM_SPLIT when a page compressor is layered, else
PLAIN (:160-192), BOOLEAN to RLE (:77-84).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .kernels.dictionary import dict_encoded_size, factorize_bytes, factorize_numeric
from .kernels.ragged import RaggedBytes, padded_words

DICT_PAGE_SIZE_THRESHOLD = 1 << 20  # ParquetProperties.java:51 (1 MiB)
SAMPLE_ROWS = 2048


@dataclass
class ColumnStats:
    n: int
    ndv_est: int
    ndv_ratio: float
    sortedness: float  # fraction of non-negative deltas (numeric) / non-desc steps
    run_ratio: float  # n_runs / n  (low → long runs)
    avg_len: float  # bytes per value (ragged), itemsize otherwise
    dict_bytes_est: int  # estimated dictionary page size
    byte_entropy: float  # sample byte entropy in bits (ragged only, else 8)
    prefix_share: float = 0.0  # mean adjacent shared-prefix / mean length (ragged)


def numeric_stats(values: np.ndarray) -> ColumnStats:
    n = len(values)
    if n == 0:
        return ColumnStats(0, 0, 0.0, 1.0, 0.0, values.dtype.itemsize, 0, 8.0)
    step = max(1, n // SAMPLE_ROWS)
    s = values[::step]
    if values.dtype.kind == "f":
        sb = s.view(np.uint32 if values.dtype == np.float32 else np.uint64)
        uniq = np.unique(sb)
    else:
        uniq = np.unique(s)
    ndv_ratio = len(uniq) / len(s)
    ndv_est = min(n, int(ndv_ratio * n) + 1)
    if len(s) > 1 and values.dtype.kind in "iu":
        d = np.diff(s.astype(np.int64, copy=False))
        sortedness = float((d >= 0).mean())
        run_ratio = float((d != 0).mean())
    elif len(s) > 1:
        run_ratio = float((s[1:] != s[:-1]).mean())
        sortedness = 0.0
    else:
        sortedness, run_ratio = 1.0, 1.0
    return ColumnStats(
        n=n,
        ndv_est=ndv_est,
        ndv_ratio=ndv_ratio,
        sortedness=sortedness,
        run_ratio=run_ratio,
        avg_len=values.dtype.itemsize,
        dict_bytes_est=int(ndv_est * values.dtype.itemsize),
        byte_entropy=8.0,
    )


def fixed_stats(values: np.ndarray) -> ColumnStats:
    """Stats for a fixed[k] (FLBA) batch: sampled unique-rows NDV; run ratio
    from adjacent row equality."""
    n = len(values)
    k = values.shape[1] if values.ndim == 2 else 0
    if n == 0:
        return ColumnStats(0, 0, 0.0, 0.0, 1.0, float(k), 0, 8.0)
    step = max(1, n // SAMPLE_ROWS)
    s = values[::step]
    uniq = len(np.unique(s, axis=0))
    ndv_ratio = uniq / len(s)
    ndv_est = min(n, int(ndv_ratio * n) + 1) if ndv_ratio > 0.5 else min(n, 2 * uniq)
    run_ratio = float((s[1:] != s[:-1]).any(axis=1).mean()) if len(s) > 1 else 1.0
    return ColumnStats(
        n=n,
        ndv_est=ndv_est,
        ndv_ratio=ndv_ratio,
        sortedness=0.0,
        run_ratio=run_ratio,
        avg_len=float(k),
        dict_bytes_est=int(ndv_est * k),
        byte_entropy=8.0,
    )


_FNV_PRIME = np.uint64(0x100000001B3)
_FNV_BASIS = np.uint64(0xCBF29CE484222325)
_HASH_EXACT_CAP = 128  # bytes hashed exactly per value; longer values add
# 16 length-derived tail probes (an estimator, like the row sampling itself)


def _sample_row_hashes(col: RaggedBytes, idx: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Vectorized u64 content hash of rows ``idx``: FNV over (length, first
    128 bytes as words, 16 probe words spread over the tail for longer
    values). Exact discrimination for values <= 128 bytes; longer values
    differing only outside the probed positions may collide — acceptable for
    a sampled NDV/run estimator, and the exact dict build plus the PLAIN
    size rail still bound the encoded output."""
    offs = col.offsets[:-1][idx]
    data = col.data
    k = len(idx)
    h = (lens.astype(np.uint64) ^ _FNV_BASIS) * _FNV_PRIME
    maxlen = int(lens.max()) if k else 0
    # one ragged gather builds a zero-padded (k, nwords*8) byte matrix; the
    # per-word FNV steps are then masked row updates over contiguous words —
    # identical hash values to the former 16-pass ragged loop (pure integer
    # ops, same word bytes, same update order) at ~1/10 the index traffic
    nwords = (min(maxlen, _HASH_EXACT_CAP) + 7) // 8
    nd = len(data)
    if nwords:
        # whole-u64-word build via the shared sliding-view gather — bit-
        # identical words to the former per-byte zero-padded 16-pass loop
        cl = np.minimum(lens, nwords * 8)
        nw_rows = (cl + 7) // 8  # words applied per row
        words = padded_words(data, offs, cl, nwords)
        for wi in range(nwords):
            h = np.where(nw_rows > wi, (h ^ words[:, wi]) * _FNV_PRIME, h)
    if maxlen > _HASH_EXACT_CAP:
        long_rows = np.flatnonzero(lens > _HASH_EXACT_CAP)
        ll = lens[long_rows]
        lo = offs[long_rows]
        ks = np.arange(1, 17, dtype=np.int64)  # k=16 pins the final 8 bytes
        p = _HASH_EXACT_CAP + ((ll[:, None] - _HASH_EXACT_CAP) * ks[None, :]) // 16
        p = np.minimum(p, (ll - 8)[:, None])
        sliding = np.ndarray((nd - 7,), dtype=np.uint64, buffer=data, strides=(1,))
        words16 = sliding[lo[:, None] + p]  # p <= len-8: always fully in-row
        hl = h[long_rows]
        for j in range(16):
            hl = (hl ^ words16[:, j]) * _FNV_PRIME
        h[long_rows] = hl
    return h


def ragged_stats(col: RaggedBytes, text_metrics: bool = True) -> ColumnStats:
    """``text_metrics=False`` skips byte_entropy and prefix_share (and their
    sample-byte scans): with a page compressor layered, choose_codec's
    string/binary branch returns after the dictionary check and never reads
    either field, so the caller can drop ~1/3 of the stats cost with zero
    decision drift. Keep the default for the lightweight-encoding-only mode
    (fsst/dba selection reads both)."""
    n = len(col)
    if n == 0:
        return ColumnStats(0, 0, 0.0, 1.0, 1.0, 0.0, 0, 8.0)
    # cap the sample by BYTES too: for blob columns (html ~4 KB/value) a
    # 2048-row sample copies+hashes ~8 MB per batch — a quarter of the whole
    # encode cost for stats alone. ~2 MB of sampled bytes decides the codec
    # just as well (measured identical outcomes on the bench table).
    lens_all = col.lengths  # one np.diff; the property recomputes per call
    avg = float(lens_all.mean())
    target_rows = min(SAMPLE_ROWS, max(64, int((2 << 20) / max(avg, 1.0))))
    step = max(1, n // target_rows)
    idx = np.arange(0, n, step)
    lens_idx = lens_all[idx]
    # hash-based codes instead of materializing the sample + exact factorize:
    # identical first-seen codes whenever the hash discriminates (verified to
    # give identical decisions on every bench/test table). Short values
    # (<= 31 B) keep the exact multiword factorize — it is the cheaper path.
    import pandas as pd

    ent_data = None
    if int(lens_idx.max()) <= 31:
        sample = col if step == 1 else col.take(idx)
        codes = factorize_bytes(sample)[0]
        if text_metrics:
            ent_data = sample.data[: 1 << 14]
    else:
        codes = pd.factorize(
            _sample_row_hashes(col, idx, lens_idx), use_na_sentinel=False
        )[0]
    k = len(idx)
    nuniq = int(codes.max()) + 1 if k else 0
    ndv_ratio = nuniq / k
    # birthday-style NDV scale-up: if the sample saw near-all-distinct, assume
    # distinct at full size too; if it saturated, keep the absolute count
    ndv_est = min(n, int(ndv_ratio * n) + 1) if ndv_ratio > 0.5 else min(n, 2 * nuniq)
    run_ratio = float((codes[1:] != codes[:-1]).mean()) if k > 1 else 1.0
    avg_len = avg
    # byte entropy over the first 16 KiB of the sampled rows' bytes (same
    # bytes the materialized sample would have started with)
    entropy = 8.0
    if text_metrics:
        if ent_data is None:
            csum = np.cumsum(lens_idx)
            m = int(np.searchsorted(csum, 1 << 14)) + 1
            chunks = [col.data[col.offsets[i] : col.offsets[i + 1]] for i in idx[:m]]
            ent_data = np.concatenate(chunks)[: 1 << 14] if chunks else np.zeros(0, np.uint8)
        data = ent_data
        if len(data):
            counts = np.bincount(data, minlength=256).astype(np.float64)
            p = counts[counts > 0] / len(data)
            entropy = float(-(p * np.log2(p)).sum())
        else:
            entropy = 0.0
    # unique-row byte total from first-occurrence lengths (no byte copies)
    if nuniq:
        first = np.zeros(nuniq, dtype=np.int64)
        first[codes[::-1]] = np.arange(k - 1, -1, -1, dtype=np.int64)
        dict_bytes_est = int(lens_idx[first].sum()) + 4 * nuniq
    else:
        dict_bytes_est = 0
    # scale sample-dictionary size up to the estimated full-batch NDV
    dict_bytes_est = int(dict_bytes_est * ndv_est / max(nuniq, 1))
    prefix_share = 0.0
    if text_metrics:
        from .kernels.deltastrings import shared_prefix_lengths

        # adjacency matters for prefix share — use a contiguous slice, not a
        # stride; byte-capped like the stride sample
        head_rows = min(n, target_rows)
        head = RaggedBytes(
            col.offsets[: head_rows + 1], col.data[: col.offsets[head_rows]]
        )
        pl = shared_prefix_lengths(head)
        prefix_share = float(pl.mean() / max(avg_len, 1.0)) if len(pl) else 0.0
    return ColumnStats(
        n=n,
        ndv_est=ndv_est,
        ndv_ratio=ndv_ratio,
        sortedness=0.0,
        run_ratio=run_ratio,
        avg_len=avg_len,
        dict_bytes_est=dict_bytes_est,
        byte_entropy=entropy,
        prefix_share=prefix_share,
    )


def choose_codec(ptype: str, st: ColumnStats, page_compression: str | None = None) -> str:
    """Pick the page codec for a column batch. ``ptype`` ∈ {bool,int32,int64,
    timestamp_us,float32,float64,string,binary,fixed}."""
    if ptype == "bool":
        return "rle"
    n = max(st.n, 1)
    if ptype in ("int32", "int64", "timestamp_us", "timestamp_ntz_us", "date32"):
        plain = n * st.avg_len
        if st.dict_bytes_est < DICT_PAGE_SIZE_THRESHOLD and dict_encoded_size(
            n, st.ndv_est, st.dict_bytes_est
        ) < 0.75 * plain:
            return "dict"
        # near-sorted or low-cardinality-delta data → frame-of-reference
        if st.sortedness > 0.9 or st.ndv_ratio < 0.3:
            return "delta"
        return "delta"  # delta never loses much on ints; PLAIN rail catches regressions
    if ptype in ("float32", "float64"):
        plain = n * st.avg_len
        if st.dict_bytes_est < DICT_PAGE_SIZE_THRESHOLD and dict_encoded_size(
            n, st.ndv_est, st.dict_bytes_est
        ) < 0.75 * plain:
            return "dict"
        return "bss" if page_compression else "plain"
    if ptype in ("string", "binary"):
        # cheapest non-dict alternative: DLBA ≈ data bytes + ~0.5B/value of
        # packed lengths (PLAIN adds a full 4B/value prefix)
        alt = n * st.avg_len + 0.5 * n
        if st.dict_bytes_est < DICT_PAGE_SIZE_THRESHOLD and dict_encoded_size(
            n, st.ndv_est, st.dict_bytes_est
        ) < 0.85 * alt:
            return "dict"
        if page_compression:
            # a general-purpose page compressor (reference analog: SNAPPY/GZIP
            # per page, CompressionCodecName.java) does the heavy lifting at
            # ~100-500 MB/s/core; length-delta passthrough feeds it best and
            # keeps the encode compute-bound (scales with cores, not DRAM)
            return "dlba"
        # lightweight-encoding-only mode (parity with the reference's
        # encoding-level comparisons):
        # sorted-url-like data → incremental prefix encoding
        if st.prefix_share > 0.4:
            return "dba"
        # high-NDV text: FSST if byte distribution is skewed enough to pay;
        # random/binary-looking payloads go length-delta passthrough
        if st.byte_entropy < 6.5 and st.avg_len >= 8:
            return "fsst"
        return "dlba"
    if ptype.startswith("fixed["):
        # FLBA (wide decimals / UUID / FLOAT16 / INT96): dictionary first
        # (DefaultV2ValuesWriterFactory FLBA path), BSS under a page
        # compressor (planes of wide decimals are mostly sign bytes), PLAIN
        # otherwise
        plain = n * st.avg_len
        if st.dict_bytes_est < DICT_PAGE_SIZE_THRESHOLD and dict_encoded_size(
            n, st.ndv_est, st.dict_bytes_est
        ) < 0.75 * plain:
            return "dict"
        return "bss" if page_compression else "plain"
    return "plain"
