"""Per-codec unit round-trips mirroring the reference's test strategy
(SURVEY.md §5: TestRunLengthBitPackingHybridEncoder, TestDictionary,
DeltaBinaryPackingValuesWriterForIntegerTest, TestDeltaByteArray,
ByteStreamSplitValues*Test, TestBitPackingColumn — /root/reference/parquet-column/src/test/)."""

import numpy as np
import pytest

from pq_engine.kernels import bitpack, rle, plain, dictionary, delta, bytestream, deltastrings
from pq_engine.kernels.ragged import RaggedBytes
from pq_engine.kernels.varint import (
    encode_uvarint,
    read_uvarint,
    zigzag_decode,
    zigzag_encode,
)

RNG = np.random.default_rng(0)


# ---------------------------------------------------------------- varint


def test_uvarint_roundtrip():
    for v in [0, 1, 127, 128, 300, 2**31, 2**63, 2**64 - 1]:
        buf = encode_uvarint(v)
        got, pos = read_uvarint(buf, 0)
        assert got == v and pos == len(buf)


def test_uvarint_golden():
    # classic LEB128 goldens
    assert encode_uvarint(0) == b"\x00"
    assert encode_uvarint(1) == b"\x01"
    assert encode_uvarint(127) == b"\x7f"
    assert encode_uvarint(128) == b"\x80\x01"
    assert encode_uvarint(300) == b"\xac\x02"


def test_zigzag():
    for v in [0, -1, 1, -2, 2, 2**62, -(2**62), 2**63 - 1, -(2**63)]:
        assert zigzag_decode(zigzag_encode(v)) == v
    assert zigzag_encode(0) == 0
    assert zigzag_encode(-1) == 1
    assert zigzag_encode(1) == 2
    assert zigzag_encode(-2) == 3


# ---------------------------------------------------------------- bitpack
# mirrors TestBitPackingColumn: every width, lengths not multiple of 8 handled
# by callers padding; here exact multiples + value extremes per width


@pytest.mark.parametrize("width", list(range(0, 65)))
def test_bitpack_roundtrip_all_widths(width):
    n = 64
    hi = (1 << width) - 1 if width else 0
    vals = RNG.integers(0, hi + 1, size=n, dtype=np.uint64) if width else np.zeros(n, np.uint64)
    if width:
        vals[0] = 0
        vals[1] = hi  # extremes
    buf = bitpack.pack(vals, width)
    assert len(buf) == n * width // 8
    out = bitpack.unpack(buf, width, n)
    np.testing.assert_array_equal(out, vals)


def test_bitpack_golden_width3():
    # parquet-format spec example: values 0..7 at width 3, LSB-first →
    # 0b10001000 0b11000110 0b11111010 = 0x88 0xC6 0xFA
    vals = np.arange(8, dtype=np.uint64)
    assert bitpack.pack(vals, 3) == bytes([0x88, 0xC6, 0xFA])


def test_width_for_max():
    assert bitpack.width_for_max(0) == 0
    assert bitpack.width_for_max(1) == 1
    assert bitpack.width_for_max(7) == 3
    assert bitpack.width_for_max(8) == 4
    assert bitpack.width_for_max(2**32 - 1) == 32


# ---------------------------------------------------------------- RLE hybrid
# mirrors TestRunLengthBitPackingHybridEncoder.java:44-287


def _rt_rle(vals, width):
    buf = rle.encode_hybrid(np.asarray(vals, dtype=np.uint64), width)
    out = rle.decode_hybrid(buf, width, len(vals))
    np.testing.assert_array_equal(out, np.asarray(vals, dtype=np.uint64))
    return buf


def test_rle_only_run():
    # 100 repeats of 4 at width 3 → single rle-run: varint(200) + value byte
    buf = _rt_rle([4] * 100, 3)
    assert buf == encode_uvarint(100 << 1) + b"\x04"


def test_rle_bitpacked_only():
    vals = [0, 1, 2, 3, 4, 5, 6, 7] * 2  # no run >= 8
    buf = _rt_rle(vals, 3)
    # one bit-packed run: header varint(2<<1|1)=5, then 2 groups * 3 bytes
    assert buf[0] == 5
    assert len(buf) == 1 + 6


def test_rle_mode_transitions():
    vals = [1] * 20 + [0, 1, 2, 3, 4, 5, 6, 7] + [5] * 9 + [2, 3] * 4
    _rt_rle(vals, 3)


def test_rle_504_value_overflow():
    # >504 packed values must split runs (encoder cap 63 groups)
    vals = list(range(8)) * 80  # 640 values, no repeats >= 8
    buf = _rt_rle(vals, 3)
    # first header must declare 63 groups
    assert buf[0] == ((63 << 1) | 1)


def test_rle_width_zero():
    buf = _rt_rle([0] * 1000, 0)
    assert buf == encode_uvarint(1000 << 1)


def test_rle_misaligned_run_borrow():
    # run of 9 starting at offset 3: 5 borrowed? no — 5 needed to align → run 9-5=4 <8 → all packed
    vals = [0, 1, 2] + [7] * 9 + [1, 2, 3, 0]
    _rt_rle(vals, 3)
    # run of 20 starting at offset 3: borrow 5, rle 15
    vals = [0, 1, 2] + [7] * 20 + [1] * 5
    buf = _rt_rle(vals, 3)


def test_rle_final_group_zero_padding():
    # 5 trailing packed values → final group zero-padded, decode must stop at count
    vals = [1, 2, 3, 4, 5]
    _rt_rle(vals, 3)


def test_rle_empty():
    assert rle.encode_hybrid(np.zeros(0, np.uint64), 3) == b""
    assert len(rle.decode_hybrid(b"", 3, 0)) == 0


def test_rle_random_roundtrip():
    for seed in range(5):
        rng = np.random.default_rng(seed)
        vals = rng.integers(0, 4, size=3001, dtype=np.uint64)
        _rt_rle(vals, 2)


def test_bool_rle():
    vals = RNG.integers(0, 2, size=999).astype(bool)
    out = rle.decode_bool_rle(rle.encode_bool_rle(vals), len(vals))
    np.testing.assert_array_equal(out, vals)


def test_rle_length_prefixed():
    vals = np.array([3] * 50 + [1, 2] * 10, dtype=np.uint64)
    buf = rle.encode_hybrid_length_prefixed(vals, 2)
    out, consumed = rle.decode_hybrid_length_prefixed(buf, 2, len(vals))
    assert consumed == len(buf)
    np.testing.assert_array_equal(out, vals)


# ---------------------------------------------------------------- PLAIN


@pytest.mark.parametrize("dtype", [np.int32, np.int64, np.float32, np.float64])
def test_plain_numeric(dtype):
    vals = RNG.integers(-1000, 1000, size=257).astype(dtype)
    out = plain.decode_plain_numeric(plain.encode_plain_numeric(vals), dtype, len(vals))
    np.testing.assert_array_equal(out, vals)


def test_plain_bytes_roundtrip():
    col = RaggedBytes.from_pylist([b"hello", b"", b"\x00\x01", b"x" * 300])
    buf = plain.encode_plain_bytes(col)
    # golden: u32 len + bytes
    assert buf[:9] == (5).to_bytes(4, "little") + b"hello"
    out = plain.decode_plain_bytes(buf, len(col))
    assert out == col


def test_plain_bool():
    vals = np.array([True, False, True, True, False] * 7)
    out = plain.decode_plain_bool(plain.encode_plain_bool(vals), len(vals))
    np.testing.assert_array_equal(out, vals)


def test_plain_fixed():
    mat = RNG.integers(0, 256, size=(40, 16)).astype(np.uint8)
    out = plain.decode_plain_fixed(plain.encode_plain_fixed(mat), 16, 40)
    np.testing.assert_array_equal(out, mat)


# ---------------------------------------------------------------- dictionary
# mirrors TestDictionary.java:119-785


def test_dict_first_seen_order():
    col = RaggedBytes.from_pylist([b"b", b"a", b"b", b"c", b"a"])
    codes, uniques = dictionary.factorize_bytes(col)
    np.testing.assert_array_equal(codes, [0, 1, 0, 2, 1])
    assert uniques.to_pylist() == [b"b", b"a", b"c"]


def test_dict_long_strings_first_seen():
    vals = [b"x" * 20, b"y" * 30, b"x" * 20, b"z" * 10]
    codes, uniques = dictionary.factorize_bytes(RaggedBytes.from_pylist(vals))
    np.testing.assert_array_equal(codes, [0, 1, 0, 2])
    assert uniques.to_pylist() == [b"x" * 20, b"y" * 30, b"z" * 10]


def test_dict_trailing_nul_disambiguation():
    vals = [b"a", b"a\x00", b"", b"\x00"]
    codes, uniques = dictionary.factorize_bytes(RaggedBytes.from_pylist(vals))
    assert len(set(codes.tolist())) == 4
    assert uniques.to_pylist() == vals


def test_dict_multiword_matches_object_path():
    """8-31 B values take the vectorized multiword path (no per-row Python,
    VERDICT r3 #3) — codes and first-seen order must be identical to the
    object fallback, including trailing-NUL and boundary widths."""
    import pandas as pd

    rng = np.random.default_rng(7)
    pool = (
        [b"h%011d.com" % i for i in range(40)]           # 16 B (W=3)
        + [b"label-%02d" % i for i in range(10)]          # 8 B (W=2 boundary)
        + [b"x" * 31, b"x" * 30, b"y" * 24, b"y" * 23]    # width edges
        + [b"pad\x00\x00\x00\x00\x00tail", b"pad\x00\x00\x00\x00\x00tai"]
    )
    vals = [pool[i] for i in rng.integers(0, len(pool), 5000)]
    col = RaggedBytes.from_pylist(vals)
    codes, uniques = dictionary.factorize_bytes(col)
    exp_codes, exp_uniques = pd.factorize(
        pd.Series(vals, dtype=object), use_na_sentinel=False
    )
    np.testing.assert_array_equal(codes, exp_codes.astype(np.int64))
    assert uniques.to_pylist() == list(exp_uniques)


def test_dict_multiword_mixed_short_long():
    """A batch mixing <=7 B and 8-31 B values still factorizes correctly
    (the whole batch takes the widest-value word count)."""
    vals = [b"a", b"abcdefgh" * 2, b"a", b"b" * 31, b"", b"abcdefgh" * 2]
    codes, uniques = dictionary.factorize_bytes(RaggedBytes.from_pylist(vals))
    np.testing.assert_array_equal(codes, [0, 1, 0, 2, 3, 1])
    assert uniques.to_pylist() == [b"a", b"abcdefgh" * 2, b"b" * 31, b""]


def test_dict_numeric_roundtrip():
    vals = np.array([5, 5, 7, 5, 9, 7] * 100, dtype=np.int64)
    codes, uniques = dictionary.factorize_numeric(vals)
    np.testing.assert_array_equal(uniques, [5, 7, 9])
    page = dictionary.encode_dict_data_page(codes, len(uniques) - 1)
    out_codes = dictionary.decode_dict_data_page(page, len(vals))
    np.testing.assert_array_equal(uniques[out_codes], vals)


def test_dict_nan_bit_preservation():
    # TestDictionary.java:476,696 — NaN payload bits survive
    a = np.uint64(0x7FF8000000000001)
    b = np.uint64(0x7FF8000000000FFF)
    vals = np.array([a, b, a], dtype=np.uint64).view(np.float64)
    codes, uniques = dictionary.factorize_numeric(vals)
    assert len(uniques) == 2
    decoded = uniques[codes]
    np.testing.assert_array_equal(decoded.view(np.uint64), vals.view(np.uint64))


def test_dict_negative_zero():
    vals = np.array([0.0, -0.0, 0.0], dtype=np.float64)
    codes, uniques = dictionary.factorize_numeric(vals)
    assert len(uniques) == 2  # raw bits differ
    np.testing.assert_array_equal(uniques[codes].view(np.uint64), vals.view(np.uint64))


def test_dict_page_roundtrip_bytes():
    uniques = RaggedBytes.from_pylist([b"aa", b"bb", b"c" * 50])
    buf = dictionary.encode_dict_page_bytes(uniques)
    out = dictionary.decode_dict_page_bytes(buf, 3)
    assert out == uniques


def test_dict_single_value():
    vals = np.full(100, 42, dtype=np.int32)
    codes, uniques = dictionary.factorize_numeric(vals)
    page = dictionary.encode_dict_data_page(codes, 0)
    assert page[0] == 0  # bitWidth 0
    out = dictionary.decode_dict_data_page(page, 100)
    np.testing.assert_array_equal(uniques[out], vals)


# ---------------------------------------------------------------- delta
# mirrors DeltaBinaryPackingValuesWriterForIntegerTest.java:43-240


def _rt_delta(vals, dtype=np.int64):
    arr = np.asarray(vals, dtype=dtype)
    buf = delta.encode_delta(arr)
    out = delta.decode_delta(buf, dtype)
    np.testing.assert_array_equal(out, arr)
    return buf


@pytest.mark.parametrize("n", [0, 1, 2, 127, 128, 129, 255, 256, 257, 1000, 128 * 5, 128 * 5 + 1])
def test_delta_lengths(n):
    rng = np.random.default_rng(n)
    _rt_delta(rng.integers(-(2**40), 2**40, size=n), np.int64)
    _rt_delta(rng.integers(-(2**30), 2**30, size=n), np.int32)


def test_delta_constant_series():
    _rt_delta([7] * 500)


def test_delta_constant_delta_ramp():
    _rt_delta(np.arange(1000) * 37 + 5)
    buf = _rt_delta(np.arange(1024, dtype=np.int64))
    # monotone +1 ramp: all deltas 1, minDelta 1, widths all 0 → tiny output
    assert len(buf) < 80


def test_delta_int64_extremes_overflow():
    lo, hi = np.iinfo(np.int64).min, np.iinfo(np.int64).max
    _rt_delta([lo, hi, lo, hi, 0, -1, 1])


def test_delta_negative_deltas():
    _rt_delta(np.arange(500)[::-1].copy())


def test_delta_sorted_timestamps():
    rng = np.random.default_rng(42)
    ts = 1735689600_000_000 + np.cumsum(rng.integers(0, 2_000_000, size=10_000))
    buf = _rt_delta(ts)
    plain_size = len(ts) * 8
    assert len(buf) < plain_size * 0.5  # frame-of-reference must beat PLAIN


# ---------------------------------------------------------------- BSS


@pytest.mark.parametrize("dtype", [np.float32, np.float64, np.int32, np.int64])
def test_bss_roundtrip(dtype):
    vals = (RNG.standard_normal(333) * 1e6).astype(dtype)
    out = bytestream.decode_bss(bytestream.encode_bss(vals), dtype, len(vals))
    np.testing.assert_array_equal(out.view(np.uint8), vals.view(np.uint8))


def test_bss_golden_layout():
    vals = np.array([0x04030201, 0x08070605], dtype=np.uint32).view(np.int32)
    # byte plane 0 = [01, 05], plane 1 = [02, 06], ...
    assert bytestream.encode_bss(vals) == bytes([1, 5, 2, 6, 3, 7, 4, 8])


def test_bss_fixed():
    mat = RNG.integers(0, 256, size=(10, 4)).astype(np.uint8)
    out = bytestream.decode_bss_fixed(bytestream.encode_bss(mat), 4, 10)
    np.testing.assert_array_equal(out, mat)


# ---------------------------------------------------------------- delta strings
# mirrors TestDeltaByteArray.java:38-135


def _rt_dlba(values):
    col = RaggedBytes.from_pylist(values)
    out = deltastrings.decode_delta_length(deltastrings.encode_delta_length(col), len(col))
    assert out == col


def _rt_dba(values):
    col = RaggedBytes.from_pylist(values)
    out = deltastrings.decode_delta_byte_array(
        deltastrings.encode_delta_byte_array(col), len(col)
    )
    assert out == col
    return col


def test_delta_length_roundtrip():
    _rt_dlba([b"hello", b"", b"worlds", b"\xff\x00"])
    _rt_dlba([])


def test_delta_byte_array_roundtrip():
    _rt_dba([b"parquet-mr", b"parquet", b"parquet-format", b"", b"parquet-x"])


def test_delta_byte_array_sorted_urls():
    urls = sorted(
        f"https://example{i % 50}.com/path/{i}/page".encode() for i in range(2000)
    )
    col = _rt_dba(urls)
    enc = deltastrings.encode_delta_byte_array(col)
    raw = int(col.lengths.sum())
    assert len(enc) < raw * 0.7  # prefix sharing must pay off on sorted urls


def test_delta_byte_array_empty_strings():
    _rt_dba([b"", b"", b"a", b"", b"ab", b"abc", b""])


def test_delta_byte_array_long_chain():
    # all-identical values → maximal prefix chains (provenance resolution)
    _rt_dba([b"same-prefix-string"] * 1000)


def test_delta_byte_array_prefix_cap():
    long = b"p" * 5000
    _rt_dba([long + b"a", long + b"b", long + b"c"])


def test_shared_prefix_lengths():
    col = RaggedBytes.from_pylist([b"abc", b"abd", b"ab", b"xyz", b"xyz"])
    np.testing.assert_array_equal(
        deltastrings.shared_prefix_lengths(col), [0, 2, 2, 0, 3]
    )


# ---------------------------------------------------------------- ragged utils


def test_ragged_take():
    col = RaggedBytes.from_pylist([b"aa", b"b", b"", b"cccc"])
    out = col.take(np.array([3, 0, 2]))
    assert out.to_pylist() == [b"cccc", b"aa", b""]


def test_ragged_arrow_roundtrip():
    import pyarrow as pa

    arr = pa.array(["foo", "", "barbaz"], type=pa.string())
    col = RaggedBytes.from_arrow(arr)
    assert col.to_pylist() == [b"foo", b"", b"barbaz"]
    back = col.to_arrow()
    assert back.to_pylist() == ["foo", "", "barbaz"]


def test_md5_ragged_matches_hashlib():
    import hashlib

    import numpy as np

    from pq_engine.kernels.md5 import md5_ragged
    from pq_engine.kernels.ragged import RaggedBytes

    rng = np.random.default_rng(0)
    vals = [bytes(rng.integers(0, 256, int(l))) for l in rng.integers(0, 300, 500)]
    vals += [b"", b"a" * 55, b"a" * 56, b"a" * 63, b"a" * 64, b"a" * 65, b"x" * 1000]
    got = md5_ragged(RaggedBytes.from_pylist(vals)).to_pylist()
    assert got == [hashlib.md5(v).hexdigest().encode() for v in vals]
