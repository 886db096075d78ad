"""Baseline JPEG codec tests (r6, VERDICT r5 next #5).

The decoder is proven against hand-assembled T.81 spec bytes and a naive
textbook double-loop DCT (independent of the codec's einsum matrix path),
not only against our own encoder.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pq_engine.pipeline.jpeg import (
    _ZZ,
    _BitReader,
    _HuffDecoder,
    _HuffEncoder,
    _huff_lengths,
    decode_jpeg,
    encode_jpeg,
    fdct_blocks,
    idct_blocks,
    jpeg_stats,
    quant_tables,
)


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def test_zigzag_matches_spec_prefix():
    # T.81 figure 5 zigzag sequence, first 16 raster indices
    want = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5]
    assert _ZZ[:16].tolist() == want
    assert sorted(_ZZ.tolist()) == list(range(64))  # permutation
    assert _ZZ[63] == 63


def test_idct_fdct_match_naive_textbook():
    """Spec formula A.3.3 computed with per-pixel double loops must match the
    einsum matrix implementation."""
    rng = np.random.default_rng(3)
    coefs = rng.integers(-200, 200, (4, 8, 8)).astype(np.float64)

    def c(u):
        return 1 / np.sqrt(2) if u == 0 else 1.0

    naive = np.zeros_like(coefs)
    for n in range(4):
        for x in range(8):
            for y in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        s += (
                            c(u) * c(v) * coefs[n, u, v]
                            * np.cos((2 * x + 1) * u * np.pi / 16)
                            * np.cos((2 * y + 1) * v * np.pi / 16)
                        )
                naive[n, x, y] = s / 4
    assert np.allclose(idct_blocks(coefs), naive, atol=1e-9)
    # fdct is its exact inverse on the nose (orthonormal basis)
    assert np.allclose(fdct_blocks(idct_blocks(coefs)), coefs, atol=1e-9)


def test_decode_hand_assembled_spec_bytes():
    """A complete 8x8 grayscale JPEG assembled byte-by-byte from the spec:
    flat quant, custom 1-code Huffman tables, one DC diff of +16 (category
    5, bits 10000) and an EOB. Every pixel must decode to exactly 130."""
    dqt = b"\x00" + bytes([1] * 64)
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    # DC table: single symbol 5 with code '0' (length 1)
    dht_dc = b"\x00" + bytes([1] + [0] * 15) + bytes([5])
    # AC table: single symbol 0x00 (EOB) with code '0'
    dht_ac = b"\x10" + bytes([1] + [0] * 15) + bytes([0x00])
    sos = bytes([1, 1, 0x00]) + b"\x00\x3f\x00"
    # bits: DC code '0', diff bits '10000' (=16 -> pixel 128+16/8=130), EOB '0'
    # -> 0100000 + pad '1' = 0x41
    data = bytes([0x41])
    jpg = (
        b"\xff\xd8"
        + _seg(0xDB, dqt)
        + _seg(0xC0, sof)
        + _seg(0xC4, dht_dc)
        + _seg(0xC4, dht_ac)
        + _seg(0xDA, sos)
        + data
        + b"\xff\xd9"
    )
    img = decode_jpeg(jpg)
    assert img.shape == (8, 8, 1)
    assert (img == 130).all()


def _grayish(h, w, block_vals, ac=0):
    """Grayscale-RGB image of 8x8 blocks: value v per block plus the +/-
    checkerboard of the (4,4) DCT basis scaled to integer exactness."""
    sx = np.array([1, -1, -1, 1, 1, -1, -1, 1])
    patt = np.outer(sx, sx)
    out = np.zeros((h, w), np.int64)
    k = 0
    for by in range(h // 8):
        for bx in range(w // 8):
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                block_vals[k] + ac * patt
            )
            k += 1
    return np.repeat(out[:, :, None], 3, axis=2).astype(np.uint8)


def test_exact_roundtrip_flat_quant_444():
    img = _grayish(16, 16, [90, 98, 106, 114])
    out = decode_jpeg(encode_jpeg(img, quality=None, subsample="444"))
    assert np.array_equal(out, img)


def test_exact_roundtrip_420_with_ac_and_restarts():
    """4:2:0 MCU interleave + ZRL-coded AC energy + restart markers, still
    bit-exact: DCT of v + 8*checkerboard is integral under flat quant."""
    img = _grayish(16, 32, [80 + 8 * i for i in range(8)], ac=8)
    buf = encode_jpeg(img, quality=None, subsample="420", restart_interval=1)
    assert b"\xff\xd0" in buf or b"\xff\xd1" in buf  # real RST markers
    out = decode_jpeg(buf)
    assert np.array_equal(out, img)


def test_lossy_roundtrip_within_tolerance():
    rng = np.random.default_rng(11)
    base = rng.integers(40, 210, (4, 6, 3))
    img = np.kron(base, np.ones((8, 8, 1))).astype(np.uint8)
    # 4:2:0's worst pixels sit on hard chroma edges (this image is ALL hard
    # edges — pathological for subsampling); 4:4:4 q95 must be near-exact
    for q, sub, tol, mtol in ((95, "444", 4, 1.0), (85, "420", 48, 6.0)):
        out = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
        assert out.shape == img.shape
        err = np.abs(out.astype(int) - img.astype(int))
        assert err.max() <= tol
        assert err.mean() <= mtol


def test_grayscale_and_nonmultiple_of_8_sizes():
    g = (np.arange(13)[:, None] * 9 % 200 + np.arange(21)[None, :]).astype(
        np.uint8
    )
    out = decode_jpeg(encode_jpeg(g, quality=92))
    assert out.shape == (13, 21, 1)
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).max() <= 3
    # odd size through 4:2:0 (chroma pad + subsample + crop)
    rgb = np.repeat(g[:, :, None], 3, axis=2)
    out2 = decode_jpeg(encode_jpeg(rgb, quality=92, subsample="420"))
    assert out2.shape == (13, 21, 3)


def test_huffman_tables_reserve_all_ones():
    rng = np.random.default_rng(5)
    freqs = {int(s): int(f) for s, f in zip(
        rng.choice(256, 40, replace=False), rng.integers(1, 5000, 40))}
    enc = _HuffEncoder(freqs)
    for sym, (code, length) in enc.codes.items():
        assert code != (1 << length) - 1, "all-ones code must stay reserved"
        assert 1 <= length <= 16
    # kraft completeness minus exactly the reserved sentinel slot
    counts = list(enc.dht_body[:16])
    kraft = sum(c / (1 << (i + 1)) for i, c in enumerate(counts))
    assert kraft < 1.0
    # decoder LUT built from the emitted DHT body round-trips every code
    dec = _HuffDecoder(counts, enc.dht_body[16:])
    for sym, (code, length) in enc.codes.items():
        probe = code << (16 - length)
        assert int(dec.sym_lut[probe]) == sym
        assert int(dec.len_lut[probe]) == length


def test_package_merge_respects_length_limit():
    # pathological skew that unlimited Huffman would push past 16 levels
    freqs = {i: 1 << i for i in range(24)}
    lengths = _huff_lengths({s: f for s, f in freqs.items()}, max_len=16)
    assert max(lengths.values()) <= 16
    assert sum(2.0 ** -l for l in lengths.values()) <= 1.0 + 1e-12


def test_declared_scope_errors():
    img = _grayish(8, 8, [100])
    good = encode_jpeg(img, quality=None)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"nope" + good)
    # flip SOF0 -> SOF2: progressive must be refused by name
    prog = good.replace(b"\xff\xc0", b"\xff\xc2")
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(prog)
    with pytest.raises(ValueError, match="truncated|MCU"):
        decode_jpeg(good[:-12])
    with pytest.raises(ValueError, match="sampling"):
        # corrupt the luma sampling factors to 3x1
        idx = good.index(b"\xff\xc0")
        bad = bytearray(good)
        bad[idx + 11] = 0x31
        decode_jpeg(bytes(bad))


def test_bitreader_truncation_guard():
    br = _BitReader(b"\xab")
    assert br.read(8) == 0xAB
    with pytest.raises(ValueError, match="truncated"):
        br.read(1)


def test_quality_scaling_monotone():
    l50, c50 = quant_tables(50)
    l90, _ = quant_tables(90)
    assert (l90 <= l50).all() and l90.min() >= 1
    img = np.kron(
        np.random.default_rng(2).integers(0, 255, (4, 4, 3)),
        np.ones((8, 8, 1)),
    ).astype(np.uint8)
    assert len(encode_jpeg(img, 30)) <= len(encode_jpeg(img, 95))


def test_extract_features_real_jpeg_path(spark):
    """deterministic_fake=False returns TRUE pixel statistics for baseline
    JPEG blobs (r6); progressive JPEGs fall back to the fake, not a crash."""
    from pq_engine.pipeline.multimodal import extract_features

    rows = []
    for i in range(5):
        img = _grayish(16, 16, [30 + i, 40 + i, 50 + i, 60 + i], ac=4)
        rows.append((i, bytearray(encode_jpeg(img, quality=None))))
    prog = bytearray(
        encode_jpeg(_grayish(8, 8, [99])).replace(b"\xff\xc0", b"\xff\xc2")
    )
    rows.append((77, prog))
    df = spark.createDataFrame(rows, "doc_id long, html binary")
    got = {r.doc_id: r.features for r in extract_features(
        df, deterministic_fake=False).collect()}
    for i in range(5):
        f = got[i]
        assert f[0] == 16.0 and f[1] == 16.0 and f[2] == 3.0
        assert f[3] == pytest.approx(45 + i)  # mean of the four block values
        assert f[3] == f[4] == f[5]  # grayscale RGB
    assert got[77] is not None and got[77][0] != 8.0  # fake fallback


def test_jpeg_stats_payload():
    img = _grayish(16, 24, [100, 110, 120, 130, 140, 150])
    st = jpeg_stats(encode_jpeg(img, quality=None))
    assert st["height"] == 16 and st["width"] == 24 and st["channels"] == 3
    assert st["means"] == [pytest.approx(125.0)] * 3
