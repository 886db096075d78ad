"""Pure-NumPy PNG codec (decoder + minimal encoder).

This container has no image libraries (PIL/ffmpeg), but PNG's only heavy
dependency is DEFLATE — which the stdlib ``zlib`` provides. Everything else
is chunk walking + per-row unfiltering, implemented here from the public
PNG specification (RFC 2083 / W3C PNG): 8-byte signature, length-prefixed
CRC-checked chunks, IHDR geometry, concatenated IDAT zlib stream, and the
five row filters (None/Sub/Up/Average/Paeth).

Scope (declared, validated with clear errors): 8-bit samples, color types
0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), no interlacing.
That covers the PNGs a web-crawl pipeline actually meets in bulk; 16-bit
and Adam7 raise ``ValueError`` naming the unsupported field.

Vectorization: filters None/Sub/Up unfilter as whole-row numpy ops (Sub via
per-channel cumsum). Average/Paeth carry a true sequential dependency on
the left-neighbor RECONSTRUCTED pixel, so they advance one pixel position
per step but all channels at once — O(W) numpy slice ops per such row, no
per-byte Python. The encoder can emit any filter per row (``filter_cycle``
cycles through all five), which the tests use to force every decode path.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunks(buf: bytes):
    if buf[:8] != _SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    while pos + 8 <= len(buf):
        (length,) = struct.unpack_from(">I", buf, pos)
        ctype = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError(f"PNG chunk {ctype!r} truncated")
        (crc,) = struct.unpack_from(">I", buf, pos + 8 + length)
        if crc != zlib.crc32(ctype + data) & 0xFFFFFFFF:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, data
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("PNG missing IEND")


def _unfilter_sub(row: np.ndarray, bpp: int) -> np.ndarray:
    # recon[x] = filt[x] + recon[x-bpp]: per-channel prefix sum mod 256
    px = row.reshape(-1, bpp).astype(np.int64)
    return (np.cumsum(px, axis=0) & 0xFF).astype(np.uint8).reshape(-1)

def _unfilter_avg(row: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    filt = row.reshape(-1, bpp).astype(np.int16)
    up = prev.reshape(-1, bpp).astype(np.int16)
    out = np.zeros_like(filt)
    left = np.zeros(bpp, dtype=np.int16)
    for x in range(filt.shape[0]):  # sequential in x, vector across channels
        left = (filt[x] + ((left + up[x]) >> 1)) & 0xFF
        out[x] = left
    return out.astype(np.uint8).reshape(-1)


def _unfilter_paeth(row: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    filt = row.reshape(-1, bpp).astype(np.int16)
    up = prev.reshape(-1, bpp).astype(np.int16)
    out = np.zeros_like(filt)
    left = np.zeros(bpp, dtype=np.int16)
    ul = np.zeros(bpp, dtype=np.int16)
    for x in range(filt.shape[0]):
        p = left + up[x] - ul
        pa, pb, pc = np.abs(p - left), np.abs(p - up[x]), np.abs(p - ul)
        pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up[x], ul))
        left = (filt[x] + pred) & 0xFF
        out[x] = left
        ul = up[x]
    return out.astype(np.uint8).reshape(-1)


def decode_png(buf: bytes) -> np.ndarray:
    """Decode a PNG byte string -> (H, W, C) uint8 array (palette expanded
    to RGB). Raises ValueError on anything outside the declared scope."""
    ihdr = None
    plte = None
    idat = []
    for ctype, data in _chunks(bytes(buf)):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype_id, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (8 only)")
    if ctype_id not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {ctype_id}")
    if comp != 0 or filt != 0:
        raise ValueError("unsupported PNG compression/filter method")
    if interlace != 0:
        raise ValueError("unsupported PNG interlacing (Adam7)")
    if not idat:
        raise ValueError("PNG missing IDAT")
    bpp = _CHANNELS[ctype_id]
    stride = w * bpp
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"PNG pixel data size {len(raw)} != expected {h * (stride + 1)}"
        )
    rows = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft, row = int(rows[y, 0]), rows[y, 1:]
        if ft == 0:
            rec = row.copy()
        elif ft == 1:
            rec = _unfilter_sub(row, bpp)
        elif ft == 2:
            rec = ((row.astype(np.int16) + prev) & 0xFF).astype(np.uint8)
        elif ft == 3:
            rec = _unfilter_avg(row, prev, bpp)
        elif ft == 4:
            rec = _unfilter_paeth(row, prev, bpp)
        else:
            raise ValueError(f"bad PNG filter type {ft} in row {y}")
        out[y] = rec
        prev = rec
    img = out.reshape(h, w, bpp)
    if ctype_id == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        idx = img[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("PNG palette index out of range")
        img = plte[idx]
    return img


# ------------------------------------------------------------------ encoder


def _filter_row(rec: np.ndarray, prev: np.ndarray, bpp: int, ft: int) -> np.ndarray:
    r = rec.astype(np.int16)
    left = np.zeros_like(r)
    left[bpp:] = r[:-bpp]
    up = prev.astype(np.int16)
    ul = np.zeros_like(up)
    ul[bpp:] = up[:-bpp]
    if ft == 0:
        out = r
    elif ft == 1:
        out = r - left
    elif ft == 2:
        out = r - up
    elif ft == 3:
        out = r - ((left + up) >> 1)
    else:  # paeth
        p = left + up - ul
        pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
        pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul))
        out = r - pred
    return (out & 0xFF).astype(np.uint8)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, filter_cycle: bool = False, level: int = 6) -> bytes:
    """Encode an (H, W) or (H, W, C) uint8 array as PNG. C of 1/2/3/4 maps
    to gray / gray+alpha / RGB / RGBA. ``filter_cycle=True`` filters row y
    with type y % 5 — deliberately exercising every unfilter path — else
    all rows use Sub (a solid default for synthetic gradients)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    ctype_id = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    flat = img.reshape(h, w * c)
    body = bytearray()
    prev = np.zeros(w * c, dtype=np.uint8)
    for y in range(h):
        ft = (y % 5) if filter_cycle else 1
        body.append(ft)
        body += _filter_row(flat[y], prev, c, ft).tobytes()
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype_id, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(body), level))
        + _chunk(b"IEND", b"")
    )


def png_stats(buf: bytes) -> dict:
    """Decode + summarize: height, width, channels, per-channel means —
    the typed-feature payload the pipeline queries consume."""
    img = decode_png(buf)
    h, w, c = img.shape
    means = img.reshape(-1, c).mean(axis=0, dtype=np.float64)
    return {"height": h, "width": w, "channels": c,
            "means": [float(m) for m in means]}
