"""Pure-NumPy baseline JPEG codec (decoder + minimal encoder).

A web crawl's image bulk is JPEG, and this container has no image libraries,
so — like :mod:`pq_engine.pipeline.png` (r5) — the codec is implemented from
the public specification (ITU-T T.81 / ISO 10918-1): marker segments, DQT /
SOF0 / DHT / DRI / SOS parsing, canonical Huffman entropy decode with a
16-bit lookup table, differential DC + run-length AC coefficient decode,
dequantization, 8x8 type-III DCT via a precomputed orthonormal basis matrix
(batched over every block of a component with one einsum), sampling-factor
upsampling and JFIF YCbCr->RGB conversion.

Scope (declared, validated with clear errors): baseline sequential DCT
(SOF0), 8-bit samples, 1 or 3 components, sampling factors 1 or 2, restart
markers supported. Progressive (SOF2), arithmetic coding, 12-bit, 4-component
(Adobe CMYK) and hierarchical streams raise ``ValueError`` naming the field —
the same declared-scope discipline as the PNG codec; callers fall back to the
deterministic fake for those.

The encoder exists so tests and the driver gate can build deterministic
JPEGs: forward DCT + quantization are vectorized over all blocks at once,
and the Huffman tables are built PER IMAGE from real symbol frequencies with
package-merge length-limited (<=16) codes — the all-ones codeword is kept
unused via a sentinel symbol, as T.81 requires. With a flat (all-ones)
quantization table, blocks whose DCT is exactly integral (block-constant
values, or the +/- checkerboard of the (4,4) basis function scaled by 8)
round-trip bit-exactly, which is what lets the driver oracle hash-check true
decoded pixel statistics in closed-form SQL despite JPEG being lossy in
general.

Reference behavior parity: parquet-java has no image codec; this module
serves the multimodal pipeline operators (SURVEY.md LLM-data-pipeline
section), mirroring how pipeline/png.py closed the r4 media-decode stub.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------- constants

_ZZ = np.empty(64, dtype=np.int64)  # _ZZ[i] = raster index of i-th zigzag cell


def _build_zigzag() -> None:
    i = 0
    for s in range(15):
        rng = range(min(s, 7), max(0, s - 7) - 1, -1) if s % 2 == 0 else range(
            max(0, s - 7), min(s, 7) + 1
        )
        for r in rng:
            _ZZ[i] = r * 8 + (s - r)
            i += 1


_build_zigzag()

# orthonormal DCT-II basis: B[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_X = np.arange(8)
_B = 0.5 * np.cos((2 * _X[None, :] + 1) * _X[:, None] * np.pi / 16)
_B[0] *= 1 / np.sqrt(2)

# Annex K.1 example quantization tables (spec constants), raster order
_QLUM = np.array(
    [16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99],
    dtype=np.int64)
_QCHR = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    dtype=np.int64)


def quant_tables(quality: int | None) -> tuple[np.ndarray, np.ndarray]:
    """(luma, chroma) quantization tables in raster order. ``None`` -> flat
    all-ones tables (lossless for DCT-exact blocks); an int 1..100 scales the
    Annex K examples with the usual libjpeg-style quality curve."""
    if quality is None:
        one = np.ones(64, dtype=np.int64)
        return one, one.copy()
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    lum = np.clip((_QLUM * scale + 50) // 100, 1, 255)
    chr_ = np.clip((_QCHR * scale + 50) // 100, 1, 255)
    return lum, chr_


# --------------------------------------------------------------- DCT

def fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) level-shifted samples -> (n, 8, 8) DCT coefficients."""
    return np.einsum("ux,nxy,vy->nuv", _B, blocks, _B, optimize=True)


def idct_blocks(coefs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficients -> (n, 8, 8) samples (pre-shift)."""
    return np.einsum("ux,nuv,vy->nxy", _B, coefs, _B, optimize=True)


# --------------------------------------------------------------- huffman

class _HuffDecoder:
    """Canonical Huffman decoder: 16-bit prefix LUT (sym, code length)."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.sym_lut = np.zeros(1 << 16, dtype=np.uint8)
        self.len_lut = np.zeros(1 << 16, dtype=np.uint8)
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                if code >> length:
                    raise ValueError("JPEG DHT: code overflow (invalid counts)")
                lo = code << (16 - length)
                hi = (code + 1) << (16 - length)
                self.sym_lut[lo:hi] = symbols[k]
                self.len_lut[lo:hi] = length
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over an unstuffed entropy-coded segment."""

    __slots__ = ("buf", "pos", "nbits")

    def __init__(self, data: bytes):
        self.buf = data + b"\x00\x00\x00\x00"
        self.pos = 0
        self.nbits = len(data) * 8

    def peek16(self) -> int:
        byte = self.pos >> 3
        v = int.from_bytes(self.buf[byte : byte + 4], "big")
        return (v >> (16 - (self.pos & 7))) & 0xFFFF

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        v = self.peek16() >> (16 - n)
        self.pos += n
        if self.pos > self.nbits:
            raise ValueError("JPEG entropy-coded segment truncated")
        return v

    def decode(self, table: _HuffDecoder) -> int:
        v = self.peek16()
        length = int(table.len_lut[v])
        if length == 0:
            raise ValueError("JPEG entropy decode: invalid Huffman code")
        self.pos += length
        if self.pos > self.nbits:
            raise ValueError("JPEG entropy-coded segment truncated")
        return int(table.sym_lut[v])


def _extend(v: int, size: int) -> int:
    # T.81 F.2.2.1: low `size` bits -> signed value
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# --------------------------------------------------------------- decoder

def _parse_segments(buf: bytes):
    """Yield (marker, payload) up to SOS; then ('scan', header, pos) once."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI marker")
    pos = 2
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"JPEG marker expected at offset {pos}")
        marker = buf[pos + 1]
        (length,) = struct.unpack_from(">H", buf, pos + 2)
        payload = buf[pos + 4 : pos + 2 + length]
        if len(payload) != length - 2:
            raise ValueError("JPEG segment truncated")
        if marker == 0xDA:  # SOS: payload is the scan header; data follows
            yield "scan", payload, pos + 2 + length
            return
        yield marker, payload, None
        pos += 2 + length
    raise ValueError("JPEG missing SOS")


_UNSUPPORTED_SOF = {
    0xC1: "extended sequential (SOF1)", 0xC2: "progressive (SOF2)",
    0xC3: "lossless (SOF3)", 0xC5: "differential sequential (SOF5)",
    0xC6: "differential progressive (SOF6)", 0xC7: "differential lossless (SOF7)",
    0xC9: "arithmetic sequential (SOF9)", 0xCA: "arithmetic progressive (SOF10)",
    0xCB: "arithmetic lossless (SOF11)",
}


def _split_scan(buf: bytes, pos: int) -> list[bytes]:
    """Split entropy-coded data into restart segments, unstuffing 0xFF00."""
    segs, cur = [], bytearray()
    n = len(buf)
    while pos < n:
        b = buf[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        nxt = buf[pos + 1] if pos + 1 < n else 0xD9
        if nxt == 0x00:  # stuffed literal 0xFF
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= nxt <= 0xD7:  # restart marker
            segs.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:  # EOI or any other marker ends the scan
            break
    segs.append(bytes(cur))
    return segs


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Decode a baseline JPEG byte string -> (H, W, C) uint8 array (C = 1
    grayscale or 3 RGB). Raises ValueError outside the declared scope."""
    buf = bytes(buf)
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffDecoder] = {}
    sof = None
    restart_interval = 0
    scan_header = None
    scan_pos = None
    for marker, payload, pos in _parse_segments(buf):
        if marker == "scan":
            scan_header, scan_pos = payload, pos
        elif marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise ValueError("unsupported JPEG: 16-bit quant table")
                q = np.frombuffer(payload, dtype=np.uint8, count=64, offset=p + 1)
                tbl = np.zeros(64, dtype=np.int64)
                tbl[_ZZ] = q  # DQT stores zigzag order -> raster
                qtables[tq] = tbl
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                counts = list(payload[p + 1 : p + 17])
                nsym = sum(counts)
                symbols = payload[p + 17 : p + 17 + nsym]
                htables[(tc, th)] = _HuffDecoder(counts, symbols)
                p += 17 + nsym
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, ncomp = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec} (8 only)")
            if ncomp not in (1, 3):
                raise ValueError(
                    f"unsupported JPEG component count {ncomp} (1 or 3)")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", payload, 6 + 3 * i)
                ch, cv = hv >> 4, hv & 0xF
                if ch not in (1, 2) or cv not in (1, 2):
                    raise ValueError(
                        f"unsupported JPEG sampling factors {ch}x{cv}")
                comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
            sof = (h, w, comps)
        elif marker in _UNSUPPORTED_SOF:
            raise ValueError(f"unsupported JPEG: {_UNSUPPORTED_SOF[marker]}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", payload, 0)
        elif marker == 0xCC:
            raise ValueError("unsupported JPEG: arithmetic conditioning (DAC)")
        # APPn / COM / others: skipped
    if sof is None:
        raise ValueError("JPEG missing SOF0 frame header")
    h, w, comps = sof

    ns = scan_header[0]
    if ns != len(comps):
        raise ValueError("unsupported JPEG: multi-scan frame")
    order = []
    for i in range(ns):
        cid, tda = scan_header[1 + 2 * i], scan_header[2 + 2 * i]
        comp = next(c for c in comps if c["id"] == cid)
        comp["dc"] = htables.get((0, tda >> 4))
        comp["ac"] = htables.get((1, tda & 0xF))
        if comp["dc"] is None or comp["ac"] is None:
            raise ValueError("JPEG scan references undefined Huffman table")
        order.append(comp)

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcus_x * c["h"]
        c["bh"] = mcus_y * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32)

    total_mcus = mcus_x * mcus_y
    segments = _split_scan(buf, scan_pos)
    per_seg = restart_interval or total_mcus
    mcu = 0
    for seg in segments:
        if mcu >= total_mcus:
            break
        br = _BitReader(seg)
        preds = {c["id"]: 0 for c in comps}
        for _ in range(min(per_seg, total_mcus - mcu)):
            my, mx = divmod(mcu, mcus_x)
            for c in order:
                for v in range(c["v"]):
                    for u in range(c["h"]):
                        blk = np.zeros(64, dtype=np.int32)
                        s = br.decode(c["dc"])
                        if s > 11:
                            raise ValueError("JPEG DC category > 11")
                        preds[c["id"]] += _extend(br.read(s), s)
                        blk[0] = preds[c["id"]]
                        k = 1
                        while k < 64:
                            rs = br.decode(c["ac"])
                            run, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if run == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            blk[k] = _extend(br.read(size), size)
                            k += 1
                        by, bx = my * c["v"] + v, mx * c["h"] + u
                        c["coef"][by * c["bw"] + bx] = blk
            mcu += 1
    if mcu < total_mcus:
        raise ValueError(
            f"JPEG scan ended after {mcu}/{total_mcus} MCUs (truncated)")

    planes = []
    for c in comps:
        q = qtables.get(c["tq"])
        if q is None:
            raise ValueError("JPEG component references undefined quant table")
        deq = np.zeros((len(c["coef"]), 64), dtype=np.float64)
        deq[:, _ZZ] = c["coef"] * q[_ZZ]  # zigzag coefs -> raster, dequantized
        px = idct_blocks(deq.reshape(-1, 8, 8)) + 128.0
        px = np.clip(np.round(px), 0, 255).astype(np.uint8)
        plane = (
            px.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return planes[0][:, :, None]
    y, cb, cr = (p.astype(np.float64) for p in planes)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --------------------------------------------------------------- encoder

def _huff_lengths(freqs: dict[int, int], max_len: int = 16) -> dict[int, int]:
    """Package-merge length-limited Huffman code lengths. A sentinel symbol
    (256, frequency 0 -> sorts cheapest, lands on the deepest code) reserves
    the all-ones codeword T.81 forbids; it is dropped by the caller."""
    items = sorted((f, (s,)) for s, f in freqs.items())
    n = len(items)
    if n == 0:
        return {}
    if n == 1:
        return {items[0][1][0]: 1}
    if n > (1 << max_len):
        raise ValueError("too many symbols for code length limit")
    prev: list[tuple[int, tuple[int, ...]]] = []
    for _ in range(max_len):
        merged = sorted(items + prev)
        prev = [
            (merged[i][0] + merged[i + 1][0], merged[i][1] + merged[i + 1][1])
            for i in range(0, len(merged) - 1, 2)
        ]
    lengths: dict[int, int] = {}
    for _, syms in prev[: n - 1]:
        for s in syms:
            lengths[s] = lengths.get(s, 0) + 1
    return lengths


class _HuffEncoder:
    """Canonical codes from per-image frequencies; emits its own DHT body."""

    def __init__(self, freqs: dict[int, int]):
        f = {s: max(c, 1) for s, c in freqs.items()}
        f[256] = 0  # sentinel: reserves the all-ones code
        lengths = _huff_lengths(f)
        # canonical order: (length, symbol); sentinel 256 sorts after every
        # real symbol of its (maximal) length -> real codes are never all-ones
        ordered = sorted(lengths, key=lambda s: (lengths[s], s))
        self.codes: dict[int, tuple[int, int]] = {}
        counts = [0] * 16
        symbols = bytearray()
        code, prev_len = 0, 0
        for s in ordered:
            length = lengths[s]
            code <<= length - prev_len
            prev_len = length
            if s != 256:
                self.codes[s] = (code, length)
                counts[length - 1] += 1
                symbols.append(s)
            code += 1
        self.dht_body = bytes(counts) + bytes(symbols)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)  # pad 1s
        return bytes(self.out)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _block_symbols(blk: np.ndarray, pred: int) -> tuple[list, int]:
    """Quantized zigzag block -> [(is_dc, symbol, extra_bits, nbits)...]."""
    toks = []
    diff = int(blk[0]) - pred
    s = _category(diff)
    toks.append((True, s, diff if diff >= 0 else diff + (1 << s) - 1, s))
    run = 0
    nz = np.nonzero(blk[1:])[0]
    last = int(nz[-1]) + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(blk[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            toks.append((False, 0xF0, 0, 0))  # ZRL
            run -= 16
        s = _category(v)
        toks.append((False, (run << 4) | s, v if v >= 0 else v + (1 << s) - 1, s))
        run = 0
    if last < 63:
        toks.append((False, 0x00, 0, 0))  # EOB
    return toks, int(blk[0])


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """(H8, W8) uint8 plane -> (bh*bw, 64) quant-ready zigzag DCT input."""
    h8, w8 = plane.shape
    blocks = (
        plane.reshape(h8 // 8, 8, w8 // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
    )
    return fdct_blocks(blocks - 128.0).reshape(-1, 64)


def encode_jpeg(
    img: np.ndarray,
    quality: int | None = None,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode (H, W) grayscale or (H, W, 3) RGB uint8 -> baseline JPEG.

    ``quality=None`` uses flat all-ones quantization tables (DCT-exact
    blocks round-trip bit-identically); 1..100 scales the Annex K tables.
    ``subsample``: '444' or '420' (chroma box-averaged 2x2). Huffman tables
    are built per image from real symbol frequencies (length-limited 16).
    """
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nc = img.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg: 1 or 3 channels only")
    if subsample not in ("444", "420"):
        raise ValueError("encode_jpeg: subsample must be '444' or '420'")
    qlum, qchr = quant_tables(quality)

    if nc == 3:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = np.round(0.299 * r + 0.587 * g + 0.114 * b)
        cb = np.round(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b)
        cr = np.round(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b)
        planes = [np.clip(p, 0, 255) for p in (y, cb, cr)]
        sub = subsample == "420" and nc == 3
        samp = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1), (1, 1), (1, 1)]
    else:
        planes = [img[:, :, 0].astype(np.float64)]
        samp = [(1, 1)]
        sub = False
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    comps = []
    for ci, (plane, (ch, cv)) in enumerate(zip(planes, samp)):
        if ci > 0 and sub:
            # chroma box average at half resolution (pad to even first)
            pe = np.pad(plane, ((0, h % 2), (0, w % 2)), mode="edge")
            plane = (pe[0::2, 0::2] + pe[0::2, 1::2]
                     + pe[1::2, 0::2] + pe[1::2, 1::2]) / 4.0
        ph, pw = plane.shape
        th, tw = mcus_y * cv * 8, mcus_x * ch * 8
        plane = np.pad(plane, ((0, th - ph), (0, tw - pw)), mode="edge")
        q = qlum if ci == 0 else qchr
        coef = _plane_blocks(np.clip(np.round(plane), 0, 255).astype(np.uint8))
        qz = np.round(coef[:, _ZZ] / q[_ZZ]).astype(np.int32)  # raster->zigzag
        comps.append({"id": ci + 1, "h": ch, "v": cv, "tq": 0 if ci == 0 else 1,
                      "td": 0 if ci == 0 else 1, "qz": qz, "bw": tw // 8})

    # pass 1: tokenize in MCU order, collecting per-class symbol frequencies
    freqs = {(0, 0): {}, (1, 0): {}, (0, 1): {}, (1, 1): {}}
    all_toks: list[list] = []
    per_seg = restart_interval or (mcus_x * mcus_y)
    preds = {c["id"]: 0 for c in comps}
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu % restart_interval == 0 and mcu:
            preds = {c["id"]: 0 for c in comps}
        my, mx = divmod(mcu, mcus_x)
        for c in comps:
            for v in range(c["v"]):
                for u in range(c["h"]):
                    by, bx = my * c["v"] + v, mx * c["h"] + u
                    blk = c["qz"][by * c["bw"] + bx]
                    toks, preds[c["id"]] = _block_symbols(blk, preds[c["id"]])
                    all_toks.append((c["td"], toks))
                    for is_dc, sym, _, _ in toks:
                        f = freqs[(0 if is_dc else 1, c["td"])]
                        f[sym] = f.get(sym, 0) + 1
    tables = {k: _HuffEncoder(f) for k, f in freqs.items() if f}

    # pass 2: emit entropy-coded bits, restart markers between intervals
    body = bytearray()
    bw_ = _BitWriter()
    blocks_per_mcu = sum(c["h"] * c["v"] for c in comps)
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu % restart_interval == 0 and mcu:
            body += bw_.flush()
            body += bytes([0xFF, 0xD0 + ((mcu // restart_interval - 1) % 8)])
            bw_ = _BitWriter()
        for td, toks in all_toks[
            mcu * blocks_per_mcu : (mcu + 1) * blocks_per_mcu
        ]:
            for is_dc, sym, extra, nbits in toks:
                code, length = tables[(0 if is_dc else 1, td)].codes[sym]
                bw_.write(code, length)
                if nbits:
                    bw_.write(extra, nbits)
    body += bw_.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zz_lum = np.zeros(64, dtype=np.uint8)
    zz_lum[:] = qlum[_ZZ]
    out += _seg(0xDB, b"\x00" + zz_lum.tobytes())
    if nc == 3:
        zz_chr = np.zeros(64, dtype=np.uint8)
        zz_chr[:] = qchr[_ZZ]
        out += _seg(0xDB, b"\x01" + zz_chr.tobytes())
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += _seg(0xC0, sof)
    for (tc, th), enc in sorted(tables.items(), key=lambda kv: kv[0]):
        out += _seg(0xC4, bytes([(tc << 4) | th]) + enc.dht_body)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for c in comps:
        sos += bytes([c["id"], (c["td"] << 4) | c["td"]])
    sos += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0
    out += _seg(0xDA, sos)
    out += body
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def jpeg_stats(buf: bytes) -> dict:
    """Decode + summarize: height, width, channels, per-channel means —
    the typed-feature payload the pipeline queries consume."""
    img = decode_jpeg(buf)
    h, w, c = img.shape
    means = img.reshape(-1, c).mean(axis=0, dtype=np.float64)
    return {"height": h, "width": w, "channels": c,
            "means": [float(m) for m in means]}
