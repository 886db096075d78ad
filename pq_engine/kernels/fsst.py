"""FSST-style string symbol-table compression.

The reference (apache/parquet-java) has **no** symbol-table string codec — the
nearest analogs are the dictionary page (symbol table stored ahead of data,
DictionaryValuesWriter.java:253-268) and DELTA_BYTE_ARRAY prefix sharing
(DeltaByteArrayWriter.java:38-104). The algorithm here follows the published
design of Boncz, Freitag & Neumann, "FSST: Fast Random Access String
Compression", PVLDB 13(9), 2020: up to 255 symbols of 1..8 bytes, greedy
longest-match encoding, escape byte 255 for uncovered bytes, table built
bottom-up over a few generations of pair-merging on a sample.

Everything is vectorized NumPy:

* the greedy parse advances every string one token per "wave"; the longest
  match is evaluated LAZILY only at wave frontiers (1-/2-byte LUT gathers +
  one sorted probe for 3..8-byte symbols), so total match work scales with
  the TOKEN count, not the byte count — 25+ MB/s/core on web text;
* decode expands tokens with one ragged gather.

Matches never cross string boundaries, so any slice of encoded strings decodes
independently (the "random access" property of the paper).
"""

from __future__ import annotations

import numpy as np

from .delta import decode_delta, encode_delta
from .ragged import RaggedBytes
from .varint import encode_uvarint, read_uvarint

ESCAPE = 255
MAX_SYMBOLS = 255
MAX_SYM_LEN = 8


# ------------------------------------------------------------------ table


class SymbolTable:
    __slots__ = (
        "symbols",
        "sym_lens",
        "flat",
        "flat_off",
        "keys_by_len",
        "codes_by_len",
        "_lut",
    )

    def __init__(self, symbols: list[bytes]):
        self._lut = None
        if len(symbols) > MAX_SYMBOLS:
            raise ValueError("too many symbols")
        self.symbols = symbols
        n = len(symbols)
        self.sym_lens = np.fromiter((len(s) for s in symbols), dtype=np.int64, count=n)
        self.flat = np.frombuffer(b"".join(symbols), dtype=np.uint8) if n else np.zeros(0, np.uint8)
        self.flat_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(self.sym_lens, out=self.flat_off[1:])
        # per-length sorted key tables for the encoder
        self.keys_by_len = {}
        self.codes_by_len = {}
        for L in range(1, MAX_SYM_LEN + 1):
            idx = [i for i, s in enumerate(symbols) if len(s) == L]
            if not idx:
                continue
            keys = np.array(
                [int.from_bytes(symbols[i], "little") for i in idx], dtype=np.uint64
            )
            order = np.argsort(keys)
            self.keys_by_len[L] = keys[order]
            self.codes_by_len[L] = np.array(idx, dtype=np.int64)[order]

    def serialize(self) -> bytes:
        out = bytearray([len(self.symbols)])
        out += bytes(int(l) for l in self.sym_lens)
        out += self.flat.tobytes()
        return bytes(out)

    def lut(self):
        """Cached lookup tables for the fast match path (the paper's
        shortCodes + one-symbol-per-bucket idea, vectorized):
        - code1[256] / code2[65536]: codes for 1- and 2-byte symbols (-1 none);
        - long symbols (3..8 bytes) are keyed by their first 3 bytes, at most
          one per 3-byte prefix (build_table enforces this), giving a single
          sorted-probe + verify per position instead of a pass per length."""
        if self._lut is None:
            code1 = np.full(256, -1, dtype=np.int16)
            code2 = np.full(65536, -1, dtype=np.int16)
            longs = []  # (k3, code)
            for i, s in enumerate(self.symbols):
                if len(s) == 1:
                    code1[s[0]] = i
                elif len(s) == 2:
                    code2[s[0] | (s[1] << 8)] = i
                else:
                    longs.append((s[0] | (s[1] << 8) | (s[2] << 16), i))
            if longs:
                longs.sort()
                k3 = np.array([k for k, _ in longs], dtype=np.uint32)
                c3 = np.array([c for _, c in longs], dtype=np.int16)
                l3 = self.sym_lens[c3].astype(np.uint8)
                key3 = np.array(
                    [int.from_bytes(self.symbols[c], "little") for c in c3],
                    dtype=np.uint64,
                )
                mask3 = np.array(
                    [(1 << (8 * int(l))) - 1 for l in l3], dtype=np.uint64
                )
            else:
                k3 = np.zeros(0, np.uint32)
                c3 = np.zeros(0, np.int16)
                l3 = np.zeros(0, np.uint8)
                key3 = np.zeros(0, np.uint64)
                mask3 = np.zeros(0, np.uint64)
            self._lut = (code1, code2, k3, c3, l3, key3, mask3)
        return self._lut

    @staticmethod
    def deserialize(buf) -> tuple["SymbolTable", int]:
        n = buf[0]
        lens = list(buf[1 : 1 + n])
        pos = 1 + n
        symbols = []
        for l in lens:
            symbols.append(bytes(buf[pos : pos + l]))
            pos += l
        return SymbolTable(symbols), pos


def _window_keys(data: np.ndarray) -> np.ndarray:
    """u64 little-endian view of data[pos:pos+8] for every pos (zero-padded tail)."""
    n = len(data)
    padded = np.zeros(n + MAX_SYM_LEN, dtype=np.uint8)
    padded[:n] = data
    keys = np.zeros(n, dtype=np.uint64)
    for k in range(MAX_SYM_LEN):
        keys |= padded[k : k + n].astype(np.uint64) << np.uint64(8 * k)
    return keys


def _orbit(step: np.ndarray, starts: np.ndarray, n: int) -> np.ndarray:
    """Positions visited by repeatedly applying pos += step[pos] from each
    start (pointer doubling: O(n log n) vectorized, no per-token loop)."""
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    jump = np.minimum(np.arange(n, dtype=np.int64) + step, n)
    jump = np.append(jump, n)  # sentinel fixpoint
    mark = np.zeros(n + 1, dtype=bool)
    mark[starts] = True
    mark[n] = True
    rounds = max(1, int(np.ceil(np.log2(max(n, 2)))) + 1)
    for _ in range(rounds):
        idx = np.flatnonzero(mark)
        new = jump[idx]
        if mark[new].all():
            break
        mark[new] = True
        jump = jump[jump]
    return np.flatnonzero(mark[:n])


def _parse(step: np.ndarray, starts: np.ndarray, ends: np.ndarray, n: int) -> np.ndarray:
    """Token start positions for a greedy parse pos += step[pos] per string.

    Two strategies: with many strings, frontier "waves" advance every string
    one token per round (total work = number of tokens, each round one small
    gather); with few long strings, pointer doubling. Both are loop-over-
    rounds, never loop-over-tokens-in-Python."""
    if n == 0 or len(starts) == 0:
        return np.zeros(0, dtype=np.int64)
    if len(starts) < 32:
        return _orbit(step, starts, n)
    waves = [starts]
    frontier = starts
    fends = ends
    while True:
        nxt = frontier + step[frontier]
        keep = nxt < fends
        if not keep.any():
            break
        frontier = nxt[keep]
        fends = fends[keep]
        waves.append(frontier)
    out = np.concatenate(waves)
    out.sort()
    return out


def _rem8(col: RaggedBytes) -> np.ndarray:
    """bytes-remaining-in-string per position, capped at MAX_SYM_LEN, as
    uint8 — built with 7 small scatters instead of 3 full int64 passes."""
    n = len(col.data)
    rem = np.full(n, MAX_SYM_LEN, dtype=np.uint8)
    ends = col.offsets[1:]
    starts = col.offsets[:-1]
    for k in range(1, MAX_SYM_LEN):
        idx = ends - k
        valid = idx >= starts
        rem[idx[valid]] = k
    return rem


def _match_at(padded: np.ndarray, rem8: np.ndarray, table: SymbolTable, P: np.ndarray):
    """Longest symbol match at the given positions only, evaluated lazily
    (the paper's shortCodes + one-long-symbol-per-3-byte-prefix scheme,
    vectorized over the frontier): the greedy parse visits
    ~1/avg_token_len of all byte positions, so matching only at parse
    frontiers cuts the full-array passes (the budget on a memory-bandwidth-
    bound host) by that factor."""
    code1, code2, k3tab, c3, l3, key3, mask3 = table.lut()
    r = rem8[P]
    b0 = padded[P].astype(np.uint32)
    b1 = padded[P + 1].astype(np.uint32)
    c1 = code1[padded[P]]
    c2 = code2[(b0 | (b1 << np.uint32(8))).astype(np.uint16)]
    use2 = (c2 >= 0) & (r >= 2)
    code = np.where(use2, c2, c1).astype(np.int64)
    mlen = np.where(use2, 2, 1).astype(np.int64)
    if len(k3tab):
        k3 = b0 | (b1 << np.uint32(8)) | (padded[P + 2].astype(np.uint32) << np.uint32(16))
        j = np.searchsorted(k3tab, k3)
        j[j == len(k3tab)] = 0
        cand = np.flatnonzero((k3tab[j] == k3) & (r >= 3))
        if len(cand):
            Pc = P[cand]
            jj = j[cand]
            keys = padded[Pc].astype(np.uint64)
            for k in range(1, MAX_SYM_LEN):
                keys |= padded[Pc + k].astype(np.uint64) << np.uint64(8 * k)
            ok = ((keys & mask3[jj]) == key3[jj]) & (l3[jj] <= r[cand])
            rows = cand[ok]
            code[rows] = c3[jj[ok]]
            mlen[rows] = l3[jj[ok]].astype(np.int64)
    return code, mlen


def encode_fsst_tokens(col: RaggedBytes, table: SymbolTable):
    """Tokenize a ragged column. Returns (positions, codes, string_id) where
    codes == -1 marks escaped literal bytes.

    Wave parse with LAZY matching: every string advances one token per round
    and the matcher runs only on the round's frontier positions — total match
    work is proportional to the TOKEN count, not the byte count."""
    n = len(col.data)
    lens = col.lengths
    rem8 = _rem8(col)
    padded = np.zeros(n + MAX_SYM_LEN, dtype=np.uint8)
    padded[:n] = col.data
    nz = lens > 0
    frontier = col.offsets[:-1][nz]
    fends = col.offsets[1:][nz]
    if 0 < len(frontier) < 1024:
        # few long strings: the wave frontier is too small to amortize a
        # NumPy call per round (measured 90 s on 200x64 KiB blobs) — match
        # every position in ONE vectorized call and parse over the result
        code, mlen = _match_at(padded, rem8, table, np.arange(n, dtype=np.int64))
        positions = _parse(mlen, frontier, fends, n)
        codes = code[positions]
        string_id = np.searchsorted(col.offsets, positions, side="right") - 1
        return positions, codes, string_id
    pos_waves, code_waves = [], []
    while len(frontier):
        if len(frontier) < 256 and int((fends - frontier).max()) > 256:
            # the frontier has shrunk to a few LONG stragglers (e.g. blobs in
            # a mixed batch): per-round overhead would dominate — match every
            # remaining position of those strings in one call and parse over
            # a scattered step table instead of continuing the waves
            spans = fends - frontier
            total = int(spans.sum())
            P = np.repeat(frontier - np.concatenate(([0], np.cumsum(spans)[:-1])), spans) + np.arange(
                total, dtype=np.int64
            )
            c, m = _match_at(padded, rem8, table, P)
            step = np.ones(n, dtype=np.int64)
            step[P] = m
            code_full = np.full(n, -1, dtype=np.int64)
            code_full[P] = c
            positions = _parse(step, frontier, fends, n)
            pos_waves.append(positions)
            code_waves.append(code_full[positions])
            break
        c, m = _match_at(padded, rem8, table, frontier)
        pos_waves.append(frontier)
        code_waves.append(c)
        nxt = frontier + m
        keep = nxt < fends
        frontier = nxt[keep]
        fends = fends[keep]
    if not pos_waves:
        e = np.zeros(0, dtype=np.int64)
        return e, e, e
    positions = np.concatenate(pos_waves)
    codes = np.concatenate(code_waves)
    order = np.argsort(positions, kind="stable")
    positions = positions[order]
    codes = codes[order]
    string_id = np.searchsorted(col.offsets, positions, side="right") - 1
    return positions, codes, string_id


def encode_fsst(col: RaggedBytes, table: SymbolTable) -> bytes:
    """Page body: [table][uvarint n_strings][u32 len of delta(lengths)]
    [delta-packed per-string encoded byte lengths][token stream]."""
    nstr = len(col)
    positions, codes, string_id = encode_fsst_tokens(col, table)
    esc = codes < 0
    out_len = np.where(esc, 2, 1).astype(np.int64)
    total = int(out_len.sum())
    stream = np.zeros(total, dtype=np.uint8)
    out_pos = np.zeros(len(codes) + 1, dtype=np.int64)
    np.cumsum(out_len, out=out_pos[1:])
    stream[out_pos[:-1][~esc]] = codes[~esc]
    if esc.any():
        e = out_pos[:-1][esc]
        stream[e] = ESCAPE
        stream[e + 1] = col.data[positions[esc]]
    # per-string encoded byte length
    enc_lens = np.bincount(string_id, weights=out_len, minlength=nstr).astype(np.int64)
    head = encode_delta(enc_lens.astype(np.int32) if enc_lens.max(initial=0) < 2**31 else enc_lens)
    out = bytearray(table.serialize())
    out += encode_uvarint(nstr)
    out += len(head).to_bytes(4, "little")
    out += head
    out += stream.tobytes()
    return bytes(out)


def _token_starts_esc(stream: np.ndarray, enc_off: np.ndarray) -> np.ndarray:
    """Token start positions of the decode stream, closed-form (no rounds).

    The decode walk has step ∈ {1, 2}: ESCAPE consumes 2 bytes, everything
    else 1. Key fact: every maximal run of ESCAPE-VALUED bytes begins at a
    token start — the byte before the run is non-escape-valued, so it ends
    its token there whether it was a 1-byte token or an escape payload.
    Hence within a run starting at a, escapes at even (p-a) are starts and
    odd ones are payloads; a non-escape byte after a run of length L is a
    start iff L is even. String boundaries force a start and break runs.
    ~10 full-array numpy passes replace the per-token-round wave loop
    (which cost one gather per max-tokens-per-string — 10^4 rounds on
    blob-sized strings)."""
    n = len(stream)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    isE = stream == ESCAPE
    idx = np.arange(n, dtype=np.int64)
    starts0 = enc_off[:-1][np.diff(enc_off) > 0]
    prevE = np.empty(n, dtype=bool)
    prevE[0] = False
    prevE[1:] = isE[:-1]
    prevE[starts0] = False  # runs break at string boundaries
    run_start = isE & ~prevE
    start_idx = np.where(run_start, idx, np.int64(-1))
    start_cm = np.maximum.accumulate(start_idx)
    d = idx - start_cm  # distance to own run start (valid at escape positions)
    tok = np.empty(n, dtype=bool)
    # escape-valued byte: start iff even distance into its run
    tok[isE] = (d[isE] & 1) == 0
    # non-escape byte: start unless the escape run ending just before it has
    # odd length (then it is that run's last escape's payload)
    ne = ~isE
    d_prev = np.empty(n, dtype=np.int64)
    d_prev[0] = 0
    d_prev[1:] = d[:-1]
    tok[ne] = ~(prevE[ne] & ((d_prev[ne] & 1) == 0))
    tok[starts0] = True
    return np.flatnonzero(tok)


def decode_fsst(buf) -> RaggedBytes:
    table, pos = SymbolTable.deserialize(buf)
    nstr, pos = read_uvarint(buf, pos)
    hlen = int.from_bytes(bytes(buf[pos : pos + 4]), "little")
    pos += 4
    enc_lens = decode_delta(memoryview(buf)[pos : pos + hlen], np.int64)[:nstr]
    pos += hlen
    stream = np.frombuffer(buf, dtype=np.uint8, offset=pos)
    enc_off = np.zeros(nstr + 1, dtype=np.int64)
    np.cumsum(enc_lens, out=enc_off[1:])
    n = int(enc_off[-1])
    stream = stream[:n]
    positions = _token_starts_esc(stream, enc_off)
    toks = stream[positions]
    esc = toks == ESCAPE
    codes = toks.astype(np.int64)
    out_lens = np.ones(len(toks), dtype=np.int64)
    out_lens[~esc] = table.sym_lens[codes[~esc]]
    out_off = np.zeros(len(toks) + 1, dtype=np.int64)
    np.cumsum(out_lens, out=out_off[1:])
    total = int(out_off[-1])
    out = np.zeros(total, dtype=np.uint8)
    if esc.any():
        out[out_off[:-1][esc]] = stream[positions[esc] + 1]
    sym_rows = np.flatnonzero(~esc)
    if len(sym_rows):
        s_codes = codes[sym_rows]
        s_lens = table.sym_lens[s_codes]
        gtotal = int(s_lens.sum())
        gather = np.repeat(table.flat_off[s_codes] - np.cumsum(s_lens) + s_lens, s_lens) + np.arange(
            gtotal, dtype=np.int64
        )
        scatter = np.repeat(out_off[:-1][sym_rows] - np.cumsum(s_lens) + s_lens, s_lens) + np.arange(
            gtotal, dtype=np.int64
        )
        out[scatter] = table.flat[gather]
    # per-string output lengths
    tok_string = np.searchsorted(enc_off, positions, side="right") - 1
    str_lens = np.bincount(tok_string, weights=out_lens, minlength=nstr).astype(np.int64)
    offsets = np.zeros(nstr + 1, dtype=np.int64)
    np.cumsum(str_lens, out=offsets[1:])
    return RaggedBytes(offsets, out)


# ------------------------------------------------------------------ build


def build_table(sample: RaggedBytes, generations: int = 4, sample_cap: int = 1 << 14) -> SymbolTable:
    """Bottom-up pair-merge construction on a byte-capped sample (the paper's
    iterative scheme). Per generation: tokenize sample with the current table,
    count adjacent same-string token pairs whose concatenation is <= 8 bytes,
    gain = freq * concat_len, keep the best 255 candidates."""
    data = sample.data
    if len(data) > sample_cap:
        # cap by whole strings
        cut = int(np.searchsorted(sample.offsets, sample_cap))
        cut = max(1, cut)
        sample = RaggedBytes(sample.offsets[: cut + 1], data[: sample.offsets[cut]])
        data = sample.data
    if len(data) == 0:
        return SymbolTable([])

    # generation 0: frequent single bytes
    freq = np.bincount(data, minlength=256)
    order = np.argsort(freq)[::-1]
    keep = order[freq[order] > 0][:MAX_SYMBOLS]
    table = SymbolTable([bytes([int(b)]) for b in keep])

    for _ in range(generations):
        positions, codes, string_id = encode_fsst_tokens(sample, table)
        ntok = len(positions)
        if ntok < 2:
            break
        # token byte strings: symbol bytes or literal byte
        tok_lens = np.ones(ntok, dtype=np.int64)
        sym_mask = codes >= 0
        tok_lens[sym_mask] = table.sym_lens[codes[sym_mask]]
        # candidate singles: every token's own bytes; gain = freq * len
        gains: dict[bytes, int] = {}

        def _add(sym: bytes, g: int):
            if 0 < len(sym) <= MAX_SYM_LEN:
                gains[sym] = gains.get(sym, 0) + g

        # count token occurrences (vectorized) then add gains per distinct token
        tok_key = np.where(sym_mask, codes, 256 + col_literal(sample, positions, sym_mask))
        uniq, counts = np.unique(tok_key, return_counts=True)
        for k, c in zip(uniq.tolist(), counts.tolist()):
            sym = table.symbols[k] if k < 256 and k < len(table.symbols) else bytes([k - 256])
            _add(sym, int(c) * len(sym))
        # adjacent pairs within the same string
        same = string_id[1:] == string_id[:-1]
        a = tok_key[:-1][same]
        b = tok_key[1:][same]
        pair_key = a * 1024 + b
        puniq, pcounts = np.unique(pair_key, return_counts=True)
        for pk, c in zip(puniq.tolist(), pcounts.tolist()):
            ka, kb = pk // 1024, pk % 1024
            sa = table.symbols[ka] if ka < 256 else bytes([ka - 256])
            sb = table.symbols[kb] if kb < 256 else bytes([kb - 256])
            _add(sa + sb, int(c) * (len(sa) + len(sb)))
        ranked = sorted(gains.items(), key=lambda kv: (-kv[1], kv[0]))
        # the fast matcher probes ONE long symbol per 3-byte prefix, so keep
        # only the highest-gain 3..8-byte symbol per distinct first-3-bytes
        chosen: list[bytes] = []
        seen3: set[bytes] = set()
        for s, _ in ranked:
            if len(s) >= 3:
                if s[:3] in seen3:
                    continue
                seen3.add(s[:3])
            chosen.append(s)
            if len(chosen) == MAX_SYMBOLS:
                break
        table = SymbolTable(chosen)
    return table


def col_literal(col: RaggedBytes, positions: np.ndarray, sym_mask: np.ndarray) -> np.ndarray:
    """Literal byte value for escape tokens, 0 elsewhere (shape matches positions)."""
    lit = np.zeros(len(positions), dtype=np.int64)
    esc = ~sym_mask
    lit[esc] = col.data[positions[esc]]
    return lit


def encode_fsst_auto(col: RaggedBytes, generations: int = 4) -> bytes:
    """Build table from the column's own head sample, then encode."""
    table = build_table(col, generations=generations)
    return encode_fsst(col, table)
