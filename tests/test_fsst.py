"""FSST codec tests: round-trips, compression wins on web-like text, random
access property (any slice decodes), adversarial byte contents."""

import numpy as np
import pytest

from pq_engine.kernels import fsst
from pq_engine.kernels.ragged import RaggedBytes


def _rt(values, generations=3):
    col = RaggedBytes.from_pylist(values)
    buf = fsst.encode_fsst_auto(col, generations=generations)
    out = fsst.decode_fsst(buf)
    assert out.to_pylist() == [bytes(v) for v in values]
    return buf, col


def test_fsst_basic_roundtrip():
    _rt([b"http://www.example.com/", b"http://www.example.org/", b"hello world"])


def test_fsst_empty_and_single():
    _rt([])
    _rt([b""])
    _rt([b"", b"", b""])
    _rt([b"x"])


def test_fsst_all_bytes():
    _rt([bytes(range(256)), bytes(range(255, -1, -1)), b"\xff\xff\xff"])


def test_fsst_escape_byte_collision():
    # 0xff is the escape code — literal 0xff bytes must survive
    _rt([b"\xff", b"a\xffb", b"\xff" * 50])


def test_fsst_compresses_urls():
    urls = [f"https://example{i % 30}.com/category/{i % 7}/page-{i}".encode() for i in range(3000)]
    buf, col = _rt(urls)
    raw = int(col.lengths.sum())
    assert len(buf) < raw * 0.55, f"fsst {len(buf)} vs raw {raw}"


def test_fsst_compresses_text():
    words = ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog", "and", "runs"]
    rng = np.random.default_rng(7)
    texts = [
        " ".join(words[j] for j in rng.integers(0, len(words), size=40)).encode()
        for _ in range(500)
    ]
    buf, col = _rt(texts)
    raw = int(col.lengths.sum())
    assert len(buf) < raw * 0.6


def test_fsst_random_binary_falls_back_to_escapes():
    rng = np.random.default_rng(11)
    vals = [rng.integers(0, 256, size=100).astype(np.uint8).tobytes() for _ in range(50)]
    _rt(vals)  # roundtrip correctness even when incompressible


def test_fsst_table_serialization():
    table = fsst.SymbolTable([b"ab", b"the ", b"x", b"12345678"])
    buf = table.serialize()
    t2, consumed = fsst.SymbolTable.deserialize(buf)
    assert consumed == len(buf)
    assert t2.symbols == table.symbols


def test_fsst_matches_never_cross_boundaries():
    # "ab" symbol must not match across adjacent strings "...a" + "b..."
    col = RaggedBytes.from_pylist([b"za", b"bz"])
    table = fsst.SymbolTable([b"ab", b"z", b"a", b"b"])
    buf = fsst.encode_fsst(col, table)
    out = fsst.decode_fsst(buf)
    assert out.to_pylist() == [b"za", b"bz"]


def test_fsst_longest_match_wins():
    col = RaggedBytes.from_pylist([b"abcabc"])
    table = fsst.SymbolTable([b"a", b"b", b"c", b"abc"])
    positions, codes, _ = fsst.encode_fsst_tokens(col, table)
    assert codes.tolist() == [3, 3]  # two "abc" tokens, not six singles


def test_fsst_three_long_symbols_sharing_2byte_prefix():
    # bucket16 regression: with 3+ long symbols sharing a 16-bit prefix the
    # bucket must stay -2 (multi) — a buggy `>= 0` check let the third row
    # overwrite the marker, so its bucket-mates fell back to escapes
    table = fsst.SymbolTable([b"abcXYZ", b"abdXYZ", b"abeXYZ"])
    col = RaggedBytes.from_pylist([b"abcXYZ", b"abdXYZ", b"abeXYZ"] * 3)
    positions, codes, _ = fsst.encode_fsst_tokens(col, table)
    # every string is exactly one long-symbol token — no escapes at all
    assert codes.tolist() == [0, 1, 2] * 3
    buf = fsst.encode_fsst(col, table)
    assert fsst.decode_fsst(buf).to_pylist() == col.to_pylist()
    raw = int(col.lengths.sum())
    assert len(buf) < raw  # must actually compress, not escape 2 of 3


def test_fsst_unicode_text():
    vals = ["héllo wörld".encode(), "日本語のテキスト".encode(), "مرحبا".encode()] * 20
    _rt(vals)
