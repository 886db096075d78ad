"""Property-based round-trips (mirrors the reference's randomized layer,
SURVEY §5.2: TestStatistics RandomValues with logged seeds). Hypothesis
shrinks failures to minimal counterexamples."""

import numpy as np
from hypothesis import given, settings, strategies as st

from pq_engine import pages
from pq_engine.kernels import delta, fsst, rle
from pq_engine.kernels.deltastrings import decode_delta_byte_array, encode_delta_byte_array
from pq_engine.kernels.ragged import RaggedBytes

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
SMALL = st.integers(min_value=0, max_value=7)


@settings(max_examples=60, deadline=None)
@given(st.lists(I64, max_size=400))
def test_delta_roundtrip_any_int64(xs):
    arr = np.array(xs, dtype=np.int64)
    np.testing.assert_array_equal(delta.decode_delta(delta.encode_delta(arr)), arr)


@settings(max_examples=60, deadline=None)
@given(st.lists(SMALL, max_size=600), st.integers(min_value=3, max_value=8))
def test_rle_roundtrip_any_small_ints(xs, width):
    arr = np.array(xs, dtype=np.uint64)
    out = rle.decode_hybrid(rle.encode_hybrid(arr, width), width, len(arr))
    np.testing.assert_array_equal(out, arr)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.binary(max_size=40), max_size=120))
def test_delta_byte_array_roundtrip_any_bytes(vals):
    col = RaggedBytes.from_pylist(vals)
    assert decode_delta_byte_array(encode_delta_byte_array(col), len(col)) == col


@settings(max_examples=30, deadline=None)
@given(st.lists(st.binary(max_size=60), max_size=100))
def test_fsst_roundtrip_any_bytes(vals):
    col = RaggedBytes.from_pylist(vals)
    out = fsst.decode_fsst(fsst.encode_fsst_auto(col, generations=2))
    assert out == col


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.one_of(st.none(), I64), max_size=200),
    st.sampled_from(["plain", "delta", "dict", "bss", "auto"]),
)
def test_page_roundtrip_nullable_int64_any_codec(xs, codec):
    validity = np.array([x is not None for x in xs], dtype=bool)
    dense = np.array([x for x in xs if x is not None], dtype=np.int64)
    out = pages.encode_column(
        dense, "int64", validity=validity if len(xs) else None, codec=codec, page_rows=64
    )
    got, got_validity = pages.decode_column(out)
    np.testing.assert_array_equal(got, dense)
    if len(xs) and (~validity).any():
        np.testing.assert_array_equal(got_validity, validity)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(max_size=30), max_size=150))
def test_page_roundtrip_strings_auto(vals):
    col = RaggedBytes.from_pylist([v.encode() for v in vals])
    out = pages.encode_column(col, "string", codec="auto", page_rows=48)
    got, _ = pages.decode_column(out, ptype="string")
    assert got == col
