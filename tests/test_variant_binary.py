"""Parquet VARIANT binary encoding reader/writer (variant_binary.py).

Fixture bytes are hand-assembled from the spec layout
(VariantUtil.java:49-231) so decode is tested against the FORMAT, not just
against our own writer."""

import struct
import uuid
from decimal import Decimal

import pytest

from pq_engine.spark.variant_binary import (
    decode_metadata,
    encode_metadata,
    obj_to_variant,
    variant_to_json,
    variant_to_obj,
)


def test_metadata_roundtrip_and_layout():
    keys = ["a", "bb", "ccc"]
    m = encode_metadata(keys)
    # header: version 1, sorted bit set, 1-byte offsets
    assert m[0] == 0x01 | 0x10
    assert m[1] == 3  # dict size
    assert list(m[2:6]) == [0, 1, 3, 6]  # offsets
    assert m[6:] == b"abbccc"
    assert decode_metadata(m) == keys


def test_metadata_hand_built():
    # 2-byte offsets forced: version 1 header with offset_size=2
    m = bytes([0x01 | (1 << 6)]) + struct.pack("<H", 2) + struct.pack(
        "<HHH", 0, 2, 5
    ) + b"hiabc"
    assert decode_metadata(m) == ["hi", "abc"]


@pytest.mark.parametrize("v", [
    None, True, False, 0, -1, 127, -128, 30000, -70000, 2**40, -(2**62),
    1.5, -0.0, "", "short", "x" * 63, "y" * 200, b"", b"\x00\xff" * 10,
    Decimal("1.23"), Decimal("-987654321.123456789"), Decimal("12345678901234567890.5"),
    uuid.UUID("12345678-1234-5678-1234-567812345678"),
    ("date", 19000), ("timestamp_tz", 1700000000_000000),
    ("timestamp_ntz", -5), ("time", 86399_999999),
    ("timestamp_nanos_tz", 1700000000_000000000), ("timestamp_nanos_ntz", 7),
])
def test_scalar_roundtrip(v):
    m, val = obj_to_variant(v)
    out = variant_to_obj(m, val)
    if isinstance(v, float):
        assert struct.pack("<d", out) == struct.pack("<d", v)
    else:
        assert out == v and type(out) is type(v)


def test_nested_roundtrip():
    v = {
        "name": "doc-1",
        "n": 42,
        "pi": 3.25,
        "tags": ["a", "b", {"deep": [1, 2, None]}],
        "meta": {"ok": True, "score": Decimal("0.875"), "blob": b"\x01\x02"},
        "empty_list": [],
        "empty_obj": {},
    }
    m, val = obj_to_variant(v)
    assert variant_to_obj(m, val) == v


def test_decode_hand_built_object():
    # {"a": 1, "b": "hi"} with dictionary ["a", "b"]
    meta = bytes([0x11, 2, 0, 1, 2]) + b"ab"
    v_a = bytes([3 << 2]) + (1).to_bytes(1, "little", signed=True)  # int8 1
    v_b = bytes([(2 << 2) | 1]) + b"hi"  # short str len 2
    # object header: small, id_size 1, offset_size 1 -> 0b00000010
    val = bytes([0x02, 2, 0, 1, 0, len(v_a), len(v_a) + len(v_b)]) + v_a + v_b
    assert variant_to_obj(meta, val) == {"a": 1, "b": "hi"}


def test_decode_hand_built_array_large_offsets():
    # array of two long strings forcing 2-byte offsets
    s1, s2 = "p" * 200, "q" * 150
    e1 = bytes([16 << 2]) + struct.pack("<I", 200) + s1.encode()
    e2 = bytes([16 << 2]) + struct.pack("<I", 150) + s2.encode()
    # array header: small count, offset_size 2 -> ((2-1)<<2) | 3 = 0b0111
    val = bytes([0x07, 2]) + struct.pack("<HHH", 0, len(e1), len(e1) + len(e2)) + e1 + e2
    meta = encode_metadata([])
    assert variant_to_obj(meta, val) == [s1, s2]


def test_large_object_256_fields():
    v = {f"k{i:03d}": i for i in range(300)}
    m, val = obj_to_variant(v)
    # header must flag large size (bit 6) and basic type object
    assert val[0] & 0x3 == 2 and (val[0] >> 6) & 1 == 1
    assert variant_to_obj(m, val) == v


def test_json_rendering():
    v = {"s": "x", "n": 2, "d": Decimal("1.5"), "b": b"\x00", "arr": [1, None],
         "t": ("date", 10)}
    m, val = obj_to_variant(v)
    j = variant_to_json(m, val)
    assert j == '{"arr":[1,null],"b":"AA==","d":1.5,"n":2,"s":"x","t":{"date":10}}'


def test_malformed_raises():
    good_m, good_v = obj_to_variant({"a": 1})
    with pytest.raises(ValueError):
        variant_to_obj(good_m, good_v + b"\x00")  # trailing bytes
    with pytest.raises(ValueError):
        decode_metadata(bytes([0x02]))  # bad version
    with pytest.raises(ValueError):
        variant_to_obj(good_m, b"")  # empty value


def test_corrupt_variant_raises_valueerror_not_indexerror():
    """ADVICE r4: a corrupt (metadata, value) pair must fail with a clear
    ValueError, not IndexError / silently-wrong structure."""
    good_m, good_v = obj_to_variant({"a": 1, "b": "xy"})
    # truncated value: offsets point past the buffer
    with pytest.raises(ValueError):
        variant_to_obj(good_m, good_v[: len(good_v) - 2])
    # bad field id: metadata with fewer keys than the object references
    small_m, _ = obj_to_variant({"a": 1})
    _, two_field_v = obj_to_variant({"a": 1, "b": 2})
    with pytest.raises(ValueError, match="field id"):
        variant_to_obj(small_m, two_field_v)
    # truncated primitive payload inside an object
    m, v = obj_to_variant({"a": 123456789})
    with pytest.raises(ValueError):
        variant_to_obj(m, v[:-1])


def test_spark_decode_bridge(spark):
    """Binary variant columns decode to JSON in a vectorized batch UDF and
    feed the existing typed-shred path end-to-end."""
    from pyspark.sql import functions as F

    from pq_engine.spark.variant_binary import variant_decode_json

    rows = []
    for i in range(50):
        m, v = obj_to_variant({"id": i, "name": f"doc-{i}", "score": i / 4.0})
        rows.append((i, bytearray(m), bytearray(v)))
    df = spark.createDataFrame(rows, "row_id long, vm binary, vv binary")
    out = variant_decode_json(df, "vm", "vv", out="vjson")
    got = out.select(
        "row_id",
        F.get_json_object("vjson", "$.name").alias("name"),
        F.get_json_object("vjson", "$.score").cast("double").alias("score"),
    ).orderBy("row_id").collect()
    assert got[7]["name"] == "doc-7" and got[7]["score"] == 1.75

    from pq_engine.spark.variant import infer_variant_spec, variant_shred

    spec = infer_variant_spec(out, "vjson")
    shredded, _info = variant_shred(out, "vjson", spec)
    cols = set(shredded.columns)
    assert any("name" in c for c in cols), cols


# ------------------------------------------------------------ property test
try:
    from hypothesis import given, settings, strategies as st

    _scalars = st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        st.floats(allow_nan=False, allow_infinity=False),
        st.text(max_size=80),
        st.binary(max_size=40),
    )
    _values = st.recursive(
        _scalars,
        lambda children: st.one_of(
            st.lists(children, max_size=6),
            st.dictionaries(st.text(min_size=1, max_size=8), children, max_size=6),
        ),
        max_leaves=25,
    )

    @settings(max_examples=150, deadline=None)
    @given(_values)
    def test_variant_binary_property_roundtrip(v):
        m, val = obj_to_variant(v)
        out = variant_to_obj(m, val)
        assert out == v

    _flat_scalars = st.one_of(
        st.none(), st.booleans(),
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        st.floats(allow_nan=False),
        st.text(max_size=80),
    )

    @settings(max_examples=100, deadline=None)
    @given(
        st.lists(st.text(min_size=1, max_size=8), min_size=1, max_size=6,
                 unique=True),
        st.data(),
    )
    def test_variant_batch_paths_equal_per_row(keys, data):
        """r5 batch fast paths (objs_to_variant_batch /
        variants_to_json_batch) must be byte/semantics-identical to the
        per-row recursive walk on uniform flat batches — which is exactly
        when the fast path engages — AND on ragged fallback shapes."""
        from pq_engine.spark.variant_binary import (
            objs_to_variant_batch,
            variants_to_json_batch,
        )

        objs = data.draw(
            st.lists(
                st.fixed_dictionaries({k: _flat_scalars for k in keys}),
                min_size=1, max_size=20,
            )
        )
        m, vs = objs_to_variant_batch(objs)
        for o, v in zip(objs, vs):
            assert variant_to_obj(m, v) == o
        got = variants_to_json_batch([m] * len(vs), list(vs))
        want = [variant_to_json(m, v) for v in vs]
        assert got == want
except ImportError:  # hypothesis gated behind import-try
    pass


def test_batch_fallback_shapes_match_per_row():
    from pq_engine.spark.variant_binary import (
        objs_to_variant_batch,
        variants_to_json_batch,
    )

    shapes = [
        [{"a": 1}, {"b": 2}],                      # differing key sets
        [{"a": [1, 2]}, {"a": [3]}],               # nested values
        [{"a": "x" * 100}, {"a": "y"}],            # long string (> 63 B)
        [{"a": Decimal("1.5")}, {"a": Decimal("2")}],  # non-JSON scalar
        [{"a": 2**70}, {"a": 1}],                  # int past int64 -> error
    ]
    for objs in shapes[:-1]:
        m, vs = objs_to_variant_batch(objs)
        assert [variant_to_obj(m, v) for v in vs] == objs
        got = variants_to_json_batch([m] * len(vs), list(vs))
        assert got == [variant_to_json(m, v) for v in vs]
    with pytest.raises(ValueError):
        objs_to_variant_batch(shapes[-1])


def test_batch_decode_mixed_null_rows():
    from pq_engine.spark.variant_binary import (
        objs_to_variant_batch,
        variants_to_json_batch,
    )

    objs = [{"a": i, "b": f"s{i}"} for i in range(5)]
    m, vs = objs_to_variant_batch(objs)
    ms = [m, None, m, m, m]
    vals = [vs[0], vs[1], None, vs[3], vs[4]]
    got = variants_to_json_batch(ms, vals)
    assert got[1] is None and got[2] is None
    assert got[0] == variant_to_json(m, vs[0])
    assert got[4] == variant_to_json(m, vs[4])
