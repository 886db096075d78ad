"""From-scratch parquet READER (interop/parquet_reader.py): files written
by pyarrow (v1 + v2 pages, dict/delta/DLBA encodings, snappy/gzip/zstd,
multi row group, nulls), DuckDB, and our own interop writer all decode
through the NumPy kernels with no parquet library in the loop."""

import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pq_engine.interop.parquet_reader import (
    read_footer,
    read_parquet,
    read_parquet_pandas,
)
from pq_engine.kernels.ragged import RaggedBytes


def _same(x, y):
    def _nullish(v):
        return v is None or (isinstance(v, float) and v != v)

    if _nullish(x) or _nullish(y):
        return _nullish(x) and _nullish(y)
    if isinstance(x, float) and isinstance(y, float):
        return abs(x - y) < 1e-12
    return x == y


@pytest.fixture(scope="module")
def tbl():
    n = 5000
    return pa.table({
        "id": pa.array(range(n), pa.int64()),
        "lang": pa.array([["en", "fr", "de", None][i % 4] for i in range(n)]),
        "score": pa.array([None if i % 7 == 0 else i / 3.0 for i in range(n)]),
        "flag": pa.array([bool(i % 2) for i in range(n)]),
        "payload": pa.array(
            [b"\x00\xffbin%d" % (i % 50) for i in range(n)], pa.binary()
        ),
    })


def _check(df, tbl, cols=None):
    ref = tbl.to_pandas()
    for c in cols or tbl.column_names:
        bad = [
            (x, y) for x, y in zip(df[c].tolist(), ref[c].tolist())
            if not _same(x, y)
        ]
        assert not bad, (c, bad[:3])


def test_pyarrow_v1_mixed_encodings_snappy(tbl, tmp_path):
    p = str(tmp_path / "v1.parquet")
    pq.write_table(
        tbl, p, compression="snappy", use_dictionary=["lang"],
        column_encoding={"id": "DELTA_BINARY_PACKED",
                         "payload": "DELTA_LENGTH_BYTE_ARRAY",
                         "score": "PLAIN", "flag": "PLAIN"},
        data_page_version="1.0",
    )
    _check(read_parquet_pandas(p), tbl)
    meta = read_footer(open(p, "rb").read())
    assert meta["num_rows"] == 5000
    assert [c["name"] for c in meta["schema"]] == tbl.column_names


def test_pyarrow_v2_pages_zstd(tbl, tmp_path):
    p = str(tmp_path / "v2.parquet")
    pq.write_table(tbl, p, compression="zstd", data_page_version="2.0")
    _check(read_parquet_pandas(p), tbl)


def test_multi_row_group_gzip_and_column_projection(tbl, tmp_path):
    p = str(tmp_path / "rg.parquet")
    pq.write_table(tbl, p, row_group_size=1000, compression="gzip")
    df = read_parquet_pandas(p, columns=["id", "lang"])
    assert list(df.columns) == ["id", "lang"]
    _check(df, tbl, cols=["id", "lang"])


def test_duckdb_written_file(tbl, tmp_path):
    import duckdb

    src = str(tmp_path / "src.parquet")
    pq.write_table(tbl, src)
    p = str(tmp_path / "duck.parquet")
    duckdb.sql(
        f"COPY (SELECT * FROM read_parquet('{src}')) TO '{p}' "
        "(FORMAT PARQUET, COMPRESSION ZSTD)"
    )
    _check(read_parquet_pandas(p), tbl)


def test_our_interop_writer_files_round_trip(tmp_path):
    from pq_engine.interop.parquet_writer import write_parquet

    p = str(tmp_path / "ours.parquet")
    write_parquet(p, [
        {"name": "a", "ptype": "int64", "codec": "delta",
         "values": np.arange(100, dtype=np.int64)},
        {"name": "s", "ptype": "string", "codec": "dba",
         "values": RaggedBytes.from_pylist([b"pref%03d" % i for i in range(100)])},
        {"name": "f", "ptype": "float64", "codec": "bss",
         "values": np.linspace(0, 1, 100)},
    ], 100, compression="zstd")
    df = read_parquet_pandas(p)
    assert df["a"].tolist() == list(range(100))
    assert df["s"].tolist() == ["pref%03d" % i for i in range(100)]
    assert df["f"].tolist() == pytest.approx(np.linspace(0, 1, 100).tolist())


def test_driver_testdata_matches_duckdb():
    import duckdb

    path = "/root/testdata/sf0.001/documents.parquet"
    df = read_parquet_pandas(path, ["doc_id", "lang", "n_chars"])
    want = duckdb.sql(
        f"SELECT doc_id, lang, n_chars FROM read_parquet('{path}')"
    ).fetchall()
    assert list(zip(df["doc_id"], df["lang"], df["n_chars"])) == want


def test_kernel_form_and_validity_contract(tbl, tmp_path):
    p = str(tmp_path / "k.parquet")
    pq.write_table(tbl, p)
    schema, data = read_parquet(p, ["lang", "id"])
    vals, validity = data["lang"]
    assert isinstance(vals, RaggedBytes)
    assert validity is not None and len(validity) == 5000
    assert int(validity.sum()) == len(vals)  # non-null kernel form
    ivals, ivalid = data["id"]
    assert ivalid is None and ivals.dtype == np.int64


def test_errors(tbl, tmp_path):
    with pytest.raises(ValueError, match="magic"):
        read_parquet(b"nope" * 4)
    nested = pa.table({"m": pa.array([{"a": 1}, {"a": 2}])})
    p = str(tmp_path / "nested.parquet")
    pq.write_table(nested, p)
    with pytest.raises(ValueError, match="nested"):
        read_parquet(p)


def test_cli_from_parquet_import(tmp_path):
    """from-parquet: external file -> page table via OUR reader, decoded
    back by the CLI without Spark."""
    import subprocess
    import sys as _sys

    out = str(tmp_path / "pages")
    r = subprocess.run(
        [_sys.executable, "-m", "pq_engine.cli", "from-parquet",
         "/root/testdata/sf0.001/documents.parquet", "--out", out],
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-500:]
    r2 = subprocess.run(
        [_sys.executable, "-m", "pq_engine.cli", "scan", out],
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
    )
    assert r2.returncode == 0 and "records=500" in r2.stdout, r2.stdout


# ------------------------------------------------------------ property test
try:
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(
            st.one_of(st.none(), st.integers(-(2**62), 2**62 - 1)),
            min_size=1, max_size=300,
        ),
        st.lists(
            st.one_of(st.none(), st.text(max_size=20)),
            min_size=1, max_size=300,
        ),
        st.sampled_from(["none", "snappy", "zstd", "gzip"]),
        st.sampled_from(["1.0", "2.0"]),
    )
    def test_reader_property_random_tables(ints, strs, compression, page_ver):
        """Any pyarrow-written flat table (random ints/strings with nulls,
        any codec, both page versions) decodes identically through our
        from-scratch reader."""
        n = max(len(ints), len(strs))
        ints = (ints * (n // len(ints) + 1))[:n]
        strs = (strs * (n // len(strs) + 1))[:n]
        tbl = pa.table({
            "i": pa.array(ints, pa.int64()),
            "s": pa.array(strs, pa.string()),
        })
        with tempfile.NamedTemporaryFile(suffix=".parquet") as f:
            pq.write_table(
                tbl, f.name,
                compression=None if compression == "none" else compression,
                data_page_version=page_ver,
            )
            _, data = read_parquet(f.name)
        # kernel-form comparison (exact — no pandas float coercion of
        # nullable int columns)
        for c in ("i", "s"):
            values, validity = data[c]
            lst = values.to_pylist() if isinstance(values, RaggedBytes) \
                else values.tolist()
            if c == "s":
                lst = [v.decode("utf-8") for v in lst]
            if validity is not None:
                full, vi = [], 0
                for ok in validity:
                    full.append(lst[vi] if ok else None)
                    vi += ok
                lst = full
            assert lst == tbl[c].to_pylist(), c
except ImportError:
    pass


def test_list_columns_from_pyarrow(tmp_path):
    """3-level LIST groups (null/empty lists, null elements, dict-encoded
    elements, v1+v2 pages, multi row group) decode via rep/def level
    inversion (nested.levels_to_structure)."""
    rows = [[1, 2, 3], [], None, [4, None, 6], [7], None, []]
    strs = [["a", "bb"], None, [], ["x", None], ["yy"], ["z"], None]
    tbl2 = pa.table({
        "ids": pa.array(rows * 100, pa.list_(pa.int64())),
        "tags": pa.array(strs * 100, pa.list_(pa.string())),
        "flat": pa.array(list(range(700)), pa.int64()),
    })
    want = tbl2.to_pydict()
    for i, kw in enumerate((
        dict(compression="snappy"),
        dict(compression="zstd", data_page_version="2.0"),
        dict(row_group_size=150, compression="gzip"),
        dict(use_dictionary=True),
    )):
        p = str(tmp_path / f"l{i}.parquet")
        pq.write_table(tbl2, p, **kw)
        df = read_parquet_pandas(p)
        assert df["flat"].tolist() == want["flat"]
        assert [x if x is None else list(x) for x in df["ids"]] == want["ids"], kw
        assert [x if x is None else list(x) for x in df["tags"]] == want["tags"], kw


def test_list_from_our_interop_writer(tmp_path):
    from pq_engine.interop.parquet_writer import write_parquet
    from pq_engine.nested import ListColumn

    lens = np.array([2, 0, 3, 1], dtype=np.int64)
    offsets = np.zeros(5, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    lc = ListColumn(offsets, None, np.arange(6, dtype=np.int64) * 10, None)
    p = str(tmp_path / "ourlist.parquet")
    write_parquet(p, [
        {"name": "v", "ptype": "list<int64>", "codec": "plain", "values": lc},
    ], 4, compression="zstd")
    df = read_parquet_pandas(p)
    assert [list(x) for x in df["v"]] == [[0, 10], [], [20, 30, 40], [50]]


def test_map_still_rejected(tmp_path):
    m = pa.table({"m": pa.array([{"a": 1}, {"b": 2}],
                                pa.map_(pa.string(), pa.int64()))})
    p = str(tmp_path / "map.parquet")
    pq.write_table(m, p)
    with pytest.raises(ValueError, match="unsupported"):
        read_parquet(p)
