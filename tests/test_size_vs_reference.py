"""Compressed-size parity vs the reference format (BASELINE.md target:
encoded bytes per column <= the reference writer's output; pyarrow's parquet
writer — same public format as parquet-java, dictionary+RLE defaults,
uncompressed pages — is the public stand-in)."""

import io

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pq_engine import pages
from pq_engine.datagen import gen_webpages
from pq_engine.kernels.ragged import RaggedBytes


def _parquet_column_bytes(table: pa.Table) -> dict[str, int]:
    """Total compressed column-chunk bytes per column via the parquet footer."""
    buf = io.BytesIO()
    pq.write_table(
        table, buf, compression="NONE", use_dictionary=True,
        data_page_version="1.0",
    )
    buf.seek(0)
    meta = pq.ParquetFile(buf).metadata
    out: dict[str, int] = {}
    for rg in range(meta.num_row_groups):
        g = meta.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            out[col.path_in_schema] = out.get(col.path_in_schema, 0) + col.total_compressed_size
    return out


@pytest.fixture(scope="module")
def web():
    return gen_webpages(30_000, seed=11)


def _our_bytes(values, ptype) -> int:
    out = pages.encode_column(values, ptype)
    return sum(m["encoded_bytes"] for m, _ in out)


def test_lang_dict_column_smaller_than_reference(web):
    col = RaggedBytes.from_arrow(web.column("lang").combine_chunks())
    ours = _our_bytes(col, "string")
    ref = _parquet_column_bytes(web.select(["lang"]))["lang"]
    assert ours <= ref * 1.05, (ours, ref)


def test_timestamp_delta_column_smaller_than_reference(web):
    ts = np.asarray(web.column("warc_ts").cast(pa.int64()))
    ours = _our_bytes(ts.astype(np.int64), "timestamp_us")
    ref = _parquet_column_bytes(web.select(["warc_ts"]))["warc_ts"]
    assert ours <= ref, (ours, ref)


def test_text_fsst_column_smaller_than_reference(web):
    col = RaggedBytes.from_arrow(web.column("text").combine_chunks())
    ours = _our_bytes(col, "string")
    ref = _parquet_column_bytes(web.select(["text"]))["text"]
    assert ours <= ref, (ours, ref)


def test_url_column_smaller_than_reference(web):
    col = RaggedBytes.from_arrow(web.column("url").combine_chunks())
    ours = _our_bytes(col, "string")
    ref = _parquet_column_bytes(web.select(["url"]))["url"]
    assert ours <= ref, (ours, ref)


def test_html_column_smaller_than_reference(web):
    arr = web.column("html").combine_chunks()
    validity = np.asarray(arr.is_valid())
    col = RaggedBytes.from_arrow(arr.drop_null())
    out = pages.encode_column(col, "binary", validity=validity)
    ours = sum(m["encoded_bytes"] for m, _ in out)
    ref = _parquet_column_bytes(web.select(["html"]))["html"]
    assert ours <= ref, (ours, ref)


def test_full_table_total(web):
    ref = _parquet_column_bytes(web)
    total_ref = sum(ref.values())
    total_ours = 0
    for name, ptype in [
        ("url", "string"), ("text", "string"), ("lang", "string"),
    ]:
        col = RaggedBytes.from_arrow(web.column(name).combine_chunks())
        total_ours += _our_bytes(col, ptype)
    ts = np.asarray(web.column("warc_ts").cast(pa.int64())).astype(np.int64)
    total_ours += _our_bytes(ts, "timestamp_us")
    arr = web.column("html").combine_chunks()
    col = RaggedBytes.from_arrow(arr.drop_null())
    total_ours += sum(
        m["encoded_bytes"]
        for m, _ in pages.encode_column(col, "binary", validity=np.asarray(arr.is_valid()))
    )
    assert total_ours < total_ref, (total_ours, total_ref)
    print(f"ours={total_ours} reference={total_ref} ratio={total_ours/total_ref:.3f}")
