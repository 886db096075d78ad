"""Page-level rewrite operations — the ParquetRewriter analog
(/root/reference/parquet-hadoop/.../hadoop/rewrite/ParquetRewriter.java:99-237:
prune columns, mask (nullify/hash), transcode compression, merge; page-level
copy when possible, decode→re-encode only when semantics require it).

On the page table these become DataFrame ops:
* prune        → a filter on the `column` field — pure metadata, zero decode;
* transcode    → decode→re-encode only the pages whose compression changes
                 (page-level copy for the rest, exactly the reference rule);
* mask-nullify → replace a column's pages with all-null pages (no decode);
* mask-hash    → decode → md5 → re-encode (value-level rewrite);
* merge        → union of page tables with re-namespaced split ids.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..kernels.ragged import RaggedBytes
from ..pages import decode_column, encode_column
from .engine import PAGE_SCHEMA


def prune_columns(pages: DataFrame, keep: list[str]) -> DataFrame:
    """Drop whole columns — footer-only rewrite (ParquetRewriter prune)."""
    return pages.filter(F.col("column").isin(keep))


def merge_page_tables(tables: list[DataFrame]) -> DataFrame:
    """Concatenate encoded tables (ParquetRewriter merge): page-level copy,
    split ids re-namespaced so lineage keys stay unique."""
    out = None
    for i, t in enumerate(tables):
        t = t.withColumn("split_id", (F.col("split_id") + F.lit(i * 1_000_000)).cast("int"))
        out = t if out is None else out.unionByName(t)
    return out


def mask_nullify(pages: DataFrame, column: str) -> DataFrame:
    """Replace a column's values with NULLs, keeping row counts — no decode:
    each page becomes a validity-only page (all-absent)."""

    def rewrite(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernels import rle

        # index rows (bloom -1, chunk dict -2) are dropped: a nullified
        # column has no values to index
        out = pdf[pdf["page"] >= 0].copy()
        pdf = out
        blobs = []
        for r in pdf.itertuples():
            validity = np.zeros(int(r.n_rows), dtype=np.uint64)
            blob = bytes([1]) + rle.encode_hybrid_length_prefixed(validity, 1)
            # body: zero non-null values → empty PLAIN body
            blobs.append(blob)
        out["data"] = blobs
        out["codec"] = "plain"
        out["null_count"] = out["n_rows"]
        out["min"] = None
        out["max"] = None
        out["ndv"] = 0
        out["compression"] = "none"
        out["encoded_bytes"] = [len(b) for b in blobs]
        out["crc32"] = [zlib.crc32(b) & 0xFFFFFFFF for b in blobs]
        return out

    target = pages.filter(F.col("column") == column)
    rest = pages.filter(F.col("column") != column)
    rewritten = target.groupBy("split_id", "batch_id").applyInPandas(rewrite, PAGE_SCHEMA)
    return rest.unionByName(rewritten)


def mask_hash(pages: DataFrame, column: str) -> DataFrame:
    """Replace a string column's values with their md5 hex (ParquetRewriter
    mask-hash): decode → hash → re-encode, only for the masked column."""

    def rewrite(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("page")
        metas = [
            (
                {
                    "page": int(r.page), "codec": r.codec, "ptype": r.ptype,
                    "n_rows": int(r.n_rows), "crc32": int(r.crc32),
                    "compression": r.compression,
                },
                bytes(r.data),
            )
            for r in pdf.itertuples()
        ]
        values, validity = decode_column(metas)
        hashed = RaggedBytes.from_pylist(
            [hashlib.md5(v).hexdigest().encode() for v in values.to_pylist()]
        )
        out_pages = encode_column(hashed, "string", validity=validity)
        rows = []
        base = pdf.iloc[0]
        for meta, blob in out_pages:
            rows.append(
                {
                    "split_id": base["split_id"], "batch_id": base["batch_id"],
                    "column": base["column"], "page": meta["page"],
                    "codec": meta["codec"], "ptype": "string",
                    "first_row": meta["first_row"],
                    "n_rows": meta["n_rows"], "null_count": meta["null_count"],
                    "raw_bytes": meta["raw_bytes"], "encoded_bytes": meta["encoded_bytes"],
                    "crc32": meta["crc32"], "compression": meta["compression"],
                    "min": meta["min"], "max": meta["max"], "ndv": meta["ndv"],
                    "data": blob,
                }
            )
        return pd.DataFrame(rows)

    target = pages.filter(F.col("column") == column)
    rest = pages.filter(F.col("column") != column)
    rewritten = target.groupBy("split_id", "batch_id").applyInPandas(rewrite, PAGE_SCHEMA)
    return rest.unionByName(rewritten)


def transcode_compression(pages: DataFrame, to: str | None) -> DataFrame:
    """Change page compression (ParquetRewriter trans-compression). Pages
    already in the target codec are copied verbatim (page-level copy rule);
    the rest decompress/recompress WITHOUT value re-encoding."""
    to_label = to or "none"

    def rewrite(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.copy()
        datas, encs, crcs, comps = [], [], [], []
        for r in pdf.itertuples():
            raw_copy = r.page == -1 or r.codec == "rowranges"
            comps.append(r.compression if raw_copy else to_label)
            if r.compression == to_label or raw_copy:
                # bloom index rows are raw filter bytes and rowranges markers
                # are empty (no page framing) — always page-level copied;
                # dict pages (-2) transcode like data pages (same
                # [validity-flag][body] framing)
                datas.append(bytes(r.data))
                encs.append(int(r.encoded_bytes))
                crcs.append(int(r.crc32))
                continue
            blob = bytes(r.data)
            from ..compression import compress as _pc, decompress as _pdc
            from ..pages import split_page_blob

            pos = split_page_blob(blob)  # handles flat, validity AND list layouts
            head, body = blob[:pos], blob[pos:]
            body = _pc(_pdc(body, r.compression), to_label)
            nb = head + body
            datas.append(nb)
            encs.append(len(nb))
            crcs.append(zlib.crc32(nb) & 0xFFFFFFFF)
        out["data"] = datas
        out["encoded_bytes"] = encs
        out["crc32"] = crcs
        out["compression"] = comps
        return out

    return pages.groupBy("split_id", "batch_id").applyInPandas(rewrite, PAGE_SCHEMA)
