"""Distributed scan over EXTERNAL parquet files through the from-scratch
reader — the engine-level ParquetInputFormat analog for foreign data.

``scan_parquet`` turns a directory (or explicit file list) of parquet
files — written by anyone: pyarrow, DuckDB, Spark, our interop writer;
plaintext or encrypted — into a Spark DataFrame. Each task opens its own
files and decodes them through :mod:`pq_engine.interop.parquet_reader`
(no parquet library in the read path), so the scan gets the full pruning
stack per file: row-group stats (L1), dictionary (L2), bloom (L3),
page-index row ranges (L4), exact record-level re-check (L5) — and for
encrypted files the FileDecryptor runs pruning BEFORE decryption.

Scale shape (the ParquetFileReader direction at 100 TB):
- the distribution unit is the FILE (a web-crawl layout is many
  row-group-sized files); tasks never share state and the file list is
  the only driver-side metadata — no footer is fetched centrally except
  ONE for schema inference (pass ``schema=`` to skip even that);
- predicate + column pushdown happen inside each task at the parquet
  layer, so selective scans read a sliver of each file;
- keys: pass raw ``footer_key``/``column_keys``, or ``master_keys`` to
  resolve per-file DEKs from each file's own key-material envelopes
  (keytools; `_KEY_MATERIAL_FOR_` side files are picked up
  automatically) — executors never see a raw DEK on the wire, only the
  long-lived master keys the cluster is already trusted with.

Reference surface: parquet-hadoop ParquetInputFormat/ParquetFileReader +
crypto keytools read path; the filtered semantics mirror
ParquetFileReader.readNextFilteredRowGroup (ParquetFileReader.java:1140).
"""

from __future__ import annotations

import os

PARQUET_EXTS = (".parquet", ".pare", ".pq")


def list_parquet_files(path_or_paths) -> list[str]:
    """Expand a directory into its parquet files (sorted, `_` metadata
    files skipped — the HiddenFileFilter convention); pass lists through."""
    if isinstance(path_or_paths, (list, tuple)):
        return [str(p) for p in path_or_paths]
    d = str(path_or_paths)
    if os.path.isfile(d):
        return [d]
    names = sorted(
        n for n in os.listdir(d)
        if not n.startswith(("_", ".")) and n.lower().endswith(PARQUET_EXTS)
    )
    if not names:
        raise ValueError(f"no parquet files under {d!r}")
    return [os.path.join(d, n) for n in names]


def _task_keys(path: str, buf: bytes, footer_key, column_keys, master_keys):
    """Per-file key resolution inside the task."""
    if master_keys is None:
        return footer_key, column_keys
    from ..interop.parquet_keytools import (
        key_material_store_path,
        read_key_material_store,
        resolve_file_keys,
    )

    store = None
    side = key_material_store_path(path)
    if os.path.exists(side):
        store = read_key_material_store(path)
    return resolve_file_keys(buf, master_keys, material_store=store)


def _scan_one(path: str, predicate, columns, footer_key, column_keys,
              master_keys, aad_prefix):
    from ..interop.parquet_crypto import is_encrypted
    from ..interop.parquet_reader import (
        read_parquet_filtered_pandas,
        read_parquet_pandas,
    )

    with open(path, "rb") as f:
        buf = f.read()
    if is_encrypted(buf) or master_keys is not None:
        fk, cks = _task_keys(path, buf, footer_key, column_keys, master_keys)
    else:
        fk, cks = footer_key, column_keys
    if predicate is None and fk is None:
        return read_parquet_pandas(buf, columns=columns)
    if predicate is None:
        # filtered reader with a tautology keeps the native decrypt path
        df, _ = read_parquet_filtered_pandas(
            buf, None, columns=columns, footer_key=fk, column_keys=cks,
            aad_prefix=aad_prefix)
        return df
    df, _ = read_parquet_filtered_pandas(
        buf, predicate, columns=columns, footer_key=fk, column_keys=cks,
        aad_prefix=aad_prefix)
    return df


def scan_parquet(spark, path_or_paths, predicate=None,
                 columns: list[str] | None = None,
                 footer_key: bytes | None = None,
                 column_keys: dict[str, bytes] | None = None,
                 master_keys: dict[str, bytes] | None = None,
                 aad_prefix: bytes = b"",
                 schema=None, partitions: int | None = None):
    """Distributed DataFrame over external parquet files via OUR reader.

    ``predicate`` is the reader's tuple DSL (("and", ("ge", "c", 5), ...))
    — evaluated inside each task with full pruning. ``schema`` (a Spark
    schema or DDL string) skips the one driver-side sample decode."""
    files = list_parquet_files(path_or_paths)
    if schema is None:
        # infer WITHOUT the predicate: a filtered sample can come back empty
        # (createDataFrame cannot infer from an empty frame) even though
        # other files match; only the columns decide the schema
        schema = None
        for f in files:
            sample = _scan_one(f, None, columns, footer_key,
                               column_keys, master_keys, aad_prefix)
            if len(sample):
                schema = spark.createDataFrame(sample).schema
                break
        if schema is None:
            raise ValueError(
                "cannot infer scan schema: every input file is empty — "
                "pass schema= explicitly")
    elif isinstance(schema, str):
        from pyspark.sql.types import StructType

        schema = StructType.fromDDL(schema)
    n_parts = partitions or min(len(files), spark.sparkContext.defaultParallelism)

    import pandas as pd

    def scan(batches):
        import pandas as _pd
        for pdf in batches:
            for p in pdf["path"]:
                df = _scan_one(p, predicate, columns, footer_key,
                               column_keys, master_keys, aad_prefix)
                if len(df):
                    yield df
                else:  # keep the declared schema for empty files
                    yield _pd.DataFrame(
                        {f.name: _pd.Series(dtype=object)
                         for f in schema.fields})

    fdf = spark.createDataFrame(
        pd.DataFrame({"path": files})).repartition(n_parts)
    return fdf.mapInPandas(scan, schema)
