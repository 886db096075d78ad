"""Iceberg-flavored snapshot table layer over the page sink.

The north star frames encode output as "Iceberg-style row-group-sized
batches"; this module adds the table semantics on top of the page sink,
following Iceberg's PUBLIC table-spec concepts (HadoopCatalog layout):

    table_dir/
      data/snap-00001/column=<c>/...parquet     immutable page files
      metadata/snap-00001.json                  snapshot manifest
      metadata/version-hint.text                current snapshot id

A snapshot manifest records: id, parent id, operation, the column→ptype
schema, the FULL data-file list (parent's files + the append's new files —
Iceberg's manifest-reuse idea, so a reader never lists directories), and a
lineage rollup (rows/raw/encoded bytes per column). ``append`` = encode new
rows into a fresh ``data/snap-N`` directory + write manifest N; commits are
atomic via write-temp-then-rename of the manifest and the version hint, so
a crashed append leaves the table at its previous snapshot (data files
without a committed manifest are invisible — same failure contract as
Iceberg). Time travel = read the file list of any older snapshot.

At 100 TB the file list lives in the manifest as relative paths; reads pass
the explicit list to the parquet scan with ``basePath`` so partition
pruning by ``column=`` still applies and no directory listing happens on
the object store (the expensive operation Iceberg manifests exist to
avoid).

Reference: the job manifest/lineage machinery this builds on is
engine.run_encode_job; parquet-java's nearest analog is the hadoop
write-committer path (ParquetOutputCommitter), which likewise publishes
files only at commit.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .engine import decode_table, encode_table, spark_type_to_ptype


def _meta_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "metadata")


def _snap_path(table_dir: str, snap_id: int) -> str:
    return os.path.join(_meta_dir(table_dir), f"snap-{snap_id:05d}.json")


def current_snapshot_id(table_dir: str) -> int | None:
    hint = os.path.join(_meta_dir(table_dir), "version-hint.text")
    if not os.path.exists(hint):
        return None
    with open(hint) as f:
        return int(f.read().strip())


def read_snapshot_manifest(table_dir: str, snap_id: int | None = None) -> dict:
    if snap_id is None:
        snap_id = current_snapshot_id(table_dir)
        if snap_id is None:
            raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    with open(_snap_path(table_dir, snap_id)) as f:
        return json.load(f)


def table_snapshots(table_dir: str) -> list[dict]:
    """All committed snapshots, oldest first (walks parent ids from the
    version hint — uncommitted manifests are unreachable by construction)."""
    out = []
    sid = current_snapshot_id(table_dir)
    while sid is not None:
        m = read_snapshot_manifest(table_dir, sid)
        out.append(m)
        sid = m.get("parent_id")
    return list(reversed(out))


def _atomic_write(path: str, payload: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(payload)
    os.replace(tmp, path)  # atomic on POSIX: commit point


def table_append(
    spark: SparkSession,
    df: DataFrame,
    table_dir: str,
    codec: str = "auto",
    page_compression: str | None = None,
    sink_partitions: int | None = None,
) -> dict:
    """Encode ``df`` and commit it as a new snapshot. First append creates
    the table and pins its schema; later appends must match it exactly
    (Iceberg checks schema compatibility at commit). Returns the committed
    manifest."""
    schema_rows = [
        (f.name, spark_type_to_ptype(f.dataType)) for f in df.schema.fields
    ]
    parent = current_snapshot_id(table_dir)
    if parent is not None:
        prev = read_snapshot_manifest(table_dir, parent)
        if prev["schema"] != dict(schema_rows):
            raise ValueError(
                f"append schema {dict(schema_rows)} != table schema "
                f"{prev['schema']}"
            )
        snap_id = parent + 1
        inherited = prev["files"]
    else:
        snap_id = 1
        inherited = []

    # key=value dir name: Spark partition discovery then accepts a multi-
    # snapshot file list under one basePath (and `snap` prunes like any
    # partition column)
    rel_data = f"data/snap={snap_id}"
    data_dir = os.path.join(table_dir, rel_data)
    pages = encode_table(df, codec=codec, page_compression=page_compression)
    n_sink = sink_partitions or spark.sparkContext.defaultParallelism
    (
        pages.repartition(n_sink, "column", "split_id")
        .write.mode("errorifexists")
        .option("maxRecordsPerFile", 500_000)
        .partitionBy("column")
        .parquet(data_dir)
    )
    new_files = []
    for root, _dirs, names in os.walk(data_dir):
        for n in sorted(names):
            if n.endswith(".parquet"):
                full = os.path.join(root, n)
                new_files.append(os.path.relpath(full, table_dir))
    new_files.sort()

    written = spark.read.option("basePath", data_dir).parquet(data_dir)
    roll = (
        written.filter(F.col("page") >= 0)
        .groupBy("column")
        .agg(
            F.sum("n_rows").alias("rows"),
            F.sum("raw_bytes").alias("raw_bytes"),
            F.sum("encoded_bytes").alias("encoded_bytes"),
            F.count("*").alias("pages"),
        )
        .collect()
    )
    manifest = {
        "snapshot_id": snap_id,
        "parent_id": parent,
        "operation": "append",
        "schema": dict(schema_rows),
        "files": inherited + new_files,
        "added_files": len(new_files),
        "lineage": {
            r["column"]: {
                "rows": int(r["rows"]), "raw_bytes": int(r["raw_bytes"]),
                "encoded_bytes": int(r["encoded_bytes"]),
                "pages": int(r["pages"]),
            }
            for r in roll
        },
    }
    os.makedirs(_meta_dir(table_dir), exist_ok=True)
    _atomic_write(_snap_path(table_dir, snap_id), json.dumps(manifest, indent=1))
    # the version hint is the commit: readers only see snapshots it reaches
    _atomic_write(
        os.path.join(_meta_dir(table_dir), "version-hint.text"), str(snap_id)
    )
    return manifest


def table_read_pages(
    spark: SparkSession, table_dir: str, snapshot_id: int | None = None
) -> DataFrame:
    """Page-table DataFrame of exactly the files in the given snapshot
    (default: current). Explicit file list + basePath: no directory
    listing, and `column=` partition pruning still applies."""
    m = read_snapshot_manifest(table_dir, snapshot_id)
    if not m["files"]:
        raise ValueError(f"snapshot {m['snapshot_id']} has no data files")
    paths = [os.path.join(table_dir, p) for p in m["files"]]
    pages = spark.read.option("basePath", os.path.join(table_dir, "data")).parquet(
        *paths
    )
    # decode groups by (split_id, batch_id); different snapshots reuse the
    # same encode split ids, so namespace them by snapshot — otherwise a
    # multi-snapshot read can merge two unrelated chunks into one decode
    # group and mispair columns (found by the r5 oracle gate)
    return pages.withColumn(
        "split_id",
        (F.col("snap").cast("long") * F.lit(1 << 20) + F.col("split_id"))
        .cast("int"),
    ).drop("snap")


def table_read(
    spark: SparkSession,
    table_dir: str,
    snapshot_id: int | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """Decoded rows at a snapshot (time travel when ``snapshot_id`` names an
    older one). ptypes come from the snapshot manifest — no metadata job."""
    m = read_snapshot_manifest(table_dir, snapshot_id)
    ptypes = m["schema"]
    cols = columns or list(ptypes)
    pages = table_read_pages(spark, table_dir, snapshot_id)
    return decode_table(pages, cols, ptypes={c: ptypes[c] for c in cols})
